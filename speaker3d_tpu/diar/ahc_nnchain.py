"""Memory-lean average-linkage AHC via the nearest-neighbor-chain algorithm.

The reference's default diarization clustering is fastcluster average
linkage over the condensed -cosine matrix (reference:
process/cluster.py:139-156) — O(N^2) float64 memory (1 GB at N=16k, 4+ GB
at 32k) which makes AHC the scaling cliff of its own default pipeline for
hour-long audio.

Key identity: for cosine distances, average linkage never needs pairwise
distances at all. With L2-normalized rows z_i, the average pairwise cosine
between clusters A and B is

    mean_{i in A, j in B} cos(i, j) = (S_A . S_B) / (|A| |B|),
    S_A = sum_{i in A} z_i

so a cluster is represented by (sum-vector, size): O(N d) memory total, and
a nearest-neighbor query is ONE matvec. The NN-chain algorithm (Murtagh;
what fastcluster/scipy use internally) builds the exact same dendrogram for
any reducible linkage, in ~2N nearest-neighbor queries.

Two implementations:
  - ``linkage_labels``: host numpy (float64), the readable reference.
  - ``device_linkage_labels``: the TPU-native one — the ENTIRE dendrogram
    build runs inside one jitted ``lax.while_loop`` (matvec + argmin +
    row updates per iteration), so N=16k..32k clusters in seconds with
    only the labels returned to host. The O(N^2 d) flops ride HBM
    bandwidth instead of a Python merge loop.

Cut semantics match AHCluster: flat clusters = dendrogram components whose
merge heights (in -cos space) are <= -fix_cos_thr.
"""

from __future__ import annotations

import functools

import numpy as np


def _normalize(X, dtype):
    z = np.asarray(X, dtype=dtype)
    n = np.linalg.norm(z, axis=1, keepdims=True)
    return z / np.maximum(n, 1e-12)


def nn_chain_merges(X, dtype=np.float64):
    """Full average-linkage dendrogram over -cosine distances.

    Returns ``(parent_a, parent_b, height)`` int/float arrays of length
    N-1; merged cluster k gets id N+k (scipy convention).
    """
    z = _normalize(X, dtype)
    n = z.shape[0]
    if n < 2:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, dtype))
    m = 2 * n - 1
    S = np.zeros((m, z.shape[1]), dtype)
    S[:n] = z
    size = np.zeros(m, dtype)
    size[:n] = 1.0
    active = np.zeros(m, bool)
    active[:n] = True

    out_a = np.zeros(n - 1, np.int64)
    out_b = np.zeros(n - 1, np.int64)
    out_h = np.zeros(n - 1, dtype)

    chain = np.zeros(m, np.int64)
    chain_len = 0
    n_merged = 0
    next_id = n
    while n_merged < n - 1:
        if chain_len == 0:
            chain[0] = int(np.flatnonzero(active)[0])
            chain_len = 1
        x = chain[chain_len - 1]
        # NN query: one matvec; d(x, B) = -(S_x . S_B)/(|x||B|)
        d = -(S[:next_id] @ S[x]) / (size[x] * size[:next_id])
        d[~active[:next_id]] = np.inf
        d[x] = np.inf
        # prefer the chain predecessor on ties (standard NN-chain rule:
        # guarantees termination on exactly-tied distances)
        y = chain[chain_len - 2] if chain_len >= 2 else -1
        best = int(np.argmin(d))
        if y >= 0 and d[y] <= d[best]:
            best = y
        if best == y:
            # reciprocal nearest neighbors -> merge x and y
            h = d[best]
            a, b = (x, best) if x < best else (best, x)
            S[next_id] = S[a] + S[b]
            size[next_id] = size[a] + size[b]
            active[a] = active[b] = False
            active[next_id] = True
            out_a[n_merged], out_b[n_merged], out_h[n_merged] = a, b, h
            next_id += 1
            n_merged += 1
            chain_len -= 2
        else:
            chain[chain_len] = best
            chain_len += 1
    return out_a, out_b, out_h


def labels_from_merges(n, out_a, out_b, out_h, cut_height):
    """Flat clusters: union the merges with height <= cut_height.
    Labels are numbered by first appearance (leaf order)."""
    parent = np.arange(2 * n - 1)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for k in range(len(out_a)):
        if out_h[k] <= cut_height:
            parent[find(out_a[k])] = parent[find(out_b[k])] = n + k
    roots = {}
    labels = np.empty(n, np.int64)
    for i in range(n):
        r = find(i)
        if r not in roots:
            roots[r] = len(roots)
        labels[i] = roots[r]
    return labels


def linkage_labels(X, fix_cos_thr, dtype=np.float64):
    """Host NN-chain AHC labels at the AHCluster threshold semantics."""
    X = np.asarray(X)
    n = X.shape[0]
    if n < 2:
        return np.zeros(n, np.int64)
    a, b, h = nn_chain_merges(X, dtype)
    return labels_from_merges(n, a, b, h, -float(fix_cos_thr))


# ---------------------------------------------------------------------------
# device (TPU) implementation: one jit, whole dendrogram in a while_loop
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _device_kernel(n_max: int, d: int):
    """Compiled for a BUCKETED maximum row count with the true n passed at
    runtime (padding rows masked inactive) — per-file chunk counts vary, and
    a per-N executable would recompile on every diarized file."""
    import jax
    import jax.numpy as jnp

    m = 2 * n_max - 1
    NEG = jnp.float32(np.inf)

    @jax.jit
    def run(z, n):
        # state: S [m,d], size [m], active [m], chain [m], chain_len,
        # merge outputs a/b/h [n_max-1], n_merged
        S0 = jnp.zeros((m, d), jnp.float32).at[:n_max].set(z)
        idx = jnp.arange(m, dtype=jnp.int32)
        size0 = jnp.where(idx < n, 1.0, 0.0).astype(jnp.float32)
        active0 = idx < n
        chain0 = jnp.zeros(m, jnp.int32)
        out0 = (jnp.zeros(n_max - 1, jnp.int32),
                jnp.zeros(n_max - 1, jnp.int32),
                jnp.zeros(n_max - 1, jnp.float32))

        def cond(st):
            return st[6] < n - 1

        def body(st):
            S, size, active, chain, clen, out, n_merged = st
            a_out, b_out, h_out = out

            # empty chain -> seed with the first active cluster
            def seed(chain, clen):
                first = jnp.argmax(active)
                return (chain.at[0].set(first.astype(jnp.int32)),
                        jnp.int32(1))

            chain, clen = jax.lax.cond(
                clen == 0, seed, lambda c, l: (c, l), chain, clen)

            x = chain[clen - 1]
            dists = -(S @ S[x]) / (size[x] * jnp.maximum(size, 1e-30))
            dists = jnp.where(active, dists, NEG)
            dists = dists.at[x].set(NEG)
            best = jnp.argmin(dists).astype(jnp.int32)
            prev = jnp.where(clen >= 2, chain[clen - 2], -1)
            # prefer the chain predecessor on ties
            best = jnp.where(
                (prev >= 0) & (dists[prev] <= dists[best]), prev, best)

            def merge(S, size, active, chain, clen, a_out, b_out, h_out,
                      n_merged):
                h = dists[best]
                a = jnp.minimum(x, best)
                b = jnp.maximum(x, best)
                nid = n + n_merged  # merged ids start at the TRUE n
                S = S.at[nid].set(S[a] + S[b])
                size = size.at[nid].set(size[a] + size[b])
                active = active.at[a].set(False).at[b].set(False)
                active = active.at[nid].set(True)
                a_out = a_out.at[n_merged].set(a)
                b_out = b_out.at[n_merged].set(b)
                h_out = h_out.at[n_merged].set(h)
                return (S, size, active, chain, clen - 2, a_out, b_out,
                        h_out, n_merged + 1)

            def push(S, size, active, chain, clen, a_out, b_out, h_out,
                     n_merged):
                return (S, size, active, chain.at[clen].set(best),
                        clen + 1, a_out, b_out, h_out, n_merged)

            S, size, active, chain, clen, a_out, b_out, h_out, n_merged = \
                jax.lax.cond(best == prev, merge, push, S, size, active,
                             chain, clen, a_out, b_out, h_out, n_merged)
            return (S, size, active, chain, clen,
                    (a_out, b_out, h_out), n_merged)

        st = (S0, size0, active0, chain0, jnp.int32(0), out0, jnp.int32(0))
        st = jax.lax.while_loop(cond, body, st)
        return st[5]

    return run


def _bucket(n: int, floor: int = 2048) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def device_linkage_labels(X, fix_cos_thr):
    """TPU-native NN-chain AHC: dendrogram built in ONE device dispatch
    (float32; heights come back as [3 x (N_max-1)] — O(N), never O(N^2)).
    The executable is compiled per power-of-2 size bucket and cached."""
    import jax.numpy as jnp

    X = np.asarray(X)
    n = X.shape[0]
    if n < 2:
        return np.zeros(n, np.int64)
    z = _normalize(X, np.float32)
    n_max = _bucket(n)
    zp = np.zeros((n_max, z.shape[1]), np.float32)
    zp[:n] = z
    a, b, h = _device_kernel(n_max, z.shape[1])(jnp.asarray(zp),
                                                jnp.int32(n))
    k = n - 1
    return labels_from_merges(n, np.asarray(a[:k]).astype(np.int64),
                              np.asarray(b[:k]).astype(np.int64),
                              np.asarray(h[:k]), -float(fix_cos_thr))
