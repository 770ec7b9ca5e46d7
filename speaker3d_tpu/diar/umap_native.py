"""Native UMAP embedding — no external `umap-learn` dependency.

Implements the UMAP algorithm (McInnes/Healy/Melville 2018) as used by the
reference's UmapHdbscan diarization backend (reference: speakerlab/process/
cluster.py:115-137 — `umap.UMAP(n_neighbors, min_dist=0.0, n_components,
metric).fit_transform`):

  1. exact k-NN graph (N ~ 1e3-1e4 chunk embeddings: one O(N^2) distance
     matrix, no approximate-NN trees needed),
  2. fuzzy simplicial set: per-point rho (nearest-neighbour distance) and
     sigma found by binary search so that sum_j exp(-(d_ij - rho_i)/sigma_i)
     = log2(k), then probabilistic t-conorm symmetrisation
     P = W + W^T - W o W^T,
  3. spectral initialisation from the symmetric normalised graph Laplacian,
  4. the (a, b) low-dimensional-curve parameters fitted from
     (spread, min_dist) exactly like umap.find_ab_params,
  5. stochastic force-directed layout: attraction along graph edges,
     repulsion against negative samples, linearly decaying learning rate.

TPU-first note: step 5 is the hot loop and runs as ONE jitted
`lax.fori_loop` over epochs with static [E]-shaped edge tensors —
per-edge Bernoulli masks with p proportional to edge weight reproduce
umap's epochs_per_sample scheduling in expectation while keeping every
epoch a fixed-shape vectorised gather/scatter (MXU/VPU friendly, no host
round-trips). The classic implementation's per-edge *sequential* SGD is
deliberately replaced by this parallel variant: identical objective,
order-independent, and it is what makes the optimizer expressible as a
single XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from speaker3d_tpu.diar.hdbscan_native import pairwise_euclidean

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


def find_ab_params(spread: float = 1.0, min_dist: float = 0.0):
    """Least-squares fit of 1/(1 + a*x^(2b)) to the fuzzy membership target
    (1 for x < min_dist, exp(-(x - min_dist)/spread) beyond)."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))
    (a, b), _ = curve_fit(curve, xv, yv)
    return float(a), float(b)


def smooth_knn_dist(knn_dists: np.ndarray, k: int, n_iter: int = 64):
    """Per-row (rho, sigma): rho = nearest nonzero neighbour distance; sigma
    solves sum_j exp(-max(0, d_j - rho)/sigma) = log2(k) by bisection."""
    target = np.log2(k)
    rho = np.zeros(knn_dists.shape[0])
    nonzero_mask = knn_dists > 0.0
    has_nz = nonzero_mask.any(axis=1)
    first_nz = np.where(nonzero_mask, knn_dists, np.inf).min(axis=1)
    rho[has_nz] = first_nz[has_nz]

    lo = np.zeros(knn_dists.shape[0])
    hi = np.full(knn_dists.shape[0], np.inf)
    mid = np.ones(knn_dists.shape[0])
    d = np.maximum(knn_dists - rho[:, None], 0.0)
    for _ in range(n_iter):
        psum = np.exp(-d / mid[:, None]).sum(axis=1)
        err = psum - target
        if np.all(np.abs(err) < SMOOTH_K_TOLERANCE):
            break
        too_big = err > 0
        hi = np.where(too_big, mid, hi)
        lo = np.where(too_big, lo, mid)
        mid = np.where(too_big, (lo + hi) / 2.0,
                       np.where(np.isinf(hi), mid * 2.0, (lo + hi) / 2.0))
    sigma = mid
    # umap's floor: sigma >= MIN_K_DIST_SCALE * mean distance
    mean_d = knn_dists.mean(axis=1)
    floor = np.where(rho > 0.0, MIN_K_DIST_SCALE * mean_d,
                     MIN_K_DIST_SCALE * knn_dists.mean())
    return rho, np.maximum(sigma, floor)


def fuzzy_simplicial_set(dist: np.ndarray, n_neighbors: int):
    """Symmetrised fuzzy graph as (rows, cols, vals) over the k-NN edges."""
    n = dist.shape[0]
    k = min(n_neighbors, n)
    knn_idx = np.argsort(dist, axis=1, kind="stable")[:, :k]  # self first
    knn_d = np.take_along_axis(dist, knn_idx, axis=1)
    rho, sigma = smooth_knn_dist(knn_d, k)

    w = np.exp(-np.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None])
    w[:, 0] = 0.0  # no self loops (first neighbour is self at distance 0)

    from scipy.sparse import coo_matrix

    rows = np.repeat(np.arange(n), k)
    mat = coo_matrix((w.ravel(), (rows, knn_idx.ravel())), shape=(n, n)).tocsr()
    mat.eliminate_zeros()
    t = mat.T.tocsr()
    sym = mat + t - mat.multiply(t)  # probabilistic t-conorm
    sym = sym.tocoo()
    keep = sym.data > 0.0
    return sym.row[keep], sym.col[keep], sym.data[keep]


def spectral_init(rows, cols, vals, n, n_components, seed=42):
    """Bottom nontrivial eigenvectors of the sym-normalised Laplacian,
    scaled to [-10, 10] with a small jitter (umap's 'spectral' init)."""
    from scipy.sparse import coo_matrix, identity

    rng = np.random.default_rng(seed)
    w = coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    deg = np.asarray(w.sum(axis=1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    lap = identity(n) - w.multiply(dinv[:, None]).multiply(dinv[None, :])

    k = n_components + 1
    try:
        if n <= 4096:
            from scipy.linalg import eigh

            _, vecs = eigh(lap.toarray(), subset_by_index=[0, k - 1])
        else:
            from scipy.sparse.linalg import eigsh

            _, vecs = eigsh(lap.tocsc(), k=k, which="SM", tol=1e-4,
                            maxiter=n * 5)
        emb = vecs[:, 1:k]
    except Exception:
        emb = rng.normal(0.0, 1.0, (n, n_components))
    expansion = 10.0 / max(np.abs(emb).max(), 1e-12)
    emb = emb * expansion + rng.normal(0.0, 1e-4, (n, n_components))
    return emb.astype(np.float32)


@partial(jax.jit, static_argnames=("n_epochs", "neg_rate"))
def _optimize_layout(y0, heads, tails, probs, a, b, key, n_epochs: int,
                     neg_rate: int):
    n = y0.shape[0]

    def epoch(i, carry):
        y, key = carry
        alpha = 1.0 - i.astype(jnp.float32) / n_epochs
        key, k_edge, k_neg = jax.random.split(key, 3)

        mask = (jax.random.uniform(k_edge, probs.shape) < probs)
        mask = mask.astype(jnp.float32)[:, None]

        yh, yt = y[heads], y[tails]
        diff = yh - yt
        d2 = jnp.sum(diff * diff, axis=1, keepdims=True)
        # attraction: -2ab d^(2(b-1)) / (1 + a d^(2b))
        att = (-2.0 * a * b * jnp.power(jnp.maximum(d2, 1e-12), b - 1.0)
               / (1.0 + a * jnp.power(jnp.maximum(d2, 1e-12), b)))
        g_att = jnp.clip(att * diff, -4.0, 4.0) * mask
        y = y.at[heads].add(alpha * g_att)
        y = y.at[tails].add(-alpha * g_att)

        # repulsion: neg_rate uniform negatives per sampled edge, head moves
        neg = jax.random.randint(k_neg, (heads.shape[0], neg_rate), 0, n)
        yh = y[heads]
        for j in range(neg_rate):
            yn = y[neg[:, j]]
            diff_n = yh - yn
            d2n = jnp.sum(diff_n * diff_n, axis=1, keepdims=True)
            rep = (2.0 * b / ((0.001 + d2n)
                              * (1.0 + a * jnp.power(jnp.maximum(d2n, 1e-12),
                                                     b))))
            g_rep = jnp.where(d2n > 0.0, jnp.clip(rep * diff_n, -4.0, 4.0),
                              4.0) * mask
            y = y.at[heads].add(alpha * g_rep)
        return y, key

    y, _ = jax.lax.fori_loop(0, n_epochs, epoch, (y0, key))
    return y


def umap_embed(x: np.ndarray, n_neighbors: int = 15, n_components: int = 2,
               min_dist: float = 0.1, spread: float = 1.0,
               metric: str = "euclidean", n_epochs: int | None = None,
               negative_sample_rate: int = 5, seed: int = 42) -> np.ndarray:
    """fit_transform-equivalent embedding [N, n_components]."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        return np.empty((0, n_components), dtype=np.float32)
    if n <= n_components + 1:
        rng = np.random.default_rng(seed)
        return rng.normal(0.0, 1.0, (n, n_components)).astype(np.float32)

    if metric == "euclidean":
        dist = pairwise_euclidean(x)
    elif metric == "cosine":
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        dist = np.clip(1.0 - xn @ xn.T, 0.0, None)
        np.fill_diagonal(dist, 0.0)
    else:
        raise ValueError(f"unsupported metric {metric!r}")

    rows, cols, vals = fuzzy_simplicial_set(dist, n_neighbors)
    if n_epochs is None:
        n_epochs = 500 if n <= 10000 else 200
    # umap drops edges too weak to be sampled even once
    keep = vals >= vals.max() / float(n_epochs)
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    y0 = spectral_init(rows, cols, vals, n, n_components, seed)
    a, b = find_ab_params(spread, min_dist)

    y = _optimize_layout(
        jnp.asarray(y0),
        jnp.asarray(rows, dtype=jnp.int32), jnp.asarray(cols, dtype=jnp.int32),
        jnp.asarray((vals / vals.max()).astype(np.float32)),
        float(a), float(b), jax.random.PRNGKey(seed),
        n_epochs=int(n_epochs), neg_rate=int(negative_sample_rate))
    return np.asarray(y, dtype=np.float32)
