"""Clustering backends for diarization.

Behavioral contract (reference: speakerlab/process/cluster.py):
  - SpectralCluster: cosine affinity -> p-pruning -> symmetrize ->
    unnormalized Laplacian -> smallest eigenpairs -> eigengap speaker count
    -> k-means on spectral embeddings.
  - AHCluster: average-linkage agglomerative clustering on negative cosine,
    cut at a fixed cosine threshold.
  - UmapHdbscan: UMAP -> HDBSCAN (external libs when installed, else the
    in-repo native implementations in umap_native.py / hdbscan_native.py).
  - CommonClustering: dispatcher + minor-cluster reassignment + iterative
    centroid cosine merging.

Clustering itself is host-side numpy/scipy (N is a few thousand chunks; the
O(N^2) affinity is a single matmul). The TPU path computes the *embeddings*
and can compute large affinity matrices on device (see eval/scoring); labels
and linkage logic stay on host.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def _spectral_kernel(n_zero: int, k: int, use_lobpcg: bool):
    """Compiled affinity -> p-prune -> Laplacian -> k smallest eigenpairs.
    Cached at module level: a jit wrapper created inside a method is a
    fresh function object per call and recompiles every time (measured:
    33 s/call at N=1024). Only the k needed eigenpairs cross back to host
    (full eigenvectors at N=2048 would be a ~17 MB fetch for 130 KB used).

    ``use_lobpcg=False``: full dense eigh, sliced (exact; compile cost
    grows fast with N — N=8192 exhausts this harness's compile helper).
    ``use_lobpcg=True``: LOBPCG for the k smallest eigenpairs via the
    shifted operator c*I - L (Gershgorin bound c), mirroring the
    reference's ``eigsh(..., which='SM')`` (reference:
    process/cluster.py:95) with O(N^2 k) per-iteration cost and a small
    compiled program. Requires 5k < n (jax lobpcg input check)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        xn = x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sim = jnp.matmul(xn, xn.T, precision=jax.lax.Precision.HIGHEST)
        if n_zero > 0:
            # per-row threshold at the n_zero-th smallest value
            thr = jnp.sort(sim, axis=1)[:, n_zero][:, None]
            sim = jnp.where(sim >= thr, sim, 0.0)
        sim = 0.5 * (sim + sim.T)
        sim = sim - jnp.diag(jnp.diag(sim))
        deg = jnp.sum(jnp.abs(sim), axis=1)
        lap = jnp.diag(deg) - sim
        if not use_lobpcg:
            lambdas, vecs = jnp.linalg.eigh(lap)
            return lambdas[:k], vecs[:, :k]
        from jax.experimental.sparse.linalg import lobpcg_standard

        c = 2.0 * jnp.max(deg) + 1.0  # Gershgorin: lambda_max(L) <= 2 max deg
        n = x.shape[0]
        x0 = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.float32)
        theta, u, _ = lobpcg_standard(
            lambda v: c * v - lap @ v, x0, m=200)
        lambdas = c - theta  # largest of (cI - L) = smallest of L
        order = jnp.argsort(lambdas)
        return lambdas[order], u[:, order]

    return run


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), eps)


def cosine_affinity(x, y=None):
    xn = l2_normalize(np.asarray(x, dtype=np.float64))
    yn = xn if y is None else l2_normalize(np.asarray(y, dtype=np.float64))
    return xn @ yn.T


class SpectralCluster:
    """(reference: process/cluster.py:23-112)

    ``backend='jax'`` runs the O(N^2) affinity, p-pruning, Laplacian and the
    eigendecomposition on device (N ~ 1e4 diarization chunks: dense eigh on
    the accelerator instead of host eigsh); the eigengap count selection and
    k-means stay on host. Label-equivalent to the numpy backend up to
    p-pruning tie order and k-means init.
    """

    def __init__(self, min_num_spks=1, max_num_spks=10, pval=0.02, min_pnum=6,
                 oracle_num=None, backend: str = "numpy",
                 eigh_max_n: int = 2048, random_state=None):
        self.min_num_spks = min_num_spks
        self.max_num_spks = max_num_spks
        self.min_pnum = min_pnum
        self.pval = pval
        self.k = oracle_num
        self.backend = backend
        self.eigh_max_n = eigh_max_n
        # None = reference behavior (sklearn k_means draws from the global
        # numpy RNG, reference process/cluster.py:107-110 — labels can flip
        # on near-tie splits run to run); an int makes clustering
        # reproducible without touching the global RNG state
        self.random_state = random_state

    def __call__(self, X, pval=None, speaker_num=None, **kwargs):
        if self.backend == "jax":
            lambdas, vecs = self._device_spectral(X, pval)
            k_oracle = speaker_num if speaker_num is not None else self.k
            if k_oracle is not None:
                num_spk = k_oracle
            else:
                gaps = np.diff(
                    lambdas[self.min_num_spks - 1:self.max_num_spks + 1])
                num_spk = int(np.argmax(gaps)) + self.min_num_spks
            return self.kmeans(vecs[:, :num_spk], num_spk,
                               self.random_state)
        sim = cosine_affinity(X)
        sim = self.p_pruning(sim, pval)
        sim = 0.5 * (sim + sim.T)
        lap = self.laplacian(sim)
        emb, num_spk = self.spectral_embeddings(lap, speaker_num)
        return self.kmeans(emb, num_spk, self.random_state)

    def _device_spectral(self, X, pval=None):
        """Affinity -> p-prune -> Laplacian -> eigendecomposition on
        device. Full eigh up to ``eigh_max_n`` rows; beyond that, LOBPCG
        for just the max_num_spks+1 smallest eigenpairs (the only ones the
        eigengap count and spectral embedding use)."""
        import jax.numpy as jnp

        if pval is None:
            pval = self.pval
        n = X.shape[0]
        n_zero = min(int((1 - pval) * n), n - self.min_pnum)
        k = min(self.max_num_spks + 1, n)
        # jax lobpcg requires search_dim*5 < n; below that, full eigh is
        # tiny anyway
        use_lobpcg = n > self.eigh_max_n and n > 5 * k
        lambdas, vecs = _spectral_kernel(max(n_zero, 0), k, use_lobpcg)(
            jnp.asarray(X, jnp.float32))
        return np.asarray(lambdas), np.asarray(vecs)

    def p_pruning(self, A, pval=None):
        """Zero the lowest (1-p) fraction of each row (keeping >= min_pnum)."""
        if pval is None:
            pval = self.pval
        n = A.shape[0]
        n_zero = min(int((1 - pval) * n), n - self.min_pnum)
        if n_zero <= 0:
            return A
        order = np.argsort(A, axis=1)
        rows = np.arange(n)[:, None]
        A[rows, order[:, :n_zero]] = 0.0
        return A

    @staticmethod
    def laplacian(M):
        M = M.copy()
        np.fill_diagonal(M, 0.0)
        D = np.diag(np.sum(np.abs(M), axis=1))
        return D - M

    def spectral_embeddings(self, L, k_oracle=None):
        from scipy.linalg import eigh

        if k_oracle is None:
            k_oracle = self.k
        k = min(self.max_num_spks + 1, L.shape[0])
        lambdas, vecs = eigh(L, subset_by_index=[0, k - 1])
        if k_oracle is not None:
            num_spk = k_oracle
        else:
            gaps = np.diff(lambdas[self.min_num_spks - 1:self.max_num_spks + 1])
            num_spk = int(np.argmax(gaps)) + self.min_num_spks
        return vecs[:, :num_spk], num_spk

    @staticmethod
    def kmeans(emb, k, random_state=None):
        from sklearn.cluster import k_means

        _, labels, _ = k_means(emb, k, n_init=10, random_state=random_state)
        return labels


@functools.lru_cache(maxsize=2)
def _affinity_kernel():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        xn = x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return jnp.matmul(xn, xn.T, precision=jax.lax.Precision.HIGHEST)

    return run


class AHCluster:
    """Average-linkage AHC cut at a fixed cosine threshold.
    (reference: process/cluster.py:139-156)

    Backends:
      - 'numpy' (exact scipy linkage over the condensed float64 -cos
        matrix; O(N^2) memory — 1 GB at N=16k, the reference's own
        scaling cliff).
      - 'jax': same scipy linkage, but the O(N^2 d) affinity is computed
        on the accelerator (loses on download-bound hosts; see
        docs/BENCH.md).
      - 'nnchain': host NN-chain over (sum-vector, size) cluster
        representations (diar/ahc_nnchain.py) — O(N d) memory, float64,
        same dendrogram for this reducible linkage.
      - 'nnchain_device': the whole dendrogram built in one jitted
        lax.while_loop on the accelerator (float32), labels-only
        download. Hour-scale N in seconds.
      - 'auto' (default): exact scipy up to ``auto_nnchain_n`` rows (all
        small-N behavior and parity pins unchanged). Above it: the device
        NN-chain when an accelerator is present (0.5-3.4 s at 4k-16k,
        docs/BENCH.md). On CPU-only hosts scipy stays preferred on TIME
        (its C merge loops beat the python NN-chain's per-query matvecs:
        12.7 s vs 118 s at 8k) until its O(N^2) float64 memory becomes
        the cliff (~4.3 GB condensed + 8.6 GB dense affinity at 32k), so
        the host NN-chain only takes over past ``cpu_scipy_max_n``.
    """

    def __init__(self, fix_cos_thr=0.4, backend: str = "auto",
                 auto_nnchain_n: int = 4096, cpu_scipy_max_n: int = 24576):
        self.fix_cos_thr = fix_cos_thr
        self.backend = backend
        self.auto_nnchain_n = auto_nnchain_n
        self.cpu_scipy_max_n = cpu_scipy_max_n

    def _resolve_backend(self, n):
        if self.backend != "auto":
            return self.backend
        if n <= self.auto_nnchain_n:
            return "numpy"
        import jax

        if jax.devices()[0].platform != "cpu":
            # float32 device dendrogram: near-tie merge ORDER (hence
            # labels) can drift from scipy's exact float64 linkage at
            # hour scale — warn once so divergence is diagnosable
            # (ADVICE r3).
            self._warn_cutover(n, "nnchain_device (float32 affinity)")
            return "nnchain_device"
        if n <= self.cpu_scipy_max_n:
            return "numpy"
        self._warn_cutover(n, "nnchain (float64, O(N d) memory)")
        return "nnchain"

    _cutover_warned = False

    def _warn_cutover(self, n, chosen):
        if AHCluster._cutover_warned:
            return
        AHCluster._cutover_warned = True
        import logging

        logging.getLogger("speaker3d_tpu").warning(
            "AHC auto backend: N=%d > %d, switching scipy -> %s; near-tie "
            "merge order may differ from the reference's exact float64 "
            "dendrogram (pass backend='numpy' to force exact parity)",
            n, self.auto_nnchain_n, chosen)

    def __call__(self, X, **kwargs):
        from scipy.cluster.hierarchy import fcluster, linkage
        from scipy.spatial.distance import squareform

        backend = self._resolve_backend(np.asarray(X).shape[0])
        if backend in ("nnchain", "nnchain_device"):
            from speaker3d_tpu.diar import ahc_nnchain

            fn = (ahc_nnchain.device_linkage_labels
                  if backend == "nnchain_device"
                  else ahc_nnchain.linkage_labels)
            return fn(X, self.fix_cos_thr)
        if backend == "jax":
            import jax.numpy as jnp

            aff = np.asarray(
                _affinity_kernel()(jnp.asarray(X, jnp.float32)),
                dtype=np.float64)
            aff = 0.5 * (aff + aff.T)  # exact symmetry for squareform
            np.fill_diagonal(aff, 1.0)
        else:
            aff = cosine_affinity(X)
        scr = squareform(-aff, checks=False)
        lin = linkage(scr, method="average")
        adjust = abs(lin[:, 2].min())
        lin[:, 2] += adjust
        return fcluster(lin, -self.fix_cos_thr + adjust,
                        criterion="distance") - 1


class UmapHdbscan:
    """UMAP dim-reduction + HDBSCAN density clustering.
    (reference: process/cluster.py:115-137).

    Uses the external `umap-learn`/`hdbscan` packages when installed;
    otherwise falls back to the in-repo native implementations
    (diar/umap_native.py — JAX force-directed layout that runs the epoch
    loop as one jitted fori_loop on the accelerator — and
    diar/hdbscan_native.py — exact mutual-reachability-MST HDBSCAN*)."""

    def __init__(self, n_neighbors=20, n_components=60, min_samples=20,
                 min_cluster_size=10, metric="euclidean", backend="auto"):
        self.n_neighbors = n_neighbors
        self.n_components = n_components
        self.min_samples = min_samples
        self.min_cluster_size = min_cluster_size
        self.metric = metric
        self.backend = backend

    def __call__(self, X, **kwargs):
        n_components = min(self.n_components, X.shape[0] - 2)
        if self.backend in ("auto", "external"):
            try:
                import hdbscan
                import umap

                # A module named `umap`/`hdbscan` may be importable without
                # being umap-learn/hdbscan (namespace collisions, stubs);
                # require the actual entry points before committing.
                if not (hasattr(umap, "UMAP") and hasattr(hdbscan, "HDBSCAN")):
                    raise ImportError(
                        "umap/hdbscan modules lack UMAP/HDBSCAN classes "
                        "(not umap-learn/hdbscan)")
                umap_x = umap.UMAP(
                    n_neighbors=self.n_neighbors, min_dist=0.0,
                    n_components=n_components,
                    metric=self.metric).fit_transform(X)
                return hdbscan.HDBSCAN(
                    min_samples=self.min_samples,
                    min_cluster_size=self.min_cluster_size).fit_predict(umap_x)
            except ImportError:
                if self.backend == "external":
                    raise
        from speaker3d_tpu.diar.hdbscan_native import hdbscan_labels
        from speaker3d_tpu.diar.umap_native import umap_embed

        umap_x = umap_embed(
            X, n_neighbors=self.n_neighbors, min_dist=0.0,
            n_components=n_components, metric=self.metric)
        return hdbscan_labels(umap_x, min_samples=self.min_samples,
                              min_cluster_size=self.min_cluster_size)


class CommonClustering:
    """Dispatcher + cluster post-processing.
    (reference: process/cluster.py:159-239)"""

    def __init__(self, cluster_type, cluster_line=40, mer_cos=None,
                 min_cluster_size=4, min_cluster_ratio=None, **kwargs):
        """``min_cluster_ratio``: optional RELATIVE minimum cluster size —
        the effective minor-cluster threshold becomes
        max(min_cluster_size, ceil(ratio * num_chunks)). Keeps the minor
        filter calibrated when the chunking stride changes (halving the
        number of chunks halves absolute cluster sizes): a fixed absolute
        size that works at step 0.75 s under-filters at step 1.5 s.
        (Beyond the reference; after arXiv:2606.08505 "Relative Minimum
        Cluster Size for Stride-Accelerated Pipelines".)"""
        self.cluster_type = cluster_type
        self.cluster_line = cluster_line
        self.min_cluster_size = min_cluster_size
        self.min_cluster_ratio = min_cluster_ratio
        self.mer_cos = mer_cos
        if cluster_type == "spectral":
            self.cluster = SpectralCluster(**kwargs)
        elif cluster_type == "umap_hdbscan":
            kwargs["min_cluster_size"] = min_cluster_size
            self.cluster = UmapHdbscan(**kwargs)
        elif cluster_type == "AHC":
            self.cluster = AHCluster(**kwargs)
        else:
            raise ValueError(f"{cluster_type} is not currently supported.")
        self.cluster_for_short = AHCluster() if cluster_type != "AHC" else self.cluster

    def __call__(self, X, **kwargs):
        assert X.ndim == 2, "Shape of input should be [N, C]"
        if X.shape[0] <= 1:
            return np.zeros(X.shape[0], dtype=int)
        if X.shape[0] < self.cluster_line:
            labels = self.cluster_for_short(X)
        else:
            labels = self.cluster(X, **kwargs)
        labels = np.asarray(labels).copy()
        min_size = self.min_cluster_size
        if self.min_cluster_ratio is not None:
            min_size = max(min_size,
                           int(np.ceil(self.min_cluster_ratio * X.shape[0])))
        labels = self.filter_minor_cluster(labels, X, min_size)
        if self.mer_cos is not None:
            labels = self.merge_by_cos(labels, X, self.mer_cos)
        return labels

    def filter_minor_cluster(self, labels, x, min_cluster_size):
        """Reassign members of clusters of size <= min_cluster_size to the
        nearest (cosine) major-cluster centroid."""
        cset = np.unique(labels)
        csize = np.array([(labels == i).sum() for i in cset])
        minor = cset[csize <= min_cluster_size]
        if len(minor) == 0:
            return labels
        major = cset[csize > min_cluster_size]
        if len(major) == 0:
            return np.zeros_like(labels)
        centers = np.stack([x[labels == i].mean(0) for i in major])
        minor_mask = np.isin(labels, minor)
        sims = cosine_affinity(x[minor_mask], centers)
        labels[minor_mask] = major[np.argmax(sims, axis=1)]
        return labels

    def merge_by_cos(self, labels, x, cos_thr):
        """Iteratively merge the centroid pair with max cosine >= threshold."""
        assert 0 < cos_thr <= 1
        while True:
            cset = np.unique(labels)
            if len(cset) == 1:
                break
            centers = np.stack([x[labels == i].mean(0) for i in cset])
            aff = np.triu(cosine_affinity(centers), 1)
            idx = np.unravel_index(np.argmax(aff), aff.shape)
            if aff[idx] < cos_thr:
                break
            c1, c2 = cset[list(idx)]
            labels[labels == c2] = c1
        return labels


class JointClustering:
    """Audio-visual label reconciliation: overlap voting between audio
    clusters and face-track (vision) clusters, plus embedding redistribution
    for audio clusters overlapping several vision speakers.
    (reference: process/cluster.py:242-365)"""

    def __init__(self, audio_cluster, vision_cluster):
        self.audio_cluster = audio_cluster
        self.vision_cluster = vision_cluster

    def __call__(self, audioX, visionX, audioT, visionT, conf):
        alabels = arrange_labels(self.audio_cluster(audioX))
        vlabels = self.vision_cluster(visionX)
        vlist, vspk_embs, vspk_dur = self._vision_tracks(
            audioX, alabels, vlabels, audioT, visionT, conf)

        for i in range(alabels.max() + 1):
            idx = np.where(alabels == i)[0]
            times = [list(t) for t in np.array(audioT)[alabels == i]]
            overlap_vspk = self._overlap_spks(merge_consecutive(times), vlist,
                                              vspk_dur)
            if len(overlap_vspk) > 1:
                centers = np.stack([vspk_embs[s] for s in overlap_vspk])
                dist = np.argmax(cosine_affinity(audioX[alabels == i], centers),
                                 axis=1)
                for j in range(dist.max() + 1):
                    alabels[idx[dist == j]] = overlap_vspk[j]
            elif len(overlap_vspk) == 1:
                alabels[idx] = overlap_vspk[0]
        return arrange_labels(alabels)

    @staticmethod
    def _overlap_spks(times, vlist, vspk_dur=None):
        overlap_dur = {}
        for a_st, a_ed in times:
            for v_st, v_ed, v_id in vlist:
                if a_ed > v_st and v_ed > a_st:
                    overlap_dur[v_id] = overlap_dur.get(v_id, 0) + (
                        min(a_ed, v_ed) - max(a_st, v_st))
        out = []
        for v_id, dur in overlap_dur.items():
            lim = 0.5 if vspk_dur is None else min(vspk_dur[v_id] * 0.5, 0.5)
            if dur > lim:
                out.append(v_id)
        return out

    def _vision_tracks(self, audioX, alabels, vlabels, audioT, visionT, conf):
        assert len(vlabels) == len(visionT)
        stride_gap = getattr(conf, "face_det_stride", 1) * 0.04 + 1e-4
        vlist = []
        for i, ti in enumerate(visionT):
            if (not vlist or vlabels[i] != vlist[-1][2]
                    or ti - visionT[i - 1] > stride_gap):
                if vlist and vlist[-1][1] - vlist[-1][0] < 1e-4:
                    vlist.pop()
                vlist.append([ti, ti, vlabels[i]])
            else:
                vlist[-1][1] = ti
        v_arranged = arrange_labels([i[2] for i in vlist], start=alabels.max() + 1)
        vlist = [[a, b, j] for (a, b, _), j in zip(vlist, v_arranged)]

        vspk_embs = {}
        for v_st, v_ed, v_id in vlist:
            for i, (a_st, a_ed) in enumerate(audioT):
                if a_ed >= v_st and v_ed >= a_st:
                    if min(a_ed, v_ed) - max(a_st, v_st) > 1:
                        vspk_embs.setdefault(v_id, []).append(audioX[i])
        vspk_embs = {k: np.stack(v).mean(0) for k, v in vspk_embs.items()}
        vlist = [i for i in vlist if i[2] in vspk_embs]
        vspk_dur = {}
        for st, ed, v_id in vlist:
            vspk_dur[v_id] = vspk_dur.get(v_id, 0) + ed - st
        return vlist, vspk_embs, vspk_dur


def merge_consecutive(times):
    """Merge overlapping/adjacent [st, ed] intervals (assumed sorted)."""
    if len(times) == 0:
        return times
    out = []
    for iv in times:
        if not out or out[-1][1] < iv[0]:
            out.append(list(iv))
        else:
            out[-1][1] = max(out[-1][1], iv[1])
    return out


def arrange_labels(labels, start=0):
    """Relabel in order of first appearance starting at ``start``."""
    mapping = {}
    out = []
    idx = start
    for lab in labels:
        if lab not in mapping:
            mapping[lab] = idx
            idx += 1
        out.append(mapping[lab])
    return np.array(out)
