"""Compact UMAP implementation (McInnes, Healy & Melville 2018).

The reference uses the `umap-learn` package for its embedding projections
(results_processing/plotting.py:933 _compute_umap); that package is not in
this image, so this module implements the algorithm's core directly:

1. kNN graph (sklearn NearestNeighbors),
2. smooth-kNN distance calibration (binary-search sigma per point so the
   effective neighbour count matches log2(k)),
3. fuzzy simplicial set symmetrization (probabilistic t-conorm union),
4. low-dimensional layout by SGD on the cross-entropy between the high- and
   low-dimensional fuzzy sets, with negative sampling and the standard
   (a, b) curve fitted from min_dist.

Deterministic given `random_state`. Intended for analysis-scale inputs
(thousands of points), not million-point corpora.
"""

from __future__ import annotations

import numpy as np

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


def _smooth_knn_dist(distances: np.ndarray, k: float, n_iter: int = 64):
    """Per-point (rho, sigma): rho = nearest nonzero distance; sigma solves
    sum_j exp(-(d_ij - rho)/sigma) = log2(k)."""
    target = np.log2(k)
    n = distances.shape[0]
    rho = np.zeros(n)
    sigma = np.zeros(n)
    mean_d = distances.mean()
    for i in range(n):
        row = distances[i]
        nonzero = row[row > 0.0]
        rho[i] = nonzero.min() if nonzero.size else 0.0
        lo, hi, mid = 0.0, np.inf, 1.0
        for _ in range(n_iter):
            # row already excludes the self column, so the full sum is the
            # effective neighbour count umap-learn calibrates against
            psum = np.exp(-np.maximum(row - rho[i], 0.0) / mid).sum()
            if abs(psum - target) < SMOOTH_K_TOLERANCE:
                break
            if psum > target:
                hi = mid
                mid = (lo + hi) / 2.0
            else:
                lo = mid
                mid = mid * 2.0 if hi == np.inf else (lo + hi) / 2.0
        sigma[i] = max(mid, MIN_K_DIST_SCALE * (nonzero.mean() if nonzero.size else mean_d))
    return rho, sigma


def _fuzzy_simplicial_set(idx: np.ndarray, dist: np.ndarray):
    """Directed membership strengths → symmetric union (a+b-ab)."""
    n, k = idx.shape
    rho, sigma = _smooth_knn_dist(dist, k)
    rows = np.repeat(np.arange(n), k)
    cols = idx.reshape(-1)
    vals = np.exp(
        -np.maximum(dist.reshape(-1) - rho[rows], 0.0) / sigma[rows]
    )
    from scipy.sparse import coo_matrix

    g = coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    gt = g.T.tocsr()
    sym = g + gt - g.multiply(gt)
    return sym.tocoo()


def _find_ab(min_dist: float, spread: float = 1.0):
    """Least-squares fit of 1/(1+a d^{2b}) to the desired offset-exponential
    membership curve."""
    from scipy.optimize import curve_fit

    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    (a, b), _ = curve_fit(curve, xv, yv, p0=(1.0, 1.0), maxfev=5000)
    return float(a), float(b)


def umap_embed(
    x: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    n_epochs: int = 200,
    learning_rate: float = 1.0,
    negative_sample_rate: int = 5,
    random_state: int = 42,
) -> np.ndarray:
    """UMAP embedding of x (n, d) → (n, n_components)."""
    from sklearn.neighbors import NearestNeighbors

    x = np.asarray(x, np.float32)
    n = x.shape[0]
    k = min(n_neighbors, n - 1)
    rng = np.random.default_rng(random_state)

    nn = NearestNeighbors(n_neighbors=k + 1).fit(x)
    dist, idx = nn.kneighbors(x)
    graph = _fuzzy_simplicial_set(idx[:, 1:], dist[:, 1:])

    a, b = _find_ab(min_dist)

    # PCA init (umap-learn defaults to spectral; PCA is its fallback and is
    # deterministic without an eigensolver dependency)
    centered = x - x.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    emb = centered @ vt[:n_components].T
    emb = (emb / max(np.abs(emb).max(), 1e-12) * 10.0).astype(np.float32)

    head, tail, weight = graph.row, graph.col, graph.data
    keep = weight > weight.max() / max(n_epochs, 1)
    head, tail, weight = head[keep], tail[keep], weight[keep]
    # per-edge update cadence ∝ membership strength
    epochs_per_sample = weight.max() / weight

    next_update = epochs_per_sample.copy()
    for epoch in range(1, n_epochs + 1):
        alpha = learning_rate * (1.0 - epoch / n_epochs)
        active = next_update <= epoch
        if not active.any():
            continue
        hs, ts = head[active], tail[active]
        d2 = np.sum((emb[hs] - emb[ts]) ** 2, axis=1)
        grad_coef = (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2**b)
        grad = np.clip(grad_coef[:, None] * (emb[hs] - emb[ts]), -4, 4)
        np.add.at(emb, hs, alpha * grad)
        np.add.at(emb, ts, -alpha * grad)
        # negative sampling
        for _ in range(negative_sample_rate):
            ns = rng.integers(0, n, hs.shape[0])
            d2n = np.sum((emb[hs] - emb[ns]) ** 2, axis=1) + 1e-3
            rep = (2.0 * b) / (d2n * (1.0 + a * d2n**b))
            grad_n = np.clip(rep[:, None] * (emb[hs] - emb[ns]), -4, 4)
            np.add.at(emb, hs, alpha * grad_n)
        next_update[active] += epochs_per_sample[active]
    return emb
