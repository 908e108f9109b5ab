"""PCA dimensionality reduction for embedding columns — the standard
pre-ANN compaction step (project 64-dim vectors onto their top-k
principal components before indexing/search).

Spark-first split of the algorithm, same discipline as the IVF/PQ
index builds (``similarity.py``): the DATA-sized work — second-moment
accumulation and the final projection — runs distributed; the
MODEL-sized work — eigendecomposition of the dim×dim covariance — runs
on the driver, because a 64×64 matrix is a model, not data.

Moment accumulation is the one-pass tree shape: ``mapInPandas`` folds
each Arrow batch into (count, Σx, ΣxxT) partial rows, and the driver
sums the PARTIALS — a collect bounded by batch count × dim² floats,
O(partitions) not O(corpus) (the same bounded-collect contract as the
≤4096-row index training samples). Covariance, eigh, and a
deterministic sign convention (largest-|loading| coordinate positive)
produce the components; projection is one Arrow-vectorized matmul per
batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PCA_CACHE: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}


def fit_pca(
    corpus: DataFrame,
    dim: int,
    k: int,
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Mean (dim,) and top-k components (k, dim), eigenvalue-descending.

    Exact moments over the FULL corpus (no sampling — one distributed
    pass), eigh on the driver. Memoized per logical-corpus key like
    ``get_ivf_centroids``."""
    if not 1 <= k <= dim:
        raise ValueError(f"need 1 <= k <= dim, got k={k}, dim={dim}")
    if cache_key is not None and (cache_key, k) in _PCA_CACHE:
        return _PCA_CACHE[(cache_key, k)]

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            yield pd.DataFrame(
                {
                    "n": [len(mat)],
                    "s": [mat.sum(axis=0).tolist()],
                    "g": [(mat.T @ mat).ravel().tolist()],
                }
            )

    rows = (
        corpus.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()  # bounded: one row per Arrow batch (dim² doubles each)
    )
    n = sum(r.n for r in rows)
    if n == 0:
        raise ValueError("cannot fit PCA on an empty corpus")
    s = np.sum([r.s for r in rows], axis=0)
    g = np.sum([r.g for r in rows], axis=0).reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :k].T  # (k, dim), eigenvalue-descending
    # sign convention: make each component's largest-|loading| entry
    # positive, so the model is stable run to run
    flips = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    if cache_key is not None:
        _PCA_CACHE[(cache_key, k)] = (mean, comps)
    return mean, comps


def pca_project(
    corpus: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Append ``out_col``: the centered projection (x − mean)·Cᵀ as
    ``array<double>`` — one matmul per Arrow batch, no shuffle."""
    from pyspark.sql import types as T

    m, c = mean.copy(), components.copy()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def project(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(list((mat - m) @ c.T))

    return corpus.withColumn(out_col, project(F.col(vec_col)))
