"""PCA over an embedding column — the dimensionality-reduction stage of a
training-data pipeline (decorrelate / compress vectors before ANN or
clustering; e.g. OPQ-style preprocessing ahead of product quantization).

Classic two-pass distributed PCA (the formulation MLlib's RowMatrix
computePrincipalComponents uses, public):

1. ONE pass computes the d-vector sum and d×d second-moment matrix as
   per-partition partials (an Arrow ``mapInPandas`` kernel emitting one
   partial row per batch — n, Σx, Σxxᵀ flattened); the driver combines
   partials in deterministic partition order and solves the d×d
   eigenproblem with numpy. d×d is tiny (d ≤ a few hundred) no matter how
   many rows the table has — the collect is O(partitions · d²), not O(n).
2. The (mean, components) pair broadcasts back and a second Arrow kernel
   projects every vector: one matmul per batch.

Eigenvector sign is canonicalized (largest-|entry| coordinate positive),
so the output is reproducible across runs/partitionings up to float-sum
jitter; exact values are partition-order dependent like every float
aggregate, hence the rows-only registry check with invariant pytest
coverage (orthonormality, variance ordering, parity with numpy PCA on
collected data).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    embeddings: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
):
    """Driver-side model: (mean[d], components[k×d], explained_var[k]).

    Components are rows, orthonormal, ordered by decreasing eigenvalue of
    the sample covariance; explained_var holds those eigenvalues.
    """
    import numpy as np

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(list(pdf["_v"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "pid": [int(pdf["_pid"].iloc[0])],
                    "n": [mat.shape[0]],
                    "s1": [mat.sum(axis=0).tolist()],
                    "s2": [(mat.T @ mat).ravel().tolist()],
                }
            )

    src = embeddings.select(
        F.spark_partition_id().alias("_pid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    rows = src.mapInPandas(
        partials, "pid int, n long, s1 array<double>, s2 array<double>"
    ).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    rows.sort(key=lambda r: (r["pid"],))
    d = len(rows[0]["s1"])
    n = 0
    s1 = np.zeros(d)
    s2 = np.zeros((d, d))
    for r in rows:
        n += r["n"]
        s1 = s1 + np.asarray(r["s1"])
        s2 = s2 + np.asarray(r["s2"]).reshape(d, d)
    mean = s1 / n
    cov = (s2 - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = evecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_project(
    embeddings: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, proj): every vector projected onto the top-k principal
    components (centered). One fit pass + one Arrow matmul pass."""
    import numpy as np

    mean, comps, _ = pca_fit(embeddings, k=k, vec_col=vec_col)
    spark = embeddings.sparkSession
    b_mean = spark.sparkContext.broadcast(mean)
    b_comps = spark.sparkContext.broadcast(comps)
    id_type = embeddings.schema[id_col].dataType.simpleString()

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, c = b_mean.value, b_comps.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(list(pdf["_v"]), dtype=np.float64) - m
            proj = mat @ c.T
            yield pd.DataFrame(
                {"vec_id": pdf["_id"].values, "proj": list(map(list, proj))}
            )

    return embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).mapInPandas(project, f"vec_id {id_type}, proj array<double>")
