"""Distributed PCA over an embedding column (north-star extension,
SURVEY.md §2.12) — dimensionality reduction for the similarity stack
(shorter vectors → cheaper ANN probes and quantization; the classic
pre-step before IVF/PQ indexing).

Scale shape: the covariance of an n×d matrix needs only d + d² numbers —
each PARTITION reduces its rows to one partial (count, Σx, ΣxᵀX) with a
numpy einsum over Arrow batches (``mapInPandas``), and the driver sums
the per-partition partials (numPartitions rows — the same bounded-collect
sanction as the k-means centroid pulls in similarity.py). The n×d data
never concentrates anywhere; eigendecomposition runs on the d×d matrix
driver-side. Projection back over the corpus is a pure column expression
(one dot product per component) — no UDF on the big side.

Sign convention: each eigenvector is canonicalized so its
largest-magnitude entry is positive — eigenvectors are sign-ambiguous,
and tests compare against numpy under the same convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_moments(vec_col: str, dim: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if x.size == 0:
                continue
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += np.einsum("ni,nj->ij", x, x)
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()],
            }
        )

    return gen


def pca_fit(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[list, list, list]:
    """Fit PCA: returns (mean, components, explained_variance_ratio) —
    mean d floats, components k lists of d floats (rows = components,
    canonical sign), ratios k floats. Driver state is O(d²)."""
    import numpy as np

    partials = df.select(vec_col).mapInPandas(
        _partial_moments(vec_col, dim),
        f"n bigint, s array<double>, ss array<double>",
    ).collect()
    n = sum(r["n"] for r in partials)
    s = np.sum([np.array(r["s"]) for r in partials], axis=0)
    ss = np.sum(
        [np.array(r["ss"]).reshape(dim, dim) for r in partials], axis=0
    )
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        j = int(np.abs(v).argmax())
        if v[j] < 0:
            v = -v
        comps.append(v.tolist())
    total = float(evals.sum())
    ratios = [float(evals[i] / total) for i in order]
    return mean.tolist(), comps, ratios


def pca_coarse_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_pca: int = 16,
    n_coarse: int = 100,
) -> DataFrame:
    """PCA-accelerated ANN: candidates from squared-L2 distance in the
    n_pca-d projected space (cheap dot products), exact cosine rerank in
    the original space for the final top-k — the dimensionality-reduction
    front end of the ANN stack (compose with IVF cell pruning for the
    full 100 TB path; this operator demonstrates the PCA stage).

    Approximate by design (coarse distances discard (d − n_pca) dims);
    recall is pinned in tests/test_pca.py against the brute-force oracle.
    """
    from pyspark.sql.window import Window

    mean, comps, _ = pca_fit(corpus, vec_col, dim, n_pca)
    c = pca_transform(corpus, vec_col, mean, comps, "_pc").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        "_pc",
    )
    q = pca_transform(queries, vec_col, mean, comps, "_qpc").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
        "_qpc",
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_qpc"), F.col("_pc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col("neighbor_id")
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_d2", d2)
        .withColumn("_crank", F.row_number().over(wq))
        .filter(F.col("_crank") <= n_coarse)
    )
    dot = F.aggregate(
        F.zip_with(F.col("_qvec"), F.col("_cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sim = F.round(dot / (norm(F.col("_qvec")) * norm(F.col("_cvec"))), 6)
    wr = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def pca_transform(
    df: DataFrame,
    vec_col: str,
    mean: list,
    components: list,
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the components — one JVM-side dot product per
    component over the centered vector; a narrow map, no Python on the
    corpus path."""
    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        mean_arr,
        lambda x, m: x - m,
    )
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*projs))
