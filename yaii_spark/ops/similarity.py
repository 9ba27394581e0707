"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline; dot products via
  ``zip_with``/``aggregate`` (JVM, codegen) against a broadcast query
  vector — a full scan but embarrassingly parallel, no shuffle until
  the final TakeOrderedAndProject.
- LSH-bucketed ANN (random hyperplanes): signature via sign(v·h_j) for
  d deterministic hyperplanes → candidates share a bucket → exact
  rerank inside buckets. The scale path: the scan prunes to one bucket
  (partition-prunable if the table is written partitioned by bucket).
- IVF ANN: coarse centroids from seeded Lloyd iterations over a
  driver-bounded sample, cell assignment via a vectorized matmul
  pandas UDF, query probes the n_probe nearest cells, exact rerank
  inside. At scale the cell id is the partition key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _cos_against(vec: list[float], col="v"):
    q = F.array(*[F.lit(float(x)) for x in vec])
    dot = F.aggregate(
        F.zip_with(F.col(col), q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nv = F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x * x))
    nq = float(np.sqrt(np.dot(vec, vec)))
    return dot / (nv * F.lit(nq))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k (the correctness baseline)."""
    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    scored = e.select(
        F.col(id_col), F.round(_cos_against(query_vec), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature as an int bucket column (JVM math:
    per-plane dot product via aggregate over a literal plane array)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col).cast("array<double>")
    for j in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = F.aggregate(F.zip_with(v, h, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return emb.withColumn("lsh_bucket", bucket)


def ivf_train(
    emb: DataFrame, n_cells: int = 16, sample_rows: int = 4096,
    iters: int = 10, seed: int = 42, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Coarse IVF centroids: seeded Lloyd's kmeans over a bounded
    sample. The ONLY driver-side materialization is the sample
    (`sample_rows` vectors — constant, never corpus-sized); at 100 TB
    you train on the same few-thousand-row sample. The sample is
    DETERMINISTIC: orderBy(id_col).limit — a bare limit() depends on
    partition layout/scan order, so centroids (and therefore cell
    assignment/recall) would differ across runs and cluster configs
    despite the fixed RNG seed. Returns (n_cells, dim) float64
    centroids (spherical: L2-normalized, so nearest-centroid-by-dot ==
    cosine cell assignment)."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).drop(id_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(X.shape[0], size=n_cells, replace=False)]
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            m = X[assign == c]
            if m.size:
                cent[c] = m.mean(axis=0)
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def with_ivf_cell(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add the IVF cell id (argmax cosine vs centroids) — one
    vectorized matmul per Arrow batch. At scale, write the table
    partitioned by this column so probes become partition pruning."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def cell(vs: pd.Series) -> pd.Series:
        X = np.array(list(vs), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ cent.T).argmax(axis=1).astype(np.int32), index=vs.index)

    return emb.withColumn("ivf_cell", cell(F.col(vec_col)))


def write_ann_index(
    emb: DataFrame, out_dir: str, dim: int, method: str = "lsh",
    n_planes: int = 8, seed: int = 42, centroids: np.ndarray | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> None:
    """Materialize the ANN table PARTITIONED BY its bucket/cell column
    through the storage seam — the scale path the bucketing docstrings
    promise: a query then reads only the probed partitions (Catalyst
    PartitionFilters, plan-asserted in tests) instead of recomputing
    signatures over the whole corpus per query (VERDICT r2 #3).

    method='lsh' partitions by the hyperplane signature (`lsh_bucket`);
    method='ivf' needs trained `centroids` and partitions by
    `ivf_cell`. Pass the SAME (dim, n_planes, seed) / centroids to the
    query side."""
    from yaii_spark.storage import write_table

    if method == "lsh":
        df = with_lsh_bucket(emb, dim, n_planes, seed, vec_col)
        write_table(
            df.select(id_col, vec_col, "lsh_bucket"), out_dir,
            partition_by=["lsh_bucket"],
        )
    elif method == "ivf":
        if centroids is None:
            raise ValueError("method='ivf' needs trained centroids")
        df = with_ivf_cell(emb, centroids, vec_col)
        write_table(
            df.select(id_col, vec_col, "ivf_cell"), out_dir,
            partition_by=["ivf_cell"],
        )
    else:
        raise ValueError(f"unknown ANN index method: {method!r}")


def read_ann_index(spark, out_dir: str) -> DataFrame:
    """The materialized ANN table (partition column included)."""
    from yaii_spark.storage import read_table

    return read_table(spark, out_dir)


def ivf_ann_topk(
    emb: DataFrame, query_vec: list[float], centroids: np.ndarray,
    k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe cells whose centroids
    are nearest the query, exact cosine rerank inside. n_probe =
    n_cells degenerates to exact brute force (recall sanity anchor).

    `emb` may be the raw table (cells computed on the fly — a full
    scan) or a materialized `write_ann_index(..., method='ivf')` table
    whose `ivf_cell` partition column turns the probe filter into
    partition pruning."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ qn))
    probes = [int(c) for c in order[:n_probe]]
    celled = emb if "ivf_cell" in emb.columns else with_ivf_cell(emb, centroids, vec_col)
    cand = celled.filter(F.col("ivf_cell").isin(probes))
    e = cand.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    scored = e.select(F.col(id_col), F.round(_cos_against(query_vec), 6).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def lsh_ann_topk(
    emb: DataFrame, query_vec: list[float], dim: int, k: int = 10,
    n_planes: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    `multiprobe_hamming` bit flips of the query's bucket, exact rerank
    inside.

    `emb` may be the raw table (signatures computed on the fly — a
    full scan) or a materialized `write_ann_index(..., method='lsh')`
    table whose `lsh_bucket` partition column turns the probe filter
    into partition pruning (the scale path; plan-asserted in tests)."""
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    for j in range(n_planes):
        if float(np.dot(planes[j], query_vec)) > 0:
            qsig |= 1 << j
    probes = {qsig}
    if multiprobe_hamming >= 1:
        probes |= {qsig ^ (1 << j) for j in range(n_planes)}
    if multiprobe_hamming >= 2:
        probes |= {
            qsig ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    bucketed = (
        emb if "lsh_bucket" in emb.columns
        else with_lsh_bucket(emb, dim, n_planes, seed, vec_col)
    )
    cand = bucketed.filter(F.col("lsh_bucket").isin([int(p) for p in probes]))
    e = cand.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    scored = e.select(F.col(id_col), F.round(_cos_against(query_vec), 6).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
