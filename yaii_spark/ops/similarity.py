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

import os

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
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
    with_dot: bool = False,
) -> DataFrame:
    """Add the IVF cell id (argmax cosine vs centroids) — one
    vectorized matmul per Arrow batch. At scale, write the table
    partitioned by this column so probes become partition pruning.

    ``with_dot=True`` additionally emits ``_cent_dot`` — the vector's
    cosine to its own centroid — which `ivf_cell_stats` aggregates
    into the per-cell angular radius the exact-pruned query needs."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cell: int, dot: double>")
    def cell_dot(vs: pd.Series) -> pd.DataFrame:
        X = np.array(list(vs), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        d = X @ cent.T
        a = d.argmax(axis=1)
        return pd.DataFrame(
            {"cell": a.astype(np.int32), "dot": d[np.arange(len(a)), a]},
            index=vs.index,
        )

    out = emb.withColumn("_cd", cell_dot(F.col(vec_col)))
    out = out.withColumn("ivf_cell", F.col("_cd.cell"))
    if with_dot:
        out = out.withColumn("_cent_dot", F.col("_cd.dot"))
    return out.drop("_cd")


def ivf_cell_stats(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell pruning statistics: ``(ivf_cell, min_dot)`` where
    min_dot is the smallest member↔own-centroid cosine — i.e. the
    cell's angular radius r_c = arccos(min_dot). One n_cells-row
    aggregate (map-side combined; the same single corpus pass the
    cell-partitioned write already makes, which is why
    `write_ann_index` materializes this table alongside the index)."""
    celled = with_ivf_cell(emb, centroids, vec_col, with_dot=True)
    return celled.groupBy("ivf_cell").agg(F.min("_cent_dot").alias("min_dot"))


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
        # hash-repartition on the partition column before the
        # partitioned write: otherwise every upstream task writes a
        # file into every bucket dir (tasks × buckets tiny files — the
        # many-small-files trap, guide §6), and each query probe then
        # opens tasks× as many files. One exchange keyed like the
        # layout → one file per bucket dir.
        write_table(
            df.select(id_col, vec_col, "lsh_bucket").repartition("lsh_bucket"),
            out_dir,
            partition_by=["lsh_bucket"],
        )
    elif method == "ivf":
        if centroids is None:
            raise ValueError("method='ivf' needs trained centroids")
        df = with_ivf_cell(emb, centroids, vec_col, with_dot=True)
        write_table(
            df.select(id_col, vec_col, "ivf_cell").repartition("ivf_cell"),
            out_dir,
            partition_by=["ivf_cell"],
        )
        # per-cell angular radii for the exact-pruned query — n_cells
        # tiny rows; the leading underscore keeps the subdirectory
        # invisible to the main table's parquet reader
        write_table(
            df.groupBy("ivf_cell").agg(F.min("_cent_dot").alias("min_dot")),
            os.path.join(out_dir, "_ivf_cell_stats"),
        )
    else:
        raise ValueError(f"unknown ANN index method: {method!r}")


def read_ann_index(spark, out_dir: str) -> DataFrame:
    """The materialized ANN table (partition column included)."""
    from yaii_spark.storage import read_table

    return read_table(spark, out_dir)


def read_ivf_cell_stats(spark, out_dir: str) -> DataFrame:
    """The per-cell radius table a `write_ann_index(method='ivf')`
    materializes alongside the index."""
    from yaii_spark.storage import read_table

    return read_table(spark, os.path.join(out_dir, "_ivf_cell_stats"))


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


def ivf_ann_topk_exact(
    emb: DataFrame, query_vec: list[float], centroids: np.ndarray,
    k: int = 10, n_probe: int = 4, cell_stats: DataFrame | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    report: dict | None = None,
) -> DataFrame:
    """EXACT top-k with IVF cell pruning — rank-identical to
    `cosine_topk`, but reads only the cells that can matter.

    Spherical triangle inequality: for any member x of cell c,
    angle(q, x) >= angle(q, mu_c) - r_c where r_c = arccos(min member
    dot) is the cell's angular radius (materialized per cell by
    `write_ann_index`, n_cells tiny rows). So
    ub_c = cos(max(0, theta_qc - r_c)) upper-bounds every member's
    cosine. Two partition-pruned jobs: (1) score the n_probe cells
    with the highest bounds and take their kth score, (2) score the
    remaining cells whose bound survives it (none, typically), final
    top-k over both. Pruning honors the output's 6-decimal rounding:
    a cell is dropped only when ub_c < kth_rounded - 5e-7, so no
    pruned vector could round into a tie with the kth result. A query
    near a cell boundary degrades gracefully toward more probes, never
    toward a wrong answer — the recall/latency knob of classic IVF
    without the recall loss, at the price of storing one radius per
    cell and bounded-collecting k rows between the two jobs."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    celled = (
        emb if "ivf_cell" in emb.columns
        else with_ivf_cell(emb, centroids, vec_col)
    )
    if cell_stats is None:
        cell_stats = ivf_cell_stats(emb, centroids, vec_col)
    # n_cells rows — bounded by construction, never corpus-sized
    radii = {int(r["ivf_cell"]): float(r["min_dot"]) for r in cell_stats.collect()}
    theta_q = np.arccos(np.clip(centroids @ qn, -1.0, 1.0))
    ub = {
        c: float(np.cos(max(0.0, theta_q[c] - np.arccos(np.clip(md, -1.0, 1.0)))))
        + 1e-9  # float slack: the bound must stay an upper bound
        for c, md in radii.items()
    }
    order = sorted(ub, key=lambda c: (-ub[c], c))

    def scored(cells: list[int]):
        cand = celled.filter(F.col("ivf_cell").isin([int(c) for c in cells]))
        e = cand.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        return e.select(
            F.col(id_col), F.round(_cos_against(query_vec), 6).alias("cosine")
        )

    probes = order[: max(1, n_probe)]
    head_q = scored(probes).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    head = head_q.limit(k).collect()
    if len(head) >= k:
        thresh = float(head[-1]["cosine"]) - 5e-7
        rest = [c for c in order[len(probes):] if ub[c] >= thresh]
    else:
        # fewer than k candidates in the best cells: no safe threshold
        # yet, every remaining non-empty cell stays in play
        rest = order[len(probes):]
    if report is not None:
        report.update(
            n_cells=len(order), probed=len(probes) + len(rest),
            pruned=len(order) - len(probes) - len(rest),
        )
    # final top-k over head ∪ rest WITHOUT rescanning the probed cells
    # (they dominate the scan on the intended workload): the collected
    # head is exact — any probe-cell vector outside it is already beaten
    # by k better ones under the same (cosine desc, id asc) total order,
    # and len(head) < k means head holds EVERY probe-cell candidate.
    # Doubles round-trip the driver exactly, so values stay identical.
    head_df = emb.sparkSession.createDataFrame(head, schema=head_q.schema)
    out = head_df.unionByName(scored(rest)) if rest else head_df
    return out.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


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
