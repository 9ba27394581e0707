"""Distributed inverted-index build (SURVEY.md §7.1 M3).

Dataflow (one DataFrame lineage; ONE wide shuffle for the default
fields, then the parquet/Iceberg commit):

    pages ──tokenize+invert (pandas UDF)──► per-doc packed posting
          blobs, one per term-hash shard (analyzer.doc_postings —
          LEB128-framed entries; the per-doc combine happens INSIDE the
          UDF, like Lucene's inverter, and the blob layout avoids the
          Arrow nested-struct conversion that measured ~95% of the
          tokenize stage)
          ──explode ~shards rows/doc──► (seg_id, doc_id, dl, shard, data)
          ──groupBy(seg_id, shard)──► decode frames, concat runs,
          delta+varint posting rows                           [shuffle]
          ──write postings partitioned by seg_id, sorted by (field, term)

    (custom-analyzer fields take a posexplode → groupBy(doc) →
    groupBy(seg, shard) side path and union before the write)

Scale design decisions (the 100 TB story):

- **Skew bound by segmentation.** A posting-list group is at most
  ``seg_size`` docs (default 2^20), so even a stopword-grade hot term
  ("the" in 40% of 10^12 docs) produces ≤1M-entry groups per segment —
  the segment axis IS the salt, and it needs no second merge pass
  because BM25/boolean evaluation is segment-local by construction
  (same reason Lucene shards). The shuffle keys on (seg, term-shard) —
  near-uniform by construction. AQE skew handling stays on as a
  backstop.
- **Map-side combine** happens in the analyzer UDF itself (per-doc
  term→tf/positions inversion ≙ the reference's accumulator/merger
  pattern, /root/reference/src/base-inverted-index.ts:297-394).
- **Concurrent commits.** The docs / seg_meta / postings writes are
  independent consumers of the persisted tokenized batch and are
  submitted as concurrent Spark jobs (as are the lineage/stats tail
  writes) — driver-side planning/commit latencies overlap.
- **docID = seg_id * seg_size + local** (dense). Delta+varint then
  compresses to ~1-2 bytes/doc. At 10^12 docs: 10^6 segments × 2^20.
- **Resumable:** per-segment checkpoint rows; re-running skips
  completed segments (dynamic partition overwrite keeps re-runs of a
  partial segment idempotent).
- **Term-sorted files:** postings sorted by term inside each segment
  partition → parquet row-group min/max prunes term lookups at query
  time without a term-partitioned layout (which would be 10^7 dirs).

Reference parity: this replaces yaii's single-process mutable→immutable
segment commit (/root/reference/src/base-inverted-index.ts:511-534,
immutable-segment.ts:98-309); its planned-but-stubbed segment merge
(base-inverted-index.ts:536-548) is our `merge_segments`.
"""

from __future__ import annotations

import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from yaii_spark.analyzer import (
    make_doc_postings_udf,
    tokenize_all_udf,
    tokenize_udf,
    varint_read,
)
from yaii_spark.codec import (
    block_offsets_from_lengths,
    delta_encode_blocked,
    encode_positions_blocked,
    varint_encode,
    varint_encode_blocked,
    varint_lengths,
)
from yaii_spark.storage import (
    fs_delete,
    fs_exists,
    fs_touch,
    read_table,
    write_table,
)

DEFAULT_K1 = 1.2  # Lucene/ES defaults — yaii's stated design base
DEFAULT_B = 0.75
BLOCK_SIZE = 128  # docs per block for block-max metadata

# analyzer registry for per-field config (yaii FieldConfig.analyzer,
# /root/reference/src/lib/api/config.ts:12-28): 'standard' = tokenizer
# only (stopwords kept, like regular searchable fields), 'all' =
# tokenizer + stopword filter (the £_ALL catch-all chain,
# /root/reference/src/yaii-types.ts:42-45)
ANALYZERS = {"standard": tokenize_udf, "all": tokenize_all_udf}

# default field map: field name -> (source column, analyzer).
# "_all" mirrors yaii's synthetic catch-all field (£_ALL).
DEFAULT_FIELDS = {"text": ("text", "standard"), "_all": ("text", "all")}

def _tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """Lucene-form BM25 tf normalization: tf / (tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


# blocked layout (FORMAT_VERSION 4): delta restarts + per-block byte
# offsets and first doc ids, so the query side can decode single blocks
# (codec.delta_encode_blocked; bm25 lazy MaxScore is the consumer).
# v5 extends the same block structure to the position stream
# (block_pos_offs): phrase evaluation decodes positions only for blocks
# holding candidate docs (executor._LazyPositions).
_POSTINGS_SCHEMA = (
    "seg_id long, field string, term string, df_local long, cf_local long, "
    "doc_ids_bin binary, tfs_bin binary, pos_bin binary, "
    "block_maxes array<double>, max_norm double, "
    "block_id_offs array<int>, block_tf_offs array<int>, "
    "block_first_ids array<long>, block_pos_offs array<int>"
)


def _encode_blocked(out: dict, ids_a: np.ndarray, tfs_a: np.ndarray) -> None:
    """Append the blocked id/tf encodings + block metadata columns."""
    ids_bin, id_offs = delta_encode_blocked(ids_a, BLOCK_SIZE)
    tfs_bin, tf_offs = varint_encode_blocked(tfs_a, BLOCK_SIZE)
    out["doc_ids_bin"].append(ids_bin)
    out["tfs_bin"].append(tfs_bin)
    out["block_id_offs"].append([int(x) for x in id_offs])
    out["block_tf_offs"].append([int(x) for x in tf_offs])
    out["block_first_ids"].append([int(x) for x in ids_a[::BLOCK_SIZE]])


def _make_segment_encoder(avgdl: float, k1: float, b: float):
    """Per-(segment, shard) posting-list builder: receives doc-level
    (field, term, doc_id, dl, tf, positions) rows and emits one encoded
    posting row per (field, term). This is the Lucene-writer shape — a
    whole segment shard built in one task with pandas/numpy group-bys,
    which benchmarked ~10x faster than collect_list(struct)+scalar-UDF
    (Arrow nested-struct decode dominated)."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["field", "term", "doc_id"], kind="mergesort")
        seg = int(pdf["seg_id"].iloc[0])
        out = {
            "seg_id": [], "field": [], "term": [], "df_local": [], "cf_local": [],
            "doc_ids_bin": [], "tfs_bin": [], "pos_bin": [],
            "block_maxes": [], "max_norm": [],
            "block_id_offs": [], "block_tf_offs": [], "block_first_ids": [],
            "block_pos_offs": [],
        }
        for (field, term), g in pdf.groupby(["field", "term"], sort=False):
            ids = g["doc_id"].to_numpy(dtype=np.uint64)
            tfs = g["tf"].to_numpy(dtype=np.uint64)
            dls = g["dl"].to_numpy(dtype=np.int64)
            norms = _tf_norm(tfs, dls, avgdl, k1, b)
            nblocks = math.ceil(ids.size / BLOCK_SIZE)
            bmax = [
                float(norms[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max())
                for i in range(nblocks)
            ]
            out["seg_id"].append(seg)
            out["field"].append(field)
            out["term"].append(term)
            out["df_local"].append(int(ids.size))
            out["cf_local"].append(int(tfs.sum()))
            _encode_blocked(out, ids, tfs)
            pos_bin, pos_offs = encode_positions_blocked(
                list(g["positions"]), BLOCK_SIZE
            )
            out["pos_bin"].append(pos_bin)
            out["block_pos_offs"].append([int(x) for x in pos_offs])
            out["block_maxes"].append(bmax)
            out["max_norm"].append(float(norms.max()) if norms.size else 0.0)
        return pd.DataFrame(out)

    return encode


def _encode_group_batched(
    seg: int,
    items: list,
    field_names: list[str],
    avgdl: float,
    k1: float,
    b: float,
) -> pd.DataFrame:
    """Encode every (field, term) posting row of one (segment, shard)
    group with ONE codec pass over the concatenated arrays.

    The per-row form (delta_encode_blocked + varint_encode_blocked per
    posting list) spends ~100s of µs of fixed numpy overhead per call;
    at 10^5 posting rows per build that overhead IS the encode stage
    (guide §1.2 step 2 — per-task work). Here ids/tfs/norms of all rows
    concatenate, delta restarts land at every row start and every
    in-row block boundary, and one varint_lengths + varint_encode pass
    serves the whole group; per-row bytes are then slices of the group
    stream. Output is byte-identical to the per-row form because LEB128
    is a per-value code — pinned by tests/test_index_build.py's
    encoder-parity test.

    `items`: [((fid, term_bytes), (ids, tfs, dls, pos_blobs)), ...]
    with each row's ids sorted ascending (doc_id processing order)."""
    out = {
        "seg_id": [], "field": [], "term": [], "df_local": [], "cf_local": [],
        "doc_ids_bin": [], "tfs_bin": [], "pos_bin": [],
        "block_maxes": [], "max_norm": [],
        "block_id_offs": [], "block_tf_offs": [], "block_first_ids": [],
        "block_pos_offs": [],
    }
    nrows = len(items)
    if nrows == 0:
        return pd.DataFrame(out)
    counts = np.fromiter((len(e[0]) for _, e in items), dtype=np.int64, count=nrows)
    total = int(counts.sum())
    row_ends = np.cumsum(counts)
    row_starts = row_ends - counts
    ids_all = np.empty(total, dtype=np.uint64)
    tfs_all = np.empty(total, dtype=np.uint64)
    dls_all = np.empty(total, dtype=np.int64)
    plen_all = np.empty(total, dtype=np.int64)
    for j, (_, (ids, tfs, dls, poss)) in enumerate(items):
        s, e = row_starts[j], row_ends[j]
        ids_all[s:e] = ids
        tfs_all[s:e] = tfs
        dls_all[s:e] = dls
        plen_all[s:e] = [len(p) for p in poss]
    # delta stream with absolute restarts at every (row, block) start
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(row_starts, counts)
    restart = (pos_in_row % BLOCK_SIZE) == 0
    restart_idx = np.flatnonzero(restart)
    deltas = np.empty_like(ids_all)
    deltas[0] = ids_all[0]
    np.subtract(ids_all[1:], ids_all[:-1], out=deltas[1:])
    deltas[restart] = ids_all[restart]
    id_lens = varint_lengths(deltas)
    id_bytes = varint_encode(deltas)
    id_ends = np.cumsum(id_lens)
    id_voffs = id_ends - id_lens  # byte offset of each value in the stream
    tf_lens = varint_lengths(tfs_all)
    tf_bytes = varint_encode(tfs_all)
    tf_ends = np.cumsum(tf_lens)
    tf_voffs = tf_ends - tf_lens
    pl_ends = np.cumsum(plen_all)
    pl_voffs = pl_ends - plen_all
    norms = _tf_norm(tfs_all, dls_all, avgdl, k1, b)
    # one reduceat per metric: segments are exactly the (row, block)
    # chunks (restart_idx) / the rows (row_starts), both strictly
    # increasing and < total
    bmax_all = np.maximum.reduceat(norms, restart_idx)
    max_norm_all = np.maximum.reduceat(norms, row_starts)
    cf_all = np.add.reduceat(tfs_all.astype(np.int64), row_starts)
    nblocks = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    bm_ends = np.cumsum(nblocks)
    bm_starts = bm_ends - nblocks
    for j, ((fid, term), _) in enumerate(items):
        s, e = row_starts[j], row_ends[j]
        rblocks = restart_idx[bm_starts[j] : bm_ends[j]]
        ib0, tb0, pb0 = id_voffs[s], tf_voffs[s], pl_voffs[s]
        out["seg_id"].append(seg)
        out["field"].append(field_names[fid])
        out["term"].append(term.decode("utf-8"))
        out["df_local"].append(int(counts[j]))
        out["cf_local"].append(int(cf_all[j]))
        out["doc_ids_bin"].append(id_bytes[ib0 : id_ends[e - 1]])
        out["tfs_bin"].append(tf_bytes[tb0 : tf_ends[e - 1]])
        out["pos_bin"].append(b"".join(items[j][1][3]))
        out["block_maxes"].append([float(x) for x in bmax_all[bm_starts[j] : bm_ends[j]]])
        out["max_norm"].append(float(max_norm_all[j]))
        out["block_id_offs"].append([int(x) for x in id_voffs[rblocks] - ib0])
        out["block_tf_offs"].append([int(x) for x in tf_voffs[rblocks] - tb0])
        out["block_first_ids"].append([int(x) for x in ids_all[rblocks]])
        out["block_pos_offs"].append([int(x) for x in pl_voffs[rblocks] - pb0])
    return pd.DataFrame(out)


def _make_packed_encoder(field_names: list[str], avgdl: float, k1: float, b: float):
    """Per-(segment, shard) posting builder over packed per-doc blobs
    (analyzer.doc_postings layout). Rows are processed in doc_id order,
    so each (field, term)'s doc ids accumulate already sorted; position
    bytes are concatenated verbatim (LEB128 deltas are concat-safe —
    identical bytes to codec.encode_positions). Codec work is batched
    across the whole group (_encode_group_batched)."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        seg = int(pdf["seg_id"].iloc[0])
        acc: dict = {}
        for doc_id, dl, data in zip(
            pdf["doc_id"].to_numpy(), pdf["dl"].to_numpy(), pdf["data"]
        ):
            off = 0
            n = len(data)
            while off < n:
                # header varints are single-byte in the common case
                fid = data[off]
                off += 1
                if fid >= 0x80:
                    fid, off = varint_read(data, off - 1)
                tl = data[off]
                off += 1
                if tl >= 0x80:
                    tl, off = varint_read(data, off - 1)
                term = data[off : off + tl]
                off += tl
                tf = data[off]
                off += 1
                if tf >= 0x80:
                    tf, off = varint_read(data, off - 1)
                pl = data[off]
                off += 1
                if pl >= 0x80:
                    pl, off = varint_read(data, off - 1)
                pos = data[off : off + pl]
                off += pl
                e = acc.get((fid, term))
                if e is None:
                    e = acc[(fid, term)] = ([], [], [], [])
                e[0].append(doc_id)
                e[1].append(tf)
                e[2].append(dl)
                e[3].append(pos)
        return _encode_group_batched(
            seg, list(acc.items()), field_names, avgdl, k1, b
        )

    return encode


# v5: avgdl_built records the corpus avgdl the segment's block-max
# bounds were computed with — bm25 pruning is only rank-safe when it
# matches the query-time corpus avgdl (streaming appends drift it; the
# scorer falls back to exact for stale segments). deleted_bin holds the
# local ids expunged by a purging merge (delta+varint; the NOT/ALL
# universe subtracts them — doc ids are never renumbered, so purged
# slots must stay out of the universe without a tombstone table).
_SEG_META_SCHEMA = (
    "seg_id long, n_docs long, base_doc_id long, dl_bin binary, "
    "avgdl_built double, deleted_bin binary"
)

_META_ENC_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("dl_bin", T.BinaryType()),
    ]
)


@F.pandas_udf(_META_ENC_SCHEMA)
def _encode_dl_udf(lds: pd.Series) -> pd.DataFrame:
    """(local_id, dl) struct array (sorted) → dense varint dl blob.
    Gaps (absent local ids) become dl=0."""
    n_out, b_out = [], []
    for ld in lds:
        local = np.array([e["local_id"] for e in ld], dtype=np.int64)
        dl = np.array([e["dl"] for e in ld], dtype=np.uint64)
        n = int(local.max()) + 1 if local.size else 0
        dls = np.zeros(n, dtype=np.uint64)
        dls[local] = dl
        n_out.append(n)
        b_out.append(varint_encode(dls))
    return pd.DataFrame({"n_docs": n_out, "dl_bin": b_out})


def assign_dense_ids(
    df: DataFrame, start: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Dense ids `start..start+n-1` WITHOUT a global sort: per-partition
    row counts are collected (one tiny row per partition — bounded by
    parallelism, never by data), cumulative offsets broadcast back, and
    each row gets offset + within-partition rank. This is the standard
    scalable dense-id assignment (a global row_number() would funnel
    the whole batch through one task).

    The two passes (counts collect, then the id-assignment join) MUST
    see the same row→partition mapping, so `parts` is persisted before
    the counts job (ADVICE r4: an AQE-coalesced shuffle or a
    nondeterministic source re-evaluated between the jobs would remap
    rows silently); when the INPUT is already persisted (the streaming
    committer does this) the extra layer is skipped — recomputing the
    narrow _pid projection from cached parent blocks preserves the
    partition mapping. The assignment VERIFIES the mapping in the same
    pass: a partition id with no offset, or a partition whose row count
    differs from the counts job's (a recompute that redistributed rows
    between existing pids — offset ranges would overlap), fails LOUDLY
    via raise_error instead of silently dropping/duplicating ids.

    Cache lifecycle: any persist taken here is exposed on the result as
    `result._dense_ids_cache` — long-running callers (the sink commits
    thousands of batches; DataFrame caches are pinned by the
    CacheManager until explicitly unpersisted, NOT GC-reclaimed)
    unpersist it once the batch is consumed."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    parts = df.withColumn("_pid", F.spark_partition_id())
    cache_handle = None
    if df.storageLevel == StorageLevel.NONE:
        parts = parts.persist()
        cache_handle = parts
    counts = {
        r._pid: r.c
        for r in parts.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    acc = int(start)
    offs = []
    for pid in sorted(counts):
        offs.append((pid, acc, int(counts[pid])))
        acc += int(counts[pid])
    off_df = spark.createDataFrame(
        offs or [(0, int(start), 0)], "_pid int, _off long, _exp long"
    )
    w = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    wcnt = Window.partitionBy("_pid")
    assigned = F.col("_off") + F.row_number().over(w) - F.lit(1)
    ok = F.col("_off").isNotNull() & (F.count("*").over(wcnt) == F.col("_exp"))
    out = (
        parts.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            id_col,
            F.when(ok, assigned).otherwise(
                F.raise_error(
                    F.lit(
                        "assign_dense_ids: row→partition mapping changed "
                        "between the counts job and the id assignment "
                        "(nondeterministic input recomputed?) — ids would "
                        "be dropped/duplicated"
                    )
                )
            ),
        )
        .drop("_pid", "_off", "_exp")
    )
    out._dense_ids_cache = cache_handle
    return out


def _dl_sum_udf():
    """Sum of a segment's varint dl blob — one value per segment row
    (the stats_ledger's sum_dl source; never one row per doc). Built
    lazily: decorating at import time needs an active SparkSession."""

    @F.pandas_udf("double")
    def dl_sum(blobs: pd.Series) -> pd.Series:
        from yaii_spark.codec import varint_decode

        return blobs.map(
            lambda b: float(varint_decode(b).sum()) if b is not None else 0.0
        )

    return dl_sum


def _filter_by_seg_ids(df: DataFrame, segs: list[int]) -> DataFrame:
    """Restrict a seg_id-partitioned table to `segs`: an In-list filter
    (static partition pruning — only those segments' directories are
    ever listed/read) when the list is small, a broadcast semi-join for
    very large lists (a 10^6-element In-list would bloat the plan).
    Callers must cast seg_id to LONG first (partition inference reads
    it back as int — the cogroup-key hazard)."""
    if len(segs) <= 4096:
        return df.filter(F.col("seg_id").isin([int(s) for s in segs]))
    seg_df = df.sparkSession.createDataFrame(
        [(int(s),) for s in segs], "seg_id long"
    )
    return df.join(F.broadcast(seg_df), "seg_id", "left_semi")


def _labeled(spark: SparkSession, desc: str, fn, *args, **kwargs):
    """Run fn under a thread-local Spark job description (guide §1.3:
    label your jobs). The build fans its independent writes out over a
    thread pool; descriptions are per-thread (pinned-thread mode), so
    each concurrent job carries its own attribution in the UI/REST."""
    sc = spark.sparkContext
    sc.setJobDescription(desc)
    try:
        return fn(*args, **kwargs)
    finally:
        sc.setJobDescription(None)


def _seg_stats_df(spark: SparkSession, out_dir: str, segs: list[int] | None) -> DataFrame:
    """(seg_id, n_docs, sum_dl) rows for `segs` (None = every durable
    segment) — the stats_ledger payload. Distributed: n_docs comes from
    the seg_meta column, sum_dl from one blob-decode per segment row."""
    meta = read_table(spark, os.path.join(out_dir, "seg_meta")).withColumn(
        "seg_id", F.col("seg_id").cast("long")
    )
    if segs is not None:
        meta = _filter_by_seg_ids(meta, segs)
    return meta.select(
        "seg_id",
        F.col("n_docs").cast("long").alias("n_docs"),
        _dl_sum_udf()(F.col("dl_bin")).alias("sum_dl"),
    )


def _check_append_geometry(spark: SparkSession, out_dir: str, seg_size: int) -> None:
    """Refuse to append with a seg_size different from the index's:
    segment geometry is GLOBAL (doc_id = seg_id*seg_size + local — the
    invariant every query path decodes against), so a mismatched append
    would derive doc ids that collide with or straddle existing
    segments. Bites after a merge, which multiplies seg_size by the
    merge factor; callers must pass the merged size.

    Fail-open ONLY when the commit marker says the index is incomplete
    (a crashed build mid-corpus_stats-write — the replay legitimately
    proceeds and rewrites it); on a COMPLETE index any read/format
    error PROPAGATES — a guard that silently disarms on a transient FS
    error would wave through the exact corruption it exists to stop.
    One 1-row read per append; no-op on a not-yet-created index."""
    from yaii_spark.storage import IndexCatalog

    cat = IndexCatalog(spark, out_dir)
    if not cat.exists():  # absent or incomplete (no commit marker)
        return
    existing = int(cat.corpus_stats().seg_size)  # format gate included
    if existing != int(seg_size):
        raise ValueError(
            f"append with seg_size={int(seg_size)} onto an index built with "
            f"seg_size={existing} — segment geometry is global "
            "(doc_id = seg_id*seg_size + local); pass the index's current "
            "seg_size (a merge multiplies it by the merge factor)"
        )


def _scoped_postings(spark: SparkSession, out_dir: str, segs: list[int]) -> DataFrame:
    """Postings restricted to `segs` (see _filter_by_seg_ids)."""
    df = read_table(spark, os.path.join(out_dir, "postings")).withColumn(
        "seg_id", F.col("seg_id").cast("long")
    )
    return _filter_by_seg_ids(df, segs)


def _write_term_stats_full(spark: SparkSession, out_dir: str, post_all: DataFrame) -> None:
    """Full term_stats recompute from ALL durable postings + stats_ledger
    rewrite — the base-build path and the torn-fold recovery path.

    Hash-bucketed by (field, term): a web-scale dictionary is 10^8-10^9
    rows — a single sorted file would be one straggler task and an
    unprunable lookup. 256 bucket dirs + in-bucket term sort give
    partition-pruned, row-group-pruned point lookups (storage.
    term_stats_for computes the same md5 bucket driver-side).

    The stats_folding marker brackets the (term_stats write → ledger
    rewrite) pair: a crash in between leaves the marker, and the next
    build repeats this full path instead of double-folding."""
    from yaii_spark.storage import term_stats_bucket_col

    ts_df = (
        post_all.groupBy("field", "term")
        .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        .withColumn("bucket", term_stats_bucket_col())
        # EXPLICIT task count (spark.sql.shuffle.partitions — several
        # buckets per task is fine, pruning is by directory): a bare
        # repartition("bucket") lets AQE coalesce this tiny-bytes
        # shuffle to ONE task, which then writes all 256 bucket dirs
        # sequentially (~3 s straggler measured at bench scale — file
        # open/footer cost, not data). Pinning the count keeps the
        # partitioned write cores-wide; at dictionary scale (10^8-10^9
        # rows) the byte sizes would prevent the collapse anyway.
        # Leading the in-task sort with `bucket` satisfies the
        # partitioned writer's required ordering, so no writer-side
        # re-sort destroys the (field, term) row-group order.
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "bucket"
        )
        .sortWithinPartitions("bucket", "field", "term")
    )
    marker = os.path.join(out_dir, "stats_folding")
    fs_touch(spark, marker)
    write_table(ts_df, os.path.join(out_dir, "term_stats"), partition_by=["bucket"])
    # ledger = every durable segment (seg_meta universe — postings-free
    # token-less segments still count docs), carrying its corpus-stat
    # contribution (n_docs, sum_dl) so append-mode corpus stats are a
    # tiny-ledger aggregate instead of a per-batch decode of EVERY
    # segment's dl blob (~1 byte/doc → corpus-scale bytes per
    # micro-batch at 10^12 docs)
    write_table(
        _seg_stats_df(spark, out_dir, None),
        os.path.join(out_dir, "stats_ledger"),
    )
    fs_delete(spark, marker)


def _fold_term_stats(spark: SparkSession, out_dir: str, new_segs: list[int]) -> None:
    """Incrementally fold NEW segments' postings into the
    bucket-partitioned term_stats dictionary (VERDICT r4 #1: the
    full-recompute-per-micro-batch was the last superlinear ingest cost
    — each small append paid a full-postings shuffle, O(whole index)).

    Per-batch cost is O(batch postings) + O(touched dictionary buckets):
    1. aggregate ONLY `new_segs`' postings (partition-pruned read),
    2. read back just the touched buckets of the existing dictionary,
       merge (sum is associative, so the result is value-identical to a
       full recompute), stage to `term_stats_delta_tmp` — Spark cannot
       overwrite a path that feeds the same job, and the durable stage
       makes the overwrite restartable,
    3. dynamic-partition-overwrite the touched bucket dirs only
       (Iceberg: replacePartitions through the same write seam),
    4. append `new_segs` to stats_ledger.
    The stats_folding marker brackets steps 3-4; a crash in between is
    detected by the next build, which recovers with a full recompute
    (build_index's `use_fold` gate).

    Stats-lag note: after a purging merge, term_stats deliberately lags
    the expunged postings (merge_segments carries it unchanged so scores
    stay byte-identical). The fold PRESERVES that lag — it only adds the
    new segments' counts — whereas a full recompute would refresh it.
    On a purge-free index the two paths are value-identical."""
    from yaii_spark.storage import term_stats_bucket_col

    delta = (
        _scoped_postings(spark, out_dir, new_segs)
        .groupBy("field", "term")
        .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        .withColumn("bucket", term_stats_bucket_col())
        .persist()
    )
    # the persist is released in the finally: the sink retries failed
    # batches, and an unpersist skipped by a transient error mid-fold
    # would pin one copy of the batch's aggregate per attempt for the
    # session lifetime (caches are not GC-reclaimed)
    try:
        _fold_term_stats_body(spark, out_dir, new_segs, delta)
    finally:
        delta.unpersist()


def _fold_term_stats_body(spark, out_dir, new_segs, delta) -> None:
    ts_path = os.path.join(out_dir, "term_stats")
    tmp_path = os.path.join(out_dir, "term_stats_delta_tmp")
    marker = os.path.join(out_dir, "stats_folding")
    touched = [int(r.bucket) for r in delta.select("bucket").distinct().collect()]
    if touched:
        merged = (
            read_table(spark, ts_path)
            .filter(F.col("bucket").isin(touched))
            .select("field", "term", "df", "cf", "bucket")
            .unionByName(delta.select("field", "term", "df", "cf", "bucket"))
            .groupBy("bucket", "field", "term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            .select("field", "term", "df", "cf", "bucket")
        )
        write_table(merged, tmp_path)

    fs_touch(spark, marker)
    if touched:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            write_table(
                read_table(spark, tmp_path)
                # explicit count for the same reason as the full path:
                # AQE would coalesce the tiny shuffle to one task and
                # serialize the per-bucket-dir file writes; bounded by
                # the touched-bucket count so no empty write tasks spin
                .repartition(
                    max(1, min(
                        len(touched),
                        int(spark.conf.get("spark.sql.shuffle.partitions")),
                    )),
                    "bucket",
                )
                .sortWithinPartitions("bucket", "field", "term"),
                ts_path,
                partition_by=["bucket"],
            )
        finally:
            if prev is not None:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # ledger rows carry the new segments' corpus-stat contribution —
    # committed in the SAME marker-guarded unit as the bucket overwrite,
    # so corpus stats and the dictionary can never disagree about which
    # segments are accounted (postings-free segments fold zero term
    # rows but still append their doc counts here)
    write_table(
        _seg_stats_df(spark, out_dir, new_segs),
        os.path.join(out_dir, "stats_ledger"),
        mode="append",
    )
    fs_delete(spark, marker)
    fs_delete(spark, tmp_path)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    seg_size: int = 1 << 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    stored_cols: list[str] | None = None,
    fields: dict[str, tuple[str, str]] | None = None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    resume: bool = True,
    max_segments: int | None = None,
    postings_shards: int | None = None,
    append: bool = False,
    _geometry_checked: bool = False,
) -> dict:
    """Build (or resume) the inverted index for `pages` under `out_dir`.

    `pages[id_col]` must be a dense 0-based long (the caller derives it;
    synth tables carry it natively). Returns build metrics.

    `fields` maps indexed field name -> (source column, analyzer name);
    defaults to {text: standard, _all: stopword-filtered} mirroring
    yaii's default field config + catch-all. Document length (dl, the
    BM25 norm) always comes from `text_col`'s standard tokenization.

    `max_segments` limits how many pending segments this invocation
    builds — used by the resumability test to simulate a mid-build kill
    (FIXTURES.md §6).

    `append=True` is the incremental-ingest mode (streaming.
    index_append_sink): `pages` is a NEW batch occupying fresh segment
    ids. Per-batch maintenance is O(batch), never O(index): term_stats
    folds only the new segments' aggregates into the bucketed
    dictionary (_fold_term_stats + stats_ledger, r5), and the final
    corpus_stats (n_docs, avgdl) aggregate the ledger's per-segment
    (n_docs, sum_dl) rows — the durable union of every batch — instead
    of re-decoding every segment's dl blob (idempotent under retries;
    a crashed batch's segments self-heal into both on the next fold).
    Appended segments' block-max bounds are computed under the
    batch-local avgdl (recorded as seg_meta.avgdl_built); BM25 pruning
    detects the drift and scores those segments exactly until a merge
    refreshes bounds.
    """
    if append and not resume:
        raise ValueError("append=True requires resume=True (checkpoint append)")
    # _geometry_checked: the streaming committer already validated the
    # geometry before making the segment range durable — re-checking
    # here would re-read corpus_stats and re-probe the commit marker on
    # every micro-batch for the same invariant
    if append and not _geometry_checked:
        _check_append_geometry(spark, out_dir, seg_size)
    if postings_shards is None:
        # shards exist to bound one encode task's memory to ~64k docs'
        # postings; small segments don't need the split, and each extra
        # shard multiplies the explode+shuffle row count (one packed row
        # per (doc, shard)) and the pandas group count. 2^20-doc
        # segments keep the historical 16 shards; ≤64k-doc segments
        # collapse to one group per segment.
        postings_shards = max(1, min(16, seg_size // 65536))
    t0 = time.time()
    # a non-resuming build over an existing index dir must not inherit
    # stale partitions: dynamic overwrite only replaces seg_ids present
    # in the NEW input, and term_stats is then recomputed from ALL
    # on-disk postings (old ∪ new) — silent stats corruption. Drop the
    # directory first, through the storage seam's Hadoop FileSystem API
    # so the delete is real on cluster/object-store paths too (the same
    # recursive drop an Iceberg REPLACE TABLE performs).
    if not resume and fs_exists(spark, out_dir):
        fs_delete(spark, out_dir)
    # dynamic partition overwrite (stage+move per partition dir) only
    # pays off when overwriting a partially-built index; fresh builds
    # use the cheap static path
    overwrite_mode = "dynamic" if fs_exists(spark, os.path.join(out_dir, "postings")) else "static"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", overwrite_mode)
    if fields is None:
        fields = {"text": (text_col, "standard"), "_all": (text_col, "all")}

    # per-field path split: fields sourced from text_col with the
    # standard/all analyzers take the fast path — per-doc (term, tf,
    # positions) computed inside the analyzer UDF (map-side combine,
    # Lucene-inverter style), which removes the (seg, field, term, doc)
    # groupBy shuffle entirely. Other fields (custom analyzers —
    # ANALYZERS keys or pandas-UDF callables like make_rule_tokenizer's
    # — or non-text sources) take the explode+groupBy path; the two
    # streams union before segment encoding, so adding one exotic field
    # never de-optimizes the default fields.
    fast_fields = {
        f: an
        for f, (src, an) in fields.items()
        if src == text_col and an in ("standard", "all")
    }
    slow_fields = {f: sa for f, sa in fields.items() if f not in fast_fields}
    # a field's source may be a LIST of columns — yaii's addToAllField
    # collects every field's values into £_ALL (base-inverted-index.ts:
    # 141-161); the token streams concatenate in list order with
    # sequential positions, exactly the reference's append semantics
    slow_srcs = sorted({
        s
        for (src, _an) in slow_fields.values()
        for s in (src if isinstance(src, (list, tuple)) else [src])
    })
    # tokenize input: ONLY the columns the analyzer consumers need —
    # the persisted batch must never hold the wide page row (the html
    # binary in particular): at web scale the cached bytes ARE the
    # build's memory-bandwidth bill, and the stats/meta/postings
    # consumers only touch (id, seg ids, dl, packed blobs). The stored
    # columns reach the docs table straight from source (below).
    tok_cols = list(dict.fromkeys([id_col, text_col, *slow_srcs]))
    tok_in = pages.select(*tok_cols)
    # keep the tokenize stage wide: small inputs (or few parquet files)
    # would otherwise run the analyzer UDF on 1-2 cores. At 100 TB the
    # input has far more splits than cores and this is a no-op — and
    # the shuffle moves only the narrow projection, never html bytes.
    par = spark.sparkContext.defaultParallelism
    if tok_in.rdd.getNumPartitions() < par:
        tok_in = tok_in.repartition(par * 2)
    # dl (the BM25 norm) always comes from text_col's standard
    # tokenization; the same UDF pass packs the fast fields' inverted
    # entries into per-shard binary blobs (analyzer.doc_postings — the
    # Arrow-nested-struct layout this replaces was ~95% of the stage)
    fast_names = sorted(fast_fields)
    fast_specs = [(i, fast_fields[f]) for i, f in enumerate(fast_names)]
    dp_udf = make_doc_postings_udf(postings_shards, fast_specs)
    docs = (
        tok_in.withColumn("_dp", dp_udf(F.col(text_col)))
        # a null text field indexes as a token-free doc (dl 0, no
        # postings — explode of the null blob array drops the row),
        # like the reference's termizer on a missing field; without the
        # coalesce a single null page would crash the dl-blob encoder
        .withColumn("dl", F.coalesce(F.col("_dp.dl").cast("long"), F.lit(0)))
        .withColumn("seg_id", (F.col(id_col) / F.lit(seg_size)).cast("long"))
    )
    docs = docs.withColumn(
        "local_id", (F.col(id_col) - F.col("seg_id") * F.lit(seg_size)).cast("long")
    )
    docs = docs.withColumn("base_doc_id", F.col("seg_id") * F.lit(seg_size))
    docs = docs.select(
        *dict.fromkeys(
            [id_col, "seg_id", "local_id", "base_doc_id", "dl", "_dp", *slow_srcs]
        )
    )
    # tokenize exactly once: every downstream pass (stats, seg_meta,
    # postings) reuses the cached narrow tokenized batch
    docs = docs.persist()

    # ---- corpus stats + segment list in ONE job (stable across resumes) ----
    stats_row = _labeled(
        spark, "build:tokenize+stats",
        lambda: docs.agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.collect_set("seg_id").alias("segs"),
        ).collect(),
    )[0]
    n_total = int(stats_row["n"])
    if n_total == 0:
        # an upstream filter that matched nothing: fail loudly instead
        # of writing a half-formed index (avgdl undefined, no postings
        # dir) that exists() would later misreport
        raise ValueError("build_index: input has 0 rows — nothing to index")
    avgdl = float(stats_row["avgdl"])
    all_segs = sorted(stats_row["segs"])

    # ---- resume: skip segments already checkpointed. pending is
    # computed as an ANTI-JOIN against the done checkpoints and only the
    # (bounded: ⊆ this batch's segments) pending list is collected — the
    # done set accumulates over every batch ever appended (~10^6 rows at
    # the design point) and must never be driver-materialized
    # (VERDICT r4 #3) ----
    ckpt_path = os.path.join(out_dir, "checkpoints")
    pending = list(all_segs)
    if resume and fs_exists(spark, ckpt_path):
        try:
            seg_df = spark.createDataFrame(
                [(int(s),) for s in all_segs], "seg_id long"
            )
            done_df = (
                read_table(spark, ckpt_path)
                .filter("status = 'done'")
                .select(F.col("seg_id").cast("long").alias("seg_id"))
            )
            pending = sorted(
                r.seg_id for r in seg_df.join(done_df, "seg_id", "left_anti").collect()
            )
        except Exception:
            pending = list(all_segs)
    n_skipped = len(all_segs) - len(pending)
    if max_segments is not None:
        pending = pending[:max_segments]

    metrics = {
        "n_docs_total": n_total,
        "avgdl": avgdl,
        "segments_total": len(all_segs),
        "segments_skipped": n_skipped,
        "segments_built": len(pending),
    }

    if pending:
        # broadcast semi-join, not isin([...]): an In-list over 10^6
        # pending seg_ids would bloat the plan and evaluate O(n) per row
        pend_df = spark.createDataFrame(
            [(int(s),) for s in pending], "seg_id long"
        )
        batch = docs.join(F.broadcast(pend_df), "seg_id", "left_semi")

        # ---- docs table (stored fields) — read straight from SOURCE:
        # seg/local ids are pure arithmetic on id_col, so the stored
        # columns (html binaries included) never pass through the
        # cached tokenized batch; this write is a column-pruned
        # source-to-sink copy ----
        stored = [
            c for c in (stored_cols or [c for c in pages.columns if c != id_col])
        ]
        docs_df = (
            pages.withColumn(
                "seg_id", (F.col(id_col) / F.lit(seg_size)).cast("long")
            )
            .withColumn(
                "local_id",
                (F.col(id_col) - F.col("seg_id") * F.lit(seg_size)).cast("long"),
            )
            .join(F.broadcast(pend_df), "seg_id", "left_semi")
            .select(*dict.fromkeys([id_col, "seg_id", "local_id", *stored]))
        )

        # ---- per-segment doc-length blobs (JVM agg + tiny encode UDF:
        # one row per segment reaches Python, not one per doc) ----
        meta_df = (
            batch.groupBy("seg_id", "base_doc_id")
            .agg(
                F.sort_array(F.collect_list(F.struct("local_id", "dl"))).alias("ld")
            )
            .select("seg_id", "base_doc_id", _encode_dl_udf(F.col("ld")).alias("m"))
            .select(
                "seg_id", F.col("m.n_docs").alias("n_docs"), "base_doc_id",
                F.col("m.dl_bin").alias("dl_bin"),
                F.lit(float(avgdl)).alias("avgdl_built"),
                F.lit(None).cast("binary").alias("deleted_bin"),
            )
        )

        # ---- postings (multi-field: yaii indexes every searchable
        # field separately + the £_ALL catch-all) ----
        # fast fields: the analyzer UDF already inverted each doc into
        # per-shard packed entry blobs — explode to ONE row per
        # (doc, shard) (≈16 rows/doc instead of ~|unique terms| struct
        # rows), shuffle by (seg, shard), decode + encode per task.
        # Sharding by term hash bounds task memory: one task never
        # holds a whole 2^20-doc segment's postings, and shards stay
        # term-complete so each (field, term) is built exactly once.
        enc = None
        if fast_fields:
            packed = batch.select(
                "seg_id",
                F.col(id_col).alias("doc_id"),
                "dl",
                F.explode("_dp.blobs").alias("b"),
            ).select(
                "seg_id", "doc_id", "dl",
                F.col("b.shard").alias("shard"),
                F.col("b.data").alias("data"),
            )
            enc = packed.groupBy("seg_id", "shard").applyInPandas(
                _make_packed_encoder(fast_names, avgdl, k1, b),
                schema=_POSTINGS_SCHEMA,
            )
        # slow fields: tokenize → posexplode → per-doc groupBy (one
        # extra shuffle, scoped to these fields only). `analyzer` may be
        # an ANALYZERS key or any column-fn (e.g. make_rule_tokenizer's
        # pandas UDF) — the X1 analyzer extension point.
        slow_parts = []
        for fname, (src, analyzer) in sorted(slow_fields.items()):
            an = analyzer if callable(analyzer) else ANALYZERS[analyzer]
            if isinstance(src, (list, tuple)):
                # multi-source field: concat per-source token arrays →
                # ONE posexplode with sequential positions (null
                # sources contribute nothing, not a null concat)
                tcol = F.concat(
                    *[
                        F.coalesce(an(F.col(s)), F.array().cast("array<string>"))
                        for s in src
                    ]
                )
            else:
                tcol = an(F.col(src))
            slow_parts.append(
                batch.select(
                    "seg_id",
                    F.col(id_col).alias("doc_id"),
                    "dl",
                    F.lit(fname).alias("field"),
                    F.posexplode(tcol).alias("pos", "term"),
                )
            )
        if slow_parts:
            tok = slow_parts[0]
            for p in slow_parts[1:]:
                tok = tok.unionByName(p)
            # null tokens are position-gap sentinels (multivalue
            # analyzers with position_gap>0): posexplode numbered them,
            # dropping them here leaves the gap in the position space
            # without ever indexing a posting
            tok = tok.filter(F.col("term").isNotNull())
            tfpos = tok.groupBy("seg_id", "field", "term", "doc_id", "dl").agg(
                F.count("*").alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            ).withColumn(
                "shard", F.pmod(F.xxhash64("field", "term"), F.lit(postings_shards))
            )
            enc_slow = tfpos.groupBy("seg_id", "shard").applyInPandas(
                _make_segment_encoder(avgdl, k1, b), schema=_POSTINGS_SCHEMA
            )
            enc = enc_slow if enc is None else enc.unionByName(enc_slow)
        # the three table writes are independent (all read the persisted
        # tokenized batch, whose blocks were materialized by the stats
        # job above) — submit them as CONCURRENT Spark jobs so their
        # driver-side latencies (planning, file listing, commit) overlap
        # and idle cores of the shorter jobs feed the longest one.
        # Checkpoints stay strictly AFTER all three (resume correctness).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(
                    _labeled, spark, "build:docs-write",
                    write_table, docs_df, os.path.join(out_dir, "docs"),
                    partition_by=["seg_id"],
                ),
                pool.submit(
                    _labeled, spark, "build:seg-meta-write",
                    write_table, meta_df, os.path.join(out_dir, "seg_meta"),
                    partition_by=["seg_id"],
                ),
                pool.submit(
                    _labeled, spark, "build:postings-write",
                    write_table,
                    enc.repartition("seg_id").sortWithinPartitions("field", "term"),
                    os.path.join(out_dir, "postings"),
                    partition_by=["seg_id"],
                ),
            ]
            for f in futs:
                f.result()

        # ---- checkpoints / lineage (after postings are durable) ----
        # the lineage counts read ONLY the batch's segments' postings:
        # partition-pruned in append mode (the sink's per-batch hot
        # path must never rescan the whole index), the full cached read
        # in batch mode where the term-stats recompute needs it anyway.
        # Lineage rows are written distributed (no per-segment collect —
        # at 10^6 segments the driver never materializes the counts).
        # Both consumers (seg_counts, _write_term_stats_full) aggregate
        # only these five narrow columns — project BEFORE caching so the
        # read-back scan prunes the posting/position blob columns (the
        # overwhelming majority of the table's bytes) and the cache
        # holds stats-sized rows, not the whole index
        _STATS_COLS = ["seg_id", "field", "term", "df_local", "cf_local"]
        if append:
            post_scope = (
                _scoped_postings(spark, out_dir, pending)
                .select(*_STATS_COLS).cache()
            )
            seg_counts_src = post_scope
        else:
            post_scope = (
                read_table(spark, os.path.join(out_dir, "postings"))
                .select(*_STATS_COLS).cache()
            )
            seg_counts_src = post_scope.join(
                F.broadcast(pend_df), "seg_id", "left_semi"
            )
        wall = time.time() - t0
        seg_counts = seg_counts_src.groupBy("seg_id").agg(
            F.sum("df_local").alias("n_postings_docs"), F.count("*").alias("n_terms")
        )
        ck = (
            pend_df.join(seg_counts, "seg_id", "left")
            .na.fill(0, ["n_postings_docs", "n_terms"])
            .select(
                "seg_id", "n_postings_docs", "n_terms",
                F.lit(float(wall)).alias("wall_sec"),
                F.lit("done").alias("status"),
            )
        )
        ck_mode = "append" if (resume and fs_exists(spark, ckpt_path)) else "overwrite"
    else:
        ck = None
        post_scope = None

    # ---- corpus-wide term stats. Append mode folds ONLY the new
    # segments' aggregates into the bucket-partitioned dictionary
    # (_fold_term_stats — O(batch) per micro-batch, not O(index));
    # batch mode (and fold-recovery: torn-fold marker present, or a
    # pre-ledger index) recomputes from ALL durable postings
    # (_write_term_stats_full — correct under resume because postings
    # are the source of truth). `unfolded` is every durable segment the
    # ledger doesn't cover yet — normally exactly this batch's pending
    # list, but a crash between a previous batch's postings commit and
    # its fold self-heals here. ----
    from yaii_spark.storage import FORMAT_VERSION

    marker_path = os.path.join(out_dir, "stats_folding")
    ledger_path = os.path.join(out_dir, "stats_ledger")
    use_fold = (
        append
        and not fs_exists(spark, marker_path)
        and fs_exists(spark, ledger_path)
    )
    unfolded: list[int] = []
    if use_fold:
        led = read_table(spark, ledger_path)
        if "n_docs" not in led.columns:
            # one-time migration of an early-r5 seg_id-only ledger:
            # enrich with (n_docs, sum_dl) from seg_meta, marker-guarded
            # (a torn rewrite falls back to the full recompute)
            seg_list = [int(r.seg_id) for r in led.select("seg_id").distinct().collect()]
            fs_touch(spark, marker_path)
            write_table(_seg_stats_df(spark, out_dir, seg_list), ledger_path)
            fs_delete(spark, marker_path)
            led = read_table(spark, ledger_path)
        folded = led.select(F.col("seg_id").cast("long").alias("seg_id"))
        # durable universe = prior checkpoints ∪ THIS batch's pending
        # (its checkpoint rows land concurrently with the fold, in the
        # next pool). Checkpoints are UNPARTITIONED — one row per built
        # segment, the same source resume trusts — unlike seg_meta,
        # whose per-segment partition dirs make the listing itself
        # O(#segments) FS calls per batch. A checkpointed segment's
        # postings/meta are durable (written before the ck pool); a
        # crashed batch that died before its checkpoints is re-driven
        # whole by the sink's replay, which re-enters here.
        seg_ids = (
            read_table(spark, ckpt_path)
            .filter("status = 'done'")
            .select(F.col("seg_id").cast("long").alias("seg_id"))
            .union(
                spark.createDataFrame(
                    [(int(s),) for s in pending] or [(int(-1),)], "seg_id long"
                ).filter(F.col("seg_id") >= 0)
            )
            .distinct()
        )
        unfolded = sorted(
            r.seg_id for r in seg_ids.join(folded, "seg_id", "left_anti").collect()
        )

    def _ts_task():
        if use_fold:
            if unfolded:
                _fold_term_stats(spark, out_dir, unfolded)
            return
        post_all = (
            post_scope
            if (post_scope is not None and not append)
            else read_table(spark, os.path.join(out_dir, "postings"))
        )
        _write_term_stats_full(spark, out_dir, post_all)

    # lineage (ck) and term_stats are independent (in batch mode they
    # share the cached post_scope; concurrent computes of the same
    # cached blocks are block-manager-serialized) — overlap them.
    # corpus_stats is the index-completeness COMMIT MARKER
    # (IndexCatalog.exists checks it), so it is written strictly AFTER
    # both futures resolve: a failed term_stats/lineage write must never
    # leave an index that reports complete (readers would silently prune
    # every term to empty).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_labeled, spark, "build:term-stats", _ts_task)]
        if ck is not None:
            futs.append(pool.submit(
                _labeled, spark, "build:lineage",
                write_table, ck, ckpt_path, mode=ck_mode,
            ))
        for f in futs:
            f.result()
    if append:
        # corpus stats over the durable UNION of every appended batch —
        # aggregated from the stats_ledger (one tiny row per segment,
        # complete after _ts_task folded/recomputed), NOT by re-decoding
        # every segment's dl blob: those blobs are ~1 byte/doc, so the
        # per-batch blob scan this replaces read corpus-scale BYTES
        # (~1 TB per micro-batch at 10^12 docs) even though it was only
        # 10^6 rows (r5; the last O(corpus) term in the append path)
        srow = (
            read_table(spark, ledger_path)
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
            .collect()[0]
        )
        metrics["n_docs_batch"] = n_total
        n_total = int(srow["n"])
        avgdl = float(srow["s"]) / n_total
        metrics["n_docs_total"] = n_total
        metrics["avgdl"] = avgdl
    cs_df = spark.createDataFrame(
        [(n_total, avgdl, float(k1), float(b), int(seg_size), BLOCK_SIZE,
          FORMAT_VERSION)],
        "n_docs long, avgdl double, k1 double, b double, seg_size long, "
        "block_size long, format_version long",
    )
    write_table(cs_df, os.path.join(out_dir, "corpus_stats"))
    if post_scope is not None:
        post_scope.unpersist()

    docs.unpersist()
    metrics["wall_sec"] = time.time() - t0
    built = metrics.get("n_docs_batch", n_total)  # batch size in append mode
    metrics["docs_per_sec"] = built / metrics["wall_sec"] if metrics["wall_sec"] else 0.0
    return metrics


def delete_docs_df(spark: SparkSession, index_dir: str, ids: DataFrame,
                   id_col: str = "doc_id") -> int:
    """Distributed bulk tombstoning: `ids` is any DataFrame of doc ids
    (e.g. the output of a dedup cluster assignment filtered to
    non-survivors) — tombstone rows are derived and written without the
    ids ever touching the driver (VERDICT r3 #6: a 100-TB bulk delete
    can tombstone billions of docs). Returns the count added."""
    from yaii_spark.storage import IndexCatalog

    seg_size = IndexCatalog(spark, index_dir).corpus_stats().seg_size
    df = (
        ids.select(F.col(id_col).cast("long").alias("doc_id"))
        .distinct()
        .select(
            (F.col("doc_id") / F.lit(seg_size)).cast("long").alias("seg_id"),
            "doc_id",
        )
    )
    path = os.path.join(index_dir, "tombstones")
    mode = "append" if fs_exists(spark, path) else "overwrite"
    write_table(df, path, mode=mode)
    return df.count()


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list[int]) -> int:
    """Tombstone docs (the reference's removeDocument,
    mutable-segment.ts:191-197 — immutable segments there throw
    NotImplemented; ours works uniformly). Appends (seg_id, doc_id)
    rows; queries anti-join / subtract them. Returns count added.

    List-in convenience form of `delete_docs_df` (which is the scale
    path — nothing corpus-sized should pass through this driver list)."""
    df = spark.createDataFrame(
        [(int(d),) for d in sorted(set(doc_ids))], "doc_id long"
    )
    return delete_docs_df(spark, index_dir, df)


def refresh_block_bounds(spark: SparkSession, index_dir: str) -> dict:
    """Recompute block-max bounds for segments whose bounds were built
    under a different corpus avgdl (streaming appends drift it; bm25
    falls back to exact scoring for such segments). A full merge also
    refreshes bounds — this is the cheap in-place form: only STALE
    segments' postings partitions are rewritten (ids/tfs re-encoded to
    identical bytes; only block_maxes/max_norm change), then their
    seg_meta rows flip avgdl_built to the current corpus avgdl.

    Crash-safe ordering: postings first, seg_meta flip second — a crash
    in between leaves avgdl_built stale, so the scorer keeps using the
    (always rank-safe) exact path; nothing ever trusts a bound that
    wasn't rewritten. Scores themselves never change (bounds only gate
    pruning). Returns {"segments_refreshed": n}.
    """
    from yaii_spark.storage import IndexCatalog

    cat = IndexCatalog(spark, index_dir)
    stats = cat.corpus_stats()
    avgdl, k1, b, block = stats.avgdl, stats.k1, stats.b, stats.block_size
    stale = [
        int(r.seg_id)
        for r in cat.seg_meta().filter(F.col("avgdl_built") != avgdl).collect()
    ]
    if not stale:
        return {"segments_refreshed": 0}
    stale_df = spark.createDataFrame([(s,) for s in stale], "seg_id long")
    meta = cat.seg_meta().join(F.broadcast(stale_df), "seg_id", "left_semi")
    post = cat.postings().join(F.broadcast(stale_df), "seg_id", "left_semi")

    def rewrite(post_pdf: pd.DataFrame, meta_pdf: pd.DataFrame) -> pd.DataFrame:
        from yaii_spark.codec import delta_decode_blocked, varint_decode

        if post_pdf.empty:  # a postings-free segment (all-null texts)
            return post_pdf
        base = int(meta_pdf["base_doc_id"].iloc[0])
        dls = varint_decode(meta_pdf["dl_bin"].iloc[0]).astype(np.float64)
        bmaxes, mnorms = [], []
        for ids_b, tfs_b in zip(post_pdf["doc_ids_bin"], post_pdf["tfs_bin"]):
            ids = delta_decode_blocked(ids_b, block).astype(np.int64) - base
            tfs = varint_decode(tfs_b)
            norms = _tf_norm(tfs, dls[ids].astype(np.int64), avgdl, k1, b)
            nblocks = math.ceil(ids.size / block)
            bmaxes.append(
                [float(norms[i * block : (i + 1) * block].max()) for i in range(nblocks)]
            )
            mnorms.append(float(norms.max()) if norms.size else 0.0)
        out = post_pdf.copy()
        out["block_maxes"] = bmaxes
        out["max_norm"] = mnorms
        return out

    refreshed = (
        post.groupBy("seg_id")
        .cogroup(meta.select("seg_id", "base_doc_id", "dl_bin").groupBy("seg_id"))
        .applyInPandas(rewrite, schema=_POSTINGS_SCHEMA)
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    write_table(
        refreshed.repartition("seg_id").sortWithinPartitions("field", "term"),
        os.path.join(index_dir, "postings"),
        partition_by=["seg_id"],
    )
    # flip avgdl_built strictly AFTER the bounds are durable
    new_meta = meta.withColumn("avgdl_built", F.lit(float(avgdl))).select(
        "seg_id", "n_docs", "base_doc_id", "dl_bin", "avgdl_built", "deleted_bin"
    )
    write_table(
        new_meta, os.path.join(index_dir, "seg_meta"), partition_by=["seg_id"]
    )
    return {"segments_refreshed": len(stale)}


MERGE_SHARDS = 16  # term-hash shards per merged segment (task sizing)


def merge_segments(
    spark: SparkSession, index_dir: str, out_dir: str, factor: int
) -> dict:
    """Compact `factor` adjacent segments into one (the reference's
    planned-but-stubbed merge, base-inverted-index.ts:536-548).

    Fully distributed — nothing corpus-sized ever touches the driver:

    1. seg_meta merges per new_seg (dl blobs placed at their offsets).
    2. postings group by (new_seg, term-hash shard) and COGROUP with the
       merged seg_meta (replicated per shard, ≤ MERGE_SHARDS copies of
       each dl blob on the wire — never a driver collect/broadcast of
       all blobs, which at 10^12 docs would be TB of driver memory).
       Within a task, each (field, term)'s runs concatenate in old-seg
       order — docIDs of adjacent segments are disjoint ascending
       ranges, so concatenation preserves sort order and no renumbering
       happens (the payoff of the seg_id*seg_size+local docID design);
       block maxes are recomputed against the merged dl array.
    3. Tombstoned docs are EXPUNGED (Lucene expunges deletes at merge —
       the point of compaction): their postings entries, position
       ranges and docs-table rows are dropped, and the tombstone table
       is not carried over. Because docIDs are never renumbered, the
       purged local ids are recorded in the merged seg_meta
       (`deleted_bin`) so NOT/ALL universes exclude the holes. Corpus
       term_stats / n_docs / avgdl carry over UNCHANGED, keeping every
       query (BM25 scores included) byte-identical pre/post merge —
       the same stats-lag Lucene accepts until a stats refresh.
    """
    # IndexCatalog.corpus_stats enforces the format_version check —
    # merging a pre-v5 index must fail loudly, not emit garbage
    from yaii_spark.storage import FORMAT_VERSION, IndexCatalog

    cat_in = IndexCatalog(spark, index_dir)
    stats = cat_in.corpus_stats()
    seg_size, avgdl, k1, b = stats.seg_size, stats.avgdl, stats.k1, stats.b
    block_size = stats.block_size
    new_size = seg_size * factor

    # seg_id returns from the partitioned layout as INT (partition
    # inference); cast to LONG everywhere a cogroup key derives from it
    # — int-vs-long key sides hash-partition differently and the
    # cogroup silently mis-aligns (storage.IndexCatalog._seg_long)
    meta = cat_in.seg_meta()
    post = cat_in.postings()

    # deployment guard (VERDICT r4: measured 2× phrase-eval slowdown at
    # 4 segments / 8 cores): per-term query stages (phrase position
    # decode, BM25 block decode) parallelize BY SEGMENT, so merging
    # below the core count caps their task count. Never binds at scale
    # (10^6 segments / 1000 executors); warns on over-compaction.
    import warnings

    n_before = meta.select("seg_id").distinct().count()
    n_after_est = (
        meta.select((F.col("seg_id") / factor).cast("long")).distinct().count()
    )
    par = spark.sparkContext.defaultParallelism
    if n_after_est < par:
        warnings.warn(
            f"merge_segments: factor {factor} leaves {n_after_est} segments "
            f"< defaultParallelism ({par}); BM25 stages parallelize "
            f"by segment, so this caps their task count — consider factor "
            f"≤ {max(1, n_before // par)}. Boolean/phrase queries "
            f"auto-compensate via doc-id-range splitting "
            f"(executor._range_split_plan)",
            RuntimeWarning,
            stacklevel=2,
        )

    # ---- per-new-segment purge blobs: tombstoned LOCAL ids (plus any
    # holes a previous purging merge already recorded in deleted_bin),
    # delta+varint-encoded — one small blob per merged segment, joined
    # (never collected) onto the meta stream ----
    tomb = cat_in.tombstones()
    tomb_new = None
    if tomb is not None:
        from yaii_spark.codec import delta_encode as _denc

        def encode_tomb(pdf: pd.DataFrame) -> pd.DataFrame:
            new_seg = int(pdf["new_seg"].iloc[0])
            local = np.unique(pdf["doc_id"].to_numpy(dtype=np.int64)) - new_seg * new_size
            return pd.DataFrame(
                {"new_seg": [new_seg], "tomb_bin": [_denc(local.astype(np.uint64))]}
            )

        tomb_new = (
            tomb.select(
                ((F.col("doc_id") / F.lit(new_size)).cast("long")).alias("new_seg"),
                "doc_id",
            )
            .groupBy("new_seg")
            .applyInPandas(encode_tomb, schema="new_seg long, tomb_bin binary")
        )

    # ---- merged seg_meta: place old dl blobs at their offsets; fold
    # prior deleted_bin holes and fresh tombstones into the merged
    # deleted_bin ----
    def merge_meta(pdf: pd.DataFrame) -> pd.DataFrame:
        from yaii_spark.codec import delta_decode, delta_encode, varint_decode

        pdf = pdf.sort_values("base_doc_id")
        new_seg = int(pdf["base_doc_id"].iloc[0]) // new_size
        new_base = new_seg * new_size
        top = int(pdf["base_doc_id"].iloc[-1]) + int(pdf["n_docs"].iloc[-1])
        dls = np.zeros(top - new_base, dtype=np.uint64)
        purged = []
        for _, r in pdf.iterrows():
            off = int(r["base_doc_id"]) - new_base
            d = varint_decode(r["dl_bin"])
            dls[off : off + d.size] = d
            if r.get("deleted_bin") is not None:
                purged.append(delta_decode(r["deleted_bin"]).astype(np.int64) + off)
        tb = pdf["tomb_bin"].iloc[0] if "tomb_bin" in pdf.columns else None
        if tb is not None:
            purged.append(delta_decode(tb).astype(np.int64))
        dele = (
            delta_encode(np.unique(np.concatenate(purged)).astype(np.uint64))
            if purged
            else None
        )
        return pd.DataFrame(
            {
                "seg_id": [new_seg],
                "n_docs": [int(dls.size)],
                "base_doc_id": [new_base],
                "dl_bin": [varint_encode(dls)],
                "avgdl_built": [float(avgdl)],
                "deleted_bin": [dele],
            }
        )

    meta_keyed = meta.withColumn("new_seg", (F.col("seg_id") / factor).cast("long"))
    if tomb_new is not None:
        meta_keyed = meta_keyed.join(tomb_new, "new_seg", "left")
    new_meta = meta_keyed.groupBy("new_seg").applyInPandas(
        merge_meta, schema=_SEG_META_SCHEMA
    )
    write_table(new_meta, os.path.join(out_dir, "seg_meta"), partition_by=["seg_id"])

    def merge_shard(post_pdf: pd.DataFrame, meta_pdf: pd.DataFrame) -> pd.DataFrame:
        from yaii_spark.codec import (
            block_offsets_from_lengths,
            delta_decode,
            delta_decode_blocked,
            delta_encode_blocked,
            position_byte_lengths,
            varint_decode,
            varint_encode,
            varint_encode_blocked,
            varint_lengths,
        )

        cols = [
            "seg_id", "field", "term", "df_local", "cf_local",
            "doc_ids_bin", "tfs_bin", "pos_bin", "block_maxes", "max_norm",
            "block_id_offs", "block_tf_offs", "block_first_ids",
            "block_pos_offs",
        ]
        if post_pdf.empty:
            # a (new_seg, shard) key can arrive meta-only from the
            # cogroup; the empty frame must use OBJECT dtype columns —
            # pd.DataFrame({c: []}) defaults them to float64, which
            # Arrow cannot convert to the list/binary output types
            # (ArrowNotImplementedError first seen at a 1M-doc merge)
            return pd.DataFrame(columns=cols, dtype=object)
        new_seg = int(post_pdf["new_seg"].iloc[0])
        base = new_seg * new_size
        if meta_pdf.empty:
            # cannot happen when keys align (meta is replicated to every
            # shard); fail with the cause instead of an opaque iloc error
            raise ValueError(
                f"merge: no seg_meta for (new_seg={new_seg}) — cogroup "
                "key misalignment (check seg_id key types)"
            )
        dls = varint_decode(meta_pdf["dl_bin"].iloc[0]).astype(np.float64)
        db = meta_pdf["deleted_bin"].iloc[0]
        purged_local = (
            delta_decode(db).astype(np.int64) if db is not None else None
        )
        post_pdf = post_pdf.sort_values(["field", "term", "seg_id"], kind="mergesort")
        out = {c: [] for c in cols}
        for (field, term), g in post_pdf.groupby(["field", "term"], sort=False):
            ids = np.concatenate(
                [delta_decode_blocked(x, block_size) for x in g["doc_ids_bin"]]
            )
            tfs = np.concatenate([varint_decode(x) for x in g["tfs_bin"]])
            local = (ids - base).astype(np.int64)
            # position streams: per-doc deltas restart at doc
            # boundaries, and doc order is just the old-segment concat
            # order — so the merged stream is the VERBATIM byte concat
            # (LEB128 here is canonical, so this equals a re-encode);
            # only per-doc byte lengths are derived (one vectorized
            # varint_lengths pass) for the block offsets. No per-doc
            # decode loop — at 1M docs that loop dominated merge time.
            pos_cat = b"".join(g["pos_bin"])
            keep = None
            if purged_local is not None and purged_local.size:
                k_ = ~np.isin(local, purged_local, assume_unique=True)
                if not k_.all():
                    keep = k_
            if keep is not None:
                # expunge deletes: drop purged docs' postings + their
                # position delta runs (element mask, still vectorized)
                deltas = varint_decode(pos_cat)
                keep_elem = np.repeat(keep, tfs.astype(np.int64))
                kept = deltas[keep_elem]
                ids, local = ids[keep], local[keep]
                tfs = tfs[keep]
                if ids.size == 0:
                    continue  # every posting was deleted — drop the term
                pos_bin_b = varint_encode(kept)
                cs = np.concatenate(([0], np.cumsum(varint_lengths(kept))))
                ends_ix = np.cumsum(tfs.astype(np.int64))
                doc_lens = cs[ends_ix] - cs[ends_ix - tfs.astype(np.int64)]
            else:
                pos_bin_b = pos_cat
                doc_lens = position_byte_lengths(pos_cat, tfs.astype(np.int64))
            norms = _tf_norm(tfs, dls[local], avgdl, k1, b)
            nblocks = math.ceil(ids.size / block_size)
            bmax = [
                float(norms[i * block_size : (i + 1) * block_size].max())
                for i in range(nblocks)
            ]
            out["seg_id"].append(new_seg)
            out["field"].append(field)
            out["term"].append(term)
            out["df_local"].append(int(ids.size))
            out["cf_local"].append(int(tfs.sum()))
            ids_bin, id_offs = delta_encode_blocked(ids, block_size)
            tfs_bin, tf_offs = varint_encode_blocked(tfs, block_size)
            out["doc_ids_bin"].append(ids_bin)
            out["tfs_bin"].append(tfs_bin)
            out["block_id_offs"].append([int(x) for x in id_offs])
            out["block_tf_offs"].append([int(x) for x in tf_offs])
            out["block_first_ids"].append([int(x) for x in ids[::block_size]])
            out["pos_bin"].append(pos_bin_b)
            out["block_pos_offs"].append(
                [int(x) for x in block_offsets_from_lengths(doc_lens, block_size)]
            )
            out["block_maxes"].append(bmax)
            out["max_norm"].append(float(norms.max()) if norms.size else 0.0)
        if not out["seg_id"]:
            return pd.DataFrame(columns=cols, dtype=object)
        return pd.DataFrame(out)

    out_schema = _POSTINGS_SCHEMA
    shard = F.pmod(F.xxhash64("field", "term"), F.lit(MERGE_SHARDS))
    posts = (
        post.withColumn("new_seg", (F.col("seg_id") / factor).cast("long"))
        .withColumn("shard", shard)
    )
    # replicate each merged dl blob (and its purge blob) to every shard
    # of its segment (seg_id cast long: cogroup key alignment — see the
    # meta/post reads above)
    meta_sharded = (
        read_table(spark, os.path.join(out_dir, "seg_meta"))
        .select(
            F.col("seg_id").cast("long").alias("new_seg"), "dl_bin", "deleted_bin"
        )
        .crossJoin(spark.range(MERGE_SHARDS).select(F.col("id").alias("shard")))
    )
    write_table(
        posts.groupBy("new_seg", "shard")
        .cogroup(meta_sharded.groupBy("new_seg", "shard"))
        .applyInPandas(merge_shard, schema=out_schema)
        .repartition("seg_id")
        .sortWithinPartitions("field", "term"),
        os.path.join(out_dir, "postings"),
        partition_by=["seg_id"],
    )

    # docs table carries over re-keyed — minus expunged docs
    docs = read_table(spark, os.path.join(index_dir, "docs"))
    if tomb is not None:
        docs = docs.join(tomb.select("doc_id"), "doc_id", "left_anti")
    write_table(
        docs.withColumn("seg_id", (F.col("seg_id") / factor).cast("long"))
        .withColumn("local_id", F.col("doc_id") - F.col("seg_id") * F.lit(new_size)),
        os.path.join(out_dir, "docs"),
        partition_by=["seg_id"],
    )
    # corpus-wide term stats / n_docs / avgdl carry over UNCHANGED even
    # when deletes are expunged (see docstring: keeps scores identical;
    # explicit bucket-led sort keeps the writer from re-sorting rows)
    write_table(
        read_table(spark, os.path.join(index_dir, "term_stats"))
        .sortWithinPartitions("bucket", "field", "term"),
        os.path.join(out_dir, "term_stats"),
        partition_by=["bucket"],
    )
    # stats_ledger: the carried dictionary covers every merged segment,
    # so the first post-merge append folds incrementally instead of
    # falling back to a full recompute (_fold_term_stats). Rows carry
    # (n_docs, sum_dl) from the MERGED seg_meta — purged docs keep
    # their dl values in dl_bin, so the ledger totals equal the
    # carried-over corpus stats (the same stats lag, by construction).
    write_table(
        _seg_stats_df(spark, out_dir, None),
        os.path.join(out_dir, "stats_ledger"),
    )
    post_new = read_table(spark, os.path.join(out_dir, "postings"))
    ck = post_new.groupBy("seg_id").agg(
        F.sum("df_local").alias("n_postings_docs"), F.count("*").alias("n_terms")
    ).select(
        "seg_id", "n_postings_docs", "n_terms",
        F.lit(0.0).alias("wall_sec"), F.lit("done").alias("status"),
    )
    write_table(ck, os.path.join(out_dir, "checkpoints"))
    # NO tombstone carry-over: deletes were expunged above (holes are
    # recorded in seg_meta.deleted_bin for the NOT/ALL universe).
    # corpus_stats is written STRICTLY LAST — it is the commit marker
    # IndexCatalog.exists() trusts, and a crash before this point must
    # leave an index that reports incomplete, not one missing its
    # checkpoints (ADVICE r3: same ordering invariant as build_index).
    write_table(
        spark.createDataFrame(
            [(stats.n_docs, avgdl, k1, b, new_size, block_size, FORMAT_VERSION)],
            "n_docs long, avgdl double, k1 double, b double, seg_size long, "
            "block_size long, format_version long",
        ),
        os.path.join(out_dir, "corpus_stats"),
    )
    n_after = read_table(spark, os.path.join(out_dir, "seg_meta")).count()
    return {"segments_before": n_before, "segments_after": n_after}
