"""Index storage layout + catalog.

Layout (SURVEY.md §7.0). An index directory holds five tables:

    <root>/docs/         docs partitioned by seg_id (stored fields; doc
                          lengths live in seg_meta.dl_bin, not here)
    <root>/postings/     (term, df_local, cf_local, doc_ids_bin, tfs_bin,
                          pos_bin, block_maxes, max_norm) partitioned by
                          seg_id, sorted by term within files so parquet
                          row-group min/max stats prune term lookups
    <root>/seg_meta/     one row per segment: n_docs, base_doc_id,
                          dl_bin (varint doc lengths in local-id order)
    <root>/term_stats/   (term, df, cf) corpus-wide
    <root>/corpus_stats/ single row: n_docs, avgdl, k1, b, seg_size
    <root>/checkpoints/  per-segment lineage: seg_id, n_docs, n_postings,
                          wall_sec, status — resumability (north_rule)
    <root>/stats_ledger/ (seg_id, n_docs, sum_dl): segments whose
                          postings are folded into term_stats, with
                          their corpus-stat contribution — append-mode
                          maintenance aggregates THIS tiny table, never
                          the corpus (indexer._fold_term_stats)
    <root>/stats_folding  torn-fold marker file: present only inside a
                          fold's overwrite+ledger commit window; seen
                          at build start → recover via full recompute

All storage goes through ONE read/write seam (``read_table`` /
``write_table``): parquet directories by default, the same paths as
Iceberg (Hadoop) tables when a catalog is configured — the sandbox
image has no Iceberg jars, so that branch is covered by a
skip-if-no-jars test.

The reference's segment == contiguous docID range ``[from, next)``
(/root/reference/src/lib/internal/segments/segment.ts:12-57); ours is
``[seg_id*seg_size, seg_id*seg_size + n_docs)`` so posting docIDs stay
delta-friendly and merges never renumber (SURVEY.md §7.4.4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

# bump when the on-disk layout changes (cache invalidation; persisted
# in corpus_stats.format_version and CHECKED on read — a mismatched
# index raises instead of silently misdecoding, ADVICE r3)
# v4: blocked posting layout — delta restarts at block boundaries +
# per-block byte offsets / first doc ids (lazy MaxScore block decode)
# v5: blocked POSITION stream (postings.block_pos_offs → lazy phrase
# decode); seg_meta gains avgdl_built (pruning-safety under streaming
# appends) and deleted_bin (holes left by purge-at-merge);
# corpus_stats gains format_version
FORMAT_VERSION = 5

# term_stats is hash-partitioned into this many bucket dirs so the
# corpus dictionary (10^8-10^9 terms at web scale) is written by many
# tasks and read with partition pruning — never one giant sorted file
TERM_STATS_BUCKETS = 256


def term_stats_bucket_col() -> "F.Column":
    """Spark-side bucket id for a (field, term) row. md5-derived (not
    xxhash64) so the driver can compute the identical bucket in pure
    Python without launching a job (see term_stats_bucket)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x00", F.col("field"), F.col("term"))), 1, 8),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(TERM_STATS_BUCKETS)).cast("int")


def term_stats_bucket(field: str, term: str) -> int:
    """Python mirror of term_stats_bucket_col (same md5 prefix)."""
    import hashlib

    h = int(hashlib.md5(f"{field}\x00{term}".encode("utf-8")).hexdigest()[:8], 16)
    return h % TERM_STATS_BUCKETS


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — works on
    local disk, HDFS and object stores alike (os.path.exists only sees
    the driver-local filesystem, which on a cluster deployment would
    silently report every remote path as absent)."""
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.exists(p))


def fs_mtime(spark: SparkSession, path: str) -> int | None:
    """Modification time (epoch millis) of a path via the Hadoop
    FileSystem API, or None when it doesn't exist — the cheap staleness
    probe entrypoint._catalog uses to drop memoized IndexCatalogs after
    an in-place rebuild (ADVICE r3: a rebuilt index at the same hashed
    path must not serve the old catalog's cached term stats)."""
    fs, p = _hadoop_fs(spark, path)
    try:
        return int(fs.getFileStatus(p).getModificationTime())
    except Exception:
        return None


def fs_touch(spark: SparkSession, path: str) -> None:
    """Create (or truncate) an empty marker file via the Hadoop
    FileSystem API — the torn-write sentinel the incremental term_stats
    fold sets around its partition overwrite (indexer._fold_term_stats):
    a crash between the overwrite and the ledger append leaves the
    marker behind, and the next build recovers with a full recompute."""
    fs, p = _hadoop_fs(spark, path)
    fs.create(p, True).close()


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API (the
    direct-path analogue of an Iceberg REPLACE TABLE drop; shutil.rmtree
    would no-op on cluster/object-store paths and leave stale
    partitions behind — exactly the term_stats corruption resume=False
    exists to prevent)."""
    fs, p = _hadoop_fs(spark, path)
    return bool(fs.delete(p, True))


def iceberg_format(spark: SparkSession) -> str | None:
    """Return 'iceberg' when the catalog is configured, else None."""
    try:
        if spark.conf.get("spark.sql.catalog.spark_catalog", None):
            return "iceberg"
    except Exception:
        pass
    return None


def read_table(spark: SparkSession, path: str):
    """Single read seam for every index table (north_rule: 'over
    Iceberg tables'). With an Iceberg catalog configured the same
    call reads the path as an Iceberg (Hadoop) table — snapshot
    isolation, hidden-partition pruning; without one (this sandbox has
    no Iceberg jars) it is a plain parquet directory with identical
    layout. Both paths are exercised: parquet everywhere, iceberg by a
    skip-if-no-jars test (tests/test_storage_seam.py)."""
    fmt = iceberg_format(spark)
    if fmt:
        return spark.read.format(fmt).load(path)
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Single write seam (see read_table). Partitioning columns map
    1:1 onto Iceberg identity-partition specs."""
    spark = df.sparkSession
    fmt = iceberg_format(spark) or "parquet"
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float
    k1: float
    b: float
    seg_size: int
    block_size: int = 128


class IndexCatalog:
    """Read-side handle on an index directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._stats: CorpusStats | None = None
        # (field, term) -> (df, cf) | None(=absent); an index generation
        # is immutable (rebuilds land in a new dir), so dictionary
        # lookups memoize like any engine's term-dictionary cache
        self._ts_cache: dict[tuple[str, str], tuple[int, int] | None] = {}
        # base DataFrames per immutable table: re-creating one per query
        # re-lists the partition directories (an InMemoryFileIndex
        # build, a driver JOB above the parallel-discovery threshold) —
        # at 10^6 segments / 256 term_stats buckets that listing IS the
        # per-query latency floor. Tombstones are deliberately NOT
        # cached (delete_docs appends between queries). After an
        # in-place rebuild or append, use a fresh catalog
        # (entrypoint._catalog evicts on the commit marker's mtime).
        self._tables: dict[str, DataFrame] = {}

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self) -> bool:
        # corpus_stats is the build's commit marker: build_index writes
        # it strictly after every other table is durable, so its
        # _SUCCESS (parquet) / table metadata (Iceberg) implies a
        # complete index
        if iceberg_format(self.spark):
            return fs_exists(self.spark, self.path("corpus_stats"))
        return fs_exists(
            self.spark, os.path.join(self.path("corpus_stats"), "_SUCCESS")
        )

    def corpus_stats(self) -> CorpusStats:
        # memoized: corpus_stats is immutable per index generation, and
        # every query path needs it (one 1-row job per catalog, not per
        # query)
        if self._stats is None:
            row = read_table(self.spark, self.path("corpus_stats")).collect()[0]
            d = row.asDict()
            # strict format gate: a v<5 index's postings would decode
            # into silently wrong doc ids under the current blocked
            # reader (each block's first delta read as absolute) —
            # fail loudly instead (ADVICE r3)
            ver = d.get("format_version")
            if ver != FORMAT_VERSION:
                raise ValueError(
                    f"index at {self.root} has on-disk format "
                    f"{ver if ver is not None else '<3 (unversioned)'}; "
                    f"this build reads format {FORMAT_VERSION} — rebuild "
                    "the index (build_index with resume=False)"
                )
            self._stats = CorpusStats(
                n_docs=row.n_docs, avgdl=row.avgdl, k1=row.k1, b=row.b,
                seg_size=row.seg_size, block_size=int(row.block_size),
            )
        return self._stats

    def _seg_long(self, df: DataFrame) -> DataFrame:
        """Normalize seg_id to LONG. Parquet partition-column inference
        reads `seg_id=N` directories back as INT; a cogroup whose other
        side carries long keys then HASH-PARTITIONS the two sides
        differently (murmur3 of int32 ≠ int64) and silently mis-aligns
        groups — joins insert casts, cogroups do not. First seen as
        empty meta groups in a 1M-doc merge."""
        return df.withColumn("seg_id", F.col("seg_id").cast("long"))

    def _table_df(self, table: str) -> DataFrame:
        df = self._tables.get(table)
        if df is None:
            df = self._tables[table] = read_table(self.spark, self.path(table))
        return df

    def prewarm(self) -> "IndexCatalog":
        """Eagerly build the base DataFrames (partition-directory
        listings — driver jobs at 10^6 segments) and load corpus stats,
        pulling the cold-start cost out of the first query's latency
        path. Returns self for chaining."""
        self.corpus_stats()
        for t in ("docs", "postings", "seg_meta", "term_stats"):
            self._table_df(t)
        return self

    def docs(self) -> DataFrame:
        return self._seg_long(self._table_df("docs"))

    def postings(
        self,
        field_terms: list[tuple[str, str]] | None = None,
        scans: list | None = None,
    ) -> DataFrame:
        """Postings rows, restricted to the query's terms.

        `field_terms` → per-field equality-list predicates; `scans` →
        TokenRange/TextContains AST leaves compiled to term-range /
        contains predicates. All push to parquet: files are sorted by
        (field, term), so row-group min/max stats prune equality AND
        range lookups (the B-tree-like path); contains() degrades to an
        in-segment dictionary scan by design."""
        df = self._seg_long(self._table_df("postings"))
        if field_terms is None and not scans:
            return df
        cond = None
        by_field: dict[str, list[str]] = {}
        for f, t in field_terms or []:
            by_field.setdefault(f, []).append(t)
        for f, ts in sorted(by_field.items()):
            c = (F.col("field") == f) & F.col("term").isin(sorted(set(ts)))
            cond = c if cond is None else (cond | c)
        for s in scans or []:
            c = F.col("field") == s.field_name
            if hasattr(s, "needle"):  # TextContains
                c = c & F.col("term").contains(s.needle)
            else:  # TokenRange
                if s.lo is not None:
                    c = c & (
                        F.col("term") >= s.lo if s.lo_inclusive else F.col("term") > s.lo
                    )
                if s.hi is not None:
                    c = c & (
                        F.col("term") <= s.hi if s.hi_inclusive else F.col("term") < s.hi
                    )
            cond = c if cond is None else (cond | c)
        return df.filter(cond if cond is not None else F.lit(False))

    def seg_meta(self) -> DataFrame:
        return self._seg_long(self._table_df("seg_meta"))

    def term_stats(self) -> DataFrame:
        return self._table_df("term_stats")

    def checkpoints(self) -> DataFrame:
        return read_table(self.spark, self.path("checkpoints"))

    def tombstones(self) -> DataFrame | None:
        """Deleted doc ids (seg_id, doc_id) or None when nothing was
        ever deleted. The reference keeps per-segment delete bitmaps
        (mutable-segment.ts:27,191-197); at Iceberg scale these become
        positional delete files — same shape."""
        p = self.path("tombstones")
        if not fs_exists(self.spark, p):
            return None
        return read_table(self.spark, p)

    def docs_live(self) -> DataFrame:
        """Docs minus tombstones (the reference's
        removeDeletedAndAddedAfter clamp, utils.ts:201-220)."""
        docs = self.docs()
        tomb = self.tombstones()
        if tomb is None:
            return docs
        return docs.join(tomb.select("doc_id"), "doc_id", "left_anti")

    def term_stats_for(
        self, field_terms: list[tuple[str, str]]
    ) -> dict[tuple[str, str], tuple[int, int]]:
        """Driver-side (df, cf) lookup for a query's (field, term)
        pairs — the `mayMatch` plan-time pruning analogue (SURVEY.md
        §2.2 P10): absent terms never reach an executor. Results are
        memoized per catalog (absences included), so repeated query
        terms cost zero extra jobs — the term-dictionary cache every
        engine keeps."""
        if not field_terms:
            return {}
        missing = [ft for ft in set(field_terms) if ft not in self._ts_cache]
        if missing:
            rows = self.term_stats_query(missing).collect()
            found = {(r.field, r.term): (r.df, r.cf) for r in rows}
            for ft in missing:
                self._ts_cache[ft] = found.get(ft)
        out = {}
        for ft in field_terms:
            v = self._ts_cache.get(ft)
            if v is not None:
                out[ft] = v
        return out

    def term_stats_query(self, field_terms: list[tuple[str, str]]) -> DataFrame:
        """The pruned dictionary lookup as a DataFrame (plan-testable):
        bucket list → partition-dir pruning, term list → row-group
        min/max pruning inside the bucket's term-sorted files."""
        terms = sorted({t for _, t in field_terms})
        fields = sorted({f for f, _ in field_terms})
        buckets = sorted({term_stats_bucket(f, t) for f, t in field_terms})
        return self.term_stats().filter(
            F.col("bucket").isin(buckets)
            & F.col("term").isin(terms)
            & F.col("field").isin(fields)
        )
