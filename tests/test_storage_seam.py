"""The single read/write seam (storage.read_table / write_table): the
north_rule's 'over Iceberg tables' claim is real code, not a comment —
parquet path unit-tested here, iceberg path exercised when jars exist
(skip otherwise), and no module bypasses the seam.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from yaii_spark.storage import iceberg_format, read_table, write_table


def test_roundtrip_plain(spark, work_dir):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.sha1(F.col("id").cast("string")).alias("s")
    )
    p = f"{work_dir}/seam_plain"
    write_table(df, p)
    back = read_table(spark, p)
    assert back.count() == 100
    assert {r.id for r in back.collect()} == set(range(100))


def test_roundtrip_partitioned_and_modes(spark, work_dir):
    df = spark.range(40).select(F.col("id"), (F.col("id") % 4).alias("part"))
    p = f"{work_dir}/seam_part"
    write_table(df, p, partition_by=["part"])
    assert sorted(os.path.basename(d) for d in glob.glob(f"{p}/part=*")) == [
        "part=0", "part=1", "part=2", "part=3",
    ]
    back = read_table(spark, p)
    assert back.count() == 40
    # append mode accumulates
    write_table(df.filter("part = 0"), p, mode="append", partition_by=["part"])
    assert read_table(spark, p).count() == 50
    # overwrite replaces
    write_table(df, p, partition_by=["part"])
    assert read_table(spark, p).count() == 40


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_branch(spark, work_dir):
    """Runs only where Iceberg jars are on the classpath (not this
    sandbox): the same seam must round-trip through format('iceberg').
    Set YAII_ICEBERG_JARS=<runtime-jar paths> before the session starts
    and get_spark wires the jars + extensions in, so any jar-equipped
    environment proves this end-to-end with zero code changes."""
    if not _iceberg_available(spark):
        pytest.skip(
            "no Iceberg jars on the classpath "
            "(set YAII_ICEBERG_JARS to run this end-to-end)"
        )
    spark.conf.set("spark.sql.catalog.spark_catalog",
                   "org.apache.iceberg.spark.SparkSessionCatalog")
    try:
        assert iceberg_format(spark) == "iceberg"
        df = spark.range(10)
        p = f"{work_dir}/seam_iceberg"
        write_table(df, p)
        assert read_table(spark, p).count() == 10
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")


def test_no_raw_parquet_io_outside_seam():
    """Every index/table read+write in the package goes through the
    seam; raw parquet IO lives only in storage.py (the seam's own
    parquet branch). Checked PER LINE with regexes so a raw
    df.write.parquet / reader-variable read can't hide behind an
    unrelated 'readStream' elsewhere in the file; only lines that are
    themselves Structured Streaming source calls (readStream — a
    format-specific API by nature) are exempt."""
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "yaii_spark")
    write_re = re.compile(r"\.write\b.*\.parquet\(|\.write\.parquet\(")
    read_re = re.compile(r"\bread\b.*\.parquet\(|\.read\.parquet\(")
    offenders = []
    for path in glob.glob(f"{root}/**/*.py", recursive=True):
        if os.path.basename(path) == "storage.py":
            continue
        for i, line in enumerate(open(path).read().splitlines(), 1):
            code = line.split("#")[0]
            if "readStream" in code:
                continue
            if write_re.search(code):
                offenders.append(f"{os.path.basename(path)}:{i} (write)")
            if read_re.search(code):
                offenders.append(f"{os.path.basename(path)}:{i} (read)")
    assert offenders == [], offenders


def test_catalog_prewarm(spark, work_dir):
    """prewarm() eagerly builds the memoized base DataFrames + corpus
    stats; queries afterwards reuse them (no per-query re-listing)."""
    from yaii_spark.indexer import build_index
    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean
    from yaii_spark.storage import IndexCatalog
    from yaii_spark.synth import gen_boolean_pages

    out = f"{work_dir}/prewarm_idx"
    build_index(spark, gen_boolean_pages(spark), out, seg_size=8)
    cat = IndexCatalog(spark, out).prewarm()
    assert set(cat._tables) == {"docs", "postings", "seg_meta", "term_stats"}
    assert cat._stats is not None
    before = dict(cat._tables)
    assert {r.doc_id for r in execute_boolean(cat, A.token("abc")).collect()} == {12, 14}
    # the query reused the prewarmed DataFrames (same objects, no relist)
    assert all(cat._tables[k] is before[k] for k in before)
