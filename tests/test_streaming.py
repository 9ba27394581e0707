"""Streaming suite: QueryMode FUTURE / CURRENT_AND_FUTURE (ST1-ST3)."""

import os

import pytest
from pyspark.sql import functions as F

from yaii_spark.queries import ast as A
from yaii_spark.streaming import QueryMode, compile_predicate, continuous_query, windowed_ingest_stats
from yaii_spark.synth import PAGES_SCHEMA, gen_boolean_pages, gen_pages


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = str(tmp_path / "incoming")
    os.makedirs(d, exist_ok=True)
    return d


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_future_mode_filters_new_batches(spark, stream_dir):
    sdf, cur = continuous_query(
        spark, A.and_(A.token("abc"), A.not_(A.token("efg"))),
        QueryMode.FUTURE, stream_dir, PAGES_SCHEMA,
    )
    assert cur is None
    # "added" batch arrives
    gen_boolean_pages(spark).write.mode("append").parquet(stream_dir)
    out = _run_stream(spark, sdf, "fut1")
    assert {r.doc_id for r in out.collect()} == {12, 14}


def test_current_and_future_union(spark, stream_dir):
    current = gen_boolean_pages(spark)
    sdf, cur = continuous_query(
        spark, A.token("abc"), QueryMode.CURRENT_AND_FUTURE,
        stream_dir, PAGES_SCHEMA, current_df=current,
    )
    assert {r.doc_id for r in cur.collect()} == {12, 14}
    gen_pages(spark, 30, include_fixtures=True).write.mode("append").parquet(stream_dir)
    out = _run_stream(spark, sdf, "fut2")
    # none of the 30 synthetic pages contain 'abc'
    assert out.count() == 0
    gen_boolean_pages(spark).write.mode("append").parquet(stream_dir)
    out2 = _run_stream(spark, sdf, "fut3")
    assert {r.doc_id for r in out2.collect()} == {12, 14}


def test_sorted_future_raises(spark, stream_dir):
    # exact reference restriction (base-inverted-index.ts:431)
    with pytest.raises(ValueError, match="future queries cannot have sort"):
        continuous_query(
            spark, A.token("abc"), QueryMode.FUTURE, stream_dir, PAGES_SCHEMA,
            sort=[("doc_id", "asc")],
        )


def test_windowed_ingest_stats(spark, stream_dir):
    gen_pages(spark, 100, include_fixtures=False).write.mode("append").parquet(stream_dir)
    agg = windowed_ingest_stats(spark, stream_dir, PAGES_SCHEMA, window="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("ingest_stats")
        .trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM ingest_stats").collect()
    assert sum(r.n_docs for r in rows) == 100
    assert all(r.text_bytes > 0 for r in rows)


def test_compile_predicate_matches_engine(spark):
    """Relational fallback predicate == posting-based engine result."""
    from yaii_spark.analyzer import with_tokens

    pages = gen_boolean_pages(spark)
    tok = with_tokens(pages).withColumnRenamed("tokens", "_tokens")
    q = A.and_(A.or_(A.token("abc"), A.token("efg")), A.not_(A.token("bcd")))
    got = {r.doc_id for r in tok.filter(compile_predicate(A.rewrite(q))).collect()}
    assert got == {12, 13}
