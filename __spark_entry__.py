"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over yaii_spark.entrypoint — the PySpark-native
inverted-index + BM25 engine (see SURVEY.md). All 48 queries() entries
have a matching oracle_sql() DuckDB statement (since round 2 this
includes q_simhash — md5-family bit-sign sums restated in SQL — and
q_ann_lsh, whose hyperplane constants are embedded as SQL literals;
round 3 adds q_ts_range — a timestamp-typed NumberRange through the
events-table index — and q_bm25_pruned — the MaxScore/lazy-block path
checked value-exact against the same SQL restatement as the exact
path — and moves q_ann_lsh onto a materialized bucket-partitioned ANN
table).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yaii_spark import entrypoint as _ep  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ep.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ep.queries()


def oracle_sql() -> dict[str, str]:
    return _ep.oracle_sql()
