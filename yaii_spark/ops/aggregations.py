"""Aggregation surface: yaii's aggregateQuery re-expressed (SURVEY.md §2.5).

The reference runs per-segment accumulators then cross-segment mergers
(/root/reference/src/base-inverted-index.ts:297-394, aggregate.ts) —
exactly Catalyst's partial/final hash aggregation, so every operator
here is a built-in DataFrame agg over the filtered doc set:

- COUNT (A1)            → count(*)
- FIRST(sort) (A2)      → min_by / ORDER BY … LIMIT 1
- LAST(sort)  (A3)      → max_by
- GROUP_BY(field, subs) (A4) → groupBy().agg(...) with nested sub-aggs
- TERM / NUMERIC buckets (A5, declared-only in the reference,
  bucket-query.ts:4-31) → groupBy(col) / groupBy(floor(col/size)*size)
- size() (A6)           → docs.count() − tombstones.count()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from yaii_spark.queries import ast as A
from yaii_spark.queries.executor import execute_boolean
from yaii_spark.storage import IndexCatalog


def _filtered_docs(cat: IndexCatalog, query: A.Node | None) -> DataFrame:
    docs = cat.docs_live()
    if query is None or isinstance(query, A.All):
        return docs
    ids = execute_boolean(cat, query)
    return docs.join(ids, "doc_id", "inner")


def agg_count(cat: IndexCatalog, query: A.Node | None = None) -> DataFrame:
    return _filtered_docs(cat, query).agg(F.count("*").alias("n_docs"))


def _sort_keys(sort) -> list[tuple[str, str]]:
    """Normalize a sort spec: 'col' | [('col', 'asc'|'desc'), ...] —
    the reference chains multiple sort clauses in its comparator
    (base-inverted-index.ts:606-659); we accept the same chain."""
    if isinstance(sort, str):
        return [(sort, "asc")]
    return [(c, d.lower()) for c, d in sort]


def agg_first(cat: IndexCatalog, sort, query: A.Node | None = None,
              projection: list[str] | None = None) -> DataFrame:
    """arg-min under the (possibly multi-key) sort chain + doc_id —
    deterministic ties like the reference's reversed TopAccumulator
    (aggregate.ts:45-72)."""
    keys = _sort_keys(sort)
    d = _filtered_docs(cat, query)
    order = [
        F.col(c).asc() if dr.startswith("a") else F.col(c).desc() for c, dr in keys
    ]
    return d.orderBy(*order, F.col("doc_id").asc()).limit(1).select(
        "doc_id", *(projection or [c for c, _ in keys])
    )


def agg_last(cat: IndexCatalog, sort, query: A.Node | None = None,
             projection: list[str] | None = None) -> DataFrame:
    """arg-max: the same chain with every direction flipped."""
    keys = _sort_keys(sort)
    d = _filtered_docs(cat, query)
    order = [
        F.col(c).desc() if dr.startswith("a") else F.col(c).asc() for c, dr in keys
    ]
    return d.orderBy(*order, F.col("doc_id").desc()).limit(1).select(
        "doc_id", *(projection or [c for c, _ in keys])
    )


def agg_group_by(
    cat: IndexCatalog, group_col: str, query: A.Node | None = None,
    sub_aggs: dict[str, F.Column] | None = None,
) -> DataFrame:
    """GROUP_BY with nested sub-aggregations (count always included,
    like the reference's GroupByAccumulator, aggregate.ts:166-233)."""
    d = _filtered_docs(cat, query)
    aggs = [F.count("*").alias("n_docs")]
    for name, col in (sub_aggs or {}).items():
        aggs.append(col.alias(name))
    return d.groupBy(group_col).agg(*aggs)


def agg_numeric_buckets(
    cat: IndexCatalog, col: str, bucket_size: int, query: A.Node | None = None
) -> DataFrame:
    """NUMERIC bucket histogram (A5 — wired here though the reference
    never connected its bucket API)."""
    d = _filtered_docs(cat, query)
    bucket = (F.floor(F.col(col) / bucket_size) * bucket_size).cast("long")
    return d.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n_docs"))


def index_size(cat: IndexCatalog) -> int:
    """Live doc count (A6): Σ per-segment (count − deleted.cost), the
    reference's size() (base-inverted-index.ts:499-505)."""
    return cat.docs_live().count()
