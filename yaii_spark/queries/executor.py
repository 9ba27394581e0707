"""Boolean query execution.

Two evaluation paths, chosen per subtree (SURVEY.md §7.1 M4):

1. **Token-only subtrees** → per-segment numpy set algebra inside one
   ``applyInPandas`` task per segment: decoded posting arrays are
   intersected/unioned/differenced exactly like the reference's
   DocIdIterable algebra (conjunction leads with the smallest-cost
   list — /root/reference/src/lib/internal/datastructs/
   docid-async-iterable/operations.ts:104-164; orMany :12-100;
   andNot :184-226) but vectorized (np.intersect1d on sorted arrays is
   the same sort-merge; must/mustNot split mirrors BooleanExpression).
2. **Attribute predicates** (NumberEq/NumberRange/HasField) → native
   Catalyst filters on the docs table — predicate pushdown to parquet
   replaces the reference's numeric trie (query-ir.ts:57-120).
Mixed trees compose at the DataFrame level: AND = inner join,
OR = union+distinct, NOT = anti join vs the doc universe.

Plan-time `mayMatch` pruning: query terms are checked against the
term-stats table on the driver before any executor work
(prune_absent_terms), so a query with only absent terms never launches
a stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from yaii_spark.codec import delta_decode_blocked
from yaii_spark.queries import ast as A
from yaii_spark.storage import IndexCatalog


def _empty_ids(spark) -> DataFrame:
    return spark.createDataFrame([], "doc_id long")


# ---------------------------------------------------------------------------
# numpy set algebra over one segment (local doc ids)
# ---------------------------------------------------------------------------

def _ordered_window(qs: list, slop: int) -> bool:
    """True if ∃ non-decreasing chain q_0 ≤ q_1 ≤ … with q_last − q_0 ≤
    slop (qs are the j-shifted position arrays, sorted ascending). The
    greedy minimal chain per start is optimal; starts ascend, so the
    first exhausted tail list ends the search."""
    if slop == 0:
        acc = qs[0]
        for q in qs[1:]:
            acc = np.intersect1d(acc, q, assume_unique=True)
            if acc.size == 0:
                return False
        return True
    for q0 in qs[0]:
        prev = q0
        for q in qs[1:]:
            i = np.searchsorted(q, prev, side="left")
            if i == q.size:
                return False
            prev = q[i]
        if prev - q0 <= slop:
            return True
    return False


def _eval_phrase(node: A.Phrase, pos_map: dict) -> np.ndarray:
    """Phrase/proximity over decoded positions: intersect doc ids
    (smallest list leads, like the conjunction path), then verify the
    in-order window condition.

    slop=0 (the common case) is fully vectorized: per term j, the
    candidate docs' positions flatten into composite keys
    (doc_rank << 32) | (pos − j); intersecting the key sets across
    terms leaves exactly the docs with an aligned adjacency window —
    no per-doc Python loop, so even a stopword-grade two-term phrase
    whose candidate set is segment-sized stays numpy-bound (VERDICT r2
    #6). slop>0 keeps the greedy minimal-chain walk per candidate."""
    entries = []
    for t in node.terms:
        e = pos_map.get((node.field_name, t))
        if e is None:
            return np.empty(0, dtype=np.int64)
        entries.append(e)  # (ids ascending, positions list aligned to ids)
    cand = entries[0][0]
    for ids, _ in sorted(entries[1:], key=lambda e: e[0].size):
        if cand.size == 0:
            return cand
        cand = np.intersect1d(cand, ids, assume_unique=True)
    if cand.size == 0 or len(entries) == 1:
        return cand.astype(np.int64)
    if node.slop == 0:
        acc = None
        for j, (ids, plists) in enumerate(entries):
            idxs = np.searchsorted(ids, cand)
            pls = [plists[int(ix)].astype(np.int64) for ix in idxs]
            reps = np.fromiter((p.size for p in pls), dtype=np.int64, count=len(pls))
            flat = np.concatenate(pls)
            ranks = np.repeat(np.arange(cand.size, dtype=np.int64), reps)
            off = flat - j
            m = off >= 0  # pos<j can't start an aligned window
            keys = (ranks[m] << np.int64(32)) | off[m]
            acc = keys if acc is None else np.intersect1d(acc, keys, assume_unique=True)
            if acc.size == 0:
                return np.empty(0, dtype=np.int64)
        return cand[np.unique(acc >> np.int64(32))].astype(np.int64)
    out = []
    for d in cand:
        qs = [
            plists[int(np.searchsorted(ids, d))].astype(np.int64) - j
            for j, (ids, plists) in enumerate(entries)
        ]
        if _ordered_window(qs, node.slop):
            out.append(int(d))
    return np.asarray(out, dtype=np.int64)


def _term_in_range(t: str, node: A.TokenRange) -> bool:
    if node.lo is not None and (t < node.lo or (t == node.lo and not node.lo_inclusive)):
        return False
    if node.hi is not None and (t > node.hi or (t == node.hi and not node.hi_inclusive)):
        return False
    return True


def _eval_numpy(node: A.Node, postings: dict, n_docs: int, pos_map: dict | None = None) -> np.ndarray:
    if isinstance(node, A.Token):
        return postings.get((node.field_name, node.term), np.empty(0, dtype=np.int64))
    if isinstance(node, A.Phrase):
        return _eval_phrase(node, pos_map or {})
    if isinstance(node, A.TokenRange):
        # union of every dictionary term in range (P8 TOKEN_RANGE:
        # the postings fetch already restricted the scan, this just
        # re-applies the predicate over the fetched rows)
        sets = [
            ids
            for (f, t), ids in postings.items()
            if f == node.field_name and _term_in_range(t, node) and ids.size
        ]
        if not sets:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(sets))
    if isinstance(node, A.TextContains):
        sets = [
            ids
            for (f, t), ids in postings.items()
            if f == node.field_name and node.needle in t and ids.size
        ]
        if not sets:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(sets))
    if isinstance(node, A.All):
        return np.arange(n_docs, dtype=np.int64)
    if isinstance(node, A.NoneNode):
        return np.empty(0, dtype=np.int64)
    if isinstance(node, A.And):
        # must/mustNot split (boolean-exp.ts:10-19); positives first,
        # cost-ordered ascending so the smallest list leads (J1)
        pos = [c for c in node.children if not isinstance(c, A.Not)]
        neg = [c.child for c in node.children if isinstance(c, A.Not)]
        if pos:
            sets = sorted((_eval_numpy(c, postings, n_docs, pos_map) for c in pos), key=len)
            acc = sets[0]
            for s in sets[1:]:
                if acc.size == 0:
                    return acc  # short-circuit (operations.ts:166-182)
                acc = np.intersect1d(acc, s, assume_unique=True)
        else:
            acc = np.arange(n_docs, dtype=np.int64)
        for c in neg:  # andNot (operations.ts:184-226)
            if acc.size == 0:
                return acc
            s = _eval_numpy(c, postings, n_docs, pos_map)
            if s.size:
                acc = np.setdiff1d(acc, s, assume_unique=True)
        return acc
    if isinstance(node, A.Or):
        sets = [_eval_numpy(c, postings, n_docs, pos_map) for c in node.children]
        sets = [s for s in sets if s.size]
        if not sets:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(sets))  # k-way merge (orMany)
    if isinstance(node, A.Not):
        s = _eval_numpy(node.child, postings, n_docs, pos_map)
        return np.setdiff1d(np.arange(n_docs, dtype=np.int64), s, assume_unique=True)
    raise TypeError(f"not a token-only node: {node!r}")


def _collect_phrases(node: A.Node) -> list:
    if isinstance(node, A.Phrase):
        return [node]
    if isinstance(node, (A.And, A.Or)):
        out = []
        for c in node.children:
            out.extend(_collect_phrases(c))
        return out
    if isinstance(node, A.Not):
        return _collect_phrases(node.child)
    return []


def _needs_universe(node: A.Node) -> bool:
    if isinstance(node, (A.Not, A.All)):
        return True
    if isinstance(node, (A.And, A.Or)):
        return any(_needs_universe(c) for c in node.children)
    return False


def _eval_token_tree(cat: IndexCatalog, node: A.Node) -> DataFrame:
    """Evaluate a token-only subtree → DataFrame[doc_id]."""
    spark = cat.spark
    terms = sorted(A.collect_terms(node))
    scans = A.collect_term_scans(node)
    want_pos = A.needs_positions(node)
    phrase_terms = {
        (n.field_name, t)
        for n in _collect_phrases(node)
        for t in n.terms
    }
    cols = ["seg_id", "field", "term", "doc_ids_bin"] + (
        ["tfs_bin", "pos_bin"] if want_pos else []
    )
    post = cat.postings(terms, scans=scans).select(*cols)
    block = cat.corpus_stats().block_size  # delta restarts per block (v4)
    meta = cat.seg_meta().select("seg_id", "n_docs", "base_doc_id")
    if _needs_universe(node):
        # NOT/ALL need every segment, even term-free ones
        joined = meta.join(post, "seg_id", "left")
    else:
        if not terms and not scans:
            return _empty_ids(spark)
        joined = post.join(meta, "seg_id", "inner")
    def _eval(pdf: pd.DataFrame, deleted: np.ndarray | None) -> pd.DataFrame:
        from yaii_spark.codec import decode_positions, varint_decode

        if pdf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        n_docs = int(pdf["n_docs"].iloc[0])
        base = int(pdf["base_doc_id"].iloc[0])
        postings = {
            (f, t): delta_decode_blocked(b, block).astype(np.int64) - base
            for f, t, b in zip(pdf["field"], pdf["term"], pdf["doc_ids_bin"])
            if t is not None and b is not None
        }
        pos_map = None
        if want_pos:
            pos_map = {}
            for f, t, ib, tb, pb in zip(
                pdf["field"], pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"], pdf["pos_bin"]
            ):
                if t is None or ib is None or (f, t) not in phrase_terms:
                    continue
                tfs = varint_decode(tb).astype(np.int64)
                pos_map[(f, t)] = (postings[(f, t)], decode_positions(pb, tfs))
        ids = _eval_numpy(node, postings, n_docs, pos_map)
        if deleted is not None and deleted.size:
            ids = np.setdiff1d(ids, np.sort(deleted) - base, assume_unique=False)
        return pd.DataFrame({"doc_id": ids + base})

    tomb = cat.tombstones()
    if tomb is None:

        def eval_segment(pdf: pd.DataFrame):
            return _eval(pdf, None)

        return joined.groupBy("seg_id").applyInPandas(eval_segment, schema="doc_id long")

    # tombstones arrive COGROUPED per segment — shuffle-partitioned like
    # any other table, never collected into one array row or broadcast
    # (a segment with millions of deletes would blow both; VERDICT r1)
    def eval_segment_tomb(pdf: pd.DataFrame, tpdf: pd.DataFrame):
        deleted = tpdf["doc_id"].to_numpy(dtype=np.int64) if len(tpdf) else None
        return _eval(pdf, deleted)

    return (
        joined.groupBy("seg_id")
        .cogroup(tomb.select("seg_id", "doc_id").groupBy("seg_id"))
        .applyInPandas(eval_segment_tomb, schema="doc_id long")
    )


# ---------------------------------------------------------------------------
# hybrid DataFrame-level composition
# ---------------------------------------------------------------------------

def _attr_filter(node: A.Node):
    if isinstance(node, A.NumberEq):
        return F.col(node.field_name) == F.lit(node.value)
    if isinstance(node, A.NumberRange):
        cond = F.lit(True)
        c = F.col(node.field_name)
        if node.lo is not None:
            cond = cond & (c >= node.lo if node.lo_inclusive else c > node.lo)
        if node.hi is not None:
            cond = cond & (c <= node.hi if node.hi_inclusive else c < node.hi)
        return cond
    if isinstance(node, A.HasField):
        return F.col(node.field_name).isNotNull()
    return None


def _eval_hybrid(cat: IndexCatalog, node: A.Node, docs: DataFrame) -> DataFrame:
    if isinstance(node, A.CachedFilter):
        cached = getattr(cat, "_filter_cache", {}).get(node.name)
        if cached is None:
            raise KeyError(f"no cached filter named {node.name!r}")
        # deletes issued after the filter was cached must not resurface:
        # re-clamp against the current tombstone set at resolve time
        # (the reference's removeDeletedAndAddedAfter, utils.ts:201-220)
        tomb = cat.tombstones()
        if tomb is not None:
            cached = cached.join(tomb.select("doc_id"), "doc_id", "left_anti")
        return cached
    if A.is_token_only(node):
        if isinstance(node, A.All):
            return docs.select("doc_id")
        if isinstance(node, A.NoneNode):
            return _empty_ids(cat.spark)
        return _eval_token_tree(cat, node)
    flt = _attr_filter(node)
    if flt is not None:
        return docs.filter(flt).select("doc_id")
    if isinstance(node, A.And):
        # push all attribute predicates into ONE docs scan (Catalyst
        # conjunctive pushdown), token subtrees into one segment pass
        attr = [c for c in node.children if _attr_filter(c) is not None]
        rest = [c for c in node.children if _attr_filter(c) is None]
        acc = None
        if attr:
            cond = _attr_filter(attr[0])
            for c in attr[1:]:
                cond = cond & _attr_filter(c)
            acc = docs.filter(cond).select("doc_id")
        tok = [c for c in rest if A.is_token_only(c)]
        other = [c for c in rest if not A.is_token_only(c)]
        if tok:
            t = tok[0] if len(tok) == 1 else A.And(tok)
            tdf = _eval_hybrid(cat, t, docs)
            acc = tdf if acc is None else acc.join(tdf, "doc_id", "inner")
        for c in other:
            cdf = _eval_hybrid(cat, c, docs)
            acc = cdf if acc is None else acc.join(cdf, "doc_id", "inner")
        return acc if acc is not None else docs.select("doc_id")
    if isinstance(node, A.Or):
        dfs = [_eval_hybrid(cat, c, docs) for c in node.children]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.union(d)
        return out.distinct()
    if isinstance(node, A.Not):
        child = _eval_hybrid(cat, node.child, docs)
        return docs.select("doc_id").join(child, "doc_id", "left_anti")
    raise TypeError(f"unsupported node: {node!r}")


def execute_boolean(cat: IndexCatalog, query: A.Node) -> DataFrame:
    """Evaluate a boolean query → DataFrame[doc_id] (distinct)."""
    q = A.rewrite(query)
    field_terms = A.collect_terms(q)
    if field_terms:
        present = set(cat.term_stats_for(sorted(field_terms)).keys())
        q = A.prune_absent_terms(q, present)
    if isinstance(q, A.NoneNode):
        return _empty_ids(cat.spark)
    docs = cat.docs_live()
    return _eval_hybrid(cat, q, docs)


def cache_filter(cat: IndexCatalog, name: str, query: A.Node) -> DataFrame:
    """Evaluate + persist a named filter for reuse via
    A.cached_filter(name) — P9 (cached-filter.ts:10-41). Backed by
    Spark's block-manager persistence instead of a per-segment bitmap
    memo."""
    ids = execute_boolean(cat, query).persist()
    ids.count()  # materialize now so later queries reuse, not recompute
    if not hasattr(cat, "_filter_cache"):
        cat._filter_cache = {}
    old = cat._filter_cache.get(name)
    if old is not None:
        old.unpersist()  # re-caching a name must not leak the old blocks
    cat._filter_cache[name] = ids
    return ids


def uncache_filter(cat: IndexCatalog, name: str | None = None) -> int:
    """Drop cached filter(s) and free their persisted blocks — the
    explicit eviction the reference's bounded LRU provided implicitly
    (lru-cache.ts:19-108; VERDICT r3 #8: an unbounded registry pins
    block-manager memory for the catalog's lifetime). `name=None`
    clears every cached filter. Returns how many were dropped."""
    cache = getattr(cat, "_filter_cache", None)
    if not cache:
        return 0
    names = list(cache) if name is None else ([name] if name in cache else [])
    for n in names:
        cache.pop(n).unpersist()
    return len(names)


def search(
    cat: IndexCatalog,
    query: A.Node,
    sort: list[tuple[str, str]] | None = None,
    limit: int | None = None,
    projection: list[str] | None = None,
    collation: str | None = None,
) -> DataFrame:
    """Boolean search with sort/limit/projection (T1-T4, P1).

    sort+limit compiles to Catalyst's TakeOrderedAndProject — the same
    per-partition-top-k + global-merge the reference hand-rolls
    (base-inverted-index.ts:430-455).

    `collation` applies to string sort keys: the reference compares
    strings with Intl.Collator(sensitivity:'base') — case- and
    accent-insensitive (utils.ts:41-46) — which is Spark's
    'UNICODE_CI_AI'; None keeps UTF8 binary order. Collation happens
    in the sort key only, JVM-side (Spark 4 collation support), so
    TakeOrderedAndProject still applies.
    """
    ids = execute_boolean(cat, query)
    docs = cat.docs_live()
    out = ids.join(docs, "doc_id", "inner")
    if projection:
        out = out.select("doc_id", *projection)
    if sort:

        def key(c: str):
            col = F.col(c)
            if collation is not None and dict(out.dtypes).get(c) == "string":
                col = F.collate(col, collation)
            return col

        out = out.orderBy(
            *[
                (key(c).desc() if d.lower().startswith("d") else key(c).asc())
                for c, d in sort
            ],
            F.col("doc_id").asc(),
        )
    if limit is not None:
        out = out.limit(limit)
    return out


#: the reference's opinionatedCompare collation (F7)
REFERENCE_COLLATION = "UNICODE_CI_AI"
