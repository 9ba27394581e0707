"""BM25 top-k scoring (SURVEY.md §7.1 M5; north_rule centerpiece).

Formula (Lucene form, k1=1.2, b=0.75 — the reference's stated design
base, /root/reference/readme.md:26; yaii itself has no scoring):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,q) = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))

Execution: broadcast term statistics (df, N, avgdl) → one
``applyInPandas`` task per segment decodes the query terms' postings,
accumulates scores into a dense per-segment array **in sorted-term
order** (float determinism across parallelism levels — SURVEY.md
§7.4.1), takes a per-segment top-k, then a global
``orderBy(score desc, doc_id asc).limit(k)`` merge — Catalyst's
TakeOrderedAndProject, the distributed form of the reference's
per-segment topBy + global topBy (base-inverted-index.ts:437-455).

Pruning: a MaxScore/block-max pass (`prune=True`) skips non-essential
term lists using the per-block upper bounds stored at build time
(`block_maxes`, indexer.py). Rank-safe: pytest asserts pruned ==
exact. The per-term upper bound idf·max_norm and the cost-ascending
term ordering generalize the reference's cost-sorted conjunction
(operations.ts:113-114) to scored retrieval.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from yaii_spark.codec import delta_decode, varint_decode
from yaii_spark.storage import IndexCatalog


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


_EMPTY = lambda: pd.DataFrame(
    {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
)


def _score_segment_pruned(
    pdf: pd.DataFrame,
    idfs: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    block: int,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """MaxScore + block-max pruned top-k (mode='or', rank-safe).

    Term-at-a-time in descending upper-bound order. Before adding term
    i's postings, any candidate whose accumulated score + per-posting
    block-max bound + remaining terms' upper bounds can't reach the
    running kth-score threshold is marked dead (it provably cannot
    enter the top-k). Survivors are then rescored exactly in sorted-term
    order so output floats are byte-identical to the exact path.
    """
    n_docs = int(pdf["n_docs"].iloc[0])
    base = int(pdf["base_doc_id"].iloc[0])
    dls = varint_decode(pdf["dl_bin"].iloc[0]).astype(np.float64)
    term_rows = {}
    for t, ids_b, tfs_b, bmax in zip(
        pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"], pdf["block_maxes"]
    ):
        if t in idfs:
            ids = delta_decode(ids_b).astype(np.int64) - base
            tfs = varint_decode(tfs_b).astype(np.float64)
            term_rows[t] = (ids, tfs, np.asarray(bmax, dtype=np.float64))
    if not term_rows:
        return _EMPTY()
    ubs = {t: idfs[t] * float(bm.max()) for t, (_, _, bm) in term_rows.items()}
    order = sorted(term_rows, key=lambda t: (-ubs[t], t))
    suffix = np.concatenate(
        (np.cumsum([ubs[t] for t in order][::-1])[::-1], [0.0])
    )  # suffix[i] = Σ ub of order[i:]
    scores = np.zeros(n_docs, dtype=np.float64)
    dead = np.zeros(n_docs, dtype=bool)
    if deleted is not None:
        dead[deleted - base] = True
    touched: list[np.ndarray] = []
    theta = -np.inf
    n_seen = 0
    for i, t in enumerate(order):
        ids, tfs, bmax = term_rows[t]
        alive = ~dead[ids]
        if theta > 0.0 and i > 0:
            # per-posting block-max bound for THIS term + global ubs of the rest
            post_ub = idfs[t] * bmax[np.arange(ids.size) // block]
            potential = scores[ids] + post_ub + suffix[i + 1]
            kill = alive & (potential < theta)
            dead[ids[kill]] = True
            alive &= ~kill
        sel = np.flatnonzero(alive)
        if sel.size:
            sids = ids[sel]
            stfs = tfs[sel]
            norm = stfs / (stfs + k1 * (1.0 - b + b * dls[sids] / avgdl))
            scores[sids] += idfs[t] * norm
            touched.append(sids)
            n_seen += sel.size
            if n_seen >= k:
                cand = np.unique(np.concatenate(touched))
                cand = cand[~dead[cand]]
                if cand.size >= k:
                    theta = np.partition(scores[cand], cand.size - k)[cand.size - k]
    if not touched:
        return _EMPTY()
    cand = np.unique(np.concatenate(touched))
    cand = cand[~dead[cand]]
    if cand.size == 0:
        return _EMPTY()
    s = scores[cand]
    if cand.size > k:
        thresh = np.partition(-s, k - 1)[k - 1]
        keep = np.flatnonzero(-s <= thresh)
        cand, s = cand[keep], s[keep]
    order_ix = np.lexsort((cand, -s))[:k]
    winners = cand[order_ix]
    # exact rescore in sorted-term order → byte-identical to dense path
    final = np.zeros(winners.size, dtype=np.float64)
    for t in sorted(term_rows):
        ids, tfs, _ = term_rows[t]
        pos = np.searchsorted(ids, winners)
        pos = np.clip(pos, 0, ids.size - 1)
        hit = ids[pos] == winners
        tf = tfs[pos[hit]]
        w = winners[hit]
        final[hit] += idfs[t] * (tf / (tf + k1 * (1.0 - b + b * dls[w] / avgdl)))
    order2 = np.lexsort((winners, -final))
    return pd.DataFrame(
        {"doc_id": (winners[order2] + base).astype(np.int64), "score": final[order2]}
    )


def _score_segment(
    pdf: pd.DataFrame,
    idfs: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    mode: str,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    n_docs = int(pdf["n_docs"].iloc[0])
    base = int(pdf["base_doc_id"].iloc[0])
    dls = varint_decode(pdf["dl_bin"].iloc[0]).astype(np.float64)
    scores = np.zeros(n_docs, dtype=np.float64)
    hit_count = np.zeros(n_docs, dtype=np.int32)
    rows = {t: (ids_b, tfs_b) for t, ids_b, tfs_b in zip(pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"])}
    n_terms = 0
    for term in sorted(rows):  # fixed order → deterministic float sums
        if term not in idfs:
            continue
        n_terms += 1
        ids_b, tfs_b = rows[term]
        ids = (delta_decode(ids_b).astype(np.int64) - base)
        tfs = varint_decode(tfs_b).astype(np.float64)
        norm = tfs / (tfs + k1 * (1.0 - b + b * dls[ids] / avgdl))
        scores[ids] += idfs[term] * norm
        hit_count[ids] += 1
    if deleted is not None:
        hit_count[deleted - base] = 0  # tombstoned docs never match
    if mode == "and":
        cand = np.flatnonzero(hit_count == len(idfs)) if n_terms == len(idfs) else np.empty(0, dtype=np.int64)
    else:
        cand = np.flatnonzero(hit_count > 0)
    if cand.size == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    s = scores[cand]
    if cand.size > k:
        # keep everything at-or-above the kth score so boundary ties can
        # still be broken by doc_id in the exact sort below
        thresh = np.partition(-s, k - 1)[k - 1]
        keep = np.flatnonzero(-s <= thresh)
        cand, s = cand[keep], s[keep]
    order = np.lexsort((cand, -s))[:k]
    return pd.DataFrame({"doc_id": (cand[order] + base).astype(np.int64), "score": s[order]})


def bm25_topk(
    cat: IndexCatalog,
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    prune: bool = False,
    field: str = "text",
) -> DataFrame:
    """Top-k (doc_id, score) for a bag of query terms.

    mode='or': any term matches (standard BM25 disjunctive top-k).
    mode='and': all terms must match (scored conjunction).
    Duplicate query terms are scored once (unique-term semantics).
    """
    spark = cat.spark
    stats = cat.corpus_stats()
    uniq = sorted(set(terms))
    tstats = cat.term_stats_for([(field, t) for t in uniq])
    idfs = {t: idf(stats.n_docs, df) for (_, t), (df, _) in tstats.items()}
    if not idfs or (mode == "and" and len(idfs) < len(uniq)):
        return spark.createDataFrame([], "doc_id long, score double")

    cols = ["seg_id", "term", "doc_ids_bin", "tfs_bin"] + (
        ["block_maxes"] if prune else []
    )
    post = cat.postings([(field, t) for t in sorted(idfs)]).select(*cols)
    meta = cat.seg_meta().select("seg_id", "n_docs", "base_doc_id", "dl_bin")
    joined = post.join(meta, "seg_id", "inner")
    tomb = cat.tombstones()
    k1, b, avgdl = stats.k1, stats.b, stats.avgdl
    # block size travels with the index (corpus_stats.block_size): the
    # bound is only rank-safe when it matches what the writer used
    block = stats.block_size
    use_prune = prune and mode == "or"

    def score(pdf: pd.DataFrame, deleted: np.ndarray | None) -> pd.DataFrame:
        if pdf.empty:
            return _EMPTY()
        if use_prune:
            return _score_segment_pruned(pdf, idfs, k1, b, avgdl, k, block, deleted)
        return _score_segment(pdf, idfs, k1, b, avgdl, k, mode, deleted)

    if tomb is None:

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return score(pdf, None)

        per_seg = joined.groupBy("seg_id").applyInPandas(fn, schema="doc_id long, score double")
    else:
        # cogrouped tombstones: shuffle-partitioned per segment, never a
        # collected array row / driver broadcast (scale: a segment can
        # hold millions of deletes)
        def fn2(pdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
            deleted = tpdf["doc_id"].to_numpy(dtype=np.int64) if len(tpdf) else None
            return score(pdf, deleted)

        per_seg = (
            joined.groupBy("seg_id")
            .cogroup(tomb.select("seg_id", "doc_id").groupBy("seg_id"))
            .applyInPandas(fn2, schema="doc_id long, score double")
        )
    return per_seg.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
