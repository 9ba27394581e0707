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
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from yaii_spark.codec import delta_decode_blocked, varint_decode
from yaii_spark.queries.executor import (
    _bhi,
    _blo,
    _range_sliced_arr,
    _range_sliced_bin,
    _range_split_plan,
    _tomb_with_rid,
    _with_range_spans,
)
from yaii_spark.storage import IndexCatalog


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


#: minimum estimated postings per range task for the BM25 range split —
#: below this the vectorized per-segment pass is already fast enough
#: that the split's replicate+slice overhead loses (measured at 1M docs)
RANGE_SPLIT_MIN_POSTINGS = 1 << 20


_EMPTY = lambda: pd.DataFrame(
    {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
)


#: decoded-bytes accounting for the lazy block decode (in-process only —
#: meaningful when the scorer is called directly, as the pruning tests
#: do; Spark workers keep their own copies)
DECODE_STATS = {"bytes_decoded": 0, "bytes_total": 0, "blocks_decoded": 0, "blocks_total": 0}


def reset_decode_stats() -> None:
    for k in DECODE_STATS:
        DECODE_STATS[k] = 0


class _LazyPostings:
    """Lazy accessor over one blocked posting row (FORMAT_VERSION 4):
    each block's doc-id deltas restart absolute and its byte offsets are
    stored, so single blocks decode independently — MaxScore's killed
    blocks are never touched (VERDICT r2 #5; the format analogue of
    Lucene skip blocks). Returns LOCAL doc ids (base subtracted)."""

    __slots__ = (
        "ids_bin", "tfs_bin", "id_offs", "tf_offs", "first_ids",
        "n", "block", "base", "_blocks", "_full",
    )

    def __init__(self, ids_bin, tfs_bin, id_offs, tf_offs, first_ids, n, block, base):
        self.ids_bin = ids_bin
        self.tfs_bin = tfs_bin
        self.id_offs = np.asarray(id_offs, dtype=np.int64)
        self.tf_offs = np.asarray(tf_offs, dtype=np.int64)
        self.first_ids = np.asarray(first_ids, dtype=np.int64) - base
        self.n = int(n)
        self.block = int(block)
        self.base = int(base)
        self._blocks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._full: tuple[np.ndarray, np.ndarray] | None = None
        DECODE_STATS["bytes_total"] += len(ids_bin) + len(tfs_bin)
        DECODE_STATS["blocks_total"] += len(self.id_offs)

    def nblocks(self) -> int:
        return len(self.id_offs)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        """(local_ids, tfs) for the whole list (single-shot decode)."""
        if self._full is None:
            ids = delta_decode_blocked(self.ids_bin, self.block).astype(np.int64) - self.base
            tfs = varint_decode(self.tfs_bin).astype(np.float64)
            self._full = (ids, tfs)
            DECODE_STATS["bytes_decoded"] += len(self.ids_bin) + len(self.tfs_bin)
            DECODE_STATS["blocks_decoded"] += self.nblocks()
        return self._full

    def _block_slice(self, buf: bytes, offs: np.ndarray, bx: int) -> bytes:
        lo = int(offs[bx])
        hi = int(offs[bx + 1]) if bx + 1 < len(offs) else len(buf)
        return buf[lo:hi]

    def decode_block(self, bx: int) -> tuple[np.ndarray, np.ndarray]:
        if self._full is not None:
            s = slice(bx * self.block, (bx + 1) * self.block)
            return self._full[0][s], self._full[1][s]
        got = self._blocks.get(bx)
        if got is None:
            ib = self._block_slice(self.ids_bin, self.id_offs, bx)
            tb = self._block_slice(self.tfs_bin, self.tf_offs, bx)
            ids = delta_decode_blocked(ib, self.block).astype(np.int64) - self.base
            tfs = varint_decode(tb).astype(np.float64)
            got = self._blocks[bx] = (ids, tfs)
            DECODE_STATS["bytes_decoded"] += len(ib) + len(tb)
            DECODE_STATS["blocks_decoded"] += 1
        return got

    def blocks_for(self, sorted_local_ids: np.ndarray) -> np.ndarray:
        """Which blocks could contain any of these (sorted local) ids."""
        bx = np.searchsorted(self.first_ids, sorted_local_ids, side="right") - 1
        bx = bx[bx >= 0]
        return np.unique(bx)

    def lookup(self, sorted_local_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hit_mask, tfs_of_hits) for the given sorted local ids —
        decodes only the blocks that can contain them, and each block
        is probed only with ITS OWN slice of the query ids (ids are
        sorted, so per-block slices are contiguous): O(|q|·log B +
        decoded blocks), never O(B·|q|). When the ids spread over most
        blocks anyway (a corpus-sized candidate set against a dense
        term) a single full decode + one searchsorted is cheaper than
        thousands of slice decodes."""
        q = sorted_local_ids
        hit = np.zeros(q.size, dtype=bool)
        tfs_out = np.empty(q.size, dtype=np.float64)
        qb = np.searchsorted(self.first_ids, q, side="right") - 1
        valid = np.flatnonzero(qb >= 0)
        if valid.size == 0:
            return hit, tfs_out
        blocks, starts = np.unique(qb[valid], return_index=True)
        if self._full is not None or blocks.size > max(32, self.nblocks() // 2):
            ids, tfs = self.decode_all()
            pos = np.searchsorted(ids, q)
            pos_c = np.clip(pos, 0, ids.size - 1)
            m = ids[pos_c] == q
            hit |= m
            tfs_out[m] = tfs[pos_c[m]]
            return hit, tfs_out
        bounds = np.append(starts, valid.size)
        for j in range(blocks.size):
            sel = valid[bounds[j] : bounds[j + 1]]
            ids_b, tfs_b = self.decode_block(int(blocks[j]))
            pos = np.searchsorted(ids_b, q[sel])
            pos_c = np.clip(pos, 0, ids_b.size - 1)
            m = ids_b[pos_c] == q[sel]
            tfs_out[sel[m]] = tfs_b[pos_c[m]]
            hit[sel[m]] = True
        return hit, tfs_out


def _score_segment_pruned(
    pdf: pd.DataFrame,
    idfs: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    block: int,
    deleted: np.ndarray | None = None,
    rng: tuple[int, int] | None = None,
) -> pd.DataFrame:
    """MaxScore + block-max pruned top-k (mode='or', rank-safe, LAZY).

    Term-at-a-time in descending upper-bound order. While a term is
    ESSENTIAL (Σ upper bounds of it + all later terms ≥ the running
    kth-score threshold θ — a brand-new doc could still reach the
    top-k) its list is decoded in full, and before adding it any doc
    whose accumulated score + per-posting block-max bound + remaining
    upper bounds can't reach θ is marked dead. Once the suffix bound
    drops below θ the remaining terms are NON-ESSENTIAL: no unseen doc
    can enter the top-k anymore, so only current candidates matter —
    candidates are pre-killed against θ with zero IO, and only the
    blocks that can contain surviving candidates are decoded
    (`_LazyPostings`; killed blocks' bytes are never touched).
    Survivors are then rescored exactly in sorted-term order so output
    floats are byte-identical to the exact path.
    """
    n_docs = int(pdf["n_docs"].iloc[0])
    base = int(pdf["base_doc_id"].iloc[0])
    dls = varint_decode(pdf["dl_bin"].iloc[0]).astype(np.float64)
    term_rows: dict[str, tuple[_LazyPostings, np.ndarray]] = {}
    for t, ids_b, tfs_b, bmax, io_, to_, fi_, n_ in zip(
        pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"], pdf["block_maxes"],
        pdf["block_id_offs"], pdf["block_tf_offs"], pdf["block_first_ids"],
        pdf["df_local"],
    ):
        # a range-sliced row can carry zero blocks (term absent from
        # this doc-id range): contributes nothing, skip it
        if t in idfs and fi_ is not None and len(fi_):
            lp = _LazyPostings(ids_b, tfs_b, io_, to_, fi_, n_, block, base)
            term_rows[t] = (lp, np.asarray(bmax, dtype=np.float64))
    if not term_rows:
        return _EMPTY()
    ubs = {t: idfs[t] * float(bm.max()) for t, (_, bm) in term_rows.items()}
    order = sorted(term_rows, key=lambda t: (-ubs[t], t))
    suffix = np.concatenate(
        (np.cumsum([ubs[t] for t in order][::-1])[::-1], [0.0])
    )  # suffix[i] = Σ ub of order[i:]
    scores = np.zeros(n_docs, dtype=np.float64)
    dead = np.zeros(n_docs, dtype=bool)
    if rng is not None:
        # range task: boundary blocks spill past [lo, hi) — kill the
        # out-of-range docs upfront so every downstream phase (θ,
        # candidates, winners) is range-local and sibling tasks never
        # emit the same doc
        lo, hi = max(0, rng[0]), min(rng[1], n_docs)
        dead[:lo] = True
        dead[hi:] = True
    if deleted is not None:
        dead[deleted - base] = True
    touched: list[np.ndarray] = []
    theta = -np.inf
    n_seen = 0
    cand: np.ndarray | None = None  # frozen candidate set (sorted) once non-essential
    for i, t in enumerate(order):
        lp, bmax = term_rows[t]
        if cand is None and np.isfinite(theta) and suffix[i] < theta:
            # one-way switch: θ only grows and suffix only shrinks, so
            # every term from here on is non-essential — freeze the
            # candidate set (no unseen doc can reach θ anymore)
            if not touched:
                return _EMPTY()
            cand = np.unique(np.concatenate(touched))
            cand = cand[~dead[cand]]
        if cand is not None:
            # candidate-driven: pre-kill against θ with zero IO, then
            # decode only the blocks that can contain survivors
            keep = scores[cand] + suffix[i] >= theta
            dead[cand[~keep]] = True
            cand = cand[keep]
            if cand.size == 0:
                return _EMPTY()
            hit, tfv = lp.lookup(cand)
            if hit.any():
                sids = cand[hit]
                stfs = tfv[hit]
                norm = stfs / (stfs + k1 * (1.0 - b + b * dls[sids] / avgdl))
                scores[sids] += idfs[t] * norm
                if cand.size >= k:
                    theta = np.partition(scores[cand], cand.size - k)[cand.size - k]
            continue
        ids, tfs = lp.decode_all()
        alive = ~dead[ids]
        # the kill pass can only fire if SOME posting's ceiling
        # (zero accumulated score + its block bound + remaining ubs)
        # sits below θ — on dense flat lists (stopword-grade terms,
        # near-uniform block maxes) that is provably impossible and the
        # pass would only allocate 1M-entry temporaries for nothing
        # (measured 4x overhead vs exact at 1M docs/segment)
        can_kill = (
            theta > 0.0
            and i > 0
            and idfs[t] * float(bmax.min()) + suffix[i + 1] < theta
        )
        if can_kill:
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
                c = np.unique(np.concatenate(touched))
                c = c[~dead[c]]
                if c.size >= k:
                    theta = np.partition(scores[c], c.size - k)[c.size - k]
    if cand is None:
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
    winners = np.sort(cand[order_ix])
    # exact rescore in sorted-term order → byte-identical to dense path
    # (winner lookups decode only blocks containing winners, usually
    # already cached from the scoring passes)
    final = np.zeros(winners.size, dtype=np.float64)
    for t in sorted(term_rows):
        lp, _ = term_rows[t]
        hit, tfv = lp.lookup(winners)
        if hit.any():
            tf = tfv[hit]
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
    block: int,
    deleted: np.ndarray | None = None,
    rng: tuple[int, int] | None = None,
) -> pd.DataFrame:
    n_docs = int(pdf["n_docs"].iloc[0])
    base = int(pdf["base_doc_id"].iloc[0])
    dls = varint_decode(pdf["dl_bin"].iloc[0]).astype(np.float64)
    scores = np.zeros(n_docs, dtype=np.float64)
    hit_count = np.zeros(n_docs, dtype=np.int32)
    rows = {t: (ids_b, tfs_b) for t, ids_b, tfs_b in zip(pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"])}
    n_terms = 0
    lo_hi = None
    if rng is not None:
        lo_hi = (max(0, rng[0]), min(rng[1], n_docs))
    for term in sorted(rows):  # fixed order → deterministic float sums
        if term not in idfs:
            continue
        n_terms += 1
        ids_b, tfs_b = rows[term]
        ids = (delta_decode_blocked(ids_b or b"", block).astype(np.int64) - base)
        tfs = varint_decode(tfs_b or b"").astype(np.float64)
        if lo_hi is not None:
            # range-sliced streams: boundary blocks spill past the
            # range — mask so each doc scores in exactly one task
            s, e = np.searchsorted(ids, lo_hi)
            ids, tfs = ids[s:e], tfs[s:e]
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


def _apply_range_split_bm25(
    joined, spark, r: int, w: int, use_prune: bool, block: int
):
    """Replicate each segment's posting rows across R doc-id ranges and
    byte-slice the id/tf streams to each range's block interval (shared
    primitives with the boolean/phrase splitter). On the pruned path
    the per-block metadata (block_maxes, first_ids, byte offsets) is
    sliced/rebased alongside so `_LazyPostings` sees a self-contained
    stream; df_local becomes the sliced stream's posting count (its
    only consumer). dl_bin replicates ×R per segment — acceptable in
    the few-segment regime this path is gated to, and the scorers kill
    boundary-block spill so each doc scores in exactly one task."""
    out = _with_range_spans(joined, spark, r, w)
    out = (
        out.withColumn(
            "_ids_sl", _range_sliced_bin(F.col("doc_ids_bin"), F.col("block_id_offs"))
        ).withColumn(
            "_tfs_sl", _range_sliced_bin(F.col("tfs_bin"), F.col("block_tf_offs"))
        )
    )
    drop = ["_ids_sl", "_tfs_sl", "_b"]
    if use_prune:
        n_sliced = F.greatest(
            F.lit(0),
            F.least(F.col("df_local").cast("long"), _bhi().cast("long") * block)
            - _blo().cast("long") * block,
        )
        out = (
            out.withColumn("_bm_sl", _range_sliced_arr(F.col("block_maxes")))
            .withColumn("_io_sl", _range_sliced_arr(F.col("block_id_offs"), rebase=True))
            .withColumn("_to_sl", _range_sliced_arr(F.col("block_tf_offs"), rebase=True))
            .withColumn("_fi_sl", _range_sliced_arr(F.col("block_first_ids")))
            .withColumn("_df_sl", F.when(F.col("_b").isNotNull(), n_sliced))
            .withColumn("block_maxes", F.col("_bm_sl"))
            .withColumn("block_id_offs", F.col("_io_sl"))
            .withColumn("block_tf_offs", F.col("_to_sl"))
            .withColumn("block_first_ids", F.col("_fi_sl"))
            .withColumn("df_local", F.col("_df_sl"))
        )
        drop += ["_bm_sl", "_io_sl", "_to_sl", "_fi_sl", "_df_sl"]
    else:
        drop += [
            c
            for c in ("block_id_offs", "block_tf_offs", "block_first_ids")
            if c in joined.columns
        ]
    return (
        out.withColumn("doc_ids_bin", F.col("_ids_sl"))
        .withColumn("tfs_bin", F.col("_tfs_sl"))
        .drop(*drop)
    )


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

    k1, b, avgdl = stats.k1, stats.b, stats.avgdl
    # block size travels with the index (corpus_stats.block_size): the
    # bound is only rank-safe when it matches what the writer used
    block = stats.block_size
    use_prune = prune and mode == "or"
    if use_prune:
        # MaxScore prunes by shrinking the ESSENTIAL set below the
        # rarest terms — if even the rarest query term is dense
        # (df/N above ~30%), θ can never climb past the remaining
        # upper bounds and the pruned pass is pure bookkeeping over
        # exact (measured 2.7x slower on an all-dense pair at 1M docs).
        # Both paths return byte-identical output, so fall back.
        min_df = min(df for (df, _cf) in tstats.values())
        if min_df / max(stats.n_docs, 1) > 0.3:
            use_prune = False
    # doc-id-range fan-out for merged / few-segment indexes (same gate
    # as boolean/phrase eval; None at cluster scale, where segments
    # already outnumber executors) — plus a work gate: BM25 scoring is
    # one vectorized pass over the query terms' postings, so a range
    # task only pays off when its share of postings is large enough to
    # amortize the replicate+slice overhead (the 1M-doc probe measured
    # the split 0.1-0.2 s SLOWER on ~70k-posting range tasks while
    # phrase eval gained 2-3×). Forced YAII_RANGE_SPLIT skips the work
    # gate so tests can exercise the path on tiny fixtures.
    range_plan = _range_split_plan(cat)
    if range_plan is not None and not os.environ.get(
        "YAII_RANGE_SPLIT", ""
    ).strip().isdigit():
        n_segs = max(1, -(-stats.n_docs // stats.seg_size))
        per_task = sum(df for (df, _cf) in tstats.values()) / n_segs / range_plan[0]
        if per_task < RANGE_SPLIT_MIN_POSTINGS:
            range_plan = None

    cols = ["seg_id", "term", "doc_ids_bin", "tfs_bin"] + (
        ["block_maxes", "block_id_offs", "block_tf_offs", "block_first_ids", "df_local"]
        if prune
        else (
            # the slicer needs the block geometry even on the exact path
            ["block_id_offs", "block_tf_offs", "block_first_ids"]
            if range_plan
            else []
        )
    )
    post = cat.postings([(field, t) for t in sorted(idfs)]).select(*cols)
    meta = cat.seg_meta().select(
        "seg_id", "n_docs", "base_doc_id", "dl_bin", "avgdl_built"
    )
    joined = post.join(meta, "seg_id", "inner")
    if range_plan is not None:
        joined = _apply_range_split_bm25(
            joined, spark, range_plan[0], range_plan[1], use_prune, block
        )
    tomb = cat.tombstones()

    def score(pdf: pd.DataFrame, deleted: np.ndarray | None) -> pd.DataFrame:
        if pdf.empty:
            return _EMPTY()
        rng = None
        if range_plan is not None:
            rid = int(pdf["_rid"].iloc[0])
            rng = (rid * range_plan[1], (rid + 1) * range_plan[1])
        # block_maxes are upper bounds ONLY under the avgdl they were
        # computed with (norm grows with avgdl): a segment appended by
        # the streaming sink after the corpus avgdl drifted scores via
        # the exact path — rank-safe always, pruned again once a merge
        # recomputes its bounds with the current corpus avgdl
        if use_prune and float(pdf["avgdl_built"].iloc[0]) == avgdl:
            return _score_segment_pruned(
                pdf, idfs, k1, b, avgdl, k, block, deleted, rng
            )
        return _score_segment(
            pdf, idfs, k1, b, avgdl, k, mode, block, deleted, rng
        )

    keys = ["seg_id"] + (["_rid"] if range_plan is not None else [])
    if tomb is None:

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return score(pdf, None)

        per_seg = joined.groupBy(*keys).applyInPandas(fn, schema="doc_id long, score double")
    else:
        # cogrouped tombstones: shuffle-partitioned per segment, never a
        # collected array row / driver broadcast (scale: a segment can
        # hold millions of deletes)
        def fn2(pdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
            deleted = tpdf["doc_id"].to_numpy(dtype=np.int64) if len(tpdf) else None
            return score(pdf, deleted)

        tomb_keyed = tomb.select("seg_id", "doc_id")
        if range_plan is not None:
            tomb_keyed = _tomb_with_rid(tomb_keyed, stats.seg_size, range_plan[1])
        per_seg = (
            joined.groupBy(*keys)
            .cogroup(tomb_keyed.groupBy(*keys))
            .applyInPandas(fn2, schema="doc_id long, score double")
        )
    return per_seg.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def _score_segment_fielded(
    pdf: pd.DataFrame,
    idfs: dict[tuple[str, str], float],
    weights: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    block: int,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """Per-segment weighted multi-field accumulation: one vectorized
    pass per (field, term) posting list in sorted order (deterministic
    float sums), combined score = Σ_f w_f · idf_f(t) · sat(tf_f).
    Norms share the index's single dl (defined from text_col at build
    time) — per-field length norms would need per-field dl blobs,
    which the format deliberately doesn't store (SURVEY §1.2)."""
    n_docs = int(pdf["n_docs"].iloc[0])
    base = int(pdf["base_doc_id"].iloc[0])
    dls = varint_decode(pdf["dl_bin"].iloc[0]).astype(np.float64)
    scores = np.zeros(n_docs, dtype=np.float64)
    hit = np.zeros(n_docs, dtype=bool)
    rows = {
        (f, t): (ids_b, tfs_b)
        for f, t, ids_b, tfs_b in zip(
            pdf["field"], pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"]
        )
    }
    for key in sorted(rows):
        if key not in idfs:
            continue
        ids_b, tfs_b = rows[key]
        ids = delta_decode_blocked(ids_b or b"", block).astype(np.int64) - base
        tfs = varint_decode(tfs_b or b"").astype(np.float64)
        norm = tfs / (tfs + k1 * (1.0 - b + b * dls[ids] / avgdl))
        scores[ids] += weights[key[0]] * idfs[key] * norm
        hit[ids] = True
    if deleted is not None:
        hit[deleted - base] = False
    cand = np.flatnonzero(hit)
    if cand.size == 0:
        return _EMPTY()
    s = scores[cand]
    if cand.size > k:
        thresh = np.partition(-s, k - 1)[k - 1]
        keep = np.flatnonzero(-s <= thresh)
        cand, s = cand[keep], s[keep]
    order = np.lexsort((cand, -s))[:k]
    return pd.DataFrame(
        {"doc_id": (cand[order] + base).astype(np.int64), "score": s[order]}
    )


def bm25f_topk(
    cat: IndexCatalog,
    terms: list[str],
    weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """Weighted multi-field BM25 top-k — fielded retrieval, the shape
    behind 'title^2 body^1' boosting:

        score(d) = Σ_f w_f · Σ_t idf_f(t) · tf_{f,t} /
                   (tf_{f,t} + k1·(1 − b + b·dl_d/avgdl))

    Each field scores against its OWN dictionary (df, and therefore
    idf, are per-field — a term buried in one field but rare in
    another boosts accordingly); a (field, term) pair absent from that
    field's dictionary contributes zero. This is the per-field-sum
    form Lucene/ES `multi_match most_fields` computes, NOT Robertson
    BM25F proper (which blends tf across fields before saturation —
    that needs per-field length norms the index format deliberately
    doesn't store; the shared-text-dl norm is the index's defined
    semantics, see build_index docstring).

    Disjunctive, exact path (no MaxScore/range-split fan-out — the
    combined per-(field,term) bounds those optimizations need aren't
    materialized; at cluster scale segments outnumber executors so the
    per-segment parallelism is already there). Same per-segment
    top-k + global TakeOrderedAndProject merge as bm25_topk; combined
    per-segment top-k is rank-safe because each segment task sees BOTH
    fields' postings for its segment."""
    spark = cat.spark
    stats = cat.corpus_stats()
    uniq = sorted(set(terms))
    fields = sorted(weights)
    tstats = cat.term_stats_for([(f, t) for f in fields for t in uniq])
    idfs = {
        (f, t): idf(stats.n_docs, df) for (f, t), (df, _) in tstats.items()
    }
    if not idfs:
        return spark.createDataFrame([], "doc_id long, score double")
    k1, b, avgdl = stats.k1, stats.b, stats.avgdl
    block = stats.block_size
    w = {f: float(weights[f]) for f in fields}

    post = cat.postings(sorted(idfs)).select(
        "seg_id", "field", "term", "doc_ids_bin", "tfs_bin"
    )
    meta = cat.seg_meta().select("seg_id", "n_docs", "base_doc_id", "dl_bin")
    joined = post.join(meta, "seg_id", "inner")
    tomb = cat.tombstones()

    if tomb is None:

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return _EMPTY()
            return _score_segment_fielded(
                pdf, idfs, w, k1, b, avgdl, k, block, None
            )

        per_seg = joined.groupBy("seg_id").applyInPandas(
            fn, schema="doc_id long, score double"
        )
    else:

        def fn2(pdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return _EMPTY()
            deleted = (
                tpdf["doc_id"].to_numpy(dtype=np.int64) if len(tpdf) else None
            )
            return _score_segment_fielded(
                pdf, idfs, w, k1, b, avgdl, k, block, deleted
            )

        per_seg = (
            joined.groupBy("seg_id")
            .cogroup(tomb.select("seg_id", "doc_id").groupBy("seg_id"))
            .applyInPandas(fn2, schema="doc_id long, score double")
        )
    return per_seg.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def more_like_this(
    cat: IndexCatalog,
    doc_id: int,
    top_terms: int = 5,
    k: int = 10,
    field: str = "text",
    text_col: str = "text",
) -> DataFrame:
    """More-like-this: rank the corpus by BM25 similarity to one
    document. The query is the doc's `top_terms` terms by tf·idf
    (ties broken by term asc — a total, reproducible order), extracted
    by re-analyzing the doc's STORED text (one 1-row lookup) with idfs
    from the pruned dictionary lookup (bounded by the doc's distinct
    terms, bucket-partition-pruned); then a standard disjunctive
    bm25_topk over those terms with the source doc excluded.

    Everything driver-side is bounded by ONE document's size: the text
    collect is 1 row, the dictionary lookup ≤ |doc| terms. The scoring
    pass is the existing distributed per-segment scorer."""
    from collections import Counter

    from yaii_spark.analyzer import tokenize

    rows = (
        cat.docs()
        .filter(F.col("doc_id") == int(doc_id))
        .select(text_col)
        .collect()
    )
    if not rows:
        raise ValueError(f"more_like_this: doc_id {doc_id} not found")
    tf = Counter(tokenize(rows[0][0] or ""))
    stats = cat.corpus_stats()
    ts = {
        r.term: int(r.df)
        for r in cat.term_stats_query(
            [(field, t) for t in tf]
        ).collect()  # ≤ |doc| distinct terms
    }
    ranked = sorted(
        ((t, tf[t] * idf(stats.n_docs, ts[t])) for t in tf if t in ts),
        key=lambda x: (-x[1], x[0]),
    )
    terms = [t for t, _ in ranked[: max(1, top_terms)]]
    if not terms:
        return cat.spark.createDataFrame([], "doc_id long, score double")
    out = bm25_topk(cat, terms, k=k + 1, mode="or")
    return (
        out.filter(F.col("doc_id") != int(doc_id))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def _score_segment_batch(
    pdf: pd.DataFrame,
    qterms: dict[str, list[str]],
    idfs: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    mode: str,
    block: int,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """One decode pass shared by every query in the batch: each present
    term's postings decode ONCE into (local ids, idf·saturation)
    contribution arrays, then each query sums its own terms' arrays —
    per-query float summation order is the same sorted-term order as
    the single-query scorer, so scores are byte-identical to
    bm25_topk run per query."""
    n_docs = int(pdf["n_docs"].iloc[0])
    base = int(pdf["base_doc_id"].iloc[0])
    dls = varint_decode(pdf["dl_bin"].iloc[0]).astype(np.float64)
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t, ids_b, tfs_b in zip(pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"]):
        if t not in idfs or t in decoded:
            continue
        ids = delta_decode_blocked(ids_b or b"", block).astype(np.int64) - base
        tfs = varint_decode(tfs_b or b"").astype(np.float64)
        contrib = idfs[t] * (
            tfs / (tfs + k1 * (1.0 - b + b * dls[ids] / avgdl))
        )
        decoded[t] = (ids, contrib)
    out_q, out_d, out_s = [], [], []
    dead = None
    if deleted is not None:
        dead = np.zeros(n_docs, dtype=bool)
        dead[deleted - base] = True
    for qid in sorted(qterms):
        uniq = sorted(set(qterms[qid]))
        present = [t for t in uniq if t in decoded]
        if not present or (mode == "and" and len(present) < len(uniq)):
            continue
        scores = np.zeros(n_docs, dtype=np.float64)
        hits = np.zeros(n_docs, dtype=np.int32)
        for t in present:  # sorted order → deterministic float sums
            ids, contrib = decoded[t]
            scores[ids] += contrib
            hits[ids] += 1
        if dead is not None:
            hits[dead] = 0
        need = len(uniq) if mode == "and" else 1
        cand = np.flatnonzero(hits >= need)
        if cand.size == 0:
            continue
        s = scores[cand]
        if cand.size > k:
            thresh = np.partition(-s, k - 1)[k - 1]
            keep = np.flatnonzero(-s <= thresh)
            cand, s = cand[keep], s[keep]
        order = np.lexsort((cand, -s))[:k]
        out_q.extend([qid] * order.size)
        out_d.extend((cand[order] + base).tolist())
        out_s.extend(s[order].tolist())
    return pd.DataFrame(
        {
            "query_id": pd.Series(out_q, dtype="object"),
            "doc_id": pd.Series(out_d, dtype="int64"),
            "score": pd.Series(out_s, dtype="float64"),
        }
    )


def bm25_topk_batch(
    cat: IndexCatalog,
    queries: dict[str, list[str]],
    k: int = 10,
    mode: str = "or",
    field: str = "text",
) -> DataFrame:
    """Score a BATCH of queries in ONE pass over the postings —
    the 100-TB workload pattern: a query log of thousands amortizes
    the postings scan, the seg_meta broadcast, and the scheduler
    overhead across the batch instead of paying one Spark job per
    query. Returns (query_id, doc_id, score), per-query top-k.

    Plan: the UNION of every query's (field, term) pairs is pushed
    into one postings read (same row-group-pruned scan as a single
    query), each segment task decodes every term ONCE and reuses the
    contribution arrays across queries, per-(segment, query) top-k in
    the worker, then ONE window-ranked global merge partitioned by
    query_id. Per-query output is rank- AND score-identical to
    bm25_topk (same sorted-term summation; pinned in pytest).

    Known limitation (shared with bm25f_topk): unlike bm25_topk, this
    path does not apply the over-compaction doc-id-range fan-out
    (_apply_range_split_bm25), so on an index merged below
    defaultParallelism segments it parallelizes only by segment. The
    batch workload itself usually restores utilization (many queries
    per task); wire the range split in if a merged index must serve
    small batches."""
    from pyspark.sql import Window

    spark = cat.spark
    stats = cat.corpus_stats()
    all_terms = sorted({t for ts in queries.values() for t in ts})
    tstats = cat.term_stats_for([(field, t) for t in all_terms])
    idfs = {t: idf(stats.n_docs, df) for (_, t), (df, _) in tstats.items()}
    if not idfs:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, score double"
        )
    k1, b, avgdl = stats.k1, stats.b, stats.avgdl
    block = stats.block_size
    # explicit broadcast variable, not task-closure capture: at the
    # thousands-of-query workloads this function is for, the query
    # structures are re-serialized into EVERY task closure (once per
    # task, per stage) when captured — a broadcast ships them to each
    # executor once and the closure carries only the handle
    qb = spark.sparkContext.broadcast(
        ({str(q): [str(t) for t in ts] for q, ts in queries.items()}, idfs)
    )

    post = cat.postings([(field, t) for t in sorted(idfs)]).select(
        "seg_id", "term", "doc_ids_bin", "tfs_bin"
    )
    meta = cat.seg_meta().select("seg_id", "n_docs", "base_doc_id", "dl_bin")
    joined = post.join(meta, "seg_id", "inner")
    tomb = cat.tombstones()
    schema = "query_id string, doc_id long, score double"

    if tomb is None:

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": []}
                ).astype({"doc_id": "int64", "score": "float64"})
            qterms_b, idfs_b = qb.value
            return _score_segment_batch(
                pdf, qterms_b, idfs_b, k1, b, avgdl, k, mode, block, None
            )

        per_seg = joined.groupBy("seg_id").applyInPandas(fn, schema=schema)
    else:

        def fn2(pdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": []}
                ).astype({"doc_id": "int64", "score": "float64"})
            deleted = (
                tpdf["doc_id"].to_numpy(dtype=np.int64) if len(tpdf) else None
            )
            qterms_b, idfs_b = qb.value
            return _score_segment_batch(
                pdf, qterms_b, idfs_b, k1, b, avgdl, k, mode, block, deleted
            )

        per_seg = (
            joined.groupBy("seg_id")
            .cogroup(tomb.select("seg_id", "doc_id").groupBy("seg_id"))
            .applyInPandas(fn2, schema=schema)
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_seg.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
