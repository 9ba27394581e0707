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

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from yaii_spark.codec import delta_decode_blocked
from yaii_spark.queries import ast as A
from yaii_spark.storage import IndexCatalog


def _empty_ids(spark) -> DataFrame:
    return spark.createDataFrame([], "doc_id long")


#: position-decode accounting (meaningful for driver-side direct calls,
#: as the lazy-phrase tests do; Spark workers keep their own copies —
#: same pattern as bm25.DECODE_STATS)
POS_DECODE_STATS = {
    "bytes_decoded": 0, "bytes_total": 0,
    "blocks_decoded": 0, "blocks_total": 0,
}


def reset_pos_decode_stats() -> None:
    for k in POS_DECODE_STATS:
        POS_DECODE_STATS[k] = 0


def _ragged_gather(vals: np.ndarray, offs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate vals[offs[i] : offs[i]+lens[i]] for all i —
    vectorized (repeat/arange), no per-run Python slicing."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, dtype=vals.dtype)
    out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = np.repeat(offs - out_starts, lens) + np.arange(tot, dtype=np.int64)
    return vals[idx]


class _LazyPositions:
    """Lazy accessor over one v5 posting row's position stream: each
    doc's positions are delta-encoded independently and byte offsets
    are stored at every id-block boundary (block_pos_offs), so the
    stream decodes PER BLOCK, only for blocks holding candidate docs —
    a selective phrase over a stopword-grade term no longer decodes the
    corpus-scale position stream (VERDICT r3 #1; the position analogue
    of bm25._LazyPostings). Block decode is the vectorized flat form
    (codec.decode_positions_flat) and candidate extraction is a ragged
    gather — no per-doc Python loop even when every block is touched
    (the dense×dense phrase case, where block skipping can't help but
    loop removal is the win)."""

    __slots__ = ("ids", "tfs", "pos_bin", "offs", "block", "_cache")

    def __init__(self, ids, tfs, pos_bin, offs, block):
        self.ids = ids  # local doc ids, sorted ascending (int64)
        self.tfs = np.asarray(tfs, dtype=np.int64)
        self.pos_bin = pos_bin
        self.offs = np.asarray(offs, dtype=np.int64)
        self.block = int(block)
        self._cache: dict[int, tuple] = {}
        POS_DECODE_STATS["bytes_total"] += len(pos_bin)
        POS_DECODE_STATS["blocks_total"] += len(self.offs)

    def _decode_block(self, bx: int) -> tuple:
        """(values, starts) for block bx — flat per-block decode."""
        got = self._cache.get(bx)
        if got is None:
            from yaii_spark.codec import decode_positions_flat

            lo = int(self.offs[bx])
            hi = int(self.offs[bx + 1]) if bx + 1 < len(self.offs) else len(self.pos_bin)
            tfs = self.tfs[bx * self.block : (bx + 1) * self.block]
            got = self._cache[bx] = decode_positions_flat(self.pos_bin[lo:hi], tfs)
            POS_DECODE_STATS["bytes_decoded"] += hi - lo
            POS_DECODE_STATS["blocks_decoded"] += 1
        return got

    def flat_for(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(flat_positions, counts) for sorted local ids `cand` (all
        present in self.ids): flat = the candidates' position lists
        concatenated in candidate order, counts aligned to cand."""
        idxs = np.searchsorted(self.ids, cand)
        counts = self.tfs[idxs]
        bxs = idxs // self.block
        pieces = []
        for bx in np.unique(bxs):  # ascending → preserves cand order
            vals, starts = self._decode_block(int(bx))
            sel = np.flatnonzero(bxs == bx)
            k = idxs[sel] - bx * self.block
            pieces.append(_ragged_gather(vals, starts[k], counts[sel]))
        flat = np.concatenate(pieces) if pieces else np.empty(0, dtype=np.int64)
        return flat, counts


class _SparsePositions:
    """_LazyPositions over a row whose position stream was SLICED to
    the candidate blocks JVM-side before the shuffle (the selective-
    phrase transfer path): only `blocks[i]`'s tf/pos byte slices ever
    crossed the Arrow boundary. Candidates are guaranteed to fall in
    shipped blocks (they are a subset of the slicer term's docs, whose
    blocks defined the slice)."""

    __slots__ = ("ids", "block", "_by_block", "_cache")

    def __init__(self, ids, blocks, tf_slices, pos_slices, block):
        self.ids = ids  # local doc ids, sorted (full decode — ids ship whole)
        self.block = int(block)
        self._by_block = {
            int(b): (tf, po) for b, tf, po in zip(blocks, tf_slices, pos_slices)
        }
        self._cache: dict[int, tuple] = {}
        for _, po in self._by_block.items():
            POS_DECODE_STATS["bytes_total"] += len(po)
        POS_DECODE_STATS["blocks_total"] += len(self._by_block)

    def _decode_block(self, bx: int) -> tuple:
        got = self._cache.get(bx)
        if got is None:
            from yaii_spark.codec import decode_positions_flat, varint_decode

            tf_b, pos_b = self._by_block[bx]
            tfs = varint_decode(tf_b).astype(np.int64)
            vals, starts = decode_positions_flat(pos_b, tfs)
            got = self._cache[bx] = (vals, starts, tfs)
            POS_DECODE_STATS["bytes_decoded"] += len(pos_b)
            POS_DECODE_STATS["blocks_decoded"] += 1
        return got

    def flat_for(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idxs = np.searchsorted(self.ids, cand)
        bxs = idxs // self.block
        counts = np.zeros(len(cand), dtype=np.int64)
        pieces = []
        for bx in np.unique(bxs):
            vals, starts, tfs = self._decode_block(int(bx))
            sel = np.flatnonzero(bxs == bx)
            k = idxs[sel] - bx * self.block
            counts[sel] = tfs[k]
            pieces.append(_ragged_gather(vals, starts[k], tfs[k]))
        flat = np.concatenate(pieces) if pieces else np.empty(0, dtype=np.int64)
        return flat, counts


class _EagerPositions:
    """Adapter giving fully-decoded (ids, per-doc position lists) the
    same surface as _LazyPositions (unit tests build these directly)."""

    __slots__ = ("ids", "_plists")

    def __init__(self, ids, plists):
        self.ids = np.asarray(ids, dtype=np.int64)
        self._plists = plists

    def flat_for(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idxs = np.searchsorted(self.ids, cand)
        pls = [np.asarray(self._plists[int(i)], dtype=np.int64) for i in idxs]
        counts = np.fromiter((p.size for p in pls), dtype=np.int64, count=len(pls))
        flat = np.concatenate(pls) if pls else np.empty(0, dtype=np.int64)
        return flat, counts


# ---------------------------------------------------------------------------
# numpy set algebra over one segment (local doc ids)
# ---------------------------------------------------------------------------

def _ordered_window(qs: list, slop: int) -> bool:
    """True if ∃ non-decreasing chain q_0 ≤ q_1 ≤ … with q_last − q_0 ≤
    slop (qs are the j-shifted position arrays, sorted ascending). The
    greedy minimal chain per start is optimal.

    Reference implementation — production slop>0 verification runs the
    batched form (_verify_slop_chain); a hypothesis property pins the
    two together (tests/test_phrase.py)."""
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


def _verify_slop_chain(per_term: list, slop: int) -> np.ndarray:
    """Vectorized slop>0 verification → bool mask over candidates.

    `per_term[j]` is the (flat_positions, counts) pair for term j —
    every candidate doc's positions concatenated in candidate order
    (PositionsEntry.flat_for). The greedy minimal chain (take, per
    start position of term 0, the smallest position of each next term
    ≥ the previous pick; succeed iff span ≤ slop after the per-term −j
    shift) is batched across EVERY start of EVERY candidate at once:
    per term, candidate positions flatten into composite keys
    (doc_rank << 32) | shifted_pos, and one searchsorted per term
    advances all surviving chains simultaneously — no per-candidate
    Python loop (VERDICT r3 #2)."""
    n = len(per_term)
    m = len(per_term[0][1])
    comp = []
    for j, (flat0, counts) in enumerate(per_term):
        # shift by −j (window alignment) then +n so values stay > 0
        # inside the composite key's low 32 bits
        flat = flat0.astype(np.int64) - j + n
        ranks = np.repeat(np.arange(m, dtype=np.int64), counts)
        comp.append(((ranks << np.int64(32)) | flat, flat))
    mask = np.zeros(m, dtype=bool)
    keys0, q0 = comp[0]
    start, prev = q0, q0
    rank = keys0 >> np.int64(32)
    for j in range(1, n):
        cj, _ = comp[j]
        key = (rank << np.int64(32)) | prev
        idx = np.searchsorted(cj, key, side="left")
        ok = idx < cj.size
        idxc = np.minimum(idx, cj.size - 1)
        hit = cj[idxc]
        ok &= (hit >> np.int64(32)) == rank  # stayed within the doc
        keep = np.flatnonzero(ok)
        if keep.size == 0:
            return mask
        prev = (hit & np.int64(0xFFFFFFFF))[keep]
        start, rank = start[keep], rank[keep]
    good = (prev - start) <= slop
    mask[np.unique(rank[good])] = True
    return mask


def _eval_phrase(node: A.Phrase, pos_map: dict) -> np.ndarray:
    """Phrase/proximity over lazily-decoded positions: intersect doc
    ids (smallest list leads, like the conjunction path), fetch
    positions ONLY for surviving candidates (v5 per-block position
    offsets — a dense term's corpus-scale stream is never decoded for
    a selective phrase), then verify the in-order window condition.

    slop=0 (the common case) is fully vectorized: per term j, the
    candidate docs' positions flatten into composite keys
    (doc_rank << 32) | (pos − j); intersecting the key sets across
    terms leaves exactly the docs with an aligned adjacency window
    (VERDICT r2 #6). slop>0 runs the batched greedy chain
    (_verify_slop_chain)."""
    entries = []
    for t in node.terms:
        e = pos_map.get((node.field_name, t))
        if e is None:
            return np.empty(0, dtype=np.int64)
        if isinstance(e, tuple):  # (ids, plists) — unit-test form
            e = _EagerPositions(*e)
        entries.append(e)
    cand = entries[0].ids
    for e in sorted(entries[1:], key=lambda e: e.ids.size):
        if cand.size == 0:
            return cand.astype(np.int64)
        cand = np.intersect1d(cand, e.ids, assume_unique=True)
    if cand.size == 0 or len(entries) == 1:
        return cand.astype(np.int64)
    per_term = [e.flat_for(cand) for e in entries]
    if node.slop == 0:
        acc = None
        for j, (flat, counts) in enumerate(per_term):
            ranks = np.repeat(np.arange(cand.size, dtype=np.int64), counts)
            off = flat.astype(np.int64) - j
            m = off >= 0  # pos<j can't start an aligned window
            keys = (ranks[m] << np.int64(32)) | off[m]
            acc = keys if acc is None else np.intersect1d(acc, keys, assume_unique=True)
            if acc.size == 0:
                return np.empty(0, dtype=np.int64)
        return cand[np.unique(acc >> np.int64(32))].astype(np.int64)
    return cand[_verify_slop_chain(per_term, node.slop)].astype(np.int64)


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


#: selective-phrase sliced-transfer gates (driver-side, from global
#: term stats): the slicer term's df bound, and how much denser the
#: densest phrase term must be for slicing to pay for itself
SELECTIVE_PHRASE_MAX_DF = 1 << 16
SELECTIVE_PHRASE_MIN_RATIO = 4


def _phrase_slice_plan(cat: IndexCatalog, node: A.Node):
    """Decide the sliced-transfer phrase path (driver-side, from the
    memoized term dictionary): when a phrase contains a RARE term
    (df ≤ SELECTIVE_PHRASE_MAX_DF) next to much denser ones, phrase
    candidates are a subset of the rare term's docs — so the dense
    terms' tf/position bytes only matter inside the blocks holding
    those docs, and everything else can be dropped BEFORE the shuffle.
    Returns (sliced_terms, {seg_id: global candidate ids}) or None.
    The candidate collect is bounded by the df gate (≤ 65k ids — a
    dictionary-lookup-scale driver job, never corpus-sized)."""
    phrases = _collect_phrases(node)
    if not phrases:
        return None
    stats = cat.term_stats_for(
        sorted({(p.field_name, t) for p in phrases for t in p.terms})
    )
    slicers: set = set()
    sliced_phrases = []
    for p in phrases:
        fts = [(p.field_name, t) for t in set(p.terms)]
        if any(ft not in stats for ft in fts):
            continue  # absent term — upstream pruning empties the phrase
        dfs = {ft: stats[ft][0] for ft in fts}
        mn = min(dfs, key=dfs.get)
        if (
            dfs[mn] <= SELECTIVE_PHRASE_MAX_DF
            and max(dfs.values()) >= SELECTIVE_PHRASE_MIN_RATIO * max(dfs[mn], 1)
        ):
            slicers.add(mn)
            sliced_phrases.append(p)
    if not sliced_phrases:
        return None
    sliced_terms = {
        (p.field_name, t) for p in sliced_phrases for t in p.terms
    }
    # a term an UNSLICED phrase also needs must keep its full stream
    full_needed = {
        (p.field_name, t)
        for p in phrases
        if p not in sliced_phrases
        for t in p.terms
    }
    sliced_terms -= full_needed
    if not sliced_terms:
        return None
    block = cat.corpus_stats().block_size
    rows = cat.postings(sorted(slicers)).select("seg_id", "doc_ids_bin").collect()
    per_seg: dict[int, list] = {}
    for r in rows:
        ids = delta_decode_blocked(r.doc_ids_bin, block).astype(np.int64)
        per_seg.setdefault(int(r.seg_id), []).append(ids)
    cand = {s: np.unique(np.concatenate(v)) for s, v in per_seg.items()}
    return sliced_terms, cand


def _apply_phrase_slicing(post: DataFrame, spark, slice_plan) -> DataFrame:
    """JVM-side per-block byte slicing for the sliced-transfer path:
    a tiny vectorized UDF maps each row's block_first_ids against the
    segment's candidate ids (searchsorted — the interpreted HOF form
    measured ~1 s/row and lost), then Catalyst substr() carves the
    tf/pos byte ranges of exactly those blocks. Sliced rows null their
    full streams; everything else is untouched."""
    sliced_terms, cand_map = slice_plan
    cand_df = spark.createDataFrame(
        [(int(s), [int(x) for x in ids]) for s, ids in cand_map.items()]
        or [(int(-1), [])],
        "seg_id long, _cand array<long>",
    )
    cond = None
    for f, t in sorted(sliced_terms):
        c = (F.col("field") == f) & (F.col("term") == t)
        cond = c if cond is None else (cond | c)

    @F.pandas_udf("array<int>")
    def nb_udf(fids: pd.Series, cands: pd.Series) -> pd.Series:
        out = []
        for fid, c in zip(fids, cands):
            if fid is None or c is None or len(c) == 0:
                out.append([])
                continue
            fa = np.asarray(fid, dtype=np.int64)
            ca = np.asarray(c, dtype=np.int64)
            bx = np.searchsorted(fa, ca, side="right") - 1
            out.append([int(x) for x in np.unique(bx[bx >= 0])])
        return pd.Series(out, index=fids.index, dtype=object)

    def _slice(bin_col, offs_col):
        # try_element_at: the last block's upper bound falls off the
        # offsets array (→ NULL → stream end); plain element_at throws
        # under Spark 4's ANSI default
        return F.transform(
            F.col("_nb"),
            lambda b: bin_col.substr(
                F.element_at(offs_col, b + 1) + 1,
                F.coalesce(
                    F.try_element_at(offs_col, b + 2), F.octet_length(bin_col)
                )
                - F.element_at(offs_col, b + 1),
            ),
        )

    return (
        post.join(F.broadcast(cand_df), "seg_id", "left")
        .withColumn(
            "_nb",
            F.when(cond, nb_udf(F.col("block_first_ids"), F.col("_cand"))),
        )
        .withColumn(
            "_tf_sl", F.when(cond, _slice(F.col("tfs_bin"), F.col("block_tf_offs")))
        )
        .withColumn(
            "_pos_sl", F.when(cond, _slice(F.col("pos_bin"), F.col("block_pos_offs")))
        )
        .withColumn("tfs_bin", F.when(~cond, F.col("tfs_bin")))
        .withColumn("pos_bin", F.when(~cond, F.col("pos_bin")))
        .withColumn("block_pos_offs", F.when(~cond, F.col("block_pos_offs")))
        .drop("_cand", "block_first_ids", "block_tf_offs")
    )


#: a doc-id range should span at least this many id-blocks, else the
#: per-range boundary-block decode overhead outweighs the parallelism
RANGE_SPLIT_MIN_BLOCKS = 4

#: target task waves when the split engages: R is sized for
#: WAVES × defaultParallelism total (seg, range) tasks, not one task
#: per core — the 1M merged-index probe measured dense slop=2 at
#: 11.2 s with exactly-one-wave tasks vs 3.5-4.8 s at 4 waves (finer
#: tasks pack stragglers; candidate skew between doc-id ranges is
#: invisible to the planner), while 16 waves regressed to 10.5 s as
#: per-row replication overhead caught up
RANGE_SPLIT_WAVES = 4


def _range_split_plan(cat: IndexCatalog) -> tuple[int, int] | None:
    """Doc-id-range fan-out for merged / few-segment indexes. The
    per-segment evaluation task is the unit of parallelism, so an index
    merged down to fewer segments than cores leaves cores idle (the
    round-4 1M probe measured dense phrases 2× slower at 4 segments /
    8 cores). When ``n_segs < defaultParallelism``, split every segment
    into R contiguous LOCAL doc-id ranges of width W and evaluate
    (seg_id, range) groups independently: v5 id-blocks restart their
    delta encoding absolutely at block boundaries and every stream
    carries per-block byte offsets, so each range maps to a contiguous
    block interval whose byte span decodes standalone (boundary blocks
    overlap two ranges; the worker masks decoded ids to the range).

    Driver-side and job-free — n_segs comes from corpus_stats geometry
    (an underfull-append underestimate only raises R, which is benign).
    Returns (R, W), or None for the default per-segment path — which is
    what a 1000-executor cluster over 10^6 segments always takes (the
    split never engages once segments outnumber cores). R is sized for
    RANGE_SPLIT_WAVES waves of tasks, not one task per core — see the
    constant's note. ``YAII_RANGE_SPLIT=0`` disables; an integer forces R
    (tests use this to exercise the path on tiny fixtures)."""
    env = os.environ.get("YAII_RANGE_SPLIT", "").strip().lower()
    if env in ("0", "off", "false"):
        return None
    cs = cat.corpus_stats()
    n_segs = max(1, -(-cs.n_docs // cs.seg_size))
    if env.isdigit():
        r = int(env)
    else:
        par = cat.spark.sparkContext.defaultParallelism
        if n_segs >= par:
            return None
        r = -(-RANGE_SPLIT_WAVES * par // n_segs)
        avg = -(-cs.n_docs // n_segs)
        r = min(r, -(-avg // (RANGE_SPLIT_MIN_BLOCKS * cs.block_size)))
    if r < 2:
        return None
    return r, -(-cs.seg_size // r)


def _with_range_spans(joined: DataFrame, spark, r: int, w: int) -> DataFrame:
    """crossJoin the R-row range table and compute ``_b = [b_lo, b_hi)``
    — the contiguous block interval each posting row contributes to its
    range — via a tiny vectorized searchsorted over block_first_ids.
    Shared by the boolean/phrase and BM25 range-split paths."""
    rng = spark.range(r).select(F.col("id").alias("_rid"))
    out = joined.crossJoin(F.broadcast(rng))
    lo_g = F.col("base_doc_id") + F.col("_rid") * F.lit(w)

    @F.pandas_udf("array<int>")
    def span_udf(bfi: pd.Series, los: pd.Series) -> pd.Series:
        res = []
        for b, lo in zip(bfi, los):
            if b is None or len(b) == 0:
                res.append(None)
                continue
            ba = np.asarray(b, dtype=np.int64)
            b_lo = max(0, int(np.searchsorted(ba, lo, side="right")) - 1)
            b_hi = int(np.searchsorted(ba, lo + w, side="left"))
            res.append([b_lo, max(b_lo, b_hi)])
        return pd.Series(res, index=bfi.index, dtype=object)

    return out.withColumn("_b", span_udf(F.col("block_first_ids"), lo_g))


# block-interval bounds read from the `_b` column _with_range_spans
# added (plain Column factories — built lazily because constructing a
# Column requires an active SparkContext)
def _blo():
    return F.element_at(F.col("_b"), 1)


def _bhi():
    return F.element_at(F.col("_b"), 2)


def _range_sliced_bin(bin_col, offs_col):
    """Byte span of blocks [b_lo, b_hi) — Catalyst substr, same shape
    as the selective-phrase slicer. try_element_at: the last block's
    upper bound falls off the offsets array (→ NULL → stream end)."""
    start = F.element_at(offs_col, _blo() + 1)
    end = F.coalesce(F.try_element_at(offs_col, _bhi() + 1), F.octet_length(bin_col))
    return F.when(
        F.col("_b").isNotNull() & bin_col.isNotNull() & offs_col.isNotNull(),
        bin_col.substr(start + 1, end - start),
    )


def _range_sliced_arr(arr_col, rebase: bool = False):
    """Per-block metadata array restricted to blocks [b_lo, b_hi);
    rebase=True additionally subtracts the first kept entry (byte
    offsets must be relative to the sliced stream's start)."""
    sl = F.slice(arr_col, _blo() + 1, _bhi() - _blo())
    if rebase:
        sl = F.transform(sl, lambda x: x - F.element_at(arr_col, _blo() + 1))
    return F.when(F.col("_b").isNotNull() & arr_col.isNotNull(), sl)


def _tomb_with_rid(tomb: DataFrame, seg_size: int, w: int) -> DataFrame:
    """Route each tombstone to its doc's range task (the docID
    invariant: doc_id = seg_id * seg_size + local)."""
    return tomb.withColumn(
        "_rid",
        F.floor((F.col("doc_id") % F.lit(seg_size)) / F.lit(w)).cast("long"),
    )


def _apply_range_split(
    joined: DataFrame, spark, r: int, w: int, want_pos: bool
) -> DataFrame:
    """Replicate each segment's posting rows across R doc-id ranges and
    slice every stream to the range's block interval JVM-side, so a
    range task ships and decodes only its own blocks' bytes (total
    shuffled bytes stay ≈ the unsplit stream — each block lands in
    exactly one range, plus one shared boundary block per cut)."""
    out = _with_range_spans(joined, spark, r, w)
    _span = _range_sliced_bin
    out = out.withColumn("_ids_sl", _span(F.col("doc_ids_bin"), F.col("block_id_offs")))
    drop = ["_ids_sl", "_b", "block_first_ids", "block_id_offs"]
    if want_pos:
        out = (
            out.withColumn("_tfs_sl", _span(F.col("tfs_bin"), F.col("block_tf_offs")))
            .withColumn("_pos_sl", _span(F.col("pos_bin"), F.col("block_pos_offs")))
            .withColumn(
                "_po_sl", _range_sliced_arr(F.col("block_pos_offs"), rebase=True)
            )
            .withColumn("tfs_bin", F.col("_tfs_sl"))
            .withColumn("pos_bin", F.col("_pos_sl"))
            .withColumn("block_pos_offs", F.col("_po_sl"))
        )
        drop += ["_tfs_sl", "_pos_sl", "_po_sl", "block_tf_offs"]
    return out.withColumn("doc_ids_bin", F.col("_ids_sl")).drop(*drop)


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
    slice_plan = (
        _phrase_slice_plan(cat, node) if (want_pos and phrase_terms) else None
    )
    # the selective-phrase slicer already ships a tiny candidate subset
    # of the streams; range-splitting on top would only re-cut it
    range_plan = _range_split_plan(cat) if slice_plan is None else None
    if range_plan is not None and not os.environ.get(
        "YAII_RANGE_SPLIT", ""
    ).strip().isdigit():
        # work gate (the boolean analogue of bm25's
        # RANGE_SPLIT_MIN_POSTINGS): splitting replicates every posting
        # row R ways and pays a per-row block-slice pass, which only
        # amortizes when each range task has real decode work. Estimate
        # per-task volume from the memoized term dictionary — positions
        # (cf) for phrase terms, doc postings (df) for plain tokens,
        # n_docs for universe-building nodes (NOT/ALL) — all driver-side
        # and job-free. Thresholds from the r4/r5 1M-doc probes: dense
        # phrases gained 2-3× at ~150k positions/task while sub-65k
        # tasks lost to the slice overhead; pure set algebra needs ~1M
        # postings/task before one segment per task is too coarse.
        cs = cat.corpus_stats()
        n_segs = max(1, -(-cs.n_docs // cs.seg_size))
        stats = cat.term_stats_for(sorted(terms)) if terms else {}
        vol = 0.0
        for ft, (df_, cf_) in stats.items():
            vol += float(cf_ if ft in phrase_terms else df_)
        if scans or _needs_universe(node):
            vol += float(cs.n_docs)
        per_task = vol / n_segs / range_plan[0]
        min_per_task = (1 << 16) if phrase_terms else (1 << 20)
        if per_task < min_per_task:
            range_plan = None
    cols = (
        ["seg_id", "field", "term", "doc_ids_bin"]
        + (["tfs_bin", "pos_bin", "block_pos_offs"] if want_pos else [])
        + (["block_first_ids", "block_tf_offs"] if slice_plan else [])
        + (
            ["block_first_ids", "block_id_offs"]
            + (["block_tf_offs"] if want_pos else [])
            if range_plan
            else []
        )
    )
    post = cat.postings(terms, scans=scans).select(*cols)
    if want_pos and phrase_terms:
        # a mixed query (phrase AND plain tokens) needs positions ONLY
        # for the phrase's terms — null the position columns for every
        # other term JVM-side so a dense boolean term's corpus-scale
        # position stream never crosses the shuffle/Arrow boundary
        is_phrase = None
        for f, t in sorted(phrase_terms):
            c = (F.col("field") == f) & (F.col("term") == t)
            is_phrase = c if is_phrase is None else (is_phrase | c)
        for pc in ("tfs_bin", "pos_bin", "block_pos_offs"):
            post = post.withColumn(pc, F.when(is_phrase, F.col(pc)))
    if slice_plan is not None:
        post = _apply_phrase_slicing(post, spark, slice_plan)
    block = cat.corpus_stats().block_size  # delta restarts per block (v4)
    # deleted_bin: local-id holes a purging merge left behind — they
    # must stay out of NOT/ALL universes (doc ids are never renumbered)
    meta = cat.seg_meta().select("seg_id", "n_docs", "base_doc_id", "deleted_bin")
    if _needs_universe(node):
        # NOT/ALL need every segment, even term-free ones
        joined = meta.join(post, "seg_id", "left")
    else:
        if not terms and not scans:
            return _empty_ids(spark)
        joined = post.join(meta, "seg_id", "inner")
    if range_plan is not None:
        joined = _apply_range_split(
            joined, spark, range_plan[0], range_plan[1], want_pos
        )

    def _eval(pdf: pd.DataFrame, deleted: np.ndarray | None) -> pd.DataFrame:
        from yaii_spark.codec import delta_decode, varint_decode

        if pdf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        n_docs = int(pdf["n_docs"].iloc[0])
        base = int(pdf["base_doc_id"].iloc[0])
        lo = hi = None
        if range_plan is not None:
            w = range_plan[1]
            rid = int(pdf["_rid"].iloc[0])
            lo, hi = rid * w, min((rid + 1) * w, n_docs)
        # full_ids: every doc in the shipped blocks (boundary blocks
        # spill past the range); postings: masked to [lo, hi) — the
        # membership sets the boolean algebra runs on. Positions index
        # by full_ids so tf/posting alignment survives the mask.
        full_ids = {}
        postings = {}
        for f, t, b in zip(pdf["field"], pdf["term"], pdf["doc_ids_bin"]):
            if t is None or b is None:
                continue
            ids_f = delta_decode_blocked(b, block).astype(np.int64) - base
            full_ids[(f, t)] = ids_f
            if lo is not None:
                s, e = np.searchsorted(ids_f, (lo, hi))
                ids_f = ids_f[s:e]
            postings[(f, t)] = ids_f
        pos_map = None
        if want_pos:
            pos_map = {}
            n_rows = len(pdf)
            nbs = pdf["_nb"] if "_nb" in pdf.columns else pd.Series([None] * n_rows)
            tf_sl = pdf["_tf_sl"] if "_tf_sl" in pdf.columns else nbs
            pos_sl = pdf["_pos_sl"] if "_pos_sl" in pdf.columns else nbs
            for f, t, ib, tb, pb, po, nb, tsl, psl in zip(
                pdf["field"], pdf["term"], pdf["doc_ids_bin"], pdf["tfs_bin"],
                pdf["pos_bin"], pdf["block_pos_offs"], nbs, tf_sl, pos_sl,
            ):
                if t is None or ib is None or (f, t) not in phrase_terms:
                    continue
                if nb is not None:  # sliced-transfer row (selective phrase)
                    pos_map[(f, t)] = _SparsePositions(
                        full_ids[(f, t)], nb, tsl, psl, block
                    )
                    continue
                tfs = varint_decode(tb).astype(np.int64)
                pos_map[(f, t)] = _LazyPositions(
                    full_ids[(f, t)], tfs, pb, po, block
                )
        ids = _eval_numpy(node, postings, n_docs, pos_map)
        if lo is not None:
            # NOT/ALL universes span the whole segment; clamp to the
            # range so sibling range tasks never double-count a doc
            ids = ids[(ids >= lo) & (ids < hi)]
        db = pdf["deleted_bin"].iloc[0]
        if db is not None:
            purged = delta_decode(db).astype(np.int64)  # local ids
            if purged.size:
                ids = np.setdiff1d(ids, purged, assume_unique=False)
        if deleted is not None and deleted.size:
            ids = np.setdiff1d(ids, np.sort(deleted) - base, assume_unique=False)
        return pd.DataFrame({"doc_id": ids + base})

    keys = ["seg_id"] + (["_rid"] if range_plan is not None else [])
    tomb = cat.tombstones()
    if tomb is None:

        def eval_segment(pdf: pd.DataFrame):
            return _eval(pdf, None)

        return joined.groupBy(*keys).applyInPandas(eval_segment, schema="doc_id long")

    # tombstones arrive COGROUPED per segment — shuffle-partitioned like
    # any other table, never collected into one array row or broadcast
    # (a segment with millions of deletes would blow both; VERDICT r1)
    def eval_segment_tomb(pdf: pd.DataFrame, tpdf: pd.DataFrame):
        deleted = tpdf["doc_id"].to_numpy(dtype=np.int64) if len(tpdf) else None
        return _eval(pdf, deleted)

    tomb_keyed = tomb.select("seg_id", "doc_id")
    if range_plan is not None:
        tomb_keyed = _tomb_with_rid(
            tomb_keyed, cat.corpus_stats().seg_size, range_plan[1]
        )
    return (
        joined.groupBy(*keys)
        .cogroup(tomb_keyed.groupBy(*keys))
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
