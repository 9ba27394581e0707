"""Continuous queries — QueryMode CURRENT / FUTURE / CURRENT_AND_FUTURE.

Reference semantics (/root/reference/src/yaii-types.ts:15-19,
base-inverted-index.ts:457-489): FUTURE subscribes to "added" batches
and re-evaluates the boolean filter on each new batch; CURRENT_AND_FUTURE
concatenates the current snapshot's results with the future stream.
Sorted FUTURE queries throw (base-inverted-index.ts:431) — we keep the
exact restriction (Spark can't global-sort an unbounded append stream
either).

Spark-first mapping: the "added event" stream is a Structured Streaming
source over the incoming pages directory; the boolean filter is applied
per micro-batch with the same tokenizer UDF + AST, compiled to a
relational predicate (new docs aren't in the index yet — exactly like
the reference, which scans the mutable segment's fresh batch rather
than committed postings).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from yaii_spark.analyzer import tokenize_all_udf, tokenize_udf
from yaii_spark.queries import ast as A


class QueryMode(Enum):
    CURRENT = "current"
    CURRENT_AND_FUTURE = "current_and_future"
    FUTURE = "future"


def _phrase_match(col: Column, terms: list[str], slop: int) -> Column:
    """Relational phrase/proximity over a token-array column (pure
    Catalyst HOFs — no Python in the per-batch hot path).

    Engine semantics (executor._ordered_window): ∃ positions
    p_0 < p_1 < … matching the terms in order with p_j ≥ p_{j-1}+1 and
    p_{last} − p_0 ≤ slop + len − 1. Compiled as nested EXISTS over
    per-term position windows: term k may sit anywhere in
    (p_{k-1}, p_0 + slop + k] — the same existence condition the
    engine's greedy minimal chain decides."""
    size = F.size(col)
    n = len(terms)

    def chain(k: int, prev: Column, p0: Column) -> Column:
        if k == n:
            return F.lit(True)
        lo = prev + F.lit(1)
        hi = F.least(p0 + F.lit(slop + k), size)
        seq = F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<int>")
        )
        return F.exists(
            seq,
            lambda p: (F.element_at(col, p) == terms[k]) & chain(k + 1, p, p0),
        )

    starts = F.when(size >= 1, F.sequence(F.lit(1), size)).otherwise(
        F.array().cast("array<int>")
    )
    return F.exists(
        starts, lambda p: (F.element_at(col, p) == terms[0]) & chain(1, p, p)
    )


def compile_predicate(node: A.Node, tokens_col: str = "_tokens") -> Column:
    """Compile a boolean AST to a relational Column predicate over a
    tokenized row — the per-batch evaluation form used for streams
    (and usable as a full-scan fallback for batch). Covers the full
    batch AST except CachedFilter, whose semantics are tied to the
    indexed snapshot (a new stream doc can't be in a filter cached over
    committed postings — parity with the reference, which evaluates
    FUTURE filters on fresh batches only,
    /root/reference/src/base-inverted-index.ts:457-489)."""

    def tok_col(field_name: str) -> Column:
        return F.col("_all_tokens" if field_name == "_all" else tokens_col)

    if isinstance(node, A.Token):
        return F.array_contains(tok_col(node.field_name), node.term)
    if isinstance(node, A.Phrase):
        return _phrase_match(tok_col(node.field_name), list(node.terms), node.slop)
    if isinstance(node, A.TokenRange):
        def in_range(t: Column) -> Column:
            c = F.lit(True)
            if node.lo is not None:
                c = c & (t >= node.lo if node.lo_inclusive else t > node.lo)
            if node.hi is not None:
                c = c & (t <= node.hi if node.hi_inclusive else t < node.hi)
            return c

        return F.exists(tok_col(node.field_name), in_range)
    if isinstance(node, A.TextContains):
        return F.exists(
            tok_col(node.field_name), lambda t: t.contains(node.needle)
        )
    if isinstance(node, A.All):
        return F.lit(True)
    if isinstance(node, A.NoneNode):
        return F.lit(False)
    if isinstance(node, A.And):
        out = F.lit(True)
        for c in node.children:
            out = out & compile_predicate(c, tokens_col)
        return out
    if isinstance(node, A.Or):
        out = F.lit(False)
        for c in node.children:
            out = out | compile_predicate(c, tokens_col)
        return out
    if isinstance(node, A.Not):
        return ~compile_predicate(node.child, tokens_col)
    if isinstance(node, A.NumberEq):
        return F.col(node.field_name) == F.lit(node.value)
    if isinstance(node, A.NumberRange):
        c = F.col(node.field_name)
        cond = F.lit(True)
        if node.lo is not None:
            cond = cond & (c >= node.lo if node.lo_inclusive else c > node.lo)
        if node.hi is not None:
            cond = cond & (c <= node.hi if node.hi_inclusive else c < node.hi)
        return cond
    if isinstance(node, A.HasField):
        return F.col(node.field_name).isNotNull()
    if isinstance(node, A.CachedFilter):
        raise TypeError(
            "CachedFilter is snapshot-scoped and cannot apply to future "
            "batches (a new stream doc is never in a filter cached over "
            "committed postings); evaluate the underlying query instead"
        )
    raise TypeError(node)


def _token_fields(node: A.Node) -> set[str]:
    """Field names whose token arrays the predicate actually reads."""
    if isinstance(node, (A.Token, A.Phrase, A.TokenRange, A.TextContains)):
        return {node.field_name}
    if isinstance(node, (A.And, A.Or)):
        out: set[str] = set()
        for c in node.children:
            out |= _token_fields(c)
        return out
    if isinstance(node, A.Not):
        return _token_fields(node.child)
    return set()


def _filtered(df: DataFrame, query: A.Node, text_col: str) -> DataFrame:
    q = A.rewrite(query)
    fields = _token_fields(q)
    # tokenize only the streams the predicate reads — per-batch UDF
    # work is the stream's hot path, so an attribute-only or
    # single-field query never pays for the unused token column
    added = []
    if any(f != "_all" for f in fields):
        df = df.withColumn("_tokens", tokenize_udf(F.col(text_col)))
        added.append("_tokens")
    if "_all" in fields:
        df = df.withColumn("_all_tokens", tokenize_all_udf(F.col(text_col)))
        added.append("_all_tokens")
    return df.filter(compile_predicate(q)).drop(*added)


def continuous_query(
    spark: SparkSession,
    query: A.Node,
    mode: QueryMode,
    stream_dir: str,
    schema,
    current_df: DataFrame | None = None,
    text_col: str = "text",
    sort: list | None = None,
    current_catalog=None,
):
    """Build the (stream, snapshot) pair for a continuous boolean query.

    Returns (streaming_df_or_None, current_result_df_or_None). The
    caller attaches a sink (memory/foreachBatch) and starts it —
    keeping start/stop at the edge makes the plan testable.

    The CURRENT side evaluates against either `current_df` (per-row
    scan with the compiled predicate — the small/ad-hoc path) or
    `current_catalog` (an IndexCatalog: the committed-index snapshot
    via the posting-list engine — the reference's CURRENT semantics,
    base-inverted-index.ts:457-489, where the snapshot IS the committed
    segments; at scale the scan path would re-tokenize the corpus per
    subscription). With `index_append_sink` feeding the same index,
    CURRENT_AND_FUTURE composes as committed-snapshot + fresh-batch
    filters exactly like the reference's committed + mutable split."""
    if sort and mode is not QueryMode.CURRENT:
        # exact reference restriction (base-inverted-index.ts:431)
        raise ValueError("future queries cannot have sort clauses")

    stream_df = None
    if mode in (QueryMode.FUTURE, QueryMode.CURRENT_AND_FUTURE):
        src = spark.readStream.schema(schema).parquet(stream_dir)
        stream_df = _filtered(src, query, text_col)

    cur = None
    if mode in (QueryMode.CURRENT, QueryMode.CURRENT_AND_FUTURE):
        if current_catalog is not None:
            from yaii_spark.queries.executor import search as _search

            cur = _search(current_catalog, query, sort=sort)
        elif current_df is not None:
            cur = _filtered(current_df, query, text_col)
            if sort:
                cur = cur.orderBy(
                    *[
                        F.col(c).asc() if d == "asc" else F.col(c).desc()
                        for c, d in sort
                    ]
                )
        else:
            raise ValueError(
                "CURRENT modes need the current snapshot (current_df or "
                "current_catalog)"
            )
    return stream_df, cur


def index_append_sink(
    spark: SparkSession,
    stream_dir: str,
    schema,
    index_dir: str,
    seg_size: int = 1 << 20,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = False,
    **build_kwargs,
):
    """Durable streaming ingest: every micro-batch of arriving pages is
    committed as NEW index segments via ``build_index(append=True)`` —
    the streaming-commit half of the reference's "added" batches
    (base-inverted-index.ts:283-287 queues adds into the mutable
    segment; :511-534 commits it immutable). continuous_query covers
    the query side (fresh batches match FUTURE filters); this sink
    makes those batches durable and searchable by every later batch
    query (SURVEY §3.4).

    Each batch takes a fresh segment range (next free seg_id), so
    batches never share a segment. The batch_id → segment-range
    assignment is made DURABLE first (a one-row append to
    `<index>/sink_ledger` before any index write): a replayed batch —
    Spark re-runs a micro-batch whose foreachBatch crashed before the
    stream checkpoint advanced — reuses its original range, where the
    per-segment build checkpoints + dynamic partition overwrite make
    the re-run idempotent. Without the ledger a replay would derive a
    NEW range past the failed attempt's partial segments and index the
    same docs twice. Corpus stats are recomputed from durable state
    after each commit (idempotent); term_stats folds ONLY the batch's
    new segments into the bucketed dictionary
    (indexer._fold_term_stats — per-batch cost stays O(batch), never
    O(whole index); the stats_ledger makes replayed batches fold-once).

    Returns the started StreamingQuery (caller stops it)."""
    src = spark.readStream.schema(schema).parquet(stream_dir)
    committer = make_append_committer(
        index_dir, seg_size=seg_size, **build_kwargs
    )
    w = src.writeStream.foreachBatch(committer)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def make_append_committer(index_dir: str, seg_size: int = 1 << 20, **build_kwargs):
    """The foreachBatch body of index_append_sink, exposed so replay
    semantics are directly testable: call it twice with the same
    batch_id and the second call must be a no-op-equivalent re-run of
    the same segment range."""
    from yaii_spark.indexer import assign_dense_ids, build_index
    from yaii_spark.storage import (
        IndexCatalog,
        fs_exists,
        read_table,
        write_table,
    )

    def commit(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        # geometry guard BEFORE the range assignment becomes durable: a
        # seg_size mismatched with the index (e.g. the pre-merge size
        # after a merge multiplied it) would ledger a range that
        # collides with existing segments (indexer._check_append_geometry)
        from yaii_spark.indexer import _check_append_geometry

        _check_append_geometry(sp, index_dir, seg_size)
        # ONE cache of the batch serves the span count, the dense-id
        # partition counts, and the build's tokenize pass — released in
        # the finally (caches pin block-manager memory until unpersisted;
        # a sink runs thousands of batches)
        batch_df = batch_df.persist()
        ledger = f"{index_dir}/sink_ledger"
        start = None
        # the ledger grows one row per batch forever — at the design
        # point (~10^6 appended ranges) a full collect per commit would
        # be O(#batches) driver work/heap on the hot path, so every
        # per-batch read is a pruned filter or a 1-row aggregate; the
        # only full collect left is the ONE-TIME pre-r5 span backfill
        led = read_table(sp, ledger) if fs_exists(sp, ledger) else None
        if led is not None:
            mine = (
                led.filter(F.col("batch_id") == int(batch_id)).collect()
            )  # ≤1 row
            if mine:  # replay: reuse the original range
                start = int(mine[0].start_id)
        if start is None:
            # the batch's row count pins its segment span (end_id), so
            # the NEXT free range is ONE 1-row aggregate off the ledger
            # — never a per-batch max-scan over the ever-growing
            # seg_meta table (r5: that scan was O(#segments) per
            # commit) and never a full ledger collect (O(#batches)
            # driver heap). Invariant: the sink owns the index's append
            # lifecycle — every appended range is ledgered here. Pre-r5
            # ledger rows lack end_id → fall back to the seg_meta scan
            # and backfill spans once.
            n_rows = batch_df.count()
            complete = False
            if led is not None and "end_id" in led.columns:
                agg = led.agg(
                    F.count("*").alias("n"),
                    F.count("end_id").alias("n_span"),
                    F.max("end_id").alias("mx"),
                ).collect()[0]  # 1 row
                if int(agg.n) > 0 and int(agg.n) == int(agg.n_span):
                    complete = True
                    start = int(agg.mx)
            min_seg = None
            if not complete:
                if IndexCatalog(sp, index_dir).exists():
                    mn, mx = (
                        read_table(sp, f"{index_dir}/seg_meta")
                        .agg(
                            F.min(F.col("seg_id").cast("long")),
                            F.max(F.col("seg_id").cast("long")),
                        )
                        .collect()[0]
                    )
                    min_seg = int(mn)
                    start = (int(mx) + 1) * seg_size
                else:
                    start = 0
            n_segs = max(1, -(-n_rows // seg_size))  # ceil
            end = start + n_segs * seg_size
            # durable BEFORE any index write — the range assignment must
            # survive a crash mid-build so the replay lands on it. A
            # pre-r5 ledger (missing end_id, wholly or on sampled-schema
            # stragglers) is rewritten whole — the ONE-TIME full collect;
            # mixed-schema parquet dirs would otherwise read back
            # whichever file's schema gets sampled.
            led_schema = "batch_id long, start_id long, end_id long"
            if led is not None and not complete:
                # backfill spans so the fast path engages from now on:
                # each old range ends where the next begins (ranges are
                # allocated contiguously), the last at this batch's
                # scan-derived start
                old = sorted(led.collect(), key=lambda r: int(r.start_id))
                # the span derivation assumes every appended range was
                # ledgered contiguously; segments that predate the first
                # ledgered range prove an out-of-band append, and the
                # backfill would silently fold them into a neighbor's
                # span — cross-check against the seg_meta min aggregate
                # (already read above) and fail loudly instead
                # (ADVICE r5)
                if (
                    old
                    and min_seg is not None
                    and min_seg * seg_size < int(old[0].start_id)
                ):
                    raise RuntimeError(
                        "sink_ledger backfill: index has segments from "
                        f"doc id {min_seg * seg_size} but the earliest "
                        f"ledgered range starts at {int(old[0].start_id)}"
                        " — the index was appended outside this sink, "
                        "so ledger spans cannot be derived; rebuild the "
                        "ledger or the index"
                    )
                nexts = [int(r.start_id) for r in old[1:]] + [int(start)]
                rows = [
                    (int(r.batch_id), int(r.start_id), e)
                    for r, e in zip(old, nexts)
                ] + [(int(batch_id), int(start), int(end))]
                write_table(sp.createDataFrame(rows, led_schema), ledger)
            else:
                write_table(
                    sp.createDataFrame(
                        [(int(batch_id), int(start), int(end))], led_schema
                    ),
                    ledger,
                    mode="append" if led is not None else "overwrite",
                )
        pages = assign_dense_ids(batch_df, start)
        try:
            build_index(
                sp, pages, index_dir, seg_size=seg_size, append=True,
                # the committer validated geometry above, before the
                # range became durable — skip the duplicate per-batch
                # corpus_stats read inside build_index
                _geometry_checked=True,
                **build_kwargs,
            )
        finally:
            batch_df.unpersist()
            h = getattr(pages, "_dense_ids_cache", None)
            if h is not None:
                h.unpersist()

    return commit


def streaming_dedup(
    src: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Stateful cross-batch exact dedup over an unbounded ingest stream
    — a custom stateful operator via ``applyInPandasWithState`` (the
    brief's scale path for stateful stream transforms; the reference
    has no streaming state at all).

    Keyed by md5(normalized text): the first-ever occurrence of each
    content hash is emitted (min id within the batch wins, matching
    batch ``exact_dedup``'s deterministic survivor), every later
    occurrence — same batch or any later micro-batch — is suppressed
    by per-key GroupState.

    State sizing (VERDICT r4 #5): exact mode (``ttl_ms=None``, the
    default) keeps one entry per distinct content hash FOREVER — that
    is the semantics of exact dedup (any hash may recur arbitrarily
    late). Budget ~(32-byte key + ~50 bytes store overhead) per
    distinct hash in the state store: 10^9 distinct docs ≈ 80 GB spread
    across executors (RocksDB state store recommended at that scale).
    When late duplicates beyond some horizon are acceptable, pass
    ``ttl_ms`` to evict idle keys after that much processing-time
    inactivity: an expired key's next occurrence RE-EMITS (bounded
    state, windowed-dedup semantics — each key's state lives
    last-seen + ttl). Exact mode is byte-for-byte the r4 behavior."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = src.withColumn(
        "content_hash",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")),
    ).select("content_hash", F.col(id_col).alias("keep_id"))

    return hashed.groupBy("content_hash").applyInPandasWithState(
        make_dedup_state_fn(ttl_ms),
        outputStructType="content_hash string, keep_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def make_dedup_state_fn(ttl_ms: int | None = None):
    """The applyInPandasWithState body of `streaming_dedup`, exposed so
    the TTL state machine is unit-testable against a fake GroupState
    (processing-time timeouts are wall-clock-driven — an end-to-end
    expiry test is inherently racy, the state transitions are not):
    timed-out invocation → remove (next sighting re-emits); data +
    no state → emit min id, arm TTL; data + state → suppress, re-arm."""
    import pandas as pd

    def emit_first(key, pdfs, state):
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: drop the entry so a later recurrence
            # re-emits (the state-store compaction story)
            state.remove()
            return
        if not state.exists:
            best = None
            for pdf in pdfs:
                m = int(pdf["keep_id"].min())
                best = m if best is None else min(best, m)
            state.update((True,))
            if ttl_ms is not None:
                state.setTimeoutDuration(int(ttl_ms))
            yield pd.DataFrame({"content_hash": [key[0]], "keep_id": [best]})
        else:
            for _ in pdfs:  # drain the iterator; nothing to emit
                pass
            if ttl_ms is not None:
                # sliding TTL: each sighting re-arms the idle clock
                state.setTimeoutDuration(int(ttl_ms))

    return emit_first


def windowed_ingest_stats(
    spark: SparkSession, stream_dir: str, schema,
    ts_col: str = "warc_ts", window: str = "1 minute", watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time windowed ingest metrics with late-data handling — new
    surface beyond the reference (it has no watermarks/windows), used
    for build monitoring: docs/bytes per event-time window."""
    src = spark.readStream.schema(schema).parquet(stream_dir)
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("text_bytes"),
        )
        .select("window.start", "window.end", "n_docs", "text_bytes")
    )
