"""Training-pipeline operator tests: dedup, similarity, text analysis,
multimodal plumbing, aggregation surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yaii_spark.ops.aggregations import (
    agg_count,
    agg_first,
    agg_group_by,
    agg_last,
    agg_numeric_buckets,
)
from yaii_spark.ops.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_candidates,
)
from yaii_spark.ops.multimodal import decode_features, frame_sample_plan, gen_fake_media
from yaii_spark.ops.similarity import cosine_topk, lsh_ann_topk, with_lsh_bucket
from yaii_spark.ops.text import with_fingerprint, with_lang_id, with_quality_score, with_token_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a  B c "), (3, "other text"), (4, "a b c")],
        "doc_id long, text string",
    )
    out = {r.content_hash: (r.keep_id, r.n_docs) for r in exact_dedup(df).collect()}
    assert len(out) == 2
    assert (1, 3) in out.values() and (3, 1) in out.values()


def test_minhash_identical_docs_same_sig(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different text with other tokens entirely here now")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_near_dup_detected(docs):
    # perturb one document slightly → LSH should pair it with the original
    base = docs.limit(1).collect()[0]
    perturbed = base.text.replace(base.text.split()[0], "zzz", 1)
    extra = docs.sparkSession.createDataFrame(
        [(99999, perturbed)], "doc_id long, text string"
    )
    df = docs.select("doc_id", "text").union(extra)
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df, num_hashes=16, bands=8).collect()}
    assert (base.doc_id, 99999) in pairs


def test_simhash_hamming(spark, docs):
    sh = simhash(docs.select("doc_id", "text"))
    rows = sh.collect()
    assert len(rows) == docs.count()
    # identical text → identical simhash → candidates at hamming 0
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    cands = simhash_candidates(simhash(dup)).collect()
    assert len(cands) == 1 and cands[0].hamming == 0


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "v w x y z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard(df, pairs).collect()}
    assert out[(1, 2)] == 1.0 and out[(1, 3)] == 0.0


def test_cosine_topk_matches_numpy(emb):
    rows = emb.collect()
    q = list(rows[0].embedding)
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    qv = np.array(q, dtype=np.float64)
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    ids = np.array([r.vec_id for r in rows])
    order = np.lexsort((ids, -np.round(cos, 6)))[:5]
    want = list(ids[order])
    got = [r.vec_id for r in cosine_topk(emb, q, k=5).collect()]
    assert got == want
    assert got[0] == rows[0].vec_id  # self-match first


def test_lsh_ann_recall(emb):
    rows = emb.collect()
    q = list(rows[3].embedding)
    dim = len(q)
    exact = [r.vec_id for r in cosine_topk(emb, q, k=5).collect()]
    approx = [
        r.vec_id
        for r in lsh_ann_topk(emb, q, dim, k=5, n_planes=4, multiprobe_hamming=2).collect()
    ]
    # self must be found; hamming-2 multiprobe over 4 planes covers
    # 11/16 buckets → decent recall even on near-random vectors
    assert rows[3].vec_id == approx[0]
    assert len(set(exact) & set(approx)) >= 2
    buckets = with_lsh_bucket(emb, dim, 6).select("lsh_bucket").distinct().count()
    assert buckets > 4  # hashes actually spread


def test_text_ops(docs):
    out = with_fingerprint(
        with_lang_id(with_quality_score(with_token_counts(docs)))
    ).limit(50).collect()
    for r in out:
        assert r.n_ws_tokens > 0 and r.n_bpe_tokens >= r.n_ws_tokens
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0
        assert r.lang_pred in {"en", "es", "fr", "de", "und"}
        assert len(r.fingerprint) == 32
    # fingerprint is whitespace-insensitive
    s = docs.sparkSession
    df = s.createDataFrame([(1, "a  b\tc"), (2, "a b c")], "doc_id long, text string")
    fps = [r.fingerprint for r in with_fingerprint(df).collect()]
    assert fps[0] == fps[1]


def test_embedding_near_dups_blocked(emb):
    out = embedding_near_dups(emb, block_col="label", threshold=0.5)
    rows = out.collect()
    for r in rows:
        assert r.id_a < r.id_b and r.cosine >= 0.5


def test_lsh_blocked_near_dups(emb):
    """The scale-default wrapper: blocking key derived from random-
    hyperplane LSH buckets. Every emitted pair must clear the
    threshold, and high-threshold pairs (tiny angles — few planes cut
    them) must match the exact all-pairs result."""
    from yaii_spark.ops.dedup import lsh_blocked_near_dups

    few = emb.limit(60)
    dim = len(few.first().embedding)
    got = lsh_blocked_near_dups(few, dim=dim, threshold=0.98, n_planes=4)
    rows = got.collect()
    for r in rows:
        assert r.id_a < r.id_b and r.cosine >= 0.98
    exact = {(r.id_a, r.id_b) for r in
             embedding_near_dups(few, threshold=0.98, allow_all_pairs=True).collect()}
    blocked = {(r.id_a, r.id_b) for r in rows}
    assert blocked <= exact
    if exact:  # near-identical vectors land in the same bucket
        assert len(blocked) >= len(exact) * 0.5


def test_embedding_near_dups_all_pairs_guard(emb):
    """block_col=None is an O(n²) cross join — must be an explicit
    opt-in, like simhash_candidates' allow_unbanded (VERDICT r3 #3)."""
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_near_dups(emb, threshold=0.5)
    # the explicit opt-in still works and is a superset of the blocked run
    few = emb.limit(30)
    blocked = {(r.id_a, r.id_b) for r in
               embedding_near_dups(few, block_col="label", threshold=0.5).collect()}
    allp = {(r.id_a, r.id_b) for r in
            embedding_near_dups(few, threshold=0.5, allow_all_pairs=True).collect()}
    assert blocked <= allp


def test_multimodal_plumbing(spark):
    media = gen_fake_media(spark, 20, "image")
    feats = decode_features(media, fake=True).collect()
    assert len(feats) == 20
    assert all(len(r.feature) == 8 for r in feats)
    # determinism: same payload → same features
    again = {r.media_id: r.feature for r in decode_features(media, fake=True).collect()}
    assert all(again[r.media_id] == r.feature for r in feats)
    # real decode is explicitly stubbed
    with pytest.raises(Exception):
        decode_features(media, fake=False).collect()
    vids = gen_fake_media(spark, 3, "video")
    plan = frame_sample_plan(vids, every_ms=1000)
    assert plan.count() == 15  # 5000ms / 1000 per video
    assert plan.filter("ts_ms = 4000").count() == 3


def test_aggregations(spark, work_dir):
    from yaii_spark.indexer import build_index
    from yaii_spark.queries import ast as A
    from yaii_spark.storage import IndexCatalog
    from yaii_spark.synth import gen_boolean_pages

    idx = f"{work_dir}/agg_idx"
    build_index(spark, gen_boolean_pages(spark), idx, seg_size=3)
    cat = IndexCatalog(spark, idx)
    assert agg_count(cat).collect()[0].n_docs == 4
    assert agg_count(cat, A.token("abc")).collect()[0].n_docs == 2
    assert agg_first(cat, "num_attr").collect()[0].doc_id == 12  # min num_attr=20
    assert agg_last(cat, "num_attr").collect()[0].doc_id == 15
    g = {r.lang: r.n_docs for r in agg_group_by(cat, "lang").collect()}
    assert g == {"en": 4}
    b = {r.bucket: r.n_docs for r in agg_numeric_buckets(cat, "num_attr", 10).collect()}
    assert b[20] == 2 and b[30] == 1


def test_multi_key_first_last(spark, work_dir):
    """A2/A3 with a chained sort spec (reference comparator chain,
    base-inverted-index.ts:606-659)."""
    import datetime as dt

    from yaii_spark.indexer import build_index
    from yaii_spark.ops.aggregations import agg_first, agg_last
    from yaii_spark.storage import IndexCatalog
    from yaii_spark.synth import EPOCH, PAGES_SCHEMA, render_html

    rows = [
        (i, f"https://x/{i}", EPOCH + dt.timedelta(seconds=i),
         render_html("d"), "d", lang, num)
        for i, (lang, num) in enumerate(
            [("en", 5), ("en", 2), ("de", 9), ("de", 2), ("en", 2)]
        )
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    idx = f"{work_dir}/mk_idx"
    build_index(spark, pages, idx, seg_size=3, stored_cols=["lang", "num_attr"])
    cat = IndexCatalog(spark, idx)

    r = agg_first(cat, [("lang", "asc"), ("num_attr", "desc")]).collect()[0]
    assert (r.lang, r.num_attr, r.doc_id) == ("de", 9, 2)
    r = agg_last(cat, [("lang", "asc"), ("num_attr", "desc")]).collect()[0]
    assert (r.lang, r.num_attr, r.doc_id) == ("en", 2, 4)
    # single-key string form still works
    r = agg_first(cat, "num_attr").collect()[0]
    assert (r.num_attr, r.doc_id) == (2, 1)


def test_fast_hash_family_recall(spark, docs):
    """Production xxhash64 families must find the near-dup fixture pairs
    the oracle (md5) families find — recall ≥ oracle on both MinHash-LSH
    and SimHash candidates."""
    # longest docs → high Jaccard after a 1-token edit → LSH detection
    # is near-certain for BOTH families (the comparison is then fair,
    # not a coin-flip on band collisions)
    base = docs.orderBy(F.length("text").desc()).limit(4).collect()
    rows = [(r.doc_id, r.text) for r in base]
    for i, r in enumerate(base):
        rows.append((90000 + i, r.text.replace(r.text.split()[0], "zzz", 1)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {(r.doc_id, 90000 + i) for i, r in enumerate(base)}

    md5_pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df, num_hashes=16, bands=16).collect()}
    fast_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, num_hashes=16, bands=16, hash_family="fast").collect()
    }
    assert want & fast_pairs >= want & md5_pairs

    sim_md5 = simhash_candidates(simhash(df), max_hamming=16)
    sim_fast = simhash_candidates(simhash(df, hash_family="fast"), max_hamming=16)
    got_md5 = {(r.id_a, r.id_b) for r in sim_md5.collect()}
    got_fast = {(r.id_a, r.id_b) for r in sim_fast.collect()}
    assert want & got_fast >= want & got_md5
    # fast mode is valid simhash: identical docs at hamming 0
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    c = simhash_candidates(simhash(dup, hash_family="fast")).collect()
    assert len(c) == 1 and c[0].hamming == 0


def test_simhash_candidate_bound_with_length_banding(spark):
    """The DEFAULT call must be length-banded: at 50k docs the banded
    candidate volume stays a small fraction of the bare-chunk opt-out's
    N²/65536 growth, true near-dups (< band_width token delta) survive,
    and the unbanded mode requires an explicit opt-out."""
    import pytest

    from yaii_spark.synth import gen_pages

    # DEFAULT call at 50k docs: compare pre-filter candidate VOLUMES
    # analytically (Σ C(bucket_size, 2) via groupBy-count — exactly the
    # pair count the self-join would shuffle, computable without
    # running the quadratic join itself). The default banded key must
    # cut the volume sharply vs the bare-chunk opt-out. (On this Zipf
    # synthetic corpus simhash chunks concentrate, so the absolute
    # volume is corpus-bound — the guard is the RATIO, i.e. the key is
    # never the bare chunk unless explicitly opted out.)
    n = 50_000
    pages = gen_pages(spark, n, include_fixtures=False).select("doc_id", "text")
    sh = simhash(pages, hash_family="fast").cache()  # emits n_tokens itself

    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
            )
            for c in range(4)
        ]
    )

    def pair_volume(df, banded: bool) -> int:
        ch = df.select("simhash", "n_tokens", F.explode(chunks).alias("c")).select(
            "c.chunk_id", "c.chunk", "n_tokens"
        )
        keys = ["chunk_id", "chunk"]
        if banded:
            base_band = F.floor(F.col("n_tokens") / 4).cast("long")
            ch = ch.select(
                "chunk_id", "chunk",
                F.explode(F.array(base_band, base_band + 1)).alias("band"),
            )
            keys = ["chunk_id", "chunk", "band"]
        return int(
            ch.groupBy(*keys).count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
            .collect()[0][0]
        )

    vol_banded = pair_volume(sh, banded=True)
    vol_plain = pair_volume(sh, banded=False)
    assert vol_banded < vol_plain / 3, (vol_banded, vol_plain)

    # the default call actually runs banded end-to-end at 10k (results
    # == explicit len_col call), and the quadratic opt-out is explicit
    sh10 = simhash(
        gen_pages(spark, 10_000, include_fixtures=False).select("doc_id", "text"),
        hash_family="fast",
    ).cache()
    banded = simhash_candidates(sh10, max_hamming=64, band_width=4).count()
    explicit = simhash_candidates(
        sh10, max_hamming=64, len_col="n_tokens", band_width=4
    ).count()
    assert banded == explicit
    plain = simhash_candidates(
        sh10, max_hamming=64, len_col=None, allow_unbanded=True
    ).count()
    assert banded < plain / 3, (banded, plain)
    sh10.unpersist()
    sh.unpersist()

    # unbanded without the explicit opt-out must refuse; so must a
    # missing length column
    with pytest.raises(ValueError, match="allow_unbanded"):
        simhash_candidates(sh, len_col=None)
    with pytest.raises(ValueError, match="len_col"):
        simhash_candidates(sh.drop("n_tokens"))

    # a true near-dup (1-token edit) survives banding (default call)
    row = pages.limit(1).collect()[0]
    dup_rows = [
        (1, row.text),
        (2, row.text.replace(row.text.split()[0], "zzz", 1)),
    ]
    d = spark.createDataFrame(dup_rows, "doc_id long, text string")
    got = simhash_candidates(
        simhash(d, hash_family="fast"), max_hamming=32, band_width=4
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_ivf_ann(spark, emb):
    """IVF: full-probe == exact brute force (rank+value identical);
    partial probe returns correctly-scored vectors from probed cells;
    cell assignment matches a numpy recompute."""
    from yaii_spark.ops.similarity import (
        cosine_topk, ivf_ann_topk, ivf_train, with_ivf_cell,
    )

    pool = emb.filter("vec_id > 0")
    qv = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    cent = ivf_train(pool, n_cells=8, sample_rows=512)
    assert cent.shape[1] == len(qv)

    exact = [(r.vec_id, r.cosine) for r in cosine_topk(pool, qv, k=5).collect()]
    full = [(r.vec_id, r.cosine)
            for r in ivf_ann_topk(pool, qv, cent, k=5, n_probe=8).collect()]
    assert full == exact

    part = ivf_ann_topk(pool, qv, cent, k=5, n_probe=2).collect()
    assert 0 < len(part) <= 5
    exact_scores = dict(
        (r.vec_id, r.cosine)
        for r in cosine_topk(pool, qv, k=10**9).collect()
    )
    for r in part:
        assert abs(exact_scores[r.vec_id] - r.cosine) < 1e-9

    # assignment parity with numpy
    rows = with_ivf_cell(pool.limit(50), cent).collect()
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        assert int((cent @ v).argmax()) == r.ivf_cell


def test_ann_index_partition_pruning(spark, emb, tmp_path):
    """Materialized ANN tables (write_ann_index) must turn probe
    filters into PARTITION PRUNING — the physical scan carries a
    PartitionFilters entry on the bucket/cell column — and return
    results identical to the on-the-fly signature path."""
    import io
    from contextlib import redirect_stdout

    from yaii_spark.ops.similarity import (
        ivf_ann_topk, ivf_train, lsh_ann_topk, read_ann_index, write_ann_index,
    )

    pool = emb.filter("vec_id > 0")
    qv = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    dim = len(qv)

    # ---- LSH ----
    lsh_dir = str(tmp_path / "ann_lsh")
    write_ann_index(pool, lsh_dir, dim=dim)
    t = read_ann_index(spark, lsh_dir)
    got = lsh_ann_topk(t, qv, dim=dim, k=5, multiprobe_hamming=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "lsh_bucket" in plan
    # identical to the on-the-fly path (same planes/seed)
    fly = [(r.vec_id, r.cosine)
           for r in lsh_ann_topk(pool, qv, dim=dim, k=5, multiprobe_hamming=1).collect()]
    assert [(r.vec_id, r.cosine) for r in got.collect()] == fly

    # ---- IVF ----
    cent = ivf_train(pool, n_cells=8, sample_rows=512)
    ivf_dir = str(tmp_path / "ann_ivf")
    write_ann_index(pool, ivf_dir, dim=dim, method="ivf", centroids=cent)
    t2 = read_ann_index(spark, ivf_dir)
    got2 = ivf_ann_topk(t2, qv, cent, k=5, n_probe=2)
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        got2.explain(mode="formatted")
    plan2 = buf2.getvalue()
    assert "PartitionFilters" in plan2 and "ivf_cell" in plan2
    fly2 = [(r.vec_id, r.cosine)
            for r in ivf_ann_topk(pool, qv, cent, k=5, n_probe=2).collect()]
    assert [(r.vec_id, r.cosine) for r in got2.collect()] == fly2


def test_ivf_exact_pruned(spark, emb, tmp_path):
    """ivf_ann_topk_exact == brute-force cosine_topk (rank AND value)
    for every probed query, on both the on-the-fly and the
    materialized-index paths — while actually pruning cells (the
    report says how many). The triangle-inequality bound makes
    partial probing exact, so the brute-force result is a strict
    oracle, not a recall target."""
    from yaii_spark.ops.similarity import (
        cosine_topk, ivf_ann_topk_exact, ivf_cell_stats, ivf_train,
        read_ann_index, read_ivf_cell_stats, write_ann_index,
    )

    pool = emb.filter("vec_id > 0")
    cent = ivf_train(pool, n_cells=8, sample_rows=512)
    stats = ivf_cell_stats(pool, cent)
    q_rows = emb.filter("vec_id in (0, 7, 23)").collect()
    for row in q_rows:
        qv = [float(x) for x in row.embedding]
        exact = [(r.vec_id, r.cosine) for r in cosine_topk(pool, qv, k=7).collect()]
        rep = {}
        got = [(r.vec_id, r.cosine)
               for r in ivf_ann_topk_exact(
                   pool, qv, cent, k=7, n_probe=2, cell_stats=stats, report=rep
               ).collect()]
        assert got == exact
        assert rep["probed"] + rep["pruned"] == rep["n_cells"]
        # near-orthogonal high-dim fixture: cell radii ~82-85 deg, so
        # bounds can't cut — the operator must degrade to a (still
        # exact) full probe, never to a wrong answer

    # pruning power on data where geometry permits: 8 tight clusters
    # (~8 deg radius), query inside one of them → most cells must fall
    # below the kth-score bound
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i % 8] + 0.1 * rng.standard_normal(16)
        rows.append((i + 1, [float(x) for x in c]))
    clustered = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ccent = ivf_train(clustered, n_cells=8, sample_rows=400)
    cstats = ivf_cell_stats(clustered, ccent)
    qv_c = [float(x) for x in centers[3]]
    rep2 = {}
    got_c = [(r.vec_id, r.cosine)
             for r in ivf_ann_topk_exact(
                 clustered, qv_c, ccent, k=7, n_probe=2, cell_stats=cstats,
                 report=rep2,
             ).collect()]
    exact_c = [(r.vec_id, r.cosine)
               for r in cosine_topk(clustered, qv_c, k=7).collect()]
    assert got_c == exact_c
    assert rep2["pruned"] > 0  # the bound actually cut cells here

    # materialized path: radii come from the index's _ivf_cell_stats
    # side table; probe filters stay partition-pruned
    ivf_dir = str(tmp_path / "ann_ivf_exact")
    dim = len(q_rows[0].embedding)
    write_ann_index(pool, ivf_dir, dim=dim, method="ivf", centroids=cent)
    t = read_ann_index(spark, ivf_dir)
    st = read_ivf_cell_stats(spark, ivf_dir)
    qv0 = [float(x) for x in q_rows[0].embedding]
    exact0 = [(r.vec_id, r.cosine) for r in cosine_topk(pool, qv0, k=7).collect()]
    got0 = ivf_ann_topk_exact(t, qv0, cent, k=7, n_probe=2, cell_stats=st)
    assert [(r.vec_id, r.cosine) for r in got0.collect()] == exact0

    # k larger than the corpus: every row comes back, still exact
    tiny = pool.filter("vec_id <= 30")
    tiny_stats = ivf_cell_stats(tiny, cent)
    all_exact = [(r.vec_id, r.cosine)
                 for r in cosine_topk(tiny, qv0, k=1000).collect()]
    all_got = [(r.vec_id, r.cosine)
               for r in ivf_ann_topk_exact(
                   tiny, qv0, cent, k=1000, n_probe=2, cell_stats=tiny_stats
               ).collect()]
    assert all_got == all_exact


def test_connected_components(spark):
    """Near-dup clustering: components == a pure-Python union-find on
    chains (the worst case for plain label propagation — pointer
    jumping must converge within the round cap), stars, cliques, and a
    seeded random graph; singletons keep their own id via
    assign_clusters."""
    import random

    from yaii_spark.ops.dedup import assign_clusters, connected_components

    def uf_oracle(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min id per component
        comp = {}
        for v in range(n_nodes):
            comp.setdefault(find(v), []).append(v)
        return {v: min(vs) for vs in comp.values() for v in vs}

    cases = {
        "chain": [(i, i + 1) for i in range(100)],
        "star": [(50, i) for i in range(40)],
        "two_cliques": [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)],
    }
    rng = random.Random(7)
    cases["random"] = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    for name, edges in cases.items():
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.cluster for r in connected_components(e).collect()}
        nodes = {x for ab in edges for x in ab}
        want = uf_oracle(max(nodes) + 1, edges)
        assert got == {v: want[v] for v in nodes}, name

    # assign_clusters: every doc labeled, singletons keep their own id
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    e = spark.createDataFrame([(1, 2), (2, 3), (10, 20)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in assign_clusters(docs, e).collect()}
    assert got[1] == got[2] == got[3] == 1 and got[10] == got[20] == 10
    assert all(got[i] == i for i in range(30) if i not in {2, 3, 20})

    # EMPTY edge list (a clean corpus): every doc is its own singleton —
    # regression for sum-over-empty returning NULL, which made the
    # fixpoint check never trigger and raised 'did not converge'
    e0 = spark.createDataFrame([], "id_a long, id_b long")
    got0 = {r.doc_id: r.cluster_id for r in assign_clusters(docs, e0).collect()}
    assert got0 == {i: i for i in range(30)}


def test_connected_components_no_separate_count_action(spark, monkeypatch):
    """The fixpoint check rides the aggregate that materializes the
    round's (lazy) localCheckpoint (VERDICT r4 #4) — the per-round
    `jumped ⋈ labels → filter → count()` action is gone. Raw Spark
    job counts are not a stable metric under AQE (every query-stage
    materialization is its own job), so this asserts the behavior
    directly: DataFrame.count is poisoned for the duration and the
    algorithm must still converge to the union-find answer."""
    from pyspark.sql import DataFrame

    from yaii_spark.ops.dedup import connected_components

    def _no_count(self):
        raise AssertionError(
            "connected_components must not run a separate count() job"
        )

    monkeypatch.setattr(DataFrame, "count", _no_count)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    res = {r.node: r.cluster for r in connected_components(edges).collect()}
    assert res == {i: 0 for i in range(65)}


def test_streaming_dedup_cross_batch(spark, tmp_path):
    """applyInPandasWithState exact dedup: an in-batch duplicate picks
    the min-id survivor; a duplicate arriving in a LATER micro-batch of
    the same query is suppressed by per-key GroupState."""
    import datetime as dt
    import os

    from yaii_spark.streaming import streaming_dedup
    from yaii_spark.synth import EPOCH, PAGES_SCHEMA, render_html

    d = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d, exist_ok=True)

    def write_batch(rows):
        data = [
            (i, f"https://x/{i}", EPOCH + dt.timedelta(seconds=i),
             render_html(t), t, "en", i)
            for i, t in rows
        ]
        spark.createDataFrame(data, PAGES_SCHEMA).write.mode("append").parquet(d)

    write_batch([(1, "alpha beta"), (2, "alpha  BETA "), (3, "gamma")])
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(d)
    q = (
        streaming_dedup(src)
        .writeStream.outputMode("append").format("memory")
        .queryName("dedup_sink").option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r.keep_id for r in spark.sql("SELECT keep_id FROM dedup_sink").collect()}
        assert got1 == {1, 3}  # 2 is an in-batch dup of 1 (min id wins)

        # later micro-batch: 4 duplicates doc 1 -> suppressed by state;
        # 5 is new content -> emitted
        write_batch([(4, "alpha beta"), (5, "delta")])
        q.processAllAvailable()
        got2 = {r.keep_id for r in spark.sql("SELECT keep_id FROM dedup_sink").collect()}
        assert got2 == {1, 3, 5}
    finally:
        q.stop()


class _FakeGroupState:
    """Minimal GroupState double for unit-testing the TTL state machine
    (the real one is wall-clock-driven — see make_dedup_state_fn)."""

    def __init__(self, exists=False, timed_out=False):
        self.exists = exists
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    def update(self, v):
        self.exists = True

    def remove(self):
        self.exists = False
        self.removed = True
        # a later invocation for this key sees a fresh, non-timed-out
        # state (hasTimedOut is per-invocation in the real GroupState)
        self.hasTimedOut = False

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_streaming_dedup_ttl_state_machine():
    """TTL mode (VERDICT r4 #5), deterministic at the state-transition
    level: a timed-out key is REMOVED (so its next sighting re-emits),
    a fresh key emits and arms the TTL, a seen key suppresses and
    re-arms; exact mode (ttl_ms=None) never touches timeouts."""
    import pandas as pd

    from yaii_spark.streaming import make_dedup_state_fn

    fn = make_dedup_state_fn(ttl_ms=500)
    batch = [pd.DataFrame({"keep_id": [7, 3]})]

    # fresh key: emit min id, arm TTL
    st = _FakeGroupState()
    out = list(fn(("h1",), iter(batch), st))
    assert len(out) == 1 and out[0]["keep_id"].iloc[0] == 3
    assert st.exists and st.timeout_set == 500

    # seen key: suppress, re-arm (sliding TTL)
    st = _FakeGroupState(exists=True)
    assert list(fn(("h1",), iter(batch), st)) == []
    assert st.timeout_set == 500 and not st.removed

    # idle past TTL: timeout invocation removes the entry...
    st = _FakeGroupState(exists=True, timed_out=True)
    assert list(fn(("h1",), iter([]), st)) == []
    assert st.removed and not st.exists
    # ...so the next sighting RE-EMITS
    out = list(fn(("h1",), iter(batch), st))
    assert len(out) == 1 and out[0]["keep_id"].iloc[0] == 3

    # exact mode: no timeout interaction at all
    fn0 = make_dedup_state_fn(None)
    st = _FakeGroupState(exists=True)
    assert list(fn0(("h1",), iter(batch), st)) == []
    assert st.timeout_set is None


def test_streaming_dedup_ttl_end_to_end(spark, tmp_path):
    """TTL wiring through a real query (ProcessingTimeTimeout active):
    a duplicate within the TTL is suppressed; after idling well past
    the TTL the key is evicted by the engine's timeout batches and the
    same content RE-EMITS. Margins are generous (10 s TTL vs sub-second
    batch cadence; 20 s idle) because processing-time expiry is
    wall-clock-driven. NOTE: processAllAvailable() never latches under
    ProcessingTimeTimeout (the engine keeps scheduling timeout-eviction
    batches), so the harness polls the sink instead."""
    import datetime as dt
    import os
    import time as _time

    from yaii_spark.streaming import streaming_dedup
    from yaii_spark.synth import EPOCH, PAGES_SCHEMA, render_html

    d = str(tmp_path / "incoming_ttl")
    ckpt = str(tmp_path / "ckpt_ttl")
    os.makedirs(d, exist_ok=True)

    def write_batch(rows):
        data = [
            (i, f"https://x/{i}", EPOCH + dt.timedelta(seconds=i),
             render_html(t), t, "en", i)
            for i, t in rows
        ]
        spark.createDataFrame(data, PAGES_SCHEMA).write.mode("append").parquet(d)

    def rows():
        return sorted(
            r.keep_id
            for r in spark.sql("SELECT keep_id FROM dedup_ttl_sink").collect()
        )

    def wait_rows(want, timeout=90):
        end = _time.time() + timeout
        while _time.time() < end:
            got = rows()
            if got == want:
                return got
            _time.sleep(0.3)
        return rows()

    write_batch([(1, "alpha beta"), (2, "alpha  BETA "), (3, "gamma")])
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(d)
    q = (
        streaming_dedup(src, ttl_ms=10_000)
        .writeStream.outputMode("append").format("memory")
        .queryName("dedup_ttl_sink").option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # in-batch dup suppressed (min id wins), distinct content kept
        assert wait_rows([1, 3]) == [1, 3]
        # idle >> TTL: both keys evicted by the engine's timeout batches
        _time.sleep(20)
        # expired content re-emits; 5 rides the same batch as proof the
        # pipeline is still deduping normally
        write_batch([(5, "alpha beta"), (6, "alpha beta")])
        assert wait_rows([1, 3, 5]) == [1, 3, 5]
    finally:
        q.stop()
