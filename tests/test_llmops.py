"""LLM-ops operator tests: the probabilistic scale paths (MinHash-LSH,
SimHash, hyperplane-LSH ANN) are validated against their exact
counterparts — candidates may miss (recall measured) but every reported
score must be exact (precision 1.0 by construction, re-checked here).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from i2mapreduce_spark.catalog import load_tables
from i2mapreduce_spark.operators import dedup, multimodal, similarity, text as text_ops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.table("documents")


def test_minhash_lsh_finds_all_planted_near_dups(spark, sf_dir, docs):
    """On fixture data the planted near-dups have jaccard ~0.97 — far above
    the banding s-curve threshold, so recall must be exactly 1.0."""
    sh = dedup.shingles(docs, n=3)
    exact = {(r.d1, r.d2) for r in dedup.jaccard_pairs(sh, 0.5).collect()}
    lsh = {(r.d1, r.d2) for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    assert exact, "fixture should contain planted near-dup pairs"
    assert lsh == exact, f"missed={exact - lsh} spurious={lsh - exact}"


def test_simhash_recalls_planted_near_dups(spark, sf_dir, docs):
    """SimHash is a candidate generator: on the planted jac>=0.9 pairs it
    must recall the large majority at hamming<=3 (measured 21/27 at
    sf0.001 — the misses are short docs where single tokens flip many
    bits, textbook simhash behavior; precision is NOT asserted because
    short low-vocab docs legitimately collide)."""
    sh = dedup.shingles(docs, n=3)
    exact9 = {(r.d1, r.d2) for r in dedup.jaccard_pairs(sh, 0.9).collect()}
    if not exact9:
        pytest.skip("no planted near-dups at this sf")
    got = {(r.d1, r.d2) for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()}
    recall = len(got & exact9) / len(exact9)
    assert recall >= 0.6, f"simhash recall {recall} on planted near-dups"


def test_ann_lsh_recall_and_exact_scores(spark, sf_dir):
    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    exact = {(r.vec_id, r.nbr): r.sim for r in similarity.cosine_topk(spark, emb, k=5).collect()}
    approx = {(r.vec_id, r.nbr): r.sim for r in similarity.cosine_topk_lsh(spark, emb, k=5).collect()}
    # every approx pair's score must equal the exact kernel's score
    for pair, sim in approx.items():
        if pair in exact:
            assert abs(sim - exact[pair]) < 1e-9
    # recall is probabilistic; require a sane floor at fixture scale
    # fixture embeddings are RANDOM, so top-k "neighbors" sit barely above
    # background similarity — the hardest case for LSH; require a floor
    # well above the ~0.1% a broken bucketing would produce
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall > 0.10, f"ANN recall collapsed: {recall}"


def test_ann_ivf_recall_and_exact_scores(spark, sf_dir):
    """IVF mirror of the LSH test: probed-cell candidates re-score to the
    exact kernel's value; recall floor reflects RANDOM fixture embeddings
    (no cluster structure — IVF's hardest case; n_probe=4 of 16 cells
    covers ~25% of space at minimum)."""
    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    exact = {(r.vec_id, r.nbr): r.sim for r in similarity.cosine_topk(spark, emb, k=5).collect()}
    approx = {(r.vec_id, r.nbr): r.sim for r in similarity.cosine_topk_ivf(spark, emb, k=5).collect()}
    for pair, sim in approx.items():
        if pair in exact:
            assert abs(sim - exact[pair]) < 1e-9
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall > 0.15, f"IVF recall collapsed: {recall}"


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Planted clustered embeddings: 20 tight clusters x 10 points
    (within-cluster cosine >= ~0.95) — the regime real near-dup corpora
    live in, vs the fixtures' RANDOM embeddings where top-k neighbors sit
    barely above background."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(10):
            v = c + 0.15 * rng.standard_normal(64) / np.sqrt(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _strong_topk(spark, emb, sim_floor=0.8):
    """Ground truth for the high-recall regime: exact top-5 entries whose
    similarity marks a TRUE near neighbor (same planted cluster).  The
    exact top-5 of the last ids in each cluster also contains
    cross-cluster near-random pairs (the nbr > vec_id convention leaves
    them nothing closer) — those are the random-embedding regime, covered
    by the floor tests above, not the near-dup claim."""
    return {(r.vec_id, r.nbr) for r in
            similarity.cosine_topk(spark, emb, k=5).collect()
            if r.sim >= sim_floor}


def test_ann_lsh_high_recall_on_clustered_data(spark, clustered_emb):
    """On clustered data the SAME default LSH parameters recall >99% of
    true near neighbors — the regime the operator docstring claims; the
    random-embedding floor test above covers the adversarial end."""
    strong = _strong_topk(spark, clustered_emb)
    assert strong, "planted clusters should produce strong pairs"
    approx = {(r.vec_id, r.nbr) for r in
              similarity.cosine_topk_lsh(spark, clustered_emb, k=5).collect()}
    recall = len(approx & strong) / len(strong)
    assert recall >= 0.99, f"LSH recall on planted near neighbors: {recall}"


def test_ann_ivf_high_recall_on_clustered_data(spark, clustered_emb):
    strong = _strong_topk(spark, clustered_emb)
    approx = {(r.vec_id, r.nbr) for r in
              similarity.cosine_topk_ivf(spark, clustered_emb, k=5).collect()}
    recall = len(approx & strong) / len(strong)
    assert recall >= 0.90, f"IVF recall on planted near neighbors: {recall}"


@pytest.fixture(scope="module")
def big_clustered(spark):
    """Clustered corpus at an AUTOSCALE-ENGAGING size (r7 advice: the
    N-aware defaults — more planes, more cells — were recall-tested only
    at N<=2k where they resolve to the old constants, so the new code
    paths were recall-untested exactly where they matter).  N=8192 ->
    LSH picks 10 planes + 2 directed probes, IVF picks 90 lists + 6
    probes.  Noise is tuned to median within-cluster cos ~0.55 — the
    moderate-similarity regime where added planes/cells hurt recall
    most (exact-duplicate corpora like the sf1 fixture recall trivially).
    Everything is seeded; recall values below are deterministic."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_clusters, per, dim = 512, 16, 64
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    n = n_clusters * per
    M = np.repeat(centers, per, axis=0) + (0.9 / np.sqrt(dim)) * rng.standard_normal((n, dim))
    # ground truth driver-side: exact top-5 per vector among ids > own id,
    # strong (true-neighbor) pairs only — one 8k x 8k matmul, ~1s
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    np.fill_diagonal(S, -2)
    strong = set()
    for i in range(n):
        sims = S[i].copy()
        sims[: i + 1] = -2
        for j in np.argsort(-sims, kind="stable")[:5]:
            if sims[j] >= 0.6:
                strong.add((i, int(j)))
    rows = [(int(i), [float(x) for x in M[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb.cache()
    emb.count()
    return emb, strong


def test_ann_lsh_autoscale_holds_recall_at_scale(spark, big_clustered):
    """At N=8192 the plane autoscale engages (10 planes vs the fixture
    8) AND the directed multiprobe that compensates it (2 probes).
    Measured, deterministic: 0.868 recall WITH probes vs 0.365 with the
    probes disabled at the same plane count, vs 0.708 for the legacy
    fixed-8-plane layout — i.e. the autoscale no longer trades recall
    for its linear candidate volume; it beats the layout it replaced."""
    emb, strong = big_clustered
    with_probes = {(r.vec_id, r.nbr) for r in
                   similarity.cosine_topk_lsh(spark, emb, k=5).collect()}
    recall = len(with_probes & strong) / len(strong)
    assert recall >= 0.85, f"autoscaled LSH recall regressed: {recall}"
    no_probes = {(r.vec_id, r.nbr) for r in
                 similarity.cosine_topk_lsh(spark, emb, k=5, n_flip=0).collect()}
    recall_np = len(no_probes & strong) / len(strong)
    assert recall > recall_np + 0.3, (
        f"directed multiprobe not engaging: {recall} vs {recall_np}")


def test_ann_ivf_autoscale_holds_recall_at_scale(spark, big_clustered):
    """At N=8192 IVF autoscale picks 90 lists / 6 probes.  Measured,
    deterministic: 0.565 recall with probe scaling vs 0.478 with the
    probe count pinned at the old fixed 4 — probes must scale with the
    list count or the probed corpus fraction shrinks as 4/sqrt(N)."""
    emb, strong = big_clustered
    scaled = {(r.vec_id, r.nbr) for r in
              similarity.cosine_topk_ivf(spark, emb, k=5).collect()}
    recall = len(scaled & strong) / len(strong)
    assert recall >= 0.55, f"autoscaled IVF recall regressed: {recall}"
    fixed4 = {(r.vec_id, r.nbr) for r in
              similarity.cosine_topk_ivf(spark, emb, k=5, n_probe=4).collect()}
    recall_f = len(fixed4 & strong) / len(strong)
    assert recall > recall_f, (
        f"probe autoscale not engaging: {recall} vs {recall_f}")


def test_exact_dedup_idempotent(spark, sf_dir, docs):
    """dedup(dedup(x)) == dedup(x) (property test, SURVEY §5.3)."""
    once = dedup.exact_dedup_keys(docs.unionAll(docs))
    assert once.filter(F.col("n") != 2).count() == 0
    kept = docs.join(once.select(F.col("keep_id").alias("doc_id")), "doc_id")
    twice = dedup.exact_dedup_keys(kept)
    assert twice.filter(F.col("n") != 1).count() == 0
    assert twice.count() == once.count()


def test_multimodal_decode_stub_gates(spark, sf_dir, docs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"abc", "image", fake=False)


def test_multimodal_extract_deterministic(spark, sf_dir, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(50))
    a = sorted(multimodal.extract_features(wrapped).collect())
    b = sorted(multimodal.extract_features(wrapped).collect())
    assert a == b
    for row in a[:5]:
        assert len(row.feature) == 16
        # features are rounded 6dp after normalization, so the norm can
        # drift by up to ~16*1e-6
        assert abs(sum(x * x for x in row.feature) - 1.0) < 1e-4  # L2 normalized


def test_multimodal_frame_sample_shape(spark, sf_dir, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(5))
    frames = multimodal.frame_sample(wrapped, every_n=10).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: r for r in wrapped.collect()}
    for did, rows in by_doc.items():
        total = sum(len(r.frame) for r in rows)
        assert total == src[did].meta.byte_len  # frames tile the payload
        assert sorted(r.frame_off for r in rows) == list(range(0, total, 10))


def test_multimodal_resize_deterministic_and_ranged(spark, sf_dir, docs):
    """Resize pooling: repartition-independent, byte-valued range, and a
    numpy replica agrees exactly on one row."""
    import numpy as np

    wrapped = multimodal.attach_binary_payload(docs.limit(20))
    a = sorted(multimodal.resize(wrapped).collect())
    b = sorted(multimodal.resize(wrapped.repartition(7)).collect())
    assert a == b
    for r in a:
        assert 0.0 <= r.px_c00 <= 255.0 and 0.0 <= r.px_mean <= 255.0

    src = wrapped.orderBy("doc_id").first()
    arr = np.frombuffer(bytes(src.payload), dtype=np.uint8).astype(np.float64)
    h, w = src.meta.height, src.meta.width
    img = np.resize(arr, (h, w))
    ys, xs = (np.arange(h) * 6) // h, (np.arange(w) * 8) // w
    pooled, cnt = np.zeros((6, 8)), np.zeros((6, 8))
    np.add.at(pooled, (ys[:, None], xs[None, :]), img)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    grid = pooled / np.maximum(cnt, 1.0)
    got = next(r for r in a if r.doc_id == src.doc_id)
    assert got.px_c00 == multimodal._round_half_away(float(grid[0, 0]))
    assert got.px_mean == multimodal._round_half_away(float(img.sum()) / img.size)


def test_lang_id_deterministic_and_sane(spark):
    df = spark.createDataFrame(
        [(1, "the running and jumping motion"), (2, "der schönen einen sprache")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_guess for r in text_ops.lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"


def test_fingerprint_matches_golden_and_is_order_sensitive(spark):
    def golden(text):
        # token int = md5 last 8 bytes little-endian (== DuckDB
        # md5_number_lower, the shared cross-engine definition)
        acc, power = 0, 1
        for tok in [t for t in text.split(" ") if t]:
            ti = int.from_bytes(hashlib.md5(tok.encode()).digest()[8:], "little")
            acc = (acc + ti * power) % ((1 << 61) - 1)
            power = (power * 1000003) % ((1 << 61) - 1)
        return acc

    df = spark.createDataFrame(
        [(1, "join filter window"), (2, "window filter join")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.fp for r in text_ops.fingerprint(df).collect()}
    assert got[1] == golden("join filter window")
    assert got[2] == golden("window filter join")
    assert got[1] != got[2], "fingerprint must be order-sensitive"
