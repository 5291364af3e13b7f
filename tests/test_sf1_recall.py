"""ANN recall gate on the sf1 stress corpus (r8 verdict item 4).

The synthetic autoscale recall tests (tests/test_llmops.py) plant
moderate-similarity clusters at N=8192; the sf1 fixture's 20k vectors
are the OTHER adversarial regime the index actually meets in a
dedup-heavy corpus: 10x-duplicated content, so every vector carries 9
exact duplicates and LSH/IVF buckets are duplicate-saturated (max
candidate volume per bucket, ties everywhere in the top-k cut).  Both
kernels break ties deterministically ((sim DESC, nbr ASC) row_number —
operators/similarity.py), so recall here is exact, not flaky.

Opt-in (I2MR_SF1_TESTS=1): the exact ground-truth kernel is quadratic
(20k x 20k block matmul, ~1-2 min) and the fixture regenerates itself
(~2 min cold) — too heavy for the default suite, by design.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from i2mapreduce_spark.operators import similarity

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.environ.get("I2MR_SF1_DIR", "/tmp/testdata/sf1")

pytestmark = pytest.mark.skipif(
    os.environ.get("I2MR_SF1_TESTS") != "1",
    reason="sf1 recall gate is opt-in: I2MR_SF1_TESTS=1 (quadratic ground truth)",
)


def _ensure_sf1() -> None:
    """Regenerate the sf1 fixture when absent or when the generator
    changed since it was cut — the same .genstamp discipline as
    tools/canary_sf1.sh (r8 advice: never trust a stale /tmp copy)."""
    import hashlib

    gen = os.path.join(_REPO, "tools", "make_sf1.py")
    stamp = hashlib.md5(open(gen, "rb").read()).hexdigest()
    stamp_file = os.path.join(SF1, ".genstamp")
    have = (
        open(stamp_file).read()
        if os.path.exists(stamp_file)
        else None
    )
    if not os.path.isdir(os.path.join(SF1, "embeddings.parquet")) or have != stamp:
        subprocess.run([sys.executable, gen, SF1], check=True)
        with open(stamp_file, "w") as f:
            f.write(stamp)


@pytest.fixture(scope="module")
def sf1_emb(spark):
    _ensure_sf1()
    emb = spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
    emb.cache()
    n = emb.count()
    assert n >= 10_000, f"sf1 embeddings unexpectedly small: {n}"
    return emb


@pytest.fixture(scope="module")
def sf1_strong(spark, sf1_emb):
    """Exact top-5 per vector, strong (true near-duplicate) pairs only:
    on this corpus every vector has 9 exact duplicates (cos = 1.0), so
    sim >= 0.99 marks the planted ground truth and excludes the
    random-background tail the synthetic floor tests already cover."""
    return {
        (r.vec_id, r.nbr)
        for r in similarity.cosine_topk(spark, sf1_emb, k=5).collect()
        if r.sim >= 0.99
    }


def test_sf1_corpus_is_duplicate_saturated(sf1_strong, sf1_emb):
    # the gate is only meaningful if the corpus really is dup-heavy:
    # nearly every vector should surface strong pairs
    n = sf1_emb.count()
    assert len(sf1_strong) >= 2 * n, (
        f"expected >=2 strong pairs/vector, got {len(sf1_strong)} for {n}"
    )


def test_ann_lsh_recall_on_sf1_duplicates(spark, sf1_emb, sf1_strong):
    approx = {
        (r.vec_id, r.nbr)
        for r in similarity.cosine_topk_lsh(spark, sf1_emb, k=5).collect()
    }
    recall = len(approx & sf1_strong) / len(sf1_strong)
    assert recall >= 0.85, f"LSH recall on sf1 duplicates: {recall}"


def test_ann_ivf_recall_on_sf1_duplicates(spark, sf1_emb, sf1_strong):
    approx = {
        (r.vec_id, r.nbr)
        for r in similarity.cosine_topk_ivf(spark, sf1_emb, k=5).collect()
    }
    recall = len(approx & sf1_strong) / len(sf1_strong)
    assert recall >= 0.55, f"IVF recall on sf1 duplicates: {recall}"
