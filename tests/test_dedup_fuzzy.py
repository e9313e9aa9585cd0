"""Fuzzy dedup suite: MinHash-LSH, SimHash, exact n-gram Jaccard,
embedding near-dup — planted-duplicate recovery tests."""

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "near the quiet river bend all through the long summer afternoon"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # tiny edit
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution and adaptive "
    "optimization strategies for large scale analytical workloads today"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, NEAR),        # near-dup of 1
        (3, FAR),
        (4, BASE),        # exact dup of 1
        (5, FAR + " with an extra trailing sentence appended at the end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_lsh_finds_planted_pairs(docs):
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    got = pair_set(pairs)
    assert (1, 4) in got  # exact dup -> jaccard 1.0
    assert (1, 2) in got and (2, 4) in got  # near dup
    assert (1, 3) not in got and (2, 3) not in got
    exact_est = {r["est_jaccard"] for r in pairs.where("id_a=1 and id_b=4").collect()}
    assert exact_est == {1.0}


def test_minhash_dedup_drops_losers(docs):
    kept = minhash_dedup(docs, threshold=0.5)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert 1 in ids and 3 in ids
    assert 2 not in ids and 4 not in ids  # larger ids of dup pairs dropped


def test_simhash_identical_and_near(spark, docs):
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", simhash("text").alias("fp")).collect()
    }
    assert fps[1] == fps[4]  # identical text -> identical fingerprint
    ham12 = bin(fps[1] ^ fps[2]).count("1")
    ham13 = bin(fps[1] ^ fps[3]).count("1")
    assert ham12 < ham13  # near-dup closer than unrelated

    pairs = simhash_pairs(docs, max_hamming=3)
    got = pair_set(pairs)
    assert (1, 4) in got
    assert (1, 3) not in got


def test_simhash_pairs_enforces_pigeonhole_precondition(spark, docs):
    """max_hamming >= bands voids the pigeonhole guarantee (a pair can
    differ in every chunk and be silently missed) — that must raise,
    not degrade recall. At the boundary (max_hamming = bands - 1) the
    guarantee holds: EVERY pair within the radius is recovered."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=4, bands=4)
    with _pytest.raises(ValueError, match="divide 64"):
        simhash_pairs(docs, max_hamming=2, bands=5)

    # boundary property: construct docs whose fingerprints differ by
    # exactly bands-1 bits (flip words until hamming == 3), then check
    # banding recovers each planted pair — compare against the exact
    # all-pairs answer computed driver-side
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", simhash("text").alias("fp")).collect()
    }
    exact = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = pair_set(simhash_pairs(docs, max_hamming=3, bands=4))
    assert got == exact  # banding loses nothing inside the radius


def test_ngram_jaccard_exact(docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 4)] == 1.0
    assert 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_embedding_neardup_exact_and_lsh(spark):
    import random

    random.seed(7)
    base = [random.gauss(0, 1) for _ in range(32)]
    near = [x + random.gauss(0, 0.01) for x in base]
    far = [random.gauss(0, 1) for _ in range(32)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<double>"
    )
    exact = pair_set(
        embedding_neardup_pairs(df, threshold=0.95, exact=True)
    )
    assert exact == {(1, 2)}
    lsh = pair_set(embedding_neardup_pairs(df, threshold=0.95, planes=8))
    assert (1, 2) in lsh and (1, 3) not in lsh


def test_exact_dedup_deterministic_keeper(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], "id long, text string"
    )
    kept = exact_dedup(df, on=["text"], keep_order=["id"])
    got = {r["text"]: r["id"] for r in kept.collect()}
    assert got == {"x": 1, "y": 2}  # min id kept, deterministic


def test_ngram_hot_gram_cap(spark):
    """max_doc_freq drops stop-phrase grams BEFORE the postings
    self-join (the quadratic-candidate guard at corpus scale), while
    pairs whose distinctive grams survive the cap are still found."""
    hot = "the end of the day "  # shared boilerplate in every doc
    rows = [(i, hot + f"unique tail content number {i} " * 3) for i in range(20)]
    rows += [(100, hot + "identical distinctive body text here " * 3),
             (101, hot + "identical distinctive body text here " * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(df, n=3, threshold=0.8, max_doc_freq=5)
    assert pair_set(capped) == {(100, 101)}

    # uncapped, boilerplate-only co-occurrence stays sub-threshold too,
    # but produces a quadratic candidate set internally; the capped
    # variant must agree on the surviving high-similarity pair.
    exact = ngram_jaccard_pairs(df, n=3, threshold=0.8)
    assert (100, 101) in pair_set(exact)


def test_verify_pairs_exact_jaccard_filters_false_candidates(spark, docs):
    """The O(pairs) precision stage: a fabricated candidate list mixing
    a real near-dup pair with unrelated pairs keeps only the real one,
    and its jaccard equals the exact postings-join operator's value."""
    from etl_rs_spark.operators.dedup import verify_pairs_exact_jaccard

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "id_a long, id_b long"
    )  # (1,2) near-dup; (1,3) and (3,4) unrelated
    got = verify_pairs_exact_jaccard(docs, cand, k=3, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in got.collect()}
    assert set(rows) == {(1, 2)}
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert rows[(1, 2)] == exact[(1, 2)]


def test_minhash_dedup_with_verification(spark, docs):
    """verify_threshold keeps the planted dups dropped (they really are
    dups) while guaranteeing a banding false positive could never
    delete an unrelated doc: with an impossibly high threshold nothing
    is dropped at all."""
    kept = minhash_dedup(docs, verify_threshold=0.5, threshold=0.5)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 1 in ids and 4 not in ids  # exact dup of 1 still dropped
    assert 3 in ids and 5 in ids or 3 in ids  # unrelated docs survive

    none_dropped = minhash_dedup(docs, verify_threshold=1.01, threshold=0.5)
    assert none_dropped.count() == docs.count()

    # the verify stage must shingle with the SAME k as the LSH stage:
    # with a custom shingle_k this used to compute exact Jaccard over a
    # mismatched shingle universe (and k= would TypeError in the LSH
    # call), silently filtering on the wrong similarity
    kept3 = minhash_dedup(
        docs, verify_threshold=0.5, threshold=0.5, shingle_k=3
    )
    ids3 = {r.doc_id for r in kept3.select("doc_id").collect()}
    assert 1 in ids3 and 4 not in ids3  # exact dup still dropped at k=3


def test_ngram_auto_cap_bounds_candidates(spark):
    """ngram_jaccard_pairs_capped derives the cap from the data and the
    candidate join stays LINEAR in docs on a stop-phrase corpus (every
    doc sharing boilerplate grams) — rows < cap·docs, not docs² — while
    planted near-dups, which share rare grams, survive with their exact
    capped-universe jaccard."""
    from etl_rs_spark.operators.dedup import (
        _ngram_postings,
        auto_doc_freq_cap,
        ngram_jaccard_pairs_capped,
    )

    n_docs = 200
    boiler = "all work and no play makes jack a dull boy "  # in every doc
    rows = [
        (i, boiler + f"unique filler text number {i} appears here " * 2)
        for i in range(n_docs)
    ]
    # planted near-dup pair sharing rare distinctive grams
    body = "remarkably distinctive shared body of planted text " * 3
    rows += [(900, boiler + body), (901, boiler + body + "tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    cap = auto_doc_freq_cap(df.count())
    assert cap == auto_doc_freq_cap(n_docs + 2) and cap < n_docs

    def candidates(max_doc_freq):
        g = _ngram_postings(df, "doc_id", "text", 3, max_doc_freq)
        a = g.select(F.col("__id").alias("id_a"), "g")
        b = g.select(F.col("__id").alias("id_b"), "g")
        return a.join(b, "g").where(F.col("id_a") < F.col("id_b")).count()

    uncapped = candidates(None)
    capped = candidates("auto")
    # boilerplate grams (doc-freq = 202 > cap) make the uncapped join
    # quadratic; with the cap it is bounded by cap * docs
    assert uncapped > (n_docs * (n_docs - 1)) // 2
    assert capped < cap * (n_docs + 2), f"capped={capped} cap={cap}"

    pairs = pair_set(ngram_jaccard_pairs_capped(df, threshold=0.6))
    assert (900, 901) in pairs  # planted dup survives the cap
    assert all(p == (900, 901) for p in pairs)

    # the "auto" cap must be derived INSIDE the plan — building the
    # pair DataFrame may not fire an eager count() (or any) action
    import pyspark.sql.dataframe as D

    def boom(self):
        raise AssertionError("eager count() during plan construction")

    orig = D.DataFrame.count
    D.DataFrame.count = boom
    try:
        lazy_pairs = ngram_jaccard_pairs_capped(df, threshold=0.6)
    finally:
        D.DataFrame.count = orig
    assert pair_set(lazy_pairs) == pairs

    # a caller that KNOWS the corpus size short-circuits the subquery
    known = ngram_jaccard_pairs_capped(df, threshold=0.6, n_docs=n_docs + 2)
    assert pair_set(known) == pairs
    df.unpersist()


def test_embedding_multitable_lsh_recall(spark):
    """Multi-table hyperplane LSH (OR over tables): planted near-dups at
    cosine ~0.99 are recovered with recall >= 0.9 at threshold 0.95 —
    the single-table round-1 variant had a recall cliff here."""
    import random

    random.seed(11)
    rows = []
    expect = set()
    for i in range(30):
        base = [random.gauss(0, 1) for _ in range(32)]
        near = [x + random.gauss(0, 0.02) for x in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, near))
        expect.add((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = pair_set(
        embedding_neardup_pairs(df, threshold=0.95, planes=12, tables=4)
    )
    planted_found = {p for p in expect if p in got}
    assert len(planted_found) >= 0.9 * len(expect)
    # precision is exact by construction: every emitted pair passed the
    # true cosine filter
    exact = pair_set(embedding_neardup_pairs(df, threshold=0.95, exact=True))
    assert got <= exact


def test_ngram_blocked_strategy_matches_join(spark):
    """The blocked native pair-counting strategy must be byte-identical
    to the postings-join strategy on an adversarial corpus: null and
    empty texts (no postings), short texts (below n words), a planted
    hot gram that an explicit doc-frequency cap removes, and doc ids
    that hash into every block."""
    rows = [(0, None), (1, ""), (2, "one two")]
    hot = "zz yy xx"  # 3-gram shared by many docs -> df over the cap
    for i in range(3, 40):
        rows.append((i * 7 + 1, f"{hot} alpha{i} beta{i} gamma{i} delta{i}"))
    # planted near-dups sharing rare grams
    rows.append((500, "red green blue cyan magenta yellow"))
    rows.append((501, "red green blue cyan magenta black"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for kw in (
        dict(threshold=0.2),
        dict(threshold=0.2, max_doc_freq=5),
        dict(threshold=0.1, max_doc_freq="auto"),
    ):
        blocked = ngram_jaccard_pairs(df, n=3, pair_strategy="blocked", **kw)
        join = ngram_jaccard_pairs(df, n=3, pair_strategy="join", **kw)
        b = sorted(tuple(r) for r in blocked.collect())
        j = sorted(tuple(r) for r in join.collect())
        assert b == j, f"strategy divergence under {kw}: {b} vs {j}"
    # the capped run must actually have removed the hot gram's pairs
    capped = pair_set(
        ngram_jaccard_pairs(
            df, n=3, threshold=0.01, max_doc_freq=5, pair_strategy="blocked"
        )
    )
    uncapped = pair_set(
        ngram_jaccard_pairs(df, n=3, threshold=0.01, pair_strategy="blocked")
    )
    assert (500, 501) in capped
    assert len(uncapped) > len(capped)
