import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvester_spark.operators.dedup import (exact_duplicates, minhash_lsh_pairs,
                                             minhash_signatures, ngram_jaccard,
                                             simhash, simhash_near_pairs)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "import numpy as np def main return value data result for index"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " extra_token_x"),                # near dup
        (3, base.replace("numpy", "pandas")),        # near dup
        (4, "completely different words about streaming windows watermark"),
        (5, "another unrelated doc talking about graph traversal nodes edges"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["keep_id"] == 0 and g["doc_ids"] == [0, 1] and g["n_dups"] == 2


def test_minhash_identical_sigs(dup_docs):
    sig = {r["doc_id"]: r["sig"] for r in minhash_signatures(dup_docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[4]
    # near-dup shares most hash mins
    agree = sum(a == b for a, b in zip(sig[0], sig[2]))
    assert agree > 32  # >half of 64


def test_minhash_lsh_pairs_find_dups(dup_docs):
    pairs = minhash_lsh_pairs(dup_docs, jaccard_threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0
    assert not any({4, 5} & {a, b} for a, b in got)


def test_minhash_approximates_jaccard(spark):
    # statistical property: signature agreement ≈ true Jaccard
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    a = set(rng.choice(vocab, 80, replace=False))
    b = set(list(a)[:40]) | set(rng.choice(vocab, 40, replace=False))
    docs = spark.createDataFrame(
        [(0, " ".join(sorted(a))), (1, " ".join(sorted(b)))],
        "doc_id long, content string")
    sig = {r["doc_id"]: r["sig"] for r in
           minhash_signatures(docs, shingle_n=1, num_hashes=64).collect()}
    est = sum(x == y for x, y in zip(sig[0], sig[1])) / 64
    true_j = len(a & b) / len(a | b)
    assert abs(est - true_j) < 0.2


def test_simhash_hamming(dup_docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(dup_docs).collect()}
    assert fp[0] == fp[1]
    ham = bin(fp[0] ^ fp[2]).count("1")
    assert ham <= 8
    ham_far = bin(fp[0] ^ fp[4]).count("1")
    assert ham_far > ham


def test_simhash_near_pairs(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(dup_docs, max_hamming=8).collect()}
    assert pairs.get((0, 1)) == 0
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_ngram_jaccard(dup_docs, spark):
    probe = dup_docs.filter(F.col("doc_id") == 0)
    out = {r["doc_a"]: r["jaccard"]
           for r in ngram_jaccard(dup_docs, probe).collect()}
    # pairs are (every doc, probe 0)
    assert out[1] == 1.0
    assert out[4] == 0.0
    assert 0 < out[2] < 1.0


def test_empty_docs_not_near_dups(spark):
    """Zero-token docs must produce NO shingles (an empty-string shingle
    would make all punctuation-only docs jaccard-1.0 dups of each other)."""
    from harvester_spark.operators.dedup import shingles_expr
    docs = spark.createDataFrame(
        [(0, ""), (1, "..!!"), (2, "real content words here"),
         (3, ""), (4, "..!!")],   # byte-identical zero-token docs: no
        "doc_id long, content string")  # star pairs either (0/0 jaccard)
    sh = {r["doc_id"]: r["s"] for r in
          docs.select("doc_id", shingles_expr("content").alias("s")).collect()}
    assert sh[0] == [] and sh[1] == []
    assert len(sh[2]) > 0
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    assert pairs == []


def _permuted_docs(spark, n=30):
    """n DISTINCT docs sharing one token multiset (shuffled order): with
    shingle_n=1 their shingle sets are identical, so every minhash bucket
    holds all n docs — oversized buckets of NON-identical content (the
    rep-collapse can't help; only max_bucket can)."""
    import random
    toks = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
            "theta"]
    rng = random.Random(7)
    seen, rows = set(), []
    while len(rows) < n:
        t = toks[:]
        rng.shuffle(t)
        s = " ".join(t)
        if s not in seen:
            seen.add(s)
            rows.append((len(rows), s))
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_minhash_lsh_drop_metrics(spark):
    """Oversized buckets of DISTINCT contents are dropped but ACCOUNTED,
    never silent (identical contents collapse instead — see below)."""
    docs = _permuted_docs(spark, 30)
    pairs, metrics = minhash_lsh_pairs(docs, max_bucket=4, shingle_n=1,
                                       with_metrics=True)
    m = metrics.collect()[0]
    assert m["dropped_buckets"] == 16    # same sig -> all 16 band buckets
    assert m["dropped_doc_entries"] == 16 * 30
    assert m["max_dropped_size"] == 30
    assert m["identical_content_groups"] == 0  # contents all distinct
    assert pairs.count() == 0  # every bucket oversized -> all dropped
    # with a big enough cap nothing is dropped and all pairs appear
    pairs2, metrics2 = minhash_lsh_pairs(docs, max_bucket=100, shingle_n=1,
                                         with_metrics=True)
    assert metrics2.collect()[0]["dropped_buckets"] == 0
    assert pairs2.count() == 30 * 29 // 2


def test_minhash_identical_cluster_collapses(spark):
    """Byte-identical docs must NOT explode buckets: they collapse to one
    representative pre-banding and emit star pairs (jaccard exactly 1.0),
    so even max_bucket=4 sees buckets of size 1 and drops nothing."""
    same = "import numpy def main return value data result"
    docs = spark.createDataFrame([(i, same) for i in range(8)],
                                 "doc_id long, content string")
    pairs, metrics = minhash_lsh_pairs(docs, max_bucket=4, with_metrics=True,
                                       jaccard_threshold=0.5)
    m = metrics.collect()[0]
    assert m["dropped_buckets"] == 0
    assert m["identical_content_groups"] == 1
    assert m["identical_content_extra_docs"] == 7
    rows = pairs.collect()
    assert len(rows) == 7                       # stars, not 28 clique edges
    assert all(r["doc_a"] == 0 and r["jaccard"] == 1.0 for r in rows)
    assert sorted(r["doc_b"] for r in rows) == list(range(1, 8))


def test_minhash_identical_cluster_bounded_output(spark, monkeypatch):
    """r4 verdict #1/#2: a 10^4-doc byte-identical cluster must complete
    with O(m) output and a BOUNDED bucket agg buffer (banding sees one
    representative; the capped collect_list never materializes a
    mega-array)."""
    from harvester_spark.operators import dedup as dd
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)  # distributed path
    same = "the same boilerplate payload repeated in every doc"
    rows = [(i, same) for i in range(10_000)]
    rows += [(20_000, "completely different content here xyz")]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    pairs, metrics = minhash_lsh_pairs(docs, max_bucket=100,
                                       with_metrics=True)
    assert pairs.count() == 9_999               # stars only
    star = pairs.filter(F.col("doc_a") == 0)
    assert star.count() == 9_999
    m = metrics.collect()[0]
    assert m["dropped_buckets"] == 0
    assert m["identical_content_groups"] == 1
    assert m["identical_content_extra_docs"] == 9_999


def test_capped_bucket_agg_bounds_buffer(spark):
    """The collect_list agg buffer must hold at most max_bucket+1 entries
    even for a mega-bucket — the row_number pre-cap runs BEFORE the
    aggregation (r4 verdict #1: the old post-agg filter still built the
    full array on one reducer first)."""
    from harvester_spark.operators.dedup import _capped_bucket_agg
    rows = spark.range(5_000).select(F.lit(1).alias("k"),
                                     F.col("id").alias("doc_id"))
    out = _capped_bucket_agg(rows, ["k"], "doc_id", F.col("doc_id"), "ids",
                             10).collect()
    assert len(out) == 1
    assert out[0]["sz"] == 5_000                # exact, uncapped count
    assert out[0]["ids"] == list(range(11))     # max_bucket+1 witness
    # under-cap buckets keep their full membership
    small = spark.range(5).select(F.lit(2).alias("k"),
                                  F.col("id").alias("doc_id"))
    out2 = _capped_bucket_agg(small, ["k"], "doc_id", F.col("doc_id"),
                              "ids", 10).collect()
    assert out2[0]["ids"] == list(range(5)) and out2[0]["sz"] == 5


def test_simhash_manku_blocking_recall(spark):
    """Multi-table blocking (C>k+1) must recover every planted near-dup
    pair at a corpus 10x the unit-test scale, with zero silent drops."""
    from harvester_spark.fixtures.corpus import make_corpus
    base = make_corpus(60, seed=9)
    rows = [(i, c) for i, c in enumerate(base["content"])]
    # plant 5 near-dups: copy doc i with one token appended
    for i in range(5):
        rows.append((1000 + i, base["content"].iloc[i] + " zz_tail"))
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    pairs, metrics = simhash_near_pairs(docs, max_hamming=6, chunks=8,
                                        with_metrics=True)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    for i in range(5):
        ham = bin(fp[i] ^ fp[1000 + i]).count("1")
        if ham <= 6:  # every true near-dup within the radius is found
            assert (i, 1000 + i) in got, (i, ham)
    assert metrics.collect()[0]["dropped_buckets"] == 0


def test_simhash_identical_cluster_bounded_output(spark, monkeypatch):
    """VERDICT r2: a 10^4-doc identical-fingerprint cluster must complete
    with O(m) output (star pairs via rep-collapse), not O(m²) through the
    bucket explode — and the collapse must be reported in metrics."""
    from harvester_spark.operators import dedup as dd
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)  # distributed path
    same = "import numpy def main return value data result"
    rows = [(i, same) for i in range(10_000)]
    rows += [(20_000, "completely different content here xyz")]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    pairs, metrics = simhash_near_pairs(docs, max_hamming=3, chunks=4,
                                        with_metrics=True)
    n = pairs.count()
    assert n == 9_999  # star: (0, i) for i in 1..9999 — not 49,995,000
    star = pairs.filter(F.col("hamming") == 0)
    assert star.count() == 9_999
    assert star.agg(F.min("doc_a"), F.max("doc_a")).collect()[0] == (0, 0)
    m = metrics.collect()[0]
    assert m["identical_fp_groups"] == 1
    assert m["identical_fp_extra_docs"] == 9_999
    assert m["dropped_buckets"] == 0  # 1 distinct fp: nothing to drop


def test_simhash_components_preserved_under_collapse(spark):
    """Rep-collapse changes the edge list but must keep the near-dup
    graph's connected components: cross-cluster edges surface on the
    representative."""
    rows = [(0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),   # identical to 0
            (2, "alpha beta gamma delta epsilon eta")]    # near 0/1
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(docs, max_hamming=16,
                                         chunks=17).collect()}
    assert pairs.get((0, 1)) == 0            # star edge
    assert (0, 2) in pairs                   # rep carries the near edge
    # (1, 2) need not appear — component {0,1,2} is already connected


def test_lsh_metrics_do_not_recompute_banding(spark, monkeypatch):
    """VERDICT r2: with_metrics=True must cache the bucket table so that
    consuming pairs AND metrics runs shingling+banding once (the pairs
    plan reads the cache). Distributed-path property (the driver fast
    path has no bucket table to cache)."""
    from harvester_spark.operators import dedup as dd
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)
    same = "import numpy def main return value data result"
    docs = spark.createDataFrame([(i, same) for i in range(8)],
                                 "doc_id long, content string")
    pairs, metrics = minhash_lsh_pairs(docs, max_bucket=100,
                                       with_metrics=True)
    metrics.collect()  # materializes the cached bucket table
    assert "InMemoryTableScan" in pairs._jdf.queryExecution().executedPlan() \
        .toString() or "InMemoryRelation" in pairs._jdf.queryExecution() \
        .toString()
    sp, sm = simhash_near_pairs(docs, chunks=4, with_metrics=True)
    sm.collect()
    assert "InMemoryRelation" in sp._jdf.queryExecution().toString()


def _uf_components(edges):
    """Union-find oracle: node -> min reachable id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def test_connected_components_random_graph(spark):
    import random
    from harvester_spark.operators.dedup import connected_components
    rng = random.Random(11)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_connected_components_deep_chain(spark):
    """A 20-hop path needs ~log-ish rounds of min-label propagation —
    the convergence loop (not a fixed round count) must carry the min
    label end to end."""
    from harvester_spark.operators.dedup import connected_components
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(21)}


def test_connected_components_nonconvergence_raises(spark):
    """A diameter beyond max_iter must FAIL, not return silently wrong
    labels (which would mark several docs keep=True in one component)."""
    import pytest
    from harvester_spark.operators.dedup import connected_components
    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_dedup_keep_decisions(spark):
    from harvester_spark.operators.dedup import dedup_keep_decisions
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)],
                                  "doc_a long, doc_b long")
    rows = {r["doc_id"]: (r["component"], r["keep"])
            for r in dedup_keep_decisions(docs, pairs).collect()}
    assert rows == {0: (0, True), 1: (1, True), 2: (2, True),
                    3: (1, False), 4: (4, True), 5: (1, False),
                    6: (6, True), 7: (6, False)}


def test_simhash_chunk_plan_scales():
    """Blocking must be corpus-size-aware: bigger corpora get more blocking
    bits (the fixed 16-bit scheme collapsed at >1e8 docs)."""
    from harvester_spark.operators.dedup import _simhash_chunk_plan
    from math import comb
    small = _simhash_chunk_plan(3, 10_000, 512)
    huge = _simhash_chunk_plan(3, 10**12, 512)
    assert small == 4            # one 16-bit chunk key is plenty
    assert huge >= 6             # >=30-bit keys at 1e12 docs
    assert comb(huge, 3) <= 64   # table count stays bounded


def test_bucket_drop_warning_fires_without_metrics(spark, monkeypatch):
    """with_metrics=False must still surface max_bucket drops (r3 ADVICE:
    silent recall regression) — the daemon watcher warns after the first
    action over the candidate plan."""
    import time
    import warnings

    from harvester_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)  # watcher path

    docs = spark.createDataFrame(
        [(i, f"the same boilerplate text repeated everywhere tok{i}")
         for i in range(30)],
        "doc_id long, content string")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        simhash_near_pairs(docs, max_bucket=2, n_docs=30).count()
        deadline = time.time() + 20
        while time.time() < deadline:
            if any("simhash_near_pairs: max_bucket=2 dropped"
                   in str(x.message) for x in rec):
                break
            time.sleep(0.25)
    msgs = [str(x.message) for x in rec
            if issubclass(x.category, RuntimeWarning)]
    assert any("simhash_near_pairs: max_bucket=2 dropped" in m for m in msgs)


def test_abandoned_plan_releases_watcher(spark, monkeypatch):
    """r4 ADVICE: a candidate plan that is never executed must not park a
    watcher daemon for the session lifetime — the poller exits at the
    timeout."""
    import threading
    import time

    from harvester_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "_WATCH_TIMEOUT_S", 2.0)
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)  # watcher path
    before = {id(t) for t in threading.enumerate()}
    docs = spark.createDataFrame([(i, f"words tok{i}") for i in range(5)],
                                 "doc_id long, content string")
    dd.simhash_near_pairs(docs, max_bucket=2, n_docs=5)  # plan abandoned
    new = [t for t in threading.enumerate()
           if id(t) not in before and t.name.endswith("bucket-drop-watch")]
    assert new, "watcher thread was not started"
    deadline = time.time() + 15
    while time.time() < deadline and any(t.is_alive() for t in new):
        time.sleep(0.25)
    assert not any(t.is_alive() for t in new), \
        "watcher still parked after the abandoned-plan timeout"


def test_exact_duplicates_bounded_group_payload(spark):
    """A mega-dup group must not materialize an unbounded id list (r3
    verdict: one 10^7-member boilerplate group OOMs its reducer)."""
    from harvester_spark.operators.dedup import (exact_duplicate_members,
                                                 exact_duplicates)

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate payload").alias("content"))
    g = exact_duplicates(docs, sample_cap=64).collect()
    assert len(g) == 1
    row = g[0]
    assert row["n_dups"] == n and row["keep_id"] == 0
    assert len(row["doc_ids"]) == 64 and row["doc_ids"] == list(range(64))
    assert row["sample_truncated"]

    members = exact_duplicate_members(docs)
    assert members.count() == n
    assert members.filter(F.col("doc_id") != F.col("keep_id")).count() == n - 1
    assert members.agg(F.max("keep_id")).first()[0] == 0


def test_shingle_zip_construction_matches_reference(spark):
    """The zip_with-fold shingle construction (r6 optimization) must be
    array-identical to the reference per-position-slice form for every
    n and token-count edge: empty, shorter-than-n, exactly-n, longer,
    duplicate shingles (first-occurrence distinct order)."""
    from pyspark.sql import functions as F

    from harvester_spark.functions.tokenize import tokens_expr
    from harvester_spark.operators.dedup import shingles_from_tokens

    def reference(toks, n):
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        sh = F.transform(idx,
                         lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        return F.when(F.size(toks) == 0,
                      F.array().cast("array<string>")) \
                .otherwise(F.array_distinct(sh))

    docs = spark.createDataFrame(
        [(0, ""), (1, "... !!"), (2, "one"), (3, "one two"),
         (4, "one two three"), (5, "a b c d e f g"),
         (6, "x y x y x y x y"),        # duplicate shingles
         (7, "Mixed CASE tok_7 42 tok_7")],
        "doc_id long, content string")
    for n in (1, 2, 3, 4):
        toks = tokens_expr("content")
        bound = F.transform(F.array(toks),
                            lambda t: F.struct(
                                shingles_from_tokens(t, n).alias("new"),
                                reference(t, n).alias("ref")))[0]
        rows = docs.select(bound.alias("b")).collect()
        for r in rows:
            assert r["b"]["new"] == r["b"]["ref"], (n, r)


def _kernel_parity_docs(spark):
    rows = [(0, ""), (1, None), (2, "one"), (3, "two words"),
            (4, "exactly three tokens"), (5, "a b c d e f g h i j"),
            (6, "dup dup dup dup shingles here dup dup dup dup"),
            (7, "Mixed CASE Tok_7 42 and punct!!! splits??"),
            (8, "the quick brown fox jumps over the lazy dog " * 20),
            (9, "identical content twin A"), (10, "identical content twin A"),
            (11, "unicode tökens stay séparate 中文 here")]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_minhash_kernel_matches_jvm_signatures(spark):
    """r6: the mapInArrow signature kernel must produce VALUE-IDENTICAL
    (doc_id, sig) rows to the JVM explode+aggregate form — bit-exact
    xxhash64 + same Carter-Wegman arithmetic — across every doc edge
    (empty/null/short/duplicate-shingle/unicode)."""
    docs = _kernel_parity_docs(spark)
    for n in (1, 2, 3):
        jvm = {r["doc_id"]: r["sig"] for r in minhash_signatures(
            docs, shingle_n=n, use_kernel=False).collect()}
        ker = {r["doc_id"]: r["sig"] for r in minhash_signatures(
            docs, shingle_n=n, use_kernel=True).collect()}
        assert ker == jvm, f"shingle_n={n}"


def test_minhash_kernel_sha_matches_spark_sha2(spark):
    from pyspark.sql import functions as F

    from harvester_spark.operators.dedup import _minhash_signatures_kernel
    docs = _kernel_parity_docs(spark).filter("content is not null")
    want = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("s")).collect()}
    got = {r["doc_id"]: r["csha"] for r in _minhash_signatures_kernel(
        docs, content_col="content", id_col="doc_id", num_hashes=8,
        shingle_n=3, seed=42, with_sha=True).collect()}
    for d, sha in got.items():  # kernel drops zero-token docs
        assert sha == want[d]


def test_simhash_kernel_matches_jvm(spark):
    """r6: the default-path simhash kernel must emit identical
    (doc_id, simhash) rows to the JVM sign-sum aggregation."""
    from pyspark.sql import functions as F

    docs = _kernel_parity_docs(spark)
    jvm_fp = simhash(docs, hash_expr=lambda c: F.xxhash64(c))  # JVM form
    ker_fp = simhash(docs)                                     # kernel
    jvm = {r["doc_id"]: r["simhash"] for r in jvm_fp.collect()}
    ker = {r["doc_id"]: r["simhash"] for r in ker_fp.collect()}
    assert ker == jvm


# --- r6: driver small-corpus fast path must equal the distributed DAG ---

def _fastpath_docs(spark):
    """Edge-case corpus: exact-dup groups, near dups, zero-token docs,
    nulls, short docs, unicode, shuffled token multisets."""
    base = "import numpy as np def main return value data result for index"
    rows = [(0, base), (1, base), (2, base),                  # dup group
            (3, base + " extra_token_x"),                     # near dup
            (4, base.replace("numpy", "pandas")),             # near dup
            (5, "completely different words about streaming watermark"),
            (6, ""), (7, None), (8, "   !!! ??? "),           # zero-token
            (9, "one"), (10, "two words"),                    # short docs
            (11, "unicode tökens 中文 here stay séparate"),
            (12, "unicode tökens 中文 here stay séparate"),   # dup of 11
            (13, "alpha beta gamma delta epsilon zeta eta theta"),
            (14, "theta eta zeta epsilon delta gamma beta alpha")]
    return spark.createDataFrame(rows, "doc_id long, content string")


def _rows_set(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("kwargs", [
    dict(jaccard_threshold=0.5, with_metrics=True),
    dict(jaccard_threshold=None, with_metrics=True),
    dict(jaccard_threshold=0.3, with_metrics=True, max_bucket=1),
    dict(jaccard_threshold=0.5, with_metrics=False, shingle_n=2),
])
def test_minhash_driver_path_equals_distributed(spark, monkeypatch, kwargs):
    """The small-corpus driver path must produce EXACTLY the rows (incl.
    float-identical jaccard) and metrics of the distributed DAG."""
    from harvester_spark.operators import dedup as dd

    docs = _fastpath_docs(spark)
    got = dd.minhash_lsh_pairs(docs, **kwargs)          # driver path
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)
    want = dd.minhash_lsh_pairs(docs, **kwargs)         # distributed
    if kwargs.get("with_metrics"):
        got, gm = got
        want, wm = want
        assert gm.columns == wm.columns
        assert _rows_set(gm) == _rows_set(wm)
    assert got.columns == want.columns
    assert _rows_set(got) == _rows_set(want)
    assert len(_rows_set(got)) > 0 or kwargs.get("max_bucket") == 1


@pytest.mark.parametrize("kwargs", [
    dict(max_hamming=3, with_metrics=True),
    dict(max_hamming=6, chunks=8, with_metrics=True),
    dict(max_hamming=3, with_metrics=True, max_bucket=1),
    dict(max_hamming=16, chunks=17, with_metrics=False),
])
def test_simhash_driver_path_equals_distributed(spark, monkeypatch, kwargs):
    from harvester_spark.operators import dedup as dd

    docs = _fastpath_docs(spark)
    got = dd.simhash_near_pairs(docs, **kwargs)         # driver path
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 0)
    want = dd.simhash_near_pairs(docs, **kwargs)        # distributed
    if kwargs.get("with_metrics"):
        got, gm = got
        want, wm = want
        assert gm.columns == wm.columns
        assert _rows_set(gm) == _rows_set(wm)
    assert got.columns == want.columns
    assert _rows_set(got) == _rows_set(want)


def test_driver_path_warns_on_drops(spark):
    """The driver fast path must keep the never-silent-drops contract."""
    import warnings

    docs = _permuted_docs(spark, 30)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        minhash_lsh_pairs(docs, max_bucket=4, shingle_n=1).count()
    assert any("minhash_lsh_pairs: max_bucket=4 dropped" in str(x.message)
               for x in rec if issubclass(x.category, RuntimeWarning))


def test_driver_path_respects_byte_budget(spark, monkeypatch):
    """Corpora over the byte budget must fall back to the distributed
    path (the probe job reads at most cap+1 rows first)."""
    from harvester_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_BYTES", 10)
    docs = _fastpath_docs(spark)
    small = dd._collect_small_docs(docs, "content", "doc_id")
    assert small is None
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_DOCS", 5)
    monkeypatch.setattr(dd, "_DRIVER_PAIRS_MAX_BYTES", 1 << 30)
    assert dd._collect_small_docs(docs, "content", "doc_id") is None


def test_unique_table_kernels_match_direct_form():
    """r6: the adaptive unique-value table paths of _minhash_sig_matrix /
    _simhash_fingerprints must be bit-identical to the direct per-element
    arithmetic (int32/int16 narrowing is exact: values < 2^31 / counts)."""
    from harvester_spark.operators.dedup_kernels import (
        MERSENNE_P, _minhash_sig_matrix, _simhash_fingerprints)
    from harvester_spark.operators.dedup import _perm_params

    rng = np.random.default_rng(3)
    # few uniques over many rows → table path triggers (uq <= N/4)
    uq_pool = rng.integers(0, MERSENNE_P, size=200, dtype=np.int64)
    h = uq_pool[rng.integers(0, 200, size=20_000)]
    starts = np.sort(rng.choice(np.arange(1, 20_000), 999, replace=False))
    starts = np.concatenate(([0], starts))
    a, b = _perm_params(64, 42)
    a = np.asarray(a); b = np.asarray(b)
    got = _minhash_sig_matrix(h, starts, a, b)
    want = np.empty_like(got)
    for i in range(64):
        v = (h * a[i] + b[i]) % MERSENNE_P
        want[:, i] = np.minimum.reduceat(v, starts)
    assert np.array_equal(got, want)

    hu = rng.integers(0, 1 << 64, size=20_000, dtype=np.uint64)
    hu = np.sort(hu)[rng.integers(0, 150, size=20_000)]  # few uniques
    n_occ = np.diff(np.append(starts, 20_000)).astype(np.uint64)
    got_fp = _simhash_fingerprints(hu, starts, n_occ)
    want_fp = np.zeros(starts.size, dtype=np.uint64)
    for bit in range(64):
        ones = np.add.reduceat(
            ((hu >> np.uint64(bit)) & np.uint64(1)).astype(np.int64),
            starts).astype(np.uint64)
        want_fp |= np.where(ones * np.uint64(2) > n_occ,
                            np.uint64(1) << np.uint64(bit), np.uint64(0))
    assert np.array_equal(got_fp, want_fp)
