"""Rank-identity: both Spark scorer paths vs the exhaustive numpy oracle
across the full reference query set (FIXTURES.md §2)."""

import numpy as np
import pytest

from harvester_spark.fixtures.corpus import QUERY_SET
from harvester_spark.fixtures.oracle import OracleBM25
from harvester_spark.operators.bm25 import (query_topk_dataframe,
                                            query_topk_index, tokenize_query)


@pytest.fixture(scope="module")
def oracle(corpus_df):
    local = corpus_df.select("doc_id", "content").toPandas()
    return OracleBM25(local, content_col="content")


def assert_rank_identical(got, want, label=""):
    assert list(got["doc_id"]) == list(want["doc_id"]), label
    if len(want):
        np.testing.assert_allclose(got["score"].to_numpy(),
                                   want["score"].to_numpy(),
                                   rtol=1e-6, err_msg=label)


@pytest.mark.parametrize("query,k", QUERY_SET)
def test_dataframe_scorer_rank_identity(corpus_df, oracle, query, k):
    got = query_topk_dataframe(corpus_df, query, k).toPandas()
    want = oracle.topk(tokenize_query(query), k)
    assert_rank_identical(got, want, f"df-scorer {query!r}")


@pytest.mark.parametrize("query,k", QUERY_SET)
def test_index_scorer_rank_identity(spark, index_dir, oracle, query, k):
    # default path (driver fast path at this corpus size)
    got = query_topk_index(spark, index_dir, query, k).toPandas()
    want = oracle.topk(tokenize_query(query), k)
    assert_rank_identical(got, want, f"index-scorer {query!r}")
    # distributed path must be rank-identical too
    got_d = query_topk_index(spark, index_dir, query, k,
                             small_query_postings=0).toPandas()
    assert_rank_identical(got_d, want, f"index-scorer-dist {query!r}")


@pytest.mark.parametrize("query,k", QUERY_SET)
def test_index_scorer_pruning_equals_exhaustive(spark, index_dir, query, k):
    # small_query_postings=0 forces the DISTRIBUTED decode+prune path
    # (the tiny test corpus would otherwise take the driver fast path)
    pruned = query_topk_index(spark, index_dir, query, k, prune=True,
                              prune_min_postings=0,
                              small_query_postings=0).toPandas()
    full = query_topk_index(spark, index_dir, query, k, prune=False,
                            small_query_postings=0).toPandas()
    assert list(pruned["doc_id"]) == list(full["doc_id"])
    np.testing.assert_allclose(pruned["score"], full["score"], rtol=0)


@pytest.mark.parametrize("query,k", QUERY_SET)
def test_local_serving_rank_identity(spark, index_dir, oracle, query, k):
    """Driver-side serving path must match the oracle exactly too."""
    from harvester_spark.operators.bm25 import open_index
    if not hasattr(test_local_serving_rank_identity, "_handle"):
        test_local_serving_rank_identity._handle = open_index(spark, index_dir)
    h = test_local_serving_rank_identity._handle
    got = h.topk_local(query, k)
    want = oracle.topk(tokenize_query(query), k)
    assert_rank_identical(got, want, f"local-serving {query!r}")


def test_local_serving_is_fast_when_warm(spark, index_dir):
    import time
    from harvester_spark.operators.bm25 import open_index
    h = open_index(spark, index_dir)
    h.topk_local("import def", 10)  # cold: collects term postings
    t0 = time.time()
    for _ in range(20):
        h.topk_local("import def", 10)
    per_query = (time.time() - t0) / 20
    assert per_query < 0.05, f"warm local serving took {per_query:.3f}s"


def test_and_mode(spark, corpus_df, index_dir, oracle):
    q, k = "import ident_3", 10
    want = oracle.topk(tokenize_query(q), k, mode="and")
    got_df = query_topk_dataframe(corpus_df, q, k, mode="and").toPandas()
    got_ix = query_topk_index(spark, index_dir, q, k, mode="and").toPandas()
    assert_rank_identical(got_df, want, "and df")
    assert_rank_identical(got_ix, want, "and index")


@pytest.mark.parametrize("q", ["import ident_3", "def class return",
                               "self import", "value data result"])
def test_and_mode_conjunctive_pruning_exact(spark, index_dir, oracle, q):
    """Rarest-term range pruning must stay exact (membership + scores)."""
    want = oracle.topk(tokenize_query(q), 20, mode="and")
    pruned = query_topk_index(spark, index_dir, q, 20, mode="and",
                              prune=True, prune_min_postings=0,
                              small_query_postings=0).toPandas()
    full = query_topk_index(spark, index_dir, q, 20, mode="and",
                            prune=False, small_query_postings=0).toPandas()
    assert_rank_identical(pruned, want, f"and-pruned {q!r}")
    assert list(pruned["doc_id"]) == list(full["doc_id"])


def test_and_mode_absent_term_empty(spark, corpus_df, index_dir):
    q = "import zzz_absent_term"
    assert query_topk_dataframe(corpus_df, q, 5, mode="and").count() == 0
    assert query_topk_index(spark, index_dir, q, 5, mode="and").count() == 0


def test_tie_break_doc_id_asc(oracle):
    # duplicate docs exist in synthetic corpora rarely; enforce the rule on
    # the oracle itself: equal scores must be ordered by doc_id
    res = oracle.topk(["import"], 100)
    s = res["score"].to_numpy()
    d = res["doc_id"].to_numpy()
    for i in range(len(res) - 1):
        if s[i] == s[i + 1]:
            assert d[i] < d[i + 1]


@pytest.mark.parametrize("q,k", QUERY_SET)
@pytest.mark.parametrize("mode", ["or", "and"])
def test_theta_refinement_rank_identity(spark, index_dir, oracle, q, k,
                                        mode):
    """Decode-time θ refinement (distributed probe + cached reuse) must
    stay rank-identical across the whole query set, at aggressive and
    conservative probe fractions."""
    terms = tokenize_query(q)
    if mode == "and" and len(terms) < 2:
        pytest.skip("AND needs 2+ terms")
    want = oracle.topk(terms, k, mode=mode)
    for frac in (0.05, 0.3, 0.9):
        got = query_topk_index(spark, index_dir, q, k, mode=mode,
                               prune=True, prune_min_postings=0,
                               small_query_postings=0,
                               refine_theta=True, probe_frac=frac,
                               refine_min_postings=0,
                               range_docs=64).toPandas()
        assert_rank_identical(got, want, f"refine {mode} {q!r} frac={frac}")


def test_theta_refinement_with_exclusions(spark, index_dir, oracle):
    """Refined θ must also be seeded from non-excluded docs only."""
    q, mode = "import def", "or"
    want_all = oracle.topk(tokenize_query(q), 50, mode=mode)
    excl = [int(x) for x in want_all["doc_id"].iloc[:3]]
    want = want_all[~want_all["doc_id"].isin(excl)].head(10)
    excl_df = spark.createDataFrame([(i,) for i in excl], "doc_id long")
    got = query_topk_index(spark, index_dir, q, 10, mode=mode, prune=True,
                           prune_min_postings=0, small_query_postings=0,
                           refine_theta=True, probe_frac=0.3,
                           refine_min_postings=0,
                           exclude_ids=excl_df).toPandas()
    assert_rank_identical(got, want.reset_index(drop=True),
                          "refine+exclude")


@pytest.mark.parametrize("q,mode", [("import", "or"),
                                    ("import def", "or"),
                                    ("def class return", "and"),
                                    ("self import", "and")])
def test_exclude_ids_with_pruning_exact(spark, index_dir, oracle, q, mode):
    """ADVICE r2 (medium): excluding the CURRENT top docs while pruning is
    engaged must not lose live docs — θ must be seeded from non-excluded
    docs only. Excluded = the true top-3 (the exact docs whose scores
    would overshoot θ)."""
    want_all = oracle.topk(tokenize_query(q), 50, mode=mode)
    excl = [int(x) for x in want_all["doc_id"].iloc[:3]]
    want = want_all[~want_all["doc_id"].isin(excl)].head(10)
    excl_df = spark.createDataFrame([(i,) for i in excl], "doc_id long")
    pruned = query_topk_index(spark, index_dir, q, 10, mode=mode,
                              prune=True, prune_min_postings=0,
                              small_query_postings=0,
                              exclude_ids=excl_df).toPandas()
    full = query_topk_index(spark, index_dir, q, 10, mode=mode, prune=False,
                            small_query_postings=0,
                            exclude_ids=excl_df).toPandas()
    assert_rank_identical(pruned, want.reset_index(drop=True),
                          f"exclude+prune {mode} {q!r}")
    assert list(pruned["doc_id"]) == list(full["doc_id"])
    # driver fast path honors exclusions too
    fast = query_topk_index(spark, index_dir, q, 10, mode=mode,
                            exclude_ids=excl_df).toPandas()
    assert list(fast["doc_id"]) == list(want["doc_id"])


@pytest.mark.parametrize("q,mode", [("import ident_3", "or"),
                                    ("def class return", "or"),
                                    ("def class return", "and"),
                                    ("value data result", "and"),
                                    ("self import", "and")])
def test_range_localized_pruning_exact(spark, index_dir, oracle, q, mode):
    """Range-localized UBs (small ranges force many cells + the multi-range
    fallback) and the AND θ path (small k so a seed θ is established) must
    stay exact, with real block skipping reported via metrics_out."""
    m: dict = {}
    pruned = query_topk_index(spark, index_dir, q, 3, mode=mode, prune=True,
                              prune_min_postings=0, range_docs=64,
                              metrics_out=m).toPandas()
    want = oracle.topk(tokenize_query(q), 3, mode=mode)
    assert_rank_identical(pruned, want, f"localized {mode} {q!r}")
    assert 0 < m["blocks_scored"] <= m["blocks_total"]
    assert 0.0 <= m["block_skip_ratio"] < 1.0


def test_local_serving_hot_term_auto_fallback(spark, index_dir, oracle):
    """A query whose uncached postings exceed local_postings_cap must route
    to the distributed path WITHOUT collecting postings driver-side (r3
    verdict: topk_local on a 10^12-doc index would collect GBs)."""
    from harvester_spark.operators.bm25 import open_index

    h = open_index(spark, index_dir)
    q, k = "import def", 10

    def _no_collect(term):
        raise AssertionError("hot-term query collected postings driver-side")

    h._term_postings = _no_collect
    got = h.topk_local(q, k, local_postings_cap=0)  # every term is "hot"
    want = oracle.topk(tokenize_query(q), k)
    assert_rank_identical(got, want, "auto-fallback")

    # warm cache path still honored: cached terms don't count toward cap
    h2 = open_index(spark, index_dir)
    h2.topk_local(q, k)  # populates the term cache
    h2._orig = h2._term_postings
    calls = []

    def _spy(term):
        calls.append(term)
        return h2._orig(term)

    h2._term_postings = _spy
    got2 = h2.topk_local(q, k, local_postings_cap=0)
    assert_rank_identical(got2, want, "warm-cache-under-cap")


def test_term_cache_lru_bounded(spark, index_dir, oracle):
    """r4 verdict #4: a long-lived serving node querying a wide vocabulary
    must keep resident decoded postings BOUNDED (entries-capped LRU, the
    dictseg block-cache pattern) — and stay rank-identical after
    evictions."""
    from harvester_spark.operators.bm25 import open_index, tokenize_query

    h = open_index(spark, index_dir)
    h.term_cache_max_entries = 200  # tiny budget: forces constant eviction
    vocab = [r["term"] for r in
             h.dictionary.select("term").limit(40).collect()]
    for t in vocab:  # serving loop over > cap distinct terms
        h._term_postings(t)
        # accounting charges max(len, 64) per term (r5 ADVICE: empty/rare
        # postings still cost a cache slot + three array objects, so they
        # must count toward eviction pressure)
        charged = sum(max(len(v[0]), 64) for v in h._term_cache.values())
        assert charged == h._term_cache_entries
        # bound: budget + the one just-decoded term (never evicted)
        widest = max(max(len(v[0]), 64) for v in h._term_cache.values())
        assert charged <= 200 + widest
    assert len(h._term_cache) < len(vocab)  # evictions actually happened
    # rank-identity survives eviction/re-decode churn
    q, k = "import def", 10
    got = h.topk_local(q, k)
    want = oracle.topk(tokenize_query(q), k)
    assert_rank_identical(got, want, "lru-churn")
    # LRU order: re-touching a term moves it to the hot end
    t0 = next(iter(h._term_cache))
    h._term_postings(t0)
    assert next(reversed(h._term_cache)) == t0


def test_pruning_metrics_deterministic_across_runs(spark, index_dir):
    """r3 ADVICE: the theta-seed cap used .limit() on an unordered
    semi-join, making skip ratios vary run-to-run. The cap now takes the
    highest-UB blocks deterministically — identical metrics on repeat."""
    for q, mode in (("import def", "and"), ("import ident_3", "or")):
        runs = []
        for _ in range(2):
            m = {}
            rows = query_topk_index(spark, index_dir, q, 10, mode=mode,
                                    prune_min_postings=0,
                                    small_query_postings=0,
                                    refine_min_postings=0,
                                    range_docs=2048,
                                    metrics_out=m).collect()
            runs.append((m.get("blocks_scored"), m.get("blocks_total"),
                         [(r.doc_id, round(r.score, 9)) for r in rows]))
        assert runs[0] == runs[1], (q, mode, runs)
