import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from harvester_spark import tables
from harvester_spark.fixtures.oracle import OracleBM25
from harvester_spark.functions.tokenize import tokenize_pandas
from harvester_spark.operators.codec import decode_doc_ids, varint_decode


def _corpus_with_ids(corpus_df):
    return (corpus_df.select("doc_id", "content").toPandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_doc_ids_dense_and_ordered(corpus_df, corpus_pdf):
    pdf = corpus_df.select("doc_id", "repo", "path", "commit").toPandas()
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    assert (pdf["doc_id"].to_numpy() == np.arange(len(pdf))).all()
    assert len(pdf) == len(corpus_pdf)


def test_content_sha256(corpus_df):
    import hashlib
    pdf = corpus_df.select("content", "content_sha256").limit(20).toPandas()
    for c, h in zip(pdf["content"], pdf["content_sha256"]):
        assert hashlib.sha256(c.encode()).hexdigest() == h


def test_verify_content_sha256_on_query_results(spark, index_dir,
                                                corpus_df):
    """North-rule invariant: every query-result row's content sha256
    verifies against the source table; tampering is detected."""
    from harvester_spark.operators.bm25 import query_topk_index
    from harvester_spark.operators.docids import verify_content_sha256
    res = query_topk_index(spark, index_dir, "import def", 10)
    rep = verify_content_sha256(res, corpus_df)
    assert rep == {"n_rows": 10, "n_matched": 10, "missing": 0, "ok": True}
    # tamper one stored hash -> flagged
    bad = corpus_df.withColumn(
        "content_sha256",
        F.when(F.col("doc_id") == res.collect()[0]["doc_id"],
               F.lit("deadbeef")).otherwise(F.col("content_sha256")))
    rep2 = verify_content_sha256(res, bad)
    assert rep2["n_matched"] == 9 and not rep2["ok"]
    # result id absent from source -> missing counted
    ghost = res.unionByName(
        spark.createDataFrame([(10**12, 0.0)], "doc_id long, score double"))
    rep3 = verify_content_sha256(ghost, corpus_df)
    assert rep3["missing"] == 1 and not rep3["ok"]


def test_stats_match_oracle(spark, index_dir, corpus_df):
    local = _corpus_with_ids(corpus_df)
    oracle = OracleBM25(local, content_col="content")
    meta = tables.read_meta(index_dir / "stats")
    assert meta["N"] == oracle.N
    assert abs(meta["avgdl"] - oracle.avgdl) < 1e-9


def test_dictionary_matches_oracle(spark, index_dir, corpus_df):
    local = _corpus_with_ids(corpus_df)
    oracle = OracleBM25(local, content_col="content")
    dic = tables.read_table(spark, index_dir / "dictionary").toPandas()
    assert len(dic) == len(oracle.postings)
    for r in dic.sample(min(100, len(dic)), random_state=0).itertuples():
        pos, tf = oracle.postings[r.term]
        assert r.df == len(pos), r.term
        assert r.cf == tf.sum(), r.term
        assert abs(r.idf - oracle.idf(r.term)) < 1e-12


def test_postings_decode_to_exact_tf(spark, index_dir, corpus_df):
    """Decode every block and compare (doc_id, tf, dl) with a recomputation."""
    local = _corpus_with_ids(corpus_df)
    toks = tokenize_pandas(local["content"])
    dl_by_doc = dict(zip(local["doc_id"], toks.map(len)))
    ex = toks.explode().dropna()
    doc_of_pos = local["doc_id"].to_numpy()
    truth = {}
    tf = ex.groupby([ex.index, ex]).size()
    for (pos, term), cnt in tf.items():
        truth.setdefault(term, {})[int(doc_of_pos[pos])] = int(cnt)

    post = tables.read_table(spark, index_dir / "postings").toPandas()
    got: dict[str, dict[int, int]] = {}
    for r in post.itertuples():
        ids = decode_doc_ids(r.doc_id_first, bytes(r.deltas), r.doc_count)
        tfs = varint_decode(bytes(r.tfs))
        dls = varint_decode(bytes(r.dls))
        assert ids[-1] == r.doc_id_last
        assert tfs.max(initial=0) == r.max_tf
        # sorted unique within block
        assert (np.diff(ids) > 0).all()
        for d, t, l in zip(ids, tfs, dls):
            got.setdefault(r.term, {})[int(d)] = int(t)
            assert dl_by_doc[int(d)] == int(l)
    assert got == truth


def test_salting_applied(spark, index_dir):
    """Hot terms must be salted (merge work spread over several tasks);
    within each salt, blocks are sorted and internally disjoint."""
    post = tables.read_table(spark, index_dir / "postings").toPandas()
    hot = post[post["term"] == "import"]
    assert hot["salt"].nunique() > 1, "expected 'import' to be salted"
    for _, grp in hot.groupby("salt"):
        g = grp.sort_values("block_id")
        los = g["doc_id_first"].to_numpy()
        his = g["doc_id_last"].to_numpy()
        assert (los[1:] > his[:-1]).all(), "blocks within a salt must be disjoint"
    # no duplicate doc within the term across salts
    ids = []
    from harvester_spark.operators.codec import decode_doc_ids
    for r in hot.itertuples():
        ids.extend(decode_doc_ids(r.doc_id_first, bytes(r.deltas),
                                  r.doc_count))
    assert len(ids) == len(set(ids))


def test_block_max_invariant(spark, index_dir):
    """block_max_tfnorm >= every member's tfnorm (recomputed)."""
    meta = tables.read_meta(index_dir / "postings")
    k1, b, avgdl = meta["k1"], meta["b"], meta["avgdl"]
    post = tables.read_table(spark, index_dir / "postings").toPandas()
    for r in post.sample(min(200, len(post)), random_state=1).itertuples():
        tfs = varint_decode(bytes(r.tfs)).astype(float)
        dls = varint_decode(bytes(r.dls)).astype(float)
        tfn = tfs * (k1 + 1) / (tfs + k1 * (1 - b + b * dls / avgdl))
        assert r.block_max_tfnorm >= tfn.max() - 1e-12
        assert abs(r.block_max_tfnorm - tfn.max()) < 1e-9


def test_build_is_resumable(spark, corpus_df, tmp_path):
    """Kill-and-restart: stages already committed are skipped; output equal."""
    from harvester_spark.operators.index_build import IndexConfig, build_index
    cfg = IndexConfig(salt_df_threshold=50, salt_range_docs=100, block_size=32)
    d = tmp_path / "idx"
    r1 = build_index(spark, corpus_df, d, cfg=cfg)
    assert not any(s.get("skipped") for s in r1.stages)
    # simulate a crash during the postings stage: it and all later stages
    # never committed
    import shutil
    shutil.rmtree(d / "postings")
    shutil.rmtree(d / "term_ub")
    shutil.rmtree(d / "lineage")
    r2 = build_index(spark, corpus_df, d, cfg=cfg)
    skipped = {s["stage"] for s in r2.stages if s.get("skipped")}
    # dictseg survived the simulated crash too; every stage is a
    # deterministic function of committed upstream stages, so resuming
    # with it already committed is correct
    assert skipped == {"packed", "stats", "dictionary", "dictseg"}
    lin = tables.read_table(spark, d / "lineage").toPandas()
    assert lin["postings"].sum() > 0
    assert (lin["status"] == "complete").all()


def test_sharded_merge_resume(spark, corpus_df, tmp_path):
    """Term-shard-group resume: kill after one group → restart completes
    only the missing groups; final index identical to single-shot."""
    import shutil
    from harvester_spark.operators.index_build import IndexConfig, build_index
    cfg = IndexConfig(salt_df_threshold=50, salt_range_docs=100,
                      block_size=32, postings_shard_groups=3)
    d = tmp_path / "sharded"
    build_index(spark, corpus_df, d, cfg=cfg)
    # simulate crash mid-merge: drop group 1 + everything after
    shutil.rmtree(d / "postings_parts" / "group=1")
    shutil.rmtree(d / "postings")
    shutil.rmtree(d / "term_ub")
    shutil.rmtree(d / "lineage")
    r = build_index(spark, corpus_df, d, cfg=cfg)
    done = {s["stage"]: s for s in r.stages}
    assert done["postings.group0"].get("skipped")
    assert done["postings.group2"].get("skipped")
    assert "seconds" in done["postings.group1"]

    # identical decoded content vs an unsharded build
    d2 = tmp_path / "singleshot"
    build_index(spark, corpus_df, d2,
                cfg=IndexConfig(salt_df_threshold=50, salt_range_docs=100,
                                block_size=32, postings_shard_groups=1))

    def decoded(p):
        post = tables.read_table(spark, p / "postings").toPandas()
        out = {}
        for r_ in post.itertuples():
            ids = decode_doc_ids(r_.doc_id_first, bytes(r_.deltas),
                                 r_.doc_count)
            tfs = varint_decode(bytes(r_.tfs))
            for i, t in zip(ids, tfs):
                out.setdefault(r_.term, {})[int(i)] = int(t)
        return out

    assert decoded(d) == decoded(d2)


def test_salted_equals_unsalted(spark, corpus_df, tmp_path):
    """Byte-level invariant: postings content identical with/without salting
    after normalizing block boundaries (decode-and-compare)."""
    from harvester_spark.operators.index_build import IndexConfig, build_index
    d1, d2 = tmp_path / "salted", tmp_path / "unsalted"
    build_index(spark, corpus_df, d1,
                cfg=IndexConfig(salt_df_threshold=50, salt_range_docs=64,
                                block_size=32))
    build_index(spark, corpus_df, d2,
                cfg=IndexConfig(salt_df_threshold=10**9, block_size=32))

    def decoded(d):
        post = tables.read_table(spark, d / "postings").toPandas()
        out = {}
        for r in post.itertuples():
            ids = decode_doc_ids(r.doc_id_first, bytes(r.deltas), r.doc_count)
            tfs = varint_decode(bytes(r.tfs))
            for i, t in zip(ids, tfs):
                out.setdefault(r.term, {})[int(i)] = int(t)
        return out

    assert decoded(d1) == decoded(d2)


def test_empty_corpus_build_and_query(spark, tmp_path):
    """A zero-doc build commits cleanly (N=0, no div-by-zero) and queries
    return empty instead of erroring."""
    from harvester_spark.operators.bm25 import query_topk_index
    from harvester_spark.operators.index_build import (IndexConfig,
                                                       build_index)
    empty = spark.createDataFrame([], "doc_id long, content string")
    d = tmp_path / "empty_idx"
    rep = build_index(spark, empty, d, cfg=IndexConfig(salt_df_threshold=10**9))
    assert rep.n_docs == 0 and rep.avgdl == 0.0
    assert query_topk_index(spark, d, "anything", 5).collect() == []


def test_unicode_content_build(spark, tmp_path):
    """Non-ASCII content flows through build+query; the documented
    tokenizer ([a-z0-9_] runs) keeps only ASCII-word tokens — identical
    in all three engines by definition."""
    from harvester_spark.operators.bm25 import query_topk_index
    from harvester_spark.operators.index_build import (IndexConfig,
                                                       build_index)
    uni = spark.createDataFrame(
        [(0, "héllo wörld naïve café"), (1, "日本語のテキスト 漢字"),
         (2, "emoji 🎉 test_underscore mixed123"), (3, "ПРИВЕТ мир")],
        "doc_id long, content string")
    d = tmp_path / "uni_idx"
    rep = build_index(spark, uni, d, cfg=IndexConfig(salt_df_threshold=10**9))
    assert rep.n_docs == 4
    got = [r["doc_id"] for r in
           query_topk_index(spark, d, "test_underscore", 5).collect()]
    assert got == [2]
