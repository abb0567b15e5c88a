"""CDC / incremental-index semantics (solr_updater.main analogue)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvester_spark.fixtures.corpus import make_corpus
from harvester_spark.fixtures.oracle import OracleBM25
from harvester_spark.operators.bm25 import tokenize_query
from harvester_spark.operators.docids import assign_doc_ids
from harvester_spark.operators.index_build import IndexConfig
from harvester_spark.streaming import incremental as inc

CFG = IndexConfig(salt_df_threshold=10**9, block_size=32)


@pytest.fixture(scope="module")
def base_docs(spark):
    pdf = make_corpus(150, seed=42)
    df = assign_doc_ids(spark.createDataFrame(pdf), num_partitions=4).cache()
    df.count()
    return df


def test_cdc_upsert_delete_and_compact(spark, base_docs, tmp_path):
    root = tmp_path / "root"
    inc.init_root(spark, base_docs, root, cfg=CFG)
    assert inc.last_seq(root) == 0

    # batch 1: delete docs 0-4, upsert doc 5 with new content, add new doc 900
    new5 = "zz_new_token zz_new_token import def"
    changes1 = spark.createDataFrame(
        [(i, True, None) for i in range(5)]
        + [(5, False, new5), (900, False, "zz_new_token fresh doc value")],
        "doc_id long, deleted boolean, content string")
    inc.apply_changes(spark, root, changes1, seq=1, cfg=CFG)
    assert inc.last_seq(root) == 1

    res = inc.query_topk_incremental(spark, root, "zz_new_token", 10).toPandas()
    assert set(res["doc_id"]) == {5, 900}

    # deleted docs never returned
    res2 = inc.query_topk_incremental(spark, root, "import", 200).toPandas()
    assert not (set(res2["doc_id"]) & set(range(5)))
    # old version of doc 5 is gone: its old rare idents don't return doc 5
    # (query a token only in the old content)
    old5 = base_docs.filter(F.col("doc_id") == 5).first()["content"].split()
    rare_old = next(t for t in old5 if t.startswith("ident_"))
    res3 = inc.query_topk_incremental(spark, root, rare_old, 200).toPandas()
    assert 5 not in set(res3["doc_id"])

    # idempotency: re-applying seq=1 is a no-op
    inc.apply_changes(spark, root, changes1, seq=1, cfg=CFG)
    assert inc.last_seq(root) == 1

    # compact → rank-identical to oracle over the live doc set
    live_pdf = base_docs.select("doc_id", "content").toPandas()
    live_pdf = live_pdf[~live_pdf["doc_id"].isin(range(5))]
    live_pdf = live_pdf[live_pdf["doc_id"] != 5]
    live_pdf = pd.concat([live_pdf, pd.DataFrame(
        {"doc_id": [5, 900], "content": [new5, "zz_new_token fresh doc value"]})],
        ignore_index=True)
    live_df = spark.createDataFrame(live_pdf)
    inc.compact(spark, root, live_df, cfg=CFG)

    oracle = OracleBM25(live_pdf, content_col="content")
    for q in ["import", "zz_new_token", "def class"]:
        got = inc.query_topk_incremental(spark, root, q, 10).toPandas()
        want = oracle.topk(tokenize_query(q), 10)
        assert list(got["doc_id"]) == list(want["doc_id"]), q
        if len(want):
            import numpy as np
            np.testing.assert_allclose(got["score"], want["score"], rtol=1e-6)


def test_stream_apply_changes_end_to_end(spark, base_docs, tmp_path):
    """foreachBatch CDC: a real file-source stream of change batches
    drives the delta-index store; checkpoint restart replays nothing
    (exactly-once via the last_seq idempotency gate)."""
    root = tmp_path / "sroot"
    inc.init_root(spark, base_docs, root, cfg=CFG)
    src = tmp_path / "changes_src"
    ckpt = tmp_path / "ckpt"
    schema = "doc_id long, deleted boolean, content string"
    # one parquet file per micro-batch, written through Spark
    spark.createDataFrame(
        [(0, True, None), (901, False, "zz_stream_token alpha value")],
        schema).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(901, False, "zz_stream_token beta value"), (1, True, None)],
        schema).coalesce(1).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = inc.stream_apply_changes(spark, root, stream, checkpoint_dir=ckpt,
                                 cfg=CFG)
    q.awaitTermination(120)
    assert inc.last_seq(root) >= 2
    res = inc.query_topk_incremental(spark, root, "zz_stream_token",
                                     10).toPandas()
    assert set(res["doc_id"]) == {901}
    deleted = inc.query_topk_incremental(spark, root, "import",
                                         300).toPandas()
    assert not ({0, 1} & set(deleted["doc_id"]))

    # restart on the same checkpoint: nothing replays, state unchanged
    seq_before = inc.last_seq(root)
    n_deltas = len(list(root.glob("delta_*")))
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q2 = inc.stream_apply_changes(spark, root, stream2,
                                  checkpoint_dir=ckpt, cfg=CFG)
    q2.awaitTermination(120)
    assert inc.last_seq(root) == seq_before
    assert len(list(root.glob("delta_*"))) == n_deltas


def test_streaming_windowed_counts(spark, tmp_path):
    """Drive windowed_event_counts through an actual micro-batch stream."""
    import datetime as dt
    events = [(i, dt.datetime(2024, 1, 1, h, 30), "click", 1.0)
              for i, h in enumerate([0, 0, 1, 1, 1, 2])]
    src_dir = tmp_path / "stream_src"
    # write the source through Spark so parquet carries Spark timestamps
    (spark.createDataFrame(events,
                           "event_id long, ts timestamp, event_type string, "
                           "value double")
     .coalesce(1).write.mode("overwrite").parquet(str(src_dir)))

    from harvester_spark.streaming.incremental import windowed_event_counts
    stream = (spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double")
        .parquet(str(src_dir)))
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    # complete mode: a single availableNow batch never advances the
    # watermark far enough for append-mode emission; complete shows all
    # windows while the watermark plumbing still runs in the plan
    q = (out.writeStream.format("memory").queryName("wincounts")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    res = spark.sql("select * from wincounts").toPandas()
    got = {(r.window_start.hour, r.event_type): r.n for r in res.itertuples()}
    assert got.get((0, "click")) == 2
    assert got.get((1, "click")) == 3
    assert got.get((2, "click")) == 1


def test_tombstone_filter_before_topk(spark, base_docs, tmp_path):
    """Regression: a doc tombstoned out of a segment's raw top-k must not
    shadow live docs ranked behind it (the anti-join runs BEFORE the
    per-segment limit, not after)."""
    root = tmp_path / "root_adv"
    inc.init_root(spark, base_docs, root, cfg=CFG)

    # the base segment's top-3 for a common query
    top3 = inc.query_topk_incremental(spark, root, "import", 3).toPandas()
    assert len(top3) == 3
    victim = int(top3["doc_id"].iloc[0])

    changes = spark.createDataFrame([(victim, True, None)],
                                    "doc_id long, deleted boolean, content string")
    inc.apply_changes(spark, root, changes, seq=1, cfg=CFG)

    got = inc.query_topk_incremental(spark, root, "import", 3).toPandas()
    # still k rows (live docs promoted into the window), victim gone
    assert len(got) == 3
    assert victim not in set(got["doc_id"])
    # rank-identical to an oracle over the live docs
    live = base_docs.filter(F.col("doc_id") != victim) \
                    .select("doc_id", "content").toPandas()
    oracle = OracleBM25(live, content_col="content")
    want = oracle.topk(tokenize_query("import"), 3)
    assert list(got["doc_id"]) == list(want["doc_id"])


def test_tombstone_segments_survive_partial_batch(spark, base_docs, tmp_path):
    """Crash-safety: earlier tombstone segments are append-only commits — a
    batch that dies before advancing last_seq can never resurrect
    previously-deleted docs when re-applied."""
    root = tmp_path / "root_crash"
    inc.init_root(spark, base_docs, root, cfg=CFG)

    del_a = spark.createDataFrame([(1, True, None)],
                                  "doc_id long, deleted boolean, content string")
    inc.apply_changes(spark, root, del_a, seq=1, cfg=CFG)
    assert inc.last_seq(root) == 1

    # simulate a crash mid-batch-2: tombstone segment written, last_seq NOT
    # advanced (the exact window where the old swap-rename lost the table)
    from harvester_spark import tables
    del_b = spark.createDataFrame([(2, True, None)],
                                  "doc_id long, deleted boolean, content string")
    tables.write_table(
        del_b.select(F.col("doc_id").cast("long").alias("doc_id")),
        root / "tombstones" / "seq=00000002")
    assert inc.last_seq(root) == 1

    # re-apply batch 2 (at-least-once delivery)
    inc.apply_changes(spark, root, del_b, seq=2, cfg=CFG)
    assert inc.last_seq(root) == 2
    res = inc.query_topk_incremental(spark, root, "import", 500).toPandas()
    assert not ({1, 2} & set(res["doc_id"]))


def test_merge_deltas_rank_identical_to_fresh_build(spark, base_docs, tmp_path):
    """Size-tiered delta merge: N delta segments fold into one WITHOUT
    content; querying the merged segment is rank-identical to a fresh
    index built over the same live docs, and incremental queries stay
    correct afterward."""
    from harvester_spark.operators.bm25 import query_topk_index

    root = tmp_path / "root_merge"
    inc.init_root(spark, base_docs, root, cfg=CFG)

    batches = [
        [(300, False, "zz_m import def alpha"), (301, False, "zz_m beta")],
        [(302, False, "zz_m gamma import"), (0, True, None)],
        [(301, False, "zz_m beta UPDATED import"), (303, False, "delta zz_m")],
    ]
    for i, rows in enumerate(batches, start=1):
        ch = spark.createDataFrame(
            rows, "doc_id long, deleted boolean, content string")
        inc.apply_changes(spark, root, ch, seq=i, cfg=CFG)
    before = inc.query_topk_incremental(spark, root, "zz_m", 10).toPandas()

    assert inc.maybe_compact(spark, root, max_deltas=3, cfg=CFG)
    deltas = inc._delta_dirs(root)
    assert len(deltas) == 1 and "_m1" in deltas[0].name

    # merged segment alone == fresh build over its live docs
    live = spark.createDataFrame(
        [(300, "zz_m import def alpha"), (302, "zz_m gamma import"),
         (301, "zz_m beta updated import"), (303, "delta zz_m")],
        "doc_id long, content string")
    fresh_dir = tmp_path / "fresh"
    from harvester_spark.operators.index_build import build_index
    build_index(spark, live, fresh_dir, cfg=CFG)
    got = query_topk_index(spark, deltas[0], "zz_m import", 10,
                           prune=False).toPandas()
    want = query_topk_index(spark, fresh_dir, "zz_m import", 10,
                            prune=False).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    import numpy as np
    np.testing.assert_allclose(got["score"], want["score"], rtol=0)

    # same live docs returned after the merge (ORDER may legitimately
    # change for docs that lived in different deltas: per-segment stats
    # become combined stats — Lucene's convention, where merges re-scale
    # scores; rank-identity is to the fresh build, asserted above)
    after = inc.query_topk_incremental(spark, root, "zz_m", 10).toPandas()
    assert set(after["doc_id"]) == set(before["doc_id"])
    # doc 0 (deleted pre-merge) stays gone; post-merge deletes still work
    ch = spark.createDataFrame([(303, True, None)],
                               "doc_id long, deleted boolean, content string")
    inc.apply_changes(spark, root, ch, seq=4, cfg=CFG)
    res = inc.query_topk_incremental(spark, root, "zz_m", 10).toPandas()
    assert 303 not in set(res["doc_id"]) and 0 not in set(res["doc_id"])


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicate content within the watermark window is dropped in-stream;
    state is bounded (dropDuplicatesWithinWatermark)."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(0, base, "same text"), (1, base, "same text"),
            (2, base, "other text"), (3, base, "same text")]
    src = tmp_path / "dd_src"
    (spark.createDataFrame(rows, "doc_id long, ts timestamp, content string")
     .coalesce(1).write.mode("overwrite").parquet(str(src)))
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, content string")
              .parquet(str(src)))
    out = inc.streaming_exact_dedup(stream, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("select content from dd").toPandas()
    assert sorted(got["content"]) == ["other text", "same text"]


def test_progress_ticks_stateful(spark, tmp_path):
    """applyInPandasWithState: escalating log-cadence thresholds fire once
    each as cumulative counts cross them (controller.py:252 semantics),
    with state carried ACROSS micro-batches."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    src = tmp_path / "pt_src"
    # two files + maxFilesPerTrigger=1 -> two micro-batches in ONE run,
    # so the 1000-threshold fires from state carried ACROSS batches
    (spark.createDataFrame(
        [(i, base, "click", 1.0) for i in range(130)],
        "event_id long, ts timestamp, event_type string, value double")
     .coalesce(1).write.mode("overwrite").parquet(str(src)))
    (spark.createDataFrame(
        [(1000 + i, base, "click", 1.0) for i in range(1000)],
        "event_id long, ts timestamp, event_type string, value double")
     .coalesce(1).write.mode("append").parquet(str(src)))
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string, "
                      "value double")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    out = inc.progress_ticks(stream, base=100, factor=10, cap=10_000)
    q = (out.writeStream.format("memory").queryName("ticks")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "pt_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    t = spark.sql("select * from ticks order by tick").toPandas()
    assert set(t["tick"]) == {100, 1000}
    assert int(t["total"].max()) == 1130
    assert set(t["key"]) == {"click"}


def test_merge_crash_before_pointer_swap_is_harmless(spark, base_docs, tmp_path):
    """A merge that dies after building the merged dir but BEFORE the
    segments.json swap leaves queries on the old (correct) segment list;
    re-running the merge succeeds."""
    root = tmp_path / "root_mc"
    inc.init_root(spark, base_docs, root, cfg=CFG)
    for i in (1, 2):
        ch = spark.createDataFrame(
            [(2000 + i, False, f"zz_mc doc {i}")],
            "doc_id long, deleted boolean, content string")
        inc.apply_changes(spark, root, ch, seq=i, cfg=CFG)
    before = inc.query_topk_incremental(spark, root, "zz_mc", 10).toPandas()
    assert set(before["doc_id"]) == {2001, 2002}

    # simulate the crash: an orphan merged dir exists, pointer unswapped
    import shutil
    from harvester_spark.operators.index_build import (build_index_from_rows,
                                                       decode_postings)
    from harvester_spark import tables
    d = inc._delta_dirs(root)[0]
    rows = decode_postings(tables.read_table(spark, d / "postings"))
    build_index_from_rows(spark, rows, root / "delta_00000002_m9", cfg=CFG)

    # queries unaffected by the orphan (pointer still lists the old deltas)
    mid = inc.query_topk_incremental(spark, root, "zz_mc", 10).toPandas()
    assert set(mid["doc_id"]) == {2001, 2002}

    # re-running the merge commits cleanly and removes the old deltas
    assert inc.merge_deltas(spark, root, cfg=CFG) is not None
    after = inc.query_topk_incremental(spark, root, "zz_mc", 10).toPandas()
    assert set(after["doc_id"]) == {2001, 2002}
    assert len(inc._delta_dirs(root)) == 1


def test_apply_changes_counters_and_auto_compact(spark, base_docs, tmp_path):
    """apply_changes reports upsert/delete tallies (observe(), no extra
    jobs) and can trigger the compaction policy inline."""
    root = tmp_path / "root_ctr"
    inc.init_root(spark, base_docs, root, cfg=CFG)
    reps = []
    for i in (1, 2):
        ch = spark.createDataFrame(
            [(3000 + i, False, f"zz_ctr doc {i}"), (i, True, None)],
            "doc_id long, deleted boolean, content string")
        reps.append(inc.apply_changes(spark, root, ch, seq=i, cfg=CFG,
                                      auto_compact_max_deltas=2))
    assert reps[0] == {"seq": 1, "n_changes": 2, "n_deletes": 1,
                       "n_upserts": 1, "compacted": False}
    assert reps[1]["compacted"] is True          # 2nd delta hit the policy
    assert len(inc._delta_dirs(root)) == 1
    res = inc.query_topk_incremental(spark, root, "zz_ctr", 10).toPandas()
    assert set(res["doc_id"]) == {3001, 3002}
    # idempotent re-apply reports skipped
    again = inc.apply_changes(spark, root, spark.createDataFrame(
        [(1, True, None)], "doc_id long, deleted boolean, content string"),
        seq=2, cfg=CFG)
    assert again == {"seq": 2, "skipped": True}
