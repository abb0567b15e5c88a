"""Physical-plan quality gates: the optimizations we rely on must actually
appear in the plan, not just in docstrings (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

from harvester_spark import tables
from harvester_spark.operators.bm25 import bm25_scores


def plan_of(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_postings_term_filter_pushed_to_parquet(spark, index_dir):
    # earlier tests may have cached this table (IndexHandle); drop caches so
    # the plan shows the parquet scan, not InMemoryTableScan
    spark.catalog.clearCache()
    post = tables.read_table(spark, index_dir / "postings")
    plan = plan_of(post.filter(F.col("term").isin(["import", "def"])))
    assert "PushedFilters" in plan
    assert "In(term" in plan, plan[:2000]


def test_postings_column_pruning(spark, index_dir):
    spark.catalog.clearCache()
    post = tables.read_table(spark, index_dir / "postings")
    plan = plan_of(post.filter(F.col("term") == "import")
                   .select("doc_id_first", "doc_count"))
    # ReadSchema must not include the heavy binary columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "deltas" not in read_schema[0], read_schema


def test_bm25_dataframe_scorer_plan(spark, corpus_df):
    corpus_df.cache().count()  # restore cache dropped by clearCache above
    plan = plan_of(bm25_scores(corpus_df, "import ident_3"))
    # r6 shape: stats are collected to the driver and constant-folded, so
    # the returned frame is a FLAT narrow projection over the cached tf
    # table — no join, no aggregation, and no Exchange above the cache
    # boundary (the corpus fixture's own cached lineage below the first
    # InMemoryRelation may legitimately contain one)
    own_plan = plan.split("InMemoryRelation", 1)[0]
    assert "Exchange" not in own_plan, own_plan
    assert "Join" not in own_plan and "HashAggregate" not in own_plan
    assert "InMemoryTableScan" in plan


def test_bm25_dataframe_scorer_wide_fallback_plan(spark, corpus_df):
    # >_SCORES_MAX_TF_COLS terms falls back to the token-array scorer —
    # that path must keep its pre-r6 plan guarantees: tiny per-term join
    # planned broadcast (not sort-merge) and partially-aggregated groupBys
    corpus_df.cache().count()
    wide_query = " ".join(f"term{i}" for i in range(40))
    plan = plan_of(bm25_scores(corpus_df, wide_query))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "codegen id" in plan


def test_topk_plans_as_take_ordered(spark, corpus_df):
    from harvester_spark.operators.bm25 import query_topk_dataframe
    plan = plan_of(query_topk_dataframe(corpus_df, "import", 10))
    assert "TakeOrderedAndProject" in plan


def test_doc_lookup_filter_pushed(spark, corpus_df):
    plan = plan_of(corpus_df.filter(F.col("doc_id") == 42)
                   .select("repo", "path"))
    # corpus_df is cached in-memory; filter must still prune via the
    # InMemoryTableScan filter (or parquet pushdown when uncached)
    assert "Filter" in plan or "PushedFilters" in plan


def test_broadcast_join_in_registry_enrichment(spark):
    """The reference's registry join (controller.py:214-241) maps to a
    broadcast join — assert Spark actually plans it broadcast."""
    big = spark.range(0, 100000).withColumn("collection_id",
                                            (F.col("id") % 10).cast("int"))
    small = spark.createDataFrame(
        [(i, f"campus{i}") for i in range(10)],
        "collection_id int, campus string")
    plan = plan_of(big.join(F.broadcast(small), "collection_id", "left"))
    assert "BroadcastHashJoin" in plan


def test_transform_chain_composes_into_one_stage(spark):
    """A chain of column transforms must stay ONE Catalyst plan with no
    exchange/shuffle — apply_chain composes lazily, nothing materializes
    between steps."""
    from harvester_spark.plans.transforms import apply_chain
    df = spark.createDataFrame([(0, "The X", "http://h/x")],
                               "doc_id long, title string, url string")
    out = apply_chain(df, ["sort_title?col=title&dest=k",
                           "add_slash?col=url",
                           "constant?dest=rights&value=cc0",
                           "require_fields?cols=title"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow pipeline, no shuffle
