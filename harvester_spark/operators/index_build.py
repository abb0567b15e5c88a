"""Inverted-index build: the Spark-native replacement for the reference's
fetch→map→``push_doc_to_solr`` loop (harvester/solr_updater.py:688-766),
where Solr's indexer did the actual posting-list construction.

Pipeline (each stage a materialized, resumable checkpoint — the analogue of
the reference's per-run ingest doc + ``last_seq`` watermark,
harvester/fetcher/controller.py:159-212, solr_updater.py:776-791):

  S1 doc_terms   docs → (doc_id, term, tf, dl)       mapInPandas, vectorized
  S2 doc_stats   (doc_id, dl)  — from S1, no re-tokenize
  S3 stats       N, avgdl (scalars)
  S4 dictionary  (term, df, cf, idf)
  S5 postings    delta+varint blocks w/ block-max metadata, term-sharded,
                 skew-salted (hot terms split by doc-id range)
  S6 lineage     per-partition build provenance

Scale notes (design for 1000 executors / 100 TB):
- S1 is a narrow map — no shuffle; TF is computed per document inside the
  Arrow batch, so the token-level explode+groupBy shuffle that a naive
  implementation would pay (|tokens| rows) never happens.
- S4/S2 aggregations get map-side partial aggregation from Catalyst, so the
  extreme term skew of code corpora ('import' in >80% of python docs) does
  not skew the shuffle: each map partition emits one partial row per term.
- S5 is the one unavoidable shuffle (group postings by term). Skew is
  handled explicitly: terms with df above ``salt_df_threshold`` are salted
  by doc-id range, so a pathological term's postings split into bounded
  groups that different tasks build independently; the salted blocks are
  already disjoint and ordered by construction (salt ranges are contiguous
  doc-id ranges), so no re-merge is needed.
- Block encoding is numpy-vectorized across an entire Arrow batch (one
  varint stream per batch, sliced per block) — no per-posting Python.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from harvester_spark import tables
from harvester_spark.functions.tokenize import term_frequencies_pandas
from harvester_spark.operators.codec import (BLOCK_SIZE, varint_encode,
                                             varint_sizes)

K1 = 1.2
B = 0.75


@dataclass
class IndexConfig:
    """Knobs are functions of corpus stats, not magic constants (SURVEY §7d)."""

    k1: float = K1
    b: float = B
    block_size: int = BLOCK_SIZE
    # term is "hot" (gets salted) when its df exceeds this
    salt_df_threshold: int = 100_000
    # postings per salt bucket for hot terms (contiguous doc-id ranges)
    salt_range_docs: int = 1_000_000
    shuffle_partitions: int | None = None


DOC_TERMS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("term", StringType()),
    StructField("tf", IntegerType()),
    StructField("dl", IntegerType()),
])

POSTINGS_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("salt", IntegerType()),
    StructField("block_id", IntegerType()),
    StructField("doc_id_first", LongType()),
    StructField("doc_id_last", LongType()),
    StructField("doc_count", IntegerType()),
    StructField("max_tf", IntegerType()),
    StructField("block_max_tfnorm", DoubleType()),
    StructField("deltas", BinaryType()),
    StructField("tfs", BinaryType()),
    StructField("dls", BinaryType()),
    StructField("part_id", IntegerType()),
])


# --------------------------------------------------------------------------
# S1: per-document term frequencies (vectorized, shuffle-free)
# --------------------------------------------------------------------------

def doc_terms(docs: DataFrame, *, id_col: str = "doc_id",
              content_col: str = "content") -> DataFrame:
    """(doc_id, term, tf, dl) — one row per distinct term per doc.

    Replaces Solr's analyzer+indexer intake. TF aggregation happens inside
    the Arrow batch (pandas C kernels), so no token-level shuffle exists.
    """
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(content_col).alias("content"))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        pa.set_cpu_count(1)  # one worker per core already; don't oversubscribe
        for pdf in batches:
            tf = term_frequencies_pandas(pdf["content"])
            if tf.empty:
                continue
            tf["doc_id"] = pdf["doc_id"].values[tf["_pos"].values]
            dl = tf.groupby("_pos")["tf"].transform("sum")
            out = pd.DataFrame({
                "doc_id": tf["doc_id"].astype("int64"),
                "term": tf["term"],
                "tf": tf["tf"].astype("int32"),
                "dl": dl.astype("int32"),
            })
            yield out

    return src.mapInPandas(compute, schema=DOC_TERMS_SCHEMA)


# --------------------------------------------------------------------------
# S5: posting-block encoder (batch-vectorized)
# --------------------------------------------------------------------------

def _encode_blocks(pdf: pd.DataFrame, k1: float, b: float, avgdl: float,
                   block_size: int, part_id: int) -> pd.DataFrame:
    """Encode one sorted (term, salt, doc_id) run of rows into block rows.

    Fully vectorized: a single varint stream per field per batch, sliced per
    block via byte-offset arithmetic. The only Python-level loop is the
    per-block byte slicing.
    """
    n = len(pdf)
    term = pdf["term"].to_numpy()
    salt = pdf["salt"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tf = pdf["tf"].to_numpy(dtype=np.int64)
    dl = pdf["dl"].to_numpy(dtype=np.int64)

    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
    grp = np.cumsum(new_group) - 1
    grp_starts = np.nonzero(new_group)[0]
    pos = np.arange(n) - grp_starts[grp]
    new_block = pos % block_size == 0  # group starts have pos == 0
    blk_starts = np.nonzero(new_block)[0]
    blk_ends = np.append(blk_starts[1:], n)

    doc_count = (blk_ends - blk_starts).astype(np.int32)
    doc_id_first = ids[blk_starts]
    doc_id_last = ids[blk_ends - 1]
    max_tf = np.maximum.reduceat(tf, blk_starts).astype(np.int32)
    tfnorm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    block_max_tfnorm = np.maximum.reduceat(tfnorm, blk_starts)

    # block_id local to each (term, salt) group
    blk_grp = grp[blk_starts]
    first_blk_of_grp = np.zeros(len(blk_starts), dtype=np.int64)
    ng = np.ones(len(blk_starts), dtype=bool)
    ng[1:] = blk_grp[1:] != blk_grp[:-1]
    first_blk_of_grp = np.maximum.accumulate(np.where(ng, np.arange(len(blk_starts)), 0))
    block_id = (np.arange(len(blk_starts)) - first_blk_of_grp).astype(np.int32)

    # shared varint streams, sliced per block
    gaps = np.zeros(n, dtype=np.uint64)
    gaps[1:] = (ids[1:] - ids[:-1]).astype(np.uint64)
    keep = ~new_block
    gap_vals = gaps[keep]
    gap_stream = varint_encode(gap_vals)
    row_nb = np.zeros(n, dtype=np.int64)
    if gap_vals.size:
        row_nb[keep] = varint_sizes(gap_vals)
    gap_cum = np.concatenate(([0], np.cumsum(row_nb)))

    tf_stream = varint_encode(tf)
    tf_cum = np.concatenate(([0], np.cumsum(varint_sizes(tf))))
    dl_stream = varint_encode(dl)
    dl_cum = np.concatenate(([0], np.cumsum(varint_sizes(dl))))

    deltas = [gap_stream[gap_cum[s]:gap_cum[e]] for s, e in zip(blk_starts, blk_ends)]
    tfs = [tf_stream[tf_cum[s]:tf_cum[e]] for s, e in zip(blk_starts, blk_ends)]
    dls = [dl_stream[dl_cum[s]:dl_cum[e]] for s, e in zip(blk_starts, blk_ends)]

    return pd.DataFrame({
        "term": term[blk_starts],
        "salt": salt[blk_starts].astype("int32"),
        "block_id": block_id,
        "doc_id_first": doc_id_first,
        "doc_id_last": doc_id_last,
        "doc_count": doc_count,
        "max_tf": max_tf,
        "block_max_tfnorm": block_max_tfnorm,
        "deltas": deltas,
        "tfs": tfs,
        "dls": dls,
        "part_id": np.full(len(blk_starts), part_id, dtype=np.int32),
    })


def build_postings(doc_terms_df: DataFrame, dictionary: DataFrame,
                   avgdl: float, cfg: IndexConfig) -> DataFrame:
    """Group (doc_id, term, tf, dl) rows into encoded posting blocks.

    The shuffle key is (term, salt): hot terms (df > threshold, found from
    the already-built dictionary — the 'heavy hitter detection pass' of
    SURVEY §4.1) are salted by contiguous doc-id range so no single task
    owns a pathological term. Within each shuffle partition rows are sorted
    (term, salt, doc_id) and encoded by a mapInPandas that carries group
    remainders across Arrow batch boundaries — grouped-map applyInPandas
    would materialize one pandas frame per group, which collapses under
    millions of single-posting groups.
    """
    hot = (dictionary.filter(F.col("df") > cfg.salt_df_threshold)
           .select("term").withColumn("__hot", F.lit(True)))
    salted = (doc_terms_df
              .join(F.broadcast(hot), "term", "left")
              .withColumn("salt",
                          F.when(F.col("__hot"),
                                 (F.col("doc_id") / cfg.salt_range_docs).cast("int"))
                          .otherwise(F.lit(0)))
              .drop("__hot"))

    num_parts = cfg.shuffle_partitions or int(
        doc_terms_df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    arranged = (salted.repartition(num_parts, "term", "salt")
                .sortWithinPartitions("term", "salt", "doc_id"))

    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_term = pdf["term"].iloc[-1]
            last_salt = pdf["salt"].iloc[-1]
            tail = (pdf["term"] == last_term) & (pdf["salt"] == last_salt)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield _encode_blocks(body, k1, b, avgdl, block_size, part_id)
        if carry is not None and len(carry):
            yield _encode_blocks(carry.reset_index(drop=True), k1, b, avgdl,
                                 block_size, part_id)

    return arranged.mapInPandas(encode, schema=POSTINGS_SCHEMA)


# --------------------------------------------------------------------------
# Orchestration: resumable staged build with lineage
# --------------------------------------------------------------------------

@dataclass
class BuildReport:
    run_id: str
    stages: list[dict] = field(default_factory=list)
    n_docs: int = 0
    avgdl: float = 0.0

    def metric(self, stage: str, **kw) -> None:
        self.stages.append({"stage": stage, **kw})


def build_index(spark: SparkSession, docs: DataFrame, index_dir: str | Path, *,
                id_col: str = "doc_id", content_col: str = "content",
                cfg: IndexConfig | None = None, run_id: str = "run0",
                force: bool = False) -> BuildReport:
    """Build (or resume) the full index under ``index_dir``.

    Every stage is an atomic parquet commit; a killed build restarts at the
    first incomplete stage (the generalization of the reference's
    ``last_seq`` resume, harvester/solr_updater.py:776-791). Per-stage
    wall-clock + row counts are emitted into the returned report and the
    ``lineage`` table (the SNS-report analogue, harvester/sns_message.py:29-41).
    """
    cfg = cfg or IndexConfig()
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    report = BuildReport(run_id=run_id)

    def stage(name: str, fn) -> Path:
        out = index_dir / name
        if not force and tables.is_committed(out):
            report.metric(name, skipped=True)
            return out
        t0 = time.time()
        fn(out)
        report.metric(name, seconds=round(time.time() - t0, 3))
        return out

    src = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(content_col).alias("content"))
    # Input parallelism guard: a source packed into few files (or one) would
    # serialize S1's tokenization; spread it across the cluster. At real
    # scale the source already has thousands of splits and this repartition
    # is a no-op-ish round-robin of similar cost to the read itself.
    n_input = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    if src.rdd.getNumPartitions() < n_input:
        src = src.repartition(n_input, "doc_id")

    # S1 — doc_terms (unsorted: downstream consumers aggregate or
    # repartition anyway, so a per-partition sort here is pure overhead)
    dt_path = stage("doc_terms", lambda out: tables.write_table(
        doc_terms(src), out))
    dt = tables.read_table(spark, dt_path)

    # S2 — doc_stats (dl from S1; docs absent from S1 have dl=0 but still
    # count toward N/avgdl, matching the oracle's N = count(*))
    def s2(out: Path) -> None:
        dl_agg = dt.groupBy("doc_id").agg(F.max("dl").alias("dl"))
        doc_stats = (src.select("doc_id")
                     .join(dl_agg, "doc_id", "left")
                     .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0))))
        tables.write_table(doc_stats, out, sort_cols=["doc_id"])
    ds_path = stage("doc_stats", s2)
    doc_stats = tables.read_table(spark, ds_path)

    # S3 — global stats (two scalars; JSON commit, no parquet job)
    def s3(out: Path) -> None:
        row = doc_stats.agg(F.count("*").alias("N"),
                            F.avg("dl").alias("avgdl")).collect()[0]
        out.mkdir(parents=True, exist_ok=True)
        (out / "_table_meta.json").write_text(json.dumps(
            {"N": int(row["N"]), "avgdl": float(row["avgdl"] or 0.0),
             "k1": cfg.k1, "b": cfg.b}))
        (out / tables.SUCCESS_MARKER).touch()
    st_path = stage("stats", s3)
    stats_meta = tables.read_meta(st_path)
    n_docs, avgdl = stats_meta["N"], stats_meta["avgdl"]
    report.n_docs, report.avgdl = n_docs, avgdl

    # S4 — dictionary (df, cf, idf). Map-side partial agg absorbs term skew.
    def s4(out: Path) -> None:
        dic = (dt.groupBy("term")
               .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
               .withColumn("idf", F.log(
                   F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                   / (F.col("df") + 0.5))))
        tables.write_table(dic, out, sort_cols=["term"])
    dic_path = stage("dictionary", s4)
    dictionary = tables.read_table(spark, dic_path)

    # S5 — postings (the one real shuffle; skew-salted)
    stage("postings", lambda out: tables.write_table(
        build_postings(dt, dictionary, avgdl, cfg), out, sort_cols=["term"],
        meta={"avgdl": avgdl, "N": n_docs, "k1": cfg.k1, "b": cfg.b,
              "block_size": cfg.block_size,
              "salt_df_threshold": cfg.salt_df_threshold,
              "salt_range_docs": cfg.salt_range_docs}))

    # S6 — lineage: per-build-partition provenance
    def s6(out: Path) -> None:
        postings = tables.read_table(spark, index_dir / "postings")
        lin = (postings.groupBy("part_id")
               .agg(F.min("term").alias("term_min"),
                    F.max("term").alias("term_max"),
                    F.countDistinct("term").alias("terms"),
                    F.sum("doc_count").alias("postings"),
                    F.count("*").alias("blocks"),
                    F.sum(F.length("deltas") + F.length("tfs")
                          + F.length("dls")).alias("bytes_encoded"))
               .withColumn("run_id", F.lit(run_id))
               .withColumn("status", F.lit("complete")))
        tables.write_table(lin, out)
    stage("lineage", s6)

    return report
