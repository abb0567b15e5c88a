"""Incremental index maintenance — the CDC loop of the reference.

The reference consumes a CouchDB ``_changes`` feed with a persisted
``last_seq`` watermark (harvester/solr_updater.py:875-962, checkpoint at
:776-791), upserting docs into Solr and deleting by ``harvest_id_s`` query
(:914-924); full rebuild = ``since=0``. This module is the Spark-native
equivalent:

- a **delta-index** layout: ``root/base`` plus ``root/delta_NNNNN`` index
  dirs and append-only ``root/tombstones/seq=NNNNNNNN`` segments
  (delete-by-query analogue, solr_updater.py:793-817). Each CDC batch
  writes ONLY its own tombstone segment — O(batch) per batch, not
  O(total deletes) — and each segment is an independent atomic commit, so
  a crash can never lose previously-committed tombstones (the swap-rename
  failure mode of a single rewritten table does not exist here);
- :func:`apply_changes` — one batch of ``(doc_id, deleted, content)`` change
  events → new delta index + tombstones + advanced ``last_seq`` checkpoint;
- :func:`query_topk_incremental` — queries the union of base+deltas minus
  tombstones. Stats convention matches Lucene/Solr: documents deleted since
  the last compaction still count in N/avgdl/df until :func:`compact` runs
  (exactly how Solr behaves between commits with deletes pending merge);
- :func:`compact` — full rebuild from the live doc set; after compaction
  results are rank-identical to a from-scratch build.

At scale each delta build is a normal (small) distributed index build; the
tombstone anti-join is a broadcast join while tombstones are sparse.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_spark import tables
from harvester_spark.operators.bm25 import SCORE_SCHEMA, tokenize_query
from harvester_spark.operators.index_build import IndexConfig, build_index


def init_root(spark: SparkSession, docs: DataFrame, root: str | Path, *,
              content_col: str = "content",
              cfg: IndexConfig | None = None) -> None:
    """Full build into ``root/base`` (the ``since=0`` path)."""
    root = Path(root)
    build_index(spark, docs, root / "base", content_col=content_col, cfg=cfg)
    (root / "last_seq").write_text("0")


def last_seq(root: str | Path) -> int:
    p = Path(root) / "last_seq"
    return int(p.read_text()) if p.exists() else 0


def _read_segments(root: Path) -> list[str] | None:
    """Active delta-segment names from the atomic pointer file (None =
    pointer not yet written → fall back to directory glob)."""
    p = root / "segments.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def _write_segments(root: Path, names: list[str]) -> None:
    """Atomic pointer swap (tmp + rename): readers see either the old or
    the new segment list, never a partial one. This is what lets a merge
    supersede N delta dirs in ONE commit point."""
    tmp = root / "segments.json.__tmp__"
    tmp.write_text(json.dumps(sorted(set(names))))
    tmp.rename(root / "segments.json")


def _delta_dirs(root: Path) -> list[Path]:
    names = _read_segments(root)
    if names is None:
        return sorted(d for d in root.glob("delta_*")
                      if tables.is_committed(d / "postings"))
    return [root / n for n in names
            if tables.is_committed(root / n / "postings")]


def _tombstone_segments(root: Path) -> list[tuple[Path, int]]:
    """Committed tombstone segment dirs → [(path, seq)]."""
    tdir = root / "tombstones"
    if not tdir.exists():
        return []
    out = []
    for d in sorted(tdir.glob("seq=*")):
        if tables.is_committed(d):
            out.append((d, int(d.name.split("=")[1])))
    return out


def tombstoned_ids(spark: SparkSession, root: str | Path,
                   after_seq: int = -1) -> DataFrame | None:
    """doc_ids tombstoned at any seq > ``after_seq`` (None if no segments).

    Reads only the relevant segments; duplicates across segments are fine
    for the anti-join consumer (no dedup shuffle needed)."""
    segs = [p for p, s in _tombstone_segments(Path(root)) if s > after_seq]
    if not segs:
        return None
    return spark.read.parquet(*[str(p) for p in segs]).select("doc_id")


def apply_changes(spark: SparkSession, root: str | Path, changes: DataFrame,
                  seq: int, *, content_col: str = "content",
                  cfg: IndexConfig | None = None,
                  auto_compact_max_deltas: int | None = None) -> dict:
    """Apply one CDC batch. ``changes``: (doc_id, deleted bool, content).

    Upserts = tombstone the old version + index the new one in a delta
    (the reference's delete-then-add at solr_updater.py:914-947).
    Idempotent per ``seq``: re-applying an already-recorded seq is a no-op
    (the at-least-once + idempotent-upsert contract of the reference feed).
    Cost is O(batch): the batch's tombstones land in their own append-only
    segment (``tombstones/seq=NNNNNNNN``) — previously committed segments
    are never touched, so there is no swap window where a crash could lose
    them. Segments merge away only at :func:`compact`.
    """
    root = Path(root)
    if seq <= last_seq(root):
        return {"seq": seq, "skipped": True}
    delta_dir = root / f"delta_{seq:08d}"

    # batch counters ride the tombstone write job via observe() — the
    # reference's updated/deleted tallies (solr_updater.py:952-962,
    # couchdb_sync_db_by_collection.py:120-131) without extra jobs
    from pyspark.sql import Observation
    obs = Observation()
    counted = changes.observe(
        obs, F.count(F.lit(1)).alias("n_changes"),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("n_deletes"))

    # every changed doc id is tombstoned out of older segments
    tomb_new = counted.select(F.col("doc_id").cast("long").alias("doc_id"))
    tables.write_table(tomb_new, root / "tombstones" / f"seq={seq:08d}")
    n_changes = int(obs.get["n_changes"] or 0)
    n_deletes = int(obs.get["n_deletes"] or 0)
    upserts = changes.filter(~F.col("deleted")).select("doc_id", content_col)
    if n_changes - n_deletes > 0:
        # delta dictionaries are micro-batch-sized: skip the dictseg stage
        # (hash-map lookup tier covers them; one fewer job per batch)
        from dataclasses import replace
        build_index(spark, upserts, delta_dir, content_col=content_col,
                    cfg=replace(cfg or IndexConfig(), build_dictseg=False))
        _write_segments(root, [d.name for d in _delta_dirs(root)]
                        + [delta_dir.name])
    # commit point: last_seq advance (a crash before this point re-applies
    # the batch; every stage above overwrites idempotently)
    (root / "last_seq").write_text(str(seq))
    compacted = False
    if auto_compact_max_deltas is not None:
        compacted = maybe_compact(spark, root,
                                  max_deltas=auto_compact_max_deltas,
                                  cfg=cfg)
    return {"seq": seq, "n_changes": n_changes, "n_deletes": n_deletes,
            "n_upserts": n_changes - n_deletes, "compacted": compacted}


def live_doc_filter(spark: SparkSession, root: str | Path,
                    scores: DataFrame, segment_seq: int) -> DataFrame:
    """Drop docs tombstoned AFTER the segment that produced them."""
    tomb = tombstoned_ids(spark, root, after_seq=segment_seq)
    if tomb is None:
        return scores
    return scores.join(F.broadcast(tomb), "doc_id", "left_anti")


def query_topk_incremental(spark: SparkSession, root: str | Path, query: str,
                           k: int, *, mode: str = "or") -> DataFrame:
    """Top-k over base + deltas, tombstones filtered per segment.

    Each segment is scored with its own stats (Lucene per-segment scoring
    convention); the newest version of a doc wins by construction because
    older versions are tombstoned at upsert time. The tombstone anti-join
    is pushed INSIDE each segment's scoring, before its top-k cut — a
    post-limit filter would silently lose live docs ranked below a
    tombstoned one inside the segment's top-k window.
    """
    from harvester_spark.operators.bm25 import query_topk_index
    root = Path(root)
    parts: list[DataFrame] = []
    segs: list[tuple[Path, int]] = [(root / "base", 0)]
    segs += [(d, int(d.name.split("_")[1])) for d in _delta_dirs(root)]
    for seg, seq in segs:
        if not tables.is_committed(seg / "postings"):
            continue
        excl = tombstoned_ids(spark, root, after_seq=seq)
        # prune=True is safe with exclusions since the θ seed now drops
        # tombstoned docs before the threshold is set (bm25.exclude_set)
        parts.append(query_topk_index(spark, seg, query, k, mode=mode,
                                      exclude_ids=excl))
    if not parts:
        return spark.createDataFrame([], SCORE_SCHEMA)
    allscores = parts[0]
    for p in parts[1:]:
        allscores = allscores.unionByName(p)
    return (allscores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def merge_deltas(spark: SparkSession, root: str | Path, *,
                 cfg: IndexConfig | None = None) -> Path | None:
    """Size-tiered delta merge: fold ALL current delta segments into one,
    WITHOUT document content (decode postings → drop tombstoned docs →
    re-encode; Lucene's segment merge, content-free).

    The merged segment's stats are recomputed from its live postings, so
    querying it is rank-identical to a fresh index built over the same
    live documents. Commit protocol: the merged index is fully built under
    a new unique dir first; the single commit point is the atomic
    ``segments.json`` swap that supersedes the old deltas. A crash before
    the swap leaves an orphan dir and the old (still correct) segment
    list; orphans are cleared at :func:`compact`. Old dirs are removed
    only AFTER the swap (single-writer assumed, like the reference's
    one-worker-per-collection queue, harvester/config.py:16-23).
    Returns the merged dir (None when <2 deltas)."""
    import shutil

    from harvester_spark.operators.index_build import (
        build_index_from_rows, decode_postings)

    root = Path(root)
    deltas = _delta_dirs(root)
    if len(deltas) < 2:
        return None
    gen = len(list(root.glob("delta_*_m*"))) + 1
    max_seq = max(int(d.name.split("_")[1]) for d in deltas)
    out = root / f"delta_{max_seq:08d}_m{gen}"

    parts = []
    for d in deltas:
        seq = int(d.name.split("_")[1])
        rows = decode_postings(tables.read_table(spark, d / "postings"))
        tomb = tombstoned_ids(spark, root, after_seq=seq)
        if tomb is not None:
            rows = rows.join(F.broadcast(tomb), "doc_id", "left_anti")
        parts.append(rows)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)

    build_index_from_rows(spark, merged, out, cfg=cfg,
                          run_id=f"merge{gen}")
    # commit point: supersede the old deltas in one pointer swap
    _write_segments(root, [out.name])
    for d in deltas:
        shutil.rmtree(d, ignore_errors=True)
    return out


def maybe_compact(spark: SparkSession, root: str | Path, *,
                  max_deltas: int = 4,
                  cfg: IndexConfig | None = None) -> bool:
    """The compaction POLICY the reference leaves to Solr commits: when the
    delta count reaches ``max_deltas``, merge them (keeps per-query segment
    fan-out — and tombstone scan cost — bounded under a continuous CDC
    feed). Returns True when a merge ran."""
    if len(_delta_dirs(Path(root))) >= max_deltas:
        return merge_deltas(spark, root, cfg=cfg) is not None
    return False


def compact(spark: SparkSession, root: str | Path, live_docs: DataFrame, *,
            content_col: str = "content",
            cfg: IndexConfig | None = None) -> None:
    """Rebuild ``base`` from the live document set and clear deltas +
    tombstones (the reference's full re-sync, sync_couch_collection_to_solr,
    solr_updater.py:831-872). After this, queries are rank-identical to a
    fresh build."""
    import shutil
    root = Path(root)
    new_base = root / "base.__next__"
    if new_base.exists():
        shutil.rmtree(new_base)
    build_index(spark, live_docs, new_base, content_col=content_col, cfg=cfg)
    old = root / "base"
    if old.exists():
        shutil.rmtree(old)
    new_base.rename(old)
    for d in root.glob("delta_*"):
        shutil.rmtree(d)
    tomb = root / "tombstones"
    if tomb.exists():
        shutil.rmtree(tomb)
    seg = root / "segments.json"
    if seg.exists():
        seg.unlink()


# ---------------------------------------------------------------------------
# Structured Streaming: windowed event aggregation with watermark
# (SURVEY §2.10 — the reference's feed has no event-time windows; this is
# the training-pipeline-grade streaming operator over the events table)
# ---------------------------------------------------------------------------

def streaming_exact_dedup(docs_stream: DataFrame, *,
                          content_col: str = "content",
                          ts_col: str = "ts",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first occurrence of each content sha passes,
    replays within the watermark window are dropped, and state is EVICTED
    past the watermark (``dropDuplicatesWithinWatermark``) so state size is
    bounded by the window's arrival rate — unbounded ``dropDuplicates``
    state is the classic 100 TB streaming foot-gun. The streaming analogue
    of the exact-dedup operator (operators/dedup.exact_duplicates)."""
    return (docs_stream
            .withColumn("content_sha256", F.sha2(F.col(content_col), 256))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_sha256"]))


def progress_ticks(events_stream: DataFrame, *, key_col: str = "event_type",
                   base: int = 100, factor: int = 10,
                   cap: int = 10_000) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): emit a tick
    row whenever a key's cumulative record count crosses its next
    threshold — the reference's escalating progress-log cadence (every 100
    records, ×10 up to 10^4, then every 10^4;
    harvester/fetcher/controller.py:252,264-270), as exactly-once stream
    state instead of a fetch-loop counter."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "key string, total long, tick long"
    state_schema = "total long, next_tick long"

    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]",
           state: GroupState) -> "Iterator[pd.DataFrame]":
        import pandas as pd
        total, next_tick = state.get if state.exists else (0, base)
        for pdf in pdfs:
            total += len(pdf)
        rows = []
        while total >= next_tick:
            rows.append((key[0], total, next_tick))
            next_tick = (next_tick * factor if next_tick < cap
                         else next_tick + cap)
        state.update((total, next_tick))
        if rows:
            yield pd.DataFrame(rows, columns=["key", "total", "tick"])

    return (events_stream.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                    GroupStateTimeout.NoTimeout))


def windowed_event_counts(events_stream: DataFrame, *,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """readStream-ready tumbling-window count/sum per event_type with
    late-data watermark. Works identically on a batch DataFrame (Spark
    unifies the API); tests drive it through an actual stream."""
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "sum_value"))


def stream_apply_changes(spark: SparkSession, root: str | Path,
                         changes_stream: DataFrame, *,
                         checkpoint_dir: str | Path,
                         content_col: str = "content",
                         cfg: "IndexConfig | None" = None,
                         auto_compact_max_deltas: int | None = None,
                         seq_base: int = 1,
                         trigger_available_now: bool = True):
    """Drive the CDC delta-index store from a STREAM of change rows
    (doc_id, deleted, content): Structured Streaming's end of the
    reference's long-poll ``_changes`` consumer (solr_updater.py:875-962).

    ``foreachBatch`` + :func:`apply_changes` with seq = seq_base +
    batch_id gives exactly-once index application on top of the sink's
    at-least-once replay: a micro-batch re-delivered after a crash hits
    the ``seq <= last_seq`` idempotency gate and no-ops, which IS the
    documented exactly-once-by-idempotent-sink pattern (the reference's
    own contract: an at-least-once feed + idempotent delete-then-add).
    Returns the started StreamingQuery (caller awaits/stops)."""
    cfg_ = cfg

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes(spark, root, batch_df, seq_base + int(batch_id),
                      content_col=content_col, cfg=cfg_,
                      auto_compact_max_deltas=auto_compact_max_deltas)

    w = (changes_stream.writeStream
         .foreachBatch(apply_batch)
         .option("checkpointLocation", str(checkpoint_dir)))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
