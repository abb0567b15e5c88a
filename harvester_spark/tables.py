"""Table storage with atomic-commit semantics.

Production target is Iceberg (atomic snapshot commits, row-level deletes,
incremental scans — the capabilities the reference gets from Solr commits at
harvester/solr_updater.py:864,955 and CouchDB revisions). This sandbox has no
Iceberg runtime jar, so locally we use plain parquet directories with a
write-to-temp + atomic-rename commit protocol and a ``_STAGE_SUCCESS`` marker
— the same contract an Iceberg snapshot commit gives us, at directory
granularity. Swapping ``format("parquet")`` for ``format("iceberg")`` +
``MERGE INTO`` is the only change needed on a real cluster.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SUCCESS_MARKER = "_STAGE_SUCCESS"


def is_committed(path: str | Path) -> bool:
    return (Path(path) / SUCCESS_MARKER).exists()


def stage_tmp_dir(path: str | Path) -> Path:
    """Fresh ``<path>.__tmp__`` staging dir for an atomic dir swap."""
    tmp = Path(str(path) + ".__tmp__")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    return tmp


def replace_dir(tmp: Path, path: Path) -> None:
    """Atomically publish a fully-built staging dir over ``path`` — the
    crash-safety primitive behind every stage commit (a crash mid-build
    never leaves partial output behind a valid success marker)."""
    if path.exists():
        shutil.rmtree(path)
    os.rename(tmp, path)


def write_table(df: DataFrame, path: str | Path, *, sort_cols: list[str] | None = None,
                meta: dict | None = None, compression: str | None = None) -> None:
    """Atomically materialize ``df`` as a parquet table at ``path``.

    Writes to ``<path>.__tmp__`` then renames — a crash mid-write never
    leaves a half-table behind the success marker, which is what makes the
    stage runner resumable (north_rule: resume from checkpoint).
    ``sort_cols`` sorts within partitions so parquet row-group min/max stats
    make downstream predicate pushdown (e.g. ``term = 'x'``) effective.
    ``compression`` overrides the session parquet codec — intermediate
    tables that live on fast storage (shm/NVMe) and are read once trade
    ratio for speed (lz4/uncompressed); durable tables keep the default.
    """
    path = Path(path)
    tmp = stage_tmp_dir(path)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    w = df.write.mode("overwrite")
    if compression is not None:
        w = w.option("compression", compression)
    w.parquet(str(tmp))
    replace_dir(tmp, path)
    if meta is not None:
        (path / "_table_meta.json").write_text(json.dumps(meta, indent=2))
    (path / SUCCESS_MARKER).touch()


def read_table(spark: SparkSession, path: str | Path) -> DataFrame:
    return spark.read.parquet(str(path))


def read_meta(path: str | Path) -> dict:
    return json.loads((Path(path) / "_table_meta.json").read_text())
