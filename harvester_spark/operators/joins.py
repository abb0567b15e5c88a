"""Join strategies for scale: co-located bucketed joins + skew salting.

The reference joins registry/collection dimensions into every record
in-Python per doc (harvester/solr_updater.py registry lookups,
couchdb_runner per-collection dispatch). At 100 TB the patterns are:

- broadcast for small dims (used throughout the engine already),
- BUCKETED tables for repeated big-big equi-joins on the same key — both
  sides pre-hash-partitioned into the same bucket count, so the join
  plans with NO Exchange (verified in tests),
- SALTED joins when the big side's key distribution is pathological (the
  join-side twin of the index build's hot-term salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, key: str, *,
                   buckets: int = 16, sort: bool = True) -> None:
    """Persist ``df`` hash-bucketed by ``key`` (saveAsTable — bucket
    metadata lives in the catalog; Iceberg's bucket partition transform is
    the production analogue). Two tables bucketed the same way join with
    zero shuffle."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str, key: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. The
    physical plan has no Exchange on either side — the shuffle was paid
    once at write time and amortizes over every subsequent join."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def salted_join(big: DataFrame, dim: DataFrame, key: str, *,
                salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``big``'s key distribution is heavily skewed and
    ``dim`` is too large to broadcast: big rows get a random salt,
    dim rows are replicated ``salts`` ways, and the join key becomes
    (key, salt) — a hot key's rows spread over ``salts`` tasks instead of
    one straggler. (AQE's skew-join split handles sort-merge cases
    adaptively; explicit salting is the deterministic form that also works
    for aggregations feeding the join.) Row-multiplicity-safe for
    inner/left ONLY: each big row matches exactly one replica of its dim
    row, but a dim row with NO big-side match would surface once per salt
    replica under right/full outer — so those are rejected."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "unmatched dim rows would duplicate once per salt replica")
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = big_s.join(dim_s, [key, "__salt"], how)
    return out.drop("__salt")
