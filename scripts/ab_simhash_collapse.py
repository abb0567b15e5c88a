"""Interleaved A/B: simhash rep-collapse via window-min (current, commit
6090da0) vs groupBy+join (pre-6090da0). The r3 bench showed simhash_dedup
4.13 -> 4.73s with the window form landing in the same window as other
changes and no interleaved measurement; this script isolates the decision.

Both variants share the identical blocking/pairing tail, so the measured
difference is exactly the collapse stage. Methodology per BENCH.md: one
session, warm-up first, interleaved trials, best-of + median reported
(this VM's throughput drifts 2-4x between minutes).

Usage: python scripts/ab_simhash_collapse.py  [env: AB_SF_DIR, AB_TRIALS]
"""
import itertools
import os
import time

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from harvester_spark.operators.dedup import _simhash_chunk_plan, simhash
from harvester_spark.session import get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("AB_TRIALS", "4"))
MAX_HAMMING = 3
MAX_BUCKET = 4096


def _blocking_tail(fp2_reps, zero_pairs, chunks):
    """Shared Manku blocking + pairing, identical to production."""
    k = MAX_HAMMING
    sizes = [64 // chunks + (1 if i < 64 % chunks else 0)
             for i in range(chunks)]
    offs = [sum(sizes[:i]) for i in range(chunks)]

    def chunk_val(i):
        return (F.shiftrightunsigned(F.col("simhash"), offs[i])
                .bitwiseAND(F.lit((1 << sizes[i]) - 1)))

    key_structs = []
    for ci, combo in enumerate(itertools.combinations(range(chunks),
                                                      chunks - k)):
        acc = F.lit(0).cast("long")
        shift = 0
        for c in combo:
            acc = acc + F.shiftleft(chunk_val(c), shift)
            shift += sizes[c]
        key_structs.append(F.struct(F.lit(ci).alias("ci"), acc.alias("cv")))

    keyed = (fp2_reps.select("doc_id", "simhash",
                             F.explode(F.array(*key_structs)).alias("kc"))
             .select("doc_id", "simhash", F.col("kc.ci").alias("ci"),
                     F.col("kc.cv").alias("cv")))
    sized = (keyed.groupBy("ci", "cv")
             .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("xs"),
                  F.count("*").alias("sz")))
    cand = (sized
            .filter((F.col("sz") > 1) & (F.col("sz") <= MAX_BUCKET))
            .select(F.explode("xs").alias("a"), F.col("xs"))
            .select("a", F.explode("xs").alias("b"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(
                        F.col("b.simhash"))).alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= MAX_HAMMING)
            .unionByName(zero_pairs))
    return cand


def run_window(docs, chunks):
    """Current form: window-min annotate, one persisted table."""
    fp = simhash(docs, content_col="text")
    w = Window.partitionBy("simhash")
    fp2 = (fp.withColumn("rep", F.min("doc_id").over(w))
           .persist(StorageLevel.MEMORY_ONLY))
    zero_pairs = (fp2.filter(F.col("doc_id") != F.col("rep"))
                  .select(F.col("rep").alias("doc_a"),
                          F.col("doc_id").alias("doc_b"),
                          F.lit(0).cast("int").alias("hamming")))
    reps = (fp2.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", "simhash"))
    n = _blocking_tail(reps, zero_pairs, chunks).count()
    fp2.unpersist()
    return n


def run_join(docs, chunks):
    """Pre-6090da0 form: groupBy rep table + join back."""
    fp = simhash(docs, content_col="text").persist(StorageLevel.MEMORY_ONLY)
    rep = (fp.groupBy("simhash")
           .agg(F.min("doc_id").alias("rep"), F.count("*").alias("gsz"))
           .persist(StorageLevel.MEMORY_ONLY))
    zero_pairs = (fp.join(rep.select("simhash", "rep"), "simhash")
                  .filter(F.col("doc_id") != F.col("rep"))
                  .select(F.col("rep").alias("doc_a"),
                          F.col("doc_id").alias("doc_b"),
                          F.lit(0).cast("int").alias("hamming")))
    reps = rep.select(F.col("rep").alias("doc_id"), "simhash")
    n = _blocking_tail(reps, zero_pairs, chunks).count()
    fp.unpersist()
    rep.unpersist()
    return n


def main():
    spark = get_spark("ab-simhash", cores=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").persist(StorageLevel.MEMORY_ONLY)
    n_docs = docs.count()
    chunks = _simhash_chunk_plan(MAX_HAMMING, n_docs, 512)
    print(f"docs={n_docs} chunks={chunks}")

    # warm-up: one full pass of each (JIT + python workers + page cache)
    nw, nj = run_window(docs, chunks), run_join(docs, chunks)
    assert nw == nj, f"variant outputs differ: {nw} vs {nj}"
    print(f"warm-up ok, pairs={nw}")

    times = {"window": [], "join": []}
    for t in range(TRIALS):
        for name, fn in (("window", run_window), ("join", run_join)):
            t0 = time.time()
            fn(docs, chunks)
            times[name].append(time.time() - t0)
            print(f"trial {t} {name}: {times[name][-1]:.3f}s", flush=True)

    import statistics
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f}s "
              f"median={statistics.median(ts):.3f}s all={[round(x,3) for x in ts]}")


if __name__ == "__main__":
    main()
