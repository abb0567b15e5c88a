#!/usr/bin/env python
"""Round-6 expression microbench: which scalar expressions dominate the
one-big-job queries (quality_scores 6.5 s, bm25_dataframe's 2.4 s tokenize
wave) at sf1.0, and do the candidate replacements (translate-based char
counts, regexp_count term matching) actually win? Variants run INTERLEAVED
(guide §1 + this VM's 2-4x drift) over the cached corpus; each trial is an
agg().collect() so nothing but the probed expressions runs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from harvester_spark.functions.tokenize import tokens_expr
from harvester_spark.session import get_spark

ASCII_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
# Java regex \s == [ \t\n\x0B\f\r]
JAVA_WS = " \t\n\x0b\f\r"
WORD_CHARS = ASCII_LETTERS + "0123456789_"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("expr_probe", cores=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(64).cache()
    n = docs.count()
    print(f"docs={n}")
    c = F.col("text")
    toks = tokens_expr("text")
    lc = F.lower(c)

    variants = {
        "noop_len": F.length(c),
        "tok_size": F.size(toks),
        "dl_regexp_count": F.regexp_count(lc, F.lit("[a-z0-9_]+")),
        "alpha_replace": F.length(F.regexp_replace(c, r"[^A-Za-z]", "")),
        "alpha_translate": F.length(c) - F.length(
            F.translate(c, ASCII_LETTERS, "")),
        "punct_replace": F.length(F.regexp_replace(c, r"[A-Za-z0-9_\s]", "")),
        "punct_translate": F.length(
            F.translate(c, WORD_CHARS + JAVA_WS, "")),
        "distinct_size": F.size(F.array_distinct(toks)),
        "stop_filter": F.size(F.filter(
            toks, lambda t: t.isin(["the", "and", "of", "to", "a",
                                    "in", "is", "it", "for", "on"]))),
        "match_filter3": F.size(F.filter(
            toks, lambda t: t.isin(["query", "data", "join"]))),
        "tf3_regexp_count": (
            F.regexp_count(lc, F.lit(r"(?<![a-z0-9_])\Qquery\E(?![a-z0-9_])"))
            + F.regexp_count(lc, F.lit(r"(?<![a-z0-9_])\Qdata\E(?![a-z0-9_])"))
            + F.regexp_count(lc, F.lit(r"(?<![a-z0-9_])\Qjoin\E(?![a-z0-9_])"))),
    }

    # correctness cross-checks first (values must agree before speed matters)
    chk = docs.agg(
        F.sum(variants["alpha_replace"]).alias("ar"),
        F.sum(variants["alpha_translate"]).alias("at"),
        F.sum(variants["punct_replace"]).alias("pr"),
        F.sum(variants["punct_translate"]).alias("pt"),
        F.sum(variants["tok_size"]).alias("ts"),
        F.sum(variants["dl_regexp_count"]).alias("dc"),
        F.sum(variants["match_filter3"]).alias("mf"),
        F.sum(variants["tf3_regexp_count"]).alias("tc"),
    ).collect()[0]
    print("check alpha:", chk["ar"], chk["at"], "EQ" if chk["ar"] == chk["at"] else "DIFF")
    print("check punct:", chk["pr"], chk["pt"], "EQ" if chk["pr"] == chk["pt"] else "DIFF")
    print("check dl:   ", chk["ts"], chk["dc"], "EQ" if chk["ts"] == chk["dc"] else "DIFF")
    print("check tf3:  ", chk["mf"], chk["tc"], "EQ" if chk["mf"] == chk["tc"] else "DIFF")

    trials = int(os.environ.get("PROBE_TRIALS", "3"))
    times: dict[str, list[float]] = {k: [] for k in variants}
    for t in range(trials):
        for name, expr in variants.items():
            t0 = time.time()
            docs.agg(F.sum(expr.cast("long"))).collect()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name:20s} min={min(ts):7.3f} all={ts}")


if __name__ == "__main__":
    main()
