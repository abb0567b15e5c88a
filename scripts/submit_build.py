#!/usr/bin/env python
"""spark-submit driver: build the inverted index over a documents table.

  spark-submit --py-files dist/harvester_spark.zip scripts/submit_build.py \\
      --input  <parquet path | iceberg table>  \\
      --output <index directory>               \\
      [--id-col doc_id --content-col content]  \\
      [--salt-df-threshold N --salt-range-docs N] \\
      [--query "free text" --k 10]

On a cluster the master/executors come from spark-submit config; this
script only declares the job. With --query it also runs a top-k search
against the freshly built index and prints the results (smoke check).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--assign-ids", action="store_true",
                    help="derive dense doc ids from (repo, path, commit)")
    ap.add_argument("--salt-df-threshold", type=int, default=100_000)
    ap.add_argument("--salt-range-docs", type=int, default=1_000_000)
    ap.add_argument("--run-id", default=f"run{int(time.time())}")
    ap.add_argument("--query", default=None)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from harvester_spark.operators.bm25 import query_topk_index
    from harvester_spark.operators.docids import assign_doc_ids
    from harvester_spark.operators.index_build import IndexConfig, build_index

    spark = SparkSession.builder.appName("harvester_spark_build").getOrCreate()
    docs = (spark.read.table(args.input) if "/" not in args.input
            else spark.read.parquet(args.input))
    if args.assign_ids:
        docs = assign_doc_ids(docs, content_col=args.content_col)

    cfg = IndexConfig(salt_df_threshold=args.salt_df_threshold,
                      salt_range_docs=args.salt_range_docs)
    t0 = time.time()
    rep = build_index(spark, docs, args.output, id_col=args.id_col,
                      content_col=args.content_col, cfg=cfg,
                      run_id=args.run_id)
    print(json.dumps({"run_id": rep.run_id, "n_docs": rep.n_docs,
                      "avgdl": round(rep.avgdl, 3),
                      "build_sec": round(time.time() - t0, 2),
                      "stages": rep.stages}))

    if args.query:
        top = query_topk_index(spark, args.output, args.query, args.k)
        for row in top.collect():
            print(f"{row['doc_id']}\t{row['score']:.6f}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
