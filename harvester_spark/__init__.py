"""harvester_spark — a PySpark-native full-text index build + BM25 query engine.

A from-scratch re-expression of the query / data-processing capabilities of
ucldc/harvester (reference at /root/reference): the reference fetches records,
normalizes them, and pushes them into a Solr full-text index
(harvester/solr_updater.py:748-766), delegating ranked retrieval (BM25),
field queries and delete-by-query to Solr. This package replaces that whole
loop with an idiomatic Spark engine:

- index build: vectorized per-partition tokenization + posting-list
  construction (delta+varint compressed blocks with block-max metadata),
  term-sharded shuffle merge with explicit skew salting;
- query: BM25 (k1=1.2, b=0.75) top-k with posting-list intersection and
  block-max WAND pruning, rank-identical to an exhaustive oracle;
- incremental operation: delta-index merge + tombstone delete-by-query,
  resumable stage runner with per-partition lineage records (the analogue of
  the reference's ingest docs, harvester/fetcher/controller.py:159-212).

Everything here is DataFrame-first: Catalyst handles pushdown, pruning and
codegen; Python appears only inside Arrow-vectorized pandas UDFs.
"""

from harvester_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
