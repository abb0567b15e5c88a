"""Document source/sink layer.

The reference maintains ~17 paginated remote fetchers dispatched through a
registry (harvester/fetcher/controller.py:38-58) — OAI resumption tokens,
Solr cursorMark, SRW paging, keyset pagination, per-source page sizes
(SURVEY §2.1). On Spark they all collapse to one declarative scan: task
scheduling replaces pagination, resumption tokens become checkpoint state,
and count-reconciliation becomes lineage counts. This module is that single
scan plus the staging sinks the reference wrote (objset JSON pages,
harvester/fetcher/controller.py:126-157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from collections.abc import Callable

SOURCE_READERS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "parquet": lambda s, p: s.read.parquet(p),
    "json": lambda s, p: s.read.json(p),
    "csv": lambda s, p: s.read.option("header", "true").csv(p),
    "table": lambda s, p: s.read.table(p),
}


def register_source(name: str):
    """Pluggable source registry — the Spark analogue of the reference's
    fetcher dispatch table (harvester/fetcher/controller.py:38-58 maps
    harvest_type → fetcher class). New formats register a reader fn
    (spark, path) → DataFrame under a spec-addressable name."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        SOURCE_READERS[name] = fn
        return fn
    return deco


def read_source(spark: SparkSession, spec: str) -> DataFrame:
    """Read by spec: ``format:path`` (explicit), a path (parquet), or a
    catalog table name."""
    if ":" in spec and spec.split(":", 1)[0] in SOURCE_READERS:
        fmt, path = spec.split(":", 1)
        return SOURCE_READERS[fmt](spark, path)
    return (SOURCE_READERS["parquet"](spark, spec) if "/" in spec
            else SOURCE_READERS["table"](spark, spec))


def read_documents(spark: SparkSession, source: str, *,
                   lang: str | None = None,
                   repo: str | None = None) -> DataFrame:
    """The one scan that replaces the fetcher family.

    ``source``: a ``format:path`` spec, a parquet path, or an
    Iceberg/catalog table name (dispatched via the source registry).
    Predicates given here land in the scan (partition pruning /
    PushedFilters) — the declarative analogue of each fetcher's server-side
    query parameter (solr_fetcher.py:40-45, nuxeo_fetcher.py:178-181).
    """
    df = read_source(spark, source)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if repo is not None:
        df = df.filter(F.col("repo") == repo)
    return df


def keyset_page(df: DataFrame, *, order_col: str = "doc_id",
                after: int | None = None, page_size: int = 100) -> DataFrame:
    """Cursor (keyset) pagination — the PySolrFetcher cursorMark scan
    (harvester/fetcher/solr_fetcher.py:29-78) and couchdb_pager
    (harvester/couchdb_pager.py:1-42): deterministic order, resume strictly
    after the last seen key, fixed page size."""
    page = df
    if after is not None:
        page = page.filter(F.col(order_col) > after)
    return page.orderBy(order_col).limit(page_size)


def iterate_keyset(df: DataFrame, *, order_col: str = "doc_id",
                   page_size: int = 100):
    """COMPAT-ONLY generator over keyset pages (driver-side cursor loop,
    like the reference's fetcher __iter__ contract,
    harvester/fetcher/fetcher.py:9-24). Each page is its own Spark job:
    the ``> cursor`` filter is pushed to the scan (row-group pruning on a
    sorted table) and the top-N plans as TakeOrderedAndProject, but cost
    is still O(pages × remaining-scan) — right for RESUMING a cursor near
    the end of a table, wrong for draining one. To drain, use
    :func:`iterate_keyset_stream` (one pass, one job)."""
    cursor = None
    while True:
        rows = keyset_page(df, order_col=order_col, after=cursor,
                           page_size=page_size).collect()
        if not rows:
            return
        yield rows
        if len(rows) < page_size:
            return
        cursor = rows[-1][order_col]


def iterate_keyset_stream(df: DataFrame, *, order_col: str = "doc_id",
                          after: int | None = None, page_size: int = 100):
    """One-pass keyset drain: range-partition + sort once, then stream
    partitions to the driver in key order (``toLocalIterator`` fetches one
    partition at a time — driver memory stays O(partition), and the whole
    drain is a single scan instead of one job per page). Yields the same
    deterministic pages as :func:`iterate_keyset`."""
    src = df
    if after is not None:
        src = src.filter(F.col(order_col) > after)
    ordered = (src.repartitionByRange(F.col(order_col))
               .sortWithinPartitions(order_col))
    page: list = []
    for row in ordered.toLocalIterator(prefetchPartitions=True):
        page.append(row)
        if len(page) == page_size:
            yield page
            page = []
    if page:
        yield page


def write_jsonl_pages(df: DataFrame, path: str, *,
                      max_records_per_file: int = 1000) -> None:
    """Staging sink: JSONL pages, the objset-page layout the reference
    writes locally and to S3 (controller.py:126-157, key
    ``data-fetched/{cid}/{ts}/page-{n}.jsonl``). File-size control replaces
    the hand-rolled page counter."""
    (df.write.mode("overwrite")
     .option("maxRecordsPerFile", max_records_per_file)
     .json(path))


def scan_count_reconciliation(df: DataFrame, expected: int) -> dict:
    """The fetched-vs-reported invariant several fetchers assert
    (ucsf_xml_fetcher.py:9-68, ia_fetcher.py:41-48): returns counts and a
    boolean instead of raising mid-scan; callers decide policy."""
    got = df.count()
    return {"expected": expected, "got": got, "ok": got == expected}


class SchemaContractError(ValueError):
    pass


def assert_schema_contract(df: DataFrame,
                           required: dict[str, str] | list[str], *,
                           raise_on_violation: bool = True) -> dict:
    """Schema-contract check — the Spark-native form of the reference's
    header assertion (nuxeo_fetcher.py:218-231: the UCLDC fetcher asserts
    ``dublincore``/``ucldc_schema``/``picture`` are present in the
    configured document properties before any record is fetched).

    ``required`` is either a list of column names, or a {column: type}
    dict where type is a DDL string ("string", "array<string>", "long",
    …). Purely metadata-driven — inspects ``df.schema``, launches NO job.
    Returns a report {ok, missing, wrong_type: {col: (got, want)}};
    raises :class:`SchemaContractError` with the full report by default,
    matching the reference's fail-before-fetch contract."""
    from pyspark.sql.types import _parse_datatype_string

    by_name = {f.name: f.dataType for f in df.schema.fields}
    wants = (required if isinstance(required, dict)
             else {c: None for c in required})
    missing = [c for c in wants if c not in by_name]
    wrong: dict[str, tuple[str, str]] = {}
    for c, ddl in wants.items():
        if ddl is None or c not in by_name:
            continue
        if by_name[c] != _parse_datatype_string(ddl):
            wrong[c] = (by_name[c].simpleString(), ddl)
    report = {"ok": not missing and not wrong, "missing": missing,
              "wrong_type": wrong}
    if raise_on_violation and not report["ok"]:
        raise SchemaContractError(f"schema contract violated: {report}")
    return report


# ---------------------------------------------------------------------------
# registry resource scan (tastypie-page dumps → one typed dim table)
# ---------------------------------------------------------------------------

def read_registry_resources(spark: SparkSession, path: str, *,
                            required: list[str] | None = None,
                            reconcile: bool = True) -> DataFrame:
    """Typed registry-dimension reader — the Spark form of the reference's
    ``ResourceIterator`` (collection_registry_client.py:14-61), which
    walks tastypie API pages ``{"meta": {total_count, next, …},
    "objects": [...]}`` one object at a time. Here the page dumps (one
    JSON doc per page, any number of files) are one multiLine scan:
    explode ``objects``, flatten each resource to columns, and reconcile
    the row count against the pages' ``meta.total_count`` (the iterator's
    stop-condition arithmetic becomes a declarative invariant).

    Returns the resource DataFrame — dimension-sized, intended for
    ``F.broadcast`` into enrichment joins. Raises SchemaContractError
    when ``required`` fields are missing from the resource schema."""
    pages = spark.read.option("multiLine", "true").json(path)
    res = pages.select(F.explode("objects").alias("o")).select("o.*")
    if required:
        assert_schema_contract(res, list(required))
    if reconcile:
        # every page repeats the same total_count; rows must match it
        totals = [r[0] for r in
                  pages.select("meta.total_count").distinct().collect()]
        n = res.count()
        if len(totals) != 1 or int(totals[0]) != n:
            raise ValueError(
                f"registry scan reconciliation failed: pages claim "
                f"total_count={totals}, scan produced {n} rows")
    return res
