import json

from harvester_spark.plans.lineage import (build_status, lineage_summary,
                                           read_lineage)
from harvester_spark.sources.documents import (iterate_keyset, keyset_page,
                                               read_documents,
                                               scan_count_reconciliation,
                                               write_jsonl_pages)

SF = "/root/testdata/sf0.001"


def test_read_documents_with_pushdown(spark):
    df = read_documents(spark, f"{SF}/documents.parquet", lang="en")
    assert df.count() > 0
    assert set(r["lang"] for r in df.select("lang").distinct().collect()) == {"en"}


def test_keyset_pagination_resumes_exactly(spark):
    docs = read_documents(spark, f"{SF}/documents.parquet")
    p1 = keyset_page(docs, page_size=50).collect()
    p2 = keyset_page(docs, after=p1[-1]["doc_id"], page_size=50).collect()
    ids = [r["doc_id"] for r in p1 + p2]
    assert ids == sorted(ids) and len(set(ids)) == 100


def test_iterate_keyset_covers_all_rows(spark):
    docs = read_documents(spark, f"{SF}/documents.parquet").limit(130)
    seen = [r["doc_id"] for page in iterate_keyset(docs, page_size=60)
            for r in page]
    assert len(seen) == 130 and seen == sorted(set(seen))


def test_write_jsonl_pages(spark, tmp_path):
    docs = read_documents(spark, f"{SF}/documents.parquet").limit(25)
    out = tmp_path / "pages"
    write_jsonl_pages(docs.select("doc_id", "lang"), str(out),
                      max_records_per_file=10)
    lines = []
    for f in out.glob("*.json"):
        lines += [json.loads(x) for x in f.read_text().splitlines()]
    assert len(lines) == 25
    assert {"doc_id", "lang"} <= set(lines[0])


def test_read_registry_resources(spark, tmp_path):
    """Tastypie page dumps → one typed dim table with the iterator's
    total_count arithmetic enforced as a reconciliation invariant."""
    import json
    import pytest
    from harvester_spark.sources.documents import read_registry_resources
    pages = tmp_path / "registry"
    pages.mkdir()
    objs = [{"id": i, "name": f"Coll {i}",
             "resource_uri": f"/api/v1/collection/{i}/"} for i in range(5)]
    (pages / "p0.json").write_text(json.dumps(
        {"meta": {"total_count": 5, "limit": 3, "offset": 0,
                  "next": "/api/v1/collection/?offset=3"},
         "objects": objs[:3]}))
    (pages / "p1.json").write_text(json.dumps(
        {"meta": {"total_count": 5, "limit": 3, "offset": 3, "next": None},
         "objects": objs[3:]}))
    res = read_registry_resources(spark, str(pages),
                                  required=["id", "name", "resource_uri"])
    got = {r["id"]: r["name"] for r in res.collect()}
    assert got == {i: f"Coll {i}" for i in range(5)}
    # reconciliation failure: a lost page must raise, not truncate quietly
    (pages / "p1.json").unlink()
    with pytest.raises(ValueError, match="reconciliation"):
        read_registry_resources(spark, str(pages))


def test_schema_contract_assert(spark):
    """Header-assert analogue (nuxeo_fetcher.py:218-231): required
    columns/types checked from metadata only, fail-before-fetch."""
    import pytest
    from harvester_spark.sources.documents import (SchemaContractError,
                                                   assert_schema_contract)
    df = spark.createDataFrame(
        [(1, "x", ["a"])], "doc_id long, title string, tags array<string>")
    ok = assert_schema_contract(df, {"doc_id": "long", "title": "string",
                                     "tags": "array<string>"})
    assert ok == {"ok": True, "missing": [], "wrong_type": {}}
    # names-only form
    assert assert_schema_contract(df, ["doc_id", "title"])["ok"]
    # missing column -> raises with the report
    with pytest.raises(SchemaContractError, match="ucldc_schema"):
        assert_schema_contract(df, ["doc_id", "ucldc_schema"])
    # wrong type -> reported, no raise when asked
    rep = assert_schema_contract(df, {"doc_id": "string"},
                                  raise_on_violation=False)
    assert not rep["ok"] and rep["wrong_type"] == {"doc_id": ("bigint",
                                                              "string")}


def test_scan_count_reconciliation(spark):
    docs = read_documents(spark, f"{SF}/documents.parquet")
    assert scan_count_reconciliation(docs, 500)["ok"]
    assert not scan_count_reconciliation(docs, 99)["ok"]


def test_build_status_and_lineage(spark, index_dir):
    st = build_status(index_dir)
    assert st["complete"] and st["resume_at"] is None
    summ = lineage_summary(spark, index_dir)
    assert summ["postings"] > 0 and summ["blocks"] > 0
    assert summ["N"] == 400
    lin = read_lineage(spark, index_dir)
    assert lin.count() == summ["partitions"]


def test_iterate_keyset_stream_matches_paged(spark):
    """One-pass drain must yield the exact pages of the per-page cursor."""
    from pyspark.sql import functions as F

    from harvester_spark.sources.documents import iterate_keyset_stream
    df = spark.range(0, 537).select(F.col("id").alias("doc_id"),
                                    (F.col("id") * 2).alias("v"))
    paged = [[r["doc_id"] for r in page]
             for page in iterate_keyset(df, page_size=100)]
    streamed = [[r["doc_id"] for r in page]
                for page in iterate_keyset_stream(df, page_size=100)]
    assert streamed == paged
    assert streamed[0][0] == 0 and streamed[-1][-1] == 536
    # resume-after cursor
    resumed = list(iterate_keyset_stream(df, after=530, page_size=100))
    assert [r["doc_id"] for r in resumed[0]] == list(range(531, 537))


def test_source_registry_dispatch(spark, tmp_path):
    from harvester_spark.sources.documents import (read_source,
                                                   register_source)
    df = spark.range(5).selectExpr("id AS doc_id", "'en' AS lang")
    pq = tmp_path / "r.parquet"; js = tmp_path / "r.json"
    df.write.mode("overwrite").parquet(str(pq))
    df.write.mode("overwrite").json(str(js))
    assert read_source(spark, str(pq)).count() == 5          # path -> parquet
    assert read_source(spark, f"json:{js}").count() == 5     # explicit fmt
    @register_source("range5")
    def _r5(s, p):
        return s.range(int(p))
    assert read_source(spark, "range5:7").count() == 7       # custom reader
