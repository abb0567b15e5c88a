"""XML badgerfish conversion + ISO 2709 MARC codec (stdlib-only parsers)."""

import json

import pytest
from xml.etree import ElementTree as ET

from harvester_spark.sources.xmlmarc import (etree_to_dict, iter_marc_records,
                                             marc_bytes, parse_marc_record,
                                             parse_marc_records,
                                             parse_xml_records,
                                             strip_namespaces)

XML = """<oai:set xmlns:oai="http://x/ns">
  <oai:rec id="1"><oai:title lang="en">First</oai:title>
    <oai:subject>a</oai:subject><oai:subject>b</oai:subject></oai:rec>
  <oai:rec id="2"><oai:title>Second</oai:title></oai:rec>
</oai:set>"""


def test_etree_to_dict_convention():
    d = etree_to_dict(ET.fromstring(XML))["set"]
    recs = d["rec"]
    assert isinstance(recs, list) and len(recs) == 2
    assert recs[0]["@id"] == "1"
    assert recs[0]["title"] == {"@lang": "en", "#text": "First"}
    assert recs[0]["subject"] == ["a", "b"]       # repeated tag -> list
    assert recs[1]["title"] == "Second"           # text-only collapses


def test_strip_namespaces():
    out = strip_namespaces(XML)
    assert "oai:" not in out and "http://x/ns" not in out
    assert "<rec" in out


def test_parse_xml_records_spark(spark):
    docs = spark.createDataFrame([(7, XML), (8, "<bad"), (9, None)],
                                 "doc_id long, xml string")
    rows = parse_xml_records(docs, "xml", "rec").collect()
    assert len(rows) == 2                          # malformed/null skipped
    by = {(r["id"], r["record_idx"]): json.loads(r["record_json"])
          for r in rows}
    assert by[(7, 0)]["@id"] == "1"
    assert by[(7, 1)]["title"] == "Second"


def test_marc_roundtrip():
    raw = marc_bytes(
        {"001": "rec0001", "008": "230101s2023"},
        [("245", "1", "0", [("a", "The Title"), ("b", "subtitle")]),
         ("650", " ", "0", [("a", "Topic1"), ("a", "Topic2")])])
    rec = parse_marc_record(raw)
    assert rec["controls"]["001"] == "rec0001"
    f245 = next(f for f in rec["fields"] if f["tag"] == "245")
    assert f245["ind1"] == "1" and f245["ind2"] == "0"
    assert f245["subfields"]["a"] == ["The Title"]
    assert f245["subfields"]["b"] == ["subtitle"]
    f650 = next(f for f in rec["fields"] if f["tag"] == "650")
    assert f650["subfields"]["a"] == ["Topic1", "Topic2"]  # repeated code


def test_iter_marc_records_concatenated():
    r1 = marc_bytes({"001": "a"}, [("245", "0", "0", [("a", "T1")])])
    r2 = marc_bytes({"001": "b"}, [("245", "0", "0", [("a", "T2")])])
    recs = list(iter_marc_records(r1 + r2))
    assert len(recs) == 2
    assert parse_marc_record(recs[1])["controls"]["001"] == "b"


def test_parse_marc_records_spark(spark):
    blob = marc_bytes({"001": "x1"}, [("245", "0", "0", [("a", "Hello")])]) \
        + marc_bytes({"001": "x2"}, [("245", "0", "0", [("a", "World")])])
    docs = spark.createDataFrame([(1, bytearray(blob)), (2, None)],
                                 "doc_id long, blob binary")
    rows = parse_marc_records(docs, "blob").collect()
    assert len(rows) == 2
    titles = sorted(
        json.loads(r["marc_json"])["fields"][0]["subfields"]["a"][0]
        for r in rows)
    assert titles == ["Hello", "World"]


def test_parse_marc_records_skips_malformed_blob(spark):
    """ADVICE r2: a corrupt blob (non-numeric leader length) must be
    skipped per-document — the XML sibling's skip-and-reconcile contract —
    not fail the whole Spark job."""
    good = marc_bytes({"001": "ok"}, [("245", "0", "0", [("a", "Fine")])])
    docs = spark.createDataFrame(
        [(1, bytearray(good)),
         (2, bytearray(b"XXXXX not a marc record at all \x1d")),
         (3, bytearray(good[:10]))],  # truncated mid-leader
        "doc_id long, blob binary")
    rows = parse_marc_records(docs, "blob").collect()
    assert [r["id"] for r in rows] == [1]
    assert json.loads(rows[0]["marc_json"])["controls"]["001"] == "ok"


from hypothesis import given, settings, strategies as st

_sub_text = st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_characters="\x1d\x1e\x1f"),
    min_size=0, max_size=30)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["245", "650", "100", "856"]),
    st.sampled_from("01 "), st.sampled_from("01 "),
    st.lists(st.tuples(st.sampled_from("abcz"), _sub_text),
             min_size=1, max_size=4)), min_size=0, max_size=6))
def test_marc_roundtrip_property(fields):
    raw = marc_bytes({"001": "ctrl"}, fields)
    rec = parse_marc_record(raw)
    assert rec["controls"]["001"] == "ctrl"
    assert len(rec["fields"]) == len(fields)
    for want, got in zip(fields, rec["fields"]):
        tag, i1, i2, subs = want
        assert got["tag"] == tag and got["ind1"] == i1 and got["ind2"] == i2
        flat = [(c, v) for c in got["subfields"]
                for v in got["subfields"][c]]
        assert sorted(flat) == sorted(subs)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_property(w, h, seed):
    import numpy as np
    from harvester_spark.operators.multimodal import decode_ppm, encode_ppm
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
