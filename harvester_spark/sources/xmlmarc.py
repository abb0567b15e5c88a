"""XML and MARC record parsing — the reference's fetcher-side parsers,
re-expressed as Arrow-batched column kernels (stdlib-only: xml.etree +
byte slicing; no external parser libraries).

Covers the SURVEY §2.1/§2.9 rows the reference handles with xmltodict /
pymarc / sickle:

- :func:`etree_to_dict` — xmltodict-convention element→dict ('@attr' for
  attributes, '#text' for text, repeated children → lists): the
  ``_dochits_to_objset`` conversions in oac/cmis/static-XML fetchers
  (harvester/fetcher/oac_fetcher.py, cmis_atom_feed_fetcher.py:28-33,
  xml_fetcher.py:24-52)
- :func:`strip_namespaces` — namespace removal the OAI/MARC-XML paths do
  before mapping (harvester/fetcher/oai_fetcher.py:12-66)
- :func:`parse_xml_records` — XML documents column → one row per matched
  record element, payload as a JSON string (downstream access via the
  engine's JSON functions: get_json_object / json_to_map / dejson)
- :func:`parse_marc_records` — binary ISO 2709 MARC21 → (leader, control
  fields, data fields with indicators + subfields): the MARC file scan
  (harvester/fetcher/marc_fetcher.py, which delegates to pymarc)
- :func:`marc_bytes` — test-fixture encoder (round-trip oracle)
"""

from __future__ import annotations

import json
import re
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# XML → dict (xmltodict convention)
# ---------------------------------------------------------------------------

_NS_RE = re.compile(r"\{[^}]*\}")


def _local(tag: str) -> str:
    return _NS_RE.sub("", tag)


def etree_to_dict(elem: ET.Element, *, strip_ns: bool = True):
    """Element → plain dict: attributes as '@name', text as '#text',
    children keyed by tag, repeated tags collapsed into lists. A
    text-only element with no attributes collapses to its string."""
    tag = _local(elem.tag) if strip_ns else elem.tag
    d: dict = {}
    for k, v in elem.attrib.items():
        d["@" + (_local(k) if strip_ns else k)] = v
    children = list(elem)
    for child in children:
        ck = _local(child.tag) if strip_ns else child.tag
        cv = etree_to_dict(child, strip_ns=strip_ns)[ck]
        if ck in d:
            if not isinstance(d[ck], list):
                d[ck] = [d[ck]]
            d[ck].append(cv)
        else:
            d[ck] = cv
    text = (elem.text or "").strip()
    if text:
        if d:
            d["#text"] = text
        else:
            return {tag: text}
    return {tag: d if d else None}


def strip_namespaces(xml: str) -> str:
    """Drop namespace URIs + prefixes from a serialized document (the
    pre-mapping cleanup several fetchers apply)."""
    root = ET.fromstring(xml)
    for el in root.iter():
        el.tag = _local(el.tag)
        el.attrib = {_local(k): v for k, v in el.attrib.items()}
    return ET.tostring(root, encoding="unicode")


def parse_xml_records(docs: DataFrame, xml_col: str, record_tag: str, *,
                      id_col: str = "doc_id") -> DataFrame:
    """One output row per ``<record_tag>`` element per input document:
    (id, record_idx, record_json). Arrow-batched; parsing is stdlib
    xml.etree per payload (parsers are not columnar), everything around it
    stays in the engine. Malformed XML yields zero rows for that document
    (the reference's skip-and-log behavior) — callers reconcile counts via
    lineage/scan_count_reconciliation."""
    sel = docs.select(F.col(id_col).alias("id"), F.col(xml_col).alias("xml"))
    schema = "id long, record_idx int, record_json string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for rid, xml in zip(pdf["id"], pdf["xml"]):
                if xml is None:
                    continue
                try:
                    root = ET.fromstring(xml)
                except ET.ParseError:
                    continue
                hits = [el for el in root.iter()
                        if _local(el.tag) == record_tag]
                for i, el in enumerate(hits):
                    ids.append(int(rid))
                    idxs.append(i)
                    payloads.append(json.dumps(
                        etree_to_dict(el)[record_tag], sort_keys=True))
            if ids:
                yield pd.DataFrame({"id": ids, "record_idx": idxs,
                                    "record_json": payloads})

    return sel.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# MARC (ISO 2709) binary records
# ---------------------------------------------------------------------------

FIELD_TERM = b"\x1e"
REC_TERM = b"\x1d"
SUBFIELD = b"\x1f"


def parse_marc_record(raw: bytes) -> dict:
    """One ISO 2709 record → {'leader', 'controls': {tag: value},
    'fields': [{'tag', 'ind1', 'ind2', 'subfields': {code: [values]}}]}.
    Pure byte slicing: leader(24) + directory(12-byte entries: tag 3,
    length 4, start 5) + data from the leader's base address."""
    leader = raw[:24].decode("utf-8", "replace")
    base = int(raw[12:17])
    dir_end = raw.index(FIELD_TERM)
    directory = raw[24:dir_end]
    controls: dict = {}
    fields: list = []
    for off in range(0, len(directory) - 11, 12):
        entry = directory[off:off + 12]
        tag = entry[:3].decode()
        length = int(entry[3:7])
        start = int(entry[7:12])
        data = raw[base + start: base + start + length]
        if data.endswith(FIELD_TERM):
            data = data[:-1]
        if tag < "010":  # control field: raw value
            controls[tag] = data.decode("utf-8", "replace")
            continue
        ind1, ind2 = chr(data[0]), chr(data[1])
        subs: dict = {}
        for part in data[2:].split(SUBFIELD):
            if not part:
                continue
            code = chr(part[0])
            subs.setdefault(code, []).append(
                part[1:].decode("utf-8", "replace"))
        fields.append({"tag": tag, "ind1": ind1, "ind2": ind2,
                       "subfields": subs})
    return {"leader": leader, "controls": controls, "fields": fields}


def iter_marc_records(blob: bytes) -> Iterator[bytes]:
    """Split a concatenated MARC file into records via each leader's own
    length (bytes 0-4), tolerating trailing terminators."""
    pos = 0
    while pos + 24 <= len(blob):
        length = int(blob[pos:pos + 5])
        yield blob[pos:pos + length]
        pos += length
        while blob[pos:pos + 1] in (REC_TERM, FIELD_TERM):
            pos += 1


def parse_marc_records(docs: DataFrame, blob_col: str, *,
                       id_col: str = "doc_id") -> DataFrame:
    """Binary MARC column → one row per record: (id, record_idx,
    marc_json). The Spark-side analogue of the pymarc-based MARC scan."""
    sel = docs.select(F.col(id_col).alias("id"),
                      F.col(blob_col).alias("blob"))
    schema = "id long, record_idx int, marc_json string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for rid, blob in zip(pdf["id"], pdf["blob"]):
                if blob is None:
                    continue
                # skip-on-malformed, same contract as parse_xml_records'
                # ParseError skip: one corrupt blob must not fail the job;
                # the count-reconciliation check surfaces the drop
                try:
                    recs = [json.dumps(parse_marc_record(rec),
                                       sort_keys=True)
                            for rec in iter_marc_records(bytes(blob))]
                except (ValueError, IndexError, UnicodeDecodeError):
                    continue
                for i, payload in enumerate(recs):
                    ids.append(int(rid))
                    idxs.append(i)
                    payloads.append(payload)
            if ids:
                yield pd.DataFrame({"id": ids, "record_idx": idxs,
                                    "marc_json": payloads})

    return sel.mapInPandas(run, schema)


def marc_bytes(controls: dict[str, str],
               fields: list[tuple[str, str, str, list[tuple[str, str]]]],
               leader_type: str = "nam") -> bytes:
    """Encode one MARC21 record (test fixture / round-trip oracle)."""
    body = b""
    directory = b""
    entries = list(controls.items())
    start = 0
    chunks: list[tuple[str, bytes]] = []
    for tag, val in entries:
        chunks.append((tag, val.encode() + FIELD_TERM))
    for tag, ind1, ind2, subs in fields:
        data = ind1.encode() + ind2.encode()
        for code, val in subs:
            data += SUBFIELD + code.encode() + val.encode()
        chunks.append((tag, data + FIELD_TERM))
    for tag, data in chunks:
        directory += f"{tag}{len(data):04d}{start:05d}".encode()
        body += data
        start += len(data)
    directory += FIELD_TERM
    base = 24 + len(directory)
    total = base + len(body) + 1
    leader = f"{total:05d}n{leader_type[0]}{leader_type[1]} a22{base:05d}"
    leader = leader.ljust(20, " ") + "4500"
    return leader[:24].encode() + directory + body + REC_TERM
