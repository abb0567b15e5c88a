"""Prefix-compressed dictionary segment: interactive term lookup without a
driver-resident hash map.

The reference serves term stats from Solr's in-memory term dictionary; our
previous analogue collected the whole dictionary into a Python dict, capped
at 2M terms (``IndexHandle.collect_dictionary_max``) — at 10^9 terms that
map is the next driver-memory ceiling (r3 verdict #7). This module writes
the dictionary as a SORTED, front-coded segment (the Lucene terms-dict
shape, public knowledge) and serves lookups by binary search over block
leaders + a one-block linear decode:

- file layout: ``[blocks][footer index][footer_offset u64][magic]``
- block (default 128 terms): per term ``varint(shared_prefix_len),
  varint(suffix_len), suffix_utf8, varint(df), f64 idf, f64 max_tfnorm``
  (NaN when the build had no term_ub stage)
- footer: per block ``varint(leader_len), leader_utf8, u64 offset,
  varint(n_entries)``

Driver memory is the leader list only — 1/128th of the terms (10^7 terms →
~78k leaders; at 10^9 the leader list itself would be front-coded into a
second level, same layout — not needed below ~10^8). Lookup cost: one
bisect + ≤128 decoded entries, microseconds, no Spark job.

All term comparisons happen on UTF-8 bytes: Spark's string ordering is
byte-wise UTF-8 (UTF8String.compareTo), which matches code-point order, so
the segment written from ``orderBy("term")`` binary-searches correctly.
"""

from __future__ import annotations

import json
import mmap
import struct
from bisect import bisect_right
from pathlib import Path
from typing import Iterable, Iterator

MAGIC = b"HSDSEG1\n"
# same marker as tables.write_table so tables.is_committed / stage-resume
# treat the segment like any other stage output
SUCCESS_MARKER = "_STAGE_SUCCESS"
SEGMENT_FILE = "terms.seg"


def _write_varint(buf: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_varint(mv, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = mv[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7


def _common_prefix_len(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def write_dict_segment(rows: Iterable, out_dir: str | Path, *,
                       block_size: int = 128) -> dict:
    """Stream sorted (term, df, idf, max_tfnorm) rows into a segment.

    ``rows``: any iterable of objects indexable by those names (Spark Row
    via ``toLocalIterator`` — O(block) driver memory — or plain tuples
    ``(term, df, idf, max_tfnorm)``). Terms MUST arrive sorted ascending;
    enforced, because a mis-sorted segment binary-searches wrong silently.
    Returns {n_terms, n_blocks, bytes}."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / SEGMENT_FILE

    leaders: list[tuple[bytes, int, int]] = []  # (leader, offset, n)
    blocks = bytearray()
    cur = bytearray()
    cur_n = 0
    cur_leader = b""
    prev = b""
    last_seen = None
    n_terms = 0

    def flush() -> None:
        nonlocal cur, cur_n, cur_leader
        if cur_n:
            leaders.append((cur_leader, len(blocks), cur_n))
            blocks.extend(cur)
            cur = bytearray()
            cur_n = 0

    for r in rows:
        if isinstance(r, tuple):
            term, df, idf, mt = r
        else:
            term, df, idf, mt = (r["term"], r["df"], r["idf"],
                                 r["max_tfnorm"] if "max_tfnorm" in r else None)
        tb = term.encode("utf-8")
        if last_seen is not None and tb <= last_seen:
            raise ValueError(f"terms not strictly sorted: {last_seen!r} "
                             f"then {tb!r}")
        last_seen = tb
        if cur_n == 0:
            cur_leader = tb
            prev = b""
        pfx = _common_prefix_len(prev, tb)
        _write_varint(cur, pfx)
        _write_varint(cur, len(tb) - pfx)
        cur += tb[pfx:]
        _write_varint(cur, int(df))
        cur += struct.pack("<dd", float(idf),
                           float("nan") if mt is None else float(mt))
        prev = tb
        cur_n += 1
        n_terms += 1
        if cur_n >= block_size:
            flush()
    flush()

    footer = bytearray()
    for leader, off, n in leaders:
        _write_varint(footer, len(leader))
        footer += leader
        footer += struct.pack("<Q", off)
        _write_varint(footer, n)

    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        f.write(bytes(blocks))
        footer_off = f.tell()
        f.write(bytes(footer))
        f.write(struct.pack("<Q", footer_off))
        f.write(MAGIC)
    tmp.rename(path)  # atomic-commit pattern shared with tables.write_table
    (out / "_seg_meta.json").write_text(json.dumps(
        {"n_terms": n_terms, "n_blocks": len(leaders),
         "block_size": block_size}))
    (out / SUCCESS_MARKER).touch()
    return {"n_terms": n_terms, "n_blocks": len(leaders),
            "bytes": path.stat().st_size}


def is_committed(seg_dir: str | Path) -> bool:
    d = Path(seg_dir)
    return (d / SUCCESS_MARKER).exists() and (d / SEGMENT_FILE).exists()


class DictSegment:
    """mmap-backed reader. Holds the leader index in memory (1/block_size
    of the terms); each lookup decodes exactly one block."""

    def __init__(self, seg_dir: str | Path):
        path = Path(seg_dir) / SEGMENT_FILE
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        mv = self._mm
        if mv[-len(MAGIC):] != MAGIC:
            raise ValueError(f"not a dict segment: {path}")
        (footer_off,) = struct.unpack_from("<Q", mv, len(mv) - len(MAGIC) - 8)
        pos = footer_off
        end = len(mv) - len(MAGIC) - 8
        self.leaders: list[bytes] = []
        self.offsets: list[int] = []
        self.counts: list[int] = []
        while pos < end:
            ln, pos = _read_varint(mv, pos)
            self.leaders.append(bytes(mv[pos:pos + ln]))
            pos += ln
            (off,) = struct.unpack_from("<Q", mv, pos)
            pos += 8
            n, pos = _read_varint(mv, pos)
            self.offsets.append(off)
            self.counts.append(n)
        meta = json.loads((Path(seg_dir) / "_seg_meta.json").read_text())
        self.n_terms = meta["n_terms"]

    def close(self) -> None:
        self._mm.close()
        self._f.close()

    def _block(self, bi: int) -> Iterator[tuple[bytes, int, float, float]]:
        mv = self._mm
        pos = self.offsets[bi]
        prev = b""
        for _ in range(self.counts[bi]):
            pfx, pos = _read_varint(mv, pos)
            sln, pos = _read_varint(mv, pos)
            term = prev[:pfx] + bytes(mv[pos:pos + sln])
            pos += sln
            df, pos = _read_varint(mv, pos)
            idf, mt = struct.unpack_from("<dd", mv, pos)
            pos += 16
            prev = term
            yield term, df, idf, mt

    def get(self, term: str) -> dict | None:
        """{df, idf, max_tfnorm} or None — one bisect + one block decode."""
        tb = term.encode("utf-8")
        bi = bisect_right(self.leaders, tb) - 1
        if bi < 0:
            return None
        for t, df, idf, mt in self._block(bi):
            if t == tb:
                return {"df": df, "idf": idf,
                        "max_tfnorm": None if mt != mt else mt}
            if t > tb:
                return None
        return None

    def lookup(self, terms: list[str]) -> dict[str, dict]:
        """Same contract as ``IndexHandle.lookup``: present terms only."""
        out = {}
        for t in terms:
            info = self.get(t)
            if info is not None:
                out[t] = info
        return out
