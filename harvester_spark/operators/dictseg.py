"""Prefix-compressed dictionary segment: interactive term lookup without a
driver-resident hash map.

The reference serves term stats from Solr's in-memory term dictionary (its
queries hit a long-lived Solr searcher,
/root/reference/harvester/fetcher/solr_fetcher.py:12-14); our previous
analogue collected the whole dictionary into a Python dict, capped
at 2M terms (``IndexHandle.collect_dictionary_max``) — at 10^9 terms that
map is the next driver-memory ceiling (r3 verdict #7). This module writes
the dictionary as a SORTED, front-coded segment (the Lucene terms-dict
shape, public knowledge) and serves lookups by binary search over block
leaders + a one-block linear decode.

Layout (``manifest.json`` + one or more part files)::

    part-N.seg = [blocks][footer index][footer_offset u64][magic]
    block (default 128 terms): per term ``varint(shared_prefix_len),
      varint(suffix_len), suffix_utf8, varint(df), f64 idf, f64 max_tfnorm``
      (NaN when the build had no term_ub stage)
    footer: per block ``varint(leader_len), leader_utf8, u64 offset,
      varint(n_entries)``

Two writers, one reader:

- :func:`write_dict_segment` — driver-streamed single part. Right below
  ~10^5 terms (``small_threshold``), where a Spark job is all overhead.
- :func:`write_dict_segment_spark` — DISTRIBUTED: range-repartition on
  term, each task front-codes its range into its own part file, driver
  writes only the tiny manifest. This is the scale path: the driver-
  streamed writer runs ~300k terms/s, a 53-MINUTE serial stage at 10^9
  terms (and an Amdahl drag on build scaling at any size); the
  distributed writer is one narrow shuffle + embarrassingly-parallel
  encode. Tasks write to the index directory, which at cluster scale must
  be a shared filesystem (same assumption every stage's parquet commit
  already makes).

Lookup: bisect over part first-terms, bisect over that part's block
leaders, decode ≤ block_size entries — microseconds, no Spark job. Driver
memory is leaders only (1/128th of terms; 10^7 → ~78k leaders).

All term comparisons happen on UTF-8 bytes: Spark's string ordering is
byte-wise UTF-8 (UTF8String.compareTo), which matches code-point order, so
segments written from Spark-sorted input binary-search correctly.
"""

from __future__ import annotations

import json
import mmap
import struct
from bisect import bisect_right
from pathlib import Path
from typing import Iterable, Iterator

MAGIC = b"HSDSEG1\n"
# the tables module's marker, imported (not re-declared) so stage-resume
# treats the segment like any other stage output even if the name changes
from harvester_spark.tables import SUCCESS_MARKER  # noqa: E402

MANIFEST = "manifest.json"


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


class _PartEncoder:
    """Streams sorted (term, df, idf, max_tfnorm) into one part file."""

    def __init__(self, block_size: int = 128):
        self.block_size = block_size
        self.leaders: list[tuple[bytes, int, int]] = []
        self.blocks = bytearray()
        self.cur = bytearray()
        self.cur_n = 0
        self.cur_leader = b""
        self.prev = b""
        self.last_seen: bytes | None = None
        self.first_term: bytes | None = None
        self.n_terms = 0

    def _flush_block(self) -> None:
        if self.cur_n:
            self.leaders.append((self.cur_leader, len(self.blocks),
                                 self.cur_n))
            self.blocks.extend(self.cur)
            self.cur = bytearray()
            self.cur_n = 0

    def add(self, term: str, df: int, idf: float,
            max_tfnorm: float | None) -> None:
        tb = term.encode("utf-8")
        if self.last_seen is not None and tb <= self.last_seen:
            raise ValueError(f"terms not strictly sorted: "
                             f"{self.last_seen!r} then {tb!r}")
        self.last_seen = tb
        if self.first_term is None:
            self.first_term = tb
        if self.cur_n == 0:
            self.cur_leader = tb
            self.prev = b""
        pfx = _common_prefix_len(self.prev, tb)
        _write_varint(self.cur, pfx)
        _write_varint(self.cur, len(tb) - pfx)
        self.cur += tb[pfx:]
        _write_varint(self.cur, int(df))
        self.cur += struct.pack(
            "<dd", float(idf),
            float("nan") if max_tfnorm is None else float(max_tfnorm))
        self.prev = tb
        self.cur_n += 1
        self.n_terms += 1
        if self.cur_n >= self.block_size:
            self._flush_block()

    def write(self, path: Path) -> dict:
        """Atomic write (tmp + rename); returns the manifest entry.

        The tmp name is attempt-unique: a speculative or retried Spark
        task racing the original must not interleave writes into one tmp
        file. Both attempts encode identical deterministic content, so
        whichever rename lands last is byte-identical — the race is
        harmless once the tmp files are distinct."""
        import uuid

        self._flush_block()
        footer = bytearray()
        for leader, off, n in self.leaders:
            _write_varint(footer, len(leader))
            footer += leader
            footer += struct.pack("<Q", off)
            _write_varint(footer, n)
        tmp = path.with_suffix(f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(bytes(self.blocks))
            footer_off = f.tell()
            f.write(bytes(footer))
            f.write(struct.pack("<Q", footer_off))
            f.write(MAGIC)
        tmp.rename(path)
        return {"file": path.name,
                "first_term": (self.first_term or b"").decode("utf-8"),
                "last_term": (self.last_seen or b"").decode("utf-8"),
                "n_terms": self.n_terms,
                "n_blocks": len(self.leaders),
                "bytes": path.stat().st_size}


def _stage_tmp(out: Path) -> Path:
    """Staging dir for the atomic dir swap (``tables.stage_tmp_dir``):
    everything (parts AND manifest) is built here, then swapped over
    ``out`` in one rename. Writing parts straight into a previously-
    committed ``out`` would leave NEW part files under the OLD manifest +
    success marker after a mid-write crash, and the resumed build would
    silently serve mismatched lookups."""
    from harvester_spark.tables import stage_tmp_dir

    return stage_tmp_dir(out)


def _commit(out: Path, tmp: Path, parts: list[dict],
            block_size: int) -> dict:
    """Validate part ordering, write manifest into ``tmp``, swap dirs,
    touch the success marker."""
    from harvester_spark.tables import replace_dir

    parts = [p for p in parts if p["n_terms"]]
    parts.sort(key=lambda p: p["first_term"])
    for a, b in zip(parts, parts[1:]):
        if not a["last_term"] < b["first_term"]:
            raise ValueError(f"part ranges overlap: {a['file']} "
                             f"[..{a['last_term']!r}] vs {b['file']} "
                             f"[{b['first_term']!r}..]")
    n_terms = sum(p["n_terms"] for p in parts)
    (tmp / MANIFEST).write_text(json.dumps(
        {"block_size": block_size, "n_terms": n_terms, "parts": parts}))
    replace_dir(tmp, out)
    (out / SUCCESS_MARKER).touch()
    return {"n_terms": n_terms,
            "n_blocks": sum(p["n_blocks"] for p in parts),
            "n_parts": len(parts),
            "bytes": sum(p["bytes"] for p in parts)}


def write_dict_segment(rows: Iterable, out_dir: str | Path, *,
                       block_size: int = 128) -> dict:
    """Driver-streamed single-part segment from sorted rows.

    ``rows``: iterable of Row-likes with term/df/idf/max_tfnorm fields or
    plain tuples. Terms MUST arrive sorted ascending (enforced — a
    mis-sorted segment binary-searches wrong silently)."""
    out = Path(out_dir)
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = _stage_tmp(out)
    enc = _PartEncoder(block_size)
    for r in rows:
        # field access FIRST: pyspark Row is a tuple subclass, so an
        # isinstance(tuple) check would unpack Rows positionally and a Row
        # with fields ordered other than (term, df, idf, max_tfnorm) would
        # silently write wrong df/idf values (r4 ADVICE)
        fields = getattr(r, "__fields__", None)
        if fields is not None:
            term, df, idf = r["term"], r["df"], r["idf"]
            mt = r["max_tfnorm"] if "max_tfnorm" in fields else None
        elif isinstance(r, dict):
            term, df, idf = r["term"], r["df"], r["idf"]
            mt = r.get("max_tfnorm")
        else:
            term, df, idf, mt = r
        enc.add(term, df, idf, mt)
    return _commit(out, tmp, [enc.write(tmp / "part-00000.seg")],
                   block_size)


def write_dict_segment_from_parquet(dict_dir: str | Path,
                                    ub_dir: str | Path | None,
                                    out_dir: str | Path, *,
                                    block_size: int = 128,
                                    small_threshold: int = 262_144
                                    ) -> dict | None:
    """ZERO-Spark-job small-dictionary path: read the committed
    ``dictionary`` and ``term_ub`` stage tables straight from parquet
    (pyarrow, driver-local), merge on term, encode.

    The Spark small path costs 2-3 fixed-overhead jobs (a count + a
    join + a collect) — measured ~2 s of the build tail at ANY core
    count, a pure Amdahl drag on scaling (the r5 paired-efficiency runs
    put the whole term_ub→dictseg chain at 2.8 s serial). At ≤262k terms
    the same work is ~0.5 s of driver pyarrow+encode. Returns the commit
    info, or None when not applicable (dirs not locally readable, above
    threshold, pyarrow missing) — the caller then falls back to
    :func:`write_dict_segment_spark`. Only valid on a driver that can
    read the index directory as a local filesystem (true for local mode
    and POSIX shared-fs clusters; object-store layouts fall back)."""
    try:
        import pandas as pd
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return None
    d = Path(dict_dir)
    dfiles = sorted(d.glob("*.parquet")) if d.exists() else []
    if not dfiles:
        return None
    try:
        # read/convert guarded BROADLY: any pyarrow/layout surprise
        # (ArrowInvalid on an unsupported encoding, schema drift, IO
        # errors) means "not applicable here" — the Spark writer reads
        # the same tables through the JVM and handles them fine
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in dfiles)
        if n > small_threshold:
            return None
        dt = pq.read_table(dfiles, columns=["term", "df", "idf"]).to_pandas()
        u = Path(ub_dir) if ub_dir is not None else None
        ufiles = sorted(u.glob("*.parquet")) if u is not None and u.exists() \
            else []
        if ufiles:
            ub = pq.read_table(ufiles,
                               columns=["term", "max_tfnorm"]).to_pandas()
            dt = dt.merge(ub, on="term", how="left")
        else:
            dt["max_tfnorm"] = float("nan")
    except Exception:
        return None  # unreadable layout: let the Spark writer handle it
    # encode OUTSIDE the guard: an encoder error here (mis-sorted input,
    # commit failure) is a real bug/IO fault that must surface, not be
    # silently retried through the distributed path
    dt = dt.sort_values("term", kind="mergesort")  # == UTF-8 byte order
    rows = ((t, int(df_), float(idf), None if pd.isna(mt) else float(mt))
            for t, df_, idf, mt in zip(dt["term"], dt["df"], dt["idf"],
                                       dt["max_tfnorm"]))
    return write_dict_segment(rows, out_dir, block_size=block_size)


def write_dict_segment_spark(df, out_dir: str | Path, *,
                             block_size: int = 128,
                             terms_per_part: int = 65_536,
                             n_terms: int | None = None,
                             small_threshold: int = 262_144) -> dict:
    """Distributed writer: each task encodes one term range into its own
    part file (shared filesystem, like every other stage commit); the
    driver only validates ranges and writes the manifest.

    ``df``: DataFrame with term/df/idf/max_tfnorm columns (max_tfnorm
    optional). One narrow range-shuffle; encode is per-task CPU.
    ``n_terms``: pass the term count when the caller has it cheaply (e.g.
    a parquet-metadata count of the one-row-per-term table) to skip a
    count() job. It sizes parts and PRE-gates the small-dictionary path,
    but the driver collect below is self-guarding (limit N+1), so an
    underestimate cannot pull a huge dictionary onto the driver.

    Below ``small_threshold`` terms the writer itself drops to ONE bounded
    collect + a driver sort/encode. Measured crossover: the driver encode
    runs ~300k terms/s (≈0.8 s at the threshold) while the distributed
    path's FIXED cost — range-sampling pass, shuffle, python-worker spawn
    — is 1–2 s at any core count, so below ~2.5×10^5 terms the driver
    path wins everywhere. Python str sort is code-point order == Spark's
    UTF-8 byte order, so the segment binary-searches identically."""
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    out = Path(out_dir)
    out.parent.mkdir(parents=True, exist_ok=True)
    cols = df.columns
    if "max_tfnorm" not in cols:
        df = df.withColumn("max_tfnorm", F.lit(None).cast("double"))
    n_terms_est = n_terms if n_terms is not None else df.count()
    if n_terms_est <= small_threshold:
        # limit N+1: a wrong n_terms estimate can't collect an unbounded
        # dictionary — one extra row proves the estimate low and we fall
        # through to the distributed encode instead
        got = df.limit(small_threshold + 1).collect()
        if len(got) <= small_threshold:
            rows = sorted(((r["term"], r["df"], r["idf"], r["max_tfnorm"])
                           for r in got), key=lambda t: t[0])
            return write_dict_segment(rows, out, block_size=block_size)
        n_terms_est = max(n_terms_est, df.count())
    tmp = _stage_tmp(out)
    n_parts = max(1, min(1024,
                         (n_terms_est + terms_per_part - 1)
                         // terms_per_part))
    src = (df.select("term", "df", "idf", "max_tfnorm")
           .repartitionByRange(n_parts, "term")
           .sortWithinPartitions("term"))
    out_str = str(tmp)  # tasks write into the staging dir, never `out`

    man_schema = ("file string, first_term string, last_term string, "
                  "n_terms long, n_blocks long, bytes long")

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        enc = _PartEncoder(block_size)
        for pdf in batches:
            mts = pdf["max_tfnorm"]
            for term, dfv, idf, mt in zip(pdf["term"], pdf["df"],
                                          pdf["idf"], mts):
                enc.add(term, int(dfv), float(idf),
                        None if pd.isna(mt) else float(mt))
        if not enc.n_terms:
            return
        entry = enc.write(Path(out_str) / f"part-{pid:05d}.seg")
        yield pd.DataFrame([entry])

    parts = [r.asDict() for r in
             src.mapInPandas(write_part, man_schema).collect()]
    return _commit(out, tmp, parts, block_size)


def is_committed(seg_dir: str | Path) -> bool:
    d = Path(seg_dir)
    return (d / SUCCESS_MARKER).exists() and (d / MANIFEST).exists()


class _Part:
    """mmap-backed reader for one part file."""

    def __init__(self, path: Path):
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._touch: dict[int, int] = {}  # block -> cold-probe count
        mv = self._mm
        if mv[-len(MAGIC):] != MAGIC:
            raise ValueError(f"not a dict segment part: {path}")
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

    def close(self) -> None:
        self._mm.close()
        self._f.close()

    def block(self, bi: int) -> Iterator[tuple[bytes, int, float, float]]:
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

    def scan_block(self, bi: int, tb: bytes) -> dict | None:
        """Find ``tb`` in one front-coded block WITHOUT reconstructing any
        term (the classic LCP-tracking scan over a front-coded run).

        Invariant while scanning sorted entries: ``m`` = lcp(tb, previous
        term), and every previous term < tb. For an entry whose stored
        prefix length is ``p``:

        - p > m: the entry agrees with prev beyond where tb diverged, so
          entry[m] == prev[m] < tb[m] ⇒ entry < tb ⇒ skip (m unchanged).
        - p < m: entry diverges from prev before tb does, and sortedness
          gives entry[p] > prev[p] == tb[p] ⇒ entry > tb ⇒ NOT FOUND.
        - p == m: compare the stored suffix byte-wise against tb[m:] in
          the mmap — equal ⇒ found; suffix exhausted first ⇒ entry is a
          proper prefix of tb ⇒ skip with m += lcp; otherwise the first
          differing byte decides.

        A cold probe therefore costs three varints + O(lcp) byte compares
        per entry and ZERO bytes-object allocations — measured 266 →
        ~70 µs/lookup at 10^7 terms vs the full block decode (numbers in
        BENCH.md). Only an exact hit pays the struct.unpack of its two
        floats."""
        mv = self._mm
        pos = self.offsets[bi]
        m = 0
        ltb = len(tb)
        for _ in range(self.counts[bi]):
            pfx, pos = _read_varint(mv, pos)
            sln, pos = _read_varint(mv, pos)
            spos = pos
            pos += sln
            df, pos = _read_varint(mv, pos)
            vpos = pos
            pos += 16
            if pfx > m:
                continue  # entry < tb, diverging at m: keep scanning
            if pfx < m:
                return None  # entry > tb: sorted run passed the target
            # pfx == m: byte-compare suffix vs tb[m:]
            j = 0
            rem = ltb - m
            lim = sln if sln < rem else rem
            while j < lim and mv[spos + j] == tb[m + j]:
                j += 1
            if j == sln and sln == rem:
                idf, mt = struct.unpack_from("<dd", mv, vpos)
                return {"df": df, "idf": idf,
                        "max_tfnorm": None if mt != mt else mt}
            if j == sln:          # entry is a proper prefix of tb: skip
                m += sln
                continue
            if j == rem or mv[spos + j] > tb[m + j]:
                return None       # entry > tb
            m += j                # entry < tb; tb now shares m+j with it
        return None

    def get(self, tb: bytes, cache: "dict | None" = None,
            cache_key: int | None = None) -> dict | None:
        bi = bisect_right(self.leaders, tb) - 1
        if bi < 0:
            return None
        if cache is not None:
            # decoded-block LRU (shared across parts, owned by the
            # DictSegment): serving workloads repeat hot terms, and a
            # cached block turns the per-entry varint loop into one list
            # scan. Keyed by the caller's STABLE part index (id(self)
            # would alias across close()/reopen when CPython reuses a
            # freed object address). OrderedDict move_to_end = true LRU.
            key = (cache_key, bi)
            ents = cache.get(key)
            if ents is not None:
                cache.move_to_end(key)
                return _find_entry(ents, tb)
            # cold probe: the allocation-free scan serves it ~4× faster
            # than a full decode; a block decodes into the LRU only once
            # it proves HOT (second touch) so one-shot probes over a huge
            # vocabulary never pay decode or evict real hot blocks
            touched = self._touch.get(bi, 0) + 1
            if touched < 2:
                self._touch[bi] = touched
                return self.scan_block(bi, tb)
            self._touch.pop(bi, None)
            ents = list(self.block(bi))
            cache[key] = ents
            while len(cache) > _BLOCK_CACHE_MAX:
                cache.popitem(last=False)
            return _find_entry(ents, tb)
        return _find_entry(self.block(bi), tb)


def _find_entry(entries, tb: bytes) -> dict | None:
    """Linear probe over decoded (term, df, idf, mt) entries."""
    for t, df, idf, mt in entries:
        if t == tb:
            return {"df": df, "idf": idf,
                    "max_tfnorm": None if mt != mt else mt}
        if t > tb:
            return None
    return None


# decoded blocks held by a DictSegment's LRU: 4096 blocks × block_size
# entries ≈ 0.5M hot terms resident, a few tens of MB — sized for a
# serving node's hot vocabulary
_BLOCK_CACHE_MAX = 4096


class DictSegment:
    """Multi-part reader: bisect part first-terms, then the part's block
    leaders, then one linear block decode (hot blocks LRU-cached)."""

    def __init__(self, seg_dir: str | Path):
        from collections import OrderedDict

        d = Path(seg_dir)
        man = json.loads((d / MANIFEST).read_text())
        self.n_terms = man["n_terms"]
        self._block_cache: OrderedDict = OrderedDict()
        entries = man["parts"]
        self._dir = d
        self._files = [p["file"] for p in entries]
        self._firsts = [p["first_term"].encode("utf-8") for p in entries]
        # parts open LAZILY: at 10^9 terms / 1024 parts, eagerly loading
        # every part's leader list is ~200 MB of driver memory for parts a
        # query stream may never touch; lazy opening keeps the resident
        # set at manifest + touched parts
        self._parts: list[_Part | None] = [None] * len(entries)

    def _part(self, pi: int) -> _Part:
        p = self._parts[pi]
        if p is None:
            p = _Part(self._dir / self._files[pi])
            self._parts[pi] = p
        return p

    def close(self) -> None:
        for p in self._parts:
            if p is not None:
                p.close()
        self._parts = [None] * len(self._files)
        self._block_cache.clear()  # decoded blocks die with their parts

    @property
    def leaders(self) -> list[bytes]:
        """All block leaders across parts (diagnostics / sizing — opens
        every part)."""
        out: list[bytes] = []
        for i in range(len(self._files)):
            out.extend(self._part(i).leaders)
        return out

    def get(self, term: str) -> dict | None:
        """{df, idf, max_tfnorm} or None — two bisects + one block."""
        if not self._files:
            return None
        tb = term.encode("utf-8")
        pi = bisect_right(self._firsts, tb) - 1
        if pi < 0:
            return None
        return self._part(pi).get(tb, cache=self._block_cache, cache_key=pi)

    def lookup(self, terms: list[str]) -> dict[str, dict]:
        """Same contract as ``IndexHandle.lookup``: present terms only."""
        out = {}
        for t in terms:
            info = self.get(t)
            if info is not None:
                out[t] = info
        return out
