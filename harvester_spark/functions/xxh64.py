"""Vectorized XXH64 over batches of variable-length byte strings.

Bit-exact twin of Spark's ``xxhash64`` SQL function (XXH64, seed 42, over
the UTF-8 bytes — asserted value-for-value against the JVM in
tests/test_tokenize.py::test_xxh64_numpy_matches_spark), implemented with
numpy uint64 wraparound arithmetic so a mapInArrow kernel can hash
millions of shingles/tokens per task without per-row Python.

Why it exists (r6): the minhash/simhash map stages spend their time
feeding token/shingle rows through explode + 64 aggregate expressions;
computing the same signatures per-partition in numpy removes both the
per-row expression work and the groupBy exchange — but ONLY a bit-exact
hash keeps the signatures (and therefore LSH candidates) identical to the
JVM path, which is what makes the kernel a pure optimization instead of a
semantic change.

Algorithm: the public XXH64 spec (Collet) — 4-lane 32-byte stripes, then
8/4/1-byte tail, then the avalanche. Variable lengths are handled with a
zero-padded byte matrix + per-row masks; loop counts are bounded by the
longest string in the batch / 32 plus a constant, each iteration fully
vectorized.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc: np.ndarray, w: np.ndarray) -> np.ndarray:
    return _rotl(acc + w * _P2, 31) * _P1


def _merge_round(h: np.ndarray, v: np.ndarray) -> np.ndarray:
    h = h ^ _round(np.uint64(0), v)
    return h * _P1 + _P4


def _xxh64_fixed(mat: np.ndarray, L: int,
                 seed: np.uint64 = SPARK_SEED) -> np.ndarray:
    """XXH64 of ``n`` byte strings of IDENTICAL length ``L`` packed as the
    rows of ``mat`` (n × mpad uint8, mpad = L rounded up to 8, zero-padded).
    Same algorithm as :func:`xxh64` with every per-row mask and gather
    collapsed to a scalar/column op — all rows share stripe and tail
    counts, which is what makes the length-class dispatch in ``xxh64``
    ~8× faster than the generic padded-matrix path (OPTIMIZATION_r06.md)."""
    n = mat.shape[0]
    words = mat.view("<u8")
    words4 = mat.view("<u4")
    with np.errstate(over="ignore"):
        nstripes = L // 32
        if L >= 32:
            v1 = np.full(n, seed + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(n, seed + _P2, dtype=np.uint64)
            v3 = np.full(n, seed, dtype=np.uint64)
            v4 = np.full(n, seed - _P1, dtype=np.uint64)
            for s in range(nstripes):
                base = 4 * s
                v1 = _round(v1, words[:, base + 0])
                v2 = _round(v2, words[:, base + 1])
                v3 = _round(v3, words[:, base + 2])
                v4 = _round(v4, words[:, base + 3])
            h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
                 + _rotl(v4, 18))
            for v in (v1, v2, v3, v4):
                h = _merge_round(h, v)
        else:
            h = np.full(n, seed + _P5, dtype=np.uint64)
        h = h + np.uint64(L)

        pos = nstripes * 32
        for t in range((L - pos) // 8):
            h = _rotl(h ^ _round(np.uint64(0), words[:, pos // 8 + t]),
                      27) * _P1 + _P4
        pos = pos + ((L - pos) // 8) * 8
        if L - pos >= 4:
            q = words4[:, pos // 4].astype(np.uint64)
            h = _rotl(h ^ (q * _P1), 23) * _P2 + _P3
            pos += 4
        for t in range(L - pos):
            bval = mat[:, pos + t].astype(np.uint64)
            h = _rotl(h ^ (bval * _P5), 11) * _P1

        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h


def _xxh64_by_length(data: np.ndarray, offsets: np.ndarray,
                     lens: np.ndarray,
                     seed: np.uint64 = SPARK_SEED) -> np.ndarray:
    """Length-class dispatch: rows grouped by exact byte length, each class
    gathered with ONE 2-D fancy index (off[:, None] + arange(L)) and hashed
    mask-free by :func:`_xxh64_fixed`. Token/shingle batches concentrate in
    a few dozen distinct lengths, so this replaces the per-byte
    repeat/arange scatter of the generic path (its measured hot spot) with
    a handful of contiguous block copies."""
    n = lens.size
    out = np.empty(n, dtype=np.uint64)
    order = np.argsort(lens, kind="stable")
    sl = lens[order]
    starts = np.nonzero(np.concatenate(([True], sl[1:] != sl[:-1])))[0]
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        L = int(sl[s])
        sel = order[s:e]
        mpad = max(8, (L + 7) // 8 * 8)
        mat = np.zeros((e - s, mpad), dtype=np.uint8)
        if L:
            idx = offsets[sel][:, None] + np.arange(L)[None, :]
            mat[:, :L] = data[idx]
        out[sel] = _xxh64_fixed(mat, L, seed)
    return out.view(np.int64)


def xxh64(data: np.ndarray, offsets: np.ndarray,
          seed: np.uint64 = SPARK_SEED) -> np.ndarray:
    """XXH64 of ``n`` byte strings packed in ``data`` (uint8) with
    ``offsets`` (int64, len n+1, string i = data[offsets[i]:offsets[i+1]]).
    Returns int64 hashes (two's-complement view of the uint64 results —
    the signed value Spark's ``xxhash64`` column carries)."""
    offsets = offsets.astype(np.int64, copy=False)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n = lens.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # length-class fast path: pays off once there are enough rows per
    # distinct length for the per-class vector ops to amortize; tiny or
    # length-fragmented batches keep the generic padded path below
    if n >= 2048:
        n_lengths = np.unique(lens).size
        if n_lengths <= max(64, n // 256):
            return _xxh64_by_length(data, offsets[:-1], lens, seed)
    m = int(lens.max()) if n else 0
    mpad = max(8, (m + 7) // 8 * 8)
    mat = np.zeros((n, mpad), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        # byte j of row i sits at data[offsets[i] + j]; col_id enumerates
        # j for every flat element in row order
        row_flat_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        col_id = np.arange(total) - np.repeat(row_flat_start, lens)
        row_id = np.repeat(np.arange(n), lens)
        mat[row_id, col_id] = data[np.repeat(offsets[:-1], lens) + col_id]
    words = mat.view("<u8")          # (n, mpad // 8)
    words4 = mat.view("<u4")         # (n, mpad // 4)
    ulens = lens.astype(np.uint64)

    with np.errstate(over="ignore"):
        # --- stripe phase (length >= 32) ---
        nstripes = lens // 32
        max_stripes = int(nstripes.max())
        v1 = np.full(n, seed + _P1 + _P2, dtype=np.uint64)
        v2 = np.full(n, seed + _P2, dtype=np.uint64)
        v3 = np.full(n, seed, dtype=np.uint64)
        v4 = np.full(n, seed - _P1, dtype=np.uint64)
        for s in range(max_stripes):
            live = nstripes > s
            base = 4 * s
            v1 = np.where(live, _round(v1, words[:, base + 0]), v1)
            v2 = np.where(live, _round(v2, words[:, base + 1]), v2)
            v3 = np.where(live, _round(v3, words[:, base + 2]), v3)
            v4 = np.where(live, _round(v4, words[:, base + 3]), v4)
        long_mask = lens >= 32
        h_long = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
                  + _rotl(v4, 18))
        for v in (v1, v2, v3, v4):
            h_long = _merge_round(h_long, v)
        h = np.where(long_mask, h_long, seed + _P5)
        h = h + ulens

        # --- tail: 8-byte words (pos is 32-aligned → word-aligned) ---
        pos = nstripes * 32
        nwords = (lens - pos) // 8          # 0..3
        for t in range(3):
            live = nwords > t
            widx = np.minimum(pos // 8 + t, mpad // 8 - 1)
            w = words[np.arange(n), widx]
            ht = _rotl(h ^ _round(np.uint64(0), w), 27) * _P1 + _P4
            h = np.where(live, ht, h)
        pos = pos + nwords * 8

        # --- tail: one 4-byte word (pos is 4-aligned) ---
        has4 = (lens - pos) >= 4
        qidx = np.minimum(pos // 4, mpad // 4 - 1)
        q = words4[np.arange(n), qidx].astype(np.uint64)
        h4 = _rotl(h ^ (q * _P1), 23) * _P2 + _P3
        h = np.where(has4, h4, h)
        pos = pos + np.where(has4, 4, 0)

        # --- tail: bytes (0..3 remain) ---
        nb = lens - pos
        for t in range(3):
            live = nb > t
            bidx = np.minimum(pos + t, mpad - 1)
            bval = mat[np.arange(n), bidx].astype(np.uint64)
            hb = _rotl(h ^ (bval * _P5), 11) * _P1
            h = np.where(live, hb, h)

        # --- avalanche ---
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h.view(np.int64)


def xxh64_arrow(arr, seed: np.uint64 = SPARK_SEED) -> np.ndarray:
    """XXH64 of a pyarrow string/binary array (must be null-free — callers
    hash tokens/shingles, which are never null). Zero-copy over the Arrow
    offsets + data buffers."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("xxh64_arrow expects a null-free array")
    arr = arr.cast(pa.binary()) if pa.types.is_string(arr.type) else arr
    buf_offsets, buf_data = arr.buffers()[1], arr.buffers()[2]
    offsets = np.frombuffer(buf_offsets, dtype=np.int32,
                            count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(buf_data, dtype=np.uint8)
    return xxh64(data, offsets.astype(np.int64), seed)
