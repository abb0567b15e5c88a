"""Posting-block physical codec: delta + varint (LEB128), numpy-vectorized.

The reference delegates index storage to Solr (harvester/solr_updater.py:748-766);
this module is the from-scratch replacement for the posting-list physical
format. Everything is vectorized numpy — no per-element Python loops — so it
can run inside Arrow-batched pandas UDFs on executors.

Wire format per block:
- ``doc_id_first`` stored in a table column (int64);
- ``deltas``: varint stream of ``doc_count - 1`` gaps ``id[i] - id[i-1]``
  (strictly positive — doc ids are unique and sorted);
- ``tfs``: varint stream of ``doc_count`` term frequencies.

Varint = unsigned LEB128: 7 payload bits per byte, high bit = continuation.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block; block-max metadata granularity


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count (for slicing a shared stream per block)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(v.size, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nb += (x > 0).astype(np.int64)
        x >>= np.uint64(7)
    return nb


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints as an LEB128 byte stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), minimum 1
    nb = np.ones(v.size, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():  # ≤ 9 iterations for uint64
        nb += (x > 0).astype(np.int64)
        x >>= np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nb)))
    total = int(offsets[-1])
    val_idx = np.repeat(np.arange(v.size), nb)
    byte_pos = np.arange(total) - np.repeat(offsets[:-1], nb)
    shifted = v[val_idx] >> (np.uint64(7) * byte_pos.astype(np.uint64))
    out = (shifted & np.uint64(0x7F)).astype(np.uint8)
    is_last = byte_pos == (nb[val_idx] - 1)
    out[~is_last] |= np.uint8(0x80)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode an LEB128 byte stream back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    grp = np.zeros(b.size, dtype=np.int64)
    grp[1:] = np.cumsum(is_last)[:-1]
    starts = np.concatenate(([0], np.nonzero(is_last)[0] + 1))[:-1]
    pos = np.arange(b.size) - starts[grp]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    n_vals = int(grp[-1]) + 1
    vals = np.zeros(n_vals, dtype=np.uint64)
    # 7-bit groups occupy disjoint bit ranges, so addition == bitwise OR here
    np.add.at(vals, grp, contrib)
    return vals


def encode_doc_ids(doc_ids: np.ndarray) -> tuple[int, bytes]:
    """Delta+varint encode a sorted unique doc-id run.

    Returns ``(doc_id_first, gaps_varint)`` where gaps are the n-1
    successive differences.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return 0, b""
    gaps = np.diff(ids).astype(np.uint64)
    return int(ids[0]), varint_encode(gaps)


def decode_doc_ids(doc_id_first: int, gaps_varint: bytes, doc_count: int) -> np.ndarray:
    """Inverse of :func:`encode_doc_ids`."""
    out = np.empty(doc_count, dtype=np.int64)
    if doc_count == 0:
        return out
    out[0] = doc_id_first
    if doc_count > 1:
        gaps = varint_decode(gaps_varint).astype(np.int64)
        out[1:] = doc_id_first + np.cumsum(gaps)
    return out
