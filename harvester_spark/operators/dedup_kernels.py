"""Vectorized per-partition kernels for the dedup fingerprint stages.

The JVM shapes (explode token/shingle rows → 64 aggregate expressions →
groupBy exchange) spend their time in per-row expression evaluation and
in shuffling rows whose aggregation is per-doc LOCAL anyway — every
token/shingle of a doc lives in the doc's partition. These mapInArrow
kernels compute the same per-doc results inside the partition (pyarrow
tokenize → bit-exact numpy XXH64 → numpy reductions), so the map stage is
a few vectorized passes and the downstream exchange carries one row per
doc with NO groupBy at all (guide §4.2, §8).

Bit-exactness contract: signatures and fingerprints are VALUE-IDENTICAL
to the JVM expressions (same xxhash64 — functions/xxh64.py parity-tested
against Spark; same Carter-Wegman arithmetic; same sha2 hex), asserted by
kernel-vs-JVM equality tests in tests/test_dedup.py. That is what makes
these kernels optimizations rather than semantic changes: every LSH
bucket, candidate pair and verified output stays the same.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

from harvester_spark.functions.xxh64 import xxh64_arrow

MERSENNE_P = (1 << 31) - 1


def _tokens_flat(content_arr):
    """Arrow string array → (flat tokens pa.Array, parent int64 ndarray,
    counts per row int64 ndarray). Same tokenizer as the index-build pack
    kernel (lower → split on [^a-z0-9_]+ → drop empties)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from harvester_spark.functions.tokenize import TOKEN_SPLIT_RE

    nrows = len(content_arr)
    arr = pc.fill_null(content_arr, "")
    splits = pc.split_pattern_regex(pc.utf8_lower(arr), TOKEN_SPLIT_RE)
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits)
    mask = pc.not_equal(flat, "")
    flat = pc.filter(flat, mask)
    parent = pc.filter(parent, mask)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    pnp = (parent.combine_chunks() if isinstance(parent, pa.ChunkedArray)
           else parent).to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(pnp, minlength=nrows).astype(np.int64)
    return flat, pnp, counts


def _shingle_hashes(flat, pnp: np.ndarray, counts: np.ndarray,
                    shingle_n: int):
    """Flat tokens → (shingle hash ∈ [0, P) int64 ndarray, shingle parent
    row ids int64). Shingle construction matches shingles_from_tokens:
    docs with ≥ n tokens get every n-gram position (duplicates retained —
    min-hash is duplicate-insensitive, so the JVM path's array_distinct
    changes nothing); docs with 1..n-1 tokens get ONE whole-text shingle;
    zero-token docs get none."""
    import pyarrow.compute as pc

    n = shingle_n
    N = len(flat)
    parts = []
    parents = []
    if N >= n:
        L = N - (n - 1)
        cols = [flat.slice(j, L) for j in range(n)]
        joined = pc.binary_join_element_wise(*cols, " ")
        full_mask = pnp[:L] == pnp[n - 1:]
        parts.append((joined, full_mask))
        parents.append(pnp[:L][full_mask])
    # short docs (1..n-1 tokens): one whole-text shingle each
    short_rows = np.nonzero((counts > 0) & (counts < n))[0]
    short_shingles = []
    if short_rows.size:
        starts = np.concatenate(([0], np.cumsum(counts)))
        for r in short_rows:
            toks = flat.slice(starts[r], counts[r]).to_pylist()
            short_shingles.append(" ".join(toks))
    # hash full shingles (filtered) and short shingles
    import pyarrow as pa

    hashes = []
    hash_parents = []
    if parts:
        joined, full_mask = parts[0]
        h = xxh64_arrow(joined)
        hashes.append(h[full_mask])
        hash_parents.append(parents[0])
    if short_shingles:
        hashes.append(xxh64_arrow(pa.array(short_shingles,
                                           type=pa.string())))
        hash_parents.append(short_rows)
    if not hashes:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    h = np.concatenate(hashes)
    par = np.concatenate(hash_parents)
    # doc-grouped order for reduceat (full and short doc sets are
    # disjoint, but short rows must interleave back into doc order)
    order = np.argsort(par, kind="stable")
    return np.remainder(h[order], MERSENNE_P), par[order]


def minhash_sig_batches(batches, *, a: np.ndarray, b: np.ndarray,
                        shingle_n: int, with_sha: bool,
                        perm_block: int = 16) -> Iterator:
    """mapInArrow kernel: (doc_id, content) record batches →
    (doc_id[, csha], sig array<long>) batches. One row per doc with ≥1
    token; signature values identical to the JVM aggregation."""
    import pyarrow as pa

    a = a.astype(np.int64)
    b = b.astype(np.int64)
    num_hashes = a.size
    for batch in batches:
        doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
        content = batch.column(1)
        flat, pnp, counts = _tokens_flat(content)
        h, par = _shingle_hashes(flat, pnp, counts, shingle_n)
        keep_rows = np.nonzero(counts > 0)[0]
        if keep_rows.size == 0:
            continue
        # reduceat starts: first index of each doc's shingle run (par is
        # sorted; every kept doc has ≥1 shingle)
        starts = np.nonzero(np.concatenate(
            ([True], par[1:] != par[:-1])))[0]
        nd = starts.size
        sig = np.empty((nd, num_hashes), dtype=np.int64)
        for i0 in range(0, num_hashes, perm_block):
            i1 = min(i0 + perm_block, num_hashes)
            # h < 2^31, a < 2^31 → products < 2^62: exact in int64
            vals = (h[:, None] * a[None, i0:i1] + b[None, i0:i1]) \
                % MERSENNE_P
            sig[:, i0:i1] = np.minimum.reduceat(vals, starts, axis=0)
        cols = [pa.array(doc_ids[keep_rows], type=pa.int64())]
        names = ["doc_id"]
        if with_sha:
            sha_src = content.to_pylist()
            cols.append(pa.array(
                [hashlib.sha256(
                    (sha_src[r] or "").encode("utf-8")).hexdigest()
                 for r in keep_rows], type=pa.string()))
            names.append("csha")
        cols.append(pa.ListArray.from_arrays(
            np.arange(nd + 1, dtype=np.int32) * num_hashes,
            pa.array(sig.ravel(), type=pa.int64())))
        names.append("sig")
        yield pa.RecordBatch.from_arrays(cols, names=names)


def simhash_batches(batches, *, bits: int = 64,
                    bit_block: int = 16) -> Iterator:
    """mapInArrow kernel: (doc_id, content) → (doc_id, simhash long).
    Fingerprints identical to the JVM sign-sum aggregation over
    xxhash64 token votes (bit set ⟺ 2·ones > n)."""
    import pyarrow as pa

    for batch in batches:
        doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
        flat, pnp, counts = _tokens_flat(batch.column(1))
        keep_rows = np.nonzero(counts > 0)[0]
        if keep_rows.size == 0:
            continue
        h = xxh64_arrow(flat).view(np.uint64)
        # pnp is sorted by construction (list_parent_indices)
        starts = np.nonzero(np.concatenate(
            ([True], pnp[1:] != pnp[:-1])))[0]
        n_occ = counts[keep_rows].astype(np.uint64)
        fp = np.zeros(keep_rows.size, dtype=np.uint64)
        for i0 in range(0, bits, bit_block):
            i1 = min(i0 + bit_block, bits)
            shifts = np.arange(i0, i1, dtype=np.uint64)
            bitsm = ((h[:, None] >> shifts[None, :])
                     & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bitsm, starts, axis=0).astype(np.uint64)
            set_mask = (ones * np.uint64(2)) > n_occ[:, None]
            weights = (np.uint64(1) << shifts)[None, :]
            fp |= np.bitwise_or.reduce(
                np.where(set_mask, weights, np.uint64(0)), axis=1)
        yield pa.RecordBatch.from_arrays(
            [pa.array(doc_ids[keep_rows], type=pa.int64()),
             pa.array(fp.view(np.int64), type=pa.int64())],
            names=["doc_id", "simhash"])
