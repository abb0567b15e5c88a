#!/usr/bin/env python
"""Doc-ordered WAND pivoting prototype — the multi-term OR experiment.

Context (BENCH.md, r3/r4): the engine's RANGE-level block-max pruning
skips ~0% on multi-term OR queries over this corpus — terms co-occur
uniformly, so every doc-id range contains every query term at near-max
UB and no range's UB SUM falls under θ. The open question was whether a
doc-ordered layout + WAND pivoting (Broder et al. CIKM'01) or block-max
WAND (Ding & Suel SIGIR'11) would unlock skips that range-granularity
cannot, i.e. whether the failure is the GRANULARITY or the corpus.

This prototype answers it on one shard, driver-side, with the REAL
index's postings (decoded once; the simulation then counts work):

- exhaustive: score every posting (the baseline the engine does today
  after range pruning passes everything through)
- WAND: doc-at-a-time pivoting with per-term GLOBAL UBs
  (idf × max_tfnorm, both already in the dictionary); counts docs fully
  scored vs the union size, and postings entries never touched
- BMW: same traversal with per-term BLOCKS of ``block`` doc-ordered
  entries carrying a block-local UB; a pivot whose current-block UB sum
  stays under θ is skipped past the nearest block end WITHOUT scoring —
  counts blocks that would never be decoded

Rank-identity of the WAND traversal vs exhaustive is asserted per query
(same tie rule: score desc, doc_id asc), so the skip numbers describe a
CORRECT algorithm, not an approximation.

Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def wand_simulate(term_data: list[tuple[np.ndarray, np.ndarray]],
                  k: int, block: int | None) -> dict:
    """Doc-at-a-time WAND over [(doc_ids, scores_per_posting)] lists.

    ``scores_per_posting`` is the exact per-doc contribution (idf×tfnorm)
    so the simulation scores identically to the engine. ``block`` = None
    runs plain WAND (global UBs only); an int runs BMW with that many
    entries per block. Returns topk plus work counters."""
    nt = len(term_data)
    ids = [t[0] for t in term_data]
    contrib = [t[1] for t in term_data]
    ubs = [float(c.max()) if len(c) else 0.0 for c in contrib]
    # per-term block UBs over doc-ordered entries
    if block:
        bub = []
        for c in contrib:
            nb = (len(c) + block - 1) // block
            pad = np.full(nb * block, -np.inf)
            pad[:len(c)] = c
            bub.append(pad.reshape(nb, block).max(axis=1))
    ptr = [0] * nt
    n = [len(x) for x in ids]
    topk: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    import heapq

    def theta() -> float:
        return topk[0][0] if len(topk) >= k else -np.inf

    scored = 0
    blocks_opened: set[tuple[int, int]] = set()
    eps = 1.0 - 1e-12  # same UB slack the engine uses (bm25._EPS)

    while True:
        live = [t for t in range(nt) if ptr[t] < n[t]]
        if not live:
            break
        live.sort(key=lambda t: ids[t][ptr[t]])
        acc, pivot_i = 0.0, None
        for i, t in enumerate(live):
            acc += ubs[t]
            if acc > theta() * eps:
                pivot_i = i
                break
        if pivot_i is None:
            break  # no remaining doc can beat theta
        pivot_doc = int(ids[live[pivot_i]][ptr[live[pivot_i]]])
        if int(ids[live[0]][ptr[live[0]]]) == pivot_doc:
            # candidate: every list whose current doc IS the pivot (this
            # can include lists beyond pivot_i — cur values are sorted,
            # so later lists may sit at the same doc and their UBs MUST
            # enter the block-max check or a skip could drop a true hit)
            tset = [t for t in live
                    if ptr[t] < n[t] and int(ids[t][ptr[t]]) == pivot_doc]
            if block:
                # block-max refinement: if the CURRENT block UBs of all
                # pivot lists cannot beat theta, skip scoring this doc —
                # its payload blocks never need decoding
                bsum = sum(float(bub[t][ptr[t] // block]) for t in tset)
                if bsum <= theta() * eps:
                    for t in tset:
                        ptr[t] += 1
                    continue
                for t in tset:
                    blocks_opened.add((t, ptr[t] // block))
            s = 0.0
            for t in tset:
                s += float(contrib[t][ptr[t]])
                ptr[t] += 1
            scored += 1
            if len(topk) < k:
                heapq.heappush(topk, (s, -pivot_doc))
            elif (s, -pivot_doc) > topk[0]:
                heapq.heapreplace(topk, (s, -pivot_doc))
        else:
            # advance lists before the pivot up to it (binary search — the
            # skip a doc-ordered layout makes O(log) instead of O(gap))
            for t in live[:pivot_i]:
                ptr[t] = int(np.searchsorted(ids[t], pivot_doc, side="left"))
    out = sorted(((s, -d) for s, d in topk), key=lambda x: (-x[0], x[1]))
    res = {"topk": [(int(d), float(s)) for s, d in out], "scored": scored}
    if block:
        total_blocks = sum((len(c) + block - 1) // block for c in contrib)
        res["blocks_opened"] = len(blocks_opened)
        res["blocks_total"] = total_blocks
    return res


def main() -> None:
    from harvester_spark.fixtures.corpus import QUERY_SET
    from harvester_spark.operators.bm25 import open_index, tokenize_query
    from harvester_spark.operators.index_build import (IndexConfig,
                                                       build_index)
    from harvester_spark.session import get_spark

    corpus = REPO / ".bench" / "corpus"
    idx = Path("/dev/shm/bench/skip_idx")
    spark = get_spark("wand-proto", cores=int(os.environ.get("CORES", "8")),
                      shuffle_partitions=64,
                      extra_conf={"spark.local.dir": "/dev/shm/bench/sl"})
    docs = spark.read.parquet(str(corpus))
    n = docs.count()
    cfg = IndexConfig(salt_df_threshold=max(1000, n // 20),
                      salt_range_docs=max(4096, n // 64),
                      shuffle_partitions=64)
    build_index(spark, docs, idx, cfg=cfg)  # resumes if committed

    h = open_index(spark, idx)
    h.term_cache_max_entries = 50_000_000
    k1, b, avgdl = h.meta["k1"], h.meta["b"], h.meta["avgdl"]

    queries = sorted({q for q, _ in QUERY_SET
                      if len(set(tokenize_query(q))) >= 2})
    out: dict[str, dict] = {}
    for q in queries:
        terms = [t for t in dict.fromkeys(tokenize_query(q))]
        info = h.lookup(terms)
        present = [t for t in terms if t in info]
        if len(present) < 2:
            continue
        td = []
        for t in present:
            ids, tf, dl = h._term_postings(t)
            order = np.argsort(ids, kind="stable")
            ids, tf, dl = ids[order], tf[order], dl[order]
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            td.append((ids, info[t]["idf"] * tfn))
        union = len(np.unique(np.concatenate([x[0] for x in td])))
        total_postings = sum(len(x[0]) for x in td)
        # exhaustive oracle (timed: the vectorized score-everything cost
        # that any python-level pivoting traversal must BEAT to be worth
        # adopting in this engine)
        import time
        t0 = time.time()
        allids = np.concatenate([x[0] for x in td])
        allsc = np.concatenate([x[1] for x in td])
        uniq, inv = np.unique(allids, return_inverse=True)
        scores = np.bincount(inv, weights=allsc)
        order = np.lexsort((uniq, -scores))[:10]
        exhaustive_ms = (time.time() - t0) * 1000
        want = [(int(uniq[i]), float(scores[i])) for i in order]

        t0 = time.time()
        wand = wand_simulate(td, 10, None)
        wand_ms = (time.time() - t0) * 1000
        t0 = time.time()
        bmw = wand_simulate(td, 10, 128)
        bmw_ms = (time.time() - t0) * 1000
        for label, sim in (("wand", wand), ("bmw", bmw)):
            assert [d for d, _ in sim["topk"]] == [d for d, _ in want], \
                (label, q)
            np.testing.assert_allclose([s for _, s in sim["topk"]],
                                       [s for _, s in want], rtol=1e-9)
        out[q] = {
            "terms": len(present),
            "union_docs": union,
            "postings": total_postings,
            "wand_scored": wand["scored"],
            "wand_doc_skip_pct": round(100 * (1 - wand["scored"] / union), 2),
            "bmw_scored": bmw["scored"],
            "bmw_blocks_opened": bmw["blocks_opened"],
            "bmw_blocks_total": bmw["blocks_total"],
            "bmw_block_skip_pct": round(
                100 * (1 - bmw["blocks_opened"] / bmw["blocks_total"]), 2),
            "exhaustive_numpy_ms": round(exhaustive_ms, 1),
            "wand_python_ms": round(wand_ms, 1),
            "bmw_python_ms": round(bmw_ms, 1),
        }
    print(json.dumps({"corpus_docs": n, "k": 10, "block": 128,
                      "queries": out}))


if __name__ == "__main__":
    main()
