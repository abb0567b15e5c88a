"""Single-node numpy BM25 oracle — exhaustive scoring, no pruning.

The role the golden expected-values play in the reference's tests
(test/test_solr_updater.py:147-248: every mapped field asserted exactly):
the Spark engine's top-k must be rank-identical to this oracle with score
equality to 1e-6 relative tolerance (FIXTURES.md §3). Built from first
principles; ties break (score desc, doc_id asc) mirroring the reference's
deterministic ``sort=id asc`` cursor convention
(harvester/fetcher/solr_fetcher.py:41).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from harvester_spark.functions.tokenize import tokenize_pandas


class OracleBM25:
    def __init__(self, docs: pd.DataFrame, *, id_col: str = "doc_id",
                 content_col: str = "content", k1: float = 1.2,
                 b: float = 0.75):
        self.k1, self.b = k1, b
        docs = docs.reset_index(drop=True)
        self.doc_ids = docs[id_col].to_numpy(dtype=np.int64)
        tokens = tokenize_pandas(docs[content_col])
        self.N = len(docs)
        self.dl = np.array([len(t) for t in tokens], dtype=np.float64)
        self.avgdl = float(self.dl.mean()) if self.N else 0.0
        # postings: term -> (row positions, tfs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        ex = tokens.explode()
        ex = ex[ex.notna()]
        if len(ex):
            tf = ex.groupby([ex.index, ex]).size()
            frame = tf.rename("tf").reset_index()
            frame.columns = ["pos", "term", "tf"]
            for term, g in frame.groupby("term"):
                self.postings[str(term)] = (g["pos"].to_numpy(),
                                            g["tf"].to_numpy(np.float64))

    def idf(self, term: str) -> float:
        df = len(self.postings[term][0]) if term in self.postings else 0
        return float(np.log(1.0 + (self.N - df + 0.5) / (df + 0.5)))

    def topk(self, query_terms: list[str], k: int,
             mode: str = "or") -> pd.DataFrame:
        """Returns (doc_id, score) sorted (score desc, doc_id asc), ≤ k rows."""
        uniq = list(dict.fromkeys(query_terms))
        present = [t for t in uniq if t in self.postings]
        if not present or (mode == "and" and len(present) < len(uniq)):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        scores = np.zeros(self.N, dtype=np.float64)
        nt = np.zeros(self.N, dtype=np.int64)
        for t in present:
            pos, tf = self.postings[t]
            dl = self.dl[pos]
            part = self.idf(t) * tf * (self.k1 + 1.0) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
            scores[pos] += part
            nt[pos] += 1
        mask = nt == len(present) if mode == "and" else nt > 0
        cand = np.nonzero(mask)[0]
        # sort: score desc, doc_id asc
        order = np.lexsort((self.doc_ids[cand], -scores[cand]))
        top = cand[order[:k]]
        return pd.DataFrame({"doc_id": self.doc_ids[top],
                             "score": scores[top]})
