"""BM25 top-k retrieval — the query half the reference delegates to Solr.

The reference issues ranked/cursored Solr queries (harvester/fetcher/
solr_fetcher.py:38-60, harvester/solr_updater.py:916) and delete-by-query
(solr_updater.py:793-817). This module re-implements the ranked-retrieval
role natively:

- :func:`query_topk_dataframe` — index-free scorer from pure DataFrame
  built-ins (tokenize → filter-to-query-terms → tf/df aggregates → score →
  TakeOrderedAndProject). 100% SQL-expressible, used as the driver-oracle
  path and for ad-hoc queries without a prebuilt index.
- :func:`query_topk_index` — the scale path: dictionary lookup → parquet
  predicate pushdown on ``term`` → block-max upper-bound pruning (safe:
  provably never drops a true top-k doc) → vectorized block decode →
  per-doc accumulation → global top-k.

Scoring (fixed, matches the numpy oracle bit-for-bit in float64):
  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))          [Lucene-style]
  s(d, q) = Σ_{t ∈ unique(q)} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
  ties    → doc_id asc (the reference's deterministic cursor order,
            solr_fetcher.py:41 ``sort=id asc``)
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

from harvester_spark import tables
from harvester_spark.functions.tokenize import (doc_len_expr, tokenize_pandas,
                                                tokens_expr)

SCORE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("score", DoubleType()),
])


def tokenize_query(query: str) -> list[str]:
    """Unique query terms, order-preserving (same analyzer as documents)."""
    toks = tokenize_pandas(pd.Series([query])).iloc[0]
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t)
    return list(seen)


# --------------------------------------------------------------------------
# Path A: index-free, pure built-ins (SQL-expressible / oracle-checkable)
# --------------------------------------------------------------------------

# above this many query terms the per-term regexp_count projection gets
# wide and the token-array form wins back; interactive/oracle queries are
# single digits of terms
_SCORES_MAX_TF_COLS = 32


def bm25_scores(docs: DataFrame, query: str, *, id_col: str = "doc_id",
                content_col: str = "content", mode: str = "or",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """All matching docs with exact BM25 scores (no limit) — the building
    block for :func:`query_topk_dataframe` and for driver-oracle entries
    that re-rank on rounded scores for cross-engine determinism.

    Plan shape (guide §2.4 "remove shuffles outright"): ONE narrow
    projection computes dl and per-term tf via ``regexp_count`` (a token
    is a maximal ``[a-z0-9_]+`` run, so ``(?<![a-z0-9_])term(?![a-z0-9_])``
    occurrences ≡ matched-token count — no token arrays, no explode), ONE
    broadcast aggregation derives N/avgdl/df for every term together, and
    the score is a flat projection over the cached tf columns. The old
    shape (tokenize → HOF match filter → explode → two groupBys → join)
    paid the array-building tokenizer plus three exchanges; measured at
    sf1.0 the tf projection pass is ~0.2 s vs ~2.4 s (numbers in
    OPTIMIZATION_r06.md). Score equality: a term with tf=0 contributes
    exactly 0.0 (the tfnorm numerator is ``tf * (k1+1)``), so the fixed
    term-order sum equals the old matched-terms-only aggregation."""
    terms = tokenize_query(query)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], SCORE_SCHEMA)
    if len(terms) > _SCORES_MAX_TF_COLS:
        return _bm25_scores_tokens(docs, terms, id_col=id_col,
                                   content_col=content_col, mode=mode,
                                   k1=k1, b=b)

    src = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(content_col).alias("content"))
    lc = F.lower(F.col("content"))
    tf_cols = [
        F.regexp_count(
            lc, F.lit(rf"(?<![a-z0-9_])\Q{t}\E(?![a-z0-9_])"))
        .cast("double").alias(f"__tf{i}")
        for i, t in enumerate(terms)]
    # MEMORY_ONLY: per-query cache entry with no unpersist hook — must be
    # evictable under LRU pressure (worst case: recompute), not
    # disk-accumulating across a serving session's queries
    from pyspark import StorageLevel
    proj = (src.select("doc_id",
                       F.regexp_count(lc, F.lit(r"[a-z0-9_]+"))
                       .cast("double").alias("dl"), *tf_cols)
            .persist(StorageLevel.MEMORY_ONLY))
    # global stats straight to the driver (one tiny row) instead of a
    # broadcast-exchange crossJoin: idf/avgdl become plan literals that
    # Catalyst constant-folds with the SAME JVM double ops (F.log over
    # literal doubles), so scores are bit-identical while the query drops
    # from three jobs (stats broadcast + dfreq broadcast + final) to two
    row = proj.agg(
        F.count("*").alias("N"), F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("double")).alias(f"__df{i}")
          for i in range(len(terms))]).collect()[0]
    if not row["N"] or row["avgdl"] is None:
        # empty corpus, or every content NULL (all tf null → no doc can
        # ever pass the nt filter) — same empty result the lazy form gave
        return spark.createDataFrame([], SCORE_SCHEMA)
    n_lit = F.lit(row["N"])
    avgdl_lit = F.lit(float(row["avgdl"]))
    parts = []
    hits = []
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}")
        dfc = F.lit(float(row[f"__df{i}"]))
        idf = F.log(F.lit(1.0) + (n_lit - dfc + 0.5) / (dfc + 0.5))
        parts.append(idf * tf * (k1 + 1.0)
                     / (tf + k1 * (1.0 - b + b * F.col("dl")
                                   / avgdl_lit)))
    # nt counts terms present in the doc (== the old per-doc row count)
    for i in range(len(terms)):
        hits.append((F.col(f"__tf{i}") > 0).cast("int"))
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    nt = hits[0]
    for h in hits[1:]:
        nt = nt + h
    agg = proj.select("doc_id", score.alias("score"), nt.alias("nt"))
    if mode == "and":
        agg = agg.filter(F.col("nt") == len(terms))
    else:
        agg = agg.filter(F.col("nt") >= 1)
    return agg.select("doc_id", "score")


def _bm25_scores_tokens(docs: DataFrame, terms: list[str], *, id_col: str,
                        content_col: str, mode: str,
                        k1: float, b: float) -> DataFrame:
    """Token-array scorer (the pre-r6 shape) — fallback for very wide
    queries where one regexp_count column per term stops being a win."""
    from harvester_spark.functions.tokenize import tokens_bundle

    src = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(content_col).alias("content"))

    def match(toks):
        return F.struct(
            F.size(toks).alias("dl"),
            F.filter(toks, lambda t: t.isin(terms)).alias("matched"))

    from pyspark import StorageLevel
    tok0 = (src.select("doc_id", tokens_bundle("content", match))
            .persist(StorageLevel.MEMORY_ONLY))
    stats = tok0.agg(F.count("*").alias("N"),
                     F.avg("dl").alias("avgdl"))
    tok = (tok0.filter(F.size("matched") > 0)
           .select("doc_id", "dl", F.explode("matched").alias("term")))
    tf = tok.groupBy("doc_id", "term", "dl").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf", F.log(F.lit(1.0)
                                       + (F.col("N") - F.col("df") + 0.5)
                                       / (F.col("df") + 0.5)))
              .withColumn("part", F.col("idf") * F.col("tf") * (k1 + 1.0)
                          / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                                 / F.col("avgdl")))))
    agg = scored.groupBy("doc_id").agg(F.sum("part").alias("score"),
                                       F.count("*").alias("nt"))
    if mode == "and":
        agg = agg.filter(F.col("nt") == len(terms))
    return agg.select("doc_id", "score")


def query_topk_dataframe(docs: DataFrame, query: str, k: int, *,
                         id_col: str = "doc_id", content_col: str = "content",
                         mode: str = "or", k1: float = 1.2,
                         b: float = 0.75) -> DataFrame:
    """Top-k BM25 over a raw documents DataFrame, no prebuilt index.

    Whole plan is Catalyst-visible: the term filter lands right above the
    scan, the tf/df aggregations get map-side partial agg, the final top-k
    plans as TakeOrderedAndProject. Returns (doc_id, score)."""
    scores = bm25_scores(docs, query, id_col=id_col, content_col=content_col,
                         mode=mode, k1=k1, b=b)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# --------------------------------------------------------------------------
# Path B: prebuilt compressed index + block-max pruning
# --------------------------------------------------------------------------

def _decode_block_rows(pdf: pd.DataFrame, idf_by_term: dict[str, float],
                       k1: float, b: float, avgdl: float) -> pd.DataFrame:
    """Decode a batch of posting-block rows → (doc_id, score_part) rows."""
    from harvester_spark.operators.codec import decode_doc_ids, varint_decode

    ids_out: list[np.ndarray] = []
    parts_out: list[np.ndarray] = []
    for row in pdf.itertuples(index=False):
        n = int(row.doc_count)
        ids = decode_doc_ids(int(row.doc_id_first), bytes(row.deltas), n)
        tf = varint_decode(bytes(row.tfs)).astype(np.float64)
        dl = varint_decode(bytes(row.dls)).astype(np.float64)
        idf = idf_by_term[row.term]
        # parenthesized identically to the encoder's tfnorm so that
        # part <= idf * block_max_tfnorm holds bit-exactly
        tfnorm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        part = idf * tfnorm
        ids_out.append(ids)
        parts_out.append(part)
    if not ids_out:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return pd.DataFrame({"doc_id": np.concatenate(ids_out),
                         "score": np.concatenate(parts_out)})


class IndexHandle:
    """An opened index: metadata + (optionally cached) dictionary and
    postings DataFrames. Re-using a handle across queries removes the
    per-query parquet re-scan — the engine's equivalent of Solr keeping its
    searcher open (the reference re-queries one long-lived Solr,
    harvester/fetcher/solr_fetcher.py:14)."""

    def __init__(self, spark: SparkSession, index_dir: str | Path,
                 cache: bool = True, collect_dictionary_max: int = 2_000_000):
        self.spark = spark
        self.index_dir = Path(index_dir)
        self.meta = tables.read_meta(self.index_dir / "postings")
        self.dictionary = tables.read_table(spark,
                                            self.index_dir / "dictionary")
        ub_dir = self.index_dir / "term_ub"
        if tables.is_committed(ub_dir):
            self.dictionary = self.dictionary.join(
                tables.read_table(spark, ub_dir), "term", "left")
        self.postings = tables.read_table(spark, self.index_dir / "postings")
        if cache:
            # at 100 TB: cache the dictionary (small) always; postings
            # caching is a working-set decision left to the deployment
            self.dictionary = self.dictionary.cache()
            self.postings = self.postings.cache()
        # term lookup, best-available tier:
        # 1. front-coded dictionary segment (index built with the dictseg
        #    stage): µs lookups at ANY vocabulary size, driver memory =
        #    block leaders only — removes the old 2M hash-map ceiling
        # 2. collected hash map when the vocabulary fits the cap
        # 3. per-query cached-scan job (one tiny Spark job)
        self.term_info: dict[str, dict] | None = None
        self.dict_segment = None
        from harvester_spark.operators import dictseg as _dictseg
        seg_dir = self.index_dir / "dictseg"
        if _dictseg.is_committed(seg_dir):
            self.dict_segment = _dictseg.DictSegment(seg_dir)
            return
        if collect_dictionary_max <= 0:
            return  # ad-hoc path: no vocabulary scan job at all
        n_terms = self.dictionary.count()
        if n_terms <= collect_dictionary_max:
            cols = self.dictionary.columns
            self.term_info = {
                r["term"]: {"df": r["df"], "idf": float(r["idf"]),
                            "max_tfnorm": (float(r["max_tfnorm"])
                                           if "max_tfnorm" in cols
                                           and r["max_tfnorm"] is not None
                                           else None)}
                for r in self.dictionary.collect()}

    def lookup(self, terms: list[str]) -> dict[str, dict]:
        """term → {df, idf, max_tfnorm} for the present query terms."""
        if self.dict_segment is not None:
            return self.dict_segment.lookup(terms)
        if self.term_info is not None:
            return {t: self.term_info[t] for t in terms
                    if t in self.term_info}
        cols = self.dictionary.columns
        rows = (self.dictionary.filter(F.col("term").isin(terms)).collect())
        return {r["term"]: {"df": r["df"], "idf": float(r["idf"]),
                            "max_tfnorm": (float(r["max_tfnorm"])
                                           if "max_tfnorm" in cols
                                           and r["max_tfnorm"] is not None
                                           else None)}
                for r in rows}

    def unpersist(self) -> None:
        self.dictionary.unpersist()
        self.postings.unpersist()
        if self.dict_segment is not None:
            self.dict_segment.close()
            self.dict_segment = None

    # -- interactive serving path ------------------------------------------
    # The reference serves queries from a long-lived Solr at ~ms latency;
    # Spark's job model floors any distributed query at ~100s of ms. For
    # interactive use, a query node pulls the (compressed) postings of the
    # query's terms once — a pushed-down scan — and scores in-process.

    # resident decoded-postings budget for the serving cache: ~24 B/entry
    # (three float64/int64 arrays), so 8M entries ≈ 200 MB — a serving
    # node's hot working set, NOT unbounded lifetime growth (r4 verdict
    # #4: a long-lived node querying a wide vocabulary accumulated GBs).
    # Override per-handle by assigning the attribute.
    term_cache_max_entries: int = 8_000_000

    def _term_postings(self, term: str):
        if not hasattr(self, "_term_cache"):
            from collections import OrderedDict
            self._term_cache: "OrderedDict[str, tuple]" = OrderedDict()
            self._term_cache_entries = 0
        cache = self._term_cache
        if term not in cache:
            from harvester_spark.operators.codec import (decode_doc_ids,
                                                         varint_decode)
            rows = (self.postings.filter(F.col("term") == term)
                    .select("doc_id_first", "doc_count", "deltas", "tfs",
                            "dls").collect())
            ids_l, tf_l, dl_l = [], [], []
            for r in rows:
                ids_l.append(decode_doc_ids(int(r["doc_id_first"]),
                                            bytes(r["deltas"]),
                                            int(r["doc_count"])))
                tf_l.append(varint_decode(bytes(r["tfs"])))
                dl_l.append(varint_decode(bytes(r["dls"])))
            if ids_l:
                cache[term] = (
                    np.concatenate(ids_l),
                    np.concatenate(tf_l).astype(np.float64),
                    np.concatenate(dl_l).astype(np.float64))
            else:
                cache[term] = (np.empty(0, np.int64),
                               np.empty(0), np.empty(0))
            # charge a small constant floor per cached term: absent/rare
            # terms decode to ~empty postings but still cost an
            # OrderedDict slot + three array objects, so a workload
            # probing many distinct absent terms must still trigger
            # eviction (the accounting floor mirrors the real overhead)
            self._term_cache_entries += max(len(cache[term][0]), 64)
            # entries-bounded LRU (dictseg block-cache pattern): evict the
            # coldest term, but never the one just decoded — a single
            # term wider than the whole budget still gets served
            while (self._term_cache_entries > self.term_cache_max_entries
                   and len(cache) > 1):
                _, old = cache.popitem(last=False)
                self._term_cache_entries -= max(len(old[0]), 64)
        else:
            cache.move_to_end(term)
        return cache[term]

    def topk_local(self, query: str, k: int, *, mode: str = "or",
                   local_postings_cap: int = 2_000_000) -> pd.DataFrame:
        """ms-latency top-k served driver-side from cached term postings.

        Rank-identical to the distributed path (same float64 formula, same
        tie rule). Intended for interactive serving of moderate-df terms; a
        pathological term's postings (~GBs at 10^12 docs) must NOT be
        collected, so when the yet-uncached postings for this query exceed
        ``local_postings_cap`` entries (dictionary df is already
        driver-resident — the check is free) the query is AUTO-ROUTED to
        the distributed block-max path instead of collecting."""
        k1, b, avgdl = self.meta["k1"], self.meta["b"], self.meta["avgdl"]
        terms = tokenize_query(query)
        info = self.lookup(terms)
        present = [t for t in terms if t in info]
        if not present or (mode == "and" and len(present) < len(terms)):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        cached = getattr(self, "_term_cache", {})
        pending = sum(int(info[t]["df"]) for t in present if t not in cached)
        if pending > local_postings_cap:
            dist = query_topk_index(self.spark, self, query, k, mode=mode)
            pdf = dist.toPandas()
            return pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "score": pdf["score"].astype("float64")})
        all_ids, all_parts = [], []
        for t in present:
            ids, tf, dl = self._term_postings(t)
            tfnorm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            all_ids.append(ids)
            all_parts.append(info[t]["idf"] * tfnorm)
        ids = np.concatenate(all_ids)
        parts = np.concatenate(all_parts)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.bincount(inv, weights=parts)
        if mode == "and":
            nt = np.bincount(inv)
            keep = nt == len(present)
            uniq, scores = uniq[keep], scores[keep]
        order = np.lexsort((uniq, -scores))[:k]
        return pd.DataFrame({"doc_id": uniq[order], "score": scores[order]})


def open_index(spark: SparkSession, index_dir: str | Path,
               cache: bool = True) -> IndexHandle:
    return IndexHandle(spark, index_dir, cache=cache)


_EPS = 1.0 - 1e-12  # slack for ub-vs-decoded float comparisons


def _per_term_max_ub(blocks: DataFrame, info: dict, present: list[str],
                     idf_by_term: dict[str, float]) -> dict[str, float]:
    """Exact per-term global UB: from the build-time term_ub stage when
    available, else one aggregation job (pre-term_ub indexes)."""
    if all(info[t].get("max_tfnorm") is not None for t in present):
        return {t: idf_by_term[t] * info[t]["max_tfnorm"] for t in present}
    return {r["term"]: r["mx"] for r in
            blocks.groupBy("term").agg(F.max("ub").alias("mx")).collect()}


def _localized_other_ub(blocks: DataFrame, per_term: dict[str, float],
                        range_docs: int) -> DataFrame:
    """Range-localized complement bounds: for every (term, doc-range)
    cell, ``other_ub`` = Σ over OTHER query terms of their max block UB
    within that range. Sharper than the global Σ maxUB because a term's
    high-tf blocks cluster in doc-id ranges (and a term ABSENT from a
    range contributes zero there). Pure plan fragment — no driver
    collect; Catalyst folds it into the query job."""
    W = range_docs
    rng = blocks.select(
        "term",
        F.explode(F.sequence((F.col("doc_id_first") / W).cast("long"),
                             (F.col("doc_id_last") / W).cast("long")))
        .alias("rid"),
        "ub")
    per_tr = rng.groupBy("term", "rid").agg(F.max("ub").alias("mx"))
    per_r = per_tr.groupBy("rid").agg(F.sum("mx").alias("tot"))
    return (per_tr.join(per_r, "rid")
            .select("term", "rid",
                    (F.col("tot") - F.col("mx")).alias("other_ub")))


def _theta_filter_localized(blocks: DataFrame, present: list[str],
                            per_term: dict[str, float], theta: float,
                            range_docs: int,
                            bound_blocks: DataFrame | None = None
                            ) -> DataFrame:
    """Keep only blocks whose localized upper bound can reach θ.

    Safety: for a doc d inside block b of term t, score(d) ≤ ub_t(b) +
    Σ_{s≠t} maxUB_s(range(d)); d's range lies within [rid_first,
    rid_last] of b. Blocks spanning ≤2 ranges use greatest(other at
    rid_first, other at rid_last) — exact; wider-spanning blocks fall
    back to the GLOBAL complement sum (safe, never sharper than truth).
    A (term, range) pair missing from the localized table means no other
    term has any block there → other_ub = 0.

    ``bound_blocks``: the block set the complement bounds are computed
    over. When θ refinement split off an already-decoded probe slice,
    pass the FULL pre-split set here — a doc's probe contributions are
    real score mass; bounding the complement from the rest-only slice
    would under-count it and prune unsafely."""
    W = range_docs
    # ONE collect of the (term, rid, other_ub) table, then two LOCAL
    # relations for the rid_first/rid_last probes: referencing the lazy
    # `other` plan from both broadcasts re-computed its two-aggregation
    # subtree twice (two broadcast-build jobs scanning the postings cache);
    # a local relation broadcast builds driver-side with zero scan jobs.
    # Size class is unchanged — this exact table was already broadcast.
    other_pdf = _localized_other_ub(
        bound_blocks if bound_blocks is not None else blocks,
        per_term, W).toPandas()
    spark = blocks.sparkSession
    other = spark.createDataFrame(
        other_pdf, "term string, rid bigint, other_ub double")
    total_ub = sum(per_term.values())
    global_other = F.create_map(*[x for t in present for x in
                                  (F.lit(t), F.lit(total_ub - per_term[t]))])
    o1 = other.select(F.col("term").alias("t1"), F.col("rid").alias("r1"),
                      F.col("other_ub").alias("ob1"))
    o2 = other.select(F.col("term").alias("t2"), F.col("rid").alias("r2"),
                      F.col("other_ub").alias("ob2"))
    rid_first = (F.col("doc_id_first") / W).cast("long")
    rid_last = (F.col("doc_id_last") / W).cast("long")
    joined = (blocks
              .withColumn("__rf", rid_first).withColumn("__rl", rid_last)
              .join(F.broadcast(o1), (F.col("term") == F.col("t1"))
                    & (F.col("__rf") == F.col("r1")), "left")
              .join(F.broadcast(o2), (F.col("term") == F.col("t2"))
                    & (F.col("__rl") == F.col("r2")), "left"))
    local = F.greatest(F.coalesce(F.col("ob1"), F.lit(0.0)),
                       F.coalesce(F.col("ob2"), F.lit(0.0)))
    eff_other = F.when(F.col("__rl") - F.col("__rf") <= 1, local) \
                 .otherwise(global_other[F.col("term")])
    return (joined.filter(F.col("ub") + eff_other
                          >= F.lit(theta) * _EPS - 1e-300)
            .drop("__rf", "__rl", "t1", "r1", "ob1", "t2", "r2", "ob2"))


def _and_range_prune(spark: SparkSession, blocks: DataFrame, rarest: str,
                     rng_pdf: pd.DataFrame, present: list[str],
                     idf_by_term: dict[str, float], k: int,
                     k1: float, b: float, avgdl: float,
                     exclude: np.ndarray | None = None,
                     probe_frac: float = 0.0,
                     seed_block_cap: int = 4096
                     ) -> tuple[DataFrame, DataFrame] | None:
    """Conjunctive θ-pruning over the rarest term's block ranges.

    For each rare block range R = [lo, hi]: every intersection doc d with
    its rare posting in R has score(d) ≤ ub_rare(R) + Σ_{s≠rare}
    maxUB_s(s-blocks overlapping R) — d's s-block contains d ∈ R so it
    overlaps R. θ = the k-th best FULL intersection score decoded from a
    seed window over the best-bound ranges, a lower bound on the true
    k-th best; ranges whose bound < θ drop with all their blocks.

    θ refinement (``probe_frac`` > 0): the seed window widens from ~1
    range to the top fraction of ranges — a doc in a seed range has
    every posting block overlapping that range, so decoded seed scores
    with one block per present term (nunique == n_terms) are EXACT, and
    a wider window finds a tighter k-th best. The decode stays
    driver-side (a few hundred block rows), capped at
    ``seed_block_cap`` collected blocks — truncation only shrinks the
    candidate pool, never invalidates θ. (A distributed probe was
    measured and rejected: narrow ranges overlap so many other-term
    blocks that the probe decoded ~half the postings before pruning.)

    Returns (pruned rare blocks, surviving ranges) or None when θ cannot
    be established (seed found < k intersection docs — fall back to the
    plain range semi-join, still exact)."""
    n_rng = len(rng_pdf)
    if n_rng == 0:
        return None
    ranges = spark.createDataFrame(
        [(int(r.doc_id_first), int(r.doc_id_last), i)
         for i, r in enumerate(rng_pdf.itertuples(index=False))],
        "lo long, hi long, ridx int")

    # per-range complement sums: max UB per (range, other term) from ONE
    # shuffle, the final per-range sum finished driver-side over the
    # already-collected (ranges × terms)-bounded rows — the second
    # groupBy bought a whole extra exchange + AQE stage for a sum the
    # driver does in microseconds
    others_meta = (blocks.filter(F.col("term") != rarest)
                   .select("term", "doc_id_first", "doc_id_last", "ub"))
    per_rt = (others_meta.join(
        F.broadcast(ranges),
        (F.col("doc_id_last") >= F.col("lo"))
        & (F.col("doc_id_first") <= F.col("hi")))
        .groupBy("ridx", "term").agg(F.max("ub").alias("mx"))
        .toPandas())
    other_sum = np.zeros(n_rng)
    if len(per_rt):
        sums = per_rt.groupby("ridx")["mx"].sum()
        other_sum[sums.index.to_numpy()] = sums.to_numpy()
    bound = rng_pdf["ub"].to_numpy() + other_sum

    # seed window: decode ALL terms' blocks overlapping the best-bound
    # ranges, driver-side; refinement widens the window to probe_frac
    n_seed = min(n_rng, max(1, (4 * k) // 128 + 1,
                            int(probe_frac * n_rng)))
    top = np.argsort(-bound)[:n_seed]
    seed_ranges = spark.createDataFrame(
        [(int(rng_pdf["doc_id_first"].iat[i]),
          int(rng_pdf["doc_id_last"].iat[i])) for i in top],
        "slo long, shi long")
    seed_pdf = (blocks.join(
        F.broadcast(seed_ranges),
        (F.col("doc_id_last") >= F.col("slo"))
        & (F.col("doc_id_first") <= F.col("shi")), "left_semi")
        # deterministic cap: keep the highest-UB blocks (TakeOrdered, not
        # an arbitrary first-seen prefix) so θ is reproducible run-to-run
        .orderBy(F.col("ub").desc(), "term", "doc_id_first")
        .limit(seed_block_cap)
        .select("term", "doc_id_first", "doc_count", "deltas", "tfs", "dls")
        .toPandas())
    if not len(seed_pdf):
        return None
    per_term_frames = []
    for t, grp in seed_pdf.groupby("term"):
        dec = _decode_block_rows(grp, idf_by_term, k1, b, avgdl)
        dec["term"] = t
        per_term_frames.append(dec)
    dec_all = pd.concat(per_term_frames, ignore_index=True)
    agg = dec_all.groupby("doc_id").agg(score=("score", "sum"),
                                        nt=("term", "nunique"))
    if exclude is not None and exclude.size:
        # θ must be the k-th best among docs that can actually be
        # RETURNED: seeding θ from an excluded doc would overshoot the
        # true k-th live score and prune blocks holding live top-k docs
        agg = agg[~agg.index.isin(exclude)]
    inter = agg[agg["nt"] == len(present)]["score"].to_numpy()
    if inter.size < k:
        return None
    theta = float(np.partition(inter, -k)[-k])

    keep_mask = bound >= theta * _EPS - 1e-300
    if keep_mask.all():
        return None  # nothing pruned: skip the extra semi-join plumbing
    kept = spark.createDataFrame(
        [(int(rng_pdf["doc_id_first"].iat[i]),
          int(rng_pdf["doc_id_last"].iat[i]))
         for i in np.nonzero(keep_mask)[0]],
        "lo long, hi long")
    rare_kept = blocks.filter(F.col("term") == rarest).join(
        F.broadcast(kept),
        (F.col("doc_id_first") == F.col("lo"))
        & (F.col("doc_id_last") == F.col("hi")), "left_semi")
    return rare_kept, kept


def _decode_agg(blocks: DataFrame, idf_by_term: dict[str, float],
                k1: float, b: float, avgdl: float) -> DataFrame:
    """Decode posting blocks → per-doc partial sums: (doc_id, score, nt).
    nt counts decoded blocks per doc; a doc has exactly one block per
    matched term, so nt == n_terms ⟺ every posting of the doc was in the
    decoded set ⟺ its score is EXACT (the probe-θ safety argument)."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_block_rows(pdf, idf_by_term, k1, b, avgdl)

    return (blocks.select("term", "doc_id_first", "doc_count", "deltas",
                          "tfs", "dls")
            .mapInPandas(decode, SCORE_SCHEMA)
            .groupBy("doc_id").agg(F.sum("score").alias("score"),
                                   F.count("*").alias("nt")))


def _refine_theta_or(blocks: DataFrame, theta: float, k: int,
                     probe_frac: float, idf_by_term: dict[str, float],
                     k1: float, b: float, avgdl: float,
                     exclude_ids: DataFrame | None,
                     metrics_out: dict | None
                     ) -> tuple[float, DataFrame, DataFrame | None]:
    """Decode-time θ refinement (OR mode): decode the top-UB slice of
    blocks FIRST, refine θ to the k-th best partial per-doc sum, and hand
    the remaining blocks a tighter prune bound.

    Safety: every partial sum ≤ the doc's true score, so the k-th best
    partial is ≤ the true k-th best — always a valid θ. The probe's
    decoded contributions are cached and reused in the final aggregation
    (pre_agg), so nothing is decoded twice.
    Returns (θ, remaining blocks, pre-aggregated probe contributions)."""
    from pyspark import StorageLevel

    cut = blocks.approxQuantile("ub", [1.0 - probe_frac], 0.01)
    if not cut or cut[0] is None:
        return theta, blocks, None
    probe = blocks.filter(F.col("ub") >= cut[0])
    rest = blocks.filter(F.col("ub") < cut[0])
    # MEMORY_ONLY: one cache entry per refined query with no unpersist
    # hook (the handle outlives this function inside the final
    # aggregation plan) — evictable beats disk-accumulating
    probe_agg = (_decode_agg(probe, idf_by_term, k1, b, avgdl)
                 .persist(StorageLevel.MEMORY_ONLY))
    cand = probe_agg
    if exclude_ids is not None:
        cand = cand.join(F.broadcast(exclude_ids.select("doc_id")),
                         "doc_id", "left_anti")
    rows = cand.orderBy(F.desc("score")).limit(k).collect()
    if metrics_out is not None:
        metrics_out["blocks_probe"] = probe.count()
    if len(rows) >= k:
        theta = max(theta, float(rows[-1]["score"]))
    return theta, rest, probe_agg


def _collect_exclude_ids(exclude_ids: DataFrame,
                         cap: int = 2_000_000) -> np.ndarray | None:
    """Tombstoned doc_ids as a driver-side array, or ``None`` when the
    exclusion set exceeds ``cap`` (then callers must fall back to paths
    that don't need it driver-side). Tombstone sets are O(recent deletes)
    — tiny next to the corpus — so the cap exists only as a safety rail."""
    rows = (exclude_ids.select(F.col("doc_id").cast("long"))
            .limit(cap + 1).collect())
    if len(rows) > cap:
        return None
    return np.asarray([r["doc_id"] for r in rows], dtype=np.int64)


def _topk_small_query(spark: SparkSession, blocks: DataFrame,
                      present: list[str], idf_by_term: dict[str, float],
                      k: int, mode: str, k1: float, b: float,
                      avgdl: float,
                      exclude: np.ndarray | None = None) -> DataFrame:
    """Small-query fast path: when the candidate posting volume is tiny
    (known from the dictionary — no extra job), ONE collect job fetches
    the blocks and the driver decodes/scores them, skipping the
    mapInPandas python-worker round and the aggregation shuffle. Same
    float64 formula + tie rule as the distributed path → rank-identical
    (enforced by the same rank-identity tests, which flow through here
    at test-corpus sizes)."""
    pdf = (blocks.select("term", "doc_id_first", "doc_count",
                         "deltas", "tfs", "dls").toPandas())
    if not len(pdf):
        return spark.createDataFrame([], SCORE_SCHEMA)
    frames = []
    for t, grp in pdf.groupby("term"):
        dec = _decode_block_rows(grp, idf_by_term, k1, b, avgdl)
        dec["term"] = t
        frames.append(dec)
    allrows = pd.concat(frames, ignore_index=True)
    agg = allrows.groupby("doc_id").agg(score=("score", "sum"),
                                        nt=("term", "nunique"))
    if mode == "and":
        agg = agg[agg["nt"] == len(present)]
    if exclude is not None and exclude.size:
        agg = agg[~agg.index.isin(exclude)]
    ids = agg.index.to_numpy()
    scores = agg["score"].to_numpy()
    order = np.lexsort((ids, -scores))[:k]
    out = pd.DataFrame({"doc_id": ids[order].astype("int64"),
                        "score": scores[order]})
    return spark.createDataFrame(out, SCORE_SCHEMA)


def query_topk_index(spark: SparkSession,
                     index_dir: str | Path | IndexHandle, query: str,
                     k: int, *, mode: str = "or", prune: bool = True,
                     prune_min_postings: int = 50_000,
                     range_docs: int = 1 << 20,
                     small_query_postings: int = 262_144,
                     refine_theta: bool = True,
                     probe_frac: float = 0.10,
                     refine_min_postings: int = 262_144,
                     exclude_ids: DataFrame | None = None,
                     metrics_out: dict | None = None) -> DataFrame:
    """Top-k BM25 over the prebuilt index with block-max pruning.

    Safety of the pruning (rank-identity guaranteed): θ is the k-th best
    achievable score from a decoded seed — a lower bound on the true k-th
    best. A block is pruned only when ``UB(block) + complement-UB < θ``
    (complement bounds range-localized via :func:`_theta_filter_localized`);
    any document with a posting in that block has true score < θ, so it
    cannot be in the true top-k, and (contrapositive) no true top-k
    document ever loses a block, so surviving scores are exact.

    AND mode combines three exact prunes: (1) every intersection doc lies
    inside the RAREST term's posting-block ranges, so other terms' blocks
    missing all rare ranges drop; (2) θ from a probe window (full
    intersection scores over the best rare ranges); (3) a rare range
    whose ub_rare + Σ_{s≠rare} localized maxUB_s < θ drops WITH its other-
    term blocks.

    Decode-time θ refinement (``refine_theta``, queries above
    ``refine_min_postings``): the top-UB ``probe_frac`` of blocks (OR) /
    rare ranges (AND) are decoded FIRST; the k-th best per-doc partial
    sum (OR — partials are lower bounds) or exact intersection score
    (AND — probe docs are fully covered, certified by block count) is a
    valid θ, tighter than the driver-seed θ, so late blocks prune
    against it. Probe contributions are cached and reused in the final
    aggregation — nothing decodes twice. ``metrics_out`` (optional dict)
    receives block-skip accounting (costs count jobs — tests/bench only).
    """
    # ad-hoc (path) calls: no caching, no driver-side dictionary collect —
    # a filtered lookup job beats materializing the vocabulary once
    handle = (index_dir if isinstance(index_dir, IndexHandle)
              else IndexHandle(spark, index_dir, cache=False,
                               collect_dictionary_max=0))
    terms = tokenize_query(query)
    meta = handle.meta
    k1, b, avgdl = meta["k1"], meta["b"], meta["avgdl"]

    if not terms:
        return spark.createDataFrame([], SCORE_SCHEMA)

    info = handle.lookup(terms)
    idf_by_term = {t: v["idf"] for t, v in info.items()}
    present = [t for t in terms if t in idf_by_term]
    if not present or (mode == "and" and len(present) < len(terms)):
        return spark.createDataFrame([], SCORE_SCHEMA)

    postings = (handle.postings
                .filter(F.col("term").isin(present)))  # pushed to scan

    idf_map = F.create_map(*[x for t in present
                             for x in (F.lit(t), F.lit(idf_by_term[t]))])
    blocks = postings.withColumn("ub", idf_map[F.col("term")]
                                 * F.col("block_max_tfnorm"))

    total_postings = sum(info[t]["df"] for t in present)

    # exclusion set (tombstones), collected lazily AT MOST once: the
    # small-query and θ-seed paths need it driver-side so that θ is the
    # k-th best score among docs that can actually be returned (seeding
    # from an excluded doc could overshoot and prune live top-k blocks)
    _exc: list = []

    def exclude_set() -> np.ndarray | None:
        if not _exc:
            _exc.append(None if exclude_ids is None
                        else _collect_exclude_ids(exclude_ids))
        return _exc[0]

    # small queries (candidate volume known from the dictionary, no extra
    # job) score driver-side in ONE collect — skips the python-worker
    # decode round + aggregation shuffle; rank-identical. The cap is a
    # driver budget, not a tuning constant: 262k postings ≈ 3 MB of
    # compressed blocks collected + ~6 MB decoded + single-digit ms of
    # numpy scoring, vs 10+ sequential micro-jobs (seed/θ/probe/decode
    # collects) on the distributed path — measured 2.4 s → 0.25 s for a
    # two-term AND query at sf1.0. Corpus-scale common-term queries blow
    # past the cap immediately and keep the pruned distributed path.
    if (metrics_out is None and 0 < total_postings <= small_query_postings
            and (exclude_ids is None or exclude_set() is not None)):
        return _topk_small_query(spark, blocks, present, idf_by_term, k,
                                 mode, k1, b, avgdl, exclude=exclude_set())
    if exclude_ids is not None and prune:
        # pruning with exclusions is safe only when the θ seed can be
        # cleaned of excluded docs driver-side; otherwise exactness wins
        prune = exclude_set() is not None
    if metrics_out is not None:
        metrics_out["blocks_total"] = blocks.count()

    # pruning pays off only when there is real volume to skip
    pre_agg: DataFrame | None = None  # cached probe contributions (refine)
    if (prune and mode == "and" and len(present) > 1
            and total_postings > prune_min_postings):
        rarest = min(present, key=lambda t: info[t]["df"])
        rare_blocks = blocks.filter(F.col("term") == rarest)
        # (2)+(3): θ-based rare-RANGE pruning, driver-side over the rare
        # block metadata (small: df_rare/block_size rows)
        max_rare_ranges = 50_000
        n_rare_blocks = info[rarest]["df"] // meta.get("block_size", 128) + 1
        if n_rare_blocks <= max_rare_ranges:
            rng_pdf = (rare_blocks
                       .select("doc_id_first", "doc_id_last", "ub")
                       .toPandas())
            refine = (refine_theta
                      and total_postings >= refine_min_postings)
            kept = _and_range_prune(spark, blocks, rarest, rng_pdf, present,
                                    idf_by_term, k, k1, b, avgdl,
                                    exclude=exclude_set(),
                                    probe_frac=probe_frac if refine else 0.0)
            if kept is not None:
                rare_blocks, ranges = kept
            else:
                ranges = (rare_blocks
                          .select(F.col("doc_id_first").alias("lo"),
                                  F.col("doc_id_last").alias("hi")))
        else:
            ranges = (rare_blocks
                      .select(F.col("doc_id_first").alias("lo"),
                              F.col("doc_id_last").alias("hi")))
        # (1) range semi-join: other terms' blocks must overlap a
        # surviving rare range
        others = blocks.filter(F.col("term") != rarest).join(
            F.broadcast(ranges),
            (F.col("doc_id_last") >= F.col("lo"))
            & (F.col("doc_id_first") <= F.col("hi")),
            "left_semi")
        blocks = rare_blocks.unionByName(others)
    if prune and mode == "or" and total_postings > prune_min_postings:
        per_term = _per_term_max_ub(blocks, info, present, idf_by_term)
        # θ: k-th best partial score from the top-UB blocks (driver decode
        # of a handful of rows)
        # r4 sweep (BENCH.md): seed_n = max(8, 4k/bs) left θ short of the
        # pruning ceiling (or:import skip 0.9668 vs 0.9958 achievable); a
        # 4× seed reaches the ceiling — the true top-k live in the top ~30
        # UB blocks here — while 8×/16× add nothing. Driver cost is
        # decoding ~4k postings: negligible against one pruned block.
        seed_n = max(32, (16 * k) // max(meta.get("block_size", 128), 1) + 2)
        seed = blocks.orderBy(F.desc("ub")).limit(seed_n).toPandas()
        seed_sum = (_decode_block_rows(seed, idf_by_term, k1, b, avgdl)
                    .groupby("doc_id")["score"].sum())
        exc = exclude_set()
        if exc is not None and exc.size:
            seed_sum = seed_sum[~seed_sum.index.isin(exc)]
        seed_scores = seed_sum.to_numpy()
        if seed_scores.size >= k:
            theta = float(np.partition(seed_scores, -k)[-k])
            all_blocks = blocks

            def theta_filter(blks: DataFrame, th: float) -> DataFrame:
                if len(present) > 1:
                    return _theta_filter_localized(
                        blks, present, per_term, th, range_docs,
                        bound_blocks=all_blocks)
                return blks.filter(F.col("ub") >= F.lit(th) * _EPS - 1e-300)

            # cheap seed θ filter first; refinement then probes only the
            # SURVIVORS' top-UB slice (probing pre-filter blocks decodes
            # work the seed θ would have skipped for free)
            blocks = theta_filter(blocks, theta)
            if refine_theta and total_postings >= refine_min_postings:
                new_theta, rest, pre_agg = _refine_theta_or(
                    blocks, theta, k, probe_frac, idf_by_term, k1, b,
                    avgdl, exclude_ids, metrics_out)
                if pre_agg is not None and new_theta > theta:
                    blocks = theta_filter(rest, new_theta)
                elif pre_agg is not None:
                    blocks = rest  # probe decoded; rest already filtered
    if metrics_out is not None:
        metrics_out["blocks_scored"] = (blocks.count()
                                        + metrics_out.get("blocks_probe", 0))
        tot = metrics_out["blocks_total"]
        metrics_out["block_skip_ratio"] = round(
            1.0 - metrics_out["blocks_scored"] / tot, 4) if tot else 0.0

    agg = _decode_agg(blocks, idf_by_term, k1, b, avgdl)
    if pre_agg is not None:
        agg = (agg.unionByName(pre_agg)
               .groupBy("doc_id").agg(F.sum("score").alias("score"),
                                      F.sum("nt").alias("nt")))
    if mode == "and":
        agg = agg.filter(F.col("nt") == len(present))
    if exclude_ids is not None:
        # excluded BEFORE the top-k cut: a post-limit filter would lose
        # live docs ranked behind an excluded one inside the k window
        agg = agg.join(F.broadcast(exclude_ids.select("doc_id")),
                       "doc_id", "left_anti")
    return (agg.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def lookup_doc(spark: SparkSession, docs: DataFrame, doc_id: int) -> DataFrame:
    """Exact-match doc lookup (the reference's ``db.get(id)`` / Solr id query,
    harvester/solr_updater.py:929)."""
    return docs.filter(F.col("doc_id") == doc_id)
