"""Tokenization — the analyzer role Solr plays for the reference.

The reference's only text normalization for search is Solr's analyzer plus
the alphanumeric-space regex it uses for sort keys
(harvester/solr_updater.py:30 ``RE_ALPHANUMSPACE``). Our canonical tokenizer
is deliberately simple and *exactly* expressible in three engines so every
layer can be cross-checked:

- Spark built-ins (JVM, whole-stage codegen):  ``tokens_expr``
- DuckDB SQL (driver oracle):                  ``TOKENIZE_SQL``
- pandas/numpy (vectorized UDF + numpy oracle): ``tokenize_pandas``

Definition: lowercase, split on runs of ``[^a-z0-9_]``, drop empty tokens.
``_`` kept so code identifiers like ``do_thing`` stay whole.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9_]+"
# the match-form of the same definition: a token IS a maximal [a-z0-9_]+ run
TOKEN_MATCH_RE = r"[a-z0-9_]+"

# DuckDB-side equivalent (format with the source column name):
TOKENIZE_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9_]+'), t -> t <> '')"
)


def tokens_expr(col: str | Column) -> Column:
    """array<string> of tokens — pure built-ins, stays in codegen.

    Implemented as ``regexp_extract_all`` of the MATCH form (maximal
    ``[a-z0-9_]+`` runs) rather than split-on-complement + drop-empties:
    the two are set-identical by construction (extracting maximal word
    runs ≡ splitting on the complement and dropping empty fragments —
    asserted row-for-row in tests/test_tokenize.py), but Spark 4's
    ``StringSplit`` + higher-order ``filter`` path measured ~12× slower
    (2.83 s vs 0.22 s for a full sf1.0 tokenize pass; guide §1 numbers in
    OPTIMIZATION_r06.md) — split allocates the empty fragments and runs
    the drop-filter interpreted, extract-all emits exactly the tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_MATCH_RE), 0)


def doc_len_expr(col: str | Column) -> Column:
    """Token count per document (BM25 ``dl``) — built-ins only."""
    return F.size(tokens_expr(col))


def tokenize_pandas(content: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer: Series[str] -> Series[list[str]].

    Same definition as :func:`tokens_expr`; used inside Arrow-batched UDFs
    and by the numpy oracle. All work happens in pandas' C string kernels.
    """
    toks = content.fillna("").str.lower().str.split(TOKEN_SPLIT_RE, regex=True)
    # drop empty strings produced by leading/trailing separators
    return toks.map(lambda ts: [t for t in ts if t])


def term_frequencies_pandas(content: pd.Series) -> pd.DataFrame:
    """Per-document term frequencies, computed batch-at-a-time.

    Input: Series of document text indexed 0..n-1.
    Output: DataFrame (_pos, term, tf) — one row per distinct term per doc.

    Implementation runs on pyarrow compute kernels (contiguous buffers,
    single-pass C++): ~4× less memory traffic than pandas object-dtype
    string ops, which matters because tokenization at high parallelism is
    memory-bandwidth-bound, not CPU-bound. Token semantics are identical
    to :func:`tokens_expr` / ``TOKENIZE_SQL`` (parity-tested).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(content.fillna(""))
    splits = pc.split_pattern_regex(pc.utf8_lower(arr), TOKEN_SPLIT_RE)
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits)
    mask = pc.not_equal(flat, "")
    tbl = pa.table({"_pos": pc.filter(parent, mask),
                    "term": pc.filter(flat, mask)})
    if tbl.num_rows == 0:
        return pd.DataFrame({"_pos": pd.Series(dtype="int64"),
                             "term": pd.Series(dtype="object"),
                             "tf": pd.Series(dtype="int64")})
    agg = tbl.group_by(["_pos", "term"]).aggregate([([], "count_all")])
    out = agg.to_pandas()
    out.columns = ["_pos", "term", "tf"]
    out["_pos"] = out["_pos"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return out


def tokens_bundle(col: str | Column, build) -> Column:
    """Evaluate the tokenizer ONCE per row and derive many outputs from it.

    ``build(toks) -> struct(...)`` receives the token array as a
    lambda-BOUND variable (evaluated once in any physical plan — Catalyst
    subexpression elimination does not reach into higher-order-function
    lambdas) and the struct is emitted through ``inline`` (generators
    evaluate their input exactly once). Without this, every reference to
    ``tokens_expr`` re-runs the regex split: langid referenced it 5x per
    row, shingling referenced it per shingle position (O(len^2))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.inline(F.transform(F.array(tokens_expr(c)), build))
