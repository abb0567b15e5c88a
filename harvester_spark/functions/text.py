"""Scalar-function parity with the reference's transform layer (SURVEY §2.9).

Each function re-expresses one of the reference's row-level Python
transforms as a Spark column expression (JVM, codegen) — no UDFs. The
docstrings cite the reference implementation they mirror.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_sort_field(col: str | Column) -> Column:
    """Sort-key derivation (harvester/solr_updater.py:561-573, regex :30):
    lowercase, strip non-alphanumeric-space, collapse whitespace, drop a
    leading article the/a/an."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    s = F.regexp_replace(s, r"[^0-9a-z\s]", "")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    s = F.regexp_replace(s, r"^(the|a|an) ", "")
    return s


def sort_title(col: str | Column) -> Column:
    """add_sort_title (harvester/solr_updater.py:590-608): normalized key,
    '~title unknown' sentinel when empty ('~' sorts after alphanumerics)."""
    s = normalize_sort_field(col)
    return F.when(s == "", F.lit("~title unknown")).otherwise(s)


def facet_decade(year: Column) -> Column:
    """facet_decade (harvester/solr_updater.py:547-558 + external dep):
    year → '1880s'-style bucket, NULL/invalid → 'unknown'."""
    dec = (F.floor(year / 10) * 10).cast("long")
    return (F.when(year.isNull(), F.lit("unknown"))
            .otherwise(F.concat(dec.cast("string"), F.lit("s"))))


def ark_extract(col: str | Column) -> Column:
    """ARK extraction regex (harvester/solr_updater.py:29,302-309):
    first ``ark:/NNNNN/...`` match, empty string if none."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"(ark:/\d{5}/[^/|\s]*)", 1)


def add_slash(col: str | Column) -> Column:
    """Ensure trailing slash (harvester/solr_updater.py:476-478)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.endswith("/"), c).otherwise(F.concat(c, F.lit("/")))


def make_date(col: str | Column) -> Column:
    """make_datetime (harvester/solr_updater.py:197-225): parse
    'YYYY-MM-DD' then bare 'YYYY', else NULL — the two-format coalesce."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date"),
                      F.try_to_timestamp(c, F.lit("yyyy")).cast("date"))


def fix_repeated_year(col: str | Column) -> Column:
    """fix_repeated_displayDate (harvester/post_processing/
    fix_repeated_displayDate.py:5-19): '1984-1984' → '1984'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(\d{4})-\1", r"$1")


def normalize_type(col: str | Column) -> Column:
    """normalize_type (harvester/solr_updater.py:388-418): DCMI type
    normalization with substring rules."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return (F.when(c.contains("physical"), "physical object")
            .when(c.contains("moving"), "moving image")
            .when(c.contains("image"), "image")
            .when(c.contains("text"), "text")
            .when(c.contains("sound"), "sound")
            .when(c.contains("dataset"), "dataset")
            .otherwise(c))


def first_non_blank(*cols: str | Column) -> Column:
    """Fallback-chain projection: first non-null, non-empty value — the
    Nuxeo deep-scan 4-way coalesce over alternative source fields
    (harvester/fetcher/nuxeo_fetcher.py href fallbacks) and every
    try-in-order field access in the mapping layer."""
    normed = [F.nullif(
        F.col(c) if isinstance(c, str) else c, F.lit("")) for c in cols]
    return F.coalesce(*normed)


def ucsd_ark(frag: str | Column) -> Column:
    """UCSD ark synthesis (harvester/solr_updater.py:320-333):
    ``ark:/20775/<object id>``; NULL passes through."""
    c = F.col(frag) if isinstance(frag, str) else frag
    return F.when(c.isNotNull(), F.concat(F.lit("ark:/20775/"), c))


def ucla_ark(mangled: str | Column) -> Column:
    """UCLA ark synthesis (harvester/solr_updater.py:337-359): MODS record
    identifiers arrive as 'NAAN-arkid' (e.g. '21198-zz002b1833') →
    'ark:/NAAN/arkid'. Inputs without exactly one '-' yield NULL, like the
    reference's split-failure path."""
    c = F.col(mangled) if isinstance(mangled, str) else mangled
    naan = F.split(c, "-")[0]
    arkid = F.split(c, "-")[1]
    ok = c.isNotNull() & (F.size(F.split(c, "-")) == 2) & (naan != "") \
        & (arkid != "")
    return F.when(ok, F.concat(F.lit("ark:/"), naan, F.lit("/"), arkid))


def dedupe_list(col: str | Column) -> Column:
    """Order-preserving first-wins in-list dedup
    (harvester/post_processing/dedupe_sourceresource.py:4-17):
    Spark's array_distinct keeps first occurrences."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(c)
