"""Nested / dynamic metadata functions (SURVEY §2.9 gaps).

The reference's records carry heterogeneous nested metadata (CouchDB JSON);
these re-express its recursive-Python helpers as Spark column expressions —
JVM-side, codegen-friendly, no UDFs:

- :func:`dejson_str` / :func:`dejson_struct` / :func:`dejson_array` —
  harvester/solr_updater.py:137-180 (``dejson`` + ``unpack_if_json``)
- :func:`setprop` — harvester/post_processing/
  batch_update_couchdb_by_collection.py:11-48 (path-addressed nested
  mutation with list fan-out + substring replace)
- :func:`map_date_expr` / :func:`unpack_date_expr` —
  harvester/solr_updater.py:228-299 (date structs/lists → displays +
  min-start/min-end with symmetric fill)
- :func:`facet_decade_display` — harvester/solr_updater.py:547-558 + the
  public ucldc ``facet_decade`` helper: display-date STRING (incl. ranges)
  → list of decade buckets, ['unknown'] fallback
- :func:`dynamic_fields_map` — harvester/fetcher/emuseum_fetcher.py:26-63:
  records with per-record field names → MapType column
- :func:`remove_blanks` / :func:`project_field` /
  :func:`project_field_to_many` — harvester/solr_updater.py:33-62
  (``dict_for_data_field`` blank-removal projection and its 1→N fan-out)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harvester_spark.functions.text import make_date


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# dejson — dynamic/nested JSON value flattening
# ---------------------------------------------------------------------------

def dejson_str(col: str | Column) -> Column:
    """Flatten a possibly-JSON string to its display value
    (solr_updater.py:156-180 via unpack_if_json :156-168): a valid JSON
    object contributes its ``name`` member; anything else (invalid JSON,
    scalar JSON, object without ``name``) passes through unchanged.
    ``get_json_object`` returns NULL on every non-match, so one coalesce
    covers all branches."""
    c = _c(col)
    return F.coalesce(F.get_json_object(c, "$.name"), c)


def dejson_struct(col: str | Column) -> Column:
    """Flatten an already-parsed metadata struct: ``item`` → ``name`` →
    ``text``, first non-null (solr_updater.py:170-175)."""
    c = _c(col)
    return F.coalesce(c["item"], c["name"], c["text"])


def dejson_array(col: str | Column) -> Column:
    """List-mapped :func:`dejson_str` (solr_updater.py:150-154)."""
    return F.transform(_c(col), lambda x: F.coalesce(
        F.get_json_object(x, "$.name"), x))


def _variant_truthy(x: Column) -> Column:
    """Approximate the reference's ``if flatdata:`` guard for metadata
    values: non-null, non-empty-string, non-empty-array. (Numeric 0/false
    are treated as truthy here — display metadata never carries them.)"""
    s = x.try_cast("string")
    arr = x.try_cast("array<variant>")
    return (x.isNotNull()
            & ~F.coalesce(s == "", F.lit(False))
            & ~F.coalesce(F.size(arr) == 0, F.lit(False)))


def dejson_deep(col: str | Column, *, depth: int = 6) -> Column:
    """Arbitrary-depth ``dejson`` (solr_updater.py:137-180) over a JSON
    string column, via Spark 4 VariantType — the heterogeneous nesting
    (lists of dicts of lists, any shape per row) that static struct
    schemas cannot hold.

    Exactly the reference's recursion, depth-bounded (``depth`` levels of
    LIST nesting; deeper values pass through unchanged):

    - list  → element-wise recursion (solr_updater.py:150-154)
    - dict  → first non-null of ``item``/``name``/``text``; a falsy
      extracted value keeps the ORIGINAL dict (the ``if flatdata:`` guard,
      :170-175); the extracted value is NOT recursed into, same as the
      reference
    - string that parses as a JSON object → its ``name`` member if present
      (``unpack_if_json``, :156-168)
    - anything else passes through — including column values that are NOT
      valid JSON at all (``try_parse_json``; the reference's ``getjobj``
      swallows the ValueError and returns the data unchanged)

    Divergence (variant cannot express it): a JSON-null ``item``/``name``/
    ``text`` member reads as ABSENT, where the reference's ``dict.get``
    chain would stop at the null. Returns a VARIANT column; cast to
    string for JSON text, or ``try_cast`` to a concrete type."""

    def pick(c: Column) -> Column:
        got = F.coalesce(
            F.try_variant_get(c, "$.item", "variant"),
            F.try_variant_get(c, "$.name", "variant"),
            F.try_variant_get(c, "$.text", "variant"))
        # bind `got` once (transform(array(x), λ) + element_at): HOF lambda
        # args are variables; multiple Column references re-evaluate trees
        return F.element_at(
            F.transform(F.array(got),
                        lambda g: F.when(_variant_truthy(g), g)), 1)

    def embedded(c: Column) -> Column:
        # only STRING scalars re-parse (a dict's own JSON text must not
        # round-trip through the name-unpack a second time)
        p = F.try_parse_json(c.try_cast("string"))
        return F.when(F.schema_of_variant(c) == "STRING",
                      F.try_variant_get(p, "$.name", "variant"))

    def dj(c: Column, d: int) -> Column:
        if d <= 0:
            return c
        arr = c.try_cast("array<variant>")
        mapped = F.when(
            arr.isNotNull(),
            F.transform(arr, lambda x: dj(x, d - 1)).cast("variant"))
        return F.coalesce(mapped, pick(c), embedded(c), c)

    # bind the parsed variant once — dj references its argument ~6 times.
    # Invalid JSON (try_parse_json → NULL) falls back to the raw string
    # wrapped as a variant scalar, mirroring the reference's pass-through.
    c = _c(col)
    flattened = F.element_at(
        F.transform(F.array(F.try_parse_json(c)),
                    lambda v: dj(v, depth)), 1)
    return F.coalesce(flattened, c.cast("variant"))


def dejson_deep_str(col: str | Column, *, depth: int = 6) -> Column:
    """:func:`dejson_deep` rendered for display/compare: string scalars
    come back raw (unquoted), everything else as compact JSON text."""
    v = dejson_deep(col, depth=depth)
    return F.element_at(
        F.transform(F.array(v), lambda x: F.when(
            F.schema_of_variant(x) == "STRING", x.try_cast("string"))
            .otherwise(x.cast("string"))), 1)


# ---------------------------------------------------------------------------
# setprop — path-addressed nested mutation
# ---------------------------------------------------------------------------

def _leaf_type(schema: T.StructType, segs: list[str]) -> T.DataType:
    dt: T.DataType = schema
    for s in segs:
        if not isinstance(dt, T.StructType):
            raise KeyError(f"Path segment {s!r} is not inside a struct")
        dt = dt[s].dataType
    return dt


def setprop(df: DataFrame, path: str, value, substring: str | None = None,
            *, delim: str = "/") -> DataFrame:
    """Set/patch the nested field addressed by ``path`` (the Spark-native
    ``setprop``, batch_update_couchdb_by_collection.py:11-48).

    - leaf is a string: replace ``substring`` with ``value`` (or overwrite
      with ``value`` when ``substring`` is None)
    - leaf is an array: the same applied to EVERY element (the reference's
      list fan-out)

    Unlike the reference's in-place dict mutation this is a pure column
    rewrite — ``withField`` rebuilds only the touched struct path, columns
    around it are untouched (and at 100 TB, never shuffled)."""
    segs = [s for s in path.strip(delim).split(delim) if s]
    if not segs:
        raise KeyError("empty path")
    leaf_dt = _leaf_type(df.schema, segs)

    def patch_leaf(leaf: Column) -> Column:
        if isinstance(leaf_dt, T.ArrayType):
            if substring is None:
                return F.transform(leaf, lambda _: F.lit(value))
            return F.transform(
                leaf, lambda x: F.replace(x, F.lit(substring), F.lit(value)))
        if substring is None:
            return F.lit(value)
        return F.replace(leaf, F.lit(substring), F.lit(value))

    top = segs[0]
    if len(segs) == 1:
        return df.withColumn(top, patch_leaf(F.col(top)))

    def rebuild(col: Column, rest: list[str]) -> Column:
        if len(rest) == 1:
            return col.withField(rest[0], patch_leaf(col[rest[0]]))
        return col.withField(rest[0], rebuild(col[rest[0]], rest[1:]))

    return df.withColumn(top, rebuild(F.col(top), segs[1:]))


# ---------------------------------------------------------------------------
# nested date handling
# ---------------------------------------------------------------------------

def unpack_date_expr(col: str | Column) -> Column:
    """date structs list → struct(displays, starts, ends)
    (solr_updater.py:243-268). Input: array<struct<displayDate, begin,
    end>>; begin/end parse via the two-format make_datetime rule."""
    c = _c(col)
    displays = F.transform(c, lambda d: d["displayDate"])
    starts = F.filter(F.transform(c, lambda d: make_date(d["begin"])),
                      lambda x: x.isNotNull())
    ends = F.filter(F.transform(c, lambda d: make_date(d["end"])),
                    lambda x: x.isNotNull())
    return F.struct(displays.alias("dates"), starts.alias("starts"),
                    ends.alias("ends"))


def map_date_expr(col: str | Column) -> Column:
    """map_date (solr_updater.py:271-299): displays + sort_date_start =
    MIN(begin), sort_date_end = MIN(end) (the reference sorts and takes
    [0]), symmetric fill when only one side exists."""
    u = unpack_date_expr(col)
    start = F.array_min(u["starts"])
    end = F.array_min(u["ends"])
    return F.struct(
        u["dates"].alias("date"),
        F.coalesce(start, end).alias("sort_date_start"),
        F.coalesce(end, start).alias("sort_date_end"))


# ---------------------------------------------------------------------------
# facet_decade over display-date strings (full reference semantics)
# ---------------------------------------------------------------------------

def facet_decade_display(col: str | Column, *, max_year: int = 2026) -> Column:
    """Display-date string → array of decade buckets (public ucldc
    facet_decade semantics behind solr_updater.py:547-558): every 4-digit
    year in the string, clamped to [1000, max_year]; buckets run from the
    min year's decade through the max year, step 10, as '1950s' strings;
    ['unknown'] when nothing parses. ``max_year`` is pinned (not "today")
    so results are deterministic across engines and runs.

    Digit runs longer than 4 are blanked first — Java regex could guard
    with lookarounds but RE2-based engines (the DuckDB oracle) cannot, so
    both sides share this two-step form."""
    c = _c(col)
    cleaned = F.regexp_replace(c, r"\d{5,}", " ")
    years = (F.transform(F.regexp_extract_all(cleaned, F.lit(r"(\d{4})"), 1),
                         lambda y: y.cast("int")))
    years = F.filter(years, lambda y: (y >= 1000) & (y <= max_year))
    lo = (F.floor(F.array_min(years) / 10) * 10).cast("int")
    hi = F.array_max(years)
    decades = F.transform(F.sequence(lo, hi, F.lit(10)),
                          lambda d: F.concat(d.cast("string"), F.lit("s")))
    return (F.when(F.size(years) == 0, F.array(F.lit("unknown")))
            .otherwise(decades))


# ---------------------------------------------------------------------------
# registry collection/repository/campus fan-out (map_registry_data)
# ---------------------------------------------------------------------------

def map_registry_data_expr(col: str | Column) -> Column:
    """The registry→solr-field composite (map_registry_data,
    solr_updater.py:485-544): a document's array of collection structs →
    parallel display arrays, one struct column.

    Input element shape: struct<id, name, campus: array<struct<id, name>>,
    repository: array<struct<id, name, campus: array<struct<name>>>>>.

    - collection_url/name/data: per collection; data = url::name with
      trailing-slash-normalized url (add_slash, :476-478)
    - repository_url/name/data: flattened over every collection's
      repositories; data gains ::campus[0].name when the repo has a campus
    - campus_url/name/data: the LAST collection carrying a campus wins
      (the reference reassigns the lists per matching collection).
      Divergence: the reference's campus_names comprehension iterates
      ``c`` but reads the leaked ``campus`` loop variable — a Python-2
      bug that fills the list with one repeated name; here names map
      campus-wise, the evident intent.

    All transform/flatten expressions — no explode, no shuffle: at 100 TB
    this is a per-row rewrite inside whole-stage codegen."""
    from harvester_spark.functions.text import add_slash
    c = _c(col)

    def per_repo(x, fn):
        # a collection with NO repository list contributes an EMPTY slice:
        # flatten() returns NULL outright if any element array is NULL,
        # which would wipe every repository_* field for the whole doc the
        # moment one collection lacks repositories. (The reference raises
        # OldCollectionException there; skip semantics are the usable
        # superset for mixed feeds.) Coalesce AFTER the transform — its
        # output type (array<string>) is known regardless of input schema.
        return F.coalesce(F.transform(x["repository"], fn),
                          F.array().cast("array<string>"))

    def coll_data(x):
        return F.concat_ws("::", add_slash(x["id"]), x["name"])

    def repo_data(r):
        return F.when(
            r["campus"].isNotNull() & (F.size(r["campus"]) > 0),
            F.concat_ws("::", add_slash(r["id"]), r["name"],
                        r["campus"][0]["name"])) \
            .otherwise(F.concat_ws("::", add_slash(r["id"]), r["name"]))

    with_campus = F.filter(
        c, lambda x: x["campus"].isNotNull() & (F.size(x["campus"]) > 0))
    last_campus = F.element_at(with_campus, -1)["campus"]
    return F.struct(
        F.transform(c, lambda x: add_slash(x["id"]))
        .alias("collection_url"),
        F.transform(c, lambda x: x["name"]).alias("collection_name"),
        F.transform(c, coll_data).alias("collection_data"),
        F.flatten(F.transform(
            c, lambda x: per_repo(x, lambda r: add_slash(r["id"]))))
        .alias("repository_url"),
        F.flatten(F.transform(
            c, lambda x: per_repo(x, lambda r: r["name"])))
        .alias("repository_name"),
        F.flatten(F.transform(c, lambda x: per_repo(x, repo_data)))
        .alias("repository_data"),
        F.when(F.size(with_campus) > 0, F.transform(
            last_campus, lambda k: add_slash(k["id"])))
        .alias("campus_url"),
        F.when(F.size(with_campus) > 0, F.transform(
            last_campus, lambda k: k["name"])).alias("campus_name"),
        F.when(F.size(with_campus) > 0, F.transform(
            last_campus, lambda k: F.concat_ws(
                "::", add_slash(k["id"]), k["name"]))).alias("campus_data"))


# ---------------------------------------------------------------------------
# dynamic fields → MapType (eMuseum-style heterogeneous records)
# ---------------------------------------------------------------------------

def dynamic_fields_map(entries: str | Column) -> Column:
    """array<struct<name, value>> → map<name, value>
    (emuseum_fetcher.py:26-63: per-record field names decided by the data).
    Later duplicates win, matching dict.update in the reference loop —
    made explicit (keep each name's LAST entry) because Spark 4's default
    mapKeyDedupPolicy raises on duplicates."""
    e = _c(entries)
    last_wins = F.filter(
        e, lambda x, i: ~F.exists(
            F.slice(e, i + F.lit(2), F.size(e)),
            lambda y: y["name"] == x["name"]))
    return F.map_from_entries(last_wins)


def json_to_map(col: str | Column) -> Column:
    """JSON object string → map<string,string> (the dynamic-schema path
    for stored JSON metadata)."""
    return F.from_json(_c(col), "map<string,string>")


# ---------------------------------------------------------------------------
# blank-removal / fan-out projections
# ---------------------------------------------------------------------------

def remove_blanks(col: str | Column) -> Column:
    """Drop NULL/empty items from an array (dict_for_data_field,
    solr_updater.py:33-54); NULL result when nothing is left (the
    reference's {}-means-absent convention)."""
    kept = F.filter(_c(col), lambda x: x.isNotNull() & (x != ""))
    return F.when(F.size(kept) > 0, kept)


def project_field(df: DataFrame, src: str, dest: str) -> DataFrame:
    """Copy ``src`` to ``dest`` with dejson + blank removal (the mapping
    layer's per-field projection, solr_updater.py:33-54)."""
    dt = df.schema[src].dataType
    if isinstance(dt, T.ArrayType):
        expr = remove_blanks(dejson_array(src))
    else:
        v = dejson_str(src)
        expr = F.when(v.isNotNull() & (v != ""), v)
    return df.withColumn(dest, expr)


def project_field_to_many(df: DataFrame, src: str,
                          dests: list[str]) -> DataFrame:
    """1 source → N destination fields (dict_for_data_to_fields,
    solr_updater.py:57-62)."""
    for d in dests:
        df = project_field(df, src, d)
    return df
