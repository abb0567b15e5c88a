"""Configurable enrichment-chain API — the reference's core extensibility
point re-expressed over DataFrames.

The reference drives every ingest through a per-collection list of named
enrichments applied in order (harvester/post_processing/
enrich_existing_couch_doc.py:22-62 posts each doc through the chain;
the chain itself is configured on the collection profile as a
comma-separated list of ``/name?param=value`` specs,
harvester/collection_registry_client.py:123-140). Here a chain is a list
of transform specs applied to a whole DataFrame — each step a column
rewrite, so the composed chain stays ONE Catalyst plan (single pass over
the data, whole-stage codegen; nothing is materialized between steps).

Spec forms accepted by :func:`apply_chain`:
- ``"sort_title?col=title&dest=sort_title"`` — profile-style string
- ``{"transform": "setprop", "path": "props/a", "value": "x"}`` — dict
- ``("my_pkg.my_mod:my_fn", {...})`` — dotted dynamic import (the
  run_transform_on_couchdb_docs.py:34-45 extension point)
"""

from __future__ import annotations

import importlib
import warnings
from collections.abc import Callable
from urllib.parse import parse_qsl, urlparse

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSFORMS: dict[str, Callable[..., DataFrame]] = {}

# column-EXPRESSION twins of the pure col→col transforms: what
# apply_chains_by_collection uses to compile per-collection chains into
# one CASE-WHEN routing pass instead of N filtered scans
EXPR_TRANSFORMS: dict[str, Callable] = {}


def register_transform(name: str):
    """Register a DataFrame transform (fn(df, **params) -> df) under a
    chain-addressable name."""
    def deco(fn: Callable[..., DataFrame]):
        TRANSFORMS[name] = fn
        return fn
    return deco


def resolve_transform(name: str) -> Callable[..., DataFrame]:
    """Registry lookup, falling back to dotted-name dynamic import
    (``package.module:function``) — the reference's importlib extension
    hook (run_transform_on_couchdb_docs.py:34-45)."""
    if name in TRANSFORMS:
        return TRANSFORMS[name]
    if ":" in name:
        mod, fn = name.split(":", 1)
        return getattr(importlib.import_module(mod), fn)
    raise KeyError(f"unknown transform {name!r} "
                   f"(registered: {sorted(TRANSFORMS)})")


def parse_spec(spec) -> tuple[str, dict]:
    """One chain entry → (name, params)."""
    if isinstance(spec, str):
        u = urlparse(spec)
        return u.path.lstrip("/"), dict(parse_qsl(u.query))
    if isinstance(spec, dict):
        params = dict(spec)
        return params.pop("transform"), params
    if isinstance(spec, tuple):
        name, params = spec
        return name, dict(params)
    raise TypeError(f"bad transform spec: {spec!r}")


def apply_chain(df: DataFrame, chain: list) -> DataFrame:
    """Apply the enrichment chain in order. Lazy: the result is one
    composed logical plan — Catalyst prunes/pushes across all steps."""
    for spec in chain:
        name, params = parse_spec(spec)
        df = resolve_transform(name)(df, **params)
    return df


def chain_from_profile(profile: dict) -> list:
    """Extract the item-enrichment chain from a reference-style ingest
    profile dict (collection_registry_client.py:123-140
    ``enrichments_item``)."""
    items = profile.get("enrichments_item", [])
    if isinstance(items, str):
        items = [s.strip() for s in items.split(",") if s.strip()]
    return items


# ---------------------------------------------------------------------------
# built-in transforms (each wraps a functions/* column expression)
# ---------------------------------------------------------------------------

def _col_transform(name: str, expr_fn):
    EXPR_TRANSFORMS[name] = expr_fn

    @register_transform(name)
    def t(df: DataFrame, col: str, dest: str | None = None,
          **kw) -> DataFrame:
        return df.withColumn(dest or col, expr_fn(F.col(col), **kw))
    t.__name__ = name
    return t


def _register_builtins() -> None:
    from harvester_spark.functions import nested, text

    _col_transform("sort_title", lambda c: text.sort_title(c))
    _col_transform("normalize_type", lambda c: text.normalize_type(c))
    _col_transform("add_slash", lambda c: text.add_slash(c))
    _col_transform("make_date", lambda c: text.make_date(c))
    _col_transform("fix_repeated_year", lambda c: text.fix_repeated_year(c))
    _col_transform("dedupe_list", lambda c: text.dedupe_list(c))
    _col_transform("ark_extract", lambda c: text.ark_extract(c))
    _col_transform("dejson", lambda c: nested.dejson_str(c))
    _col_transform("dejson_array", lambda c: nested.dejson_array(c))
    _col_transform(
        "dejson_deep",
        lambda c, depth="6": nested.dejson_deep_str(c, depth=int(depth)))
    _col_transform("remove_blanks", lambda c: nested.remove_blanks(c))
    _col_transform("map_date", lambda c: nested.map_date_expr(c))
    _col_transform(
        "facet_decade",
        lambda c, max_year="2026": nested.facet_decade_display(
            c, max_year=int(max_year)))

    @register_transform("setprop")
    def _setprop(df: DataFrame, path: str, value: str,
                 substring: str | None = None) -> DataFrame:
        return nested.setprop(df, path, value, substring)

    @register_transform("project_field")
    def _project(df: DataFrame, src: str, dest: str) -> DataFrame:
        return nested.project_field(df, src, dest)

    @register_transform("project_field_to_many")
    def _project_many(df: DataFrame, src: str, dests: str) -> DataFrame:
        return nested.project_field_to_many(df, src, dests.split(","))

    @register_transform("require_fields")
    def _require(df: DataFrame, cols: str) -> DataFrame:
        """Required-field predicate (solr_updater.py:445-473): keep rows
        where every listed column is non-null and non-empty."""
        cond = F.lit(True)
        for c in cols.split(","):
            col = F.col(c)
            cond = cond & col.isNotNull() & (col.cast("string") != "")
        return df.filter(cond)

    @register_transform("constant")
    def _constant(df: DataFrame, dest: str, value: str) -> DataFrame:
        """Constant-set field (the reference's fixed rights statements)."""
        return df.withColumn(dest, F.lit(value))


_register_builtins()


# ---------------------------------------------------------------------------
# media-exists predicate (solr_updater.py:665-685 check_nuxeo_media)
# ---------------------------------------------------------------------------

class NotReadyForPublication(RuntimeError):
    pass


def assert_ready_for_publication(profile: dict, env: str = "prod") -> None:
    """Job precondition guard (harvester/run_ingest.py:119-124 and
    couchdb_sync_db_by_collection.py:110-116): in a production branch a
    collection must be explicitly marked ready."""
    if "prod" in env.lower() and not profile.get("ready_for_publication"):
        raise NotReadyForPublication(
            f"collection {profile.get('name', '?')!r} is not ready for "
            "publication — run on stage and QA first")


def _compile_chain_exprs(cols: list[str], chain: list | None):
    """Simulate a chain at the column-expression level: {out_col: Column},
    or None when any step is not a pure col→col rewrite (filters, setprop,
    dynamic imports — those need the union path)."""
    env: dict = {c: F.col(c) for c in cols}
    for spec in chain or []:
        name, params = parse_spec(spec)
        p = dict(params)
        if name == "constant":
            env[p["dest"]] = F.lit(p["value"])
            continue
        fn = EXPR_TRANSFORMS.get(name)
        col = p.pop("col", None)
        dest = p.pop("dest", None) or col
        if fn is None or col is None or col not in env:
            return None
        env[dest] = fn(env[col], **p)
    return env


def apply_chains_by_collection(df: DataFrame, key_col: str,
                               chains: dict, default: list | None = None
                               ) -> DataFrame:
    """Per-collection enrichment chains — the reference's core execution
    shape (one profile per collection, couchdb_runner.py:93-164). Rows are
    routed to their collection's chain; unmatched rows get ``default`` (or
    pass through).

    When every chain (and the default) is column-expression-only, the
    whole routing compiles into ONE ``CASE WHEN collection = k THEN …``
    pass — one scan of the source regardless of collection count (the
    reference runs hundreds of collection profiles; N filtered-scan unions
    would be N passes). Chains with filters / schema mutations /
    dynamically-imported steps fall back to the union-of-subplans form;
    schemas are aligned by name (chains may add different columns, missing
    ones are NULL — both forms agree)."""
    compiled = {k: _compile_chain_exprs(df.columns, c)
                for k, c in chains.items()}
    dflt = (_compile_chain_exprs(df.columns, default) if default
            else {c: F.col(c) for c in df.columns})
    if dflt is not None and all(v is not None for v in compiled.values()):
        try:
            return _route_single_pass(df, key_col, compiled, dflt)
        except AnalysisException as exc:
            # only the expected plan-time conflicts (e.g. branch type
            # mismatch on a shared output column) may fall back — a real
            # bug in an EXPR_TRANSFORMS twin must surface, not silently
            # drift from the DataFrame implementation
            warnings.warn(
                f"apply_chains_by_collection: single-pass CASE routing "
                f"rejected by the analyzer ({exc.__class__.__name__}: "
                f"{str(exc).splitlines()[0][:200]}); using union-of-"
                f"subplans fallback", RuntimeWarning, stacklevel=2)

    parts = []
    for key, chain in chains.items():
        parts.append(apply_chain(df.filter(F.col(key_col) == key), chain))
    # NULL keys match no chain AND would fail a bare ~isin() (NULL, not
    # true) — route them to the default branch explicitly
    rest = df.filter(F.col(key_col).isNull()
                     | ~F.col(key_col).isin(list(chains)))
    parts.append(apply_chain(rest, default) if default else rest)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def _route_single_pass(df: DataFrame, key_col: str,
                       compiled: dict, dflt: dict) -> DataFrame:
    """One-scan routing: for every output column, a CASE over the
    collection key picking that chain's expression (NULL where a chain
    doesn't produce the column — unionByName's missing-column fill)."""
    out_cols = list(df.columns)
    for env in [*compiled.values(), dflt]:
        for c in env:
            if c not in out_cols:
                out_cols.append(c)
    key = F.col(key_col)
    sel = []
    for c in out_cols:
        fallback = dflt.get(c, F.col(c) if c in df.columns else F.lit(None))
        w = None
        for k, env in compiled.items():
            v = env.get(c, F.col(c) if c in df.columns else F.lit(None))
            w = (F.when(key == k, v) if w is None
                 else w.when(key == k, v))
        sel.append((w.otherwise(fallback) if w is not None else fallback)
                   .alias(c))
    return df.select(*sel)


def upsert_tally(existing: DataFrame, incoming: DataFrame, key: str,
                 compare_cols: list[str]) -> DataFrame:
    """Created-vs-updated-vs-unchanged tally for a sync batch
    (couchdb_sync_db_by_collection.py:120-131 counts 'created' vs
    'updated' messages; here one outer-join aggregation instead of a
    per-doc HTTP loop). Returns one row: (n_incoming, created, updated,
    unchanged)."""
    ex = existing.select(F.col(key).alias("__k"),
                         F.lit(True).alias("__exists"),
                         *[F.col(c).alias(f"__e_{c}") for c in compare_cols])
    inc = incoming.select(F.col(key).alias("__k"),
                          *[F.col(c).alias(f"__i_{c}") for c in compare_cols])
    joined = inc.join(ex, "__k", "left")
    is_created = F.col("__exists").isNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & (F.col(f"__i_{c}").eqNullSafe(F.col(f"__e_{c}")))
    status = (F.when(is_created, "created")
              .when(same, "unchanged").otherwise("updated"))
    return (joined.select(status.alias("s"))
            .agg(F.count("*").alias("n_incoming"),
                 F.sum(F.when(F.col("s") == "created", 1).otherwise(0))
                 .alias("created"),
                 F.sum(F.when(F.col("s") == "updated", 1).otherwise(0))
                 .alias("updated"),
                 F.sum(F.when(F.col("s") == "unchanged", 1).otherwise(0))
                 .alias("unchanged")))


def media_exists_split(docs: DataFrame, manifest: DataFrame,
                       key: str = "media_url"
                       ) -> tuple[DataFrame, DataFrame]:
    """Split docs into (kept, omitted) by existence of their media asset in
    a manifest table — the anti-join form of check_nuxeo_media (which HEADs
    S3 per doc; at 100 TB an asset-manifest join replaces 10^12 HTTP
    round-trips with one broadcast/shuffle join). Docs with no media
    reference at all pass through (the reference returns early when
    ``structmap_url`` is absent)."""
    has_ref = docs.filter(F.col(key).isNotNull())
    no_ref = docs.filter(F.col(key).isNull())
    kept = has_ref.join(manifest.select(key).distinct(), key, "left_semi")
    omitted = has_ref.join(manifest.select(key).distinct(), key, "left_anti")
    return kept.unionByName(no_ref), omitted
