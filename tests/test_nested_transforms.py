"""Nested-metadata functions + enrichment-chain API
(dejson / setprop / map_date / facet_decade / dynamic fields / chains)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from harvester_spark.functions.nested import (dejson_array, dejson_str,
                                              dejson_struct,
                                              dynamic_fields_map,
                                              facet_decade_display,
                                              map_date_expr, project_field,
                                              remove_blanks, setprop)
from harvester_spark.plans.transforms import (apply_chain,
                                              chain_from_profile,
                                              media_exists_split,
                                              resolve_transform)


@pytest.fixture(scope="module")
def jdocs(spark):
    rows = [
        (0, '{"name": "alice"}'),
        (1, '{"id": 7}'),          # JSON object without name -> unchanged
        (2, "plain"),              # not JSON -> unchanged
        (3, "17"),                 # scalar JSON -> unchanged
        (4, None),
    ]
    return spark.createDataFrame(rows, "i long, v string")


def test_dejson_str(jdocs):
    out = {r["i"]: r["o"] for r in
           jdocs.select("i", dejson_str("v").alias("o")).collect()}
    assert out == {0: "alice", 1: '{"id": 7}', 2: "plain", 3: "17", 4: None}


def test_dejson_array_and_struct(spark):
    df = spark.createDataFrame(
        [(0, ['{"name": "x"}', "y"])], "i long, vs array<string>")
    assert df.select(dejson_array("vs").alias("o")).first()["o"] == ["x", "y"]
    sdf = spark.createDataFrame(
        [(None, "nm", "tx"), ("it", "nm", None), (None, None, None)],
        "item string, name string, text string")
    got = [r["o"] for r in
           sdf.select(dejson_struct(F.struct("item", "name", "text"))
                      .alias("o")).collect()]
    assert got == ["nm", "it", None]


def test_setprop_nested_string_and_array(spark):
    df = spark.createDataFrame(
        [(0, (("http://old/x", ["a@old", "b"]),))],
        "i long, props struct<meta:struct<url:string, tags:array<string>>>")
    out = setprop(df, "props/meta/url", "https://new", substring="http://old")
    out = setprop(out, "props/meta/tags", "NEW", substring="old")
    r = out.select("props.meta.url", "props.meta.tags").first()
    assert r["url"] == "https://new/x"
    assert r["tags"] == ["a@NEW", "b"]
    # overwrite mode (no substring): every array element replaced
    ow = setprop(df, "props/meta/tags", "Z").select("props.meta.tags").first()
    assert ow["tags"] == ["Z", "Z"]
    # top-level column leaf
    top = spark.createDataFrame([(0, "x-old")], "i long, v string")
    assert setprop(top, "v", "new", substring="old").first()["v"] == "x-new"
    with pytest.raises(KeyError):
        setprop(df, "props/nope/url", "v")


def test_map_date_symmetric_fill(spark):
    df = spark.createDataFrame(
        [(0, [("d1", "1950", "1960-06-30")]),   # both
         (1, [("d2", "1950", None)]),           # only begin -> end = start
         (2, [("d3", None, "1960")]),           # only end -> start = end
         (3, [("d4", None, None)]),             # neither -> nulls
         (4, [("a", "1970", None), ("b", "1955", "1940")])],  # min rules
        "i long, dates array<struct<displayDate:string, begin:string, "
        "end:string>>")
    m = df.select("i", map_date_expr("dates").alias("m")).collect()
    got = {r["i"]: (r["m"]["date"], r["m"]["sort_date_start"],
                    r["m"]["sort_date_end"]) for r in m}
    assert got[0] == (["d1"], dt.date(1950, 1, 1), dt.date(1960, 6, 30))
    assert got[1] == (["d2"], dt.date(1950, 1, 1), dt.date(1950, 1, 1))
    assert got[2] == (["d3"], dt.date(1960, 1, 1), dt.date(1960, 1, 1))
    assert got[3] == (["d4"], None, None)
    assert got[4] == (["a", "b"], dt.date(1955, 1, 1), dt.date(1940, 1, 1))


def test_facet_decade_display(spark):
    rows = [(0, "circa 1923-1945"), (1, "n.d."), (2, "1800"),
            (3, "21054"), (4, "born 999, died 3050"), (5, "1999 and 2001")]
    df = spark.createDataFrame(rows, "i long, d string")
    got = {r["i"]: r["o"] for r in
           df.select("i", facet_decade_display("d").alias("o")).collect()}
    assert got[0] == ["1920s", "1930s", "1940s"]
    assert got[1] == ["unknown"]
    assert got[2] == ["1800s"]
    assert got[3] == ["unknown"]        # 5-digit run blanked
    assert got[4] == ["unknown"]        # 999 too short, 3050 > max_year
    assert got[5] == ["1990s", "2000s"]


def test_dynamic_fields_map(spark):
    df = spark.createDataFrame(
        [(0, [("title", "t1"), ("author", "a1"), ("title", "t2")])],
        "i long, entries array<struct<name:string, value:string>>")
    m = df.select(dynamic_fields_map("entries").alias("m")).first()["m"]
    assert m == {"title": "t2", "author": "a1"}  # later duplicate wins


def test_remove_blanks_and_project(spark):
    df = spark.createDataFrame(
        [(0, ["a", "", None, "b"]), (1, ["", None])],
        "i long, xs array<string>")
    got = {r["i"]: r["o"] for r in
           df.select("i", remove_blanks("xs").alias("o")).collect()}
    assert got == {0: ["a", "b"], 1: None}
    sdf = spark.createDataFrame([(0, '{"name": "x"}'), (1, "")],
                                "i long, src string")
    out = {r["i"]: r["dest"] for r in
           project_field(sdf, "src", "dest").collect()}
    assert out == {0: "x", 1: None}


def test_transform_chain_profile_and_dynamic_import(spark):
    df = spark.createDataFrame(
        [(0, "The Great Archive", "http://h/x"),
         (1, "", "http://h/y/")],
        "doc_id long, title string, url string")
    profile = {"enrichments_item":
               "sort_title?col=title&dest=k, add_slash?col=url, "
               "constant?dest=rights&value=cc0"}
    out = apply_chain(df, chain_from_profile(profile)).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["k"] == "great archive"
    assert by[1]["k"] == "~title unknown"
    assert by[0]["url"].endswith("/") and by[1]["url"] == "http://h/y/"
    assert by[0]["rights"] == "cc0"
    # dict-form spec + dotted dynamic import both resolve
    fn = resolve_transform("harvester_spark.functions.nested:project_field")
    assert fn is project_field
    out2 = apply_chain(df, [{"transform": "require_fields",
                             "cols": "title"}]).collect()
    assert [r["doc_id"] for r in out2] == [0]
    with pytest.raises(KeyError):
        resolve_transform("not_registered")


def test_media_exists_split(spark):
    docs = spark.createDataFrame(
        [(0, "u0"), (1, "u1"), (2, None), (3, "u3")],
        "doc_id long, media_url string")
    manifest = spark.createDataFrame([("u0",), ("u3",)],
                                     "media_url string")
    kept, omitted = media_exists_split(docs, manifest)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2, 3]
    assert [r["doc_id"] for r in omitted.collect()] == [1]


def test_ark_synthesis_and_fallback(spark):
    from harvester_spark.functions.text import (first_non_blank, ucla_ark,
                                                ucsd_ark)
    df = spark.createDataFrame(
        [(0, "bb123", "21198-zz99", "", "x"),
         (1, None, "badid", "", "y"),
         (2, None, None, "direct", "z")],
        "i long, frag string, mangled string, alt string, last string")
    got = df.select(
        "i", ucsd_ark("frag").alias("u"), ucla_ark("mangled").alias("l"),
        first_non_blank("alt", "last").alias("fb")).collect()
    by = {r["i"]: r for r in got}
    assert by[0]["u"] == "ark:/20775/bb123"
    assert by[0]["l"] == "ark:/21198/zz99"
    assert by[1]["u"] is None and by[1]["l"] is None  # split failure -> NULL
    assert by[1]["fb"] == "y" and by[2]["fb"] == "direct"


def test_ready_for_publication_guard():
    from harvester_spark.plans.transforms import (NotReadyForPublication,
                                                  assert_ready_for_publication)
    assert_ready_for_publication({"ready_for_publication": True}, env="prod")
    assert_ready_for_publication({}, env="stage")  # non-prod: no guard
    with pytest.raises(NotReadyForPublication):
        assert_ready_for_publication({"name": "c1"}, env="prod")


def test_upsert_tally(spark):
    from harvester_spark.plans.transforms import upsert_tally
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(1, "a"),          # unchanged
         (2, "B"),          # updated
         (3, None),         # unchanged (null-safe compare)
         (4, "new")],       # created
        "doc_id long, text string")
    r = upsert_tally(existing, incoming, "doc_id", ["text"]).collect()[0]
    assert (r["n_incoming"], r["created"], r["updated"], r["unchanged"]) \
        == (4, 1, 1, 2)


# ---------------------------------------------------------------------------
# dejson_deep: arbitrary-depth flatten vs a python model of the reference
# ---------------------------------------------------------------------------

def _ref_dejson(data):
    """Python model of the reference's recursive dejson
    (solr_updater.py:137-180), adjusted for the two documented variant
    divergences: dict members are looked up first-non-null (JSON null ==
    absent) and only string scalars go through unpack_if_json."""
    import json as _json
    if not data:
        return data
    if isinstance(data, list):
        return [_ref_dejson(d) for d in data]
    if isinstance(data, dict):
        flat = None
        for key in ("item", "name", "text"):
            if data.get(key) is not None:
                flat = data[key]
                break
        # the engine's truthiness guard: null/""/[] keep the dict
        # (numeric 0 and {} count as truthy — documented divergence)
        if flat is None or flat == "" and isinstance(flat, str) \
                or isinstance(flat, list) and not flat:
            return data
        return flat
    if isinstance(data, str):
        try:
            j = _json.loads(data)
        except ValueError:
            return data
        if isinstance(j, dict) and j.get("name") is not None:
            return j["name"]
        return data
    return data


def _render(v):
    """Match dejson_deep_str: raw string for string scalars, compact JSON
    (sorted keys — variant sorts object keys) otherwise."""
    import json as _json
    if isinstance(v, str):
        return v
    return _json.dumps(v, separators=(",", ":"), sort_keys=True,
                       ensure_ascii=False)


def test_dejson_deep_matches_reference_model(spark):
    import json as _json
    from harvester_spark.functions.nested import dejson_deep_str
    values = [
        [["s0", {"item": ["a", "b"]}], {"name": "top"}],
        {"text": "deep"},
        ['{"name": "e"}', "plain", 7],
        [[["deep", [{"name": "lvl4"}]]]],          # 4 levels
        [{"id": 9}, {"item": ""}],                 # falsy item keeps dict
        {"item": {"name": "inner"}},               # no recursion into pick
        {"item": "", "name": "N"},                 # item shadows name
        "plain string", 17, [], "",
        [1, [2, [3, [4, [5]]]]],
        {"name": ["multi", "valued"]},
        [{"text": "t"}, ["x", {"item": "i"}], '{"id": 3}'],
    ]
    rows = [(json_str,) for json_str in
            (_json.dumps(v, sort_keys=True) for v in values)]
    df = spark.createDataFrame(rows, "j string")
    got = [r["f"] for r in
           df.select(dejson_deep_str("j").alias("f")).collect()]
    want = [_render(_ref_dejson(v)) for v in values]
    assert got == want


def test_dejson_deep_invalid_json_passes_through(spark):
    """NOT-valid-JSON column values pass through raw (the reference's
    getjobj swallows the parse error); NULL stays NULL — and nothing
    FAILFASTs the job."""
    from harvester_spark.functions.nested import dejson_deep_str
    df = spark.createDataFrame(
        [(None,), ("not json at all {",), ("",), ('{"broken": ',),
         ('{"name": "ok"}',)], "j string")
    got = [r["f"] for r in df.select(dejson_deep_str("j").alias("f"))
           .collect()]
    assert got == [None, "not json at all {", "", '{"broken": ', "ok"]


def test_dejson_deep_property(spark):
    """Randomized nested values (depth ≤4, mixed dict/list/str/int) must
    flatten identically to the reference model. Seeded generator →
    deterministic across runs."""
    import json as _json
    import random
    from harvester_spark.functions.nested import dejson_deep_str
    rng = random.Random(7)
    scalars = ["abc", "xy z", "", "name", 17, 0, 5, "t"]

    def gen(depth):
        r = rng.random()
        if depth == 0 or r < 0.35:
            return rng.choice(scalars)
        if r < 0.7:
            return [gen(depth - 1) for _ in range(rng.randint(0, 3))]
        keys = rng.sample(["item", "name", "text", "id"],
                          rng.randint(1, 2))
        return {k: gen(depth - 1) for k in keys}

    values = [gen(4) for _ in range(120)]
    rows = [(_json.dumps(v, sort_keys=True),) for v in values]
    df = spark.createDataFrame(rows, "j string")
    got = [r["f"] for r in
           df.select(dejson_deep_str("j").alias("f")).collect()]
    want = [_render(_ref_dejson(v)) for v in values]
    for v, g, w in zip(values, got, want):
        assert g == w, f"input {v!r}: got {g!r} want {w!r}"


def test_apply_chains_by_collection(spark):
    from harvester_spark.plans.transforms import apply_chains_by_collection
    df = spark.createDataFrame(
        [(0, "en", "The X"), (1, "fr", "Le Y"), (2, "de", "Z")],
        "doc_id long, lang string, title string")
    out = apply_chains_by_collection(
        df, "lang",
        {"en": ["sort_title?col=title&dest=k"]},
        default=["constant?dest=k&value=-"]).collect()
    by = {r["doc_id"]: r["k"] for r in out}
    assert by[0] == "x" and by[1] == "-" and by[2] == "-"


def test_map_registry_data_expr(spark):
    """map_registry_data (solr_updater.py:485-544): parallel display
    arrays, repo campus suffix, LAST-collection-with-campus wins."""
    from harvester_spark.functions.nested import map_registry_data_expr
    schema = ("colls array<struct<id:string,name:string,"
              "campus:array<struct<id:string,name:string>>,"
              "repository:array<struct<id:string,name:string,"
              "campus:array<struct<name:string>>>>>>")
    rows = [([
        {"id": "http://r/c/1", "name": "C1",
         "campus": [{"id": "http://r/k/a", "name": "KA"}],
         "repository": [{"id": "http://r/rp/1", "name": "R1",
                         "campus": [{"name": "UCB"}]}]},
        {"id": "http://r/c/2/", "name": "C2",
         "campus": [{"id": "http://r/k/b", "name": "KB"},
                    {"id": "http://r/k/c", "name": "KC"}],
         "repository": [{"id": "http://r/rp/2", "name": "R2",
                         "campus": None}]},
    ],)]
    df = spark.createDataFrame(rows, schema)
    m = df.select(map_registry_data_expr("colls").alias("m")).collect()[0]["m"]
    assert m["collection_url"] == ["http://r/c/1/", "http://r/c/2/"]
    assert m["collection_data"] == ["http://r/c/1/::C1", "http://r/c/2/::C2"]
    assert m["repository_data"] == ["http://r/rp/1/::R1::UCB",
                                    "http://r/rp/2/::R2"]
    # last collection with campus wins; names map campus-wise
    assert m["campus_name"] == ["KB", "KC"]
    assert m["campus_data"] == ["http://r/k/b/::KB", "http://r/k/c/::KC"]
    # no campus anywhere -> NULL campus fields
    rows2 = [([{"id": "http://r/c/9", "name": "C9", "campus": None,
                "repository": [{"id": "http://r/rp/9", "name": "R9",
                                "campus": None}]}],)]
    m2 = (spark.createDataFrame(rows2, schema)
          .select(map_registry_data_expr("colls").alias("m"))
          .collect()[0]["m"])
    assert m2["campus_url"] is None and m2["campus_data"] is None
    # a repo-LESS collection must not nullify the other collections'
    # repository fields (flatten() returns NULL on any NULL element)
    rows3 = [([{"id": "http://r/c/1", "name": "C1", "campus": None,
                "repository": [{"id": "http://r/rp/1", "name": "R1",
                                "campus": None}]},
               {"id": "http://r/c/2", "name": "C2", "campus": None,
                "repository": None}],)]
    m3 = (spark.createDataFrame(rows3, schema)
          .select(map_registry_data_expr("colls").alias("m"))
          .collect()[0]["m"])
    assert m3["repository_url"] == ["http://r/rp/1/"]
    assert m3["repository_data"] == ["http://r/rp/1/::R1"]


def test_apply_chains_single_pass_for_expression_chains(spark, tmp_path):
    """VERDICT r2: a 10-collection expression-only config must compile to
    ONE scan of the source (CASE WHEN routing), not 11 filtered unions —
    and agree with the union form exactly."""
    from harvester_spark.plans.transforms import apply_chains_by_collection
    src_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"c{i % 12}", f"The Title {i}") for i in range(200)],
        "doc_id long, coll string, title string").write.parquet(src_path)
    df = spark.read.parquet(src_path)
    chains = {f"c{i}": ["sort_title?col=title&dest=k",
                        f"constant?dest=rights&value=r{i}"]
              for i in range(10)}
    out = apply_chains_by_collection(df, "coll", chains,
                                     default=["constant?dest=rights&value=-"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2, plan
    assert "Union" not in plan
    got = sorted((r["doc_id"], r["k"], r["rights"]) for r in out.collect())
    assert len(got) == 200
    # spot-check routing: coll c3 rows got r3, unmatched (c10/c11) got '-'
    by = {r[0]: r for r in got}
    assert by[3][2] == "r3" and by[3][1] == "title 3"
    assert by[10][2] == "-" and by[10][1] is None  # default adds no k


def test_apply_chains_fallback_for_filter_chains(spark):
    """Chains containing a FILTER step can't compile to CASE routing —
    they must take the union path and still drop the right rows."""
    from harvester_spark.plans.transforms import apply_chains_by_collection
    df = spark.createDataFrame(
        [(0, "en", "keep"), (1, "en", ""), (2, "fr", "")],
        "doc_id long, lang string, title string")
    out = apply_chains_by_collection(
        df, "lang", {"en": ["require_fields?cols=title"]}).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [0, 2]  # en row with empty title filtered; fr untouched


def test_apply_chains_null_key_routes_to_default(spark):
    """ADVICE r2: NULL collection keys must hit the default branch, not
    vanish (bare ~isin() is NULL for NULL keys)."""
    from harvester_spark.plans.transforms import apply_chains_by_collection
    df = spark.createDataFrame(
        [(0, "en", "The X"), (1, None, "Y"), (2, None, "Z")],
        "doc_id long, lang string, title string")
    out = apply_chains_by_collection(
        df, "lang",
        {"en": ["sort_title?col=title&dest=k"]},
        default=["constant?dest=k&value=-"]).collect()
    assert len(out) == 3
    by = {r["doc_id"]: r["k"] for r in out}
    assert by == {0: "x", 1: "-", 2: "-"}
    # and with NO default: NULL-key rows pass through untouched
    out2 = apply_chains_by_collection(
        df, "lang", {"en": ["sort_title?col=title&dest=k"]})
    assert out2.count() == 3
