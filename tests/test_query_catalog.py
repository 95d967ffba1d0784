"""Triple-pattern query surface + named-graph catalog tests (the
reference's SPARQL-use-shapes and SOP asset lifecycle, SURVEY.md §2.4)."""

from pathlib import Path

import pytest

from rdfx_ray.pipelines.kg import KGConfig, read_final_triples, run_kg_pipeline
from rdfx_ray.pipelines.query import (
    ask,
    bgp_join,
    graph_size,
    select_limit,
    subjects_of,
    triple_pattern,
)
from rdfx_ray.sources.documents import generate_documents
from rdfx_ray.sources.vocab import SDO
from rdfx_ray.state.catalog import GraphCatalog


@pytest.fixture(scope="module")
def kg_out(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("qcat")
    uri = str(root / "input")
    out = str(root / "out")
    generate_documents(uri, n_docs=400, n_entities=100, fragment_rows=100)
    job = run_kg_pipeline(uri, out, KGConfig(
        n_buckets=4, n_entities=100, batch_size=100, shard_fragments=2))
    return out, job


def test_triple_pattern_filter(kg_out):
    out, _ = kg_out
    ds = read_final_triples(out)
    persons = triple_pattern(ds, pred=SDO + "jobTitle").to_pandas()
    assert len(persons) > 0
    assert (persons["pred"] == SDO + "jobTitle").all()


def test_ask_and_graph_size(kg_out):
    out, job = kg_out
    ds = read_final_triples(out)
    assert ask(ds, pred=SDO + "mentions")
    assert not ask(ds, pred="urn:no:such:predicate")
    total = sum(graph_size(ds, g) for g in
                {r["graph_iri"] for r in ds.select_columns(["graph_iri"])
                 .take_all()})
    assert total == job["triples_final"]


def test_select_limit(kg_out):
    out, _ = kg_out
    assert len(select_limit(read_final_triples(out), 10).take_all()) == 10


def test_subjects_of(kg_out):
    out, _ = kg_out
    ds = read_final_triples(out)
    subs = subjects_of(ds, SDO + "jobTitle", "Programmer").to_pandas()
    assert subs["subj"].str.startswith("http://orcid.org/").all()


def test_bgp_join(kg_out):
    out, _ = kg_out
    ds = read_final_triples(out)
    joined = bgp_join(ds, SDO + "name", SDO + "jobTitle").to_pandas()
    assert len(joined) > 0
    # every joined subject has both predicates
    names = set(subjects_of(ds, SDO + "jobTitle", "Programmer")
                .to_pandas()["subj"])
    got = set(joined[joined["vb"] == "Programmer"]["subj"])
    assert got == names


def test_catalog_sizes_match_manifests(kg_out):
    out, job = kg_out
    cat = GraphCatalog(out)
    sizes = cat.sizes()
    assert sum(sizes.values()) == job["triples_final"]
    g0 = cat.graphs()[0]
    assert cat.asset_exists(g0)
    assert cat.asset_collection_size(g0) == sizes[g0]
    assert not cat.asset_exists("urn:graph:nope")
    with pytest.raises(KeyError):
        cat.asset_collection_size("urn:graph:nope")
    assert len(cat.lineage(g0)) > 0


def test_catalog_create_ops(tmp_path):
    cat = GraphCatalog(str(tmp_path))
    dg = cat.create_datagraph("testdg", creator="tester")
    assert dg == "urn:x-evn-master:testdg"
    wf = cat.create_workflow(dg, "wf1", creator="tester")
    assert wf == "urn:x-evn-tag:testdg:wf1:tester"
    # round-trips through the reference URN helpers
    from rdfx_ray.persistence import SOP
    assert SOP.graph_from_workflow(wf) == dg
    assert SOP.tag_from_workflow(wf) == "urn:x-tags:wf1"


def test_make_output_file_path():
    from rdfx_ray.pipelines.verbs import make_output_file_path
    p = make_output_file_path(Path("/x/data.ttl"), "turtle", "xml", False)
    assert p == Path("/x/data.xml")
    p = make_output_file_path(Path("/x/data.ttl"), "turtle", "turtle", False)
    assert p == Path("/x/data.new.ttl")
    p = make_output_file_path(Path("/x/data.ttl"), "turtle", "turtle", True)
    assert p == Path("/x/data.ttl")


def test_pipeline_spec(tmp_path, ray_session):
    """PipelineSpec applies stages in order; the declared kg stage-1
    spec produces the same partitioned fragments as the pipeline."""
    import ray.data as rd
    from rdfx_ray.pipelines.spec import kg_stage1_spec
    from rdfx_ray.sources.documents import generate_documents
    from rdfx_ray.store.lance_shim import LanceShim

    uri = str(tmp_path / "in")
    generate_documents(uri, n_docs=100, n_entities=50, fragment_rows=50)
    spec = kg_stage1_spec(n_entities=50, n_buckets=4, batch_size=50,
                          out_dir=str(tmp_path / "o"))
    assert "extract+link" in spec.describe()
    ds = rd.read_parquet(LanceShim(uri).fragment_paths())
    stats = spec.apply(ds).to_pandas()
    assert stats["rows"].sum() > 0
    assert set(stats["bucket"]) <= {0, 1, 2, 3}
    import glob
    # consolidated layout: one FILE per write task (stats rows address
    # row groups inside it as path#rg=<i>)
    frags = glob.glob(str(tmp_path / "o" / "stage1" / "*" / "*.parquet"))
    assert len(frags) == stats["path"].str.split("#rg=").str[0].nunique()
    assert (stats["path"].str.contains("#rg=")).all()


def test_create_manifest_and_file(tmp_path):
    from rdfx_ray.state.catalog import GraphCatalog
    cat = GraphCatalog(str(tmp_path))
    m = cat.create_manifest("reg1", imports=["https://data.example/doc"])
    assert m == "urn:x-evn-master:reg1"

    src = Path(__file__).parent / "data" / "file_01.ttl"
    entry = cat.create_file(src, "urn:x-evn-master:asset1")
    assert entry["rows"] == 6
    assert cat.asset_exists("urn:x-evn-master:asset1")
    assert cat.asset_collection_size("urn:x-evn-master:asset1") == 6
    # duplicate baseURI rejected (reference :746-752)
    with pytest.raises(ValueError, match="already exists"):
        cat.create_file(src, "urn:x-evn-master:asset1")
    # materialized NT parses back to 6 triples
    from rdfx_ray.rdf import Graph
    nt = next((tmp_path / "final").glob("graphfile=*/part.nt")).read_text()
    assert len(Graph().parse(nt, "nt")) == 6


def test_star_bgp_strategies_agree(ray_session):
    """3-pattern star BGP: broadcast fold and native shuffle joins
    produce the identical binding set."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import star_bgp

    SF = "/root/testdata/sf0.001"
    pats = [(SDO + "inLanguage", "en"),
            (SDO + "isBasedOn", "?vb"),
            (SDO + "characterCount", "?vc")]
    a = star_bgp(doc_triples(SF), pats, strategy="broadcast").to_pandas()
    # num_partitions must stay ≤ the test session's CPU count: the
    # native join's aggregator actors reserve CPUs (the stacked-pool
    # starvation rule from CLAUDE.md)
    b = star_bgp(doc_triples(SF), pats, strategy="shuffle",
                 num_partitions=2).to_pandas()
    key = ["subj", "vb", "vc"]
    sa = a.sort_values(key).reset_index(drop=True)
    sb = b[key].sort_values(key).reset_index(drop=True)
    assert sa.equals(sb)
    assert len(sa) > 0
    # "auto" counts the sides and must agree with both explicit plans
    c = star_bgp(doc_triples(SF), pats, strategy="auto",
                 num_partitions=2).to_pandas()
    sc = c[key].sort_values(key).reset_index(drop=True)
    assert sa.equals(sc)


def test_count_gated_plans_agree(ray_session):
    """Every count-gated BGP/join picks broadcast under the cutoff and
    the shuffle twin above it (cutoff=0 forces it) — identical rows on
    both routes, so no plan ever NEEDS the driver-collected side."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import (
        bgp_join,
        object_join_bgp,
        var_predicate_bgp,
    )

    SF = "/root/testdata/sf0.001"
    ds = doc_triples(SF)

    # bgp_join: cutoff 0 routes through bgp_join_native
    a = bgp_join(ds, SDO + "inLanguage", SDO + "isBasedOn").to_pandas()
    b = bgp_join(ds, SDO + "inLanguage", SDO + "isBasedOn",
                 broadcast_cutoff_rows=0).to_pandas()
    key = ["subj", "va", "vb"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))

    # var_predicate_bgp: broadcast is_in filter vs native semi-join
    a = var_predicate_bgp(ds, SDO + "inLanguage", "en").to_pandas()
    b = var_predicate_bgp(ds, SDO + "inLanguage", "en",
                          broadcast_cutoff_rows=0).to_pandas()
    key = ["subj", "p", "o"]
    assert len(a) > 0
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))

    # object_join_bgp: broadcast probe vs hashed partitioned join
    # (string key via int64 hash + exact equality post-filter)
    kw = dict(filter_pred=SDO + "inLanguage", filter_obj="de")
    a = object_join_bgp(ds, SDO + "isBasedOn", SDO + "isBasedOn",
                        **kw).to_pandas()
    b = object_join_bgp(ds, SDO + "isBasedOn", SDO + "isBasedOn",
                        broadcast_cutoff_rows=0, n_buckets=4,
                        **kw).to_pandas()
    key = ["a", "b", "v"]
    assert len(a) > 0
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))


def test_optional_union_bgp(ray_session):
    """OPTIONAL left-join semantics (vb null where no match) on both
    count-gated routes, and UNION bag semantics (row count = sum of
    branches, no dedup)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import optional_bgp, union_bgp

    SF = "/root/testdata/sf0.001"
    ds = doc_triples(SF)
    a = optional_bgp(ds, SDO + "inLanguage", SDO + "isBasedOn",
                     opt_obj="src3").to_pandas()
    b = optional_bgp(ds, SDO + "inLanguage", SDO + "isBasedOn",
                     opt_obj="src3", broadcast_cutoff_rows=0,
                     num_partitions=4).to_pandas()
    key = ["subj", "va", "vb"]
    assert a["vb"].isna().any() and a["vb"].notna().any()  # true OPTIONAL
    assert len(a) == a["subj"].nunique()                   # one row per doc
    sa = a.sort_values(key).reset_index(drop=True)
    sb = b[key].sort_values(key).reset_index(drop=True)
    assert sa.equals(sb)

    u = union_bgp(ds, [SDO + "inLanguage", SDO + "isBasedOn"]).to_pandas()
    assert len(u) == 2 * len(a)            # bag: both branches, no dedup


def test_revenue_by_region_count_gate(ray_session):
    """Above the orders-row cutoff revenue_by_region must route through
    the partitioned hash join (no driver collect of orders) and return
    identical rows."""
    from rdfx_ray.pipelines.analytics import revenue_by_region

    SF = "/root/testdata/sf0.001"
    a = revenue_by_region(SF).to_pandas()
    b = revenue_by_region(SF, broadcast_cutoff_rows=0).to_pandas()
    key = ["r_name"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))

    # one level down: customer over ITS cutoff must also avoid the
    # driver (second partitioned hash join; only nation⋈region
    # broadcast) and still agree
    from rdfx_ray.pipelines.joins import revenue_by_region_shuffle
    c = revenue_by_region_shuffle(
        SF, customer_broadcast_cutoff_rows=0).to_pandas()
    assert a.sort_values(key).reset_index(drop=True).equals(
        c[["r_name", "revenue_c4"]].sort_values(key)
        .reset_index(drop=True))


def test_property_path_plus_and_star(ray_session):
    """?s citation+ ?o transitive closure: broadcast pointer-chasing
    and the distributed semi-naive plan (cutoff=0) produce the
    identical pair set, matching a locally computed closure; * adds
    exactly the node identity pairs."""
    from rdfx_ray.functions.doc_triples import (
        CITATION_CHAIN,
        SDO,
        doc_citation_triples,
    )
    from rdfx_ray.pipelines.query import (
        property_path_plus,
        property_path_star,
    )

    SF = "/root/testdata/sf0.001"
    ds = doc_citation_triples(SF)
    a = property_path_plus(ds, SDO + "citation").to_pandas()

    # local reference closure over the deterministic chain relation
    import pandas as pd
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    want = set()
    for d in docs["doc_id"]:
        cur = int(d)
        while cur % CITATION_CHAIN != 0:
            want.add((f"urn:doc:{int(d)}", f"urn:doc:{cur - 1}"))
            cur -= 1
    got = set(zip(a["subj"], a["obj"]))
    assert got == want and len(a) == len(got)  # set semantics, no dups

    b = property_path_plus(ds, SDO + "citation",
                           broadcast_cutoff_rows=0,
                           num_partitions=2).to_pandas()
    assert set(zip(b["subj"], b["obj"])) == want and len(b) == len(want)

    s = property_path_star(ds, SDO + "citation").to_pandas()
    nodes = {t for pair in want for t in pair} \
        | {f"urn:doc:{int(d)}" for d in docs["doc_id"]
           if int(d) % CITATION_CHAIN != 0}
    assert set(zip(s["subj"], s["obj"])) == want | {(n, n) for n in nodes}
    assert len(s) == len(want) + len(nodes)


def test_property_path_plus_cross_block_convergence(ray_session):
    """A subject whose depth-1 edges span BLOCKS with chains that
    converge on one node must still emit each closure pair once:
    s->a (block 1) and s->b (block 2) both reach c, so both blocks'
    chases produce (s, c) — the global distinct has to collapse them
    (round-3 ADVICE regression)."""
    import pandas as pd
    import ray.data as rd

    from rdfx_ray.pipelines.query import property_path_plus

    def row(s, o):
        return {"subj": s, "pred": "urn:p", "obj_kind": "iri",
                "obj_value": o, "obj_datatype": None,
                "graph_iri": "urn:g"}

    blk1 = pd.DataFrame([row("urn:s", "urn:a"), row("urn:a", "urn:c")])
    blk2 = pd.DataFrame([row("urn:s", "urn:b"), row("urn:b", "urn:c")])
    ds = rd.from_pandas([blk1, blk2])
    want = {("urn:s", "urn:a"), ("urn:s", "urn:b"), ("urn:s", "urn:c"),
            ("urn:a", "urn:c"), ("urn:b", "urn:c")}
    for kw in ({}, {"broadcast_cutoff_rows": 0, "num_partitions": 2}):
        out = property_path_plus(ds, "urn:p", **kw).to_pandas()
        assert set(zip(out["subj"], out["obj"])) == want
        assert len(out) == len(want)  # (s, c) exactly once


def test_property_path_plus_cycle_terminates(ray_session):
    """A cyclic edge set must terminate (anti-join dedup) and return
    the full closure — every node reaches every node in a 4-cycle."""
    import pandas as pd
    import ray.data as rd

    from rdfx_ray.pipelines.query import property_path_plus

    n = 4
    rows = [{"subj": f"urn:n:{i}", "pred": "urn:p",
             "obj_kind": "iri", "obj_value": f"urn:n:{(i + 1) % n}",
             "obj_datatype": None, "graph_iri": "urn:g"}
            for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    for kw in ({}, {"broadcast_cutoff_rows": 0, "num_partitions": 2}):
        out = property_path_plus(ds, "urn:p", **kw).to_pandas()
        got = set(zip(out["subj"], out["obj"]))
        assert got == {(f"urn:n:{i}", f"urn:n:{j}")
                       for i in range(n) for j in range(n)}
        assert len(out) == n * n


def test_minus_bgp_both_routes(ray_session):
    """MINUS anti-join: broadcast inverted-is_in and the left_outer
    null-marker route return identical rows — docs NOT based on src3,
    and none of the excluded subjects survive."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import minus_bgp, triple_pattern

    SF = "/root/testdata/sf0.001"
    ds = doc_triples(SF)
    a = minus_bgp(ds, SDO + "inLanguage", SDO + "isBasedOn",
                  minus_obj="src3").to_pandas()
    b = minus_bgp(ds, SDO + "inLanguage", SDO + "isBasedOn",
                  minus_obj="src3", broadcast_cutoff_rows=0,
                  num_partitions=2).to_pandas()
    key = ["subj", "va"]
    assert len(a) > 0
    excluded = set(triple_pattern(ds, pred=SDO + "isBasedOn",
                                  obj_value="src3")
                   .to_pandas()["subj"])
    assert excluded and not (set(a["subj"]) & excluded)
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))


def test_property_path_seq_both_routes(ray_session):
    """Sequence path p1/p2: broadcast probe and native shuffle join
    agree and equal the composed two-hop pairs."""
    from rdfx_ray.functions.doc_triples import (
        CITATION_CHAIN,
        SDO,
        doc_citation_triples,
    )
    from rdfx_ray.pipelines.query import property_path_seq

    SF = "/root/testdata/sf0.001"
    ds = doc_citation_triples(SF)
    a = property_path_seq(ds, SDO + "citation", SDO + "citation") \
        .to_pandas()
    b = property_path_seq(ds, SDO + "citation", SDO + "citation",
                          broadcast_cutoff_rows=0,
                          num_partitions=2).to_pandas()

    import pandas as pd
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    want = {(f"urn:doc:{int(d)}", f"urn:doc:{int(d) - 2}")
            for d in docs["doc_id"]
            if int(d) % CITATION_CHAIN != 0
            and (int(d) - 1) % CITATION_CHAIN != 0}
    assert set(zip(a["subj"], a["obj"])) == want and len(a) == len(want)
    key = ["subj", "obj"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[key].sort_values(key).reset_index(drop=True))


def test_sparql_modifier_shapes_match_duckdb(ray_session):
    """GROUP BY aggregate, numeric FILTER, regex FILTER, VALUES,
    ORDER BY/LIMIT and DISTINCT shapes each match a direct DuckDB
    replay over the documents table (the same SQL the driver oracle
    runs)."""
    import duckdb
    import pandas as pd

    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import (
        construct_bgp,
        distinct_values_bgp,
        filter_expr_bgp,
        filter_regex_bgp,
        group_concat_bgp,
        group_count_bgp,
        order_limit_bgp,
        values_bgp,
    )

    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{SF}/documents.parquet'")
    ds = doc_triples(SF)

    def norm(df, key):
        return df.sort_values(key).reset_index(drop=True)

    cases = [
        (group_count_bgp(ds, SDO + "inLanguage"),
         "SELECT lang AS v, COUNT(*) AS n FROM documents GROUP BY lang",
         ["v"]),
        (filter_expr_bgp(ds, SDO + "characterCount", 300),
         "SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, "
         "CAST(n_chars AS BIGINT) AS c FROM documents "
         "WHERE n_chars >= 300", ["subj"]),
        (filter_regex_bgp(ds, SDO + "isBasedOn", "src1[0-9]$"),
         "SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, "
         "source AS v FROM documents "
         "WHERE regexp_matches(source, 'src1[0-9]$')", ["subj"]),
        (values_bgp(ds, SDO + "inLanguage", ["en", "de"]),
         "SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, "
         "lang AS v FROM documents WHERE lang IN ('en', 'de')",
         ["subj"]),
        (order_limit_bgp(ds, SDO + "characterCount", k=100),
         "SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, "
         "CAST(n_chars AS BIGINT) AS c FROM documents "
         "ORDER BY c DESC, subj LIMIT 100", ["subj"]),
        (distinct_values_bgp(ds, SDO + "isBasedOn"),
         "SELECT DISTINCT source AS v FROM documents", ["v"]),
        (construct_bgp(ds, SDO + "inLanguage", "en",
                       SDO + "isBasedOn", "urn:derived:langSource"),
         "SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, "
         "'urn:derived:langSource' AS pred, 'literal' AS obj_kind, "
         "source AS obj_value, CAST(NULL AS VARCHAR) AS obj_datatype, "
         "CAST(NULL AS VARCHAR) AS obj_lang, "
         "'urn:graph:derived' AS graph_iri "
         "FROM documents WHERE lang = 'en'", ["subj"]),
        (group_concat_bgp(ds, SDO + "inLanguage", SDO + "isBasedOn"),
         "SELECT lang AS v, string_agg(DISTINCT source, ',' "
         "ORDER BY source) AS vals FROM documents GROUP BY lang",
         ["v"]),
    ]
    for got_ds, sql, key in cases:
        got = got_ds.to_pandas()
        want = con.sql(sql).df()
        assert len(got) > 0, sql
        pd.testing.assert_frame_equal(
            norm(got[want.columns.tolist()], key), norm(want, key),
            check_dtype=False)


def test_validate_shapes_detects_violations(ray_session):
    """SHACL-lite checks flag a corrupted graph: a duplicated
    cardinality triple, a non-integer datatype literal, and an
    out-of-vocabulary value each produce exactly one violation."""
    import pyarrow as pa
    import ray.data as rd

    from rdfx_ray.pipelines.validate import validate_shapes

    P = "urn:p:"
    rows = {
        "subj": ["urn:d:0", "urn:d:1", "urn:d:1",   # d:1 has TWO langs
                 "urn:d:0", "urn:d:1",
                 "urn:d:0", "urn:d:1"],
        "pred": [P + "lang", P + "lang", P + "lang",
                 P + "chars", P + "chars",
                 P + "lang2", P + "lang2"],
        "obj_kind": ["literal"] * 7,
        "obj_value": ["en", "de", "fr",
                      "42", "not-a-number",
                      "en", "xx"],
        "obj_datatype": [None] * 7,
        "graph_iri": ["urn:g:0"] * 7,
    }
    ds = rd.from_arrow(pa.table(rows))
    rep = validate_shapes(ds, card_pred=P + "lang",
                          dtype_pred=P + "chars",
                          in_pred=P + "lang2",
                          in_values=["en", "de"])
    rep = rep.set_index("shape_rule")
    assert rep.loc["card_exactly_1", "n_checked"] == 2
    assert rep.loc["card_exactly_1", "n_violations"] == 1
    assert rep.loc["dtype_integer", "n_checked"] == 2
    assert rep.loc["dtype_integer", "n_violations"] == 1
    assert rep.loc["value_in_set", "n_checked"] == 2
    assert rep.loc["value_in_set", "n_violations"] == 1
