"""Vectorized NT-line source + end-to-end corpus dedup tests."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rdfx_ray.rdf import Graph


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_read_nt_dataset_roundtrip(tmp_path):
    from rdfx_ray.pipelines.verbs import read_nt_dataset

    g = Graph()
    from rdfx_ray.rdf import bnode, iri, literal
    g.add((iri("http://e/s1"), iri("http://e/p"), literal('esc "q"\n', lang="en")))
    g.add((iri("http://e/s2"), iri("http://e/p"),
           literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer")))
    g.add((bnode("x"), iri("http://e/q"), iri("http://e/o")))
    nt = g.serialize("nt")
    f = tmp_path / "data.nt"
    f.write_text(nt)

    ds = read_nt_dataset([f])
    df = ds.to_pandas()
    assert len(df) == 3
    assert set(df["obj_kind"]) == {"literal", "iri"}
    row = df[df["subj"] == "http://e/s1"].iloc[0]
    assert row["obj_value"] == 'esc "q"\n'     # unescaped
    assert row["obj_lang"] == "en"
    assert df[df["subj"] == "_:x"].shape[0] == 1


def test_read_nt_dataset_rejects_garbage(tmp_path):
    from rdfx_ray.pipelines.verbs import read_nt_dataset
    f = tmp_path / "bad.nt"
    f.write_text("<a> <b> .\n")
    with pytest.raises(Exception, match="Invalid N-Triples"):
        read_nt_dataset([f]).to_pandas()


def test_dedup_corpus_components(tmp_path):
    from rdfx_ray.functions.dedup import dedup_corpus

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = {
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            base,                       # keeper of component {0,1,2}
            base,                       # exact dup of 0
            base + " extra",            # near dup of 0/1
            "totally different content about engines and pipelines",
            "another unrelated document mentioning nothing similar",
        ],
    }
    pq.write_table(pa.table(docs), tmp_path / "documents.parquet")
    out = dedup_corpus(str(tmp_path), threshold=0.5).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[0, "keeper_doc_id"] == 0 and not out.loc[0, "is_dup"]
    assert out.loc[1, "keeper_doc_id"] == 0 and out.loc[1, "is_dup"]
    assert out.loc[2, "keeper_doc_id"] == 0 and out.loc[2, "is_dup"]
    assert out.loc[3, "keeper_doc_id"] == 3 and not out.loc[3, "is_dup"]
    assert out.loc[4, "keeper_doc_id"] == 4


def test_nt_partitions_roundtrip_to_parquet_triples(tmp_path):
    """The .nt partition files and triples.parquet of a finished run
    describe the same graph: parse NT back through the vectorized NT
    source and compare the full decomposed-triple sets."""
    from rdfx_ray.pipelines.kg import KGConfig, read_final_triples, run_kg_pipeline
    from rdfx_ray.pipelines.verbs import read_nt_dataset
    from rdfx_ray.sources.documents import generate_documents

    uri = str(tmp_path / "in")
    out = str(tmp_path / "out")
    generate_documents(uri, n_docs=200, n_entities=60, fragment_rows=100)
    run_kg_pipeline(uri, out, KGConfig(n_buckets=4, n_entities=60,
                                       batch_size=100, shard_fragments=2))
    from pathlib import Path
    nt_paths = sorted(Path(out).glob("final/bucket=*/part-*.nt"))
    cols = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
            "obj_lang"]
    from_nt = read_nt_dataset(nt_paths).to_pandas()
    from_pq = read_final_triples(out).to_pandas()[cols]
    key = lambda df: set(map(tuple, df[cols].fillna("∅").to_numpy()))
    assert key(from_nt) == key(from_pq)


def test_distributed_components_match_union_find(ray_session):
    """Min-label propagation (the 10^12-doc path) agrees exactly with
    driver union-find on a random-ish edge set incl. chains (multi-
    round convergence) and a star."""
    import numpy as np
    import pyarrow as pa
    from rdfx_ray.functions.components import (
        connected_components,
        union_find_components,
    )

    rng = np.random.default_rng(17)
    # chain 0-1-2-...-9 (diameter 9 → several rounds), star at 100,
    # some random pairs
    edges = [(i, i + 1) for i in range(9)]
    edges += [(100, x) for x in (101, 102, 103)]
    pairs = rng.integers(200, 260, size=(30, 2))
    edges += [(int(x), int(y)) for x, y in pairs if x != y]
    tbl = pa.table({
        "doc_a": pa.array([min(a, b) for a, b in edges], pa.int64()),
        "doc_b": pa.array([max(a, b) for a, b in edges], pa.int64()),
    })
    got, stats = connected_components(tbl)
    want = union_find_components(tbl)
    assert got.to_pydict() == want.to_pydict()
    assert stats["rounds"] >= 2  # the chain forces real propagation
    assert stats["changed"][-1] == 0


def test_distributed_components_empty(ray_session):
    import pyarrow as pa
    from rdfx_ray.functions.components import connected_components
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    got, stats = connected_components(empty)
    assert got.num_rows == 0 and stats["rounds"] == 0


def test_pagerank_routes_agree(ray_session):
    """PageRank: the count-gated driver-numpy route and the
    distributed join/groupby iteration produce identical integer-
    scaled ranks; mass is conserved; rank accumulates at citation-
    chain roots (the only sinks)."""
    import pandas as pd
    import pyarrow as pa

    from rdfx_ray.functions.components import citation_pagerank, pagerank
    from rdfx_ray.functions.doc_triples import doc_citation_triples

    SF = "/root/testdata/sf0.001"
    small = citation_pagerank(SF, n_iter=10)
    small_df = (small.to_pandas() if not isinstance(small, pd.DataFrame)
                else small)

    edges = doc_citation_triples(SF).map_batches(
        lambda b: pa.table({"src": b.column("subj"),
                            "dst": b.column("obj_value")}),
        batch_format="pyarrow")
    # pinned-edges actor route (nodes fit driver, edges pinned once)
    pinned_df = pagerank(edges, n_iter=10, broadcast_cutoff_rows=0,
                         num_partitions=4).to_pandas()
    # per-round join route (nodes too big for one machine)
    dist_df = pagerank(edges, n_iter=10, broadcast_cutoff_rows=0,
                       pinned_nodes_cutoff=0, num_partitions=4,
                       large_route="join").to_pandas()
    # Pregel-sharded route (edges AND rank sharded; default above the
    # pinned cutoff) — float fold order differs, so agreement is
    # pinned to the 1e-9 quantum rather than bit-exact
    shard_df = pagerank(edges, n_iter=10, broadcast_cutoff_rows=0,
                        pinned_nodes_cutoff=0,
                        large_route="sharded").to_pandas()

    for other in (pinned_df, dist_df):
        m = small_df.merge(other, on="node", suffixes=("_s", "_d"))
        assert len(m) == len(small_df) == 500
        assert (m["rank_1e9_s"] == m["rank_1e9_d"]).all()
    m = small_df.merge(shard_df, on="node", suffixes=("_s", "_d"))
    assert len(m) == len(small_df) == 500
    assert (m["rank_1e9_s"] - m["rank_1e9_d"]).abs().max() <= 1
    assert abs(small_df["rank_1e9"].sum() / 1e9 - 1.0) < 1e-6
    # chain edges point N -> N-1: the chain roots (doc_id % 16 == 0)
    # are the sinks and must outrank their chain's first hop
    ranks = dict(zip(small_df["node"], small_df["rank_1e9"]))
    assert ranks["urn:doc:0"] > ranks["urn:doc:15"]


def test_pagerank_sharded_edge_cases(ray_session):
    """The Pregel route's special-cased paths: a single shard (P=1,
    scalar num_returns) and an empty edge set."""
    import pyarrow as pa
    import ray.data as rd

    from rdfx_ray.functions.components import pagerank_sharded

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "c"], pa.string()),
        "dst": pa.array(["b", "c", "a"], pa.string())}))
    one = pagerank_sharded(edges, n_iter=5, n_shards=1).to_pandas()
    two = pagerank_sharded(edges, n_iter=5, n_shards=2).to_pandas()
    m = one.merge(two, on="node", suffixes=("_1", "_2"))
    assert len(m) == 3
    # a 3-cycle is symmetric: every node converges to rank 1/3
    assert (m["rank_1e9_1"] - m["rank_1e9_2"]).abs().max() <= 1
    assert (one["rank_1e9"] - 333333333).abs().max() <= 1

    empty = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))
    out = pagerank_sharded(empty, n_iter=3, n_shards=2)
    assert out.num_rows == 0
