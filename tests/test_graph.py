"""Distributed triangle counting tests — DuckDB cross-check at
sf0.001 plus a dense planted graph where the count is known."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_customer_triangles_match_duckdb():
    import duckdb

    from rdfx_ray.functions.graph import (CUSTOMER_TRIANGLES_SQL,
                                          customer_triangles)

    got = customer_triangles(SF).to_pandas()["n_triangles"][0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"'{SF}/customer.parquet'")
    want = con.execute(CUSTOMER_TRIANGLES_SQL).fetchone()[0]
    assert got == want
    assert got > 0  # the derived chain graph really has triangles


def test_triangle_count_known_graphs():
    """K5 has C(5,3)=10 triangles; a square (4-cycle) has none; a
    high-degree hub exercises the per-degree-class pair generation."""
    import ray.data as rd

    from rdfx_ray.functions.graph import triangle_count

    def edges_ds(pairs):
        import pyarrow as pa
        a = np.array([p[0] for p in pairs], np.int64)
        b = np.array([p[1] for p in pairs], np.int64)
        return rd.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)}))

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert triangle_count(edges_ds(k5), n_buckets=3) == 10

    square = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert triangle_count(edges_ds(square), n_buckets=3) == 0

    # hub 0 connected to 1..30, plus edges (1,2) and (10,11):
    # exactly the two closed wedges at the hub
    hub = [(0, j) for j in range(1, 31)] + [(1, 2), (10, 11)]
    assert triangle_count(edges_ds(hub), n_buckets=4) == 2


def test_count_min_sketch_bounds():
    """CMS never undercounts; with width >> distinct keys the top-20
    estimates are exact; merge associativity holds by construction
    (elementwise sums)."""
    import duckdb

    from rdfx_ray.functions.sketch import events_user_counts_cms

    got = events_user_counts_cms(SF).to_pandas()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT user_id, COUNT(*) n FROM '{SF}/events.parquet' "
        f"GROUP BY user_id").df().set_index("user_id")["n"]
    est = got.set_index("user_id")["est_n"]
    ex = exact.loc[est.index]
    assert (est >= ex).all()                      # overcount-only
    n_total = int(exact.sum())
    eps_bound = (np.e / (1 << 14)) * n_total
    assert ((est - ex) <= max(eps_bound, 1)).all()
    # 150 users vs 16384 buckets x 4 rows: collisions can inflate a
    # single row, but the min over 4 rows should be exact here
    assert (est == ex).all()


def test_degree_orientation_preserves_count_and_caps_wedges():
    """orient_by_degree directs each edge low-degree → high-degree
    (ids preserved): the triangle count is invariant, and a star
    graph's wedge volume collapses (the hub becomes every edge's
    HIGH end, so it generates no wedges). Both routes — gated
    broadcast and the forced two-hash-join attach — must agree."""
    import pyarrow as pa
    import ray.data as rd

    from rdfx_ray.functions.graph import orient_by_degree, triangle_count

    def edges_ds(pairs):
        a = np.array([p[0] for p in pairs], np.int64)
        b = np.array([p[1] for p in pairs], np.int64)
        return rd.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)}))

    # hub graph: 2 triangles at the hub (node 0) — count invariant
    hub = [(0, j) for j in range(1, 31)] + [(1, 2), (10, 11)]
    oriented = orient_by_degree(edges_ds(hub)).materialize()
    assert triangle_count(oriented, n_buckets=4) == 2
    # the hub (node 0, max degree) must be the HIGH end of every edge
    # it touches after orientation → it never appears as an out-node
    tbl = oriented.to_pandas()
    assert (tbl["a"] != 0).all()
    assert (tbl["b"] == 0).sum() == 30
    # forced large route (two-hash-join degree attach): identical
    # edge set and identical count
    joined = orient_by_degree(edges_ds(hub),
                              broadcast_cutoff_nodes=0,
                              num_partitions=2).materialize()
    jt = joined.to_pandas()
    assert (set(zip(jt["a"], jt["b"]))
            == set(zip(tbl["a"], tbl["b"]))) and len(jt) == len(tbl)
    assert triangle_count(joined, n_buckets=4) == 2
    # K5 unchanged by symmetry
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert triangle_count(orient_by_degree(edges_ds(k5)),
                          n_buckets=3) == 10


def test_local_clustering_credits_all_corners():
    """K5: every node has C(4,2)=6 pairs and sits in C(4,2)=6
    triangles → coefficient 1. Hub graph: the hub is in 2 triangles
    out of C(30,2) pairs; spoke nodes 1,2 share one triangle with 2
    pairs each... wait — spokes have degree 2 (hub + one chord), so
    1 triangle / 1 pair = coefficient 1."""
    import pyarrow as pa
    import ray.data as rd

    from rdfx_ray.functions.graph import local_clustering

    def edges_ds(pairs):
        a = np.array([p[0] for p in pairs], np.int64)
        b = np.array([p[1] for p in pairs], np.int64)
        return rd.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)}))

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    out = local_clustering(edges_ds(k5), n_buckets=3).to_pandas() \
        .set_index("node")
    assert len(out) == 5
    assert (out["n_tri"] == 6).all() and (out["n_pairs"] == 6).all()

    hub = [(0, j) for j in range(1, 31)] + [(1, 2), (10, 11)]
    # both credit-attach routes: gated broadcast and the forced
    # join-free indicator fold (cutoff=0) must agree exactly
    for kw in ({}, {"credit_broadcast_cutoff": 0}):
        out = local_clustering(edges_ds(hub), n_buckets=4, **kw) \
            .to_pandas().set_index("node").sort_index()
        assert out.loc[0, "n_tri"] == 2
        assert out.loc[0, "n_pairs"] == 30 * 29 // 2
        for n in (1, 2, 10, 11):
            assert out.loc[n, "n_tri"] == 1 and out.loc[n, "n_pairs"] == 1
        # degree-1 nodes are excluded, zero-triangle deg>=2 nodes kept
        assert (out["n_pairs"] >= 1).all()


def test_k_core_peeling():
    """K5 survives 4-core intact; a chain has no 2-core (cascading
    peel); K4 + pendant chain leaves exactly the K4 at k=2 after the
    chain cascades away."""
    import pyarrow as pa
    import ray.data as rd

    from rdfx_ray.functions.graph import k_core

    def edges_ds(pairs):
        a = np.array([p[0] for p in pairs], np.int64)
        b = np.array([p[1] for p in pairs], np.int64)
        return rd.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)}))

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    out, st = k_core(edges_ds(k5), k=4)
    got = out.to_pandas()  # survivors come back as a Dataset
    assert sorted(got["node"]) == [0, 1, 2, 3, 4]
    assert (got["deg"] == 4).all() and st["removed_per_round"] == [0]

    chain = [(i, i + 1) for i in range(10)]
    out, st = k_core(edges_ds(chain), k=2)
    assert out.count() == 0
    assert st["rounds"] >= 5  # cascade peels from both ends

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    pendant = [(3, 10), (10, 11), (11, 12)]
    out, _ = k_core(edges_ds(k4 + pendant), k=2)
    assert sorted(out.to_pandas()["node"]) == [0, 1, 2, 3]
