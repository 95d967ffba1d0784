"""Round-4 operator tests: sampling / unpivot / cross join / grouping
sets / MAD / order-statistic filter / percent-rank / BFS depth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("documents", "events", "orders", "nation", "region",
          "embeddings")


def _duck(sql: str) -> pd.DataFrame:
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return (df.sort_values(sorted(df.columns), kind="mergesort")
            .reset_index(drop=True))


def test_r4_shapes_match_duckdb(ray_session):
    """Every round-4 query matches its registered DuckDB oracle at
    sf0.001 — the same replay the driver runs (values, not just
    counts)."""
    from rdfx_ray.functions.components import (
        _citation_bfs_sql,
        citation_bfs_depth,
    )
    from rdfx_ray.pipelines import analytics_r4 as r4
    from rdfx_ray.pipelines.rank import (
        ORDERS_PERCENT_RANK_SQL,
        orders_percent_rank,
    )

    cases = [
        (r4.docs_sample_hash(SF), r4.DOCS_SAMPLE_HASH_SQL),
        (r4.events_stratified_sample(SF),
         r4.EVENTS_STRATIFIED_SAMPLE_SQL),
        (r4.orders_unpivot(SF), r4.ORDERS_UNPIVOT_SQL),
        (r4.nation_region_cross(SF), r4.NATION_REGION_CROSS_SQL),
        (r4.docs_grouping_sets(SF), r4.DOCS_GROUPING_SETS_SQL),
        (r4.orders_price_mad(SF), r4.ORDERS_PRICE_MAD_SQL),
        (r4.events_above_p95(SF), r4.EVENTS_ABOVE_P95_SQL),
        (orders_percent_rank(SF), ORDERS_PERCENT_RANK_SQL),
        (citation_bfs_depth(SF), _citation_bfs_sql()),
        (r4.corpus_epoch_shuffle(SF), r4.CORPUS_EPOCH_SHUFFLE_SQL),
        (r4.docs_chunk_overlap(SF), r4.DOCS_CHUNK_OVERLAP_SQL),
        (r4.docs_lang_sample(SF), r4.DOCS_LANG_SAMPLE_SQL),
    ]
    from rdfx_ray.pipelines.asof import (
        EVENTS_ASOF_ORDERS_FORWARD_SQL,
        events_asof_orders,
    )
    cases.append((events_asof_orders(SF, direction="forward"),
                  EVENTS_ASOF_ORDERS_FORWARD_SQL))
    cases.append((r4.events_time_weighted(SF),
                  r4.EVENTS_TIME_WEIGHTED_SQL))
    cases.append((r4.events_user_rolling_time(SF),
                  r4.EVENTS_USER_ROLLING_TIME_SQL))
    from rdfx_ray.functions.similarity import (
        EMBEDDING_DECONTAMINATE_SQL,
        embedding_decontaminate,
    )
    cases.append((embedding_decontaminate(SF),
                  EMBEDDING_DECONTAMINATE_SQL))
    cases.append((r4.orders_monthly_delta(SF),
                  r4.ORDERS_MONTHLY_DELTA_SQL))
    for got, sql in cases:
        if isinstance(got, pa.Table):
            got = got.to_pandas()
        elif not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = _duck(sql)
        a, b = _norm(got), _norm(want)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_bfs_routes_agree(ray_session):
    """The count-gated driver numpy BFS and the Dataset frontier loop
    return identical (node, dep) sets on the citation chains."""
    import pyarrow as pa

    from rdfx_ray.functions.components import bfs_depth
    from rdfx_ray.functions.doc_triples import doc_citation_triples

    edges = doc_citation_triples(SF).map_batches(
        lambda b: pa.table({"src": b.column("subj"),
                            "dst": b.column("obj_value")}),
        batch_format="pyarrow")
    small = bfs_depth(edges).to_pandas()
    dist = bfs_depth(edges, driver_cutoff=0,
                     num_partitions=4).to_pandas()
    m = small.merge(dist, on="node", suffixes=("_s", "_d"))
    assert len(m) == len(small) == len(dist) == 500
    assert (m["dep_s"] == m["dep_d"]).all()
    # chain structure: depth == doc_id % 16
    ids = m["node"].str.removeprefix("urn:doc:").astype(int)
    assert (m["dep_s"].to_numpy() == (ids % 16).to_numpy()).all()


def test_bfs_cycle_nodes_absent(ray_session):
    """Nodes on a sink-free cycle never acquire a depth (exactly the
    recursive-CTE semantics) — in BOTH routes."""
    import ray.data as rd

    from rdfx_ray.functions.components import bfs_depth

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "c"], pa.string()),
        "dst": pa.array(["b", "a", "d"], pa.string())}))
    for kw in ({}, {"driver_cutoff": 0, "num_partitions": 2}):
        got = bfs_depth(edges, **kw).to_pandas()
        got = got.sort_values("node").reset_index(drop=True)
        assert got["node"].tolist() == ["c", "d"]
        assert got["dep"].tolist() == [1, 0]

    empty = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))
    assert bfs_depth(empty).count() == 0


def test_stratified_sample_rates(ray_session):
    """Each stratum's sampled share lands near its configured rate
    (md5 gate is uniform), and rare strata are kept whole at 100%."""
    from rdfx_ray.pipelines.analytics_r4 import (
        STRATIFIED_RATES,
        events_stratified_sample,
    )

    got = events_stratified_sample(SF).to_pandas()
    import pyarrow.parquet as pq
    full = pq.read_table(f"{SF}/events.parquet",
                         columns=["event_type"]).to_pandas()
    totals = full["event_type"].value_counts()
    kept = got["event_type"].value_counts()
    for t, pct in STRATIFIED_RATES.items():
        if t not in totals:
            continue
        share = kept.get(t, 0) / totals[t]
        if pct == 100:
            assert share == 1.0
        else:
            assert abs(share - pct / 100.0) < 0.08


def test_epoch_shuffle_invariants(ray_session):
    """Round-robin shard balance (|shard| within 1 of n/S), contiguous
    per-shard positions, and a different seed yields a different
    permutation (new epoch)."""
    from rdfx_ray.pipelines.analytics_r4 import (
        N_EPOCH_SHARDS,
        corpus_epoch_shuffle,
    )

    a = corpus_epoch_shuffle(SF).to_pandas()
    n = len(a)
    sizes = a.groupby("shard").size()
    assert len(sizes) == N_EPOCH_SHARDS
    assert sizes.max() - sizes.min() <= 1
    for s, g in a.groupby("shard"):
        pos = np.sort(g["pos"].to_numpy())
        assert (pos == np.arange(len(g))).all()
    b = corpus_epoch_shuffle(SF, seed=7).to_pandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert len(m) == n
    assert ((m["shard_a"] != m["shard_b"])
            | (m["pos_a"] != m["pos_b"])).any()


def test_chunk_overlap_covers_tokens(ray_session):
    """Chunk plans tile every doc: first chunk starts at 0, windows
    advance by the stride, the last chunk ends exactly at n_tokens,
    and empty docs yield no chunks."""
    from rdfx_ray.functions.text import token_stats
    from rdfx_ray.pipelines.analytics_r4 import (
        CHUNK_STRIDE,
        docs_chunk_overlap,
    )

    chunks = docs_chunk_overlap(SF).to_pandas()
    toks = token_stats(SF).to_pandas().set_index("doc_id")["n_tokens"]
    assert (chunks["tok_start"]
            == chunks["chunk_idx"] * CHUNK_STRIDE).all()
    last = chunks.sort_values(["doc_id", "chunk_idx"]) \
        .groupby("doc_id").tail(1)
    assert (last["tok_end"].to_numpy()
            == toks.loc[last["doc_id"]].to_numpy()).all()
    n_chunks = chunks.groupby("doc_id").size()
    expect = -(-toks[toks > 0] // CHUNK_STRIDE)
    assert n_chunks.sort_index().equals(expect.sort_index())


def test_citation_components_routes_and_oracle(ray_session):
    """The broadcast-label and Dataset-native min-label routes agree
    and both match the recursive-CTE oracle (incl. isolated docs
    keeping their own label)."""
    from rdfx_ray.functions.components import (
        _citation_components_sql,
        citation_components,
    )

    small = citation_components(SF).to_pandas()
    dist = citation_components(SF, driver_cutoff=0).to_pandas()
    m = small.merge(dist, on="node", suffixes=("_s", "_d"))
    assert len(m) == len(small) == len(dist) == 500
    assert (m["label_s"] == m["label_d"]).all()
    want = _duck(_citation_components_sql())
    pd.testing.assert_frame_equal(_norm(small), _norm(want),
                                  check_dtype=False)
    # chain structure: label == doc_id - doc_id % 16 (chain minimum)
    ids = small["node"].to_numpy()
    assert (small["label"].to_numpy() == ids - ids % 16).all()


def test_ivf_distributed_train_full_probe_exact(ray_session, tmp_path):
    """IvfIndex built with the distributed k-means route still
    satisfies the exactness contract: probing ALL lists equals brute
    force (partitioning correctness is independent of where the
    centroids came from)."""
    from rdfx_ray.functions.similarity import (
        IvfIndex,
        brute_topk,
        default_queries,
    )

    idx = IvfIndex.build(SF, str(tmp_path / "ivf"), n_lists=8,
                         iters=3, distributed_train=True)
    q = default_queries(SF)
    full = idx.search(q, k=10, nprobe=8).to_pandas()
    exact = brute_topk(SF, k=10).to_pandas()
    for qi in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        f = set(full[full["query_id"] == qi]["vec_id"])
        assert f == e, f"query {qi}"


def test_kmeans_partitioning_invariance_and_k1(ray_session):
    """The integer-fold k-means fit is bit-identical under different
    input partitionings, and k=1 reduces to the global normalized
    mean (the label_centroids quantize-then-sum identity)."""
    import ray.data as rd

    from rdfx_ray.functions.similarity import (
        _list_matrix,
        _normalize,
        kmeans_fit,
    )

    a = kmeans_fit(SF, k=4, iters=3).to_pandas()
    b = kmeans_fit(SF, k=4, iters=3).to_pandas()  # fresh plan, same data
    m = a.merge(b, on=["cluster", "dim"], suffixes=("_a", "_b"))
    assert len(m) == len(a) == len(b)
    assert (m["cent_1e6_a"] == m["cent_1e6_b"]).all()
    assert (m["n_members_a"] == m["n_members_b"]).all()
    # every vector is assigned each iteration
    import pyarrow.parquet as pq
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    per_dim = a[a["dim"] == 1]
    assert int(per_dim["n_members"].sum()) == n

    one = kmeans_fit(SF, k=1, iters=2).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"])
    mat = _normalize(_list_matrix(emb.column("embedding"),
                                  dtype=np.float64))
    q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    mean = (q.sum(axis=0) / 1e6) / len(mat)
    want = np.floor(_normalize(mean[None, :])[0] * 1e6 + 0.5) \
        .astype(np.int64)
    assert (one["cent_1e6"].to_numpy() == want).all()


def test_mad_nonnegative_and_bounded(ray_session):
    """MAD sanity: 0 <= mad4x <= 2 * (max deviation); group counts
    sum to the table size."""
    import pyarrow.parquet as pq

    from rdfx_ray.pipelines.analytics_r4 import orders_price_mad

    got = orders_price_mad(SF).to_pandas()
    n = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    assert int(got["n_orders"].sum()) == n
    assert (got["mad4x_cents"] >= 0).all()
