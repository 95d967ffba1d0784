"""Round-5 operator tests: bucketed embedding decontaminate route,
IVF artifact cache keys, pinned-bucket BFS large route, auto bucket
derivation, hashed scale-mode sampling twins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("vec_id").reset_index(drop=True)


def test_embedding_decontaminate_full_probe_equals_exact(ray_session):
    """Forced bucketed route with nprobe == n_lists reproduces the
    exact broadcast route bit-for-bit (every test row meets every
    train row exactly once across the lists)."""
    from rdfx_ray.functions.similarity import embedding_decontaminate

    exact = _sorted(embedding_decontaminate(SF).to_pandas())
    full = _sorted(embedding_decontaminate(
        SF, broadcast_cutoff=0, n_lists=8, nprobe=8).to_pandas())
    assert len(exact) == len(full) > 0
    m = exact.merge(full, on="vec_id", suffixes=("_e", "_b"))
    assert len(m) == len(exact)
    assert (m["max_sim_1e6_e"] == m["max_sim_1e6_b"]).all()


def test_embedding_decontaminate_partial_probe_bounds(ray_session):
    """Default nprobe is a documented-recall approximation: same
    test-row set, per-row max-sim never above the exact answer, and
    (deterministic corpus) most rows find their true max."""
    from rdfx_ray.functions.similarity import embedding_decontaminate

    exact = _sorted(embedding_decontaminate(SF).to_pandas())
    approx = _sorted(embedding_decontaminate(
        SF, broadcast_cutoff=0, n_lists=16, nprobe=4).to_pandas())
    m = exact.merge(approx, on="vec_id", suffixes=("_e", "_a"))
    assert len(m) == len(exact) == len(approx)
    assert (m["max_sim_1e6_a"] <= m["max_sim_1e6_e"]).all()
    # deterministic at this corpus: measured 0.636 exact-hit fraction
    assert (m["max_sim_1e6_a"] == m["max_sim_1e6_e"]).mean() >= 0.5


def test_bfs_forced_routes_match_recursive_cte_oracle(ray_session):
    """Both forced large routes (pinned rebuild and the legacy join
    twin) reproduce the recursive-CTE oracle's (node, dep) rows —
    the driver-route agreement test from round 4, now per route."""
    import duckdb

    from rdfx_ray.functions.components import (
        _citation_bfs_sql,
        bfs_depth,
    )
    from rdfx_ray.functions.doc_triples import doc_citation_triples

    edges = doc_citation_triples(SF).map_batches(
        lambda b: pa.table({"src": b.column("subj"),
                            "dst": b.column("obj_value")}),
        batch_format="pyarrow")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    want = (con.sql(_citation_bfs_sql()).df()
            .sort_values("node").reset_index(drop=True))
    for route in ("pinned", "join"):
        got = (bfs_depth(edges, driver_cutoff=0, num_partitions=4,
                         large_route=route).to_pandas()
               .sort_values("node").reset_index(drop=True))
        assert len(got) == len(want) > 0, route
        assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
        assert (got["dep"].to_numpy() == want["dep"].to_numpy()).all()


def test_auto_buckets_scales_with_rows(ray_session):
    """B grows linearly past the CPU floor and a bucket never exceeds
    ~target rows — the fixed-default-16 fix (one pinned bucket must
    not become ~6% of a 100× edge set)."""
    from rdfx_ray.functions.components import (
        _auto_buckets,
        _cluster_cpus,
    )

    cpus = _cluster_cpus()
    assert _auto_buckets(0) == max(1, cpus)
    assert _auto_buckets(1_000) == max(1, cpus)
    # past the floor, rows/bucket stays ≤ target
    for rows in (10_000_000, 50_000_000):
        b = _auto_buckets(rows)
        assert rows / b <= (1 << 17)
    # capped
    assert _auto_buckets(10**12) == 512


def test_md5_kernels_match_hashlib():
    """The vectorized (DuckDB-expression) md5 kernels are
    byte-identical to the hashlib loops they replaced — md5 is the
    cross-engine oracle contract, so the scale fix computes the SAME
    function, never a different hash (identical row sets by
    construction, measured ~5× on ids / ~2.4× on text; BASELINE.md
    round 5)."""
    import hashlib

    from rdfx_ray.functions.md5keys import (
        _md5_mod_loop,
        md5_hex_bucket,
        md5_hex_text,
        md5_mod,
    )

    ids = np.arange(-3, 20000, dtype=np.int64)
    for mod in (100, 10000):
        assert np.array_equal(md5_mod(ids, mod),
                              _md5_mod_loop(ids, mod))
    h, b = md5_hex_bucket(ids, suffix=":7")
    want = [hashlib.md5(f"{i}:7".encode()).hexdigest()
            for i in ids.tolist()]
    assert h.to_pylist() == want
    assert np.array_equal(
        b, np.array([int(x[:2], 16) for x in want], np.int64))
    texts = ["héllo wörld", "", None, "a" * 5000, "tab\tnl\n",
             "数据处理"]
    got = md5_hex_text(pa.array(texts, pa.string())).to_pylist()
    assert got == [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                   for t in texts]
    # empty input keeps its shape
    assert len(md5_mod(np.array([], np.int64), 100)) == 0
    assert len(md5_hex_text(pa.array([], pa.string()))) == 0


def test_ivf_cache_key_encodes_training_route(ray_session):
    """Sampled and distributed Lloyd's training produce different
    centroids — the artifact key must keep their caches apart so a
    flipped default never serves the other route's index."""
    from rdfx_ray.functions.similarity import ivf_index_for

    a = ivf_index_for(SF, n_lists=4)
    b = ivf_index_for(SF, n_lists=4, distributed_train=True)
    assert a.index_dir != b.index_dir
    assert str(b.index_dir).endswith("-D1")
    # cache round-trip: same flag → same artifact dir, loaded not
    # rebuilt (manifest already present)
    a2 = ivf_index_for(SF, n_lists=4)
    b2 = ivf_index_for(SF, n_lists=4, distributed_train=True)
    assert a2.index_dir == a.index_dir
    assert b2.index_dir == b.index_dir
    assert np.array_equal(b2.centroids, b.centroids)


def test_orders_skyline_window_form_is_dominance(ray_session):
    """The oracle's O(n log n) window formulation computes EXACTLY the
    NOT EXISTS dominance semantics (pinned on the full sf0.001 table,
    where the quadratic twin is cheap)."""
    import duckdb

    from rdfx_ray.pipelines.analytics_r5 import (
        ORDERS_SKYLINE_NOT_EXISTS_SQL,
        ORDERS_SKYLINE_SQL,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"'{SF}/orders.parquet'")
    cols = ["o_orderkey", "price_c", "d"]
    a = (con.sql(ORDERS_SKYLINE_SQL).df()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (con.sql(ORDERS_SKYLINE_NOT_EXISTS_SQL).df()[cols]
         .sort_values(cols).reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert a.equals(b)


def test_docs_familiarity_routes_agree(ray_session):
    """The forced distributed-join route (broadcast_cutoff=0) scores
    every document identically to the broadcast route — the
    count-gated-plans-agree pattern."""
    from rdfx_ray.pipelines.analytics_r5 import docs_familiarity

    a = (docs_familiarity(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (docs_familiarity(SF, broadcast_cutoff=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["familiarity"].to_numpy()
            == b["familiarity"].to_numpy()).all()
    assert (a["n_bigrams"].to_numpy() == b["n_bigrams"].to_numpy()).all()
    # train docs see their own bigrams: scores are non-trivial
    assert a["familiarity"].max() > 0


def test_events_user_islands_swallowing_interval(ray_session, tmp_path):
    """A long interval must swallow several later short ones — the
    case the fixed-gap sessionize rule gets wrong and the
    running-max-end sweep exists for."""
    import pyarrow.parquet as pq

    from rdfx_ray.pipelines.analytics_r5 import events_user_islands

    # user 1: event 599 lasts 600 s (599 % 600 + 1) and covers the
    # t=100s and t=500s events (ids ≡ 0 mod 600 → 1-second
    # durations); a fourth event at t=700s starts a new island.
    # user 2: one event, one island.
    base = 1_700_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array([599, 600, 1200, 1800, 2400],
                             pa.int64()),  # durs: 600s,1s,1s,1s,1s
        "ts": pa.array(
            [base, base + 100_000_000, base + 500_000_000,
             base + 700_000_000, base], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (events_user_islands(str(tmp_path)).to_pandas()
           .sort_values(["user_id", "island_start"])
           .reset_index(drop=True))
    # durations: (event_id % 600 + 1) s
    d599 = 600_000_000
    u1 = out[out.user_id == 1]
    assert len(u1) == 2
    first = u1.iloc[0]
    assert first.island_start == base
    assert first.island_end == base + d599  # the long interval's end
    assert first.n_events == 3              # swallowed both short ones
    second = u1.iloc[1]
    assert second.island_start == base + 700_000_000
    assert second.island_end == base + 701_000_000
    assert second.n_events == 1
    assert len(out[out.user_id == 2]) == 1


def test_edit_pairs_blocking_finds_all_planted(ray_session, tmp_path):
    """Blocking completeness end-to-end: every planted ≤k-edit pair is
    found EXACTLY once (next-bucket replication double-count guard),
    cross-checked against the quadratic oracle on the same table."""
    import duckdb
    import pyarrow.parquet as pq

    from rdfx_ray.pipelines.analytics_r5 import (
        DOCS_EDIT_PAIRS_SQL,
        docs_edit_distance_pairs,
    )

    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefgh"))
    texts, langs = [], []
    # planted clusters: a base string + 1- and 2-edit variants, plus
    # length-straddling variants (delete chars so the pair crosses a
    # length bucket), plus unrelated noise
    for c in range(12):
        b = "".join(rng.choice(alpha, size=24))
        texts += [b,
                  b[:5] + "z" + b[6:],          # 1 substitution
                  b[:3] + b[4:] + "q",          # del+append = dist 2
                  b[:23],                       # 1 deletion (len 23)
                  b[:22]]                       # 2 deletions (len 22)
        langs += ["en"] * 5
    for _ in range(40):
        texts.append("".join(rng.choice(alpha, size=24)))
        langs.append("en")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (docs_edit_distance_pairs(str(tmp_path)).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = (con.sql(DOCS_EDIT_PAIRS_SQL).df()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    # no pair appears twice
    assert not got.duplicated(["doc_a", "doc_b"]).any()
    assert len(got) == len(want) > 0
    assert (got["doc_a"].to_numpy() == want["doc_a"].to_numpy()).all()
    assert (got["doc_b"].to_numpy() == want["doc_b"].to_numpy()).all()
    assert (got["dist"].to_numpy() == want["dist"].to_numpy()).all()


def test_docs_fuzzy_clusters_planted(ray_session, tmp_path):
    """Each planted near-dup group collapses (transitively) to one
    cluster labelled by its min doc_id; noise docs label themselves."""
    import pyarrow.parquet as pq

    from rdfx_ray.pipelines.analytics_r5 import docs_fuzzy_clusters

    rng = np.random.default_rng(11)
    alpha = np.array(list("abcdefgh"))
    texts, langs = [], []
    for c in range(6):
        b = "".join(rng.choice(alpha, size=24))
        texts += [b, b[:5] + "z" + b[6:], b[:23]]
        langs += ["en"] * 3
    for _ in range(20):
        texts.append("".join(rng.choice(alpha, size=24)))
        langs.append("en")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (docs_fuzzy_clusters(str(tmp_path)).to_pandas()
           .set_index("doc_id")["cluster"])
    for c in range(6):
        base = 3 * c
        assert out[base] == out[base + 1] == out[base + 2] == base
    # noise docs (ids 18..37): singletons unless they collide by
    # chance with a planted key — at this alphabet/seed they don't
    noise = out[out.index >= 18]
    assert (noise == noise.index).all()


def test_docs_weighted_sample_invariants(ray_session):
    """Systematic PPS accounting: every step-multiple in [1, W_total)
    lands in exactly one selected doc's interval, so Σ n_hits equals
    the global multiple count; selection is deterministic."""
    import duckdb

    from rdfx_ray.pipelines.analytics_r5 import (
        WEIGHTED_SAMPLE_TARGET,
        docs_weighted_sample,
    )

    out = (docs_weighted_sample(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    w_total = con.sql(
        f"SELECT CAST(SUM(n_chars) AS BIGINT) FROM "
        f"'{SF}/documents.parquet'").fetchone()[0]
    step = max(w_total // WEIGHTED_SAMPLE_TARGET, 1)
    assert (out["n_hits"] >= 1).all()
    assert out["n_hits"].sum() == (w_total - 1) // step
    again = (docs_weighted_sample(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert out.equals(again)


def test_docs_top_terms_shape(ray_session):
    """Per-doc ranks are contiguous from 1, scores non-increasing
    within a doc, never more than k rows per doc."""
    from rdfx_ray.pipelines.analytics_r5 import (
        TOP_TERMS_K,
        docs_top_terms,
    )

    out = (docs_top_terms(SF).to_pandas()
           .sort_values(["doc_id", "rk"]).reset_index(drop=True))
    assert len(out) > 0
    g = out.groupby("doc_id")
    assert (g["rk"].max() <= TOP_TERMS_K).all()
    assert (g["rk"].min() == 1).all()
    assert g.apply(
        lambda x: (x["rk"].to_numpy()
                   == np.arange(1, len(x) + 1)).all()).all()
    assert g.apply(
        lambda x: (np.diff(x["score"].to_numpy()) <= 0).all()).all()


def test_docs_top_terms_routes_agree(ray_session):
    """The forced vocab-join route (broadcast_cutoff=0) emits the
    identical per-doc top-k as the broadcast route."""
    from rdfx_ray.pipelines.analytics_r5 import docs_top_terms

    cols = ["doc_id", "rk"]
    a = (docs_top_terms(SF).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    b = (docs_top_terms(SF, broadcast_cutoff=0).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    assert len(a) == len(b) > 0
    for c in ["doc_id", "term", "score", "rk"]:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_docs_fuzzy_clusters_routes_agree(ray_session, tmp_path):
    """The forced Dataset-native component route (driver_cutoff=0)
    labels every document identically to the broadcast-label route on
    the planted corpus."""
    import pyarrow.parquet as pq

    from rdfx_ray.pipelines.analytics_r5 import docs_fuzzy_clusters

    rng = np.random.default_rng(13)
    alpha = np.array(list("abcdefgh"))
    texts, langs = [], []
    for c in range(8):
        b = "".join(rng.choice(alpha, size=24))
        texts += [b, b[:5] + "z" + b[6:], b[:23]]
        langs += ["en"] * 3
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    a = (docs_fuzzy_clusters(str(tmp_path)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (docs_fuzzy_clusters(str(tmp_path), driver_cutoff=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()


def test_pq_topk_recall_and_determinism(ray_session):
    """8-bit PQ (m=8, ks=256): per-query recall@10 vs the exact route
    stays above the measured floor (0.7 at this corpus; 0.425/0.575
    at ks=16/64 — BASELINE.md round 5), and two runs are
    bit-identical (deterministic sample, init and tie-breaks)."""
    from rdfx_ray.functions.similarity import brute_topk, pq_topk

    br = brute_topk(SF).to_pandas()
    pq = pq_topk(SF).to_pandas()
    for q in sorted(br.query_id.unique()):
        want = set(br[br.query_id == q].vec_id)
        got = set(pq[pq.query_id == q].vec_id)
        assert len(want & got) / len(want) >= 0.6, q
    again = pq_topk(SF).to_pandas()
    assert pq.equals(again)


def test_edit_pairs_passjoin_route_exact(ray_session, tmp_path):
    """The PassJoin scale route (segment pigeonhole + candidate join)
    returns EXACTLY the quadratic oracle's pairs — including
    length-straddling variants, short keys (≤ k chars, where the
    pigeonhole is void and the dedicated tiny-length group takes
    over), and keys spanning the short/long boundary."""
    import duckdb
    import pyarrow.parquet as pq

    from rdfx_ray.pipelines.analytics_r5 import (
        DOCS_EDIT_PAIRS_SQL,
        docs_edit_distance_pairs,
    )

    rng = np.random.default_rng(23)
    alpha = np.array(list("abcdefgh"))
    texts, langs = [], []
    for c in range(10):
        b = "".join(rng.choice(alpha, size=24))
        texts += [b, b[:5] + "z" + b[6:], b[:3] + b[4:] + "q",
                  b[:23], b[:22]]
        langs += ["en"] * 5
    # short keys: pairs with min length ≤ k, plus boundary lengths
    texts += ["ab", "ab", "abq", "a", "", "abcd", "abce", "abcdef"]
    langs += ["en"] * 8
    for _ in range(30):
        texts.append("".join(rng.choice(alpha, size=24)))
        langs.append("en")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = (con.sql(DOCS_EDIT_PAIRS_SQL).df()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(want) > 0
    for route in ("passjoin", "block"):
        got = (docs_edit_distance_pairs(str(tmp_path), route=route)
               .to_pandas()
               .sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))
        assert not got.duplicated(["doc_a", "doc_b"]).any(), route
        assert len(got) == len(want), (route, len(got), len(want))
        for c in ("doc_a", "doc_b", "dist"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), \
                (route, c)
