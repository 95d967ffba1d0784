"""Window-family operator tests (histogram / moving frame / argmax /
moments) — DuckDB cross-checks at sf0.001 plus edge-case pins."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _duck(sql, views=("events", "orders")):
    import duckdb

    con = duckdb.connect()
    for v in views:
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                    f"'{SF}/{v}.parquet'")
    return con.execute(sql).df()


def test_value_histogram_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_VALUE_HISTOGRAM_SQL, events_value_histogram)

    got = events_value_histogram(SF).to_pandas() \
        .sort_values(["event_type", "bucket"]).reset_index(drop=True)
    want = _duck(EVENTS_VALUE_HISTOGRAM_SQL) \
        .sort_values(["event_type", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # bucket edges partition: total count equals the table size
    n_total = _duck("SELECT COUNT(*) AS n FROM events")["n"][0]
    assert got["n"].sum() == n_total


def test_daily_moving_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        ORDERS_DAILY_MOVING_SQL, orders_daily_moving)

    got = orders_daily_moving(SF).to_pandas() \
        .sort_values("day_us").reset_index(drop=True)
    want = _duck(ORDERS_DAILY_MOVING_SQL) \
        .sort_values("day_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # the trailing frame is ROWS over the day grid: first row's window
    # is itself; steady-state windows span exactly 7 grid rows
    assert got.loc[0, "win_revenue_cents"] == got.loc[0, "revenue_cents"]
    assert (got["win_days"].iloc[7:] == 7).all()
    rev = got["revenue_cents"].to_numpy(np.int64)
    k = 8  # spot-check one mid-grid window against a direct sum
    assert got.loc[k, "win_revenue_cents"] == rev[k - 6:k + 1].sum()


def test_latest_per_user_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_LATEST_PER_USER_SQL, events_latest_per_user)

    got = events_latest_per_user(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = _duck(EVENTS_LATEST_PER_USER_SQL) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # exactly one row per user present in the table
    n_users = _duck("SELECT COUNT(DISTINCT user_id) AS n "
                    "FROM events")["n"][0]
    assert len(got) == n_users


def test_latest_per_user_tiebreak_deterministic():
    """Equal timestamps break by event_id DESC — the fold picks the
    same row regardless of batch split order."""
    from rdfx_ray.pipelines.analytics_window import _last_per_user

    df = pd.DataFrame({
        "user_id": [7, 7, 7, 9],
        "last_ts_us": [100, 100, 50, 10],
        "last_event_id": [3, 12, 99, 1],
        "last_event_type": ["a", "b", "c", "d"],
    })
    out = _last_per_user(df).sort_values("user_id")
    assert out["last_event_id"].tolist() == [12, 1]
    # invariant under input permutation
    out2 = _last_per_user(df.iloc[::-1]).sort_values("user_id")
    assert out2["last_event_id"].tolist() == [12, 1]


def test_value_moments_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_VALUE_MOMENTS_SQL, events_value_moments)

    got = events_value_moments(SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = _duck(EVENTS_VALUE_MOMENTS_SQL) \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # the sufficient statistics reconstruct a sane variance:
    # E[x²] − E[x]² ≥ 0 for every group (integer math, no drift)
    ex2 = got["sum_v2_1e4"] / got["n"]
    ex = got["sum_v_1e2"] / got["n"]
    assert ((ex2 - ex * ex) >= -1e-9).all()


def test_lineitem_comoments_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        LINEITEM_COMOMENTS_SQL, lineitem_comoments)

    got = lineitem_comoments(SF).to_pandas() \
        .sort_values("l_returnflag").reset_index(drop=True)
    want = _duck(LINEITEM_COMOMENTS_SQL, views=("lineitem",)) \
        .sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # reconstructed Pearson r is a valid correlation for every group
    n = got["n"].to_numpy(float)
    sq, sd = got["sum_q_1e2"].to_numpy(float), got["sum_d_1e4"].to_numpy(float)
    sq2, sd2 = got["sum_q2_1e4"].to_numpy(float), got["sum_d2_1e8"].to_numpy(float)
    sqd = got["sum_qd_1e6"].to_numpy(float)
    cov = sqd / n - (sq / n) * (sd / n)
    vq = sq2 / n - (sq / n) ** 2
    vd = sd2 / n - (sd / n) ** 2
    r = cov / np.sqrt(vq * vd)
    assert (np.abs(r) <= 1.0 + 1e-12).all()


def test_year_priority_pivot_matches_duckdb():
    from rdfx_ray.pipelines.analytics_ext import (
        ORDERS_YEAR_PRIORITY_PIVOT_SQL, orders_year_priority_pivot)

    got = orders_year_priority_pivot(SF).to_pandas() \
        .sort_values("year").reset_index(drop=True)
    want = _duck(ORDERS_YEAR_PRIORITY_PIVOT_SQL, views=("orders",)) \
        .sort_values("year").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # the wide counts partition the table: row sums == per-year totals
    n_by_year = _duck(
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS year, COUNT(*) n "
        "FROM orders GROUP BY 1 ORDER BY 1", views=("orders",))
    wide = got[["n_urgent", "n_high", "n_medium", "n_notspec",
                "n_low"]].sum(axis=1).to_numpy()
    assert (wide == n_by_year["n"].to_numpy()).all()


def test_user_rolling_matches_duckdb_and_bucket_invariant():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_USER_ROLLING_SQL, events_user_rolling)

    got = events_user_rolling(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _duck(EVENTS_USER_ROLLING_SQL) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # frame caps at 3 previous rows; each user's first event has none
    assert got["n_prev"].max() == 3
    firsts = got.groupby("user_id")["n_prev"].min()
    assert (firsts == 0).all()
    # bucket count is an execution knob
    b = events_user_rolling(SF, n_buckets=5).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), b.reset_index(drop=True))


def test_props_extraction_and_transitions_match_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_PROPS_K_STATS_SQL, EVENTS_TYPE_TRANSITIONS_SQL,
        events_props_k_stats, events_type_transitions)

    got = events_props_k_stats(SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = _duck(EVENTS_PROPS_K_STATS_SQL) \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    gt = events_type_transitions(SF).to_pandas() \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    wt = _duck(EVENTS_TYPE_TRANSITIONS_SQL) \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gt[wt.columns.tolist()], wt,
                                  check_dtype=False)
    # transition-count identity: total transitions = events - users
    n_ev = _duck("SELECT COUNT(*) n FROM events")["n"][0]
    n_us = _duck("SELECT COUNT(DISTINCT user_id) n FROM events")["n"][0]
    assert gt["n"].sum() == n_ev - n_us


def test_hourly_active_users_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_HOURLY_ACTIVE_SQL, events_hourly_active_users)

    got = events_hourly_active_users(SF).to_pandas() \
        .sort_values("hour_us").reset_index(drop=True)
    want = _duck(EVENTS_HOURLY_ACTIVE_SQL) \
        .sort_values("hour_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    n_users = _duck("SELECT COUNT(DISTINCT user_id) n FROM events")["n"][0]
    assert got["n_users"].max() <= n_users


def test_streaming_tumbling_matches_duckdb_and_drops_late_data():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_STREAMING_TUMBLING_SQL, events_streaming_tumbling)

    got = events_streaming_tumbling(SF).to_pandas() \
        .sort_values("window_us").reset_index(drop=True)
    want = _duck(EVENTS_STREAMING_TUMBLING_SQL) \
        .sort_values("window_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # event_id arrival order genuinely produces late data here, and
    # accepted + dropped account for every event
    sentinel = got[got["window_us"] == -1]
    assert sentinel["n_dropped"].iloc[0] > 0
    n_ev = _duck("SELECT COUNT(*) n FROM events")["n"][0]
    assert got["n_accepted"].sum() + sentinel["n_dropped"].iloc[0] == n_ev
    # per-key watermark keeps the bucket count an execution knob
    b = events_streaming_tumbling(SF, n_buckets=5).to_pandas() \
        .sort_values("window_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, b)


def test_resample_gap_fill_matches_duckdb():
    from rdfx_ray.pipelines.analytics_window import (
        EVENTS_RESAMPLE_SQL, events_resample_15min)

    got = events_resample_15min(SF).to_pandas() \
        .sort_values(["grid_us", "event_type"]).reset_index(drop=True)
    want = _duck(EVENTS_RESAMPLE_SQL) \
        .sort_values(["grid_us", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # the dense grid is complete: every (slot, type) exists exactly
    # once, and zero-fill rows are present
    slots = got["grid_us"].nunique()
    types = got["event_type"].nunique()
    assert len(got) == slots * types
    assert (got["n"] == 0).any()
    n_ev = _duck("SELECT COUNT(*) n FROM events")["n"][0]
    assert got["n"].sum() == n_ev
