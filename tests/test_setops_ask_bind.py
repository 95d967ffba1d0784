"""Set-operation (INTERSECT/EXCEPT), ASK, and BIND shape tests —
DuckDB cross-checks at sf0.001 plus semantic pins."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _duck(sql, views=("events", "documents")):
    import duckdb

    con = duckdb.connect()
    for v in views:
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                    f"'{SF}/{v}.parquet'")
    return con.execute(sql).df()


def test_intersect_except_match_duckdb_and_partition():
    from rdfx_ray.pipelines.analytics_ext import (
        USERS_TYPE_EXCEPT_SQL, USERS_TYPE_INTERSECT_SQL,
        users_type_except, users_type_intersect)

    inter = users_type_intersect(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exc = users_type_except(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want_i = _duck(USERS_TYPE_INTERSECT_SQL) \
        .sort_values("user_id").reset_index(drop=True)
    want_e = _duck(USERS_TYPE_EXCEPT_SQL) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(inter, want_i, check_dtype=False)
    pd.testing.assert_frame_equal(exc, want_e, check_dtype=False)
    # INTERSECT and EXCEPT partition the qualified-A user set
    n_a = _duck("SELECT COUNT(DISTINCT user_id) AS n FROM events "
                "WHERE event_type = 'purchase' AND value >= 150.0"
                )["n"][0]
    assert len(inter) + len(exc) == n_a
    assert not set(inter["user_id"]) & set(exc["user_id"])
    assert len(exc) > 0  # non-degenerate at the smallest SF


def test_ask_report_true_and_false(kg_triples_sf0001=None):
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import ask_report

    out = ask_report(doc_triples(SF), [
        ("yes", {"pred": SDO + "inLanguage", "obj_value": "en"}),
        ("no", {"pred": SDO + "inLanguage", "obj_value": "zz"}),
    ]).to_pandas().set_index("probe")["ask"]
    assert out["yes"] == 1
    assert out["no"] == 0


def test_bind_strlen_matches_duckdb():
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import bind_strlen_bgp

    got = bind_strlen_bgp(doc_triples(SF), SDO + "isBasedOn") \
        .to_pandas().sort_values("subj").reset_index(drop=True)
    want = _duck("""
        SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
               source AS v, CAST(LENGTH(source) AS BIGINT) AS len
        FROM documents""").sort_values("subj").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    assert (got["len"] == got["v"].str.len()).all()


def test_path_inverse_is_forward_swapped():
    from rdfx_ray.functions.doc_triples import SDO, doc_citation_triples
    from rdfx_ray.pipelines.query import (property_path_inverse,
                                          triple_pattern)

    inv = property_path_inverse(doc_citation_triples(SF),
                                SDO + "citation").to_pandas()
    fwd = triple_pattern(doc_citation_triples(SF),
                         pred=SDO + "citation").to_pandas()
    assert set(zip(inv["subj"], inv["obj"])) == \
        set(zip(fwd["obj_value"], fwd["subj"]))
    assert len(inv) == len(fwd) > 0


def test_subquery_max_matches_duckdb():
    from rdfx_ray.pipelines.analytics_ext import (DOCS_MAX_CHARS_SQL,
                                                  docs_max_chars_per_lang)

    got = docs_max_chars_per_lang(SF).to_pandas() \
        .sort_values("subj").reset_index(drop=True)
    want = _duck(DOCS_MAX_CHARS_SQL).sort_values("subj") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # every lang is represented, each row really is its lang's max
    per_lang = _duck("SELECT lang, MAX(n_chars) AS m FROM documents "
                     "GROUP BY lang").set_index("lang")["m"]
    assert set(got["lang"]) == set(per_lang.index)
    for _, r in got.iterrows():
        assert r["n_chars"] == per_lang[r["lang"]]


def test_type_share_total_consistent():
    from rdfx_ray.pipelines.analytics_ext import events_type_share

    got = events_type_share(SF).to_pandas()
    assert (got["total"] == got["n"].sum()).all()
    assert got["total"].nunique() == 1


def test_mode_and_funnel_match_duckdb():
    from rdfx_ray.pipelines.analytics_ext import (
        EVENTS_FUNNEL_SQL, EVENTS_VALUE_MODE_SQL, events_funnel,
        events_value_mode)

    got = events_value_mode(SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = _duck(EVENTS_VALUE_MODE_SQL).sort_values("event_type") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    gotf = events_funnel(SF).to_pandas()
    wantf = _duck(EVENTS_FUNNEL_SQL)
    pd.testing.assert_frame_equal(gotf[wantf.columns.tolist()], wantf,
                                  check_dtype=False)
    # funnel stages only narrow
    assert (gotf["n_users"] >= gotf["n_step_a"]).all()
    assert (gotf["n_step_a"] >= gotf["n_converted"]).all()
    assert gotf["n_converted"][0] > 0


def test_pair_sim_histogram_matches_duckdb():
    from rdfx_ray.functions.similarity import (PAIR_SIM_HISTOGRAM_SQL,
                                               pair_sim_histogram)

    got = pair_sim_histogram(SF).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    want = _duck(PAIR_SIM_HISTOGRAM_SQL, views=("embeddings",)) \
        .sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # every unordered pair counted exactly once
    import duckdb
    con = duckdb.connect()
    n = con.execute(f"SELECT COUNT(*) FROM "
                    f"'{SF}/embeddings.parquet'").fetchone()[0]
    assert got["n_pairs"].sum() == n * (n - 1) // 2


def test_median2x_matches_duckdb_and_percentile_cont():
    from rdfx_ray.pipelines.analytics_ext import (ORDERS_MEDIAN2X_SQL,
                                                  orders_price_median2x)

    got = orders_price_median2x(SF).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    want = _duck(ORDERS_MEDIAN2X_SQL, views=("orders",)) \
        .sort_values("o_orderpriority").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # med2x is EXACTLY 2x percentile_cont(0.5) of the quantized values
    cont = _duck("""
        WITH q AS (SELECT o_orderpriority,
                   CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT) AS v
                   FROM orders)
        SELECT o_orderpriority,
               2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS m2
        FROM q GROUP BY 1""", views=("orders",)) \
        .sort_values("o_orderpriority").reset_index(drop=True)
    assert (got["med2x_cents"].to_numpy().astype(float)
            == cont["m2"].to_numpy()).all()


def test_cohort_retention_matches_duckdb():
    from rdfx_ray.pipelines.analytics_ext import (
        EVENTS_COHORT_RETENTION_SQL, events_cohort_retention)

    got = events_cohort_retention(SF).to_pandas() \
        .sort_values(["cohort_day_us", "day_offset"]) \
        .reset_index(drop=True)
    want = _duck(EVENTS_COHORT_RETENTION_SQL) \
        .sort_values(["cohort_day_us", "day_offset"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # offset 0 of each cohort counts the whole cohort; retention at
    # any later offset never exceeds it
    d0 = got[got["day_offset"] == 0].set_index("cohort_day_us")["n_users"]
    for _, r in got.iterrows():
        assert r["n_users"] <= d0[r["cohort_day_us"]]
    assert (got["day_offset"] >= 0).all()


def test_tpch_q3ish_matches_duckdb():
    from rdfx_ray.pipelines.analytics_ext import (TPCH_Q3ISH_SQL,
                                                  tpch_q3ish)

    got = tpch_q3ish(SF).to_pandas().reset_index(drop=True)
    want = _duck(TPCH_Q3ISH_SQL, views=("orders", "lineitem")) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    assert (got["revenue_1e4"].diff().dropna() <= 0).all()


def test_brand_revenue_routes_agree():
    """Broadcast and hash-join routes produce identical brand revenue
    (the count gate is an execution knob, not a semantic one)."""
    from rdfx_ray.pipelines.analytics_ext import (BRAND_REVENUE_SQL,
                                                  brand_revenue)

    bc = brand_revenue(SF).to_pandas() \
        .sort_values("p_brand").reset_index(drop=True)
    hj = brand_revenue(SF, broadcast_cutoff_rows=0).to_pandas() \
        .sort_values("p_brand").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, hj)
    want = _duck(BRAND_REVENUE_SQL, views=("lineitem", "part")) \
        .sort_values("p_brand").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc[want.columns.tolist()], want,
                                  check_dtype=False)
