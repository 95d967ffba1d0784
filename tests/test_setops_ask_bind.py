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
