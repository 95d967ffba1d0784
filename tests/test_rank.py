"""Distributed full-table window ranking tests — DuckDB cross-check
at sf0.001, shift invariance, and NTILE edge pins."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"'{SF}/orders.parquet'")
    return con.execute(sql).df()


def test_rank_matches_duckdb():
    from rdfx_ray.pipelines.rank import (ORDERS_PRICE_RANK_SQL,
                                         orders_price_rank)

    got = orders_price_rank(SF).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    want = _duck(ORDERS_PRICE_RANK_SQL) \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_rank_shift_invariant():
    """The bucket width is an execution knob, not a semantic one —
    ranks are identical with 1-cent-wide and very wide buckets."""
    from rdfx_ray.pipelines.rank import orders_price_rank

    a = orders_price_rank(SF, shift=4).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    b = orders_price_rank(SF, shift=28).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_rank_internal_invariants():
    from rdfx_ray.pipelines.rank import orders_price_rank

    got = orders_price_rank(SF).to_pandas()
    for _, g in got.groupby("o_orderpriority"):
        n = len(g)
        assert (g["n_group"] == n).all()
        # row numbers are a permutation of 1..n
        assert sorted(g["row_num"]) == list(range(1, n + 1))
        # RANK never exceeds ROW_NUMBER and ties share ranks
        assert (g["rnk"] <= g["row_num"]).all()
        s = g.sort_values("row_num")
        same_val = s["cents"].to_numpy()[1:] == s["cents"].to_numpy()[:-1]
        same_rnk = s["rnk"].to_numpy()[1:] == s["rnk"].to_numpy()[:-1]
        assert (same_val == same_rnk).all()
        # NTILE sizes differ by at most one, larger tiles first
        sizes = g.groupby("tile").size()
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.sort_index().diff().dropna() <= 0).all()


def test_ntile_formula_matches_sql_semantics():
    from rdfx_ray.pipelines.rank import _ntile_from_rownum

    # n=10, k=4 → tiles of 3,3,2,2 (first n%k tiles larger)
    out = _ntile_from_rownum(np.arange(1, 11), 10, 4)
    assert out.tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # n < k → one row per tile
    assert _ntile_from_rownum(np.arange(1, 4), 3, 4).tolist() == [1, 2, 3]
