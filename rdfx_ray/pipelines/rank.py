"""Distributed full-table window ranking — RANK / ROW_NUMBER / NTILE
over every row of a fact table, the window shape `events_topn_per_type`
(top-N only) and `orders_price_quantiles` (per-group scalars) don't
cover.

Recipe (the `pack_sequences` range-partition + tiny-prefix-sum
pattern, applied to value space instead of doc space):

1. one streaming pass folds per-batch partial counts into a TINY
   (group, value_bucket) count table — the bucket is ``cents >> shift``,
   so bucket order IS value order;
2. the driver exclusive-prefix-sums that tiny table within each group
   (O(groups × buckets) rows — independent of fact rows) giving
   ``base[group, bucket]`` = rows in strictly-smaller buckets, plus
   per-group totals;
3. a ``groupby(group, bucket).map_groups`` pass co-locates each value
   bucket once, lexsorts it, and emits exact global ranks as
   ``base + local position``.

Ranks are exact, not approximate: equal sort keys share a bucket by
construction, so within-bucket ``searchsorted``/``lexsort`` resolves
them with full information. Skewed value distributions concentrate
rows into few buckets — ``shift`` is the knob (more buckets), and the
worst case degrades to per-group co-location, never to wrongness.

Tie semantics match SQL exactly: RANK ties on equal cents;
ROW_NUMBER and NTILE break ties by o_orderkey so both engines pick
identical rows (CLAUDE.md deterministic-tiebreak rule); NTILE uses the
SQL first-buckets-larger split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ntile_from_rownum(row_num: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based row numbers over a group of n rows:
    the first ``n % k`` tiles hold ``n//k + 1`` rows, the rest
    ``n//k`` (exactly DuckDB/ANSI semantics)."""
    q, rem = divmod(n, k)
    r0 = row_num - 1
    split = rem * (q + 1)
    small = np.maximum(r0 - split, 0)
    if q == 0:
        # fewer rows than tiles: every row is its own tile
        return r0 + 1
    return np.where(r0 < split, r0 // (q + 1) + 1,
                    rem + small // q + 1).astype(np.int64)


def orders_price_rank(sf_dir: str, shift: int = 20, n_tiles: int = 4):
    """Every order's RANK, ROW_NUMBER and NTILE within its priority by
    integer-quantized price → (o_orderkey, o_orderpriority, cents,
    rnk, row_num, tile, n_group)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority",
                                  "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "grp": batch.column("o_orderpriority"),
            "cents": pa.array(cents, pa.int64()),
            "bucket": pa.array(cents >> shift, pa.int64()),
        })

    fact = ds.map_batches(to_cents, batch_format="pyarrow",
                          batch_size=65536)

    # stage 1: tiny (grp, bucket) count table via partial fold
    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "grp": batch.column("grp").to_pandas(),
            "bucket": batch.column("bucket").to_numpy(
                zero_copy_only=False)})
        g = df.groupby(["grp", "bucket"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (fact.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["grp", "bucket"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    # stage 2: driver prefix sum over the tiny table (rows =
    # groups × occupied buckets, independent of fact-table size)
    counts = counts.sort_values(["grp", "bucket"],
                                kind="mergesort").reset_index(drop=True)
    n_arr = counts["n"].to_numpy(np.int64)
    cums = np.cumsum(n_arr) - n_arr          # global exclusive cumsum
    grp_arr = counts["grp"].to_numpy()
    new_grp = np.concatenate([[True], grp_arr[1:] != grp_arr[:-1]])
    grp_start = np.maximum.accumulate(
        np.where(new_grp, cums, -1))          # first cum of each group
    base = cums - grp_start                   # rows in smaller buckets
    totals = (counts.groupby("grp")["n"].sum()
              .astype(np.int64).to_dict())
    base_map = {(g, b): int(v) for g, b, v in
                zip(grp_arr, counts["bucket"].to_numpy(), base)}
    state_ref = ray.put((base_map, totals))

    # stage 3: co-locate each (grp, bucket) once; exact ranks inside
    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_map_l, totals_l = cached_get(state_ref)
        grp = g["grp"].iloc[0]
        b = int(g["bucket"].iloc[0])
        off = base_map_l[(grp, b)]
        n_group = totals_l[grp]
        cents = g["cents"].to_numpy(np.int64)
        okey = g["o_orderkey"].to_numpy(np.int64)
        order = np.lexsort((okey, cents))
        inv = np.empty(len(order), np.int64)
        inv[order] = np.arange(len(order))
        row_num = off + inv + 1
        sorted_cents = cents[order]
        rnk = off + np.searchsorted(sorted_cents, cents,
                                    side="left") + 1
        tile = _ntile_from_rownum(row_num, n_group, n_tiles)
        return pd.DataFrame({
            "o_orderkey": okey,
            "o_orderpriority": g["grp"].to_numpy(),
            "cents": cents,
            "rnk": rnk.astype(np.int64),
            "row_num": row_num.astype(np.int64),
            "tile": tile,
            "n_group": np.full(len(g), n_group, np.int64)})

    return fact.groupby(["grp", "bucket"]).map_groups(
        rank_bucket, batch_format="pandas")


def orders_percent_rank(sf_dir: str, shift: int = 20):
    """PERCENT_RANK and CUME_DIST for every order within its priority
    → (o_orderkey, o_orderpriority, cents, prank_1e9, cume_1e9).
    Same machinery as :func:`orders_price_rank` (tiny bucket-count
    fold → driver prefix sum → per-bucket exact positions); the two
    ratios are emitted integer-scaled at 1e9 with the SAME float64
    expression DuckDB evaluates — (rank−1)/(n−1) and
    (rows ≤ current)/n — so the IEEE-correctly-rounded divisions are
    bit-identical on both sides before the floor."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority",
                                  "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "grp": batch.column("o_orderpriority"),
            "cents": pa.array(cents, pa.int64()),
            "bucket": pa.array(cents >> shift, pa.int64()),
        })

    fact = ds.map_batches(to_cents, batch_format="pyarrow",
                          batch_size=65536)

    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "grp": batch.column("grp").to_pandas(),
            "bucket": batch.column("bucket").to_numpy(
                zero_copy_only=False)})
        g = df.groupby(["grp", "bucket"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (fact.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["grp", "bucket"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts = counts.sort_values(["grp", "bucket"],
                                kind="mergesort").reset_index(drop=True)
    n_arr = counts["n"].to_numpy(np.int64)
    cums = np.cumsum(n_arr) - n_arr
    grp_arr = counts["grp"].to_numpy()
    new_grp = np.concatenate([[True], grp_arr[1:] != grp_arr[:-1]])
    grp_start = np.maximum.accumulate(np.where(new_grp, cums, -1))
    base = cums - grp_start
    totals = (counts.groupby("grp")["n"].sum()
              .astype(np.int64).to_dict())
    base_map = {(g, b): int(v) for g, b, v in
                zip(grp_arr, counts["bucket"].to_numpy(), base)}
    state_ref = ray.put((base_map, totals))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_map_l, totals_l = cached_get(state_ref)
        grp = g["grp"].iloc[0]
        b = int(g["bucket"].iloc[0])
        off = base_map_l[(grp, b)]
        n_group = totals_l[grp]
        cents = g["cents"].to_numpy(np.int64)
        okey = g["o_orderkey"].to_numpy(np.int64)
        order = np.argsort(cents, kind="stable")
        sorted_cents = cents[order]
        rnk = off + np.searchsorted(sorted_cents, cents,
                                    side="left") + 1
        n_le = off + np.searchsorted(sorted_cents, cents,
                                     side="right")
        if n_group > 1:
            prank = (rnk - 1).astype(np.float64) / float(n_group - 1)
        else:
            prank = np.zeros(len(cents), np.float64)
        cume = n_le.astype(np.float64) / float(n_group)
        return pd.DataFrame({
            "o_orderkey": okey,
            "o_orderpriority": g["grp"].to_numpy(),
            "cents": cents,
            "prank_1e9": np.floor(prank * 1e9 + 0.5).astype(np.int64),
            "cume_1e9": np.floor(cume * 1e9 + 0.5).astype(np.int64)})

    return fact.groupby(["grp", "bucket"]).map_groups(
        rank_bucket, batch_format="pandas")


ORDERS_PERCENT_RANK_SQL = """
WITH q AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders)
SELECT o_orderkey, o_orderpriority, cents,
       CAST(FLOOR(PERCENT_RANK() OVER w * 1e9 + 0.5) AS BIGINT)
           AS prank_1e9,
       CAST(FLOOR(CUME_DIST() OVER w * 1e9 + 0.5) AS BIGINT)
           AS cume_1e9
FROM q
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents)
"""


ORDERS_PRICE_RANK_SQL = """
WITH q AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders)
SELECT o_orderkey, o_orderpriority, cents,
       CAST(RANK() OVER w_val AS BIGINT) AS rnk,
       CAST(ROW_NUMBER() OVER w_row AS BIGINT) AS row_num,
       CAST(NTILE(4) OVER w_row AS BIGINT) AS tile,
       CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS n_group
FROM q
WINDOW w_val AS (PARTITION BY o_orderpriority ORDER BY cents),
       w_row AS (PARTITION BY o_orderpriority
                 ORDER BY cents, o_orderkey)
"""
