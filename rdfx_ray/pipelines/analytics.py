"""Wide-operation demonstrations over the TPC-H-ish testdata tables:
grouped aggregates with batch-local partial pre-aggregation (the
pattern that keeps 100-TB shuffles small — ray_guide 'Aggregation at
scale').

Monetary/float aggregates are computed on integer-scaled values
(floor(x·scale + 0.5)) so Ray and the DuckDB oracle sum EXACTLY the
same integers regardless of accumulation order — float sums would
hash-mismatch on reduction order alone.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (returnflag × linestatus)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        qty = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
        price = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        disc_price = np.floor(
            df["l_extendedprice"].to_numpy()
            * (1.0 - df["l_discount"].to_numpy()) * 10_000 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "qty_c": qty, "price_c": price, "disc_price_c4": disc_price,
        }).groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_c=("qty_c", "sum"),
            sum_price_c=("price_c", "sum"),
            sum_disc_price_c4=("disc_price_c4", "sum"),
            n_rows=("qty_c", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    return (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_c", alias_name="sum_qty_c"),
            Sum("sum_price_c", alias_name="sum_price_c"),
            Sum("sum_disc_price_c4", alias_name="sum_disc_price_c4"),
            Sum("n_rows", alias_name="count_order"),
        )
    )


def events_hourly(sf_dir: str):
    """Events per (event_type, hour): tumbling-window count + scaled
    value sum, with per-batch partials before the groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hour = df["ts"].dt.floor("h")
        val_c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "event_type": df["event_type"], "hour": hour, "val_c": val_c,
            "one": np.ones(len(df), dtype=np.int64),
        }).groupby(["event_type", "hour"], as_index=False).agg(
            sum_value_c=("val_c", "sum"), n_events=("one", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .groupby(["event_type", "hour"])
          .aggregate(Sum("sum_value_c", alias_name="sum_value_c"),
                     Sum("n_events", alias_name="n_events"))
    )


def sessionize(sf_dir: str, gap_minutes: int = 30, n_buckets: int = 32):
    """Session windows per user: a new session starts after a gap >
    ``gap_minutes``. Ray Data has no event-time windows; the scalable
    shape is hash-partition users into ``n_buckets`` groups and run ONE
    vectorized numpy session assignment per bucket (sort by (user, ts,
    event_id) → boundary flags → ``reduceat`` aggregation). This
    replaces per-user ``map_groups`` (~ms of pandas overhead × #users —
    the small-group anti-pattern) with #buckets group calls total;
    bucket count scales with the cluster, not with user count.

    ``session_start`` is emitted as BIGINT epoch-microseconds on BOTH
    the Ray and SQL sides: timestamp columns hash differently across
    engines (ns vs µs representation), integers never do — the same
    integer-scaling discipline as every monetary aggregate here.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        jb = (uid.astype(np.int64) % n_buckets).astype(np.int32)
        return batch.append_column("_jb", pa.array(jb, pa.int32()))

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "session_id": pd.Series([], dtype=np.int64),
                "session_start": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "sum_value_c": pd.Series([], dtype=np.int64),
            })
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        val_c = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        delta = np.zeros(n, dtype=np.int64)
        delta[1:] = ts_us[1:] - ts_us[:-1]
        new_sess = new_user | (delta > gap_us)
        sid = np.cumsum(new_sess)                       # global 1-based
        bounds = np.flatnonzero(new_sess)               # session starts
        user_bounds = np.flatnonzero(new_user)          # user starts
        # per-session id relative to its user's first session
        owner = np.searchsorted(user_bounds, bounds, side="right") - 1
        session_id = sid[bounds] - sid[user_bounds][owner] + 1
        n_events = np.diff(np.append(bounds, n))
        return pd.DataFrame({
            "user_id": user[bounds],
            "session_id": session_id.astype(np.int64),
            "session_start": ts_us[bounds],
            "n_events": n_events.astype(np.int64),
            "sum_value_c": np.add.reduceat(val_c, bounds),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_jb")
              .map_groups(bucket_sessions, batch_format="pandas"))


SESSIONIZE_SQL = """
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
    SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_c
FROM numbered GROUP BY user_id, session_id
"""


def entity_degree(triples_ds, top_k: int = 20):
    """Top subjects by triple count (hub detection — the heavy-hitter
    pre-pass SURVEY.md §4 uses to pick salting candidates)."""
    from ray.data.aggregate import Count

    return (
        triples_ds.groupby("subj").aggregate(Count(alias_name="degree"))
        .sort(["degree", "subj"], descending=[True, False]).limit(top_k)
    )


# orders rows above which the orderkey→region lookup no longer belongs
# on the driver (orders grows with lineitem, ~1/4 of it — a fact-scale
# side at 100 TB): route through the partitioned hash join instead.
# 5M rows ≈ ~100 MB of int64 pairs — comfortably broadcastable; the
# count is EXACT and free (parquet footer only).
BROADCAST_ORDERS_ROW_CUTOFF = 5_000_000


def revenue_by_region(sf_dir: str,
                      broadcast_cutoff_rows: int = BROADCAST_ORDERS_ROW_CUTOFF):
    """TPC-H Q5-shaped multi-table join: lineitem ⋈ orders ⋈ customer
    ⋈ nation ⋈ region → revenue per region name.

    Join strategy is COUNT-GATED, never guessed (the same discipline
    as minhash_lsh_pairs): the orders row count comes exactly and for
    free from the parquet footer. Small orders → the dimension chain
    (orders→customer→nation→region) is composed driver-side into ONE
    lookup (orderkey → region_name), broadcast via ``ray.put``, and
    the fact table (lineitem) streams through map_batches doing a
    vectorized pandas merge per batch — the canonical broadcast hash
    join (ray_guide 'Joins and lookups'), no shuffle of the fact
    table. Orders beyond the cutoff → delegate to
    :func:`..joins.revenue_by_region_shuffle` (partitioned hash join;
    identical SQL oracle). Revenue is integer-scaled (×10⁴) so the
    DuckDB oracle hash-matches exactly."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders > broadcast_cutoff_rows:
        from .joins import revenue_by_region_shuffle
        return revenue_by_region_shuffle(sf_dir)

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"]).to_pandas()
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"]).to_pandas()
    dim = (orders
           .merge(customer, left_on="o_custkey", right_on="c_custkey")
           .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           .merge(region, left_on="n_regionkey", right_on="r_regionkey")
           [["o_orderkey", "r_name"]])
    dim_ref = ray.put(dim)

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    from ..functions.broadcast import cached_get

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lookup = cached_get(dim_ref)
        df = df.merge(lookup, left_on="l_orderkey", right_on="o_orderkey")
        rev = np.floor(df["l_extendedprice"].to_numpy()
                       * (1.0 - df["l_discount"].to_numpy()) * 10_000
                       + 0.5).astype(np.int64)
        g = pd.DataFrame({"r_name": df["r_name"], "rev": rev}) \
            .groupby("r_name", as_index=False)["rev"].sum() \
            .rename(columns={"rev": "revenue_c4"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
              .groupby("r_name")
              .aggregate(Sum("revenue_c4", alias_name="revenue_c4")))


REVENUE_BY_REGION_SQL = """
SELECT r_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""
