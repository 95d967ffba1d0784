"""Round-5 analytics additions, part 2 — decision-support join
chains, sequence/behaviour analytics and exact statistical filtering,
every one SQL-oracled:

- ``events_user_transitions``: the per-user Markov transition matrix
  (LAG over (ts, event_id) order inside each user) — the
  behaviour-sequence shape recommendation / funnel models train on.
- ``orders_shipping_priority``: the TPC-H Q3 join chain (customer
  segment filter → orders date filter → lineitem revenue fold →
  top-k) expressed as pre-aggregation + count-gated dimension attach.
- ``customer_returns_topn``: the TPC-H Q10 shape — returned-item
  revenue folded per order, joined through orders to customers,
  nation name attached, global top-k.
- ``promo_revenue_share``: the TPC-H Q14 shape — a conditional
  aggregate ratio over one month of lineitem with the promo part set
  broadcast, emitted as exact integer numerator/denominator.
- ``orders_cohort_retention``: the cohort-retention matrix (first
  order month × months-since, distinct customers per cell).
- ``events_anomaly_zscore``: per-type 3-sigma outlier counts with the
  z-score test done in EXACT integer arithmetic ((n·v−S)² > 9(nQ−S²))
  so the Ray and DuckDB row sets match bit-for-bit — no float
  boundary hazards.

Reference scope note: the reference (surroundaustralia/rdfx) has no
analytics plane at all — these extend the engine's training-data /
decision-support surface (SURVEY.md beyond-§2 family), like the
siblings in ``analytics_r4.py`` / ``analytics_r5.py``.
"""

from __future__ import annotations

from math import isqrt
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# one money-quantization convention across the file: revenue cents =
# floor(extendedprice · (1 − discount) · 100 + 0.5), the identical
# float64 expression on both engines (the house oracle discipline)
_REV_SQL = ("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 "
            "+ 0.5) AS BIGINT)")


def _rev_cents(batch: pa.Table) -> np.ndarray:
    ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    return np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)


def _epoch_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)


# ---------------------------------------------------------------------------
# per-user event-type transition matrix (Markov counts)
# ---------------------------------------------------------------------------

TRANSITION_BUCKETS = 32


def events_user_transitions(sf_dir: str,
                            n_buckets: int = TRANSITION_BUCKETS):
    """Markov transition counts over per-user event sequences —
    ``LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` → count per (prev_type, event_type) pair.

    The sessionize partitioning applies: users hash into
    ``n_buckets`` groups; each bucket sorts ONCE by (user_id, ts,
    event_id) — the event_id tiebreak makes equal-timestamp order
    identical across engines — and a vectorized shift emits pair
    counts. Each bucket folds to ≤ |types|² rows before the final
    O(types²) groupby, so the only fact-sized exchange is the single
    user-bucket co-location (exactly events_sessionize's cost)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        jb = (uid.astype(np.int64) % n_buckets).astype(np.int32)
        return batch.append_column("_jb", pa.array(jb, pa.int32()))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"prev_type": str, "event_type": str, "n": np.int64}
        if len(g) == 0:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "event_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        user = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = user[1:] == user[:-1]
        prev, curr = et[:-1][same], et[1:][same]
        if len(prev) == 0:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "event_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        out = (pd.DataFrame({"prev_type": prev, "event_type": curr})
               .groupby(["prev_type", "event_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        return out.astype({"n": np.int64})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(bucket_pairs,
                                       batch_format="pandas")
            .groupby(["prev_type", "event_type"])
            .aggregate(Sum("n", alias_name="n")))


EVENTS_USER_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events)
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-k
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_K = 10

# dimension tables whose EXACT footer row count is under this ride a
# ray.put broadcast; above it the attach runs as a native hash join
# (the house count-gate — never guess, count)
DIM_BROADCAST_CUTOFF = 2_000_000


def _topk_rows(ds, sort_cols, descending, k: int, schema: pa.Schema):
    """Distributed top-k: per-batch polars partial top-k bounds the
    sort exchange to ≤ k × blocks rows (the order_limit_bgp
    discipline), then the tiny global sort takes the first k."""
    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        if batch.num_rows == 0:
            return batch.cast(schema)
        return (pl.from_arrow(batch)
                .sort(sort_cols, descending=descending)
                .head(k).to_arrow().cast(schema))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .sort(sort_cols, descending=descending)
            .limit(k))


def orders_shipping_priority(sf_dir: str, segment: str = Q3_SEGMENT,
                             cutoff: str = Q3_CUTOFF, k: int = Q3_K,
                             dim_cutoff: int = DIM_BROADCAST_CUTOFF):
    """TPC-H Q3 shape: revenue of not-yet-shipped lineitems of orders
    from one market segment placed before ``cutoff`` → top-k orders
    by revenue → (l_orderkey, revenue_c, o_orderdate_us,
    o_orderpriority).

    Plan (pre-aggregate first, join post-aggregate tables): lineitem
    is folded per batch to (l_orderkey, revenue cents) partials before
    its groupby, so the only fact-sized exchange carries ≤ #orders
    rows. The orders side filters by the count-gated broadcast of the
    segment's custkeys (customer is a dimension; above the gate the
    custkey filter runs as a native hash join), then the filtered
    orders metadata attaches to the revenue table the same gated way.
    The top-k is per-batch partial → k·blocks-row sort, never a full
    sort. Dates cross the oracle as epoch-µs BIGINT."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)

    # lineitem: filter shipdate > cutoff, fold revenue per orderkey
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        keep = _epoch_us(batch.column("l_shipdate")) > cutoff_us
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue_c": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey")
            .to_numpy(zero_copy_only=False),
            "revenue_c": _rev_cents(batch)})
        g = df.groupby("l_orderkey", as_index=False)["revenue_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = (li.map_batches(li_partial, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("revenue_c", alias_name="revenue_c")))

    # orders: date filter + segment custkey filter (count-gated)
    n_cust = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate",
                                      "o_orderpriority"])
    if n_cust <= dim_cutoff:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        keys = cust.filter(pc.equal(cust.column("c_mktsegment"),
                                    segment)) \
            .column("c_custkey").to_numpy(zero_copy_only=False)
        keys_ref = ray.put(np.sort(keys.astype(np.int64)))

        def ord_filter(batch: pa.Table) -> pa.Table:
            ks = cached_get(keys_ref)
            dt = _epoch_us(batch.column("o_orderdate"))
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ks):
                pos = np.searchsorted(ks, ck)
                pos[pos == len(ks)] = 0
                keep = (dt < cutoff_us) & (ks[pos] == ck)
            else:
                keep = np.zeros(len(ck), bool)
            out = batch.filter(pa.array(keep))
            return pa.table({
                "o_orderkey": out.column("o_orderkey"),
                "o_orderdate_us": pa.array(
                    _epoch_us(out.column("o_orderdate")), pa.int64()),
                "o_orderpriority": out.column("o_orderpriority")})

        ord_f = orders.map_batches(ord_filter, batch_format="pyarrow")
    else:
        # fact-scale customer: native hash join on the filtered side
        cust_ds = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                                   columns=["c_custkey",
                                            "c_mktsegment"])
                   .filter(expr=f"c_mktsegment == '{segment}'")
                   .select_columns(["c_custkey"]))

        def ord_date(batch: pa.Table) -> pa.Table:
            dt = _epoch_us(batch.column("o_orderdate"))
            out = batch.filter(pa.array(dt < cutoff_us))
            return pa.table({
                "o_orderkey": out.column("o_orderkey"),
                "o_custkey": out.column("o_custkey"),
                "o_orderdate_us": pa.array(
                    _epoch_us(out.column("o_orderdate")), pa.int64()),
                "o_orderpriority": out.column("o_orderpriority")})

        ord_f = (orders.map_batches(ord_date, batch_format="pyarrow")
                 .join(cust_ds, "inner", 16, on=("o_custkey",),
                       right_on=("c_custkey",))
                 .select_columns(["o_orderkey", "o_orderdate_us",
                                  "o_orderpriority"]))

    # attach the filtered orders metadata to the post-aggregate
    # revenue table, count-gated on the EXACT filtered count: the
    # segment+date slice is usually dimension-sized (broadcast); above
    # the gate it is one native hash join between two post-aggregate
    # tables (a sparse right side at small partition counts trips
    # Ray's hash join on empty partitions — the gate also keeps the
    # small case off that path)
    out_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("revenue_c", pa.int64()),
                            ("o_orderdate_us", pa.int64()),
                            ("o_orderpriority", pa.string())])
    ord_m = ord_f.materialize()
    if ord_m.count() <= dim_cutoff:
        ot = pa.concat_tables(list(
            ord_m.iter_batches(batch_size=1 << 20,
                               batch_format="pyarrow")))
        ok = ot.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ok, kind="stable")
        attach_ref = ray.put((
            ok[order],
            ot.column("o_orderdate_us")
            .to_numpy(zero_copy_only=False)[order],
            np.asarray(ot.column("o_orderpriority")
                       .to_pylist(), dtype=object)[order]))

        def project(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            ks, dts, prios = cached_get(attach_ref)
            lk = batch.column("l_orderkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ks):
                pos = np.searchsorted(ks, lk)
                pos[pos == len(ks)] = 0
                hit = ks[pos] == lk
            else:
                hit = np.zeros(len(lk), bool)
            pos = pos[hit] if len(ks) else np.zeros(0, np.int64)
            return pa.table({
                "l_orderkey": pa.array(lk[hit], pa.int64()),
                "revenue_c": batch.column("revenue_c")
                .filter(pa.array(hit)),
                "o_orderdate_us": pa.array(dts[pos], pa.int64()),
                "o_orderpriority": pa.array(list(prios[pos]),
                                            pa.string())}) \
                .cast(out_schema)

        projected = rev.map_batches(project, batch_format="pyarrow")
    else:
        joined = rev.join(ord_m, "inner", 16, on=("l_orderkey",),
                          right_on=("o_orderkey",))

        def project_join(batch: pa.Table) -> pa.Table:
            return batch.select(["l_orderkey", "revenue_c",
                                 "o_orderdate_us",
                                 "o_orderpriority"]).cast(out_schema)

        projected = joined.map_batches(project_join,
                                       batch_format="pyarrow")

    return _topk_rows(projected, ["revenue_c", "l_orderkey"],
                      [True, False], k, out_schema)


ORDERS_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_c,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c DESC, l_orderkey
LIMIT {Q3_K}
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, top-k
# ---------------------------------------------------------------------------

Q10_START = "1998-01-01"
Q10_END = "1998-07-01"
Q10_K = 20


def customer_returns_topn(sf_dir: str, start: str = Q10_START,
                          end: str = Q10_END, k: int = Q10_K,
                          dim_cutoff: int = DIM_BROADCAST_CUTOFF):
    """TPC-H Q10 shape: revenue lost to returned items
    (l_returnflag = 'R') per customer over one order-date window, the
    customer's nation attached, top-k by revenue → (c_custkey,
    c_name, nation_name, revenue_c).

    Plan: lineitem folds to (orderkey, revenue) partials (returned
    rows only) before its groupby; the orders side carries just
    (orderkey, custkey) for the window; one native hash join between
    the two post-filter tables, then a second per-batch fold +
    groupby lands (custkey, revenue). The customer/nation dimension
    chain is count-gated: under the gate one custkey→(name, nation)
    frame broadcasts; above it the attach is a second hash join.
    Top-k is the partial-then-tiny-sort shape, never a full sort."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    def li_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("l_returnflag"), "R"))
        if batch.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue_c": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey")
            .to_numpy(zero_copy_only=False),
            "revenue_c": _rev_cents(batch)})
        g = df.groupby("l_orderkey", as_index=False)["revenue_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = (li.map_batches(li_partial, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("revenue_c", alias_name="revenue_c")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def ord_window(batch: pa.Table) -> pa.Table:
        dt = _epoch_us(batch.column("o_orderdate"))
        out = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        return out.select(["o_orderkey", "o_custkey"])

    # orderkey → custkey attach, count-gated on the EXACT size of the
    # date-window slice: broadcast under the gate (also keeps small
    # runs off Ray's sparse-right-partition hash-join hazard), native
    # hash join between the two post-filter tables above it
    ord_m = orders.map_batches(ord_window,
                               batch_format="pyarrow").materialize()
    if ord_m.count() <= dim_cutoff:
        ot = pa.concat_tables(list(
            ord_m.iter_batches(batch_size=1 << 20,
                               batch_format="pyarrow")))
        ok = ot.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ok, kind="stable")
        omap_ref = ray.put((ok[order],
                            ot.column("o_custkey")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)[order]))

        def cust_partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"c_custkey": pa.array([], pa.int64()),
                                 "revenue_c": pa.array([], pa.int64())})
            ks, cks = cached_get(omap_ref)
            lk = batch.column("l_orderkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ks):
                pos = np.searchsorted(ks, lk)
                pos[pos == len(ks)] = 0
                hit = ks[pos] == lk
            else:
                hit = np.zeros(len(lk), bool)
            df = pd.DataFrame({
                "c_custkey": cks[pos[hit]] if len(ks)
                else np.zeros(0, np.int64),
                "revenue_c": batch.column("revenue_c")
                .to_numpy(zero_copy_only=False)[hit]})
            g = df.groupby("c_custkey",
                           as_index=False)["revenue_c"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        cust_parts = rev.map_batches(cust_partial,
                                     batch_format="pyarrow")
    else:
        per_order = rev.join(ord_m, "inner", 16, on=("l_orderkey",),
                             right_on=("o_orderkey",))

        def cust_partial_join(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "c_custkey": batch.column("o_custkey")
                .to_numpy(zero_copy_only=False).astype(np.int64),
                "revenue_c": batch.column("revenue_c")
                .to_numpy(zero_copy_only=False)})
            g = df.groupby("c_custkey",
                           as_index=False)["revenue_c"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        cust_parts = per_order.map_batches(cust_partial_join,
                                           batch_format="pyarrow")

    per_cust = (cust_parts.groupby("c_custkey")
                .aggregate(Sum("revenue_c", alias_name="revenue_c")))

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("c_name", pa.string()),
                            ("nation_name", pa.string()),
                            ("revenue_c", pa.int64())])

    n_cust = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]) \
        .to_pandas()
    if n_cust <= dim_cutoff:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_name",
                                      "c_nationkey"]).to_pandas()
        attach = (cust.merge(nation, left_on="c_nationkey",
                             right_on="n_nationkey")
                  [["c_custkey", "c_name", "n_name"]]
                  .rename(columns={"n_name": "nation_name"}))
        attach_ref = ray.put(attach)

        def with_names(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            if df.empty:
                return out_schema.empty_table()
            df = df.merge(cached_get(attach_ref), on="c_custkey")
            return pa.Table.from_pandas(
                df[["c_custkey", "c_name", "nation_name",
                    "revenue_c"]], preserve_index=False) \
                .cast(out_schema)

        named = per_cust.map_batches(with_names,
                                     batch_format="pyarrow")
    else:
        # fact-scale customer: hash join; nation stays a tiny
        # driver-side frame folded into a per-batch map afterwards
        cust_ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_name",
                                           "c_nationkey"])
        nat_ref = ray.put(nation)

        def attach_nation(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            if df.empty:
                return out_schema.empty_table()
            df = df.merge(cached_get(nat_ref), left_on="c_nationkey",
                          right_on="n_nationkey") \
                .rename(columns={"n_name": "nation_name"})
            return pa.Table.from_pandas(
                df[["c_custkey", "c_name", "nation_name",
                    "revenue_c"]], preserve_index=False) \
                .cast(out_schema)

        named = (per_cust.materialize()
                 .join(cust_ds, "inner", 16, on=("c_custkey",))
                 .map_batches(attach_nation, batch_format="pyarrow"))

    return _topk_rows(named, ["revenue_c", "c_custkey"],
                      [True, False], k, out_schema)


CUSTOMER_RETURNS_TOPN_SQL = f"""
SELECT c_custkey, c_name, n_name AS nation_name,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_c
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_START}'
  AND o_orderdate < TIMESTAMP '{Q10_END}'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c DESC, c_custkey
LIMIT {Q10_K}
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share (conditional-aggregate ratio)
# ---------------------------------------------------------------------------

Q14_START = "1998-01-01"
Q14_END = "1998-02-01"


def promo_revenue_share(sf_dir: str, start: str = Q14_START,
                        end: str = Q14_END,
                        dim_cutoff: int = DIM_BROADCAST_CUTOFF):
    """TPC-H Q14 shape: the share of one month's lineitem revenue
    from promo parts → ONE row (promo_revenue_c, total_revenue_c,
    n_items) in exact integer cents (the ratio itself is a trivial
    read-side division — floats never hash-match).

    Plan: the promo partkey set is a dimension broadcast (count-gated
    to a hash join past the gate); lineitem makes a SINGLE pruned pass
    emitting one 3-field partial row per batch; a constant-key groupby
    folds them. Nothing fact-sized is exchanged at all."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    n_part = pq.ParquetFile(f"{sf_dir}/part.parquet") \
        .metadata.num_rows
    if n_part <= dim_cutoff:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
        promo = part.filter(pc.equal(part.column("p_type"), "PROMO")) \
            .column("p_partkey").to_numpy(zero_copy_only=False)
        promo_ref = ray.put(np.sort(promo.astype(np.int64)))

        def partial(batch: pa.Table) -> pa.Table:
            dt = _epoch_us(batch.column("l_shipdate"))
            batch = batch.filter(pa.array((dt >= lo) & (dt < hi)))
            ks = cached_get(promo_ref)
            rev = _rev_cents(batch) if batch.num_rows else \
                np.zeros(0, np.int64)
            pk = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ks) and len(pk):
                pos = np.searchsorted(ks, pk)
                pos[pos == len(ks)] = 0
                is_promo = ks[pos] == pk
            else:
                is_promo = np.zeros(len(pk), bool)
            return pa.table({
                "_k": pa.array([0], pa.int64()),
                "promo_revenue_c": pa.array(
                    [int(rev[is_promo].sum())], pa.int64()),
                "total_revenue_c": pa.array(
                    [int(rev.sum())], pa.int64()),
                "n_items": pa.array([len(rev)], pa.int64())})

        folded = (li.map_batches(partial, batch_format="pyarrow")
                  .groupby("_k")
                  .aggregate(Sum("promo_revenue_c",
                                 alias_name="promo_revenue_c"),
                             Sum("total_revenue_c",
                                 alias_name="total_revenue_c"),
                             Sum("n_items", alias_name="n_items")))
        return folded.select_columns(["promo_revenue_c",
                                      "total_revenue_c", "n_items"])

    # fact-scale part table: hash join the month's lineitem slice
    # against (p_partkey, is_promo), then the same constant-key fold
    part_ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_type"])

    def month_slice(batch: pa.Table) -> pa.Table:
        dt = _epoch_us(batch.column("l_shipdate"))
        out = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        return pa.table({
            "l_partkey": out.column("l_partkey"),
            "revenue_c": pa.array(_rev_cents(out), pa.int64())})

    joined = (li.map_batches(month_slice, batch_format="pyarrow")
              .join(part_ds, "inner", 16, on=("l_partkey",),
                    right_on=("p_partkey",)))

    def partial2(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue_c").to_numpy(zero_copy_only=False)
        is_promo = pc.equal(batch.column("p_type"), "PROMO") \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "_k": pa.array([0], pa.int64()),
            "promo_revenue_c": pa.array(
                [int(rev[is_promo].sum())], pa.int64()),
            "total_revenue_c": pa.array([int(rev.sum())], pa.int64()),
            "n_items": pa.array([len(rev)], pa.int64())})

    from ray.data.aggregate import Sum
    return (joined.map_batches(partial2, batch_format="pyarrow")
            .groupby("_k")
            .aggregate(Sum("promo_revenue_c",
                           alias_name="promo_revenue_c"),
                       Sum("total_revenue_c",
                           alias_name="total_revenue_c"),
                       Sum("n_items", alias_name="n_items"))
            .select_columns(["promo_revenue_c", "total_revenue_c",
                             "n_items"]))


PROMO_REVENUE_SHARE_SQL = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                     ELSE 0 END) AS BIGINT) AS promo_revenue_c,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS total_revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_START}'
  AND l_shipdate < TIMESTAMP '{Q14_END}'
"""


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------

def orders_cohort_retention(sf_dir: str,
                            dim_cutoff: int = DIM_BROADCAST_CUTOFF):
    """Cohort retention over the orders fact: cohort = a customer's
    first order month (year·12 + month, an integer both engines
    compute identically from the timestamp), cell (cohort_month,
    months_since) = distinct customers who ordered again that many
    months later → (cohort_month, months_since, n_customers).

    Plan: ONE pass over orders feeds two partial folds — per-batch
    min month per custkey (→ groupby Min = the cohort table) and
    per-batch distinct (custkey, month) pairs (→ groupby count =
    the activity table, bounded by customers × months). The cohort
    attach is count-gated on the EXACT customer count: a broadcast
    custkey→first-month array under the gate, a native hash join
    above it. The final groupby is O(months²) cells."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])

    def keyed(batch: pa.Table) -> pa.Table:
        dt = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[M]")
        # months since epoch → year·12 + month, both engines exact
        m = dt.astype(np.int64) + 1970 * 12 + 1
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "m": pa.array(m, pa.int64())})

    # NOT materialized: the two folds each re-derive the 2-column
    # keyed scan — two pruned reads beat parking the whole fact in
    # the object store at 100 TB (the events_above_p95 rescan trade)
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              batch_size=65536)

    def min_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "m": batch.column("m").to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False)["m"].min()
            .rename(columns={"m": "fm"}), preserve_index=False)

    first_m = (keyed_ds.map_batches(min_partial,
                                    batch_format="pyarrow")
               .groupby("o_custkey")
               .aggregate(Min("fm", alias_name="fm")))

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "m": batch.column("m").to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.drop_duplicates(), preserve_index=False)

    pairs = (keyed_ds.map_batches(pair_partial,
                                  batch_format="pyarrow")
             .groupby(["o_custkey", "m"])
             .aggregate(Count(alias_name="_n"))
             .select_columns(["o_custkey", "m"]))

    out_schema = pa.schema([("cohort_month", pa.int64()),
                            ("months_since", pa.int64()),
                            ("n_customers", pa.int64())])

    n_cust = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_cust <= dim_cutoff:
        from ..functions.broadcast import cached_get
        fm_tbl = pa.concat_tables(list(
            first_m.iter_batches(batch_size=1 << 20,
                                 batch_format="pyarrow")))
        ck = fm_tbl.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        fm = fm_tbl.column("fm").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ck, kind="stable")
        fm_ref = ray.put((ck[order], fm[order]))

        def cell_partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"cohort_month": pa.array([], pa.int64()),
                                 "months_since": pa.array([], pa.int64()),
                                 "n_customers": pa.array([], pa.int64())})
            ks, fms = cached_get(fm_ref)
            ckb = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            m = batch.column("m").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, ckb)
            cohort = fms[pos]  # every custkey has a first month
            df = (pd.DataFrame({"cohort_month": cohort,
                                "months_since": m - cohort})
                  .groupby(["cohort_month", "months_since"],
                           as_index=False)
                  .size().rename(columns={"size": "n_customers"}))
            return pa.Table.from_pandas(df, preserve_index=False) \
                .cast(out_schema)

        cells = pairs.map_batches(cell_partial,
                                  batch_format="pyarrow")
    else:
        # fact-scale customers: hash join pairs ⋈ first-month (both
        # post-aggregate, ≤ customers×months vs customers rows)
        joined = pairs.materialize().join(
            first_m.materialize(), "inner", 16, on=("o_custkey",))

        def cell_from_join(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            m = batch.column("m").to_numpy(zero_copy_only=False)
            fmv = batch.column("fm").to_numpy(zero_copy_only=False)
            df = (pd.DataFrame({"cohort_month": fmv,
                                "months_since": m - fmv})
                  .groupby(["cohort_month", "months_since"],
                           as_index=False)
                  .size().rename(columns={"size": "n_customers"}))
            return pa.Table.from_pandas(df, preserve_index=False) \
                .cast(out_schema)

        cells = joined.map_batches(cell_from_join,
                                   batch_format="pyarrow")

    return (cells.groupby(["cohort_month", "months_since"])
            .aggregate(Sum("n_customers", alias_name="n_customers")))


ORDERS_COHORT_RETENTION_SQL = """
WITH act AS (
    SELECT DISTINCT o_custkey,
           year(o_orderdate) * 12 + month(o_orderdate) AS m
    FROM orders),
fm AS (
    SELECT o_custkey, MIN(m) AS fm FROM act GROUP BY o_custkey)
SELECT CAST(fm.fm AS BIGINT) AS cohort_month,
       CAST(act.m - fm.fm AS BIGINT) AS months_since,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM act JOIN fm USING (o_custkey)
GROUP BY fm.fm, act.m - fm.fm
"""


# ---------------------------------------------------------------------------
# exact-integer 3-sigma anomaly counts
# ---------------------------------------------------------------------------

ZSCORE_SCALE = 1_000
ZSCORE_SIGMAS = 3


def events_anomaly_zscore(sf_dir: str, scale: int = ZSCORE_SCALE,
                          sigmas: int = ZSCORE_SIGMAS):
    """Per-type 3-sigma outlier counts over events.value with the
    z-score test in EXACT integer arithmetic → (event_type, n_events,
    n_anomalies).

    |v − μ| > 3σ multiplies through by n² to (n·vq − S)² > 9(nQ − S²)
    with vq = floor(value·scale + 0.5), S = Σvq, Q = Σvq² — all
    integers, so the Ray and DuckDB row sets agree bit-for-bit (a
    float mean/std boundary never would). Two passes: a per-type
    (n, S, Q) partial fold (O(types) rows to the driver), then the
    driver turns each type's quadratic into integer CUT POINTS via
    isqrt — (n·vq − S)² > T ⇔ n·vq ≥ S+isqrt(T)+1 or ≤ S−isqrt(T)−1
    — and a second pruned pass counts per batch against the broadcast
    cut table. Headroom: Σvq² stays in int64 to ~10¹¹ rows per type
    at this value range (the comoments discipline); `scale` is the
    knob beyond."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def stat_partial(batch: pa.Table) -> pa.Table:
        vq = np.floor(batch.column("value")
                      .to_numpy(zero_copy_only=False) * float(scale)
                      + 0.5).astype(np.int64)
        df = pd.DataFrame({"event_type": batch.column("event_type")
                           .to_pandas(), "vq": vq, "vq2": vq * vq})
        g = df.groupby("event_type", as_index=False).agg(
            n=("vq", "size"), s=("vq", "sum"), q=("vq2", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = pa.concat_tables(list(
        ds.map_batches(stat_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("s", alias_name="s"),
                   Sum("q", alias_name="q"))
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))

    # exact integer cut points per type (Python bigints — no overflow)
    cuts = {}
    for i in range(stats.num_rows):
        et = stats.column("event_type")[i].as_py()
        n = int(stats.column("n")[i].as_py())
        s = int(stats.column("s")[i].as_py())
        q = int(stats.column("q")[i].as_py())
        t = sigmas * sigmas * (n * q - s * s)  # ≥ 0 (Cauchy–Schwarz)
        r = isqrt(t)
        cuts[et] = (n, s - r - 1, s + r + 1)  # n·vq ≤ lo | ≥ hi

    cuts_ref = ray.put(cuts)

    def count_partial(batch: pa.Table) -> pa.Table:
        cts = cached_get(cuts_ref)
        vq = np.floor(batch.column("value")
                      .to_numpy(zero_copy_only=False) * float(scale)
                      + 0.5).astype(np.int64)
        et = batch.column("event_type").to_pandas().to_numpy()
        rows = {"event_type": [], "n_events": [], "n_anomalies": []}
        for typ in pd.unique(et):
            n, lo, hi = cts[typ]
            v = vq[et == typ] * n
            rows["event_type"].append(typ)
            rows["n_events"].append(len(v))
            rows["n_anomalies"].append(int(((v <= lo)
                                            | (v >= hi)).sum()))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_events": pa.array(rows["n_events"], pa.int64()),
            "n_anomalies": pa.array(rows["n_anomalies"], pa.int64())})

    return (ds.map_batches(count_partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_anomalies", alias_name="n_anomalies")))


EVENTS_ANOMALY_ZSCORE_SQL = f"""
WITH q AS (
    SELECT event_type,
           CAST(FLOOR(value * {ZSCORE_SCALE} + 0.5) AS BIGINT) AS vq
    FROM events),
st AS (
    SELECT event_type, COUNT(*) AS n, SUM(vq) AS s,
           SUM(vq * vq) AS qq
    FROM q GROUP BY event_type)
SELECT q.event_type, CAST(st.n AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN (st.n * q.vq - st.s) * (st.n * q.vq - st.s)
                          > {ZSCORE_SIGMAS * ZSCORE_SIGMAS}
                            * (st.n * st.qq - st.s * st.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM q JOIN st USING (event_type)
GROUP BY q.event_type, st.n
"""


# ---------------------------------------------------------------------------
# paragraph/segment-level exact dedup (Lee-et-al substring-dedup shape)
# ---------------------------------------------------------------------------

SEG_WORDS = 8
DUP_BROADCAST_CUTOFF = 5_000_000


def docs_segment_dedup(sf_dir: str, seg_words: int = SEG_WORDS,
                       dup_cutoff: int = DUP_BROADCAST_CUTOFF,
                       sample_hex: "Optional[int]" = None):
    """Segment-level exact dedup over the corpus — the
    deduplicate-text-datasets shape at paragraph granularity: each doc
    splits into fixed ``seg_words``-word segments, a segment is
    DUPLICATED when its md5 appears in ≥ 2 distinct docs →
    (doc_id, n_segments, n_dup_segments) over distinct per-doc
    segment hashes.

    Plan: pass 1 builds per-batch distinct (h, doc) pairs — one doc =
    one row, so batch-local distinct is globally exact (the
    corpus_decontaminate precedent) — and folds them to the dup-hash
    table (COUNT ≥ 2). The dup SET is usually tiny, so it is
    count-gated: under ``dup_cutoff`` it broadcasts and pass 2
    re-segments each doc and scores it with ZERO exchange (re-reading
    text beats materializing the fact-sized pair table — the
    events_above_p95 rescan trade); above the gate the pairs
    left-join the dup table (string-keyed hash join, the honest
    fact-scale route) and fold per doc. Segmenting and md5 are
    vectorized (polars explode/groupby + the md5keys DuckDB kernel,
    byte-identical to the oracle's md5 by construction).

    100-TB mode: ``sample_hex=d`` keeps only segment hashes whose
    first hex digit is < d (a deterministic d/16 subsample of the
    fingerprint stream — the corpus_decontaminate_winnow discipline),
    cutting every exchange and the dup set ~16/d× at a documented
    recall bound: a flagged segment is ALWAYS a true cross-doc dup
    (zero false positives — the same hashes are compared, just fewer
    of them), and n_segments counts only sampled segments. Exact mode
    (None) is the SQL-oracled contract; the sampled twin is
    rows-only with parity pinned by test."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..functions.broadcast import cached_get
    from ..functions.md5keys import md5_hex_text

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def seg_hashes(batch: pa.Table):
        """→ polars frame (doc_id, h) of DISTINCT per-doc segment
        md5s (order not significant)."""
        import polars as pl
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        ex = (df.with_columns(pl.col("text").str.split(" ")
                              .alias("w")).drop("text")
              .explode("w")
              .with_columns((pl.int_range(pl.len()).over("doc_id")
                             // seg_words).alias("seg")))
        segs = (ex.group_by(["doc_id", "seg"], maintain_order=True)
                .agg(pl.col("w").str.join(" ").alias("p")))
        h = md5_hex_text(segs.get_column("p").to_arrow())
        out = pl.DataFrame({
            "doc_id": segs.get_column("doc_id"),
            "h": pl.from_arrow(h)}).unique()
        if sample_hex is not None:
            # first-hex-digit gate: uniform d/16 deterministic sample
            # (vectorized — a set test on the leading character)
            allowed = list("0123456789abcdef"[:sample_hex])
            out = out.filter(
                pl.col("h").str.slice(0, 1).is_in(allowed))
        return out

    def pair_partial(batch: pa.Table) -> pa.Table:
        return seg_hashes(batch).to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("h", pa.string())]))

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow")
    dup = (pairs.groupby("h").aggregate(Count(alias_name="nd"))
           .filter(lambda r: r["nd"] >= 2)
           .select_columns(["h"]).materialize())

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_segments", pa.int64()),
                            ("n_dup_segments", pa.int64())])

    if dup.count() <= dup_cutoff:
        dup_arr = np.sort(pa.concat_tables(list(
            dup.iter_batches(batch_size=1 << 20,
                             batch_format="pyarrow")))
            .column("h").to_numpy(zero_copy_only=False))
        dup_ref = ray.put(dup_arr)

        def score(batch: pa.Table) -> pa.Table:
            hd = seg_hashes(batch)
            dups = cached_get(dup_ref)
            h = hd.get_column("h").to_numpy()
            if len(dups):
                pos = np.searchsorted(dups, h)
                pos[pos == len(dups)] = 0
                is_dup = dups[pos] == h
            else:
                is_dup = np.zeros(len(h), bool)
            import polars as pl
            g = (hd.with_columns(pl.Series("d", is_dup.astype(
                np.int64)))
                 .group_by("doc_id")
                 .agg(pl.len().alias("n_segments"),
                      pl.col("d").sum().alias("n_dup_segments")))
            return g.to_arrow().cast(out_schema)

        return ds.map_batches(score, batch_format="pyarrow")

    # fact-scale dup set: left-join the distinct pairs against it and
    # fold per doc (one doc's pairs may split across join partitions,
    # so a groupby Sum finishes the fold). BOTH join inputs are
    # materialized — a lazy operator feeding a JoinOperator starved
    # the 4-cpu session into a hang (the two-JoinOperator gotcha's
    # single-join cousin, reproduced on this exact plan)
    flag = dup.map_batches(
        lambda b: b.append_column(
            "_d", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow").materialize()
    flagged = pairs.materialize().join(flag, "left_outer", 16,
                                       on=("h",))

    def doc_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id")
            .to_numpy(zero_copy_only=False),
            "d": batch.column("_d").to_pandas()
            .fillna(0).astype(np.int64)})
        g = df.groupby("doc_id", as_index=False).agg(
            n_segments=("d", "size"), n_dup_segments=("d", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False) \
            .cast(out_schema)

    return (flagged.map_batches(doc_partial, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_segments", alias_name="n_segments"),
                       Sum("n_dup_segments",
                           alias_name="n_dup_segments")))


DOCS_SEGMENT_DEDUP_SQL = f"""
WITH w AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents),
seg AS (
    SELECT doc_id,
           md5(string_agg(word, ' ' ORDER BY i)) AS h
    FROM w GROUP BY doc_id, (i - 1) // {SEG_WORDS}),
hd AS (SELECT DISTINCT doc_id, h FROM seg),
dup AS (SELECT h, COUNT(*) AS nd FROM hd GROUP BY h)
SELECT hd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_segments
FROM hd JOIN dup USING (h) GROUP BY hd.doc_id
"""


# ---------------------------------------------------------------------------
# revenue deciles (NTILE inequality report)
# ---------------------------------------------------------------------------

DECILES_K = 10
DECILES_SHIFT = 20


def orders_revenue_deciles(sf_dir: str, k: int = DECILES_K,
                           shift: int = DECILES_SHIFT):
    """Revenue concentration report: customers ranked by lifetime
    order value, split into NTILE(k) deciles → (decile, n_customers,
    revenue_c) — the 80/20 inequality shape.

    Plan: per-custkey revenue folds per batch before its groupby
    (bounded by customers); ranking reuses the orders_price_rank
    machinery on the NEGATED cents key (arithmetic >> is monotone on
    int64, so value-bucket co-location works unchanged for DESC
    order): tiny bucket-count fold → driver exclusive prefix → one
    co-location exchange where each bucket ranks locally and folds to
    ≤ k partial rows. No full sort anywhere."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get
    from .rank import _ntile_from_rownum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False), "rev": cents})
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False)["rev"].sum(),
            preserve_index=False)

    cust_rev = (ds.map_batches(rev_partial, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("rev", alias_name="rev")))

    def keyed(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        key = -rev  # DESC rank = ASC rank of the negation
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "rev": batch.column("rev"),
            "key": pa.array(key, pa.int64()),
            "bucket": pa.array(key >> shift, pa.int64())})

    fact = cust_rev.map_batches(keyed,
                                batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"bucket": batch.column("bucket")
                           .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("bucket", as_index=False).size()
            .rename(columns={"size": "n"}), preserve_index=False)

    counts = (fact.map_batches(count_partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("bucket")
              .reset_index(drop=True))
    n_arr = counts["n"].to_numpy(np.int64)
    base = np.cumsum(n_arr) - n_arr
    n_total = int(n_arr.sum())
    base_map = {int(b): int(v) for b, v in
                zip(counts["bucket"].to_numpy(), base)}
    state_ref = ray.put((base_map, n_total))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_map_l, n_tot = cached_get(state_ref)
        if len(g) == 0:
            return pd.DataFrame({
                "decile": pd.Series([], dtype=np.int64),
                "n_customers": pd.Series([], dtype=np.int64),
                "revenue_c": pd.Series([], dtype=np.int64)})
        off = base_map_l[int(g["bucket"].iloc[0])]
        key = g["key"].to_numpy(np.int64)
        ck = g["o_custkey"].to_numpy(np.int64)
        rev = g["rev"].to_numpy(np.int64)
        order = np.lexsort((ck, key))
        inv = np.empty(len(order), np.int64)
        inv[order] = np.arange(len(order))
        row_num = off + inv + 1
        tile = _ntile_from_rownum(row_num, n_tot, k)
        return (pd.DataFrame({"decile": tile, "n": 1, "rev": rev})
                .groupby("decile", as_index=False)
                .agg(n_customers=("n", "sum"),
                     revenue_c=("rev", "sum")))

    return (fact.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pandas")
            .groupby("decile")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("revenue_c", alias_name="revenue_c")))


ORDERS_REVENUE_DECILES_SQL = f"""
WITH cr AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS rev
    FROM orders GROUP BY o_custkey),
r AS (
    SELECT rev, NTILE({DECILES_K})
           OVER (ORDER BY rev DESC, o_custkey) AS decile
    FROM cr)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev) AS BIGINT) AS revenue_c
FROM r GROUP BY decile
"""


# ---------------------------------------------------------------------------
# session path mining (top navigation paths)
# ---------------------------------------------------------------------------

PATHS_GAP_MINUTES = 30
PATHS_MAX_LEN = 5
PATHS_K = 20


def events_top_paths(sf_dir: str, gap_minutes: int = PATHS_GAP_MINUTES,
                     max_len: int = PATHS_MAX_LEN, k: int = PATHS_K,
                     n_buckets: int = 32):
    """Top-k session paths: sessions cut at gaps > ``gap_minutes``
    (the sessionize rule), each session keyed by the '>'-joined
    event-type sequence of its first ``max_len`` events →
    (path, n) for the k most frequent paths (ties broken by path).

    Plan: ONE user-bucket co-location exchange; each bucket runs the
    sessionize numpy assignment (sort by (user, ts, event_id) —
    event_id makes equal-timestamp order engine-identical), builds
    path strings with ``max_len`` vectorized np.char.add steps (never
    a per-session Python join), and folds to its local path counts.
    A tiny groupby sums buckets; top-k is partial-then-limit."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        jb = (uid.astype(np.int64) % n_buckets).astype(np.int32)
        return batch.append_column("_jb", pa.array(jb, pa.int32()))

    def bucket_paths(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        user = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        et = g["event_type"].to_numpy(dtype=str)
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        delta = np.zeros(n, dtype=np.int64)
        delta[1:] = ts_us[1:] - ts_us[:-1]
        new_sess = new_user | (delta > gap_us)
        bounds = np.flatnonzero(new_sess)
        lengths = np.diff(np.append(bounds, n))
        # step-vectorized path build: ≤ max_len np.char.add rounds
        paths = et[bounds].astype(object)
        for step in range(1, max_len):
            has = lengths > step
            paths[has] = paths[has] + ">" + et[bounds[has] + step]
        return (pd.DataFrame({"path": paths.astype(str)})
                .groupby("path", as_index=False).size()
                .rename(columns={"size": "n"})
                .astype({"n": np.int64}))

    counted = (ds.map_batches(add_bucket, batch_format="pyarrow")
               .groupby("_jb")
               .map_groups(bucket_paths, batch_format="pandas")
               .groupby("path").aggregate(Sum("n", alias_name="n")))

    out_schema = pa.schema([("path", pa.string()), ("n", pa.int64())])

    def topk_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        if batch.num_rows == 0:
            return batch.cast(out_schema)
        return (pl.from_arrow(batch)
                .sort(["n", "path"], descending=[True, False])
                .head(k).to_arrow().cast(out_schema))

    return (counted.map_batches(topk_partial, batch_format="pyarrow")
            .sort(["n", "path"], descending=[True, False]).limit(k))


EVENTS_TOP_PATHS_SQL = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     > {PATHS_GAP_MINUTES * 60 * 1000000}
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
    SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                 ORDER BY ts, event_id) AS rn
    FROM sess),
paths AS (
    SELECT user_id, sid,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM ranked WHERE rn <= {PATHS_MAX_LEN}
    GROUP BY user_id, sid)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path LIMIT {PATHS_K}
"""


# ---------------------------------------------------------------------------
# DAU / WAU engagement series (rolling exact distinct users)
# ---------------------------------------------------------------------------

WAU_WINDOW_DAYS = 7
_US_PER_DAY = 86_400_000_000


def events_dau_wau(sf_dir: str, window_days: int = WAU_WINDOW_DAYS):
    """Daily and rolling-7-day active users — the engagement series
    every product pipeline computes, with the hard part being EXACT
    distinct users over a sliding window → (day_i, dau, wau) for each
    observed day (day_i = days since epoch).

    Plan: the corpus folds ONCE to the distinct (day, user) presence
    table (per-batch distinct → groupby count — bounded by
    users × days, never event-sized). DAU is a per-day partial count
    over it. WAU expands each presence row into its ≤ ``window_days``
    covering window-ends (vectorized np.repeat — the chunk-overlap
    discipline), re-distincts (a user active twice in one window
    counts once), and counts per window end; the observed-day filter
    is a tiny broadcast. Exchanges are all presence-table-sized; the
    result is O(days) and returned as one Arrow table."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        d = (_epoch_us(batch.column("ts")) // _US_PER_DAY)
        df = pd.DataFrame({
            "d": d,
            "user_id": batch.column("user_id")
            .to_numpy(zero_copy_only=False)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["d", "user_id"])
             .aggregate(Count(alias_name="_n"))
             .select_columns(["d", "user_id"]).materialize())

    # DAU: per-day partial fold over the presence table
    def dau_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"d": batch.column("d")
                           .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("d", as_index=False).size()
            .rename(columns={"size": "dau"}), preserve_index=False)

    dau = (pairs.map_batches(dau_partial, batch_format="pyarrow")
           .groupby("d").aggregate(Sum("dau", alias_name="dau"))
           .to_pandas())
    days = np.sort(dau["d"].to_numpy(np.int64))
    days_ref = ray.put(days)

    # WAU: presence → covering window-ends → re-distinct → count
    def expand(batch: pa.Table) -> pa.Table:
        obs = cached_get(days_ref)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        w = (np.repeat(d, window_days)
             + np.tile(np.arange(window_days, dtype=np.int64),
                       len(d)))
        uu = np.repeat(u, window_days)
        if len(obs):
            pos = np.searchsorted(obs, w)
            pos[pos == len(obs)] = 0
            keep = obs[pos] == w
        else:
            keep = np.zeros(len(w), bool)
        df = pd.DataFrame({"w": w[keep],
                           "user_id": uu[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    wau_pairs = (pairs.map_batches(expand, batch_format="pyarrow")
                 .groupby(["w", "user_id"])
                 .aggregate(Count(alias_name="_n"))
                 .select_columns(["w"]))

    def wau_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": batch.column("w")
                           .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("w", as_index=False).size()
            .rename(columns={"size": "wau"}), preserve_index=False)

    wau = (wau_pairs.map_batches(wau_partial, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("wau", alias_name="wau"))
           .to_pandas())

    out = (dau.rename(columns={"d": "day_i"})
           .merge(wau.rename(columns={"w": "day_i"}), on="day_i"))
    out = out.sort_values("day_i").reset_index(drop=True)
    return pa.table({
        "day_i": pa.array(out["day_i"].to_numpy(np.int64),
                          pa.int64()),
        "dau": pa.array(out["dau"].to_numpy(np.int64), pa.int64()),
        "wau": pa.array(out["wau"].to_numpy(np.int64), pa.int64())})


EVENTS_DAU_WAU_SQL = f"""
WITH du AS (
    SELECT DISTINCT
           CAST(epoch_us(date_trunc('day', ts)) // {_US_PER_DAY}
                AS BIGINT) AS d,
           user_id
    FROM events),
days AS (SELECT DISTINCT d FROM du)
SELECT days.d AS day_i,
       CAST((SELECT COUNT(*) FROM du WHERE du.d = days.d)
            AS BIGINT) AS dau,
       CAST((SELECT COUNT(DISTINCT user_id) FROM du
             WHERE du.d BETWEEN days.d - {WAU_WINDOW_DAYS - 1}
                            AND days.d)
            AS BIGINT) AS wau
FROM days
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve (tokenizer-budget planning)
# ---------------------------------------------------------------------------

VOCAB_LEVELS = (1, 10, 100, 1000)


def docs_vocab_coverage(sf_dir: str,
                        levels: tuple = VOCAB_LEVELS):
    """Vocabulary coverage curve — for each vocab budget k, what
    fraction of all token occurrences the top-k words cover (the
    question a tokenizer/vocab-size decision starts from) →
    (k, covered, total_tokens) in exact integers.

    Plan: ONE pass folds per-batch word counts (polars split/explode
    — the ngram_counts discipline) into the vocab-sized
    ``groupby(word)`` exchange; per-block partial top-max(k) prunes
    the ranking exchange to ≤ max(k)·blocks rows, and the driver
    finishes on max(k) rows. total is a scalar fold. Ties rank by
    (count DESC, word) on both engines."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    kmax = max(levels)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch.select(["text"]))
        g = (df.with_columns(pl.col("text").str.split(" ")
                             .alias("w")).drop("text")
             .explode("w").group_by("w").agg(pl.len().alias("c")))
        return g.to_arrow().cast(pa.schema([("w", pa.string()),
                                            ("c", pa.int64())]))

    wc = (ds.map_batches(count_partial, batch_format="pyarrow")
          .groupby("w").aggregate(Sum("c", alias_name="c"))
          .materialize())

    total = 0
    for b in wc.iter_batches(batch_size=1 << 20,
                             batch_format="pyarrow"):
        total += int(pc.sum(b.column("c")).as_py() or 0)

    def topk_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        return (pl.from_arrow(batch)
                .sort(["c", "w"], descending=[True, False])
                .head(kmax).to_arrow()
                .cast(pa.schema([("w", pa.string()),
                                 ("c", pa.int64())])))

    top = pa.concat_tables(list(
        wc.map_batches(topk_partial, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    import polars as pl
    top = (pl.from_arrow(top).sort(["c", "w"],
                                   descending=[True, False])
           .head(kmax))
    c_sorted = top.get_column("c").to_numpy()
    cum = np.cumsum(c_sorted)
    rows = {"k": [], "covered": [], "total_tokens": []}
    for k in levels:
        rows["k"].append(int(k))
        rows["covered"].append(
            int(cum[min(k, len(cum)) - 1]) if len(cum) else 0)
        rows["total_tokens"].append(total)
    return pa.table({
        "k": pa.array(rows["k"], pa.int64()),
        "covered": pa.array(rows["covered"], pa.int64()),
        "total_tokens": pa.array(rows["total_tokens"], pa.int64())})


DOCS_VOCAB_COVERAGE_SQL = f"""
WITH wc AS (
    SELECT word, COUNT(*) AS c
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY word),
ranked AS (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rn
    FROM wc),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM wc)
SELECT CAST(k.k AS BIGINT) AS k,
       CAST((SELECT SUM(c) FROM ranked WHERE rn <= k.k)
            AS BIGINT) AS covered,
       tot.t AS total_tokens
FROM (VALUES {", ".join(f"({k})" for k in VOCAB_LEVELS)}) k(k), tot
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation (composite NTILE)
# ---------------------------------------------------------------------------

RFM_TILES = 5
RFM_SHIFTS = {"r": 4, "f": 0, "m": 20}


def _ntile_table(fact, value_col: str, k: int, shift: int):
    """(o_custkey, tile) for NTILE(k) OVER (ORDER BY value DESC,
    custkey) over a materialized (o_custkey, <value_col>) Dataset —
    the orders_revenue_deciles bucket machinery emitting PER-ROW
    tiles instead of aggregates (for composition into multi-measure
    segments)."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get
    from .rank import _ntile_from_rownum

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = -v
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "key": pa.array(key, pa.int64()),
            "bucket": pa.array(key >> shift, pa.int64())})

    kd = fact.map_batches(keyed,
                          batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"bucket": batch.column("bucket")
                           .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("bucket", as_index=False).size()
            .rename(columns={"size": "n"}), preserve_index=False)

    counts = (kd.map_batches(count_partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("bucket")
              .reset_index(drop=True))
    n_arr = counts["n"].to_numpy(np.int64)
    base = np.cumsum(n_arr) - n_arr
    n_total = int(n_arr.sum())
    base_map = {int(b): int(v) for b, v in
                zip(counts["bucket"].to_numpy(), base)}
    state_ref = ray.put((base_map, n_total))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base_map_l, n_tot = cached_get(state_ref)
        if len(g) == 0:
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype=np.int64),
                "tile": pd.Series([], dtype=np.int64)})
        off = base_map_l[int(g["bucket"].iloc[0])]
        key = g["key"].to_numpy(np.int64)
        ck = g["o_custkey"].to_numpy(np.int64)
        order = np.lexsort((ck, key))
        inv = np.empty(len(order), np.int64)
        inv[order] = np.arange(len(order))
        row_num = off + inv + 1
        return pd.DataFrame({
            "o_custkey": ck,
            "tile": _ntile_from_rownum(row_num, n_tot, k)})

    return (kd.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pandas"))


def orders_rfm_segments(sf_dir: str, k: int = RFM_TILES,
                        dim_cutoff: int = DIM_BROADCAST_CUTOFF):
    """RFM customer segmentation: each customer scored NTILE(k) on
    Recency (last order day, newest = tile 1), Frequency (order
    count) and Monetary (lifetime cents), then counted per (r, f, m)
    segment → (r_tile, f_tile, m_tile, n_customers) — ≤ k³ rows.

    Plan: ONE orders pass folds per-batch (custkey, max day, count,
    sum cents) partials into a customers-bounded groupby; each
    measure ranks through the bucket machinery (``_ntile_table``).
    Combining the three tile tables is count-gated: under the gate
    two of them collect driver-side (each is (custkey, tile) — tiny
    next to the fact) and attach via searchsorted; above it they
    compose as two native hash joins with a ``materialize()`` between
    (the two-JoinOperator hang rule)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def rfm_partial(batch: pa.Table) -> pa.Table:
        day = _epoch_us(batch.column("o_orderdate")) // _US_PER_DAY
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "r": day, "f": 1, "m": cents})
        g = df.groupby("o_custkey", as_index=False).agg(
            r=("r", "max"), f=("f", "sum"), m=("m", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    rfm = (ds.map_batches(rfm_partial, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("r", alias_name="r"),
                      Sum("f", alias_name="f"),
                      Sum("m", alias_name="m"))
           .materialize())

    rt = _ntile_table(rfm, "r", k, RFM_SHIFTS["r"]).materialize()
    ft = _ntile_table(rfm, "f", k, RFM_SHIFTS["f"]).materialize()
    mt = _ntile_table(rfm, "m", k, RFM_SHIFTS["m"]).materialize()

    out_schema = pa.schema([("r_tile", pa.int64()),
                            ("f_tile", pa.int64()),
                            ("m_tile", pa.int64()),
                            ("n_customers", pa.int64())])

    if rfm.count() <= dim_cutoff:
        def collect_map(t):
            tbl = pa.concat_tables(list(
                t.iter_batches(batch_size=1 << 20,
                               batch_format="pyarrow")))
            ck = tbl.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            tile = tbl.column("tile") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(ck, kind="stable")
            return ck[order], tile[order]

        f_ref = ray.put(collect_map(ft))
        m_ref = ray.put(collect_map(mt))

        def seg_partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            fk, fv = cached_get(f_ref)
            mk, mv = cached_get(m_ref)
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            r_tile = batch.column("tile") \
                .to_numpy(zero_copy_only=False)
            f_tile = fv[np.searchsorted(fk, ck)]
            m_tile = mv[np.searchsorted(mk, ck)]
            df = (pd.DataFrame({"r_tile": r_tile, "f_tile": f_tile,
                                "m_tile": m_tile})
                  .groupby(["r_tile", "f_tile", "m_tile"],
                           as_index=False)
                  .size().rename(columns={"size": "n_customers"}))
            return pa.Table.from_pandas(df, preserve_index=False) \
                .cast(out_schema)

        cells = rt.map_batches(seg_partial, batch_format="pyarrow")
    else:
        # fact-scale customers: two hash joins, materialized between
        j1 = rt.join(
            ft.map_batches(
                lambda b: b.rename_columns(["o_custkey", "f_tile"]),
                batch_format="pyarrow").materialize(),
            "inner", 16, on=("o_custkey",)).materialize()
        j2 = j1.join(
            mt.map_batches(
                lambda b: b.rename_columns(["o_custkey", "m_tile"]),
                batch_format="pyarrow").materialize(),
            "inner", 16, on=("o_custkey",))

        def seg_from_join(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            df = (pd.DataFrame({
                "r_tile": batch.column("tile")
                .to_numpy(zero_copy_only=False),
                "f_tile": batch.column("f_tile")
                .to_numpy(zero_copy_only=False),
                "m_tile": batch.column("m_tile")
                .to_numpy(zero_copy_only=False)})
                .groupby(["r_tile", "f_tile", "m_tile"],
                         as_index=False)
                .size().rename(columns={"size": "n_customers"}))
            return pa.Table.from_pandas(df, preserve_index=False) \
                .cast(out_schema)

        cells = j2.map_batches(seg_from_join,
                               batch_format="pyarrow")

    from ray.data.aggregate import Sum as _Sum
    return (cells.groupby(["r_tile", "f_tile", "m_tile"])
            .aggregate(_Sum("n_customers",
                            alias_name="n_customers")))


ORDERS_RFM_SEGMENTS_SQL = f"""
WITH rfm AS (
    SELECT o_custkey,
           MAX(CAST(epoch_us(date_trunc('day', o_orderdate))
                    // {_US_PER_DAY} AS BIGINT)) AS r,
           CAST(COUNT(*) AS BIGINT) AS f,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS m
    FROM orders GROUP BY o_custkey),
tiles AS (
    SELECT NTILE({RFM_TILES}) OVER (ORDER BY r DESC, o_custkey)
               AS r_tile,
           NTILE({RFM_TILES}) OVER (ORDER BY f DESC, o_custkey)
               AS f_tile,
           NTILE({RFM_TILES}) OVER (ORDER BY m DESC, o_custkey)
               AS m_tile
    FROM rfm)
SELECT CAST(r_tile AS BIGINT) AS r_tile,
       CAST(f_tile AS BIGINT) AS f_tile,
       CAST(m_tile AS BIGINT) AS m_tile,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM tiles GROUP BY r_tile, f_tile, m_tile
"""


# ---------------------------------------------------------------------------
# PMI collocation mining (phrase extraction)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_K = 50
PMI_SCALE = 1_000_000_000


def docs_bigram_pmi(sf_dir: str, min_count: int = PMI_MIN_COUNT,
                    k: int = PMI_K,
                    dim_cutoff: int = DIM_BROADCAST_CUTOFF):
    """Top-k collocations by pointwise mutual information — the
    phrase-mining step tokenizer/vocab pipelines run — ranked by the
    EXACT integer quantization pmi_q = (10⁹·c_xy·N) // (c_x·c_y)
    (monotone in PMI; a float log never hash-matches) →
    (bigram, cxy, pmi_q), ties by bigram.

    Plan: two corpus folds (unigram counts → vocab-bounded table;
    bigram counts filtered to c_xy ≥ ``min_count`` — the candidate
    bound). The unigram attach is count-gated: a broadcast
    (word → count) array pair under the gate, two hash joins with a
    ``materialize()`` between above it. The exact q needs >64-bit
    intermediates, so it's computed with Python-int (object-dtype)
    arithmetic — ONLY over the min_count-bounded candidate rows,
    never the corpus — then per-batch partial top-k bounds the final
    sort. Headroom: pmi_q ≤ 10⁹·N/min_count; int64-safe to N ≈ 10¹³
    tokens, the quantization scale is the knob beyond."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get
    from .analytics_r5 import _bigram_partial

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["text"]))
        d = (d.with_columns(pl.col("text").fill_null("")
                            .str.extract_all(r"[A-Za-z]+")
                            .alias("w")).drop("text")
             .explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase())
             .group_by("w").agg(pl.len().alias("c")))
        return d.to_arrow().cast(pa.schema([("w", pa.string()),
                                            ("c", pa.int64())]))

    uc = (ds.map_batches(uni_partial, batch_format="pyarrow")
          .groupby("w").aggregate(Sum("c", alias_name="c"))
          .materialize())
    n_total = 0
    for b in uc.iter_batches(batch_size=1 << 20,
                             batch_format="pyarrow"):
        n_total += int(pc.sum(b.column("c")).as_py() or 0)

    def bg_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        g = (_bigram_partial(batch).group_by("bigram")
             .agg(pl.len().alias("cxy")))
        return g.to_arrow().cast(pa.schema([("bigram", pa.string()),
                                            ("cxy", pa.int64())]))

    cand = (ds.map_batches(bg_partial, batch_format="pyarrow")
            .groupby("bigram").aggregate(Sum("cxy",
                                             alias_name="cxy"))
            .filter(lambda r: r["cxy"] >= min_count))

    out_schema = pa.schema([("bigram", pa.string()),
                            ("cxy", pa.int64()),
                            ("pmi_q", pa.int64())])

    def q_from_counts(bigram, cxy, cx, cy):
        qo = (PMI_SCALE * cxy.astype(object) * n_total
              // (cx.astype(object) * cy.astype(object)))
        return pa.table({
            "bigram": pa.array(bigram, pa.string()),
            "cxy": pa.array(cxy, pa.int64()),
            "pmi_q": pa.array(qo.astype(np.int64), pa.int64())})

    if uc.count() <= dim_cutoff:
        ut = pa.concat_tables(list(
            uc.iter_batches(batch_size=1 << 20,
                            batch_format="pyarrow")))
        words = ut.column("w").to_numpy(zero_copy_only=False)
        counts = ut.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(words, kind="stable")
        uc_ref = ray.put((words[order], counts[order]))

        def score(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            ws, cs = cached_get(uc_ref)
            import polars as pl
            d = pl.from_arrow(batch).with_columns(
                pl.col("bigram").str.split(" ").alias("p"))
            wa = d.get_column("p").list.get(0).to_numpy()
            wb = d.get_column("p").list.get(1).to_numpy()
            cx = cs[np.searchsorted(ws, wa)]
            cy = cs[np.searchsorted(ws, wb)]
            return q_from_counts(
                batch.column("bigram").to_numpy(
                    zero_copy_only=False),
                batch.column("cxy").to_numpy(zero_copy_only=False),
                cx, cy)

        scored = cand.map_batches(score, batch_format="pyarrow")
    else:
        # fact-scale vocab: split the bigram once, then two hash
        # joins against the unigram table (materialize between)
        def split_cols(batch: pa.Table) -> pa.Table:
            import polars as pl
            d = pl.from_arrow(batch).with_columns(
                pl.col("bigram").str.split(" ").alias("p"))
            return pa.table({
                "bigram": batch.column("bigram"),
                "cxy": batch.column("cxy"),
                "wa": d.get_column("p").list.get(0).to_arrow(),
                "wb": d.get_column("p").list.get(1).to_arrow(),
            }).cast(pa.schema([
                ("bigram", pa.string()), ("cxy", pa.int64()),
                ("wa", pa.string()), ("wb", pa.string())]))

        ua = uc.map_batches(
            lambda b: b.rename_columns(["wa", "cx"]),
            batch_format="pyarrow").materialize()
        ub = uc.map_batches(
            lambda b: b.rename_columns(["wb", "cy"]),
            batch_format="pyarrow").materialize()
        j1 = (cand.map_batches(split_cols, batch_format="pyarrow")
              .materialize().join(ua, "inner", 16, on=("wa",))
              .materialize())
        j2 = j1.join(ub, "inner", 16, on=("wb",))

        def score_join(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            return q_from_counts(
                batch.column("bigram").to_numpy(
                    zero_copy_only=False),
                batch.column("cxy").to_numpy(zero_copy_only=False),
                batch.column("cx").to_numpy(zero_copy_only=False),
                batch.column("cy").to_numpy(zero_copy_only=False))

        scored = j2.map_batches(score_join, batch_format="pyarrow")

    return _topk_rows(scored, ["pmi_q", "bigram"], [True, False], k,
                      out_schema)


DOCS_BIGRAM_PMI_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                          x -> lower(x)) AS w
    FROM documents),
uc AS (
    SELECT word, COUNT(*) AS c
    FROM (SELECT unnest(w) AS word FROM toks) GROUP BY word),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
bc AS (
    SELECT bigram, COUNT(*) AS cxy
    FROM (SELECT unnest(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i+1]))
                 AS bigram
          FROM toks)
    GROUP BY bigram HAVING COUNT(*) >= {PMI_MIN_COUNT}),
parts AS (
    SELECT bigram, cxy,
           string_split(bigram, ' ')[1] AS wa,
           string_split(bigram, ' ')[2] AS wb
    FROM bc),
scored AS (
    SELECT bigram, CAST(cxy AS BIGINT) AS cxy,
           CAST((CAST({PMI_SCALE} AS HUGEINT) * cxy * tot.n)
                // (ua.c * ub.c) AS BIGINT) AS pmi_q
    FROM parts
    CROSS JOIN tot
    JOIN uc ua ON ua.word = parts.wa
    JOIN uc ub ON ub.word = parts.wb)
SELECT bigram, cxy, pmi_q FROM scored
ORDER BY pmi_q DESC, bigram LIMIT {PMI_K}
"""
