"""As-of (time-travel) join — an operator Ray Data lacks natively,
composed per the engine's standard recipe: tag both sides, bucket by
the join key's hash, union, ``groupby(bucket)``, and inside each
bucket run a vectorized time-ordered merge (pandas ``merge_asof`` +
per-user ``searchsorted`` counts). Partitioning assumption: all rows
of one user land in one bucket (hash(user) % B) — the same
co-location contract as every keyed exchange here; skewed users are
handled by raising B.

Demo instance: each event joins the latest ORDER SNAPSHOT at or
before its timestamp. Snapshots are derived deterministically from
the orders table (snap_ts = 2024-01-01 + (o_orderkey % 30) days —
both engines compute the same mapping, keeping the DuckDB oracle
exact); output per event: last snapshot time (µs, -1 if none) and the
count of snapshots at-or-before the event.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EPOCH_2024_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z
_DAY_US = np.int64(86_400_000_000)


def events_asof_orders(sf_dir: str, n_buckets: int = 16,
                       direction: str = "backward"):
    """``direction="backward"`` (default): latest snapshot ≤ ts →
    (event_id, last_snap_us, n_prior). ``direction="forward"``: next
    snapshot ≥ ts → (event_id, next_snap_us, n_after) — the
    lead-time/SLA shape (time until the next snapshot). Both run the
    identical bucket exchange; only the in-bucket merge direction and
    the searchsorted side flip."""
    import ray.data as rd

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    fwd = direction == "forward"
    t_col = "next_snap_us" if fwd else "last_snap_us"
    n_col = "n_after" if fwd else "n_prior"

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = (batch.column("ts").to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32), pa.int32()),
            "user": pa.array(uid.astype(np.int64), pa.int64()),
            "t_us": pa.array(ts_us, pa.int64()),
            "event_id": batch.column("event_id"),
            "side": pa.array(np.full(batch.num_rows, "e"), pa.string()),
        })

    def tag_snaps(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        snap_us = _EPOCH_2024_US + (ok % 30).astype(np.int64) * _DAY_US
        return pa.table({
            "_jb": pa.array((cust % n_buckets).astype(np.int32), pa.int32()),
            "user": pa.array(cust.astype(np.int64), pa.int64()),
            "t_us": pa.array(snap_us, pa.int64()),
            "event_id": pa.array(np.full(batch.num_rows, -1, np.int64),
                                 pa.int64()),
            "side": pa.array(np.full(batch.num_rows, "s"), pa.string()),
        })

    tagged = (events.map_batches(tag_events, batch_format="pyarrow")
              .union(orders.map_batches(tag_snaps, batch_format="pyarrow")))

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"]
        sn = g[g["side"] == "s"]
        if ev.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                t_col: pd.Series([], dtype=np.int64),
                n_col: pd.Series([], dtype=np.int64)})
        ev = ev.sort_values("t_us", kind="mergesort")
        sn = sn.sort_values("t_us", kind="mergesort")
        if sn.empty:
            return pd.DataFrame({
                "event_id": ev["event_id"].to_numpy(),
                t_col: np.full(len(ev), -1, np.int64),
                n_col: np.zeros(len(ev), np.int64)})
        # nearest snapshot per user in the requested direction:
        # C-level asof merge
        m = pd.merge_asof(
            ev[["t_us", "user", "event_id"]],
            sn[["t_us", "user"]].assign(snap_us=sn["t_us"].to_numpy()),
            on="t_us", by="user", direction=direction)
        near = m["snap_us"].fillna(-1).astype(np.int64).to_numpy()
        # counts of snapshots ≤ ts (backward) / ≥ ts (forward):
        # per-user searchsorted over that user's sorted snapshot
        # times (few users per bucket; the inner work is vectorized)
        n_out = np.zeros(len(m), dtype=np.int64)
        snap_by_user = {u: grp["t_us"].to_numpy()
                        for u, grp in sn.groupby("user")}
        for u, grp in m.groupby("user"):
            arr = snap_by_user.get(u)
            if arr is None:
                continue
            if fwd:
                n_out[grp.index] = len(arr) - np.searchsorted(
                    arr, grp["t_us"].to_numpy(), side="left")
            else:
                n_out[grp.index] = np.searchsorted(
                    arr, grp["t_us"].to_numpy(), side="right")
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy(),
            t_col: near,
            n_col: n_out,
        })

    return tagged.groupby("_jb").map_groups(asof_bucket,
                                            batch_format="pandas")


EVENTS_ASOF_ORDERS_SQL = """
WITH snap AS (
    SELECT o_custkey,
           TIMESTAMP '2024-01-01'
             + (o_orderkey % 30) * INTERVAL 1 DAY AS snap_ts
    FROM orders
)
SELECT e.event_id,
       CAST(COALESCE(epoch_us(MAX(s.snap_ts)), -1) AS BIGINT)
           AS last_snap_us,
       COUNT(s.snap_ts) AS n_prior
FROM events e
LEFT JOIN snap s ON s.o_custkey = e.user_id AND s.snap_ts <= e.ts
GROUP BY e.event_id
"""


EVENTS_ASOF_ORDERS_FORWARD_SQL = """
WITH snap AS (
    SELECT o_custkey,
           TIMESTAMP '2024-01-01'
             + (o_orderkey % 30) * INTERVAL 1 DAY AS snap_ts
    FROM orders
)
SELECT e.event_id,
       CAST(COALESCE(epoch_us(MIN(s.snap_ts)), -1) AS BIGINT)
           AS next_snap_us,
       COUNT(s.snap_ts) AS n_after
FROM events e
LEFT JOIN snap s ON s.o_custkey = e.user_id AND s.snap_ts >= e.ts
GROUP BY e.event_id
"""
