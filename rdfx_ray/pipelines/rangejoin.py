"""Range (interval) join — the second join operator Ray Data lacks
natively (the first, as-of, lives in ``pipelines/asof.py``). Composed
with the engine's standard recipe: tag both sides onto one schema,
bucket by the equality key's hash, union, ``groupby(bucket)``, and
inside each bucket run a vectorized sorted-interval probe
(per-user ``searchsorted`` over event times + an exact integer prefix
sum for windowed SUMs).

Partitioning assumption: all rows of one user land in one bucket
(``hash(user) % B``) — the same co-location contract as every keyed
exchange here. Skewed users are handled by raising B; if the corpus
were instead time-partitioned, each window would be replicated to
every time bucket it overlaps (bounded by the max window span) — the
standard interval-join replication rule, documented here because this
instance keys on user, where no replication is needed.

Demo instance: deterministic "promo windows" derived from the orders
table in the events' time domain (both engines compute the identical
mapping, keeping the DuckDB oracle exact):

    w_start = 2024-01-01 + (o_orderkey % 28) days
    w_end   = w_start + ((o_orderkey % 5) + 1) days

Each order's window collects the customer's events with
``w_start <= ts < w_end``; output per order (inner-join semantics —
windows with zero events drop out): ``(o_orderkey, n_events,
sum_value_1e2)`` with the event values integer-quantized (×100) BEFORE
summation so the oracle hash-matches exactly (CLAUDE.md float rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EPOCH_2024_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z
_DAY_US = np.int64(86_400_000_000)


def events_in_order_windows(sf_dir: str, n_buckets: int = 16):
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    # one tagged schema for both sides: events carry (t_us, q_cents),
    # windows carry (start_us, end_us); `okey` is -1 on the event side.
    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = (batch.column("ts").to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]").astype(np.int64))
        q = np.floor(batch.column("value").to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32), pa.int32()),
            "user": pa.array(uid.astype(np.int64), pa.int64()),
            "a_us": pa.array(ts_us, pa.int64()),
            "b": pa.array(q, pa.int64()),
            "okey": pa.array(np.full(batch.num_rows, -1, np.int64),
                             pa.int64()),
            "side": pa.array(np.full(batch.num_rows, "e"), pa.string()),
        })

    def tag_windows(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        start = _EPOCH_2024_US + (ok % 28) * _DAY_US
        end = start + ((ok % 5) + 1) * _DAY_US
        return pa.table({
            "_jb": pa.array((cust % n_buckets).astype(np.int32), pa.int32()),
            "user": pa.array(cust, pa.int64()),
            "a_us": pa.array(start, pa.int64()),
            "b": pa.array(end, pa.int64()),
            "okey": pa.array(ok, pa.int64()),
            "side": pa.array(np.full(batch.num_rows, "w"), pa.string()),
        })

    tagged = (events.map_batches(tag_events, batch_format="pyarrow")
              .union(orders.map_batches(tag_windows,
                                        batch_format="pyarrow")))

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "sum_value_1e2": pd.Series([], dtype=np.int64)})

    def probe_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"]
        win = g[g["side"] == "w"]
        if ev.empty or win.empty:
            return _empty()
        # events sorted by (user, t); exact integer prefix sums give
        # every window's SUM as one difference — no re-summing per
        # window, so a hot user with W windows costs O(W log E), not
        # O(W·E).
        eu = ev["user"].to_numpy()
        et = ev["a_us"].to_numpy()
        eq = ev["b"].to_numpy()
        order = np.lexsort((et, eu))
        eu, et, eq = eu[order], et[order], eq[order]
        cs = np.concatenate([[0], np.cumsum(eq)])
        users, offs = np.unique(eu, return_index=True)
        offs = np.concatenate([offs, [len(eu)]])
        out_key, out_n, out_sum = [], [], []
        # few distinct users per bucket; the inner probe is vectorized
        # over ALL of that user's windows at once.
        for u, wgrp in win.groupby("user", sort=False):
            ui = np.searchsorted(users, u)
            if ui >= len(users) or users[ui] != u:
                continue
            s, e = offs[ui], offs[ui + 1]
            lo = s + np.searchsorted(et[s:e], wgrp["a_us"].to_numpy(),
                                     side="left")
            hi = s + np.searchsorted(et[s:e], wgrp["b"].to_numpy(),
                                     side="left")
            n = hi - lo
            keep = n > 0
            if not keep.any():
                continue
            out_key.append(wgrp["okey"].to_numpy()[keep])
            out_n.append(n[keep])
            out_sum.append(cs[hi[keep]] - cs[lo[keep]])
        if not out_key:
            return _empty()
        return pd.DataFrame({
            "o_orderkey": np.concatenate(out_key).astype(np.int64),
            "n_events": np.concatenate(out_n).astype(np.int64),
            "sum_value_1e2": np.concatenate(out_sum).astype(np.int64)})

    return tagged.groupby("_jb").map_groups(probe_bucket,
                                            batch_format="pandas")


EVENTS_IN_ORDER_WINDOWS_SQL = """
WITH win AS (
    SELECT o_orderkey, o_custkey,
           TIMESTAMP '2024-01-01'
             + (o_orderkey % 28) * INTERVAL 1 DAY AS w_start,
           TIMESTAMP '2024-01-01'
             + (o_orderkey % 28) * INTERVAL 1 DAY
             + ((o_orderkey % 5) + 1) * INTERVAL 1 DAY AS w_end
    FROM orders
)
SELECT w.o_orderkey,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_1e2
FROM win w
JOIN events e
  ON e.user_id = w.o_custkey
 AND e.ts >= w.w_start
 AND e.ts <  w.w_end
GROUP BY w.o_orderkey
"""
