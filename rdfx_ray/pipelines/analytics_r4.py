"""Round-4 analytics additions — each a distinct operator shape the
registry didn't yet cover, every one SQL-oracled:

- ``docs_sample_hash``: deterministic Bernoulli sampling (the md5
  hash-gate convention of ``split_corpus`` applied as a SAMPLE
  operator — reproducible across engines and runs, no RNG state).
- ``events_stratified_sample``: per-stratum sampling rates (the
  class-balance shape a training-data pipeline needs: downsample the
  dominant event types, keep the rare ones whole).
- ``orders_unpivot``: wide→long reshape (UNPIVOT/melt) of a fact
  table — vectorized per-batch column stacking, 2× row explosion,
  no exchange at all.
- ``nation_region_cross``: CROSS JOIN with a broadcast small side —
  the only join type the surface didn't cover; the small side rides
  one ``ray.put``, the big side streams.
- ``docs_grouping_sets``: arbitrary GROUPING SETS ((lang),(source))
  — the non-hierarchical cousin of the ROLLUP/CUBE family, assembled
  from the same single finest-level corpus pass.
- ``orders_price_mad``: median absolute deviation per group, in
  EXACT integer form (mad4x = 2× the interpolated median of
  2×|deviation|) — a two-phase composition: exact group medians →
  broadcast → exact median of deviations.
- ``events_above_p95``: filter by a global exact order statistic —
  the two-pass broadcast-scalar shape (p95 located via a tiny
  bucket-count fold + one bounded bucket read, then a streaming
  filter; the corpus is never collected).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# deterministic sampling (md5 hash gate — the split_corpus convention)
# ---------------------------------------------------------------------------

SAMPLE_PCT = 7


def _md5_bucket(ids: np.ndarray, mod: int = 100) -> np.ndarray:
    """First-8-hex-digit md5 bucket of each integer id — byte-identical
    to DuckDB's ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))``.
    Vectorized (md5keys kernel, ~5× the hashlib loop; same bytes)."""
    from ..functions.md5keys import md5_mod
    return md5_mod(ids, mod)


def docs_sample_hash(sf_dir: str, pct: int = SAMPLE_PCT):
    """Deterministic ``pct``-% Bernoulli sample of the documents table
    → (doc_id, lang, n_chars). One streaming filter pass; the gate is
    a pure function of doc_id, so the sample is reproducible across
    engines, runs and cluster sizes (no per-task RNG seeds to
    coordinate)."""
    import ray.data as rd

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = _md5_bucket(ids) < pct
        return batch.filter(pa.array(keep))

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "n_chars"])
            .map_batches(gate, batch_format="pyarrow",
                         batch_size=65536))


DOCS_SAMPLE_HASH_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           AS UBIGINT) % 100 < {SAMPLE_PCT}
"""


# per-stratum keep rates (percent). Rare types kept whole, dominant
# types downsampled — the class-balance shape. Types outside the map
# fall back to STRATIFIED_DEFAULT_PCT.
STRATIFIED_RATES = {"view": 5, "click": 25, "error": 50,
                    "signup": 75, "purchase": 100}
STRATIFIED_DEFAULT_PCT = 10


def events_stratified_sample(sf_dir: str,
                             rates: dict | None = None,
                             default_pct: int = STRATIFIED_DEFAULT_PCT):
    """Stratified deterministic sample of events: each event_type
    stratum keeps its own md5-gated percentage → (event_id,
    event_type, user_id). The rate map is O(strata) and ships in the
    task closure (never an exchange); the pass itself is a streaming
    filter like :func:`docs_sample_hash`."""
    import ray.data as rd

    rates = dict(STRATIFIED_RATES if rates is None else rates)

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_pylist()
        thresh = np.fromiter(
            (rates.get(t, default_pct) for t in types),
            dtype=np.int64, count=len(types))
        keep = _md5_bucket(ids) < thresh
        return batch.filter(pa.array(keep))

    return (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type",
                                     "user_id"])
            .map_batches(gate, batch_format="pyarrow",
                         batch_size=65536))


def _stratified_sql() -> str:
    cases = " ".join(
        f"WHEN '{t}' THEN {p}" for t, p in STRATIFIED_RATES.items())
    return f"""
SELECT event_id, event_type, user_id FROM events
WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
           AS UBIGINT) % 100
      < (CASE event_type {cases} ELSE {STRATIFIED_DEFAULT_PCT} END)
"""


EVENTS_STRATIFIED_SAMPLE_SQL = _stratified_sql()


# ---------------------------------------------------------------------------
# wide→long reshape (UNPIVOT / melt)
# ---------------------------------------------------------------------------


def orders_unpivot(sf_dir: str):
    """UNPIVOT the orders fact table: each order row becomes one row
    per measure → (o_orderkey, measure, val) with measure ∈
    {'cents', 'custkey'}. Pure per-batch column stacking (two column
    takes + a concat), a 2× row explosion with zero exchange — the
    melt shape feature stores and long-format trainers consume."""
    import ray.data as rd

    def melt(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").cast(pa.int64())
        cents = pa.array(
            np.floor(batch.column("o_totalprice")
                     .to_numpy(zero_copy_only=False) * 100.0 + 0.5)
            .astype(np.int64), pa.int64())
        cust = batch.column("o_custkey").cast(pa.int64())
        n = batch.num_rows
        t1 = pa.table({"o_orderkey": keys,
                       "measure": pa.array(["cents"] * n, pa.string()),
                       "val": cents})
        t2 = pa.table({"o_orderkey": keys,
                       "measure": pa.array(["custkey"] * n,
                                           pa.string()),
                       "val": cust})
        return pa.concat_tables([t1, t2]).combine_chunks()

    return (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice",
                                     "o_custkey"])
            .map_batches(melt, batch_format="pyarrow",
                         batch_size=65536))


ORDERS_UNPIVOT_SQL = """
SELECT o_orderkey, 'cents' AS measure,
       CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS val
FROM orders
UNION ALL
SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS BIGINT)
FROM orders
"""


# ---------------------------------------------------------------------------
# CROSS JOIN (broadcast small side)
# ---------------------------------------------------------------------------


def nation_region_cross(sf_dir: str):
    """CROSS JOIN nation × region → (n_name, r_name). The region side
    (O(regions), tiny by definition) broadcasts once via ``ray.put``;
    each nation batch emits the cartesian block with numpy
    repeat/tile — a cross join never needs an exchange when one side
    is broadcastable, and a cross join where NEITHER side fits memory
    is a design error upstream, not an operator to optimize."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from ..functions.broadcast import cached_get

    r_names = pq.read_table(f"{sf_dir}/region.parquet",
                            columns=["r_name"]).column("r_name") \
        .to_pylist()
    r_ref = ray.put(np.asarray(sorted(r_names), dtype=object))

    def cross(batch: pa.Table) -> pa.Table:
        right = cached_get(r_ref)
        n_names = np.asarray(batch.column("n_name").to_pylist(),
                             dtype=object)
        return pa.table({
            "n_name": pa.array(np.repeat(n_names, len(right)),
                               pa.string()),
            "r_name": pa.array(np.tile(right, len(n_names)),
                               pa.string()),
        })

    return (rd.read_parquet(f"{sf_dir}/nation.parquet",
                            columns=["n_name"])
            .map_batches(cross, batch_format="pyarrow",
                         batch_size=65536))


NATION_REGION_CROSS_SQL = """
SELECT n_name, r_name FROM nation CROSS JOIN region
"""


# ---------------------------------------------------------------------------
# arbitrary GROUPING SETS
# ---------------------------------------------------------------------------


def docs_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((lang), (source)) — the
    non-hierarchical set the ROLLUP/CUBE pair can't express (neither
    level contains the other). Shares the single finest-level corpus
    pass with ``docs_rollup_stats`` / ``docs_cube_stats``; the level
    re-aggregation is over the |langs|×|sources|-bounded table."""
    from .analytics_ext import (
        _docs_lang_source_finest,
        _grouping_set_levels,
    )
    return _grouping_set_levels(
        _docs_lang_source_finest(sf_dir), [("lang",), ("source",)])


DOCS_GROUPING_SETS_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY GROUPING SETS ((lang), (source))
"""


# ---------------------------------------------------------------------------
# median absolute deviation (exact, integer form)
# ---------------------------------------------------------------------------


def orders_price_mad(sf_dir: str):
    """Per-priority median absolute deviation in EXACT integer form →
    (o_orderpriority, mad4x_cents, n_orders), where ``mad4x_cents`` is
    4 × the interpolated MAD: phase 1 computes each group's exact
    ``med2x`` (2× median, integer — ``orders_price_median2x``'s
    machinery), broadcasts the O(groups) map, and phase 2 runs the
    same distinct-value median select over ``|2·cents − med2x|``.
    Two corpus passes total; the shuffle carries one row per distinct
    (group, deviation) — the `grouped_quantiles_distributed` bound."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get
    from .analytics_ext import orders_price_median2x

    med = orders_price_median2x(sf_dir).to_pandas()  # O(groups) rows
    med_map = dict(zip(med["o_orderpriority"],
                       med["med2x_cents"].astype(np.int64)))
    med_ref = ray.put(med_map)

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])

    def dev_partial(batch: pa.Table) -> pa.Table:
        med_l = cached_get(med_ref)
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        grp = batch.column("o_orderpriority").to_pandas()
        med_arr = grp.map(med_l).to_numpy(np.int64)
        dv = np.abs(2 * cents - med_arr)
        g = (pd.DataFrame({"o_orderpriority": grp, "dv": dv})
             .groupby(["o_orderpriority", "dv"], as_index=False)
             .size().rename(columns={"size": "_n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(dev_partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby(["o_orderpriority", "dv"])
              .aggregate(Sum("_n", alias_name="_n")))

    def mad_select(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["dv"].to_numpy())
        vals = g["dv"].to_numpy()[order]
        cum = np.cumsum(g["_n"].to_numpy()[order])
        n = int(cum[-1])
        r_lo, r_hi = (n - 1) // 2, n // 2
        v_lo = int(vals[np.searchsorted(cum, r_lo + 1)])
        v_hi = int(vals[np.searchsorted(cum, r_hi + 1)])
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "mad4x_cents": [np.int64(v_lo + v_hi)],
            "n_orders": [np.int64(n)]})

    return counts.groupby("o_orderpriority").map_groups(
        mad_select, batch_format="pandas")


ORDERS_PRICE_MAD_SQL = """
WITH q AS (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
    FROM orders),
r AS (
    SELECT o_orderpriority, v,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY v) - 1 AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM q),
m AS (
    SELECT o_orderpriority,
           CAST(SUM(v * (CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END))
                AS BIGINT) AS med2x
    FROM r WHERE rn = (n - 1) // 2 OR rn = n // 2
    GROUP BY o_orderpriority),
d AS (
    SELECT q.o_orderpriority, ABS(2 * q.v - m.med2x) AS dv
    FROM q JOIN m USING (o_orderpriority)),
r2 AS (
    SELECT o_orderpriority, dv,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY dv) - 1 AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM d)
SELECT o_orderpriority,
       CAST(SUM(dv * (CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END))
            AS BIGINT) AS mad4x_cents,
       CAST(MAX(n) AS BIGINT) AS n_orders
FROM r2 WHERE rn = (n - 1) // 2 OR rn = n // 2
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# filter by a global exact order statistic (two-pass broadcast scalar)
# ---------------------------------------------------------------------------

P95_SHIFT = 14  # value buckets of 2^14 µ-units (~0.016 in value space)


def events_above_p95(sf_dir: str, q_num: int = 95, q_den: int = 100,
                     shift: int = P95_SHIFT):
    """Events strictly above the global exact 95th-percentile value
    (DuckDB ``quantile_disc`` semantics: the order statistic at
    1-based rank ⌈q·n⌉) → (event_type, n_above, p95_v) with values
    integer-quantized at 1e6. Three bounded stages, corpus never
    collected:

    1. one streaming fold → tiny (bucket, n) count table
       (bucket = v >> shift);
    2. driver cumsum locates the bucket holding global rank ⌈q·n⌉;
       ONE filtered re-read of just that bucket's rows (bounded by
       the bucket width) yields the exact scalar;
    3. a streaming filter + per-type count fold emits the result.

    The quantized ``fact`` is deliberately a LAZY view re-derived for
    each of the three stages (3× read+quantize) rather than
    ``materialize()``d once: at 100 TB the materialized fact is
    corpus-sized and would pin the whole table in the object store /
    spill, while the rescans stream at the projected 2-column width
    (the quantize kernel is a vectorized floor-multiply, ~free next
    to the read). At sample scale the 3× re-read is measurable but
    bounded; flipping the trade is one ``.materialize()`` on ``fact``
    if a deployment has object store to spare.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def quantize(batch: pa.Table) -> pa.Table:
        v = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 1e6
                     + 0.5).astype(np.int64)
        return pa.table({
            "event_type": batch.column("event_type"),
            "v": pa.array(v, pa.int64()),
        })

    fact = ds.map_batches(quantize, batch_format="pyarrow",
                          batch_size=65536)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b = batch.column("v").to_numpy() >> shift
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum
    counts = (fact.map_batches(bucket_counts, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n"))
              .to_pandas()
              .sort_values("bucket").reset_index(drop=True))
    n_total = int(counts["n"].sum())
    # 1-based target rank ⌈q·n⌉ in integer arithmetic (no float q)
    rank = -(-q_num * n_total // q_den)
    cum = counts["n"].cumsum().to_numpy()
    bi = int(np.searchsorted(cum, rank))
    b_star = int(counts["bucket"].iloc[bi])
    base = int(cum[bi - 1]) if bi > 0 else 0  # rows in smaller buckets

    # ONE bounded read of the target bucket's values: exact scalar.
    # The bucket predicate recomputes v >> shift in NUMPY (the same
    # arithmetic-shift semantics bucket_counts used — never mix in a
    # second shift implementation for signed values).
    def _in_bucket(b: pa.Table) -> pa.Table:
        keep = (b.column("v").to_numpy() >> shift) == b_star
        return b.filter(pa.array(keep))

    in_bucket = (fact.map_batches(
        _in_bucket, batch_format="pyarrow").to_pandas())
    vals = np.sort(in_bucket["v"].to_numpy(np.int64))
    p95_v = int(vals[rank - base - 1])

    out = (fact.map_batches(
        lambda b: b.filter(pc.greater(b.column("v"), p95_v)),
        batch_format="pyarrow")
        .groupby("event_type").aggregate(Count(alias_name="n_above")))
    return out.map_batches(
        lambda b: b.append_column(
            "p95_v", pa.array(np.full(b.num_rows, p95_v, np.int64))),
        batch_format="pyarrow")


EVENTS_ABOVE_P95_SQL = """
WITH q AS (
    SELECT event_type,
           CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
    FROM events),
p AS (SELECT quantile_disc(v, 0.95) AS p95 FROM q)
SELECT q.event_type, CAST(COUNT(*) AS BIGINT) AS n_above,
       CAST(MAX(p.p95) AS BIGINT) AS p95_v
FROM q, p WHERE q.v > p.p95
GROUP BY q.event_type
"""


# ---------------------------------------------------------------------------
# time-weighted aggregation over irregular series (exact integer form)
# ---------------------------------------------------------------------------

TWA_BUCKETS = 32


def events_time_weighted(sf_dir: str, n_buckets: int = TWA_BUCKETS):
    """Time-weighted value aggregate per user over the IRREGULARLY
    sampled event series — each value is held until the user's next
    event (step interpolation), the standard sensor/price integral →
    (user_id, sum_vdt, sum_dt_ms, n_intervals), where
    ``sum_vdt = Σ v_1e3 · dt_ms`` and the time-weighted average is
    the caller's ratio (kept as an exact integer PAIR — a division
    would be float and unhashable across engines). Users with a
    single event have no interval and are absent (LEAD semantics).

    Deterministic under any partitioning: intervals pair (value,
    dt) in (ts, event_id) order — the tiebreak matters because two
    events at the same timestamp hold for 0 ms in either order but
    would swap which VALUE gets the next interval. dt quantizes at
    ms via integer floor division on both engines; the int64
    headroom is ~1e6 (v) × ~3e9 (ms per month) × events/user — safe
    to ~3e3 intervals/user per 1e15, vs the 9.2e18 limit.

    Shape: user-hash buckets, ONE vectorized numpy pass per bucket
    (sort → within-user diff → reduceat fold), the sessionize
    partitioning contract."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "value"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        t_us = (batch.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))
        v = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 1000.0
                     + 0.5).astype(np.int64)
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t_us": pa.array(t_us, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "event_id": batch.column("event_id"),
        })

    def twa_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.int64, "sum_vdt": np.int64,
                "sum_dt_ms": np.int64, "n_intervals": np.int64}
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        uid = g["user_id"].to_numpy(np.int64)
        t = g["t_us"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, t, uid))
        uid, t, v = uid[order], t[order], v[order]
        same_user = uid[1:] == uid[:-1]
        dt_ms = (t[1:] - t[:-1]) // 1000
        vdt = v[:-1] * dt_ms
        keep = same_user
        if not keep.any():
            return pd.DataFrame({c: pd.Series([], dtype=ty)
                                 for c, ty in cols.items()})
        u_k, dt_k, vdt_k = uid[:-1][keep], dt_ms[keep], vdt[keep]
        starts = np.flatnonzero(np.concatenate(
            [[True], u_k[1:] != u_k[:-1]]))
        return pd.DataFrame({
            "user_id": u_k[starts],
            "sum_vdt": np.add.reduceat(vdt_k, starts),
            "sum_dt_ms": np.add.reduceat(dt_k, starts),
            "n_intervals": np.diff(np.append(starts, len(u_k))),
        })

    return (ds.map_batches(tag, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(twa_bucket,
                                       batch_format="pandas"))


EVENTS_TIME_WEIGHTED_SQL = """
WITH q AS (
    SELECT user_id, epoch_us(ts) AS t,
           CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT) AS v,
           event_id
    FROM events),
w AS (
    SELECT user_id, v,
           (LEAD(t) OVER (PARTITION BY user_id
                          ORDER BY t, event_id) - t) // 1000 AS dt_ms
    FROM q)
SELECT user_id, CAST(SUM(v * dt_ms) AS BIGINT) AS sum_vdt,
       CAST(SUM(dt_ms) AS BIGINT) AS sum_dt_ms,
       CAST(COUNT(dt_ms) AS BIGINT) AS n_intervals
FROM w WHERE dt_ms IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# period-over-period delta (LAG over an aggregated series)
# ---------------------------------------------------------------------------


def orders_monthly_delta(sf_dir: str):
    """Monthly revenue with the previous month's delta — the
    period-over-period reporting shape → (month, cents, delta_cents,
    n_orders) with month as 'YYYY-MM'. One corpus pass folds
    per-batch (month, cents, n) partials into an O(months) aggregate;
    the LAG runs on that tiny series (months are bounded by calendar
    time, never by data volume — missing months yield NULL deltas,
    exactly LAG's semantics, not zero-fill)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]")
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "month": np.datetime_as_string(d, unit="M"),
            "cents": cents})
        g = df.groupby("month", as_index=False) \
            .agg(cents=("cents", "sum"), n_orders=("cents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("month")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_orders", alias_name="n_orders"))
           .to_pandas())  # O(months) rows — calendar-bounded
    agg = agg.sort_values("month").reset_index(drop=True)
    prev = agg["cents"].shift(1)
    # LAG over consecutive SERIES rows only when months are adjacent
    m = pd.PeriodIndex(agg["month"], freq="M")
    ordinals = np.asarray(m.year) * 12 + np.asarray(m.month)
    adjacent = np.concatenate(
        [[False], np.diff(ordinals) == 1]) \
        if len(agg) > 1 else np.zeros(len(agg), dtype=bool)
    delta = np.where(adjacent, agg["cents"] - prev.fillna(0), np.nan)
    out = pa.table({
        "month": pa.array(agg["month"], pa.string()),
        "cents": pa.array(agg["cents"].astype(np.int64)),
        "delta_cents": pa.array(
            pd.array(delta).astype("Int64"), pa.int64()),
        "n_orders": pa.array(agg["n_orders"].astype(np.int64)),
    })
    import ray.data as _rd
    return _rd.from_arrow(out)


ORDERS_MONTHLY_DELTA_SQL = """
WITH m AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1)
SELECT month, cents,
       CAST(CASE WHEN (CAST(month[1:4] AS INT) * 12
                       + CAST(month[6:7] AS INT))
                    - (CAST((LAG(month) OVER w)[1:4] AS INT) * 12
                       + CAST((LAG(month) OVER w)[6:7] AS INT)) = 1
                 THEN cents - LAG(cents) OVER w END AS BIGINT)
           AS delta_cents,
       n_orders
FROM m WINDOW w AS (ORDER BY month)
"""


# ---------------------------------------------------------------------------
# time-RANGE-frame rolling window (value-based frame, no tiebreaks)
# ---------------------------------------------------------------------------

ROLLING_WINDOW_US = 3_600_000_000  # 1 hour


def events_user_rolling_time(sf_dir: str,
                             window_us: int = ROLLING_WINDOW_US,
                             n_buckets: int = TWA_BUCKETS):
    """Per-user rolling sum/count over a TIME window — the RANGE
    frame (``RANGE BETWEEN <interval> PRECEDING AND 1 PRECEDING``),
    distinct from the ROWS frame of ``events_user_rolling``: the
    frame is [t − W, t) in µs, so peer rows at the same timestamp
    are all excluded and the result needs NO tiebreak to be
    deterministic (value-based frames see sets, not orders) →
    (event_id, sum_win, n_win) with values quantized at 1e3.

    Shape: user-hash buckets; per user ONE prefix-sum array and two
    vectorized ``searchsorted`` probes per event — O(events log
    events-per-user) per bucket, exact integers throughout."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "value"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        t_us = (batch.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))
        v = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 1000.0
                     + 0.5).astype(np.int64)
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t_us": pa.array(t_us, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "event_id": batch.column("event_id"),
        })

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": np.int64, "sum_win": np.int64,
                "n_win": np.int64}
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        uid = g["user_id"].to_numpy(np.int64)
        t = g["t_us"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((t, uid))
        uid, t, v, eid = uid[order], t[order], v[order], eid[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], uid[1:] != uid[:-1]]))
        ends = np.append(starts[1:], len(uid))
        sum_win = np.empty(len(uid), np.int64)
        n_win = np.empty(len(uid), np.int64)
        for s, e in zip(starts, ends):
            seg_t, seg_v = t[s:e], v[s:e]
            pref = np.concatenate([[0], np.cumsum(seg_v)])
            lo = np.searchsorted(seg_t, seg_t - window_us, "left")
            hi = np.searchsorted(seg_t, seg_t, "left")
            sum_win[s:e] = pref[hi] - pref[lo]
            n_win[s:e] = hi - lo
        return pd.DataFrame({
            "event_id": eid, "sum_win": sum_win, "n_win": n_win})

    return (ds.map_batches(tag, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(roll_bucket,
                                       batch_format="pandas"))


EVENTS_USER_ROLLING_TIME_SQL = f"""
WITH q AS (
    SELECT event_id, user_id, epoch_us(ts) AS t,
           CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT) AS v
    FROM events)
SELECT event_id,
       CAST(COALESCE(SUM(v) OVER w, 0) AS BIGINT) AS sum_win,
       CAST(COUNT(v) OVER w AS BIGINT) AS n_win
FROM q
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN {ROLLING_WINDOW_US} PRECEDING
                   AND 1 PRECEDING)
"""


# ---------------------------------------------------------------------------
# per-group deterministic reservoir (k smallest hashes per group)
# ---------------------------------------------------------------------------

GROUP_SAMPLE_K = 20


def docs_lang_sample(sf_dir: str, k: int = GROUP_SAMPLE_K):
    """Deterministic fixed-size sample WITHOUT replacement per group:
    the ``k`` docs with the smallest md5 per lang → (lang, doc_id).
    The hash order is a uniform random order that every engine and
    every run agrees on — a reservoir sample with none of the
    coordination a streaming reservoir needs. Per-batch partial top-k
    caps the exchange at O(groups × k × blocks); the per-group final
    re-sorts ≤ k × blocks rows."""
    import ray.data as rd

    def partial_topk(batch: pa.Table) -> pa.Table:
        from ..functions.md5keys import md5_hex_bucket
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h_arr, _ = md5_hex_bucket(ids)
        h = np.asarray(h_arr.to_pylist(), dtype=object)
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "doc_id": ids, "h": h})
        df = df.sort_values(["lang", "h", "doc_id"],
                            kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).head(k),
            preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort").head(k)
        return g[["lang", "doc_id"]]

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
            .map_batches(partial_topk, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("lang")
            .map_groups(final_topk, batch_format="pandas"))


DOCS_LANG_SAMPLE_SQL = f"""
SELECT lang, doc_id
FROM (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents)
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        <= {GROUP_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# deterministic epoch shuffle (global permutation → shard assignment)
# ---------------------------------------------------------------------------

EPOCH_SEED = 42
N_EPOCH_SHARDS = 8


def corpus_epoch_shuffle(sf_dir: str, seed: int = EPOCH_SEED,
                         n_shards: int = N_EPOCH_SHARDS):
    """Deterministic epoch shuffle: a global pseudo-random permutation
    of the corpus and its round-robin shard assignment →
    (doc_id, shard, pos) where ``pos`` is the doc's position within
    its shard. The permutation key is ``md5(doc_id || ':' || seed)``
    — a new seed is a new epoch, reproducible on any engine and any
    cluster size (the property per-task RNGs can't give you).

    Same fact-size-independent machinery as ``orders_price_rank``:
    the first hex byte of the key is the value bucket (256 of them,
    uniform by construction — no skew possible), a tiny count fold +
    driver prefix sum yields each bucket's global offset, and one
    co-location exchange sorts each bucket locally to emit exact
    global positions. The corpus never collects anywhere."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def keyed(batch: pa.Table) -> pa.Table:
        from ..functions.md5keys import md5_hex_bucket
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h, bucket = md5_hex_bucket(ids, suffix=f":{int(seed)}")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "h": h,
            "bucket": pa.array(bucket, pa.int64()),
        })

    fact = ds.map_batches(keyed, batch_format="pyarrow",
                          batch_size=65536)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        ub, cnt = np.unique(batch.column("bucket").to_numpy(),
                            return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (fact.map_batches(bucket_counts, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("bucket")
              .reset_index(drop=True))
    n_arr = counts["n"].to_numpy(np.int64)
    base = np.cumsum(n_arr) - n_arr
    base_map = dict(zip(counts["bucket"].astype(int), base.tolist()))
    base_ref = ray.put(base_map)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        base_l = cached_get(base_ref)
        off = base_l[int(g["bucket"].iloc[0])]
        order = np.argsort(g["h"].to_numpy(), kind="stable")
        rn = np.empty(len(order), np.int64)
        rn[order] = off + np.arange(len(order), dtype=np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "shard": rn % n_shards,
            "pos": rn // n_shards,
        })

    return fact.groupby("bucket").map_groups(
        assign, batch_format="pandas")


CORPUS_EPOCH_SHUFFLE_SQL = f"""
WITH k AS (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR) || ':{EPOCH_SEED}') AS h
    FROM documents),
r AS (
    SELECT doc_id, row_number() OVER (ORDER BY h) - 1 AS rn FROM k)
SELECT doc_id, CAST(rn % {N_EPOCH_SHARDS} AS BIGINT) AS shard,
       CAST(rn // {N_EPOCH_SHARDS} AS BIGINT) AS pos
FROM r
"""


# ---------------------------------------------------------------------------
# context-window chunking (long-doc splitting with overlap)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 128
CHUNK_STRIDE = 96


def docs_chunk_overlap(sf_dir: str, size: int = CHUNK_SIZE,
                       stride: int = CHUNK_STRIDE):
    """Context-window chunk plan: each doc splits into token windows
    of ``size`` advancing by ``stride`` (overlap = size − stride) →
    (doc_id, chunk_idx, tok_start, tok_end). The ~n/stride× row
    explosion is pure per-batch numpy (repeat + arange), zero
    exchange; token counts are the ``token_stats`` whitespace kernel
    (so chunk boundaries agree with every other token-based op).
    Empty docs produce no chunks; the tail window clips to the doc
    length."""
    import ray.data as rd

    def chunk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["text"].fillna("").str.count(r"\S+") \
            .to_numpy(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        k = (n + stride - 1) // stride          # 0 chunks for n == 0
        total = int(k.sum())
        rep_ids = np.repeat(ids, k)
        starts_of = np.concatenate([[0], np.cumsum(k)[:-1]])
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts_of, k)
        tok_start = idx * stride
        tok_end = np.minimum(tok_start + size, np.repeat(n, k))
        return pa.table({
            "doc_id": pa.array(rep_ids, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "tok_end": pa.array(tok_end, pa.int64()),
        })

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(chunk, batch_format="pyarrow",
                         batch_size=8192))


DOCS_CHUNK_OVERLAP_SQL = rf"""
WITH t AS (
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n
    FROM documents)
SELECT doc_id, CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS tok_start,
       CAST(LEAST(s + {CHUNK_SIZE}, n) AS BIGINT) AS tok_end
FROM t, UNNEST(range(0, n, {CHUNK_STRIDE})) AS u(s)
"""
