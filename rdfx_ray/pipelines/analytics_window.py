"""Window-family operators the round-3 surface still lacked: fixed-width
histogram (width_bucket), moving-window aggregates over a bounded time
grid, latest-row-per-key (DISTINCT ON / argmax), and sufficient-statistic
moments (the distributed building block for variance/correlation).

Each follows the house rules: predicate/column-pruned reads, per-batch
partial aggregation before any exchange, integer-scaled money/values so
the DuckDB oracle hash-matches exactly, deterministic tiebreaks, and the
bucketed map_groups pattern (never per-singleton-group pandas calls —
the measured ~ms/group trap in CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def events_value_histogram(sf_dir: str, width: float = 50.0):
    """Fixed-width histogram of ``value`` per event type — the
    width_bucket shape → (event_type, bucket, n, sum_value_1e2).

    One streaming pass: the bucket id ``floor(value / width)`` and the
    integer-quantized value are vectorized per batch, partial
    (type, bucket) counts/sums fold locally, and the only exchange is
    the tiny ``groupby`` over O(types × buckets) keys. ``value / width``
    is a single IEEE-754 division on both engines, so bucket edges are
    bit-identical; sums quantize each value THEN sum (lossless integer
    folds — the embedding_label_centroids rule)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        bucket = np.floor(v / width).astype(np.int64)
        q = np.floor(v * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"event_type": batch.column("event_type")
                           .to_pandas(), "bucket": bucket, "q": q})
        g = df.groupby(["event_type", "bucket"], as_index=False).agg(
            n=("q", "size"), sum_value_1e2=("q", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["event_type", "bucket", "n", "sum_value_1e2"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["event_type", "bucket"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_value_1e2", alias_name="sum_value_1e2"))
            .map_batches(rename, batch_format="pyarrow"))


EVENTS_VALUE_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_1e2
FROM events
GROUP BY event_type, CAST(FLOOR(value / 50.0) AS BIGINT)
"""


def orders_daily_moving(sf_dir: str, window_days: int = 7):
    """Daily order revenue with a trailing ``window_days``-row moving
    window — the ROWS BETWEEN N PRECEDING frame →
    (day_us, n_orders, revenue_cents, win_revenue_cents, win_days).

    Two stages with very different cardinalities: the O(rows) work is a
    partial-aggregated daily rollup (per-batch (day, count, cents)
    fold, then one small groupby — days are the grid, bounded by the
    calendar: ~2.4k for this corpus, ≤ a few 10⁵ for decades of
    seconds-resolution feeds). The window fold then runs over the
    O(days) grid on the driver via two cumsum differences — scale-safe
    because the grid, not the row count, bounds it; a 100 TB order
    stream still has the same number of days. Day keys are emitted as
    epoch-µs BIGINT (timestamps never hash-match across engines)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").to_numpy() \
            .astype("datetime64[D]").astype("datetime64[us]") \
            .astype(np.int64)
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({"day_us": ts, "cents": cents})
        g = df.groupby("day_us", as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("day_us")
             .aggregate(Sum("n_orders", alias_name="n_orders"),
                        Sum("revenue_cents", alias_name="revenue_cents"))
             .to_pandas())
    daily = daily.sort_values("day_us", kind="mergesort") \
        .reset_index(drop=True)
    rev = daily["revenue_cents"].to_numpy(np.int64)
    # trailing window sum over the day grid: cumsum difference (exact
    # integer arithmetic, no float accumulation)
    cs = np.concatenate([[0], np.cumsum(rev)])
    n = len(rev)
    lo = np.maximum(np.arange(n) - (window_days - 1), 0)
    win = cs[np.arange(n) + 1] - cs[lo]
    win_days = np.arange(n) - lo + 1
    out = pa.table({
        "day_us": pa.array(daily["day_us"].to_numpy(np.int64)),
        "n_orders": pa.array(daily["n_orders"].to_numpy(np.int64)),
        "revenue_cents": pa.array(rev),
        "win_revenue_cents": pa.array(win.astype(np.int64)),
        "win_days": pa.array(win_days.astype(np.int64)),
    })
    return out


ORDERS_DAILY_MOVING_SQL = """
WITH d AS (
    SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders GROUP BY 1)
SELECT day_us, n_orders, revenue_cents,
       CAST(SUM(revenue_cents) OVER (
            ORDER BY day_us
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS win_revenue_cents,
       CAST(COUNT(*) OVER (
            ORDER BY day_us
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS win_days
FROM d
"""


def _last_per_user(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized argmax fold: keep each user's row with the largest
    (ts_us, event_id) — one lexsort + last-occurrence mask, no
    per-user pandas calls."""
    if len(df) == 0:
        return df
    order = np.lexsort((df["last_event_id"].to_numpy(),
                        df["last_ts_us"].to_numpy(),
                        df["user_id"].to_numpy()))
    s = df.iloc[order]
    uid = s["user_id"].to_numpy()
    is_last = np.concatenate([uid[1:] != uid[:-1], [True]])
    return s[is_last]


def events_latest_per_user(sf_dir: str, n_buckets: int = 32):
    """Latest event per user — the DISTINCT ON / argmax-per-key shape
    → (user_id, last_ts_us, last_event_id, last_event_type).

    Per-batch partial argmax (one lexsort, keep last row per user)
    caps the exchange at O(users × blocks) rows; the final fold hashes
    users into ``n_buckets`` groups and repeats the same vectorized
    reduction per BUCKET — #bucket group calls total, never the
    per-singleton-group pandas trap. Ties on ts break by event_id, so
    the selected row is deterministic across engines (DuckDB
    ``row_number() OVER (... ORDER BY ts DESC, event_id DESC) = 1``)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(
                zero_copy_only=False),
            "last_ts_us": ts_us,
            "last_event_id": batch.column("event_id").to_numpy(
                zero_copy_only=False),
            "last_event_type": batch.column("event_type").to_pandas(),
        })
        out = _last_per_user(df)
        out = out.assign(_jb=(out["user_id"].to_numpy(np.int64)
                              % n_buckets).astype(np.int32))
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        return _last_per_user(g).drop(columns=["_jb"]).astype(
            {"user_id": np.int64, "last_ts_us": np.int64,
             "last_event_id": np.int64})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(bucket_fold,
                                       batch_format="pandas"))


EVENTS_LATEST_PER_USER_SQL = """
SELECT user_id, epoch_us(ts) AS last_ts_us,
       event_id AS last_event_id, event_type AS last_event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def events_value_moments(sf_dir: str):
    """Sufficient statistics of ``value`` per event type →
    (event_type, n, sum_v_1e2, sum_v2_1e4, min_v_1e2, max_v_1e2) —
    the mergeable building block for mean/variance/z-scores (and,
    joined pairwise, correlation) that stays EXACT under any fold
    order, unlike streaming float variance.

    Values quantize to int (×100) per batch; sums and sums-of-squares
    fold as integers. Headroom: q ≤ 10⁵ here → q² ≤ 10¹⁰, so int64
    partial sums hold to ~10⁸ rows per (type, batch-fold path) — 10⁴×
    this corpus; beyond that the quantization scale is the knob (the
    oracle pins the contract, not the scale). One tiny groupby over
    O(types) keys is the only exchange."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        q = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 100.0
                     + 0.5).astype(np.int64)
        df = pd.DataFrame({"event_type": batch.column("event_type")
                           .to_pandas(), "q": q, "q2": q * q})
        g = df.groupby("event_type", as_index=False).agg(
            n=("q", "size"), sum_v_1e2=("q", "sum"),
            sum_v2_1e4=("q2", "sum"), min_v_1e2=("q", "min"),
            max_v_1e2=("q", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["event_type", "n", "sum_v_1e2",
                                 "sum_v2_1e4", "min_v_1e2",
                                 "max_v_1e2"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_v_1e2", alias_name="sum_v_1e2"),
                       Sum("sum_v2_1e4", alias_name="sum_v2_1e4"),
                       Min("min_v_1e2", alias_name="min_v_1e2"),
                       Max("max_v_1e2", alias_name="max_v_1e2"))
            .map_batches(rename, batch_format="pyarrow"))


EVENTS_VALUE_MOMENTS_SQL = """
WITH q AS (
    SELECT event_type,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS q
    FROM events)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_v_1e2,
       CAST(SUM(q * q) AS BIGINT) AS sum_v2_1e4,
       CAST(MIN(q) AS BIGINT) AS min_v_1e2,
       CAST(MAX(q) AS BIGINT) AS max_v_1e2
FROM q GROUP BY event_type
"""


def lineitem_comoments(sf_dir: str):
    """Pairwise co-moments of (l_quantity, l_discount) per return flag
    → (l_returnflag, n, sum_q_1e2, sum_d_1e4, sum_q2_1e4, sum_d2_1e8,
    sum_qd_1e6) — the mergeable sufficient statistics for covariance /
    Pearson correlation, exact under any fold order.

    Quantization headroom: q = qty×100 ≤ 5,000 and d = disc×10,000
    ≤ 1,000 here, so the largest per-row term (q² ≤ 2.5×10⁷) keeps
    int64 partial sums exact to ~3×10¹¹ rows per group — far past any
    realistic lineitem shard; the scale factors are the knob beyond
    that. The only exchange is a groupby over O(flags) keys."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        q = np.floor(batch.column("l_quantity")
                     .to_numpy(zero_copy_only=False) * 100.0
                     + 0.5).astype(np.int64)
        d = np.floor(batch.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 10000.0
                     + 0.5).astype(np.int64)
        df = pd.DataFrame({"l_returnflag": batch.column("l_returnflag")
                           .to_pandas(), "q": q, "d": d,
                           "q2": q * q, "d2": d * d, "qd": q * d})
        g = df.groupby("l_returnflag", as_index=False).agg(
            n=("q", "size"), sum_q_1e2=("q", "sum"),
            sum_d_1e4=("d", "sum"), sum_q2_1e4=("q2", "sum"),
            sum_d2_1e8=("d2", "sum"), sum_qd_1e6=("qd", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cols = ["l_returnflag", "n", "sum_q_1e2", "sum_d_1e4",
            "sum_q2_1e4", "sum_d2_1e8", "sum_qd_1e6"]

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(cols)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("l_returnflag")
            .aggregate(*[Sum(c, alias_name=c) for c in cols[1:]])
            .map_batches(rename, batch_format="pyarrow"))


LINEITEM_COMOMENTS_SQL = """
WITH q AS (
    SELECT l_returnflag,
           CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS q,
           CAST(FLOOR(l_discount * 10000.0 + 0.5) AS BIGINT) AS d
    FROM lineitem)
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_q_1e2,
       CAST(SUM(d) AS BIGINT) AS sum_d_1e4,
       CAST(SUM(q * q) AS BIGINT) AS sum_q2_1e4,
       CAST(SUM(d * d) AS BIGINT) AS sum_d2_1e8,
       CAST(SUM(q * d) AS BIGINT) AS sum_qd_1e6
FROM q GROUP BY l_returnflag
"""


def events_user_rolling(sf_dir: str, frame: int = 3,
                        n_buckets: int = 32):
    """Per-KEY row-frame window: for each event, the sum of the SAME
    user's previous ``frame`` event values (ROWS BETWEEN 3 PRECEDING
    AND 1 PRECEDING, partitioned by user, ordered by (ts, event_id))
    → (event_id, user_id, prev3_sum_1e2, n_prev).

    The sessionize partitioning applies: users hash into buckets,
    each bucket runs ONE vectorized pass — lexsort by (user, ts,
    event_id), per-user segment boundaries via flag cumsum, frame
    sums as two cumsum gathers clipped at segment starts. Exact
    integer arithmetic (values quantized ×100 before the fold); the
    event_id tiebreak makes equal-timestamp order engine-identical."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "value"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = (batch.column("ts").to_numpy()
                 .astype("datetime64[us]").astype(np.int64))
        q = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32),
                            pa.int32()),
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "event_id": batch.column("event_id"),
            "q": pa.array(q, pa.int64())})

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, q = uid[order], ts[order], eid[order], q[order]
        n = len(uid)
        # segment start index of each row's user run
        new_seg = np.concatenate([[True], uid[1:] != uid[:-1]])
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), -1))
        pos = np.arange(n)
        lo = np.maximum(pos - frame, seg_start)  # frame clipped to segment
        cs = np.concatenate([[0], np.cumsum(q)])
        prev_sum = cs[pos] - cs[lo]              # rows [lo, pos)
        n_prev = pos - lo
        return pd.DataFrame({
            "event_id": eid, "user_id": uid,
            "prev3_sum_1e2": prev_sum.astype(np.int64),
            "n_prev": n_prev.astype(np.int64)})

    return (ds.map_batches(tag, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(roll_bucket,
                                       batch_format="pandas"))


EVENTS_USER_ROLLING_SQL = """
WITH q AS (
    SELECT event_id, user_id, ts,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
    FROM events)
SELECT event_id, user_id,
       CAST(COALESCE(SUM(v) OVER w, 0) AS BIGINT) AS prev3_sum_1e2,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_prev
FROM q
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
"""


def events_props_k_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the
    JSON ``props`` column and aggregate per event type →
    (event_type, n_with_k, sum_k, min_k, max_k). The extraction is
    one vectorized RE2 ``extract_regex`` per batch — the same engine
    DuckDB's ``regexp_extract`` uses, so both sides parse identically
    (the filter_regex_bgp discipline applied to JSON-ish payloads;
    rows without a ``k`` drop out on both sides). Stats fold as
    integers through one O(types) groupby."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch.column("props"),
                               pattern=r'"k": (?P<k>\d+)')
        valid = pc.is_valid(ext)
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "k": k.to_pandas()})
        df = df[valid.to_pandas().to_numpy()]
        g = df.groupby("event_type", as_index=False).agg(
            n_with_k=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cols = ["event_type", "n_with_k", "sum_k", "min_k", "max_k"]
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("event_type")
            .aggregate(Sum("n_with_k", alias_name="n_with_k"),
                       Sum("sum_k", alias_name="sum_k"),
                       Min("min_k", alias_name="min_k"),
                       Max("max_k", alias_name="max_k"))
            .map_batches(lambda b: b.select(cols),
                         batch_format="pyarrow"))


EVENTS_PROPS_K_STATS_SQL = """
WITH e AS (
    SELECT event_type,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) != '')
SELECT event_type, COUNT(*) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM e GROUP BY event_type
"""


def events_type_transitions(sf_dir: str, n_buckets: int = 32):
    """Event-sequence transition counts: for each user's events in
    (ts, event_id) order, count (previous type → type) pairs →
    (from_type, to_type, n) — the Markov-transition feature a
    sequence model trains on, and the LAG window applied to a
    categorical column. Same bucketed one-pass shape as
    events_user_rolling: lexsort per bucket, shift-compare within
    user segments, vectorized pair counting."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = (batch.column("ts").to_numpy()
                 .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32),
                            pa.int32()),
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type")})

    def trans_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        same_user = uid[1:] == uid[:-1]
        df = pd.DataFrame({"from_type": et[:-1][same_user],
                           "to_type": et[1:][same_user]})
        out = df.groupby(["from_type", "to_type"],
                         as_index=False).size() \
            .rename(columns={"size": "n"})
        return out

    return (ds.map_batches(tag, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(trans_bucket,
                                       batch_format="pandas")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n")))


EVENTS_TYPE_TRANSITIONS_SQL = """
WITH s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events)
SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def events_hourly_active_users(sf_dir: str):
    """COUNT(DISTINCT) inside a time window — hourly active users →
    (hour_us, n_users). The distinct rides the engine's two-stage
    discipline: batch-local (hour, user) unique first (so the distinct
    shuffle carries at most one row per (batch, hour, user)), then the
    distinct groupby, then an O(hours) count fold. Hour keys emit as
    epoch-µs BIGINT (the timestamp hash rule)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        hour = (batch.column("ts").to_numpy()
                .astype("datetime64[h]").astype("datetime64[us]")
                .astype(np.int64))
        t = pa.table({
            "hour_us": pa.array(hour, pa.int64()),
            "user_id": pa.array(batch.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64), pa.int64())})
        return pl.from_arrow(t).unique().to_arrow().cast(t.schema)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["hour_us", "user_id"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["hour_us", "user_id"])
            .groupby("hour_us")
            .aggregate(Count(alias_name="n_users")))


EVENTS_HOURLY_ACTIVE_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def events_streaming_tumbling(sf_dir: str, window_min: int = 60,
                              lateness_min: int = 30,
                              n_buckets: int = 32):
    """Streaming tumbling windows with a per-key WATERMARK and allowed
    lateness — the out-of-order/late-data semantics of a streaming
    engine, replayed deterministically so the result is exact and
    SQL-oracle-able → (window_us, n_accepted, sum_value_1e2,
    n_dropped).

    Arrival order is pinned to the deterministic hash permutation
    ``(event_id · 2654435761) mod 2³¹`` (ties broken by event_id) —
    NOT time order, so genuinely late data exists; both engines
    compute the identical permutation. Each user's watermark
    is the running max event time over its arrivals; an event whose
    timestamp lags its key's watermark by more than ``lateness_min``
    is DROPPED, exactly as a streaming runtime would after window
    finalization. Accepted events fold into tumbling windows.

    The watermark is per KEY, so the bucket count stays an execution
    knob (a partition-global watermark would change semantics with
    B). Per bucket one vectorized pass: lexsort by (user, event_id),
    per-segment running max via np.maximum.accumulate, mask, window
    ids, local fold; the only exchange is the O(windows) groupby.
    At true streaming scale the same kernel runs inside a stateful
    actor pool keyed by the same hash, carrying (key → watermark)
    between micro-batches — the replay here pins the semantics that
    actor must reproduce."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    win_us = np.int64(window_min * 60_000_000)
    late_us = np.int64(lateness_min * 60_000_000)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "value"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = (batch.column("ts").to_numpy()
                 .astype("datetime64[us]").astype(np.int64))
        q = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({
            "_jb": pa.array((uid % n_buckets).astype(np.int32),
                            pa.int32()),
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "event_id": batch.column("event_id"),
            "ts_us": pa.array(ts_us, pa.int64()),
            "q": pa.array(q, pa.int64())})

    def replay_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        # per-user arrival order: deterministic hash permutation
        arr = (eid * np.int64(2654435761)) % np.int64(1 << 31)
        order = np.lexsort((eid, arr, uid))
        uid, ts, q = uid[order], ts[order], q[order]
        # per-user running max of ts (the key's watermark) — pandas
        # groupby cummax is C-level and segment-count-safe
        wm = pd.Series(ts).groupby(uid).cummax().to_numpy(np.int64)
        accepted = ts >= wm - late_us
        w = (ts[accepted] // win_us) * win_us
        df = pd.DataFrame({"window_us": w, "q": q[accepted]})
        out = df.groupby("window_us", as_index=False).agg(
            n_accepted=("q", "size"), sum_value_1e2=("q", "sum"))
        out["n_dropped"] = np.int64(0)
        # drop accounting rides a sentinel window row (window_us=-1)
        # so the global fold sums bucket drop counts exactly once
        drops = pd.DataFrame({"window_us": [np.int64(-1)],
                              "n_accepted": [np.int64(0)],
                              "sum_value_1e2": [np.int64(0)],
                              "n_dropped":
                              [np.int64((~accepted).sum())]})
        return pd.concat([out, drops], ignore_index=True)

    return (ds.map_batches(tag, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(replay_bucket,
                                       batch_format="pandas")
            .groupby("window_us")
            .aggregate(Sum("n_accepted", alias_name="n_accepted"),
                       Sum("sum_value_1e2",
                           alias_name="sum_value_1e2"),
                       Sum("n_dropped", alias_name="n_dropped")))


EVENTS_STREAMING_TUMBLING_SQL = """
WITH a AS (
    SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS q,
           MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY (event_id * 2654435761) % 2147483648,
                        event_id) AS wm
    FROM events)
SELECT (ts_us // 3600000000) * 3600000000 AS window_us,
       COUNT(*) AS n_accepted,
       CAST(SUM(q) AS BIGINT) AS sum_value_1e2,
       CAST(0 AS BIGINT) AS n_dropped
FROM a WHERE ts_us >= wm - 1800000000
GROUP BY 1
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       COUNT(*)
FROM a WHERE ts_us < wm - 1800000000
"""


def events_resample_15min(sf_dir: str):
    """Time-series resample with gap fill: event counts on the full
    15-minute grid from the corpus's first to last bucket, zero rows
    INCLUDED, per event type → (grid_us, event_type, n). The O(rows)
    work is the usual per-batch partial count fold; the dense grid is
    an O(grid × types) driver expansion — bounded by the calendar and
    the type domain, not the row count (the orders_daily_moving
    argument), left-joined against the sparse counts with exact
    integer keys."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    step = np.int64(15 * 60_000_000)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        g_us = (batch.column("ts").to_numpy()
                .astype("datetime64[us]").astype(np.int64)
                // step) * step
        df = pd.DataFrame({"grid_us": g_us,
                           "event_type": batch.column("event_type")
                           .to_pandas()})
        out = df.groupby(["grid_us", "event_type"],
                         as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(out, preserve_index=False)

    sparse = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby(["grid_us", "event_type"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    lo, hi = sparse["grid_us"].min(), sparse["grid_us"].max()
    grid = np.arange(lo, hi + step, step, dtype=np.int64)
    types = np.sort(sparse["event_type"].unique())
    dense = pd.DataFrame({
        "grid_us": np.repeat(grid, len(types)),
        "event_type": np.tile(types, len(grid))})
    out = dense.merge(sparse, on=["grid_us", "event_type"],
                      how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EVENTS_RESAMPLE_SQL = """
WITH c AS (
    SELECT (epoch_us(ts) // 900000000) * 900000000 AS grid_us,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2),
grid AS (
    SELECT UNNEST(generate_series((SELECT MIN(grid_us) FROM c),
                                  (SELECT MAX(grid_us) FROM c),
                                  900000000)) AS grid_us),
types AS (SELECT DISTINCT event_type FROM events)
SELECT g.grid_us, t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM grid g CROSS JOIN types t
LEFT JOIN c ON c.grid_us = g.grid_us AND c.event_type = t.event_type
"""
