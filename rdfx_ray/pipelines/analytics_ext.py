"""Additional oracled wide operations: top-k, exact distinct-count,
filtered (predicate-pushdown) aggregation, dimension join, multi-key
stats — each with the partial-pre-aggregation discipline of
:mod:`rdfx_ray.pipelines.analytics` (integer-scaled monetary sums so
the DuckDB oracle hash-matches exactly; deterministic tiebreaks so
LIMIT yields the same row SET on both engines)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def events_topk_users(sf_dir: str, k: int = 20):
    """Top-k users by event count. Per-batch partial counts make the
    shuffle carry one row per (batch, user); the sort input is the
    post-aggregate table (n_users rows), and the tiebreak on user_id
    makes the top-k SET deterministic across engines."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.to_pandas().groupby("user_id", as_index=False)
              .size().rename(columns={"size": "n_events"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("user_id").aggregate(Sum("n_events",
                                              alias_name="n_events"))
            .sort(["n_events", "user_id"], descending=[True, False])
            .limit(k))


EVENTS_TOPK_USERS_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 20
"""


def events_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type, as two stacked
    aggregations: batch-local distinct → groupby(type, user) — the
    distinct shuffle — → groupby(type) count. (The groupby-aggregate
    form, not map_groups: distinct groups are mostly singletons.)"""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def local_distinct(batch: pa.Table) -> pa.Table:
        import polars as pl
        return (pl.from_arrow(batch).unique()
                .to_arrow().cast(batch.schema))

    return (ds.map_batches(local_distinct, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["event_type", "user_id"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["event_type", "user_id"])
            .groupby("event_type")
            .aggregate(Count(alias_name="n_users")))


EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def docs_lang_source_stats(sf_dir: str):
    """Document counts + total characters per (lang, source) — the
    two-key grouped profile a corpus-curation pipeline reports."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["sum_chars"] = g["sum_chars"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["lang", "source"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars")))


DOCS_LANG_SOURCE_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang, source
"""


def supplier_balance_by_nation(sf_dir: str):
    """supplier ⋈ nation → account-balance sum per nation name: the
    broadcast dimension join (nation is tiny) with integer-scaled
    money."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    dim_ref = ray.put(nation)

    ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_nationkey", "s_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.merge(cached_get(dim_ref), left_on="s_nationkey",
                      right_on="n_nationkey")
        bal_c = np.floor(df["s_acctbal"].to_numpy() * 100 + 0.5
                         ).astype(np.int64)
        g = (pd.DataFrame({"n_name": df["n_name"], "bal_c": bal_c,
                           "one": np.ones(len(df), dtype=np.int64)})
             .groupby("n_name", as_index=False)
             .agg(sum_acctbal_c=("bal_c", "sum"),
                  n_suppliers=("one", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("n_name")
            .aggregate(Sum("sum_acctbal_c", alias_name="sum_acctbal_c"),
                       Sum("n_suppliers", alias_name="n_suppliers")))


SUPPLIER_BALANCE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_acctbal_c,
       COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def orders_priority_filter(sf_dir: str):
    """Counts + total price per priority for finished orders — the
    filter is a pyarrow expression passed to ``read_parquet`` so it
    pushes into the scan (row groups whose stats exclude 'F' never
    leave storage)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
        filter=(pc.field("o_orderstatus") == "F"),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        price_c = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5
                           ).astype(np.int64)
        g = (pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                           "price_c": price_c,
                           "one": np.ones(len(df), dtype=np.int64)})
             .groupby("o_orderpriority", as_index=False)
             .agg(sum_price_c=("price_c", "sum"), n_orders=("one", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("o_orderpriority")
            .aggregate(Sum("sum_price_c", alias_name="sum_price_c"),
                       Sum("n_orders", alias_name="n_orders")))


ORDERS_PRIORITY_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_c,
       COUNT(*) AS n_orders
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


def events_hopping_windows(sf_dir: str, size_hours: int = 2,
                           hop_hours: int = 1):
    """Hopping (sliding) window aggregate: size 2h, hop 1h → every
    event contributes to size/hop windows. The window expansion is a
    vectorized per-batch replication (concat of hop-shifted copies)
    BEFORE the partial aggregation, so the shuffle still carries one
    row per (batch, type, window). window_start is emitted as BIGINT
    epoch-µs (the cross-engine-stable timestamp form)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    assert size_hours % hop_hours == 0
    k = size_hours // hop_hours
    hop_us = np.int64(hop_hours) * 3_600_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (ts_us // hop_us) * hop_us  # floor to hop grid
        val_c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        etype = df["event_type"].to_numpy()
        frames = []
        for i in range(k):
            frames.append(pd.DataFrame({
                "event_type": etype,
                "window_start_us": base - i * hop_us,
                "val_c": val_c,
                "one": np.ones(len(df), dtype=np.int64),
            }))
        g = (pd.concat(frames, ignore_index=True)
             .groupby(["event_type", "window_start_us"], as_index=False)
             .agg(sum_value_c=("val_c", "sum"), n_events=("one", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["event_type", "window_start_us"])
            .aggregate(Sum("sum_value_c", alias_name="sum_value_c"),
                       Sum("n_events", alias_name="n_events")))


EVENTS_HOPPING_SQL = """
WITH w AS (
    SELECT event_type, date_trunc('hour', ts) AS ws, value FROM events
    UNION ALL
    SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws,
           value FROM events
)
SELECT event_type, CAST(epoch_us(ws) AS BIGINT) AS window_start_us,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_c,
       COUNT(*) AS n_events
FROM w GROUP BY event_type, ws
"""


# total orders rows above which grouped quantiles switch to the
# distributed value-counts rank-select (a whole group no longer fits
# one worker's sort). Exact footer count, zero data read.
QUANTILES_DISTRIBUTED_CUTOFF_ROWS = 20_000_000


def grouped_quantiles_distributed(ds, group_col: str, val_col: str,
                                  out_names=("p50_price_c", "p95_price_c"),
                                  q_pcts=(50, 95),
                                  count_col: str = "n_orders"):
    """Exact grouped percentile_disc for groups too large to sort in
    one worker: compress rows to (group, value) → count partials per
    batch, reduce with a distributed groupby, then rank-select on each
    group's DISTINCT-value histogram (sorted values + cumulative
    counts). Equivalent to a distributed sort + rank select, but the
    shuffle carries one row per distinct (group, value) — for
    integer-scaled prices that is bounded by the value domain, not the
    row count. (When even the distinct-value table outgrows a worker,
    the same histogram recurses per value range — or a t-digest trades
    exactness for O(1) state; not needed at any tested scale.)"""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.to_pandas().groupby([group_col, val_col],
                                        as_index=False)
              .size().rename(columns={"size": "_n"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby([group_col, val_col])
              .aggregate(Sum("_n", alias_name="_n")))

    def rank_select(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[val_col].to_numpy())
        vals = g[val_col].to_numpy()[order]
        cnt = g["_n"].to_numpy()[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        row = {group_col: [g[group_col].iloc[0]]}
        for name, qp in zip(out_names, q_pcts):
            # percentile_disc rank ceil(q·n) − 1 in exact integer math
            idx = -(-(qp * n) // 100) - 1
            # first distinct value whose cumulative count covers idx+1
            row[name] = [int(vals[np.searchsorted(cum, idx + 1)])]
        row[count_col] = [np.int64(n)]
        return pd.DataFrame(row)

    return counts.groupby(group_col).map_groups(rank_select,
                                                batch_format="pandas")


def orders_price_quantiles(sf_dir: str,
                           distributed_cutoff_rows: int =
                           QUANTILES_DISTRIBUTED_CUTOFF_ROWS):
    """Exact grouped quantiles (discrete): p50/p95 of integer-scaled
    order price per priority. Index semantics pinned to DuckDB's
    ``percentile_disc``: sorted[ceil(q·n) − 1]. Count-gated shape:
    under the cutoff, ``groupby(priority).map_groups`` with a
    vectorized in-group sort (5 small groups here); above it, the
    distributed value-counts rank-select
    (:func:`grouped_quantiles_distributed`) — identical oracle."""
    import pyarrow.parquet as pq
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    n_rows = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows

    def add_scaled(batch: pa.Table) -> pa.Table:
        price_c = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "price_c": pa.array(price_c, pa.int64()),
        })

    scaled = ds.map_batches(add_scaled, batch_format="pyarrow",
                            batch_size=65536)
    if n_rows > distributed_cutoff_rows:
        return grouped_quantiles_distributed(scaled, "o_orderpriority",
                                             "price_c")

    def group_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["price_c"].to_numpy())
        n = len(v)

        def disc(q_pct: int) -> int:
            # ceil(q·n) − 1 in exact integer arithmetic: float q·n can
            # land a hair above an integral value (0.95·20 →
            # 19.000000000000004) and ceil then overshoots DuckDB's
            # percentile_disc rank by one
            return int(v[-(-(q_pct * n) // 100) - 1])

        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "p50_price_c": [disc(50)],
            "p95_price_c": [disc(95)],
            "n_orders": [np.int64(n)],
        })

    return (scaled.groupby("o_orderpriority")
                  .map_groups(group_quantiles, batch_format="pandas"))


ORDERS_QUANTILES_SQL = """
SELECT o_orderpriority,
       percentile_disc(0.5) WITHIN GROUP
           (ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS p50_price_c,
       percentile_disc(0.95) WITHIN GROUP
           (ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS p95_price_c,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def events_topn_per_type(sf_dir: str, n: int = 5):
    """Top-N users per event type by event count (the grouped top-N /
    window-rank shape Ray Data has no native operator for) →
    (event_type, user_id, n_events, rnk).

    Three bounded stages: per-batch partial (type, user) counts →
    exact counts via the distributed groupby → a per-BATCH partial
    top-N per type (vectorized lexsort + rank-within-type) that caps
    the final exchange at O(N × types × blocks) rows, THEN the tiny
    per-type final top-N. No stage ever sorts a whole type's user
    list in one task — the pre-filter is what makes the shape hold
    when a type has 10⁹ distinct users. Ties break on user_id, so the
    selected SET and ranks are deterministic across engines (DuckDB
    ``row_number() OVER (PARTITION BY ... ORDER BY n DESC, user)``)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.to_pandas().groupby(["event_type", "user_id"],
                                        as_index=False)
              .size().rename(columns={"size": "n_events"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby(["event_type", "user_id"])
              .aggregate(Sum("n_events", alias_name="n_events")))

    def topn_within(df: pd.DataFrame) -> pd.DataFrame:
        # rank = position within event_type under (-n_events, user_id)
        # order; lexsort is the vectorized per-batch top-N filter
        order = np.lexsort((df["user_id"].to_numpy(),
                            -df["n_events"].to_numpy(),
                            df["event_type"].to_numpy()))
        s = df.iloc[order]
        rnk = s.groupby("event_type").cumcount().to_numpy() + 1
        s = s.assign(rnk=rnk)
        return s[s["rnk"] <= n]

    def partial_topn(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(topn_within(batch.to_pandas()),
                                    preserve_index=False)

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        out = topn_within(g.drop(columns=["rnk"]))
        return out.astype({"n_events": np.int64, "rnk": np.int64})

    return (counts.map_batches(partial_topn, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("event_type")
            .map_groups(final_topn, batch_format="pandas"))


EVENTS_TOPN_PER_TYPE_SQL = """
WITH c AS (
    SELECT event_type, user_id, COUNT(*) AS n_events
    FROM events GROUP BY event_type, user_id)
SELECT event_type, user_id, n_events,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, user_id)
            AS BIGINT) AS rnk
FROM c
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY n_events DESC, user_id) <= 5
"""


# distinct probe-side keys above which the anti/semi join abandons the
# broadcast set for the partitioned hash join (the count-gating rule
# every join in this engine follows)
ANTI_JOIN_BROADCAST_CUTOFF = 2_000_000


def distinct_order_custkeys(sf_dir: str, priority: str):
    """DISTINCT custkeys of orders with the given priority — the
    build side both the anti/semi join and its bloom-join variant
    share. Predicate pushed into the read; per-batch ``unique`` + the
    distinct groupby compress away order multiplicity; MATERIALIZED so
    the count gate and the delivery route don't re-run the scan."""
    import ray.data as rd
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count

    def local_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(
            batch.column("o_custkey").combine_chunks())})

    return (rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_custkey"],
                filter=pads.field("o_orderpriority") == priority)
            .map_batches(local_distinct, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("o_custkey").aggregate(Count(alias_name="_n"))
            .select_columns(["o_custkey"])
            .materialize())


def customers_order_antijoin(sf_dir: str, semi: bool = False,
                             priority: str = "1-URGENT",
                             broadcast_cutoff: int =
                             ANTI_JOIN_BROADCAST_CUTOFF):
    """Anti join (``semi=False``): customers with NO order of the
    given priority — the NOT-EXISTS shape (orphan detection /
    referential-integrity audit). Semi join (``semi=True``):
    customers WITH at least one such order, projected to customer
    columns only (EXISTS — no row multiplication, which is what
    distinguishes it from an inner join).

    The priority predicate pushes into the parquet read (only
    matching row groups leave storage) and the orders side then
    compresses to DISTINCT keys via per-batch ``unique`` + the
    distinct groupby — the join plane never carries order
    multiplicity. The EXACT distinct-key count picks the plan: under
    the cutoff the key set collects once, broadcasts via ``ray.put``
    and each customer batch filters with one vectorized ``is_in`` (no
    exchange of the customer side at all); above it, Ray Data's
    native hash join in the matching mode (customer rows are
    join-key-unique, so inner ≡ semi; left_outer + null marker ≡
    anti — the minus_bgp construction)."""
    import ray
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    keys = distinct_order_custkeys(sf_dir, priority)
    n_keys = keys.count()

    if n_keys == 0:
        # NOT EXISTS over an empty set keeps everything; EXISTS
        # nothing (concat of zero batches would otherwise throw)
        return cust if not semi else cust.limit(0)

    if n_keys <= broadcast_cutoff:
        kt = pa.concat_tables(list(keys.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        kref = ray.put(kt.column("o_custkey").combine_chunks())

        def filt(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            from rdfx_ray.functions.broadcast import cached_get
            hit = pc.is_in(batch.column("c_custkey"),
                           value_set=cached_get(kref))
            return batch.filter(hit if semi else pc.invert(hit))

        return cust.map_batches(filt, batch_format="pyarrow",
                                batch_size=65536)

    import pyarrow.compute as pc
    if semi:
        renamed = keys.map_batches(
            lambda b: b.rename_columns(["_o_custkey_r"]),
            batch_format="pyarrow")
        return (cust.join(renamed, "inner", 16, on=("c_custkey",),
                          right_on=("_o_custkey_r",))
                .select_columns(["c_custkey", "c_name"]))
    marked = keys.map_batches(
        lambda b: pa.table({"_o_custkey_r": b.column("o_custkey"),
                            "_hit": pa.array(
                                np.ones(b.num_rows, dtype=np.int8))}),
        batch_format="pyarrow")
    joined = cust.join(marked, "left_outer", 16, on=("c_custkey",),
                       right_on=("_o_custkey_r",))
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_hit")))
                   .select(["c_custkey", "c_name"]),
        batch_format="pyarrow")


def _docs_lang_source_finest(sf_dir: str) -> pd.DataFrame:
    """Finest-level (lang, source) doc count + char sum — the ONE pass
    over the corpus that every grouping-set level re-aggregates from.
    Per-batch partial fold + one distributed groupby; the result is
    bounded by |langs|×|sources|, not the row count."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch)
        g = d.group_by(["lang", "source"]).agg(
            n_docs=pl.len(),
            sum_chars=pl.col("n_chars").cast(pl.Int64).sum())
        return g.to_arrow().cast(pa.schema([
            ("lang", pa.string()), ("source", pa.string()),
            ("n_docs", pa.int64()), ("sum_chars", pa.int64())]))

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
            .groupby(["lang", "source"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars"))
            .to_pandas())


def _grouping_set_levels(finest: pd.DataFrame, levels) -> pa.Table:
    """Assemble GROUPING SETS output from the finest aggregate: each
    level is a re-aggregation of the tiny finest table (driver-side —
    the same bounded collect every aggregate's consumer does), with
    NULL marking each rolled-up dimension."""
    parts = []
    for keep in levels:
        if keep == ("lang", "source"):
            parts.append(finest.copy())
            continue
        if keep:
            lv = (finest.groupby(list(keep), as_index=False)
                  [["n_docs", "sum_chars"]].sum())
        else:
            lv = pd.DataFrame({
                "n_docs": [finest["n_docs"].sum()],
                "sum_chars": [finest["sum_chars"].sum()]})
        for col in ("lang", "source"):
            if col not in keep:
                lv[col] = None
        parts.append(lv)
    out = pd.concat(parts, ignore_index=True)
    return pa.Table.from_pandas(
        out[["lang", "source", "n_docs", "sum_chars"]],
        preserve_index=False).cast(pa.schema([
            ("lang", pa.string()), ("source", pa.string()),
            ("n_docs", pa.int64()), ("sum_chars", pa.int64())]))


def docs_rollup_stats(sf_dir: str):
    """GROUP BY ROLLUP(lang, source): doc count + char sum at three
    aggregation levels — (lang, source), (lang), () — with NULL
    marking each rolled-up dimension (the OLAP subtotal shape) →
    (lang, source, n_docs, sum_chars). Only the finest level touches
    the corpus; the rollup adds zero extra passes over the data."""
    return _grouping_set_levels(
        _docs_lang_source_finest(sf_dir),
        [("lang", "source"), ("lang",), ()])


def docs_cube_stats(sf_dir: str):
    """GROUP BY CUBE(lang, source): all four grouping sets —
    (lang, source), (lang), (source), () — from the same single
    corpus pass as the rollup (the extra (source) level is one more
    re-aggregation of the |langs|×|sources|-bounded finest table)."""
    return _grouping_set_levels(
        _docs_lang_source_finest(sf_dir),
        [("lang", "source"), ("lang",), ("source",), ()])


DOCS_ROLLUP_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


def events_user_gaps(sf_dir: str, n_buckets: int = 32):
    """Per-user inter-event gap statistics — the LAG/LEAD window
    shape: gap = ts − previous ts in (user, ts) order →
    (user_id, n_gaps, min_gap_us, max_gap_us).

    The sessionize partitioning applies: users hash into
    ``n_buckets`` groups and each bucket runs ONE vectorized numpy
    pass (sort → within-user diff → per-user reduceat fold) — #bucket
    group calls total, never per-user pandas overhead. No timestamp
    tiebreak is needed: consecutive differences of a sorted multiset
    are invariant to how equal values order, and the per-user
    aggregates (count/min/max) don't see order at all — so the result
    is deterministic across engines by construction."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        jb = (uid.astype(np.int64) % n_buckets).astype(np.int32)
        return batch.append_column("_jb", pa.array(jb, pa.int32()))

    def bucket_gaps(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.int64, "n_gaps": np.int64,
                "min_gap_us": np.int64, "max_gap_us": np.int64}
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        user = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        gap = np.diff(ts_us)
        same = user[1:] == user[:-1]
        gap, guser = gap[same], user[1:][same]
        if len(gap) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        # per-user segment folds over the sorted order
        starts = np.concatenate(
            [[0], np.flatnonzero(guser[1:] != guser[:-1]) + 1])
        return pd.DataFrame({
            "user_id": guser[starts],
            "n_gaps": np.diff(np.concatenate([starts, [len(gap)]])),
            "min_gap_us": np.minimum.reduceat(gap, starts),
            "max_gap_us": np.maximum.reduceat(gap, starts),
        }).astype(cols)

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("_jb").map_groups(bucket_gaps,
                                       batch_format="pandas"))


EVENTS_USER_GAPS_SQL = """
WITH g AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap
    FROM events)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY user_id
"""


def events_hour_coverage(sf_dir: str, type_a: str = "click",
                         type_b: str = "purchase",
                         num_partitions: int = 16):
    """Hourly counts of two event types stitched with a FULL OUTER
    join — hours where either type occurred, zero-filled on the
    missing side (the coverage-comparison shape; exercises the one
    native join mode nothing else here uses) →
    (hour_us, n_a, n_b).

    Each side is a partial-agg hourly count (O(hours) rows), so the
    full-outer exchange joins two post-aggregate tables — never the
    event stream itself."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def hourly(type_name: str, out_col: str):
        def partial(batch: pa.Table) -> pa.Table:
            import polars as pl
            d = pl.from_arrow(batch)
            d = d.filter(pl.col("event_type") == type_name)
            d = d.with_columns(
                pl.col("ts").dt.truncate("1h")
                .dt.epoch("us").alias("hour_us"))
            g = d.group_by("hour_us").agg(pl.len().alias(out_col))
            return g.to_arrow().cast(pa.schema([
                ("hour_us", pa.int64()), (out_col, pa.int64())]))

        return (rd.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["event_type", "ts"])
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
                .groupby("hour_us")
                .aggregate(Sum(out_col, alias_name=out_col)))

    a = hourly(type_a, "n_a")
    b = hourly(type_b, "n_b").map_batches(
        lambda t: t.rename_columns(["_hour_r", "n_b"]),
        batch_format="pyarrow")
    joined = a.join(b, "full_outer", num_partitions,
                    on=("hour_us",), right_on=("_hour_r",))

    def fold(batch: pa.Table) -> pa.Table:
        # full_outer already coalesced the join key into hour_us;
        # only the count columns carry nulls on the unmatched side
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "hour_us": pc.cast(batch.column("hour_us"), pa.int64()),
            "n_a": pc.coalesce(pc.cast(batch.column("n_a"),
                                       pa.int64()), zero),
            "n_b": pc.coalesce(pc.cast(batch.column("n_b"),
                                       pa.int64()), zero),
        })

    return joined.map_batches(fold, batch_format="pyarrow")


EVENTS_HOUR_COVERAGE_SQL = """
WITH a AS (
    SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n_a
    FROM events WHERE event_type = 'click' GROUP BY 1),
b AS (
    SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n_b
    FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT CAST(epoch_us(COALESCE(a.h, b.h)) AS BIGINT) AS hour_us,
       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
FROM a FULL JOIN b ON a.h = b.h
"""


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""

CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


_PIVOT_PRIORITIES = (
    ("1-URGENT", "n_urgent"),
    ("2-HIGH", "n_high"),
    ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_notspec"),
    ("5-LOW", "n_low"),
)


def orders_year_priority_pivot(sf_dir: str):
    """PIVOT / conditional-aggregation shape: order counts per year,
    spread wide over the five fixed priorities, plus total revenue →
    (year, n_urgent, n_high, n_medium, n_notspec, n_low,
    revenue_cents).

    The pivot happens INSIDE each batch (five boolean masks folded by
    year — one pandas groupby per batch, no per-priority pass over the
    data), so the exchange carries one already-wide row per
    (batch, year) and the only shuffle is a groupby over O(years)
    keys. The priority domain is part of the operator contract (as in
    SQL PIVOT ... IN (...)); an unexpected value would surface as a
    count-sum mismatch, not silent loss, because every row lands in
    the revenue column regardless."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_orderpriority",
                                  "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        year = (batch.column("o_orderdate").to_numpy()
                .astype("datetime64[Y]").astype(np.int64) + 1970)
        pri = batch.column("o_orderpriority").to_pandas().to_numpy()
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({"year": year, "revenue_cents": cents})
        for val, col in _PIVOT_PRIORITIES:
            df[col] = (pri == val).astype(np.int64)
        g = df.groupby("year", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cols = ["year"] + [c for _, c in _PIVOT_PRIORITIES] + \
        ["revenue_cents"]

    def rename(b: pa.Table) -> pa.Table:
        return b.select(cols)

    aggs = [c for _, c in _PIVOT_PRIORITIES] + ["revenue_cents"]
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("year")
            .aggregate(*[Sum(c, alias_name=c) for c in aggs])
            .map_batches(rename, batch_format="pyarrow"))


ORDERS_YEAR_PRIORITY_PIVOT_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
       COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
       COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
       COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
           AS n_notspec,
       COUNT(*) FILTER (o_orderpriority = '5-LOW') AS n_low,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders GROUP BY 1
"""


def _users_type_flags(sf_dir: str, type_a: str, type_b: str,
                      value_min: float):
    """One-pass per-user presence flags for two qualified event
    predicates (type match AND value ≥ value_min) → (user_id, has_a,
    has_b) as 0/1 BIGINTs. Per-batch partial MAX of the two boolean
    masks folds locally, so the only exchange is a groupby over
    O(users) keys — both INTERSECT and EXCEPT then read off this one
    fold instead of two scans plus a distinct each. The value
    qualifier keeps the demo non-degenerate (every user has every
    bare type in this corpus); the comparison is double-vs-constant,
    identical in both engines."""
    import ray.data as rd
    from ray.data.aggregate import Max

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_pandas().to_numpy()
        hi = (batch.column("value").to_numpy(zero_copy_only=False)
              >= value_min)
        df = pd.DataFrame({
            "user_id": uid.astype(np.int64),
            "has_a": ((et == type_a) & hi).astype(np.int64),
            "has_b": ((et == type_b) & hi).astype(np.int64)})
        g = df.groupby("user_id", as_index=False).max()
        return pa.Table.from_pandas(g, preserve_index=False)

    def rename(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "has_a", "has_b"])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("user_id")
            .aggregate(Max("has_a", alias_name="has_a"),
                       Max("has_b", alias_name="has_b"))
            .map_batches(rename, batch_format="pyarrow"))


def users_type_intersect(sf_dir: str, type_a: str = "purchase",
                         type_b: str = "click",
                         value_min: float = 150.0):
    """INTERSECT shape: distinct users with BOTH qualified events."""

    def fold(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b.column("has_a"), 1),
                       pc.equal(b.column("has_b"), 1))
        return b.filter(keep).select(["user_id"])

    return _users_type_flags(sf_dir, type_a, type_b, value_min) \
        .map_batches(fold, batch_format="pyarrow")


def users_type_except(sf_dir: str, type_a: str = "purchase",
                      type_b: str = "click",
                      value_min: float = 150.0):
    """EXCEPT shape: distinct users with a qualified type_a event but
    no qualified type_b event."""

    def fold(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b.column("has_a"), 1),
                       pc.equal(b.column("has_b"), 0))
        return b.filter(keep).select(["user_id"])

    return _users_type_flags(sf_dir, type_a, type_b, value_min) \
        .map_batches(fold, batch_format="pyarrow")


USERS_TYPE_INTERSECT_SQL = """
SELECT user_id FROM events
WHERE event_type = 'purchase' AND value >= 150.0
INTERSECT
SELECT user_id FROM events
WHERE event_type = 'click' AND value >= 150.0
"""

USERS_TYPE_EXCEPT_SQL = """
SELECT user_id FROM events
WHERE event_type = 'purchase' AND value >= 150.0
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'click' AND value >= 150.0
"""


DOCS_CUBE_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY CUBE(lang, source)
"""


def docs_max_chars_per_lang(sf_dir: str):
    """Correlated-subquery shape: documents whose n_chars equals the
    MAX within their lang → (subj, lang, n_chars). Two passes over
    pruned columns: a partial-folded MAX per lang (exchange O(langs)),
    broadcast as a dict, then a streaming equality filter — the
    standard decorrelation of `WHERE x = (SELECT MAX(x) ... WHERE
    grp = outer.grp)` into aggregate + filter."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])

    def partial_max(batch: pa.Table) -> pa.Table:
        df = (batch.select(["lang", "n_chars"]).to_pandas()
              .groupby("lang", as_index=False).max())
        return pa.Table.from_pandas(df, preserve_index=False)

    maxes = (ds.map_batches(partial_max, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("lang")
             .aggregate(Max("n_chars", alias_name="n_chars"))
             .to_pandas())
    max_ref = ray.put(dict(zip(maxes["lang"], maxes["n_chars"])))

    def filt(batch: pa.Table) -> pa.Table:
        mx = cached_get(max_ref)
        df = batch.to_pandas()
        keep = df["n_chars"].to_numpy() == \
            df["lang"].map(mx).to_numpy()
        out = df[keep]
        return pa.table({
            "subj": pa.array(["urn:doc:" + str(i)
                              for i in out["doc_id"]], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "n_chars": pa.array(out["n_chars"].to_numpy(np.int64),
                                pa.int64())})

    return ds.map_batches(filt, batch_format="pyarrow",
                          batch_size=65536)


DOCS_MAX_CHARS_SQL = """
SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, lang,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE n_chars = (SELECT MAX(n_chars) FROM documents
                 WHERE lang = d.lang)
"""


def events_type_share(sf_dir: str):
    """Ratio-to-report window shape: each event type's count plus the
    grand total → (event_type, n, total); the share is n/total,
    derivable exactly from the two integers (floats never hash-match
    — the CLAUDE.md emission rule). One partial-folded groupby over
    O(types) keys; the total folds over that tiny result."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.to_pandas().groupby("event_type", as_index=False)
              .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby("event_type")
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts["total"] = np.int64(counts["n"].sum())
    counts["n"] = counts["n"].astype(np.int64)
    return pa.Table.from_pandas(counts[["event_type", "n", "total"]],
                                preserve_index=False)


EVENTS_TYPE_SHARE_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
FROM events GROUP BY event_type
"""


def events_value_mode(sf_dir: str):
    """MODE per group with a deterministic tiebreak: the most frequent
    integer-quantized value per event type → (event_type, mode_v_1e2,
    n_mode). Per-batch partial (type, v) counts fold locally; the
    distinct-value groupby is the only O(distinct) exchange; the
    argmax over each type's distinct values is a tiny final fold.
    Ties break toward the SMALLEST value (SQL mode() is
    tie-nondeterministic, so the oracle pins the same ordering via
    QUALIFY row_number)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        q = np.floor(batch.column("value").to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"event_type": batch.column("event_type")
                           .to_pandas(), "v": q})
        g = df.groupby(["event_type", "v"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def argmax_fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # (n DESC, v ASC) per type — one lexsort + first-occurrence
        order = np.lexsort((df["v"].to_numpy(),
                            -df["n"].to_numpy()))
        s = df.iloc[order]
        out = s[~s["event_type"].duplicated()]
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby(["event_type", "v"])
              .aggregate(Sum("n", alias_name="n")))
    # the distinct table is O(types × distinct values); its argmax
    # folds per-batch then once over batch winners (each batch emits
    # ≤ |types| rows, so the final repartition(1) input is tiny)
    return (counts.map_batches(argmax_fold, batch_format="pyarrow")
            .repartition(1)
            .map_batches(argmax_fold, batch_format="pyarrow")
            .map_batches(lambda b: b.rename_columns(
                ["event_type", "mode_v_1e2", "n_mode"]),
                batch_format="pyarrow"))


EVENTS_VALUE_MODE_SQL = """
WITH c AS (
    SELECT event_type,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2)
SELECT event_type, v AS mode_v_1e2, n AS n_mode
FROM c
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY n DESC, v ASC) = 1
"""


def events_funnel(sf_dir: str, step_a: str = "click",
                  step_b: str = "purchase"):
    """Funnel analysis: per user, did a step_a event precede a step_b
    event → one row (n_users, n_step_a, n_converted). The ORDERED
    sequence match reduces to per-user (min ts of a, max ts of b) —
    both mergeable min/max folds, so one partial-aggregated groupby
    over O(users) keys decides conversion; no per-user event sorting.
    Timestamps compare as epoch-µs integers (strict <: a conversion
    needs step_a strictly before step_b)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    big = np.int64(1 << 62)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        et = batch.column("event_type").to_pandas().to_numpy()
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": uid.astype(np.int64),
            "min_a": np.where(et == step_a, ts, big),
            "max_b": np.where(et == step_b, ts, -big)})
        g = df.groupby("user_id", as_index=False).agg(
            min_a=("min_a", "min"), max_b=("max_b", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby("user_id")
              .aggregate(Min("min_a", alias_name="min_a"),
                         Max("max_b", alias_name="max_b"))
              .to_pandas())
    has_a = folded["min_a"].to_numpy() < big
    converted = has_a & (folded["min_a"].to_numpy()
                         < folded["max_b"].to_numpy())
    return pa.table({
        "n_users": pa.array([np.int64(len(folded))]),
        "n_step_a": pa.array([np.int64(has_a.sum())]),
        "n_converted": pa.array([np.int64(converted.sum())])})


EVENTS_FUNNEL_SQL = """
WITH f AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               AS min_a,
           MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS max_b
    FROM events GROUP BY user_id)
SELECT COUNT(*) AS n_users,
       COUNT(min_a) AS n_step_a,
       CAST(COUNT(*) FILTER (min_a IS NOT NULL AND max_b IS NOT NULL
                             AND min_a < max_b) AS BIGINT)
           AS n_converted
FROM f
"""


def orders_price_median2x(sf_dir: str):
    """Interpolated median (percentile_cont(0.5)) in EXACT integer
    form: ``med2x_cents = lower middle + upper middle`` = exactly
    2 × the interpolated median, with no float midpoint → (priority,
    med2x_cents, n_orders). Same distributed shape as
    :func:`grouped_quantiles_distributed`: the shuffle carries one row
    per distinct (group, value); the two order statistics read off
    each group's cumulative distinct-value histogram."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        df = pd.DataFrame({"o_orderpriority":
                           batch.column("o_orderpriority").to_pandas(),
                           "v": cents})
        g = df.groupby(["o_orderpriority", "v"], as_index=False) \
            .size().rename(columns={"size": "_n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby(["o_orderpriority", "v"])
              .aggregate(Sum("_n", alias_name="_n")))

    def med_select(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["v"].to_numpy())
        vals = g["v"].to_numpy()[order]
        cum = np.cumsum(g["_n"].to_numpy()[order])
        n = int(cum[-1])
        r_lo, r_hi = (n - 1) // 2, n // 2      # 0-based middles
        v_lo = int(vals[np.searchsorted(cum, r_lo + 1)])
        v_hi = int(vals[np.searchsorted(cum, r_hi + 1)])
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "med2x_cents": [np.int64(v_lo + v_hi)],
            "n_orders": [np.int64(n)]})

    return counts.groupby("o_orderpriority").map_groups(
        med_select, batch_format="pandas")


ORDERS_MEDIAN2X_SQL = """
WITH q AS (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
    FROM orders),
r AS (
    SELECT o_orderpriority, v,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY v) - 1 AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM q)
SELECT o_orderpriority,
       CAST(SUM(v * (CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END))
            AS BIGINT) AS med2x_cents,
       CAST(MAX(n) AS BIGINT) AS n_orders
FROM r
WHERE rn = (n - 1) // 2 OR rn = n // 2
GROUP BY o_orderpriority
"""


def events_cohort_retention(sf_dir: str):
    """Cohort retention: users grouped by their FIRST active day;
    count distinct users active at each day offset → (cohort_day_us,
    day_offset, n_users). Two mergeable folds: (1) per-(user, day)
    batch-local distinct rides the O(users × days-active) groupby;
    (2) each user's cohort = MIN over their days — derived from the
    SAME fold output, so the corpus is scanned once. The cohort
    attach is a broadcast of the (user → first day) table, bounded by
    |users| (count-gate to a hash join past the broadcast budget —
    the engine's standard routing rule, noted here because users ≪
    events always holds for this shape)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from ..functions.broadcast import cached_get

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    day_us = np.int64(86_400_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = (batch.column("ts").to_numpy()
             .astype("datetime64[D]").astype("datetime64[us]")
             .astype(np.int64))
        t = pa.table({
            "user_id": pa.array(batch.column("user_id")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64), pa.int64()),
            "day_us": pa.array(d, pa.int64())})
        return pl.from_arrow(t).unique().to_arrow().cast(t.schema)

    user_days = (ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=65536)
                 .groupby(["user_id", "day_us"])
                 .aggregate(Count(alias_name="_n"))
                 .select_columns(["user_id", "day_us"])
                 .materialize())

    cohorts = (user_days.groupby("user_id")
               .aggregate(Min("day_us", alias_name="cohort_day_us"))
               .to_pandas())
    cref = ray.put(pd.Series(
        cohorts["cohort_day_us"].to_numpy(np.int64),
        index=cohorts["user_id"].to_numpy(np.int64)))

    def attach(batch: pa.Table) -> pa.Table:
        cmap = cached_get(cref)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        day = batch.column("day_us").to_numpy(zero_copy_only=False)
        cd = cmap.loc[uid].to_numpy(np.int64)
        off = (day - cd) // day_us
        df = pd.DataFrame({"cohort_day_us": cd, "day_offset": off})
        g = df.groupby(["cohort_day_us", "day_offset"],
                       as_index=False).size() \
            .rename(columns={"size": "n_users"})
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    return (user_days.map_batches(attach, batch_format="pyarrow")
            .groupby(["cohort_day_us", "day_offset"])
            .aggregate(Sum("n_users", alias_name="n_users")))


EVENTS_COHORT_RETENTION_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id,
           epoch_us(date_trunc('day', ts)) AS day_us
    FROM events),
c AS (SELECT user_id, MIN(day_us) AS cohort_day_us FROM ud
      GROUP BY user_id)
SELECT c.cohort_day_us,
       (ud.day_us - c.cohort_day_us) // 86400000000 AS day_offset,
       COUNT(*) AS n_users
FROM ud JOIN c ON ud.user_id = c.user_id
GROUP BY 1, 2
"""


def tpch_q3ish(sf_dir: str, k: int = 10):
    """TPC-H Q3-shaped 2-table pipeline: unshipped-revenue top-k —
    orders ⋈ lineitem (the o_orderstatus='F' filter stands in for
    Q3's customer-segment leg, so no customer join), revenue =
    Σ extprice·(1−disc) integer-scaled →
    (l_orderkey, revenue_1e4, o_orderdate_us) LIMIT k.

    Join strategy per the engine's routing rule: the orders side
    collapses to (orderkey → date) AFTER its filter; it broadcasts
    (bounded by the filter's selectivity — count-gate in the general
    operator, here the filtered dimension is months of one status).
    Revenue partials fold per batch BEFORE the O(orderkeys) groupby;
    the top-k sorts the post-aggregate table with the standard
    (revenue DESC, key ASC) determinism tiebreak."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    import pyarrow.parquet as pq
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
        filters=[("o_orderstatus", "=", "F")])
    okey = orders.column("o_orderkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    odate = (orders.column("o_orderdate").to_numpy()
             .astype("datetime64[us]").astype(np.int64))
    oref = ray.put(pd.Series(odate, index=okey))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        omap = cached_get(oref)
        lk = batch.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # semi-join against the filtered order set (broadcast probe)
        hit = omap.index.get_indexer(lk)
        keep = hit >= 0
        if not keep.any():
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "revenue_1e4": pa.array([], pa.int64()),
                "o_orderdate_us": pa.array([], pa.int64())})
        lk = lk[keep]
        ep = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)[keep]
        dc = batch.column("l_discount") \
            .to_numpy(zero_copy_only=False)[keep]
        # integer revenue: cents × discount-complement basis points
        rev = (np.floor(ep * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(dc * 100.0 + 0.5).astype(np.int64)))
        df = pd.DataFrame({
            "l_orderkey": lk, "revenue_1e4": rev,
            "o_orderdate_us": omap.to_numpy()[hit[keep]]})
        g = df.groupby(["l_orderkey", "o_orderdate_us"],
                       as_index=False).sum()
        return pa.Table.from_pandas(
            g[["l_orderkey", "revenue_1e4", "o_orderdate_us"]],
            preserve_index=False)

    return (li.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["l_orderkey", "o_orderdate_us"])
            .aggregate(Sum("revenue_1e4", alias_name="revenue_1e4"))
            .select_columns(["l_orderkey", "revenue_1e4",
                             "o_orderdate_us"])
            .sort(["revenue_1e4", "l_orderkey"],
                  descending=[True, False])
            .limit(k))


TPCH_Q3ISH_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5)
                              AS BIGINT))) AS BIGINT) AS revenue_1e4,
       epoch_us(o_orderdate) AS o_orderdate_us
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_1e4 DESC, l_orderkey
LIMIT 10
"""


def brand_revenue(sf_dir: str, broadcast_cutoff_rows: int = 2_000_000):
    """Revenue per part brand: lineitem ⋈ part on partkey →
    (p_brand, n_items, revenue_1e4). Count-gated like every join plan
    here — the EXACT part count decides: under the cutoff the
    (partkey → brand) map broadcasts (ray.put once, per-worker cache)
    and the whole join is a vectorized indexer probe inside the fact
    scan; above it the fact side's per-batch revenue fold feeds Ray's
    native hash join against the dimension, and the brand aggregate
    runs post-join. Both routes fold revenue BEFORE the O(brands)
    exchange and emit identical integers (the q3ish cents ×
    discount-complement basis points form)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.broadcast import cached_get

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    n_parts = part.count()
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def rev_arrays(batch: pa.Table):
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ep = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = (np.floor(ep * 100.0 + 0.5).astype(np.int64)
               * (100 - np.floor(dc * 100.0 + 0.5).astype(np.int64)))
        return pk, rev

    agg = (Sum("revenue_1e4", alias_name="revenue_1e4"),
           Sum("n_items", alias_name="n_items"))
    cols = ["p_brand", "n_items", "revenue_1e4"]

    if n_parts <= broadcast_cutoff_rows:
        import pyarrow.parquet as pq
        pt = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
        bmap = pd.Series(pt.column("p_brand").to_pandas().to_numpy(),
                         index=pt.column("p_partkey").to_numpy())
        bref = ray.put(bmap)

        def partial(batch: pa.Table) -> pa.Table:
            bm = cached_get(bref)
            pk, rev = rev_arrays(batch)
            idx = bm.index.get_indexer(pk)
            keep = idx >= 0
            df = pd.DataFrame({
                "p_brand": bm.to_numpy()[idx[keep]],
                "revenue_1e4": rev[keep]})
            g = df.groupby("p_brand", as_index=False).agg(
                n_items=("revenue_1e4", "size"),
                revenue_1e4=("revenue_1e4", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        return (li.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("p_brand").aggregate(*agg)
                .map_batches(lambda b: b.select(cols),
                             batch_format="pyarrow"))

    # large dimension: pre-fold revenue per (batch, partkey), then the
    # native hash join moves one row per distinct (batch, partkey)
    def fact_partial(batch: pa.Table) -> pa.Table:
        pk, rev = rev_arrays(batch)
        df = pd.DataFrame({"l_partkey": pk, "revenue_1e4": rev})
        g = df.groupby("l_partkey", as_index=False).agg(
            n_items=("revenue_1e4", "size"),
            revenue_1e4=("revenue_1e4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = li.map_batches(fact_partial, batch_format="pyarrow",
                            batch_size=65536)
    joined = folded.join(part, "inner", 16, on=("l_partkey",),
                         right_on=("p_partkey",))

    def brand_partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["p_brand", "n_items", "revenue_1e4"]) \
            .to_pandas()
        g = df.groupby("p_brand", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(brand_partial, batch_format="pyarrow")
            .groupby("p_brand").aggregate(*agg)
            .map_batches(lambda b: b.select(cols),
                         batch_format="pyarrow"))


BRAND_REVENUE_SQL = """
SELECT p_brand, COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5)
                              AS BIGINT))) AS BIGINT) AS revenue_1e4
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def orders_lineitem_integrity(sf_dir: str):
    """Referential-integrity check — the data-quality operator every
    ingest pipeline runs before training: → one row
    (n_lineitems, n_orders, n_orphan_lineitems, n_childless_orders).
    Both directions come from ONE distinct-key exchange per side:
    lineitem compresses to distinct orderkeys (batch-local unique +
    the distinct groupby), orders contributes its key set, and the
    full-outer overlap fold is O(distinct keys). Raw row counts ride
    streaming count() passes over pruned single-column reads."""
    import ray.data as rd
    from ray.data.aggregate import Count

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey"])
    n_li = li.count()
    n_od = od.count()

    def local_distinct(batch: pa.Table) -> pa.Table:
        import polars as pl
        t = batch.rename_columns(["k"])
        return pl.from_arrow(t).unique().to_arrow().cast(t.schema)

    li_keys = (li.map_batches(local_distinct, batch_format="pyarrow",
                              batch_size=65536)
               .groupby("k").aggregate(Count(alias_name="_n"))
               .select_columns(["k"])
               .map_batches(lambda b: b.append_column(
                   "side", pa.array(np.full(b.num_rows, 1, np.int64))),
                   batch_format="pyarrow"))
    od_keys = od.map_batches(
        lambda b: pa.table({
            "k": b.column("o_orderkey"),
            "side": pa.array(np.full(b.num_rows, 2, np.int64))}),
        batch_format="pyarrow")

    from ray.data.aggregate import Sum
    overlap = (li_keys.union(od_keys)
               .groupby("k").aggregate(Sum("side", alias_name="s")))

    orphans = childless = 0
    for bt in overlap.iter_batches(batch_size=1 << 20,
                                   batch_format="pyarrow"):
        s = bt.column("s").to_numpy(zero_copy_only=False)
        orphans += int((s == 1).sum())    # lineitem key, no order
        childless += int((s == 2).sum())  # order key, no lineitem
    return pa.table({
        "n_lineitems": pa.array([np.int64(n_li)]),
        "n_orders": pa.array([np.int64(n_od)]),
        "n_orphan_lineitems": pa.array([np.int64(orphans)]),
        "n_childless_orders": pa.array([np.int64(childless)])})


ORDERS_LINEITEM_INTEGRITY_SQL = """
SELECT (SELECT COUNT(*) FROM lineitem) AS n_lineitems,
       (SELECT COUNT(*) FROM orders) AS n_orders,
       (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
           AS n_orphan_lineitems,
       (SELECT COUNT(*) FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
           AS n_childless_orders
"""
