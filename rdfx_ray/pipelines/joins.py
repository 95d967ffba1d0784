"""Distributed joins over Datasets.

Two strategies, per ray_guide 'Joins and lookups':

- broadcast (small side): see ``analytics.revenue_by_region`` /
  ``query.bgp_join`` — ``ray.put`` the small side once, pandas-merge
  per batch. No shuffle.
- partitioned hash join (both sides large): this module. Portable
  pattern: tag each side, add ``_jb = hash(key) % B`` to both, union,
  ``groupby(_jb)``, and inside each bucket group split by side and
  hash-merge. Every bucket is an independent task; skewed keys are
  handled by raising B (same salting logic as the triple shuffle).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _dataset_pa_schema(ds) -> pa.Schema:
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    raise ValueError(
        "dataset is not Arrow-backed (pandas blocks); pass an explicit "
        "left_schema/right_schema to partitioned_hash_join")


def detect_hot_keys(ds, key_col: str, top_k: int = 16,
                    min_share: float = 0.05) -> np.ndarray:
    """Approximate heavy-hitter detection for join salting: each block
    contributes its local top-``top_k`` key counts (tiny partials);
    the driver combines them and keeps keys holding ≥ ``min_share`` of
    the sampled mass. Mirrors SURVEY §4's heavy-hitter pre-pass; a
    count-min sketch replaces the local top-k at extreme key
    cardinality."""

    def partial(batch: pa.Table) -> pa.Table:
        ks = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals, counts = np.unique(ks, return_counts=True)
        order = np.argsort(-counts)[:top_k]
        return pa.table({"k": pa.array(vals[order], pa.int64()),
                         "n": pa.array(counts[order], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=65536).iter_batches(
                           batch_format="pyarrow")))
    if parts.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    df = (pd.DataFrame({"k": parts.column("k").to_pylist(),
                        "n": parts.column("n").to_pylist()})
          .groupby("k", as_index=False)["n"].sum())
    total = df["n"].sum()
    return df.loc[df["n"] >= min_share * total, "k"] \
        .to_numpy(dtype=np.int64)


def partitioned_hash_join(left, right, left_on: str, right_on: str,
                          n_buckets: int = 32, how: str = "inner",
                          left_schema: Optional[pa.Schema] = None,
                          right_schema: Optional[pa.Schema] = None,
                          salt: int = 1,
                          hot_keys: Optional[np.ndarray] = None):
    """Join two Ray Datasets on integer keys via an explicit
    bucket-partitioned hash join. Returns a Dataset of merged rows
    (pandas-merge semantics). Column names must be disjoint across
    sides; schemas are taken from the datasets (pass ``left_schema`` /
    ``right_schema`` for pandas-backed inputs, e.g. a chained join).

    Skew handling (``salt > 1``): rows of ``hot_keys`` (detect with
    :func:`detect_hot_keys`, or pass the known hubs) are SPLIT on the
    probe (left) side across ``salt`` sub-buckets and REPLICATED
    ``salt``× on the build (right) side — the classic salted join: a
    hub key's work spreads over ``salt`` tasks at the cost of
    duplicating only its (small) build rows. Non-hot keys pay
    nothing."""

    if salt > 1 and hot_keys is None:
        raise ValueError("salt > 1 requires hot_keys (see detect_hot_keys)")
    if salt > 1 and how != "inner":
        # replicated build rows would duplicate unmatched outer rows
        raise ValueError("salted joins support how='inner' only")
    # Record each side's columns ONCE from the schemas (inferring per
    # bucket via dropna(all-null) dropped genuinely-all-null data
    # columns — bucket-dependent schemas — or even the join key on
    # empty sides).
    left_schema = left_schema or _dataset_pa_schema(left)
    right_schema = right_schema or _dataset_pa_schema(right)
    left_cols: List[str] = list(left_schema.names)
    right_cols: List[str] = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols))
    if overlap:
        raise ValueError(f"column names must be disjoint, got {overlap}")
    canonical = pa.schema(
        list(left_schema) + list(right_schema)
        + [pa.field("_jb", pa.int32()), pa.field("_side", pa.string())])
    hot = (np.asarray(hot_keys, dtype=np.int64)
           if salt > 1 and hot_keys is not None and len(hot_keys)
           else None)

    def tag(side: str, key_col: str, other_schema: pa.Schema):
        def fn(batch: pa.Table) -> pa.Table:
            # schema-less empty blocks (e.g. out of an upstream join's
            # empty buckets) normalize to the canonical empty table
            if batch.num_rows == 0 or key_col not in batch.schema.names:
                return canonical.empty_table()
            if hot is not None and side == "r":
                # replicate build-side hot rows once per salt bucket
                keys0 = batch.column(key_col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                is_hot = np.isin(keys0, hot)
                if is_hot.any():
                    hi = np.flatnonzero(is_hot)
                    idx = np.concatenate(
                        [np.flatnonzero(~is_hot)]
                        + [hi] * salt)
                    salt_col = np.concatenate(
                        [np.zeros(len(keys0) - len(hi), np.int64)]
                        + [np.full(len(hi), s, np.int64)
                           for s in range(salt)])
                    batch = batch.take(pa.array(idx))
                else:
                    salt_col = np.zeros(len(keys0), np.int64)
            keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            n = batch.num_rows
            base = keys % n_buckets
            if hot is None:
                jb = base.astype(np.int32)
            else:
                if side == "l":
                    # spread probe-side hot rows evenly over salts
                    salt_col = np.where(np.isin(keys, hot),
                                        np.arange(n, dtype=np.int64) % salt,
                                        0)
                jb = (base * salt + salt_col).astype(np.int32)
            out = (batch
                   .append_column("_jb", pa.array(jb, pa.int32()))
                   .append_column("_side",
                                  pa.array(np.full(n, side), pa.string())))
            # pad with the OTHER side's columns as typed nulls so every
            # exchange block shares one schema — a bucket whose rows all
            # came from one side otherwise lacks the other's columns
            for f in other_schema:
                out = out.append_column(f.name, pa.nulls(n, f.type))
            # cast: pandas round-trips upstream may have widened types
            # (int64-with-nulls → float64); the exchange needs ONE schema
            return out.select(canonical.names).cast(canonical)
        return fn

    tagged = (left.map_batches(tag("l", left_on, right_schema),
                               batch_format="pyarrow")
              .union(right.map_batches(tag("r", right_on, left_schema),
                                       batch_format="pyarrow")))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == "l", left_cols]
        r = g.loc[g["_side"] == "r", right_cols]
        if l.empty or (r.empty and how == "inner"):
            # keep the output column set stable even for empty buckets
            return pd.DataFrame(columns=left_cols + right_cols)
        out = l.merge(r, left_on=left_on, right_on=right_on, how=how,
                      suffixes=("", "_r"))
        return out

    return tagged.groupby("_jb").map_groups(join_bucket,
                                            batch_format="pandas")


def revenue_by_region_shuffle(sf_dir: str,
                              customer_broadcast_cutoff_rows:
                              Optional[int] = None):
    """Same result as analytics.revenue_by_region, but the
    lineitem ⋈ orders step runs as a partitioned hash join (the
    both-sides-large strategy) instead of a broadcast — exercising the
    explicit exchange path with an identical SQL oracle.

    The dimension chain is count-gated ONE LEVEL DOWN too: customer
    grows with orders (TPC-H customer ≈ orders/10 — fact-scale at
    100×), so its EXACT footer row count decides. Under the cutoff the
    customer⋈nation⋈region chain composes driver-side into one
    custkey→r_name lookup (the fast small path). Over it, ONLY
    nation⋈region (≤ #nations rows, truly bounded) is broadcast and
    the customer hop runs as a second partitioned hash join over
    per-batch (custkey, revenue) partials — no driver collect of any
    side that scales with the fact tables."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..pipelines.analytics import BROADCAST_ORDERS_ROW_CUTOFF
    if customer_broadcast_cutoff_rows is None:
        customer_broadcast_cutoff_rows = BROADCAST_ORDERS_ROW_CUTOFF

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"]).to_pandas()
    nation_region = (nation
                     .merge(region, left_on="n_regionkey",
                            right_on="r_regionkey")
                     [["n_nationkey", "r_name"]])

    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_extendedprice",
                                        "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    joined = partitioned_hash_join(lineitem, orders,
                                   "l_orderkey", "o_orderkey", n_buckets=16)

    import ray

    from ..functions.broadcast import cached_get

    n_customer = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_customer <= customer_broadcast_cutoff_rows:
        customer = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"]).to_pandas()
        cust_region = (customer
                       .merge(nation_region, left_on="c_nationkey",
                              right_on="n_nationkey")
                       [["c_custkey", "r_name"]])
        cr_ref = ray.put(cust_region)

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            if df.empty:
                return pa.table({"r_name": pa.array([], pa.string()),
                                 "revenue_c4": pa.array([], pa.int64())})
            df = df.merge(cached_get(cr_ref), left_on="o_custkey",
                          right_on="c_custkey")
            rev = np.floor(df["l_extendedprice"].to_numpy()
                           * (1.0 - df["l_discount"].to_numpy()) * 10_000
                           + 0.5).astype(np.int64)
            g = pd.DataFrame({"r_name": df["r_name"], "rev": rev}) \
                .groupby("r_name", as_index=False)["rev"].sum() \
                .rename(columns={"rev": "revenue_c4"})
            return pa.Table.from_pandas(g, preserve_index=False)

        return (joined.map_batches(partial, batch_format="pyarrow")
                      .groupby("r_name")
                      .aggregate(Sum("revenue_c4", alias_name="revenue_c4")))

    # customer over the cutoff: pre-aggregate revenue per custkey inside
    # each batch (shrinks the exchange to ≤ #distinct custkeys per
    # block), second partitioned hash join against customer, then the
    # bounded nation⋈region broadcast maps nationkey → region name
    cust_partial_schema = pa.schema([("o_custkey", pa.int64()),
                                     ("revenue_c4", pa.int64())])

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return cust_partial_schema.empty_table()
        rev = np.floor(df["l_extendedprice"].to_numpy()
                       * (1.0 - df["l_discount"].to_numpy()) * 10_000
                       + 0.5).astype(np.int64)
        g = pd.DataFrame({"o_custkey":
                          df["o_custkey"].to_numpy(np.int64),
                          "revenue_c4": rev}) \
            .groupby("o_custkey", as_index=False)["revenue_c4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .cast(cust_partial_schema)

    per_cust = joined.map_batches(per_cust_partial, batch_format="pyarrow")
    customer_ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_nationkey"])
    cust_schema = pa.schema([("c_custkey", pa.int64()),
                             ("c_nationkey", pa.int64())])
    joined2 = partitioned_hash_join(per_cust, customer_ds,
                                    "o_custkey", "c_custkey", n_buckets=16,
                                    left_schema=cust_partial_schema,
                                    right_schema=cust_schema)
    nr_ref = ray.put(nation_region)

    out_schema = pa.schema([("r_name", pa.string()),
                            ("revenue_c4", pa.int64())])

    def to_region(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return out_schema.empty_table()
        df = df.merge(cached_get(nr_ref), left_on="c_nationkey",
                      right_on="n_nationkey")
        g = df.groupby("r_name", as_index=False)["revenue_c4"].sum()
        # a pandas hop can widen int64 (null padding in the exchange)
        # → pin the block schema so the final Sum stays integral
        return pa.Table.from_pandas(g[["r_name", "revenue_c4"]],
                                    preserve_index=False).cast(out_schema)

    return (joined2.map_batches(to_region, batch_format="pyarrow")
                   .groupby("r_name")
                   .aggregate(Sum("revenue_c4", alias_name="revenue_c4")))
