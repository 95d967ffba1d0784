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


def entity_degree(triples_ds, top_k: int = 20):
    """Top subjects by triple count (hub detection — the heavy-hitter
    pre-pass SURVEY.md §4 uses to pick salting candidates)."""
    from ray.data.aggregate import Count

    return (
        triples_ds.groupby("subj").aggregate(Count(alias_name="degree"))
        .sort(["degree", "subj"], descending=[True, False]).limit(top_k)
    )
