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

        from ..functions.broadcast import cached_get
        right = pl.from_arrow(cached_get(bref))
        left = (pl.from_arrow(batch.select(["subj", "obj_value"]))
                  .rename({"obj_value": "va"}))
        out = left.join(right, on="subj", how="inner")
        return out.to_arrow().cast(pa.schema([
            ("subj", pa.string()), ("va", pa.string()), ("vb", pa.string()),
        ]))

    return triple_pattern(triples_ds, pred=pred_a).map_batches(
        join_batch, batch_format="pyarrow")


def star_bgp(triples_ds, patterns, num_partitions: int = 16,
             strategy: str = "broadcast"):
    """N-pattern common-subject BGP planner: ``?s p1 o1 . ?s p2 ?v2 …``
    — each pattern is ``(pred_iri, obj)`` where obj is a constant
    (filter pattern, contributes selectivity only) or ``"?name"`` /
    ``None`` (projected variable). Constant patterns are evaluated
    FIRST (most selective → smallest intermediate). Returns (subj,
    …vars in pattern order).

    Two physical plans:

    - ``broadcast`` (default): every side but ONE streamed var side is
      collected and broadcast; the streamed side folds the chain with
      in-batch polars hash joins — no shuffle at all. Right whenever
      the pattern sides fit the object store (each side is bounded by
      its pattern's selectivity, not the triple count); a Ray native
      join costs ~seconds of fixed all-to-all per hop.
    - ``shuffle``: left-fold through Ray Data's native hash-shuffle
      ``Dataset.join`` — the both-sides-large plan.

    Bag semantics like SPARQL: a subject matching a pattern k times
    multiplies rows k× — with the engine's (subj, pred)-unique triple
    streams each join is 1:1."""
    consts = [(p, o) for p, o in patterns
              if o is not None and not str(o).startswith("?")]
    vars_ = [(i, p, (o[1:] if o else f"v{i}"))
             for i, (p, o) in enumerate(patterns)
             if o is None or str(o).startswith("?")]

    def subj_only(pred, obj):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"subj": batch.column("subj")})
        return triple_pattern(triples_ds, pred=pred, obj_value=obj) \
            .map_batches(fn, batch_format="pyarrow")

    def subj_var(pred, var):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"subj": batch.column("subj"),
                             var: batch.column("obj_value")})
        return triple_pattern(triples_ds, pred=pred) \
            .map_batches(fn, batch_format="pyarrow")

    const_sides = [subj_only(p, o) for p, o in consts]
    var_sides = [subj_var(p, v) for _, p, v in vars_]
    out_cols = ["subj"] + [v for _, _, v in vars_]
    if not (const_sides or var_sides):
        raise ValueError("star_bgp needs at least one pattern")

    if strategy == "broadcast":
        import polars as pl
        import ray

        # stream the FIRST var side (or a const side if no vars);
        # broadcast the rest once
        stream = var_sides[0] if var_sides else const_sides[0]
        others = const_sides + var_sides[1:] if var_sides \
            else const_sides[1:]
        refs = []
        for side in others:
            tbl = pa.concat_tables(list(side.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow")))
            refs.append(ray.put(tbl))

        def fold(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            acc = pl.from_arrow(batch)
            for ref in refs:
                other = pl.from_arrow(cached_get(ref))
                how = "semi" if other.width == 1 else "inner"
                acc = acc.join(other, on="subj", how=how)
            out = acc.to_arrow()
            return out.select(out_cols).cast(pa.schema(
                [(c, pa.string()) for c in out_cols]))

        return stream.map_batches(fold, batch_format="pyarrow")

    acc = (const_sides + var_sides)[0]
    for side in (const_sides + var_sides)[1:]:
        renamed = side.map_batches(
            lambda b: b.rename_columns(
                ["_subj_r"] + list(b.schema.names[1:])),
            batch_format="pyarrow")
        acc = acc.join(renamed, "inner", num_partitions,
                       on=("subj",), right_on=("_subj_r",))
        acc = acc.select_columns(
            [c for c in acc.schema().names if c != "_subj_r"])
    return acc.select_columns(out_cols)


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
