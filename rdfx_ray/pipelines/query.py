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

import numpy as np
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


DESCRIBE_BROADCAST_CUTOFF = 2_000_000


def describe_subjects(triples_ds, pred: str, obj_value: str,
                      broadcast_cutoff: int = DESCRIBE_BROADCAST_CUTOFF,
                      num_partitions: int = 16):
    """SPARQL DESCRIBE: every triple about each subject matching
    ``{?s pred obj_value}`` — completes the verb family
    (SELECT / ASK / CONSTRUCT / DESCRIBE). Two streaming passes:
    the matching-subject set folds first (count-gated: broadcast
    ``is_in`` filter below the cutoff, semi join via the native hash
    join above it — the customers_with_urgent_order routing), then
    the full triples stream filters by membership. Output is the
    engine's full triple schema."""
    import ray

    from ..functions.broadcast import cached_get

    subj_ds = (triple_pattern(triples_ds, pred=pred,
                              obj_value=obj_value)
               .map_batches(lambda b: b.select(["subj"]),
                            batch_format="pyarrow")
               .groupby("subj").count()
               .map_batches(lambda b: b.select(["subj"]),
                            batch_format="pyarrow").materialize())
    n_subj = subj_ds.count()
    if n_subj <= broadcast_cutoff:
        subj_set = pa.concat_tables(list(subj_ds.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"))) \
            .column("subj").combine_chunks()
        sref = ray.put(subj_set)

        def member(batch: pa.Table) -> pa.Table:
            s = cached_get(sref)
            return batch.filter(pc.is_in(batch.column("subj"),
                                         value_set=s))

        return triples_ds.map_batches(member, batch_format="pyarrow")

    # semi join route: mark + inner join on subj (dense both sides)
    marked = subj_ds.map_batches(
        lambda b: b.rename_columns(["_ds"]), batch_format="pyarrow")
    return (triples_ds.join(marked, "inner", num_partitions,
                            on=("subj",), right_on=("_ds",)))


def subjects_of(triples_ds, pred: str, obj_value: str):
    """All subjects with (s, pred, obj_value) — the single-pattern
    SELECT shape."""
    return triple_pattern(triples_ds, pred=pred, obj_value=obj_value) \
        .select_columns(["subj"])


# pattern-side rows above which a side is no longer collected to the
# driver / broadcast: route through the native hash-shuffle join.
# Counting is an extra streaming pass over the filtered pattern, but
# EXACT — strategy picks are counted, never guessed (the LSH/embedding
# discipline; a pattern like `?s inLanguage ?v` is corpus-sized and
# must never be driver-collected by default).
BGP_BROADCAST_ROW_CUTOFF = 2_000_000


def bgp_join(triples_ds, pred_a: str, pred_b: str,
             broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF):
    """Two-pattern BGP joined on subject:
    ``?s pred_a ?va . ?s pred_b ?vb`` → (subj, va, vb).

    Count-gated physical plan: the ``pred_b`` side's EXACT row count
    decides. Under the cutoff it is collected once, broadcast via
    ``ray.put``, and joined inside map_batches (no shuffle — right for
    the reference's small patterns). Over the cutoff the query routes
    through :func:`bgp_join_native` (hash-shuffle join, both sides
    streaming) — no O(corpus) driver materialization on any path."""
    import polars as pl

    import ray

    side_b = triple_pattern(triples_ds, pred=pred_b)
    if side_b.count() > broadcast_cutoff_rows:
        return bgp_join_native(triples_ds, pred_a, pred_b)
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
             strategy: str = "auto",
             broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF):
    """N-pattern common-subject BGP planner: ``?s p1 o1 . ?s p2 ?v2 …``
    — each pattern is ``(pred_iri, obj)`` where obj is a constant
    (filter pattern, contributes selectivity only) or ``"?name"`` /
    ``None`` (projected variable). Constant patterns are evaluated
    FIRST (most selective → smallest intermediate). Returns (subj,
    …vars in pattern order).

    Physical plans:

    - ``auto`` (default): count every pattern side EXACTLY (one
      streaming pass each — counted, never guessed), stream the
      LARGEST side, and broadcast the rest only if they all fit under
      ``broadcast_cutoff_rows``; otherwise fall through to shuffle.
      No plan ever driver-collects an O(corpus) side.
    - ``broadcast``: every side but ONE streamed var side is
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

    stream_idx = 0
    if strategy == "auto":
        sides = var_sides if var_sides else const_sides
        counts = [s.count() for s in sides]
        # stream the largest side; the collected remainder decides
        stream_idx = max(range(len(counts)), key=counts.__getitem__)
        collected = sum(counts) - counts[stream_idx] \
            + sum(s.count() for s in (const_sides if var_sides else []))
        strategy = ("broadcast" if collected <= broadcast_cutoff_rows
                    else "shuffle")

    if strategy == "broadcast":
        import polars as pl
        import ray

        # stream the chosen var side (or a const side if no vars);
        # broadcast the rest once
        if var_sides:
            stream = var_sides[stream_idx]
            others = const_sides + [s for i, s in enumerate(var_sides)
                                    if i != stream_idx]
        else:
            stream = const_sides[stream_idx]
            others = [s for i, s in enumerate(const_sides)
                      if i != stream_idx]
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


def var_predicate_bgp(triples_ds, filter_pred: str, filter_obj: str,
                      broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF):
    """Variable-PREDICATE BGP: ``?s filter_pred filter_obj . ?s ?p ?o``
    with ``?p`` projected → (subj, p, o). The open pattern matches every
    triple of each qualifying subject — including the filter triple
    itself, SPARQL bag semantics.

    Count-gated like every BGP plan here: the qualifying-subject set's
    EXACT count decides. Small → the subject set broadcasts once via
    ``ray.put`` and the full triple stream filters per batch with a
    vectorized ``pc.is_in`` (no shuffle). Large → semi-join through
    Ray Data's native hash-shuffle join."""
    import ray

    subs = triple_pattern(triples_ds, pred=filter_pred,
                          obj_value=filter_obj) \
        .map_batches(lambda b: pa.table({"subj": b.column("subj")}),
                     batch_format="pyarrow")

    out_schema = pa.schema([("subj", pa.string()), ("p", pa.string()),
                            ("o", pa.string())])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"),
                         "p": batch.column("pred"),
                         "o": batch.column("obj_value")}).cast(out_schema)

    if subs.count() <= broadcast_cutoff_rows:
        sub_tbl = pa.concat_tables(list(subs.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        sref = ray.put(sub_tbl.column("subj").combine_chunks())

        def filt(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            keep = pc.is_in(batch.column("subj"),
                            value_set=cached_get(sref))
            return project(batch.filter(keep))

        return triples_ds.map_batches(filt, batch_format="pyarrow")

    subs_r = subs.map_batches(lambda b: b.rename_columns(["_subj_r"]),
                              batch_format="pyarrow")
    projected = triples_ds.map_batches(project, batch_format="pyarrow")
    joined = projected.join(subs_r, "inner", 16,
                            on=("subj",), right_on=("_subj_r",))
    return joined.select_columns(["subj", "p", "o"])


def object_join_bgp(triples_ds, pred_a: str, pred_b: str,
                    filter_pred: Optional[str] = None,
                    filter_obj: Optional[str] = None,
                    broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF,
                    n_buckets: int = 16):
    """CROSS-SUBJECT BGP joined on a shared OBJECT variable:
    ``?a pred_a ?v . ?b pred_b ?v`` (optionally ``?a filter_pred
    filter_obj``) → (a, b, v). Unlike the star shapes this join is NOT
    subject-colocated — ``?v`` values (e.g. a shared source) are
    low-cardinality hot keys, the classic skewed exchange.

    Count-gated: the (filtered) ``?a`` side's EXACT count decides —
    small → broadcast it and probe with the streaming ``?b`` side
    (hot keys cost nothing in a map-side join); large → the salted
    partitioned hash join (joins.py) whose heavy-hitter detection
    exists for exactly this key distribution."""
    import ray

    side_a = triple_pattern(triples_ds, pred=pred_a)
    if filter_pred is not None:
        fsubs = triple_pattern(triples_ds, pred=filter_pred,
                               obj_value=filter_obj) \
            .map_batches(lambda b: pa.table({"subj": b.column("subj")}),
                         batch_format="pyarrow")
        # the filter-subject set is selectivity-bounded, not
        # corpus-bounded — but a weak constant (e.g. a majority
        # language) makes it O(corpus), so this side is count-gated
        # too: broadcast is_in under the cutoff, native hash semi-join
        # above it
        if fsubs.count() <= broadcast_cutoff_rows:
            fref = ray.put(pa.concat_tables(list(fsubs.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow")))
                .column("subj").combine_chunks())

            def filt_a(batch: pa.Table) -> pa.Table:
                from ..functions.broadcast import cached_get
                return batch.filter(pc.is_in(batch.column("subj"),
                                             value_set=cached_get(fref)))

            side_a = side_a.map_batches(filt_a, batch_format="pyarrow")
        else:
            fsubs_r = fsubs.map_batches(
                lambda b: b.rename_columns(["_fsubj"]),
                batch_format="pyarrow")
            # subjects of a (pred, obj)-constant pattern are unique in
            # a deduped triple set, so this inner join is a semi-join
            # (no row multiplication)
            side_a = side_a.join(fsubs_r, "inner", n_buckets,
                                 on=("subj",), right_on=("_fsubj",))
            side_a = side_a.select_columns(
                [c for c in ("subj", "pred", "obj_kind", "obj_value",
                             "obj_datatype", "obj_lang", "graph_iri")
                 if c in side_a.schema().names])

    a_schema = pa.schema([("a", pa.string()), ("v", pa.string())])
    b_schema = pa.schema([("b", pa.string()), ("v", pa.string())])

    def proj(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({name: batch.column("subj"),
                             "v": batch.column("obj_value")})
        return fn

    side_a = side_a.map_batches(proj("a"), batch_format="pyarrow")
    side_b = (triple_pattern(triples_ds, pred=pred_b)
              .map_batches(proj("b"), batch_format="pyarrow"))
    out_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("v", pa.string())])

    if side_a.count() <= broadcast_cutoff_rows:
        import polars as pl
        a_tbl = pa.concat_tables(list(side_a.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        aref = ray.put(a_tbl.cast(a_schema))

        def probe(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            left = pl.from_arrow(cached_get(aref))
            right = pl.from_arrow(batch.cast(b_schema))
            return (left.join(right, on="v", how="inner")
                    .select(["a", "b", "v"]).to_arrow().cast(out_schema))

        return side_b.map_batches(probe, batch_format="pyarrow")

    # large path: the exchange joins on an int64 hash of the string
    # key (partitioned_hash_join's key contract), with an exact
    # equality post-filter so a hash collision can never fabricate a
    # pair; the b-side key string is carried as v_r for the filter
    from .joins import partitioned_hash_join

    def add_key(val_col: str, key_name: str, rename_to: Optional[str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pandas as pd
            vk = pd.util.hash_pandas_object(
                batch.column(val_col).to_pandas(), index=False) \
                .to_numpy().astype(np.int64)
            out = batch.append_column(key_name, pa.array(vk, pa.int64()))
            if rename_to:
                names = [rename_to if n == val_col else n
                         for n in out.schema.names]
                out = out.rename_columns(names)
            return out
        return fn

    a_keyed = side_a.map_batches(add_key("v", "_vka", None),
                                 batch_format="pyarrow")
    b_keyed = side_b.map_batches(add_key("v", "_vkb", "v_r"),
                                 batch_format="pyarrow")
    ak_schema = a_schema.append(pa.field("_vka", pa.int64()))
    bk_schema = pa.schema([("b", pa.string()), ("v_r", pa.string()),
                           ("_vkb", pa.int64())])
    joined = partitioned_hash_join(
        a_keyed, b_keyed, "_vka", "_vkb", n_buckets=n_buckets,
        left_schema=ak_schema, right_schema=bk_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.filter(pc.equal(t.column("v"), t.column("v_r")))
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "v": t.column("v")}).cast(out_schema)

    return joined.map_batches(finish, batch_format="pyarrow")


def optional_bgp(triples_ds, pred_a: str, pred_opt: str,
                 opt_obj: Optional[str] = None,
                 broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF,
                 num_partitions: int = 16):
    """OPTIONAL BGP: ``?s pred_a ?va OPTIONAL { ?s pred_opt ?vb
    [FILTER ?vb = opt_obj] }`` → (subj, va, vb) with ``vb`` null where
    the optional pattern has no match — SPARQL left-join semantics.

    Count-gated like every plan here: a small optional side broadcasts
    once and left-joins inside map_batches (no shuffle); a large one
    routes through Ray Data's native ``left_outer`` hash-shuffle
    join."""
    import ray

    out_schema = pa.schema([("subj", pa.string()), ("va", pa.string()),
                            ("vb", pa.string())])

    def proj(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"subj": batch.column("subj"),
                             name: batch.column("obj_value")})
        return fn

    left = (triple_pattern(triples_ds, pred=pred_a)
            .map_batches(proj("va"), batch_format="pyarrow"))
    right = (triple_pattern(triples_ds, pred=pred_opt, obj_value=opt_obj)
             .map_batches(proj("vb"), batch_format="pyarrow"))

    if right.count() <= broadcast_cutoff_rows:
        import polars as pl
        r_tbl = pa.concat_tables(list(right.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        rref = ray.put(r_tbl.cast(pa.schema([("subj", pa.string()),
                                             ("vb", pa.string())])))

        def fold(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            l = pl.from_arrow(batch)
            r = pl.from_arrow(cached_get(rref))
            out = l.join(r, on="subj", how="left", maintain_order="left")
            return out.select(["subj", "va", "vb"]).to_arrow() \
                .cast(out_schema)

        return left.map_batches(fold, batch_format="pyarrow")

    right_r = right.map_batches(
        lambda b: b.rename_columns(["_subj_r", "vb"]),
        batch_format="pyarrow")
    joined = left.join(right_r, "left_outer", num_partitions,
                       on=("subj",), right_on=("_subj_r",))
    return joined.select_columns(["subj", "va", "vb"])


def minus_bgp(triples_ds, pred_a: str, minus_pred: str,
              minus_obj: Optional[str] = None,
              broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF,
              num_partitions: int = 16):
    """MINUS / FILTER NOT EXISTS BGP: ``?s pred_a ?va FILTER NOT
    EXISTS { ?s minus_pred [minus_obj] }`` → (subj, va) for subjects
    with NO match of the excluded pattern — SPARQL anti-join
    semantics (MINUS and NOT EXISTS coincide on this shape: the
    patterns share ``?s``).

    Count-gated: a small excluded-subject set broadcasts once and
    each batch drops members with an inverted vectorized ``pc.is_in``
    (no shuffle); a large one routes through Ray Data's left_outer
    hash join with a null-marker filter (no native anti join)."""
    import ray

    out_schema = pa.schema([("subj", pa.string()), ("va", pa.string())])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"),
                         "va": batch.column("obj_value")}).cast(out_schema)

    left = (triple_pattern(triples_ds, pred=pred_a)
            .map_batches(proj, batch_format="pyarrow"))
    excl = triple_pattern(triples_ds, pred=minus_pred,
                          obj_value=minus_obj) \
        .map_batches(lambda b: pa.table({"subj": b.column("subj")}),
                     batch_format="pyarrow")

    if excl.count() <= broadcast_cutoff_rows:
        e_tbl = pa.concat_tables(list(excl.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        eref = ray.put(e_tbl.column("subj").combine_chunks())

        def drop(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            hit = pc.is_in(batch.column("subj"),
                           value_set=cached_get(eref))
            return batch.filter(pc.invert(hit))

        return left.map_batches(drop, batch_format="pyarrow")

    marked = excl.map_batches(
        lambda b: pa.table({"_subj_r": b.column("subj"),
                            "_seen": pa.array(
                                np.ones(b.num_rows, dtype=np.int8))}),
        batch_format="pyarrow")
    joined = left.join(marked, "left_outer", num_partitions,
                       on=("subj",), right_on=("_subj_r",))
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_seen")))
                   .select(["subj", "va"]),
        batch_format="pyarrow")


def union_bgp(triples_ds, preds):
    """UNION BGP: ``{ ?s p1 ?v } UNION { ?s p2 ?v } …`` → (subj, v),
    bag semantics (SPARQL UNION = concatenation, no dedup). Pure
    streaming: per-pattern vectorized filters unioned block-wise —
    no shuffle, no driver materialization."""
    out_schema = pa.schema([("subj", pa.string()), ("v", pa.string())])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"),
                         "v": batch.column("obj_value")}).cast(out_schema)

    sides = [triple_pattern(triples_ds, pred=p)
             .map_batches(proj, batch_format="pyarrow") for p in preds]
    acc = sides[0]
    for s in sides[1:]:
        acc = acc.union(s)
    return acc


def property_path_plus(triples_ds, pred: str,
                       broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF,
                       num_partitions: int = 16,
                       max_rounds: int = 64):
    """SPARQL property path ``?s pred+ ?o`` — the transitive closure
    of one predicate's IRI→IRI edge set → (subj, obj), set semantics
    (SPARQL paths are duplicate-free).

    Count-gated physical plans, picked from the EXACT edge count:

    - **broadcast** (edges fit the object store): the edge table is
      ``ray.put`` ONCE; each streaming batch of depth-1 edges chases
      its own subjects' chains to completion with in-batch polars
      joins against the broadcast table — rounds bounded by the
      longest path reachable from the batch. A subject whose depth-1
      edges span blocks chases the same chains in each of them, so a
      single global ``groupby(subj, obj)`` distinct closes the set
      semantics (closure size is bounded by the small edge set, so
      this exchange stays small).
    - **distributed semi-naive** (edges over the cutoff): classic
      Datalog iteration — per round the frontier Δ joins the edge set
      through Ray Data's hash-shuffle ``Dataset.join``, new pairs are
      deduplicated against the accumulated closure with a left-outer
      anti-join (cycle safety + termination), and the loop stops when
      Δ is empty. Rounds = graph depth; each round is one bounded
      all-to-all. ``max_rounds`` guards pathological depth.

    Partitioning contract for the large path: both join keys are the
    node IRI string — co-location is per-round, no global index."""
    import ray

    out_schema = pa.schema([("subj", pa.string()), ("obj", pa.string())])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"),
                         "obj": batch.column("obj_value")}).cast(out_schema)

    edges = (triple_pattern(triples_ds, pred=pred, obj_kind="iri")
             .map_batches(proj, batch_format="pyarrow"))

    if edges.count() <= broadcast_cutoff_rows:
        import polars as pl
        e_tbl = pa.concat_tables(list(edges.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        eref = ray.put(e_tbl)

        def chase(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            # (o → o2) hop table, renamed for the chain join
            hop = pl.from_arrow(cached_get(eref)) \
                    .rename({"subj": "obj", "obj": "_o2"})
            acc = pl.from_arrow(batch.cast(out_schema))
            frontier = acc
            for _ in range(max_rounds):
                nxt = (frontier.join(hop, on="obj", how="inner")
                       .select([pl.col("subj"), pl.col("_o2").alias("obj")]))
                if nxt.height == 0:
                    break
                # anti-join vs acc: dedups revisits so a cycle
                # terminates (frontier empties once nothing is new)
                nxt = nxt.unique().join(acc, on=["subj", "obj"],
                                        how="anti")
                if nxt.height == 0:
                    break
                acc = pl.concat([acc, nxt])
                frontier = nxt
            return acc.to_arrow().cast(out_schema)

        from ray.data.aggregate import Count
        # global distinct: a subject whose depth-1 edges landed in two
        # different blocks produced its converging closure pairs twice
        # (once per block) — batch-local dedup alone violates the
        # documented set semantics (round-3 ADVICE item).
        return (edges.map_batches(chase, batch_format="pyarrow")
                .groupby(["subj", "obj"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["subj", "obj"]))

    # distributed semi-naive: acc/delta live as Datasets; per round one
    # hash-shuffle join (extend) + one left-outer anti-join (dedup)
    def _rename(names):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns(names)
        return fn

    def _parts(*side_rows: int) -> int:
        # Ray's native hash join raises ``No match for FieldRef`` when
        # a per-partition side comes up EMPTY (known bug, see
        # CLAUDE.md). Clamp partitions so every partition expects
        # >= 4096 rows from the SMALLER side: tiny frontiers collapse
        # to one partition (trivially non-empty on both sides), large
        # rounds keep ``num_partitions`` where an empty partition is
        # statistically impossible.
        return max(1, min(num_partitions, min(side_rows) // 4096 + 1))

    # three consumers (hop table, acc seed, first frontier) — pin the
    # edge blocks once so the upstream filter doesn't run three times
    edges = edges.materialize()
    ecnt = edges.count()
    acc_cnt = ecnt
    hop_r = edges.map_batches(_rename(["_hs", "_ho"]),
                              batch_format="pyarrow")
    acc = edges
    delta = edges
    dcnt = ecnt
    for _ in range(max_rounds):
        nxt = (delta.join(hop_r, "inner", _parts(dcnt, ecnt),
                          on=("obj",), right_on=("_hs",))
               .select_columns(["subj", "_ho"])
               .map_batches(_rename(["subj", "obj"]),
                            batch_format="pyarrow"))
        # distinct within the round, then anti-join against acc:
        # left_outer + null-marker filter (Ray Data has no native anti)
        from ray.data.aggregate import Count
        nxt = (nxt.groupby(["subj", "obj"])
                  .aggregate(Count(alias_name="_n"))
                  .select_columns(["subj", "obj"])
                  .materialize())
        # an empty round must terminate BEFORE the anti-join: an empty
        # aggregate yields a schema-less block that breaks the join
        ncnt = nxt.count()
        if ncnt == 0:
            break
        marked = acc.map_batches(
            lambda b: b.append_column(
                "_seen", pa.array(np.ones(b.num_rows, dtype=np.int8))),
            batch_format="pyarrow").map_batches(
            _rename(["_as", "_ao", "_seen"]), batch_format="pyarrow")
        joined = nxt.join(marked, "left_outer", _parts(ncnt, acc_cnt),
                          on=("subj", "obj"), right_on=("_as", "_ao"))
        delta = joined.map_batches(
            lambda b: b.filter(pc.is_null(b.column("_seen")))
                       .select(["subj", "obj"]),
            batch_format="pyarrow").materialize()
        dcnt = delta.count()
        if dcnt == 0:
            break
        acc = acc.union(delta).materialize()
        acc_cnt += dcnt
    return acc


def property_path_seq(triples_ds, pred_1: str, pred_2: str,
                      broadcast_cutoff_rows: int = BGP_BROADCAST_ROW_CUTOFF,
                      num_partitions: int = 16):
    """SPARQL sequence path ``?s pred_1/pred_2 ?o`` — compose two
    hops through the intermediate node: ``?s pred_1 ?m . ?m pred_2
    ?o`` with ``?m`` projected away → (subj, obj), bag semantics
    (each distinct ``?m`` witness contributes a row, like SPARQL's
    BGP expansion of the path).

    Count-gated: the second hop's EXACT count decides — small →
    broadcast it once and probe per batch of the first hop (map-side
    join on the intermediate, no shuffle); large → Ray Data's native
    hash-shuffle join on the intermediate node."""
    import ray

    out_schema = pa.schema([("subj", pa.string()), ("obj", pa.string())])

    def proj(s_name, o_name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({s_name: batch.column("subj"),
                             o_name: batch.column("obj_value")})
        return fn

    hop1 = (triple_pattern(triples_ds, pred=pred_1)
            .map_batches(proj("subj", "_m"), batch_format="pyarrow"))
    hop2 = (triple_pattern(triples_ds, pred=pred_2)
            .map_batches(proj("_m", "obj"), batch_format="pyarrow"))

    if hop2.count() <= broadcast_cutoff_rows:
        import polars as pl
        h2 = pa.concat_tables(list(hop2.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        href = ray.put(h2)

        def probe(batch: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get
            right = pl.from_arrow(cached_get(href))
            left = pl.from_arrow(batch)
            return (left.join(right, on="_m", how="inner")
                    .select(["subj", "obj"]).to_arrow().cast(out_schema))

        return hop1.map_batches(probe, batch_format="pyarrow")

    hop2_r = hop2.map_batches(lambda b: b.rename_columns(["_m_r", "obj"]),
                              batch_format="pyarrow")
    return (hop1.join(hop2_r, "inner", num_partitions,
                      on=("_m",), right_on=("_m_r",))
            .select_columns(["subj", "obj"]))


def property_path_star(triples_ds, pred: str, **kwargs):
    """SPARQL ``?s pred* ?o`` = the ``pred+`` closure plus the
    zero-length path (n, n) for every node in the predicate's edge
    set (SPARQL's zero-length path over the evaluated graph's terms,
    restricted to the predicate's domain∪range — the shape a
    recursive-CTE oracle can replay)."""
    plus = property_path_plus(triples_ds, pred, **kwargs)
    out_schema = pa.schema([("subj", pa.string()), ("obj", pa.string())])

    def nodes(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            batch.column("subj").combine_chunks().cast(pa.string()),
            batch.column("obj_value").combine_chunks().cast(pa.string())])
        uniq = pc.unique(both)
        return pa.table({"subj": uniq, "obj": uniq}).cast(out_schema)

    from ray.data.aggregate import Count
    zero = (triple_pattern(triples_ds, pred=pred, obj_kind="iri")
            .map_batches(nodes, batch_format="pyarrow")
            .groupby(["subj", "obj"]).aggregate(Count(alias_name="_n"))
            .select_columns(["subj", "obj"]))
    return plus.union(zero)


def group_count_bgp(triples_ds, pred: str):
    """SPARQL GROUP BY aggregate: ``SELECT ?v (COUNT(?s) AS n)
    WHERE { ?s pred ?v } GROUP BY ?v`` → (v, n).

    Partial-aggregation discipline: each batch folds to its local
    ``value_counts`` (one row per distinct value per batch), so the
    shuffle carries O(distinct × blocks) rows, never O(corpus) — the
    pattern every grouped aggregate here uses."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("obj_value").combine_chunks())
        return pa.table({"v": vc.field("values"),
                         "n": vc.field("counts")})

    return (triple_pattern(triples_ds, pred=pred)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("n", alias_name="n")))


def filter_expr_bgp(triples_ds, pred: str, min_value: int):
    """SPARQL numeric FILTER expression: ``?s pred ?c
    FILTER(xsd:integer(?c) >= min_value)`` → (subj, c) with ``c``
    emitted as BIGINT (typed-literal comparison, not string order).
    Pure streaming: vectorized cast + compare per batch, no shuffle."""
    out_schema = pa.schema([("subj", pa.string()), ("c", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("obj_value"), pa.int64())
        keep = pc.greater_equal(c, min_value)
        return pa.table({"subj": batch.column("subj"),
                         "c": c}).filter(keep).cast(out_schema)

    return triple_pattern(triples_ds, pred=pred) \
        .map_batches(fn, batch_format="pyarrow")


def filter_regex_bgp(triples_ds, pred: str, pattern: str):
    """SPARQL ``FILTER regex(?v, pattern)`` → (subj, v). Vectorized
    RE2 via ``pc.match_substring_regex`` — the same engine DuckDB's
    ``regexp_matches`` uses, so oracle semantics match by
    construction (keep patterns inside RE2's common subset; the
    text-ops module proves the same discipline for its BPE regex)."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring_regex(batch.column("obj_value"),
                                        pattern)
        out = batch.filter(keep)
        return pa.table({"subj": out.column("subj"),
                         "v": out.column("obj_value")})

    return triple_pattern(triples_ds, pred=pred) \
        .map_batches(fn, batch_format="pyarrow")


def values_bgp(triples_ds, pred: str, values):
    """SPARQL VALUES inline data: ``VALUES ?v { v1 v2 … } . ?s pred
    ?v`` → (subj, v). The bind set is query text — tiny by
    construction — so it ships inside the task closure and each batch
    filters with one vectorized ``pc.is_in``; no shuffle, no driver
    collect."""
    vset = pa.array(list(values), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("obj_value"), value_set=vset)
        out = batch.filter(keep)
        return pa.table({"subj": out.column("subj"),
                         "v": out.column("obj_value")})

    return triple_pattern(triples_ds, pred=pred) \
        .map_batches(fn, batch_format="pyarrow")


def order_limit_bgp(triples_ds, pred: str, k: int = 100):
    """SPARQL solution modifiers ``ORDER BY DESC(xsd:integer(?c))
    LIMIT k`` over ``?s pred ?c`` → the top-k (subj, c) rows, with a
    deterministic subj tiebreak so the row SET matches any engine.

    Distributed top-k, not a full sort: each batch keeps its local
    top-k (vectorized polars sort+head), so the global sort exchange
    sees at most k × blocks rows — the events_topk_users discipline
    applied to the triple plane."""
    out_schema = pa.schema([("subj", pa.string()), ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        t = pa.table({"subj": batch.column("subj"),
                      "c": pc.cast(batch.column("obj_value"),
                                   pa.int64())})
        return (pl.from_arrow(t)
                .sort(["c", "subj"], descending=[True, False])
                .head(k).to_arrow().cast(out_schema))

    return (triple_pattern(triples_ds, pred=pred)
            .map_batches(partial, batch_format="pyarrow")
            .sort(["c", "subj"], descending=[True, False])
            .limit(k))


def distinct_values_bgp(triples_ds, pred: str):
    """``SELECT DISTINCT ?v WHERE { ?s pred ?v }`` → (v). Batch-local
    ``pc.unique`` bounds the distinct shuffle to O(distinct × blocks)
    rows; the groupby-aggregate form (not map_groups — distinct
    groups are mostly singletons, ~ms of overhead per group)."""
    from ray.data.aggregate import Count

    def local(batch: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.unique(batch.column("obj_value").combine_chunks())})

    return (triple_pattern(triples_ds, pred=pred)
            .map_batches(local, batch_format="pyarrow")
            .groupby("v").aggregate(Count(alias_name="_n"))
            .select_columns(["v"]))


def group_avg_bgp(triples_ds, group_pred: str, value_pred: str,
                  scale: int = 100):
    """SPARQL AVG aggregate: ``SELECT ?v (AVG(xsd:integer(?x)) AS a)
    WHERE { ?s group_pred ?v . ?s value_pred ?x } GROUP BY ?v`` →
    (v, avg_c) with the average integer-scaled as
    ``(Σx · scale) // n`` so both engines hash-match exactly (floats
    never do — the oracle discipline of every money aggregate here).

    Partial-agg: each batch folds to per-group (Σx, n) pairs, the
    shuffle carries O(groups × blocks) rows, and the division happens
    once after the global sum (averages of averages are wrong under
    skewed batch sizes)."""
    from ray.data.aggregate import Sum

    part_schema = pa.schema([("v", pa.string()), ("s", pa.int64()),
                             ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(pa.table({
            "v": batch.column("va"),
            "x": pc.cast(batch.column("vb"), pa.int64())}))
        g = d.group_by("v").agg(pl.col("x").sum().alias("s"),
                                pl.len().alias("n"))
        return g.to_arrow().cast(part_schema)

    summed = (bgp_join(triples_ds, group_pred, value_pred)
              .map_batches(partial, batch_format="pyarrow")
              .groupby("v").aggregate(Sum("s", alias_name="s"),
                                      Sum("n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": batch.column("v"),
            "avg_c": pa.array((s * scale) // n, pa.int64())})

    return summed.map_batches(finish, batch_format="pyarrow")


def property_path_alt(triples_ds, pred_1: str, pred_2: str):
    """SPARQL alternative path: ``?s (p1|p2) ?o`` → DISTINCT
    (subj, obj) pairs reachable by either predicate (path results are
    SET-semantic, unlike UNION's bag). One streaming vectorized
    ``is_in`` filter over the predicate column; the distinct rides
    batch-local ``unique`` + the distinct groupby (the
    distinct_values_bgp discipline applied to pairs)."""
    from ray.data.aggregate import Count

    pset = pa.array([pred_1, pred_2], pa.string())

    def local(batch: pa.Table) -> pa.Table:
        import polars as pl
        keep = pc.is_in(batch.column("pred"), value_set=pset)
        out = batch.filter(keep)
        t = pa.table({"subj": out.column("subj"),
                      "obj": out.column("obj_value")})
        return pl.from_arrow(t).unique().to_arrow().cast(t.schema)

    return (triples_ds.map_batches(local, batch_format="pyarrow")
            .groupby(["subj", "obj"]).aggregate(Count(alias_name="_n"))
            .select_columns(["subj", "obj"]))


def negated_property_set_bgp(triples_ds, excluded):
    """SPARQL negated property set: ``?s !(p1|…|pk) ?o`` →
    (subj, p, o) for every triple whose predicate is NOT in the
    excluded set. Pure streaming: one inverted vectorized ``is_in``
    per batch, no shuffle (the predicate set is query text, shipped
    in the task closure)."""
    pset = pa.array(list(excluded), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch.column("pred"),
                                  value_set=pset))
        out = batch.filter(keep)
        return pa.table({"subj": out.column("subj"),
                         "p": out.column("pred"),
                         "o": out.column("obj_value")})

    return triples_ds.map_batches(fn, batch_format="pyarrow")


def having_bgp(triples_ds, pred: str, min_n: int):
    """SPARQL HAVING: ``SELECT ?v (COUNT(?s) AS n) WHERE { ?s pred
    ?v } GROUP BY ?v HAVING (COUNT(?s) >= min_n)`` → (v, n). The
    group_count plan plus a post-aggregate streaming filter — the
    threshold can only be applied AFTER the global sum (a group can
    cross it only globally; the ngram_counts lesson)."""

    def threshold(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("n"), min_n))

    return group_count_bgp(triples_ds, pred) \
        .map_batches(threshold, batch_format="pyarrow")


def group_minmax_bgp(triples_ds, group_pred: str, value_pred: str):
    """SPARQL MIN/MAX aggregates: ``SELECT ?v (MIN(xsd:integer(?x))
    AS min_c) (MAX(...) AS max_c) WHERE { ?s group_pred ?v . ?s
    value_pred ?x } GROUP BY ?v`` → (v, min_c, max_c). Min/max fold
    losslessly through partials (unlike AVG, no scaling dance
    needed): each batch reduces to one row per group, the shuffle
    carries O(groups × blocks) rows."""
    from ray.data.aggregate import Max, Min

    part_schema = pa.schema([("v", pa.string()), ("mn", pa.int64()),
                             ("mx", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(pa.table({
            "v": batch.column("va"),
            "x": pc.cast(batch.column("vb"), pa.int64())}))
        g = d.group_by("v").agg(pl.col("x").min().alias("mn"),
                                pl.col("x").max().alias("mx"))
        return g.to_arrow().cast(part_schema)

    return (bgp_join(triples_ds, group_pred, value_pred)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Min("mn", alias_name="min_c"),
                                    Max("mx", alias_name="max_c")))


def construct_bgp(triples_ds, filter_pred: str, filter_obj: str,
                  value_pred: str, new_pred: str,
                  graph_iri: str = "urn:graph:derived", **kwargs):
    """SPARQL CONSTRUCT: ``CONSTRUCT { ?s <new_pred> ?vb } WHERE
    { ?s filter_pred filter_obj . ?s value_pred ?vb }`` → a NEW triple
    stream carrying the engine's TERM columns (subj, pred, obj_kind,
    obj_value, obj_datatype, obj_lang, graph_iri — the set the NT
    renderer consumes; the extract pipeline's lineage columns
    doc_rank/span_idx are intentionally absent, as CONSTRUCTed triples
    have no source span). Planning is the star-BGP planner's
    (count-gated); the template rewrite is a vectorized per-batch
    projection."""
    out_schema = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()),
        ("obj_kind", pa.string()), ("obj_value", pa.string()),
        ("obj_datatype", pa.string()), ("obj_lang", pa.string()),
        ("graph_iri", pa.string()),
    ])

    matched = star_bgp(triples_ds, [(filter_pred, filter_obj),
                                    (value_pred, "?vb")], **kwargs)

    def template(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "subj": batch.column("subj"),
            "pred": pa.array(np.repeat(new_pred, n), pa.string()),
            "obj_kind": pa.array(np.repeat("literal", n), pa.string()),
            "obj_value": batch.column("vb"),
            "obj_datatype": pa.nulls(n, pa.string()),
            "obj_lang": pa.nulls(n, pa.string()),
            "graph_iri": pa.array(np.repeat(graph_iri, n), pa.string()),
        }).cast(out_schema)

    return matched.map_batches(template, batch_format="pyarrow")


def group_concat_bgp(triples_ds, group_pred: str, value_pred: str,
                     sep: str = ","):
    """SPARQL GROUP_CONCAT aggregate:
    ``SELECT ?v (GROUP_CONCAT(DISTINCT ?w; separator=sep) AS vals)
    WHERE { ?s group_pred ?v . ?s value_pred ?w } GROUP BY ?v`` with
    the concat ORDERED so the result is deterministic → (v, vals).

    Plan: subject-join the two patterns (the count-gated bgp
    machinery), fold to DISTINCT (v, w) pairs batch-locally then
    globally (the distinct shuffle carries O(distinct × blocks)
    rows), and concat per group with ``map_groups`` — group count =
    the group variable's cardinality, each group's value list is the
    distinct-value set, both bounded far below corpus size."""
    import pandas as pd

    from ray.data.aggregate import Count

    joined = bgp_join(triples_ds, group_pred, value_pred)

    def local_distinct(batch: pa.Table) -> pa.Table:
        tbl = pa.table({"v": batch.column("va"),
                        "w": batch.column("vb")})
        import polars as pl
        return (pl.from_arrow(tbl).unique().to_arrow()
                .cast(pa.schema([("v", pa.string()),
                                 ("w", pa.string())])))

    pairs = (joined.map_batches(local_distinct, batch_format="pyarrow")
             .groupby(["v", "w"]).aggregate(Count(alias_name="_n"))
             .select_columns(["v", "w"]))

    def concat(group: pd.DataFrame) -> pd.DataFrame:
        vals = sep.join(sorted(group["w"]))
        return pd.DataFrame({"v": [group["v"].iloc[0]], "vals": [vals]})

    return pairs.groupby("v").map_groups(concat, batch_format="pandas")


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


def ask_report(triples_ds, probes):
    """SPARQL ASK over several patterns at once → (probe, ask) with
    ``ask`` as BIGINT 0/1 (booleans hash differently across engines;
    the 0/1 contract follows the CLAUDE.md integer-emission rule).

    ``probes`` is ``[(name, pattern_kwargs), ...]``. Each ASK is a
    ``limit(1)`` over the vectorized pattern filter — the streaming
    executor short-circuits as soon as one matching block exists, so
    a true ASK touches O(one block), and a false one is a single
    column-pruned scan. Reference: SOP.asset_exists issues exactly
    this shape (rdfx/persistence_systems.py ASK query)."""
    names, flags = [], []
    for name, pattern in probes:
        hit = triple_pattern(triples_ds, **pattern).limit(1)
        names.append(name)
        flags.append(1 if len(hit.take(1)) > 0 else 0)
    return pa.table({"probe": pa.array(names, pa.string()),
                     "ask": pa.array(flags, pa.int64())})


def bind_strlen_bgp(triples_ds, pred: str):
    """SPARQL BIND expression: ``?s pred ?v . BIND(STRLEN(?v) AS
    ?len)`` → (subj, v, len). Pure streaming: one vectorized
    ``utf8_length`` per batch (codepoint semantics, matching DuckDB's
    LENGTH), no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column("obj_value")
        return pa.table({
            "subj": batch.column("subj"), "v": v,
            "len": pc.cast(pc.utf8_length(v), pa.int64())})

    return triple_pattern(triples_ds, pred=pred) \
        .map_batches(fn, batch_format="pyarrow")


def property_path_inverse(triples_ds, pred: str):
    """SPARQL inverse path: ``?s ^pred ?o`` ≡ ``?o pred ?s`` →
    (subj, obj) with the roles swapped. Pure streaming: the pattern
    filter plus a column swap per batch — the inverse of a path is a
    relabeling, not a different access pattern, so it costs exactly
    what the forward path costs."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("obj_value"),
                         "obj": batch.column("subj")})

    return triple_pattern(triples_ds, pred=pred) \
        .map_batches(fn, batch_format="pyarrow")


def property_path_zero_or_one(triples_ds, pred: str):
    """SPARQL ``?s pred? ?o`` — the one-step pairs plus the
    zero-length path (n, n) for every node in the predicate's edge
    set (same zero-length-term convention as ``property_path_star``,
    which a plain-SQL oracle can replay; on a loop-free relation the
    two parts are disjoint, so bag union = set union)."""
    out_schema = pa.schema([("subj", pa.string()), ("obj", pa.string())])

    def one_step(batch: pa.Table) -> pa.Table:
        return pa.table({"subj": batch.column("subj"),
                         "obj": batch.column("obj_value")}) \
            .cast(out_schema)

    def nodes(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            batch.column("subj").combine_chunks().cast(pa.string()),
            batch.column("obj_value").combine_chunks().cast(pa.string())])
        uniq = pc.unique(both)
        return pa.table({"subj": uniq, "obj": uniq}).cast(out_schema)

    from ray.data.aggregate import Count
    edges = triple_pattern(triples_ds, pred=pred, obj_kind="iri")
    one = edges.map_batches(one_step, batch_format="pyarrow")
    zero = (edges.map_batches(nodes, batch_format="pyarrow")
            .groupby(["subj", "obj"]).aggregate(Count(alias_name="_n"))
            .select_columns(["subj", "obj"]))
    return one.union(zero)


def group_count_distinct_bgp(triples_ds, group_pred: str,
                             value_pred: str):
    """SPARQL COUNT(DISTINCT ?v) aggregate over a two-pattern BGP:
    ``?s group_pred ?g . ?s value_pred ?v`` → (g, n_distinct). The
    subject join rides the count-gated BGP planner; the distinct
    stacks batch-local unique → the distinct groupby → an O(groups)
    count (the events_distinct_users discipline in triple space)."""
    from ray.data.aggregate import Count

    joined = bgp_join(triples_ds, group_pred, value_pred)

    def local_distinct(batch: pa.Table) -> pa.Table:
        import polars as pl
        t = batch.select(["va", "vb"])
        return pl.from_arrow(t).unique().to_arrow().cast(t.schema)

    return (joined.map_batches(local_distinct, batch_format="pyarrow")
            .groupby(["va", "vb"]).aggregate(Count(alias_name="_n"))
            .select_columns(["va", "vb"])
            .groupby("va").aggregate(Count(alias_name="n_distinct"))
            .map_batches(lambda b: b.rename_columns(["g", "n_distinct"]),
                         batch_format="pyarrow"))
