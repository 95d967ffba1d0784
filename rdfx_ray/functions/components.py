"""Distributed connected components over an edge Dataset — the
10^12-doc path for dedup component resolution (referenced by
``dedup_corpus``'s docstring): iterative min-label propagation, each
round one partial-aggregated groupby, no driver-side graph state.

Algorithm (standard large-star/small-star-style simplification):
labels start as each node's own id; every round, each node adopts the
minimum label among itself and its neighbours; converged when no label
changes. Rounds are O(component diameter) — near-dup components are
shallow (stars/cliques around a keeper), so 3-5 rounds typically
suffice; the round count and per-round changed-label counts are
returned for observability.

Ray Data shape per round::

    edges ∪ reversed(edges) ∪ self-loops
      → attach current label of src (broadcast or join)
      → groupby(dst).aggregate(Min(label))          # the only shuffle
      → compare to previous labels (count changes)

The label table is itself a Dataset; for bench-scale inputs the
labels fit comfortably in the object store, and at full scale the
same loop runs with the label attach as a bucket-partitioned join
(labels are (int64, int64) — tiny relative to the corpus).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


def _cluster_cpus(default: int = 8) -> int:
    import ray

    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def _auto_buckets(n_rows: int, target_rows: int = 1 << 17,
                  hi: int = 512) -> int:
    """Bucket count for the pinned-edge iterative layouts
    (components / pagerank join route / BFS): one bucket is ONE Arrow
    table in plasma, so its row count must stay ~``target_rows``
    regardless of graph size — a fixed default of 16 puts ~6% of a
    100×-scale edge set on a single object (round-4 VERDICT #2).
    Floored at the cluster CPU count so small graphs keep full task
    parallelism; capped so the per-round exchange fan-out stays
    bounded. Derived per call from the EXACT row count (the house
    never-guess-count rule), not persisted — the pinned tables live
    only for the call."""
    need = -(-n_rows // target_rows) if n_rows > 0 else 1
    return int(max(1, min(hi, max(_cluster_cpus(), need))))


def connected_components(edges: pa.Table, max_rounds: int = 50
                         ) -> Tuple[pa.Table, Dict]:
    """Min-label propagation over an edge table (doc_a, doc_b).
    Returns ((node, label) table, stats). Nodes = every id appearing
    in an edge; isolated nodes are their own label by definition and
    need not appear.

    The edge table here is candidate-pair-sized (bounded by the dup
    rate); each round is one distributed groupby over it. Labels are
    carried as a broadcast numpy pair (node_ids, labels) — two int64
    arrays, orders of magnitude smaller than any corpus — and
    re-broadcast per round.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    a = edges.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = edges.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(a) == 0:
        return (pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())}),
                {"rounds": 0, "changed": []})

    # symmetric closure + self-loops, built once
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = np.unique(src)
    src = np.concatenate([src, nodes])
    dst = np.concatenate([dst, nodes])
    edge_ds = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    })).materialize()

    labels = nodes.copy()  # label[i] belongs to nodes[i] (sorted)
    changed_per_round = []
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        lab_ref = ray.put((nodes, labels))

        def attach(batch: pa.Table) -> pa.Table:
            from .broadcast import cached_get
            nds, lbs = cached_get(lab_ref)
            s = batch.column("src").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nds, s)
            return pa.table({
                "dst": batch.column("dst"),
                "label": pa.array(lbs[pos], pa.int64()),
            })

        agg = (edge_ds.map_batches(attach, batch_format="pyarrow")
               .groupby("dst").aggregate(Min("label", alias_name="label"))
               .to_pandas())
        agg = agg.sort_values("dst")
        new_labels = agg["label"].to_numpy()
        # groupby covers every node (self-loops guarantee presence)
        changed = int((new_labels != labels).sum())
        changed_per_round.append(changed)
        labels = new_labels
        if changed == 0:
            break

    return (pa.table({"node": pa.array(nodes, pa.int64()),
                      "label": pa.array(labels, pa.int64())}),
            {"rounds": rounds, "changed": changed_per_round})


def union_find_components(edges: pa.Table) -> pa.Table:
    """Driver-side union-find over the same edge table (the small-set
    strategy used by ``dedup_corpus``) — kept as the oracle for the
    distributed propagation."""
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(edges.column("doc_a").to_pylist(),
                    edges.column("doc_b").to_pylist()):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    nodes = sorted({int(v) for col in ("doc_a", "doc_b")
                    for v in edges.column(col).to_pylist()})
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "label": pa.array([find(n) for n in nodes], pa.int64()),
    })


# ---------------------------------------------------------------------------
# PageRank — the iterative rank-propagation operator
# ---------------------------------------------------------------------------

PAGERANK_BROADCAST_CUTOFF = 2_000_000
# distinct nodes under which the pinned-edges actor route applies (the
# rank/outdeg vector must fit one machine — the Pregel-aggregator
# compromise; above it the per-round join route keeps rank distributed)
PAGERANK_PINNED_NODES_CUTOFF = 50_000_000


def pagerank_pinned(edges_ds, n: int, node_idx: "pd.Series",
                    outdeg: np.ndarray, damping: float = 0.85,
                    n_iter: int = 20, n_actors: int = 8) -> pa.Table:
    """PageRank with the edge set partitioned ONCE into long-lived
    actors — per round the only bytes that move are the O(nodes) rank
    vector (one ``ray.put``, object-store-shared per physical node)
    and the per-actor partial destination sums (≤ distinct dst per
    slice). The edges NEVER re-shuffle, versus two O(edges) exchanges
    per round in the join route — the dominant cost when
    edges ≫ nodes (the usual citation/web-graph regime).

    Partitioning assumption (documented per the custom-operator rule):
    the (node, rank, outdeg) vector fits one machine's memory while
    the edge set need not — callers gate on
    ``PAGERANK_PINNED_NODES_CUTOFF``. Edge slices need NO src
    co-location (any partition of the edge bag gives the same partial
    sums), so the setup cost is zero exchanges: actors adopt the
    scan's existing blocks by object ref.
    """
    import ray

    @ray.remote(num_cpus=1)
    class EdgeSlice:
        def __init__(self, block_refs, idx):
            # idx arrives by ref (ray.put once, top-level arg
            # auto-deref); block refs ride inside a list so they stay
            # refs until the explicit get (zero-copy within a node)
            tbls = ray.get(list(block_refs))
            t = pa.concat_tables(tbls) if tbls else None
            if t is None or t.num_rows == 0:
                self.s = self.d = np.zeros(0, np.int64)
                return
            # map endpoint strings to the shared node index ONCE —
            # the per-round hot loop is pure integer numpy
            self.s = idx.loc[t.column("src").to_pylist()] \
                .to_numpy(np.int64)
            self.d = idx.loc[t.column("dst").to_pylist()] \
                .to_numpy(np.int64)

        def contrib(self, w):
            # w arrives by ref (ray.put once per round) — the object
            # store shares one copy per physical node
            c = np.zeros(len(w))
            np.add.at(c, self.d, w[self.s])
            # return only touched entries (≤ distinct dst per slice)
            nz = np.nonzero(c)[0]
            return nz, c[nz]

    blocks = edges_ds.to_arrow_refs()
    idx_ref = ray.put(node_idx)
    # cap the pool by the cluster's CPUs (minus one for the driver
    # loop) — more pending actors than schedulable CPUs deadlocks the
    # first ray.get forever (the library's actor-pool starvation rule)
    cpus = int(ray.cluster_resources().get("CPU", 1))
    pool = max(1, min(n_actors, cpus - 1 if cpus > 1 else 1,
                      max(len(blocks), 1)))
    # stride by the ACTUAL pool size so every block is owned
    actors = [EdgeSlice.remote(blocks[i::pool], idx_ref)
              for i in range(pool)]

    rank = np.full(n, 1.0 / n)
    safe_deg = np.maximum(outdeg, 1.0)
    dangling_mask = outdeg == 0
    for _ in range(n_iter):
        w_ref = ray.put(rank / safe_deg)
        parts = ray.get([a.contrib.remote(w_ref) for a in actors])
        contrib = np.zeros(n)
        for nz, vals in parts:
            contrib[nz] += vals
        dangling = rank[dangling_mask].sum()
        rank = ((1.0 - damping) / n
                + damping * (contrib + dangling / n))
    return pa.table({
        "node": pa.array(node_idx.index.tolist(), pa.string()),
        "rank_1e9": pa.array(
            np.floor(rank * 1e9 + 0.5).astype(np.int64), pa.int64()),
    })


def pagerank(edges_ds, damping: float = 0.85, n_iter: int = 20,
             broadcast_cutoff_rows: int = PAGERANK_BROADCAST_CUTOFF,
             pinned_nodes_cutoff: int = PAGERANK_PINNED_NODES_CUTOFF,
             num_partitions: int | None = None,
             large_route: str = "sharded") -> pa.Table:
    """PageRank over an edge Dataset (src, dst string columns), fixed
    ``n_iter`` power iterations with uniform teleport and dangling-
    mass redistribution → (node, rank_1e9) with rank integer-scaled
    for stable comparison (∑rank = 1).

    Count-gated like every plan in this engine — the EXACT edge count
    decides:

    - **small** (fits the object store): edges collect ONCE to the
      driver; the iteration is a numpy scatter-add per round (node
      index space, no string work in the loop).
    - **large** (nodes beyond the pinned cutoff): default
      ``large_route="sharded"`` — the Pregel layout of
      ``pagerank_sharded`` (edges AND rank both sharded; per-round
      bytes = partial dst sums only). ``large_route="join"`` keeps
      the Dataset route below as the API-level twin: the rank table
      lives as a Dataset keyed by node. Edges are hash(src)-bucketed
      ONCE into pinned object-store tables; per round a SINGLE
      ``_round_batch`` pass over the rank Dataset emits each block's
      rank rows plus its locally pre-folded (dst, c) contribution
      partials, and the ONE exchange per round is the int64-bucketed
      ``groupby(_jb)`` that co-locates them for the per-bucket rank
      update — no JoinOperator anywhere in the loop, no string keys
      in the shuffle plane, and no union of two branches (both
      measured hazards; see BASELINE.md round 4: 92.1 s → 11.4 s at
      1M edges × 10 rounds). Dangling mass is a streaming scalar
      aggregate per round. State per round is the (node, rank,
      outdeg) table — O(nodes), never O(edges) on the driver.

    Rounds are a fixed count (not convergence-tested) so both routes
    and reruns produce identical iteration structure.
    """
    import ray
    import ray.data as rd

    n_edge_rows = edges_ds.count()
    if n_edge_rows <= broadcast_cutoff_rows:
        tbl = pa.concat_tables(list(edges_ds.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        src = np.asarray(tbl.column("src").to_pylist(), dtype=object)
        dst = np.asarray(tbl.column("dst").to_pylist(), dtype=object)
        nodes, inv = np.unique(np.concatenate([src, dst]),
                               return_inverse=True)
        s_idx, d_idx = inv[:len(src)], inv[len(src):]
        n = len(nodes)
        outdeg = np.bincount(s_idx, minlength=n).astype(np.float64)
        rank = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            contrib = np.zeros(n)
            w = rank[s_idx] / outdeg[s_idx]
            np.add.at(contrib, d_idx, w)
            dangling = rank[outdeg == 0].sum()
            rank = ((1.0 - damping) / n
                    + damping * (contrib + dangling / n))
        return pa.table({
            "node": pa.array(nodes.tolist(), pa.string()),
            "rank_1e9": pa.array(
                np.floor(rank * 1e9 + 0.5).astype(np.int64), pa.int64()),
        })

    # ---- distributed routes -----------------------------------------------
    # normalize to ARROW blocks first: a pandas-backed edge Dataset
    # (e.g. straight out of from_pandas) makes the sort-shuffle
    # aggregate plane ~50× slower (measured 7 s vs >240 s on a 1M-row
    # string groupby) — every aggregate below keys on these blocks
    edges = edges_ds.map_batches(
        lambda b: b, batch_format="pyarrow").materialize()
    # bucket count from the exact edge count (one pinned table per
    # bucket; see _auto_buckets) unless the caller pins it
    B = (num_partitions if num_partitions is not None
         else _auto_buckets(n_edge_rows))

    # the (node, outdeg) table in ONE int64-bucketed exchange: each
    # batch pre-folds its endpoints locally (polars), tags rows with
    # the node's owner bucket, and the per-bucket final sums. The
    # previous form — a string-keyed distinct over src ∪ dst PLUS a
    # string-keyed outdegree groupby PLUS their left-outer join — was
    # the route's real cost at the 1M-edge point: 29 s + 27 s of
    # string sort-exchange against ~2 s for this int64 one (the
    # CLAUDE.md string-keys-never-enter-the-shuffle-plane rule).
    def endpoint_partial(b: pa.Table) -> pa.Table:
        import polars as pl
        s, d = b.column("src"), b.column("dst")
        names = pa.chunked_array([s, d]).combine_chunks()
        is_src = np.concatenate([np.ones(len(s), np.int64),
                                 np.zeros(len(d), np.int64)])
        g = (pl.DataFrame({"node": pl.from_arrow(names),
                           "n_src": is_src})
             .group_by("node").agg(pl.col("n_src").sum()))
        nd = np.asarray(g["node"].to_numpy(), dtype=object)
        return pa.table({
            "node": pa.array(nd, pa.string()),
            "outdeg": pa.array(
                g["n_src"].to_numpy().astype(np.float64),
                pa.float64()),
            "_jb": pa.array(_owner_of(nd, B), pa.int64())})

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", as_index=False)["outdeg"].sum()
        return pd.DataFrame({
            "node": m["node"].to_numpy(),
            "outdeg": m["outdeg"].to_numpy(np.float64)})

    node_deg = (edges.map_batches(endpoint_partial,
                                  batch_format="pyarrow")
                .groupby("_jb")
                .map_groups(bucket_fold, batch_format="pandas")
                .repartition(B).materialize())
    n = node_deg.count()

    if n <= pinned_nodes_cutoff:
        # pinned-edges route: rank vector fits one machine; edges are
        # adopted by actors once and never re-shuffled
        nd_tbl = pa.concat_tables(list(node_deg.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        node_idx = pd.Series(np.arange(n, dtype=np.int64),
                             index=nd_tbl.column("node").to_pylist())
        outdeg = nd_tbl.column("outdeg") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pagerank_pinned(edges, n, node_idx, outdeg,
                               damping=damping, n_iter=n_iter)

    if large_route == "sharded":
        return pagerank_sharded(edges, damping=damping, n_iter=n_iter,
                                n_edges=n_edge_rows)

    ranks = (node_deg.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, 1.0 / n),
                             pa.float64())),
        batch_format="pyarrow").materialize())

    # bucket the edge set by hash(src) ONCE: each bucket becomes one
    # object-store arrow table (ray.put inside the map_groups task —
    # the putting worker owns the object and Ray keeps owner processes
    # alive while their objects are referenced). Per round, only the
    # rank-weight table re-buckets; each bucket's join runs locally
    # against its pinned edge table.
    def _tag_src(b: pa.Table) -> pa.Table:
        jb = _owner_of(b.column("src").to_pylist(), B)
        return b.append_column("_jb", pa.array(jb, pa.int64()))

    def _adopt(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.table({"src": pa.array(g["src"], pa.string()),
                      "dst": pa.array(g["dst"], pa.string())})
        # list-wrapped so the ref survives the dataframe round-trip
        # as a REF (top-level ObjectRef args auto-deref; cell values
        # inside blocks keep their identity)
        return pd.DataFrame({"jb": [int(g["_jb"].iloc[0])],
                             "ref": [[ray.put(t)]]})

    adopted = (edges.map_batches(_tag_src, batch_format="pyarrow")
               .groupby("_jb").map_groups(_adopt, batch_format="pandas")
               .to_pandas())  # B rows: one (bucket, ref) each
    bucket_refs = {int(r.jb): r.ref[0] for r in adopted.itertuples()}
    bref = ray.put(bucket_refs)

    # union-plane schema: rank rows (kind 0) carry outdeg; contrib
    # rows (kind 1) carry the presummed partial c; _jb keys the ONE
    # int64-bucket exchange per round (string keys never enter the
    # shuffle plane — a 1M-row string aggregate measures ~7 s where
    # the int64-bucket exchange measures ~0.7 s)
    union_schema = pa.schema([
        ("node", pa.string()), ("outdeg", pa.float64()),
        ("c", pa.float64()), ("kind", pa.int8()),
        ("_jb", pa.int64())])

    def _round_batch(b: pa.Table) -> pa.Table:
        """One rank block → its kind-0 rank rows PLUS the kind-1
        presummed (dst, c) partials in ONE pass (a single branch on
        purpose: the union-of-two-branches layout left both map
        operators stuck 'running' for ~40 s/round at small CPU
        counts in the components twin of this loop). Contribution
        slices group by src-bucket locally and join against their
        PINNED edge tables (plasma read; polars conversions cached
        per worker+ref in _pl_bucket_cache — bounded by edges/B ×
        the buckets this worker touches; pagerank_sharded remains
        the default scale path)."""
        import polars as pl

        from .broadcast import cached_get
        names_all = np.asarray(b.column("node").to_pylist(),
                               dtype=object)
        n_rows = b.num_rows
        rank_rows = pa.table({
            "node": b.column("node"),
            "outdeg": b.column("outdeg"),
            "c": pa.array(np.zeros(n_rows), pa.float64()),
            "kind": pa.array(np.zeros(n_rows, np.int8)),
            "_jb": pa.array(_owner_of(names_all, B), pa.int64()),
        }).cast(union_schema)

        deg = b.column("outdeg").to_numpy()
        keep = deg > 0.0  # dangling rows contribute nothing
        if not keep.any():
            return rank_rows
        refs = cached_get(bref)
        names = names_all[keep]
        w = (b.column("rank").to_numpy(zero_copy_only=False)[keep]
             / deg[keep])
        jb = _owner_of(names, B)
        order = np.argsort(jb, kind="stable")
        jb_s, names_s, w_s = jb[order], names[order], w[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], jb_s[1:] != jb_s[:-1]]))
        bounds = np.append(bounds, len(jb_s))
        outs = []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            ref = refs.get(int(jb_s[s]))
            if ref is None:
                continue
            key = ref.hex()
            et = _pl_bucket_cache.get(key)
            if et is None:
                et = pl.from_arrow(ray.get(ref))
                _pl_bucket_cache[key] = et
            r = pl.DataFrame({"src": names_s[s:e], "w": w_s[s:e]})
            j = et.join(r, on="src", how="inner")
            # per-slice presum: ≤ distinct dst rows move on
            outs.append(j.group_by("dst")
                        .agg(pl.col("w").sum().alias("c")))
        if not outs:
            return rank_rows
        out = pl.concat(outs)
        dsts = np.asarray(out["dst"].to_numpy(), dtype=object)
        nc = len(dsts)
        contrib_rows = pa.table({
            "node": pa.array(dsts, pa.string()),
            "outdeg": pa.array(np.zeros(nc), pa.float64()),
            "c": pa.array(out["c"].to_numpy(), pa.float64()),
            "kind": pa.array(np.ones(nc, np.int8)),
            "_jb": pa.array(_owner_of(dsts, B), pa.int64()),
        }).cast(union_schema)
        return pa.concat_tables([rank_rows, contrib_rows]) \
            .combine_chunks()

    def _dangle_partial(b: pa.Table) -> pa.Table:
        deg = b.column("outdeg").to_numpy()
        r = b.column("rank").to_numpy()
        return pa.table({"d": pa.array([float(r[deg == 0.0].sum())],
                                       pa.float64())})

    rank_schema = pa.schema([
        ("node", pa.string()), ("outdeg", pa.float64()),
        ("rank", pa.float64())])

    for _ in range(n_iter):
        # per-block partials only reach the driver (O(blocks) floats),
        # never the O(nodes) rank rows
        dangling = float(ranks.map_batches(
            _dangle_partial, batch_format="pyarrow").sum("d") or 0.0)
        base = (1.0 - damping) / n + damping * dangling / n

        def update_bucket(g: pd.DataFrame, base=base) -> pd.DataFrame:
            r = g.loc[g["kind"] == 0, ["node", "outdeg"]]
            c = (g.loc[g["kind"] == 1, ["node", "c"]]
                 .groupby("node", as_index=False)["c"].sum())
            m = r.merge(c, on="node", how="left")
            csum = np.nan_to_num(m["c"].to_numpy(np.float64))
            return pd.DataFrame({
                "node": m["node"].to_numpy(),
                "outdeg": m["outdeg"].to_numpy(np.float64),
                "rank": base + damping * csum,
            })

        # the ONE exchange per round: rank rows + presummed contrib
        # rows (both emitted by the SINGLE _round_batch pass — see
        # its docstring for why not a union of two branches),
        # co-located by the int64 node-owner bucket; per-bucket local
        # merge computes the new ranks (no JoinOperator, no string
        # keys in the shuffle plane). The trailing repartition(B) is
        # load-bearing: without the cap, iterative block counts grow
        # per round and by round ~10 the sort plans over thousands of
        # near-empty blocks (measured: a 500-node 10-round run blew
        # past 400 s and a 13 GB driver-memory estimate; with the cap
        # it is seconds).
        ranks = (ranks.map_batches(_round_batch,
                                   batch_format="pyarrow",
                                   batch_size=None)
                 .groupby("_jb")
                 .map_groups(update_bucket, batch_format="pandas")
                 .map_batches(lambda b: b.cast(rank_schema),
                              batch_format="pyarrow")
                 .repartition(B)
                 .materialize())

    return ranks.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "rank_1e9": pa.array(
                np.floor(b.column("rank").to_numpy() * 1e9 + 0.5)
                .astype(np.int64), pa.int64())}),
        batch_format="pyarrow")


def citation_pagerank(sf_dir: str, n_iter: int = 20) -> "object":
    """PageRank over the sdo:citation relation (the chain-structured
    doc graph the property-path queries use)."""
    from .doc_triples import doc_citation_triples

    edges = doc_citation_triples(sf_dir).map_batches(
        lambda b: pa.table({"src": b.column("subj"),
                            "dst": b.column("obj_value")}),
        batch_format="pyarrow")
    return pagerank(edges, n_iter=n_iter)


# ---------------------------------------------------------------------------
# Dataset-native connected components + the SQL-oracled citation query
# ---------------------------------------------------------------------------

COMPONENTS_DRIVER_CUTOFF = 2_000_000


def connected_components_ds(edges_ds, nodes_ds, max_rounds: int = 50,
                            num_partitions: int | None = None,
                            n_edges: int | None = None):
    """Min-label propagation with labels AND edges living as Datasets
    end to end — the route for graphs whose label table exceeds one
    machine (the broadcast-label `connected_components` re-ships the
    O(nodes) label pair per round; this one never collects it).

    ``edges_ds``: (src, dst) int64 pairs (one direction; the
    symmetric closure is built here once). ``nodes_ds``: (node,)
    int64 — every node, including isolated ones (they keep their own
    label, matching the recursive-CTE semantics of the oracle).

    The round shape is the PageRank join-route layout — a per-round
    JoinOperator measured 50 s/round at 1M edges, so edges are
    hash(src)-bucketed ONCE into pinned object-store tables; per
    round only the O(nodes) label table moves, through a single
    int64-bucketed union exchange: label rows (kind 0) ∪ per-slice
    pre-minned (dst, lab) candidates (kind 1), co-located by node
    owner, merged per bucket in polars. Convergence is the label-sum
    fixpoint (labels only ever decrease, so an unchanged sum ⇔ no
    change); `repartition(B)` caps the iterative block growth.

    ``num_partitions=None`` derives the bucket count from the
    symmetric-closure row count (2 × edges) via :func:`_auto_buckets`
    — pass ``n_edges`` if the caller already counted (citation route
    does) to skip the extra scan."""
    import ray

    if num_partitions is None:
        if n_edges is None:
            n_edges = edges_ds.count()
        B = _auto_buckets(2 * n_edges)
    else:
        B = num_partitions

    def sym_tag(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        src = np.concatenate([s, d]).astype(np.int64)
        dst = np.concatenate([d, s]).astype(np.int64)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "_jb": pa.array(_owner_of(src, B), pa.int64())})

    def _adopt(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.table({
            "src": pa.array(g["src"].to_numpy(np.int64)),
            "dst": pa.array(g["dst"].to_numpy(np.int64))})
        # list-wrapped so the ref survives as a REF (cell values keep
        # identity; top-level args would auto-deref)
        return pd.DataFrame({"jb": [int(g["_jb"].iloc[0])],
                             "ref": [[ray.put(t)]]})

    adopted = (edges_ds.map_batches(sym_tag, batch_format="pyarrow")
               .groupby("_jb").map_groups(_adopt,
                                          batch_format="pandas")
               .to_pandas())  # ≤ B rows
    bucket_refs = {int(r.jb): r.ref[0] for r in adopted.itertuples()}
    bref = ray.put(bucket_refs)

    union_schema = pa.schema([
        ("node", pa.int64()), ("lab", pa.int64()),
        ("kind", pa.int8()), ("_jb", pa.int64())])

    labels = (nodes_ds.map_batches(
        lambda b: pa.table({
            "node": b.column("node").cast(pa.int64()),
            "lab": b.column("node").cast(pa.int64())}),
        batch_format="pyarrow").repartition(B).materialize())

    def _round_batch(b: pa.Table) -> pa.Table:
        """One label block → its kind-0 label rows PLUS the kind-1
        per-slice pre-minned (dst, lab) candidates, in ONE pass. A
        single branch on purpose: the union-of-two-branches plan
        (pagerank's layout) left both map operators stuck 'running'
        for ~40 s per round at small CPU counts — one operator, one
        task wave, no cross-branch contention. Pinned edge tables
        read from plasma; polars conversions cached per worker+ref
        in _pl_bucket_cache."""
        import polars as pl

        from .broadcast import cached_get
        nd = b.column("node").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lab = b.column("lab").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        label_rows = pa.table({
            "node": b.column("node"),
            "lab": b.column("lab"),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            "_jb": pa.array(_owner_of(nd, B), pa.int64()),
        }).cast(union_schema)

        refs = cached_get(bref)
        jb = _owner_of(nd, B)
        order = np.argsort(jb, kind="stable")
        jb_s, nd_s, lab_s = jb[order], nd[order], lab[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], jb_s[1:] != jb_s[:-1]]))
        bounds = np.append(bounds, len(jb_s))
        outs = []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            ref = refs.get(int(jb_s[s]))
            if ref is None:
                continue
            key = ref.hex()
            et = _pl_bucket_cache.get(key)
            if et is None:
                et = pl.from_arrow(ray.get(ref))
                _pl_bucket_cache[key] = et
            r = pl.DataFrame({"src": nd_s[s:e], "lab": lab_s[s:e]})
            j = et.join(r, on="src", how="inner")
            outs.append(j.group_by("dst")
                        .agg(pl.col("lab").min().alias("lab")))
        if not outs:
            return label_rows
        out = pl.concat(outs)
        dsts = out["dst"].to_numpy().astype(np.int64)
        cand_rows = pa.table({
            "node": pa.array(dsts, pa.int64()),
            "lab": pa.array(out["lab"].to_numpy().astype(np.int64)),
            "kind": pa.array(np.ones(len(dsts), np.int8)),
            "_jb": pa.array(_owner_of(dsts, B), pa.int64()),
        }).cast(union_schema)
        return pa.concat_tables([label_rows, cand_rows]) \
            .combine_chunks()

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0][["node", "lab"]]
        cand = g[g["kind"] == 1][["node", "lab"]]
        if len(cand):
            c = cand.groupby("node", as_index=False)["lab"].min()
            m = base.merge(c, on="node", how="left",
                           suffixes=("", "_c"))
            own = m["lab"].to_numpy(np.int64)
            cand_lab = np.where(m["lab_c"].isna(), own,
                                m["lab_c"].fillna(0)
                                .to_numpy(np.int64))
            return pd.DataFrame({"node": m["node"].to_numpy(np.int64),
                                 "lab": np.minimum(own, cand_lab)})
        return pd.DataFrame({"node": base["node"].to_numpy(np.int64),
                             "lab": base["lab"].to_numpy(np.int64)})

    lab_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])
    prev_sum = None
    for _ in range(max_rounds):
        labels = (labels.map_batches(_round_batch,
                                     batch_format="pyarrow",
                                     batch_size=None)
                  .groupby("_jb")
                  .map_groups(merge_bucket, batch_format="pandas")
                  .map_batches(lambda b: b.cast(lab_schema),
                               batch_format="pyarrow")
                  .repartition(B).materialize())
        cur_sum = int(labels.sum("lab") or 0)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda b: b.rename_columns(["node", "label"]),
        batch_format="pyarrow")


def citation_components(sf_dir: str,
                        driver_cutoff: int = COMPONENTS_DRIVER_CUTOFF):
    """Connected components over the (undirected) citation chains →
    (node, label) with label = the smallest doc_id in the component —
    isolated docs are their own label. Count-gated: at or below
    ``driver_cutoff`` edges the broadcast-label
    :func:`connected_components` runs (labels as one numpy pair);
    above it (or when forced) :func:`connected_components_ds` keeps
    the label table distributed. The recursive-CTE oracle reproduces
    the labels independently."""
    import ray.data as rd
    from .doc_triples import CITATION_CHAIN

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}),
        batch_format="pyarrow")

    def to_edges(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % CITATION_CHAIN) != 0
        src = ids[keep]
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(src - 1, pa.int64())})

    edges = docs.map_batches(to_edges, batch_format="pyarrow")
    n_edges = edges.count()
    if n_edges > driver_cutoff:
        return connected_components_ds(edges, nodes, n_edges=n_edges)

    e_tbl = pa.concat_tables(list(edges.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")))
    comp, _stats = connected_components(pa.table({
        "doc_a": e_tbl.column("src"), "doc_b": e_tbl.column("dst")}))
    comp_pd = comp.to_pandas()
    all_ids = pa.concat_tables(list(nodes.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"))) \
        .column("node").to_numpy(zero_copy_only=False)
    merged = pd.DataFrame({"node": all_ids.astype(np.int64)}) \
        .merge(comp_pd, on="node", how="left")
    lab = merged["label"].fillna(merged["node"]).astype(np.int64)
    return rd.from_arrow(pa.table({
        "node": pa.array(merged["node"].to_numpy(np.int64)),
        "label": pa.array(lab.to_numpy(np.int64))}))


def _citation_components_sql() -> str:
    from .doc_triples import CITATION_CHAIN
    return f"""
WITH RECURSIVE e AS (
    SELECT doc_id AS a, doc_id - 1 AS b FROM documents
    WHERE doc_id % {CITATION_CHAIN} <> 0),
u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
r(node, m) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT u.a, r.m FROM u JOIN r ON u.b = r.node
)
SELECT node, CAST(MIN(m) AS BIGINT) AS label FROM r GROUP BY node
"""


# ---------------------------------------------------------------------------
# BFS shortest-path depth — the iterative frontier operator
# ---------------------------------------------------------------------------

BFS_DRIVER_CUTOFF = 2_000_000


def bfs_depth(edges_ds, max_rounds: int = 64,
              num_partitions: int | None = None,
              driver_cutoff: int = BFS_DRIVER_CUTOFF,
              large_route: str = "pinned"):
    """Multi-source BFS depth along ``src → dst``: each node's minimum
    hop count to ANY sink (a node with no outgoing edge) →
    (node, depth) Dataset. Nodes on sink-free cycles never acquire a
    depth and are absent — exactly the rows a recursive-CTE oracle
    reaches (the SQL twin below).

    Count-gated routes (house rule):

    - edges ≤ ``driver_cutoff``: one numpy pass per level on the
      driver (searchsorted node index, vectorized frontier
      relaxation) — the route-agreement oracle.
    - above: default ``large_route="pinned"`` — the
      ``connected_components_ds`` layout (the measured 750 s → 31.9 s
      rebuild pattern): edges hash(dst)-bucketed ONCE into pinned
      object-store tables, ONE ``map_batches`` per round emits each
      depth block's kind-0 rows plus its frontier slice's relaxation
      candidates, one int64-bucketed ``groupby(_jb)`` exchange merges
      per owner bucket, ``repartition(B)`` caps block growth, and
      convergence is the row-count fixpoint (depths are append-only:
      a candidate's dep is always the current round, so rows never
      change once written). ``large_route="join"`` keeps the previous
      per-round-JoinOperator plan as the A/B twin
      (:func:`_bfs_join_route` — string-keyed groupby over the FULL
      depth table per round; see BASELINE.md round 5 for the measured
      gap).

    Driver state in both large routes is O(1) per round; depth stays
    a Dataset end to end. ``num_partitions=None`` derives the bucket
    count from the edge count (:func:`_auto_buckets`).
    """
    import ray.data as rd

    edges = edges_ds.map_batches(
        lambda b: b.select(["src", "dst"]),
        batch_format="pyarrow").materialize()
    n_edges = edges.count()
    out_schema = pa.schema([("node", pa.string()),
                            ("dep", pa.int64())])
    if n_edges == 0:
        return rd.from_arrow(out_schema.empty_table())

    if n_edges <= driver_cutoff:
        t = pa.concat_tables(list(edges.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        src = np.asarray(t.column("src").to_pylist(), dtype=object)
        dst = np.asarray(t.column("dst").to_pylist(), dtype=object)
        nodes = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        dep = np.full(len(nodes), -1, np.int64)
        has_out = np.zeros(len(nodes), bool)
        has_out[si] = True
        dep[~has_out] = 0
        for r in range(1, max_rounds + 1):
            hit = (dep[di] == r - 1) & (dep[si] < 0)
            if not hit.any():
                break
            dep[si[hit]] = r
        keep = dep >= 0
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[keep].tolist(), pa.string()),
            "dep": pa.array(dep[keep], pa.int64())}))

    if large_route == "join":
        return _bfs_join_route(edges, n_edges, max_rounds,
                               num_partitions or 16)
    return _bfs_pinned_route(edges, n_edges, max_rounds,
                             num_partitions or _auto_buckets(n_edges))


def _bfs_pinned_route(edges, n_edges: int, max_rounds: int, B: int):
    """The scale route: the single-branch pinned-bucket round plan
    from ``connected_components_ds``, specialized to frontier
    relaxation. Setup is two int64-bucketed exchanges (edge adoption
    keyed by hash(dst) — relaxation looks edges up by their dst — and
    the sink seed fold, which replaces the old string-keyed
    ``groupby(node).Max`` over 2×edges rows with per-batch polars
    partials, the ``endpoint_partial`` rule). Per round the ONLY
    exchange is the int64 ``groupby(_jb)`` carrying the depth table
    plus the frontier's candidate rows; node strings ride as payload,
    never as a shuffle key."""
    import ray
    import ray.data as rd

    def tag_dst(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("dst").to_pylist(), dtype=object)
        return pa.table({
            "src": b.column("src"),
            "dst": b.column("dst"),
            "_jb": pa.array(_owner_of(d, B), pa.int64())})

    def _adopt(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.table({
            "src": pa.array(np.asarray(g["src"], dtype=object),
                            pa.string()),
            "dst": pa.array(np.asarray(g["dst"], dtype=object),
                            pa.string())})
        # list-wrapped so the ref survives as a REF (top-level args
        # would auto-deref — the components lesson)
        return pd.DataFrame({"jb": [int(g["_jb"].iloc[0])],
                             "ref": [[ray.put(t)]]})

    adopted = (edges.map_batches(tag_dst, batch_format="pyarrow")
               .groupby("_jb").map_groups(_adopt,
                                          batch_format="pandas")
               .to_pandas())  # ≤ B rows
    bucket_refs = {int(r.jb): r.ref[0] for r in adopted.itertuples()}
    bref = ray.put(bucket_refs)

    # sink seeds: per-batch polars pre-fold of (node, has_out) →
    # int64-bucketed final fold; only sink rows survive
    def sink_partial(b: pa.Table) -> pa.Table:
        import polars as pl
        s, d = b.column("src"), b.column("dst")
        names = pa.chunked_array([s, d]).combine_chunks()
        is_src = np.concatenate([np.ones(len(s), np.int64),
                                 np.zeros(len(d), np.int64)])
        g = (pl.DataFrame({"node": pl.from_arrow(names),
                           "has_out": is_src})
             .group_by("node").agg(pl.col("has_out").max()))
        nd = np.asarray(g["node"].to_numpy(), dtype=object)
        return pa.table({
            "node": pa.array(nd, pa.string()),
            "has_out": pa.array(g["has_out"].to_numpy()
                                .astype(np.int64), pa.int64()),
            "_jb": pa.array(_owner_of(nd, B), pa.int64())})

    def sink_fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", as_index=False)["has_out"].max()
        sinks = m[m["has_out"] == 0]
        return pd.DataFrame({
            "node": sinks["node"].to_numpy(),
            "dep": np.zeros(len(sinks), np.int64)})

    dep_schema = pa.schema([("node", pa.string()),
                            ("dep", pa.int64())])
    depth = (edges.map_batches(sink_partial, batch_format="pyarrow")
             .groupby("_jb").map_groups(sink_fold,
                                        batch_format="pandas")
             .map_batches(lambda b: b.cast(dep_schema),
                          batch_format="pyarrow")
             .repartition(B).materialize())
    n_rows = depth.count()
    if n_rows == 0:
        return rd.from_arrow(dep_schema.empty_table())

    union_schema = pa.schema([
        ("node", pa.string()), ("dep", pa.int64()),
        ("kind", pa.int8()), ("_jb", pa.int64())])

    def _round_batch(b: pa.Table, r: int) -> pa.Table:
        """One depth block → its kind-0 rows PLUS the relaxation
        candidates of its frontier slice (dep == r-1), in ONE pass
        (single branch on purpose — the union-of-two-branches plan
        measured stuck ~40 s/round; components lesson)."""
        import polars as pl

        from .broadcast import cached_get
        nd = np.asarray(b.column("node").to_pylist(), dtype=object)
        dep = b.column("dep").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        depth_rows = pa.table({
            "node": b.column("node"),
            "dep": b.column("dep"),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            "_jb": pa.array(_owner_of(nd, B), pa.int64()),
        }).cast(union_schema)

        fmask = dep == r - 1
        if not fmask.any():
            return depth_rows
        fn = nd[fmask]
        refs = cached_get(bref)
        jb = _owner_of(fn, B)
        order = np.argsort(jb, kind="stable")
        jb_s, fn_s = jb[order], fn[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], jb_s[1:] != jb_s[:-1]]))
        bounds = np.append(bounds, len(jb_s))
        outs = []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            ref = refs.get(int(jb_s[s]))
            if ref is None:
                continue
            key = ref.hex()
            et = _pl_bucket_cache.get(key)
            if et is None:
                et = pl.from_arrow(ray.get(ref))
                _pl_bucket_cache[key] = et
            fr = pl.DataFrame({"dst": fn_s[s:e]})
            j = et.join(fr, on="dst", how="inner")
            if len(j):
                outs.append(j.select(pl.col("src").unique()))
        if not outs:
            return depth_rows
        srcs = np.asarray(pl.concat(outs)["src"].to_numpy(),
                          dtype=object)
        cand_rows = pa.table({
            "node": pa.array(srcs, pa.string()),
            "dep": pa.array(np.full(len(srcs), r, np.int64)),
            "kind": pa.array(np.ones(len(srcs), np.int8)),
            "_jb": pa.array(_owner_of(srcs, B), pa.int64()),
        }).cast(union_schema)
        return pa.concat_tables([depth_rows, cand_rows]) \
            .combine_chunks()

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0][["node", "dep"]]
        cand = g[g["kind"] == 1][["node", "dep"]]
        if not len(cand):
            return base
        c = cand.drop_duplicates("node")
        new = c[~c["node"].isin(base["node"])]
        if not len(new):
            return base
        return pd.concat([base, new], ignore_index=True)

    for r in range(1, max_rounds + 1):
        depth = (depth.map_batches(
            lambda b, r=r: _round_batch(b, r),
            batch_format="pyarrow", batch_size=None)
            .groupby("_jb")
            .map_groups(merge_bucket, batch_format="pandas")
            .map_batches(lambda b: b.cast(dep_schema),
                         batch_format="pyarrow")
            .repartition(B).materialize())
        cur = depth.count()
        if cur == n_rows:   # append-only: unchanged count ⇔ no
            break           # frontier relaxed anything new
        n_rows = cur
    return depth


def _bfs_join_route(edges, n_edges: int, max_rounds: int,
                    num_partitions: int):
    """The previous large route, kept as the measured A/B twin: a
    fresh edges⋈frontier JoinOperator per round plus a string-keyed
    ``groupby(node).Min`` over the FULL depth table — the exact
    pattern the pinned rebuild replaced (round-4 VERDICT #1)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    out_schema = pa.schema([("node", pa.string()),
                            ("dep", pa.int64())])

    def _parts(*side_rows: int) -> int:
        return max(1, min(num_partitions,
                          min(side_rows) // 4096 + 1))

    def endpoints(b: pa.Table) -> pa.Table:
        ns, nd = b.column("src"), b.column("dst")
        return pa.table({
            "node": pa.chunked_array([ns, nd]).combine_chunks(),
            "has_out": pa.array(
                np.concatenate([np.ones(len(ns), np.int8),
                                np.zeros(len(nd), np.int8)])),
        })

    def seed_sinks(b: pa.Table) -> pa.Table:
        f = b.filter(pa.array(
            b.column("has_out").to_numpy(zero_copy_only=False) == 0))
        return pa.table({
            "node": f.column("node"),
            "dep": pa.array(np.zeros(f.num_rows, np.int64))})

    depth = (edges.map_batches(endpoints, batch_format="pyarrow")
             .groupby("node").aggregate(Max("has_out",
                                            alias_name="has_out"))
             .map_batches(seed_sinks, batch_format="pyarrow")
             .repartition(num_partitions).materialize())
    frontier = depth
    fcnt = depth.count()
    if fcnt == 0:
        return rd.from_arrow(out_schema.empty_table())

    for r in range(1, max_rounds + 1):
        fr = frontier.map_batches(
            lambda b: b.select(["node"]).rename_columns(["_fn"]),
            batch_format="pyarrow")
        cand = (edges.join(fr, "inner", _parts(fcnt, n_edges),
                           on=("dst",), right_on=("_fn",))
                .map_batches(
                    lambda b, r=r: pa.table({
                        "node": b.column("src"),
                        "dep": pa.array(np.full(b.num_rows, r,
                                                np.int64))}),
                    batch_format="pyarrow"))
        depth = (depth.union(cand)
                 .groupby("node").aggregate(Min("dep",
                                                alias_name="dep"))
                 .repartition(num_partitions).materialize())
        frontier = depth.map_batches(
            lambda b, r=r: b.filter(pa.array(
                b.column("dep").to_numpy(zero_copy_only=False) == r)),
            batch_format="pyarrow").materialize()
        fcnt = frontier.count()
        if fcnt == 0:
            break
    return depth


def citation_bfs_depth(sf_dir: str):
    """BFS depth over the sdo:citation chains: every doc's hop count
    to its chain root → (node, dep). The chains make the expected
    depth exactly ``doc_id % CITATION_CHAIN``, which the recursive-CTE
    oracle independently reproduces."""
    from .doc_triples import doc_citation_triples

    edges = doc_citation_triples(sf_dir).map_batches(
        lambda b: pa.table({"src": b.column("subj"),
                            "dst": b.column("obj_value")}),
        batch_format="pyarrow")
    return bfs_depth(edges)


def _citation_bfs_sql() -> str:
    from .doc_triples import CITATION_EDGES_SQL
    return f"""
WITH RECURSIVE e AS ({CITATION_EDGES_SQL}),
d(node, dep) AS (
    SELECT o, CAST(0 AS BIGINT) FROM e
    WHERE o NOT IN (SELECT s FROM e)
    UNION
    SELECT e.s, d.dep + 1 FROM e JOIN d ON e.o = d.node
)
SELECT node, CAST(MIN(dep) AS BIGINT) AS dep FROM d GROUP BY node
"""


# ---------------------------------------------------------------------------
# Pregel-sharded PageRank — the distributed-rank scale route
# ---------------------------------------------------------------------------


# per-worker cache of polars-converted edge-bucket tables for the
# pagerank join route (keyed by object-ref hex; see _contrib_batch)
_pl_bucket_cache: Dict[str, "object"] = {}


def _owner_of(names, n_shards: int) -> np.ndarray:
    """Deterministic shard owner for node names — the same
    fixed-key siphash in every process (pd.util.hash_array)."""
    arr = np.asarray(names, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(n_shards)).astype(np.int64)


def pagerank_sharded(edges_ds, damping: float = 0.85, n_iter: int = 20,
                     n_shards: int | None = None,
                     n_edges: int | None = None) -> pa.Table:
    """PageRank with BOTH the edge set and the rank vector sharded —
    the route for graphs whose node table itself exceeds one machine
    (beyond ``PAGERANK_PINNED_NODES_CUTOFF``, where ``pagerank_pinned``'s
    single rank vector no longer fits).

    Pregel layout: shard ``i`` owns every node with
    ``hash(node) % P == i`` AND every edge whose src it owns — so all
    of a node's out-edges live with its rank, and ``w = rank/outdeg``
    needs no communication. Per round the ONLY bytes that move are
    each shard's per-owner partial destination sums (≤ its distinct
    dst count), passed shard-to-shard as object refs the driver never
    materializes — versus two O(edges) hash-join exchanges per round
    in the Dataset-join route (the CLAUDE.md round-4 item: edges
    bucketed by src ONCE, rank deltas re-bucketed per round only).

    Setup is one streaming pass over the edge blocks (split each block
    by owner, push sub-tables to shards) plus two O(distinct-dst)
    index-resolution rounds, after which the per-round hot path is
    pure int/float numpy.

    Partitioning assumptions (custom-operator rule): per-shard state
    is O((nodes + edges)/P) — P is the scale knob; heavy IN-degree
    skew is absorbed (a hot dst receives ≤ P partial sums), heavy
    OUT-degree skew concentrates edges of one src into one shard
    (bounded by that node's degree, the same contract as every keyed
    exchange here). Float fold order differs from the numpy route, so
    agreement is to the 1e-9 quantum, not bit-exact (tests pin ≤ 1
    quantum)."""
    import ray

    if n_shards is None:
        # shards are long-lived actors holding O(edges/P) state —
        # derive P from the exact edge count (~512k rows per shard)
        # with a small floor for parallelism; unlike the pinned-bucket
        # maps a shard costs an actor, so the cap is tighter
        if n_edges is None:
            n_edges = edges_ds.count()
        n_shards = max(
            min(8, _cluster_cpus()),
            min(64, -(-n_edges // (1 << 19))))
    P = int(n_shards)

    @ray.remote(num_cpus=1)
    class RankShard:
        def __init__(self, shard_id: int, n_shards: int):
            self.i = shard_id
            self.P = n_shards
            self.parts = []

        def add_edges(self, tbl):
            self.parts.append(tbl)
            return self.i

        def build(self):
            """Concat adopted edges; return per-owner distinct-dst
            name arrays for node registration."""
            if self.parts:
                t = pa.concat_tables(self.parts)
                self.src = np.asarray(t.column("src").to_pylist(),
                                      dtype=object)
                self.dst = np.asarray(t.column("dst").to_pylist(),
                                      dtype=object)
            else:
                self.src = np.zeros(0, dtype=object)
                self.dst = np.zeros(0, dtype=object)
            self.parts = None
            self.dst_names, self.d_idx = np.unique(self.dst,
                                                   return_inverse=True)
            self.dst_owner = (_owner_of(self.dst_names, self.P)
                              if len(self.dst_names) else
                              np.zeros(0, np.int64))
            self.incoming = []
            return [self.dst_names[self.dst_owner == j]
                    for j in range(self.P)]

        def register_nodes(self, *name_arrays):
            """Own-node registry = own srcs ∪ every dst pushed here.
            (Arrays arrive as top-level args so Ray auto-derefs each —
            refs nested in a list would NOT deref, the CLAUDE.md
            pinned-pagerank lesson in reverse.)"""
            pool = [self.src] + list(name_arrays)
            self.nodes = np.unique(np.concatenate(
                [np.asarray(p, dtype=object) for p in pool]))
            n_own = len(self.nodes)
            self.s_idx = np.searchsorted(self.nodes, self.src)
            self.outdeg = np.bincount(
                self.s_idx, minlength=n_own).astype(np.float64)
            self.dangling_mask = self.outdeg == 0.0
            self.safe_deg = np.maximum(self.outdeg, 1.0)
            return n_own

        def resolve(self, names):
            """Owner-side index lookup for a sender's distinct dsts."""
            return np.searchsorted(self.nodes, names)

        def set_send_maps(self, n_total: int, *resolved_per_owner):
            """resolved_per_owner[j] = owner-local indices of my
            distinct dsts owned by j (aligned with build()'s
            per-owner name arrays, which np.unique sorted; top-level
            args so each ref auto-derefs)."""
            self.send_pos = list(resolved_per_owner)
            self.dst_sel = [np.nonzero(self.dst_owner == j)[0]
                            for j in range(self.P)]
            self.n = n_total
            self.rank = np.full(len(self.nodes), 1.0 / n_total)

        def dangling_sum(self) -> float:
            return float(self.rank[self.dangling_mask].sum())

        def compute_parts(self):
            """One round's outgoing contributions: P (pos, vals)
            pairs, one per owner (empty arrays where nothing goes)."""
            w = self.rank / self.safe_deg
            c = np.zeros(len(self.dst_names))
            np.add.at(c, self.d_idx, w[self.s_idx])
            return [(self.send_pos[j], c[self.dst_sel[j]])
                    for j in range(self.P)]

        def apply(self, incoming_refs, base: float, dangling: float,
                  damping_f: float):
            """Fold incoming partial sums (fixed sender order →
            deterministic) and update owned ranks."""
            contrib = np.zeros(len(self.nodes))
            for part in ray.get(list(incoming_refs)):
                if isinstance(part, list):   # P == 1: num_returns=1
                    part = part[0]           # returns the whole list
                pos, vals = part
                if len(pos):
                    np.add.at(contrib, pos, vals)
            self.rank = (base + damping_f
                         * (contrib + dangling / self.n))
            return True

        def result(self):
            return pa.table({
                "node": pa.array(self.nodes.tolist(), pa.string()),
                "rank_1e9": pa.array(
                    np.floor(self.rank * 1e9 + 0.5).astype(np.int64),
                    pa.int64())})

    cpus = int(ray.cluster_resources().get("CPU", 1))
    P = max(1, min(P, cpus - 1 if cpus > 1 else 1))
    shards = [RankShard.remote(i, P) for i in range(P)]

    # one-time edge exchange: split each block by hash(src) in a task,
    # push sub-tables straight to their shard (never via the driver)
    @ray.remote
    def split_block(tbl: pa.Table, n_shards: int):
        owner = _owner_of(tbl.column("src").to_pylist(), n_shards)
        return [tbl.filter(pa.array(owner == j)) for j in range(n_shards)]

    pending = []
    for block in edges_ds.to_arrow_refs():
        if P == 1:
            # single shard owns everything — no split task (with
            # num_returns=1 the returned LIST would itself be the one
            # value, handing add_edges a list instead of a table)
            pending.append(shards[0].add_edges.remote(block))
            continue
        subs = split_block.options(num_returns=P).remote(block, P)
        for j in range(P):
            pending.append(shards[j].add_edges.remote(subs[j]))
    ray.get(pending)

    # node registration: each shard's distinct dsts go to their owners
    per_owner = [s.build.options(num_returns=P).remote() for s in shards]
    if P == 1:
        # num_returns=1 makes the returned LIST the single value;
        # unwrap its only element so downstream sees an array ref
        @ray.remote
        def _first(lst):
            return lst[0]

        per_owner = [[_first.remote(r)] for r in per_owner]
    counts = ray.get([shards[j].register_nodes.remote(
        *[per_owner[i][j] for i in range(P)]) for j in range(P)])
    n_total = int(sum(counts))
    if n_total == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "rank_1e9": pa.array([], pa.int64())})

    # index resolution: owners translate each sender's dst names once
    name_refs = per_owner  # per_owner[i][j] = names of i's dsts owned by j
    ray.get([
        shards[i].set_send_maps.remote(
            n_total, *[shards[j].resolve.remote(name_refs[i][j])
                       for j in range(P)])
        for i in range(P)])

    base = (1.0 - damping) / n_total
    for _ in range(n_iter):
        dangling = sum(ray.get([s.dangling_sum.remote()
                                for s in shards]))
        parts = [s.compute_parts.options(num_returns=P).remote()
                 for s in shards]
        if P == 1:
            parts = [[r] for r in parts]
        ray.get([shards[j].apply.remote(
            [parts[i][j] for i in range(P)], base, dangling, damping)
            for j in range(P)])

    out = pa.concat_tables(ray.get([s.result.remote() for s in shards]))
    return out
