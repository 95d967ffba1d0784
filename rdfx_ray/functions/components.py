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
