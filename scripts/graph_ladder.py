"""Iterative-graph-op ladder: measured evidence for the pinned-bucket
round plans and the auto-derived bucket counts (round-5 VERDICT items
2/3/8). Builds the same synthetic chain graph the round-4 components
measurements used (chains of 16: src=i → dst=i-1 unless i%16==0, so
BFS depth == id%16 and the component label == the chain minimum) and
runs:

- ``bfs``: interleaved A/B of bfs_depth's pinned rebuild vs the legacy
  join route at one edge count (pinned best-of-2, join single rep —
  the join route is the known 10-100× loser; components precedent).
- ``components``: connected_components_ds at one edge count with the
  auto-derived B, recording B and rows/bucket (the flat-per-bucket
  evidence).

Usage: python scripts/graph_ladder.py bfs 1000000 [--cpus 16]
       python scripts/graph_ladder.py components 4000000 [--cpus 16]
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CHAIN = 16


def chain_edges(n_edges: int):
    """Edge table for ~n_edges chain edges (ids dense from 0)."""
    n_nodes = n_edges * CHAIN // (CHAIN - 1) + 1
    ids = np.arange(n_nodes, dtype=np.int64)
    keep = (ids % CHAIN) != 0
    src = ids[keep]
    dst = src - 1
    names_s = np.char.add("urn:doc:", src.astype(str)).astype(object)
    names_d = np.char.add("urn:doc:", dst.astype(str)).astype(object)
    return (pa.table({"src": pa.array(names_s, pa.string()),
                      "dst": pa.array(names_d, pa.string())}),
            src, n_nodes)


def verify_bfs(tbl, n_nodes: int) -> None:
    import pandas as pd
    df = tbl if isinstance(tbl, pd.DataFrame) else tbl.to_pandas()
    ids = df["node"].str.removeprefix("urn:doc:").astype(np.int64)
    assert len(df) == n_nodes, (len(df), n_nodes)
    assert (df["dep"].to_numpy() == (ids % CHAIN).to_numpy()).all()


def main() -> None:
    op = sys.argv[1]
    n_edges = int(sys.argv[2])
    cpus = 16
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])

    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as _rdm
    ctx = _rdm.DataContext.get_current()
    ctx.enable_progress_bars = False

    tbl, src_ids, n_nodes = chain_edges(n_edges)
    edges = rd.from_arrow(tbl).materialize()
    real_edges = edges.count()

    if op == "bfs":
        from rdfx_ray.functions.components import _auto_buckets, bfs_depth
        out = {"op": "bfs", "edges": real_edges, "nodes": n_nodes,
               "cpus": cpus, "B_auto": _auto_buckets(real_edges),
               "runs": []}
        # interleaved: pinned, join, pinned
        plan = ["pinned", "join", "pinned"]
        for route in plan:
            t0 = time.time()
            res = bfs_depth(edges, driver_cutoff=0, large_route=route)
            n = res.count()
            dt = round(time.time() - t0, 2)
            verify_bfs(res.to_pandas(), n_nodes)
            out["runs"].append({"route": route, "seconds": dt,
                                "rows": n})
            print(json.dumps(out["runs"][-1]), flush=True)
        pinned = min(r["seconds"] for r in out["runs"]
                     if r["route"] == "pinned")
        join = min(r["seconds"] for r in out["runs"]
                   if r["route"] == "join")
        out["pinned_best"] = pinned
        out["join_best"] = join
        out["speedup"] = round(join / pinned, 2)
        print(json.dumps(out))
    elif op == "bfs_pinned_only":
        from rdfx_ray.functions.components import _auto_buckets, bfs_depth
        B = _auto_buckets(real_edges)
        t0 = time.time()
        res = bfs_depth(edges, driver_cutoff=0, large_route="pinned")
        n = res.count()
        dt = round(time.time() - t0, 2)
        verify_bfs(res.to_pandas(), n_nodes)
        print(json.dumps({"op": "bfs_pinned", "edges": real_edges,
                          "cpus": cpus, "B_auto": B, "seconds": dt,
                          "rows": n,
                          "rows_per_bucket": real_edges // B}))
    elif op == "components":
        from rdfx_ray.functions.components import (
            _auto_buckets,
            connected_components_ds,
        )
        nodes = rd.from_arrow(pa.table({
            "node": pa.array(np.arange(n_nodes, dtype=np.int64),
                             pa.int64())})).materialize()
        e64 = rd.from_arrow(pa.table({
            "src": pa.array(src_ids, pa.int64()),
            "dst": pa.array(src_ids - 1, pa.int64())})).materialize()
        B = _auto_buckets(2 * real_edges)
        t0 = time.time()
        labels = connected_components_ds(e64, nodes,
                                         n_edges=real_edges)
        n = labels.count()
        dt = round(time.time() - t0, 2)
        # verify: label == chain minimum (id - id % CHAIN)
        df = labels.to_pandas()
        want = df["node"].to_numpy() - df["node"].to_numpy() % CHAIN
        assert (df["label"].to_numpy() == want).all()
        print(json.dumps({"op": "components", "edges": real_edges,
                          "cpus": cpus, "B_auto": B, "seconds": dt,
                          "rows": n,
                          "sym_rows_per_bucket":
                          2 * real_edges // B}))
    elif op == "pagerank":
        # join route at the auto-derived B, sharded route as the
        # in-window control (the round-4 protocol, next ladder point)
        from rdfx_ray.functions.components import _auto_buckets, pagerank
        B = _auto_buckets(real_edges)
        out = {"op": "pagerank", "edges": real_edges, "cpus": cpus,
               "B_auto": B, "runs": []}
        for route in ("sharded", "join", "sharded", "join"):
            t0 = time.time()
            ranks = pagerank(edges, n_iter=10,
                             broadcast_cutoff_rows=0,
                             pinned_nodes_cutoff=0,
                             large_route=route)
            n_rows = (ranks.count() if hasattr(ranks, "count")
                      and not isinstance(ranks, pa.Table)
                      else ranks.num_rows)
            dt = round(time.time() - t0, 2)
            out["runs"].append({"route": route, "seconds": dt,
                                "rows": n_rows})
            print(json.dumps(out["runs"][-1]), flush=True)
        out["join_best"] = min(r["seconds"] for r in out["runs"]
                               if r["route"] == "join")
        out["sharded_best"] = min(r["seconds"] for r in out["runs"]
                                  if r["route"] == "sharded")
        out["rows_per_bucket"] = real_edges // B
        print(json.dumps(out))
    else:
        raise SystemExit(f"unknown op {op}")
    ray.shutdown()


if __name__ == "__main__":
    main()
