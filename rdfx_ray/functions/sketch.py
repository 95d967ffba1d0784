"""Distributed sketches: HyperLogLog distinct-count (the classic
mergeable cardinality sketch) — per-batch register arrays computed
vectorized, merged by elementwise max. The merge is associative and
commutative, so batch partials combine in any order: here a driver
fold over tiny (2^p bytes) partials; at cluster scale the identical
registers ride a tree reduce.

Approximate by design → no SQL hash oracle; tests pin the relative
error against the exact distinct count (~1.04/sqrt(2^p) expected).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _registers_for(values: np.ndarray, p: int) -> np.ndarray:
    """Vectorized HLL register update for one batch of uint64 hashes."""
    m = 1 << p
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    rest = (values << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rho = position of the leftmost 1-bit in the remaining 64-p bits
    # (clz + 1), via float64 exponent extraction — exact for our range
    # because we only need floor(log2) of a nonzero uint64
    bits = 64 - np.floor(np.log2(rest.astype(np.float64) + 0.5)).astype(
        np.int64)
    rho = np.clip(bits, 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = float(1 << p)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def hll_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) over a Ray Dataset: one
    map_batches pass emits a 2^p-byte register row per batch; the
    driver folds them with elementwise max (bounded by #batches ×
    2^p bytes, corpus-size-independent)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = pd.util.hash_pandas_object(
            pd.Series(batch.column(column).to_pylist()),
            index=False).to_numpy().astype(np.uint64)
        regs = _registers_for(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).iter_batches(
                                batch_format="pyarrow"):
        for buf in b.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8),
                       out=merged)
    return _estimate(merged, p)


def events_hll_users(sf_dir: str, p: int = 12):
    """HLL estimate of distinct users per event_type + overall —
    returned as rows for the (rows-only) driver check."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    # per-type registers in one pass: emit (event_type, regs) per batch
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        types, regs_out = [], []
        for t, grp in df.groupby("event_type"):
            vals = pd.util.hash_pandas_object(
                grp["user_id"], index=False).to_numpy().astype(np.uint64)
            types.append(t)
            regs_out.append(_registers_for(vals, p).tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "regs": pa.array(regs_out, pa.binary())})

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).iter_batches(
                                batch_format="pyarrow"):
        for t, buf in zip(b.column("event_type").to_pylist(),
                          b.column("regs").to_pylist()):
            r = np.frombuffer(buf, dtype=np.uint8)
            if t in acc:
                np.maximum(acc[t], r, out=acc[t])
            else:
                acc[t] = r.copy()
    rows = [{"event_type": t, "approx_users": int(round(_estimate(r, p)))}
            for t, r in sorted(acc.items())]
    overall = np.zeros(1 << p, dtype=np.uint8)
    for r in acc.values():
        np.maximum(overall, r, out=overall)
    rows.append({"event_type": "__all__",
                 "approx_users": int(round(_estimate(overall, p)))})
    return pd.DataFrame(rows)
