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


def _bloom_hashes(values: np.ndarray, m_bits: int,
                  k: int) -> np.ndarray:
    """k bit positions per value via double hashing (h1 + i·h2 mod m)
    over one vectorized splitmix64 pass — no per-value Python."""
    x = values.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    h1 = x % np.uint64(m_bits)
    h2 = (x >> np.uint64(32)) % np.uint64(m_bits - 1) + np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1 + i * h2) % np.uint64(m_bits)).astype(np.int64)


def bloom_build(ds, column: str, m_bits: int = 1 << 20,
                k: int = 5) -> np.ndarray:
    """Build a Bloom filter over an int64 column: one map_batches pass
    emits a packed-bitmap partial per batch; partials OR-fold on the
    driver (m_bits/8 bytes each, count-independent — at cluster scale
    the identical bitmaps ride a tree reduce, like the HLL
    registers). Returns the packed uint8 bitmap."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_numpy(zero_copy_only=False)
        pos = _bloom_hashes(vals, m_bits, k).ravel()
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()],
                                          pa.binary())})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).iter_batches(
                                batch_format="pyarrow"):
        for buf in b.column("bits").to_pylist():
            np.bitwise_or(merged, np.frombuffer(buf, dtype=np.uint8),
                          out=merged)
    return merged


def bloom_contains(bits: np.ndarray, values: np.ndarray,
                   m_bits: int, k: int = 5) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (false
    positives at the standard (1-e^{-kn/m})^k rate), False = certainly
    absent."""
    pos = _bloom_hashes(values, m_bits, k)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=0).astype(bool)


def customers_with_urgent_order_bloom(sf_dir: str,
                                      m_bits: int = 1 << 20,
                                      k: int = 5,
                                      broadcast_cutoff: int = 2_000_000):
    """The bloom-join optimization of the exact semi join
    (``analytics_ext.customers_order_antijoin(semi=True)``, SAME
    oracle): a Bloom filter over the urgent orders' custkeys
    broadcasts (m_bits/8 bytes, row-count-independent — the thing the
    exact key set is NOT at 10¹² orders) and pre-filters the customer
    stream; the surviving candidates (true matches + the small
    false-positive tail) then verify against the exact distinct-key
    set. At scale the pre-filter is what cuts the probe-side exchange
    before the exact join; here the verify side is the same
    count-gated plan, so the result is exactly EXISTS semantics."""
    import ray
    import ray.data as rd

    from ..pipelines.analytics_ext import distinct_order_custkeys

    # one orders scan total: the materialized distinct-key set feeds
    # BOTH the bloom build and the exact verify
    keys = distinct_order_custkeys(sf_dir, "1-URGENT")
    n_keys = keys.count()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    if n_keys == 0:
        return cust.limit(0)
    bits = bloom_build(keys, "o_custkey", m_bits, k)
    bref = ray.put(bits)
    kref = None
    if n_keys <= broadcast_cutoff:
        kt = pa.concat_tables(list(keys.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        kref = ray.put(kt.column("o_custkey").combine_chunks())

    def bloom_filt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .broadcast import cached_get
        cand = bloom_contains(cached_get(bref),
                              batch.column("c_custkey").to_numpy(),
                              m_bits, k)
        batch = batch.filter(pa.array(cand))
        if kref is None or batch.num_rows == 0:
            return batch
        hit = pc.is_in(batch.column("c_custkey"),
                       value_set=cached_get(kref))
        return batch.filter(hit)

    cands = cust.map_batches(bloom_filt, batch_format="pyarrow",
                             batch_size=65536)
    if kref is not None:
        return cands
    # large key set: the exact verify is a native hash semi join over
    # the (already bloom-thinned) candidate stream — the filter cut
    # the probe-side exchange, the join never sees dropped rows
    renamed = keys.map_batches(
        lambda b: b.rename_columns(["_o_custkey_r"]),
        batch_format="pyarrow")
    return (cands.join(renamed, "inner", 16, on=("c_custkey",),
                       right_on=("_o_custkey_r",))
            .select_columns(["c_custkey", "c_name"]))


def _td_compress(means: np.ndarray, weights: np.ndarray,
                 delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Merge a centroid list down to ~delta centroids (Dunning's
    merging t-digest, k1 scale function k(q) = δ/2π·asin(2q−1)):
    sort by mean, then greedily absorb neighbours while the merged
    centroid's q-span stays within one unit of k. Accuracy is
    relative to q(1−q), so tails stay sharp — the property that makes
    p95/p99 usable from a fixed-size mergeable summary."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    if len(means) <= 1 or total == 0:
        return means, weights

    def k_inv(k: float) -> float:
        x = np.clip(k * 2 * np.pi / delta, -np.pi / 2, np.pi / 2)
        return (np.sin(x) + 1) / 2

    def k_fn(q: float) -> float:
        return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    out_m, out_w = [], []
    cur_m, cur_w = means[0], weights[0]
    q0 = 0.0
    q_limit = k_inv(k_fn(q0) + 1)
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (cur_w + w) / total
        if q <= q_limit:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            q_limit = k_inv(k_fn(q0) + 1)
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m, np.float64), np.asarray(out_w, np.float64)


def _td_quantile(means: np.ndarray, weights: np.ndarray, q: float,
                 lo: float, hi: float) -> float:
    """Interpolated quantile from a centroid list: each centroid's
    mass centers at its cumulative midpoint; ends clamp to the exact
    observed min/max (carried alongside the digest)."""
    cum = np.cumsum(weights) - weights / 2
    target = q * weights.sum()
    if target <= cum[0]:
        return float(np.interp(target, [0, cum[0]], [lo, means[0]]))
    if target >= cum[-1]:
        return float(np.interp(target, [cum[-1], weights.sum()],
                               [means[-1], hi]))
    return float(np.interp(target, cum, means))


def tdigest_grouped_quantiles(ds, group_col: str, val_col: str,
                              q_pcts=(50, 95), delta: float = 200.0):
    """Approximate grouped quantiles via mergeable t-digests — the
    O(δ)-state scale path where even the distinct-value histogram of
    :func:`rdfx_ray.pipelines.analytics_ext.grouped_quantiles_distributed`
    outgrows a worker. One map_batches pass builds a per-(batch,
    group) digest row (~δ packed float64 pairs + exact min/max/count);
    a tiny ``groupby(group).map_groups`` concatenates and re-compresses
    — digest merge is associative, so the same rows could ride a tree
    reduce on a 256-node cluster. Output:
    (group, p{q}_est ..., n_rows) with n_rows EXACT (weights are
    counts, summed losslessly)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        groups, blobs, los, his, ns = [], [], [], [], []
        for g, grp in df.groupby(group_col):
            v = grp[val_col].to_numpy(dtype=np.float64)
            m, w = _td_compress(v, np.ones(len(v)), delta)
            groups.append(g)
            blobs.append(m.tobytes() + w.tobytes())
            los.append(float(v.min()))
            his.append(float(v.max()))
            ns.append(len(v))
        return pa.table({
            group_col: pa.array(groups),
            "_td": pa.array(blobs, pa.binary()),
            "_lo": pa.array(los, pa.float64()),
            "_hi": pa.array(his, pa.float64()),
            "_n": pa.array(ns, pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ms, ws = [], []
        for buf in g["_td"]:
            arr = np.frombuffer(buf, dtype=np.float64)
            half = len(arr) // 2
            ms.append(arr[:half])
            ws.append(arr[half:])
        m, w = _td_compress(np.concatenate(ms), np.concatenate(ws),
                            delta)
        lo, hi = float(g["_lo"].min()), float(g["_hi"].max())
        row = {group_col: [g[group_col].iloc[0]]}
        for qp in q_pcts:
            row[f"p{qp}_est"] = [
                _td_quantile(m, w, qp / 100, lo, hi)]
        row["n_rows"] = [np.int64(g["_n"].sum())]
        return pd.DataFrame(row)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(group_col).map_groups(merge,
                                           batch_format="pandas"))


def orders_price_quantiles_tdigest(sf_dir: str):
    """Approximate p50/p95 of integer-scaled order price per priority
    from mergeable t-digests (the sketch twin of the exact
    ``orders_price_quantiles`` oracle — approximate by design →
    rows-only check; the relative-error bound vs the exact result is
    pinned by test)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])

    def scale(batch: pa.Table) -> pa.Table:
        price_c = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "price_c": pa.array(price_c, pa.int64())})

    return tdigest_grouped_quantiles(
        ds.map_batches(scale, batch_format="pyarrow",
                       batch_size=65536),
        "o_orderpriority", "price_c")


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


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation
# ---------------------------------------------------------------------------

CMS_DEPTH = 4


def _cms_rows(values: np.ndarray, width: int) -> np.ndarray:
    """Row-per-depth bucket indices via the bloom filter's double-
    hashing family (h1 + i·h2 mod width over one splitmix64 pass) —
    deterministic in every process, no per-value Python. (pandas
    hash_array ignores hash_key for integer dtypes, so a seed-per-row
    scheme built on it would silently collapse all rows to one.)"""
    return _bloom_hashes(values, width, CMS_DEPTH)


def cms_build(ds, column: str, width: int = 1 << 14) -> np.ndarray:
    """Count-Min sketch over one column: a (depth × width) int64
    counter grid. Per-batch partials are full grids built with one
    bincount per row; the merge is elementwise SUM — associative and
    commutative like every sketch here, so partials fold in any order
    (driver fold over depth×width ints; tree reduce at cluster
    scale). Estimates overcount only (min over rows bounds the error
    by ε·N with ε ≈ e/width)."""
    import pyarrow as pa

    depth = CMS_DEPTH

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_numpy(zero_copy_only=False)
        rows = _cms_rows(vals, width)
        grid = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            cnt = np.bincount(rows[r], minlength=width)
            grid[r] = cnt
        return pa.table({"grid": pa.array([grid.tobytes()],
                                          pa.binary())})

    grid = np.zeros((depth, width), dtype=np.int64)
    for bt in (ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
               .iter_batches(batch_size=256, batch_format="pyarrow")):
        for buf in bt.column("grid").to_pylist():
            grid += np.frombuffer(buf, dtype=np.int64) \
                .reshape(depth, width)
    return grid


def cms_estimate(grid: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the depth rows."""
    width = grid.shape[1]
    rows = _cms_rows(values, width)
    ests = np.stack([grid[r, rows[r]] for r in range(CMS_DEPTH)])
    return ests.min(axis=0)


def events_user_counts_cms(sf_dir: str, width: int = 1 << 14):
    """Count-Min estimated event counts for the exact top-20 users →
    (user_id, est_n). Approximate by design (overcount-only) → no SQL
    hash oracle; the test pins est ≥ exact and the ε·N bound."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    grid = cms_build(ds, "user_id", width=width)

    from ..pipelines.analytics_ext import events_topk_users
    top = events_topk_users(sf_dir, k=20).to_pandas()
    est = cms_estimate(grid, top["user_id"].to_numpy(np.int64))
    return pa.table({
        "user_id": pa.array(top["user_id"].to_numpy(np.int64),
                            pa.int64()),
        "est_n": pa.array(est.astype(np.int64), pa.int64())})
