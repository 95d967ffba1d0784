"""Vectorized md5 key kernels for the deterministic-gate family
(hash sampling, stratified sampling, corpus split/balance, test-set
masks, epoch-shuffle permutation keys).

md5 is the cross-engine oracle CONTRACT here — DuckDB's ``md5()``
equals ``hashlib.md5`` byte-for-byte, which is what lets every
sampling gate hash-match its SQL oracle — so the scale fix is NOT a
different hash function (that would select a different sample): it is
computing the SAME md5 in a vectorized C++ kernel. An embedded DuckDB
expression over the Arrow batch does exactly that (~5× the per-row
``hashlib`` loop at 1M ids, measured single-threaded; BASELINE.md
round 5). ``SET threads=1`` per the nested-thread-pool rule — these
kernels run inside Ray map_batches tasks that already own one CPU.
Falls back to the per-row loop when duckdb is unavailable
(import-try house rule); outputs are identical either way, pinned by
test.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_CON = None


def _con():
    """Per-process cached DuckDB connection (threads=1)."""
    global _CON
    if _CON is None:
        import duckdb
        c = duckdb.connect()
        c.execute("SET threads=1")
        _CON = c
    return _CON


def _md5_mod_loop(ids: np.ndarray, mod: int) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % mod
         for i in ids.tolist()),
        dtype=np.int64, count=len(ids))


def md5_mod(ids: np.ndarray, mod: int) -> np.ndarray:
    """``int(md5(str(id))[:8], 16) % mod`` per id — byte-identical to
    DuckDB's ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))
    AS UBIGINT) % mod`` and to the hashlib loop it replaces."""
    ids = np.asarray(ids)
    if len(ids) == 0:
        return np.zeros(0, np.int64)
    try:
        con = _con()
    except Exception:
        return _md5_mod_loop(ids, mod)
    tbl = pa.table({"id": pa.array(ids.astype(np.int64), pa.int64())})
    out = con.execute(
        f"SELECT CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))"
        f" AS UBIGINT) % {int(mod)} AS b FROM tbl").arrow()
    del tbl
    return out.column("b").to_numpy().astype(np.int64)


def _md5_hex_loop(ids: np.ndarray, suffix: str) -> list:
    return [hashlib.md5(f"{i}{suffix}".encode()).hexdigest()
            for i in ids.tolist()]


def md5_hex_bucket(ids: np.ndarray, suffix: str = ""
                   ) -> "tuple[pa.Array, np.ndarray]":
    """Full 32-hex ``md5(str(id) + suffix)`` per id (Arrow string
    array — the epoch-shuffle permutation key) plus its first-byte
    bucket ``int(h[:2], 16)``. ``suffix`` must be a literal-safe
    string (digits/colon — it is interpolated into the SQL
    expression)."""
    ids = np.asarray(ids)
    if len(ids) == 0:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    try:
        con = _con()
    except Exception:
        h = _md5_hex_loop(ids, suffix)
        bucket = np.fromiter((int(x[:2], 16) for x in h),
                             dtype=np.int64, count=len(h))
        return pa.array(h, pa.string()), bucket
    sfx = f" || '{suffix}'" if suffix else ""
    tbl = pa.table({"id": pa.array(ids.astype(np.int64), pa.int64())})
    out = con.execute(
        f"SELECT h, CAST(('0x' || substr(h, 1, 2)) AS UBIGINT) AS b "
        f"FROM (SELECT md5(CAST(id AS VARCHAR){sfx}) AS h FROM tbl)"
    ).arrow()
    del tbl
    return (out.column("h").combine_chunks(),
            out.column("b").to_numpy().astype(np.int64))


def md5_hex_text(col) -> pa.Array:
    """32-hex md5 of each string's UTF-8 bytes (nulls hash as ``""``)
    — the exact-dedup / fingerprint / PII-scrub identity kernel,
    byte-identical to ``hashlib.md5(s.encode()).hexdigest()`` and to
    DuckDB ``md5(COALESCE(s, ''))``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(list(col), pa.string())
    if len(col) == 0:
        return pa.array([], pa.string())
    try:
        con = _con()
    except Exception:
        return pa.array(
            [hashlib.md5((t or "").encode("utf-8")).hexdigest()
             for t in col.to_pylist()], pa.string())
    tbl = pa.table({"t": col})
    out = con.execute(
        "SELECT md5(COALESCE(t, '')) AS h FROM tbl").arrow()
    del tbl
    return out.column("h").combine_chunks()
