"""Training-batch preparation operators: sequence packing (assign each
document a global token offset and a fixed-capacity bin) and the
deterministic hash train/test split.

Sequence packing is the distributed PREFIX SUM (a window function —
the one wide shape the engine didn't cover): pass 1 computes per-range
token totals with the usual partial-aggregation discipline, the driver
prefix-sums the tiny per-range table (one row per ``range_docs``
documents — bounded state, broadcast once via ``ray.put``), and pass 2
assigns exact offsets with a vectorized in-group cumulative sum. No
stage ever materializes the corpus; the exchanged tables are
O(n_docs / range_docs) and O(1 slim row per doc).

The split operator is pure streaming: one md5 per doc (the same
content-stable hash the exact-dedup oracle pins) decides train/test —
deterministic across runs, engines, and partitionings, which is the
property a reproducible corpus split actually needs (a random_shuffle
sample is neither resumable nor replayable).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import token_stats_batch


def pack_sequences(sf_dir: str, capacity: int = 2048,
                   range_docs: int = 8192,
                   persist_dir: str | None = None):
    """Assign every document its global token ``start_offset`` (prefix
    sum of whitespace-token counts in ``doc_id`` order) and the
    training bin it starts in (``bin_id = start_offset // capacity``)
    → (doc_id, n_tokens, start_offset, bin_id).

    Three bounded stages:

    1. one pass over the text computes the slim (doc_id, n_tokens)
       table (vectorized ``\\S+`` count — the token_stats kernel),
       materialized: 16 bytes/doc, the scan's working set;
    2. per-batch partial sums per ``doc_id // range_docs`` range →
       ``groupby(range).sum`` → the driver prefix-sums one row per
       range and broadcasts the base-offset array (``ray.put`` once);
    3. a ``groupby(range).map_groups`` computes the in-range
       cumulative sum (numpy, one group = one contiguous doc range)
       and adds the broadcast base — exact global offsets with no
       global sort and no O(corpus) exchange.

    DuckDB oracle: ``SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    The slim table feeds TWO passes. By default it pins in the object
    store (``materialize()`` — 16 bytes/doc, spillable). For corpora
    where even that working set shouldn't occupy the store across the
    whole job (≥10⁹ docs/node), pass ``persist_dir``: the table
    streams to parquet once and each pass re-reads it — identical
    results (pinned by test), object-store residency zero between
    passes, and the scan (the expensive text read) never repeats.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    slim = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(token_stats_batch, batch_format="pyarrow",
                         batch_size=8192)
            .map_batches(
                lambda b: pa.table({
                    "doc_id": b.column("doc_id"),
                    "n_tokens": b.column("n_tokens"),
                    "rng": pa.array(b.column("doc_id").to_numpy()
                                    // range_docs, pa.int64())}),
                batch_format="pyarrow"))
    if persist_dir is not None:
        slim.write_parquet(persist_dir)
        slim = rd.read_parquet(
            persist_dir, columns=["doc_id", "n_tokens", "rng"])
    else:
        slim = slim.materialize()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("rng", as_index=False)["n_tokens"].sum()
        return pa.table({"rng": pa.array(g["rng"], pa.int64()),
                         "tok": pa.array(g["n_tokens"], pa.int64())})

    totals = (slim.map_batches(partial, batch_format="pyarrow")
              .groupby("rng").aggregate(Sum("tok", alias_name="tok"))
              .to_pandas().sort_values("rng"))
    # base offset of each range = exclusive prefix sum of range totals;
    # indexed by range id (ranges with no docs contribute 0)
    n_ranges = int(totals["rng"].max()) + 1 if len(totals) else 0
    range_tok = np.zeros(n_ranges, dtype=np.int64)
    range_tok[totals["rng"].to_numpy()] = totals["tok"].to_numpy()
    bases = np.concatenate([[0], np.cumsum(range_tok)[:-1]])
    bref = ray.put(bases)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import cached_get
        bases = cached_get(bref)
        g = group.sort_values("doc_id")
        tok = g["n_tokens"].to_numpy()
        start = (int(bases[int(g["rng"].iloc[0])])
                 + np.concatenate([[0], np.cumsum(tok)[:-1]]))
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": tok,
            "start_offset": start,
            "bin_id": start // capacity,
        })

    return slim.groupby("rng").map_groups(assign, batch_format="pandas")


SPLIT_PCT = 10


def split_corpus(sf_dir: str, test_pct: int = SPLIT_PCT):
    """Deterministic train/test split: doc → 'test' iff the first 32
    bits of ``md5(str(doc_id))`` mod 100 fall under ``test_pct`` →
    (doc_id, bucket_val, split). Pure streaming map; the assignment is
    a function of the doc id alone, so it is stable under appends,
    re-partitioning and reruns (the reproducibility property a corpus
    split needs — a sampled split is neither).

    DuckDB oracle: ``CAST(('0x' || substr(md5(CAST(doc_id AS
    VARCHAR)), 1, 8)) AS UBIGINT) % 100`` — byte-identical md5 on both
    engines.
    """
    import ray.data as rd

    def fn(batch: pa.Table) -> pa.Table:
        from .md5keys import md5_mod
        ids = batch.column("doc_id").to_numpy()
        bucket_val = md5_mod(ids, 100)
        split = np.where(bucket_val < test_pct, "test", "train")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bucket_val": pa.array(bucket_val, pa.int64()),
            "split": pa.array(split, pa.string()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=65536)


def balance_sources(sf_dir: str):
    """Domain-mix balancing: downsample every source to (approximately)
    the smallest source's share with a DETERMINISTIC per-doc hash rate
    → (doc_id, source) of kept docs.

    Per-source acceptance rate is integer basis points
    ``min_count * 10000 // count_s`` computed from EXACT per-source
    counts (one partial-aggregated groupby over a two-column read —
    the only exchange, O(sources) rows). The rate table broadcasts as
    a closure dict (bounded by the source vocabulary) and the accept
    decision is the same md5 bucket the train/test split uses — so
    the kept set is stable under appends, re-partitioning and reruns,
    and composes with :func:`split_corpus` (independent hash uses:
    different modulus windows of the same digest would correlate, so
    both use the full first-32-bits value, see oracle).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(b.column("source").combine_chunks())
        return pa.table({"source": vc.field("values"),
                         "n": pa.array(vc.field("counts"), pa.int64())})

    counts_ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source"])
                 .map_batches(count_partial, batch_format="pyarrow"))
    counts = (counts_ds.groupby("source")
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    mn = int(counts["n"].min())
    rate_bp = {s: (mn * 10000) // int(n)
               for s, n in zip(counts["source"], counts["n"])}

    def fn(batch: pa.Table) -> pa.Table:
        from .md5keys import md5_mod
        ids = batch.column("doc_id").to_numpy()
        src = batch.column("source").to_pylist()
        hv = md5_mod(ids, 10000)
        rates = np.fromiter((rate_bp[s] for s in src), dtype=np.int64,
                            count=len(src))
        keep = hv < rates
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "source": pa.array([s for s, k in zip(src, keep) if k],
                               pa.string()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=65536)


BALANCE_SOURCES_SQL = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
     m AS (SELECT MIN(n) AS mn FROM c)
SELECT d.doc_id, d.source
FROM documents d JOIN c ON d.source = c.source
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS UBIGINT) % 10000
      < (SELECT mn FROM m) * 10000 // c.n
"""


DECONTAMINATE_BROADCAST_CUTOFF = 2_000_000


def decontaminate(sf_dir: str, n: int = 8, test_pct: int = SPLIT_PCT,
                  hashed: bool = False,
                  winnow_window: int | None = None,
                  broadcast_cutoff: int = DECONTAMINATE_BROADCAST_CUTOFF):
    """Test-set decontamination: test docs sharing at least one word
    ``n``-gram with ANY train doc → (doc_id, n_shared) with the count
    of distinct shared grams. Composes the engine's hash split and
    n-gram machinery — the check a training pipeline runs before
    holding out an eval set.

    Plan (every stage bounded):

    1. one streaming pass builds each doc's distinct n-grams
       (vectorized polars: extract_all → explode → n-1 per-doc
       windowed shifts → concat), deduplicated batch-LOCALLY only —
       a document's text is one row, so one batch holds all of a
       doc's grams and per-batch ``unique`` IS globally exact per
       (doc, gram); no distinct shuffle needed (a measured 30 s
       no-op sort exchange over long gram strings at sf0.1);
    2. the split flag is computed per row from doc_id (md5 — a pure
       function, nothing carried anywhere);
    3. the train side's EXACT row count picks the plan — under the
       cutoff its gram strings collect once, fold to a unique set on
       the driver and broadcast for a vectorized ``is_in`` filter
       (no exchange at all); above it, distinct-shuffle + Ray Data's
       native hash join (the count-gating discipline of every join
       in this engine);
    4. matched test rows fold per doc with batch-local partial
       counts before the final tiny groupby.

    At 100 TB the gram strings dominate the exchange —
    ``hashed=True`` is the scale mode: each token hashes once
    (vectorized polars siphash) and grams become a numpy polynomial
    rolling hash over the token-hash stream, so a uint64 flows
    through the whole filter/join plane instead of a ~50-byte string
    (identical pipeline shape; hash identities are per-run —
    everything only ever compares hashes produced in the same run).
    The string form is what the DuckDB oracle replays exactly; the
    equality of the two modes' results is pinned by test.

    ``winnow_window=w`` (requires ``hashed=True``) goes one step
    further for 100-TB corpora: instead of carrying EVERY gram hash,
    each doc keeps only its winnowing fingerprints — the minimum hash
    of every ``w``-gram sliding window (Schleimer et al.'s winnowing
    guarantee: any shared token run of length ≥ ``w + n - 1`` still
    produces at least one shared selected fingerprint, so long
    contaminating overlaps are always flagged). Row volume drops to
    ~``2/(w+1)`` of the hashed mode's; ``n_shared`` then counts
    shared FINGERPRINTS, not grams — a detection report, not the
    oracle-exact overlap count (flag parity on planted long overlaps
    is test-pinned).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if winnow_window is not None and not hashed:
        raise ValueError("winnow_window requires hashed=True (winnowing "
                         "selects minima over the rolling-hash stream)")

    # hashed grams travel as int64 (the same 64 bits reinterpreted):
    # Ray's hash aggregate/join plane handles uint64 keys by falling
    # back to pickled-object columns, which then cannot join — the
    # int64 view keeps equality semantics and stays a native Arrow key
    gram_type = pa.int64() if hashed else pa.string()

    def grams_batch(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(
            pl.col("text").fill_null("")
              .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
        d = (d.explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase()))
        if hashed:
            doc = d["doc_id"].to_numpy()
            h = d.select(pl.col("w").hash(seed=0))["w"].to_numpy() \
                .astype(np.uint64)
            m = len(h) - n + 1
            if m <= 0:
                return pa.schema([("doc_id", pa.int64()),
                                  ("g", gram_type)]).empty_table()
            C = np.uint64(1099511628211)        # FNV prime, wraps mod 2^64
            acc = np.zeros(m, dtype=np.uint64)
            for i in range(n):
                acc = acc * C + h[i:i + m]
            valid = doc[:m] == doc[n - 1:]
            doc_v, acc_v = doc[:m][valid], acc[valid]
            if winnow_window is not None and len(doc_v):
                # per-doc winnowing: grams arrive contiguous per doc
                # (one doc = one input row), so segment boundaries are
                # doc changes; within a segment, the min hash of every
                # w-window is selected (vectorized sliding window +
                # argmin; 64-bit ties are ~impossible, first-min kept)
                w = int(winnow_window)
                seg_starts = np.flatnonzero(np.concatenate(
                    [[True], doc_v[1:] != doc_v[:-1]]))
                seg_ends = np.concatenate([seg_starts[1:], [len(doc_v)]])
                d_parts, g_parts = [], []
                for s, e in zip(seg_starts, seg_ends):
                    seg = acc_v[s:e]
                    if len(seg) <= w:
                        pos = np.array([int(np.argmin(seg))])
                    else:
                        win = np.lib.stride_tricks \
                            .sliding_window_view(seg, w)
                        pos = np.unique(np.argmin(win, axis=1)
                                        + np.arange(len(win)))
                    d_parts.append(np.full(len(pos), doc_v[s]))
                    g_parts.append(seg[pos])
                doc_v = np.concatenate(d_parts)
                acc_v = np.concatenate(g_parts)
            out = pl.DataFrame({"doc_id": doc_v,
                                "g": acc_v.view(np.int64)}).unique()
        else:
            parts = [pl.col("w")] + [
                pl.col("w").shift(-i).over("doc_id") for i in range(1, n)]
            d = d.with_columns(
                pl.concat_str(parts, separator=" ").alias("g"))
            out = d.drop_nulls("g").select(["doc_id", "g"]).unique()
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("g", gram_type)]))

    import pyarrow.compute as pc_

    def add_split(batch: pa.Table) -> pa.Table:
        from .md5keys import md5_mod
        ids = batch.column("doc_id").to_numpy()
        hv = md5_mod(ids, 100)
        return batch.append_column(
            "is_test", pa.array(hv < test_pct, pa.bool_()))

    flagged = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
               .map_batches(grams_batch, batch_format="pyarrow",
                            batch_size=8192)
               .map_batches(add_split, batch_format="pyarrow")
               .materialize())

    test_rows = flagged.map_batches(
        lambda b: b.filter(b.column("is_test"))
                   .select(["doc_id", "g"]),
        batch_format="pyarrow")
    train_rows = flagged.map_batches(
        lambda b: b.filter(pc_.invert(b.column("is_test")))
                   .select(["g"]),
        batch_format="pyarrow")

    def partial_count(batch: pa.Table) -> pa.Table:
        vc = pc_.value_counts(batch.column("doc_id").combine_chunks())
        return pa.table({"doc_id": vc.field("values"),
                         "n_shared": pa.array(vc.field("counts"),
                                              pa.int64())})

    if train_rows.count() <= broadcast_cutoff:
        # collect the (pre-deduped per doc) train grams once; the
        # driver-side unique fold replaces a whole distinct-shuffle
        # round (seconds of fixed exchange cost on collision-sized
        # tables — the LSH/embedding lesson)
        g_tbl = pa.concat_tables(list(train_rows.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        gref = ray.put(pc_.unique(g_tbl.column("g").combine_chunks()))

        def filt(batch: pa.Table) -> pa.Table:
            from .broadcast import cached_get
            keep = pc_.is_in(batch.column("g"),
                             value_set=cached_get(gref))
            return batch.filter(keep)

        matched = test_rows.map_batches(filt, batch_format="pyarrow")
    else:
        train_g = (train_rows.groupby("g")
                   .aggregate(Count(alias_name="_n"))
                   .map_batches(lambda b: b.select(["g"])
                                .rename_columns(["_g_r"]),
                                batch_format="pyarrow"))
        matched = (test_rows.join(train_g, "inner", 16,
                                  on=("g",), right_on=("_g_r",))
                   .select_columns(["doc_id", "g"]))

    return (matched.map_batches(partial_count, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_shared", alias_name="n_shared")))


DECONTAMINATE_SQL = """
WITH toks AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                          x -> lower(x)) AS w
    FROM documents),
grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 6),
                  i -> array_to_string(list_slice(w, i, i + 7), ' ')))
               AS g
    FROM toks),
dg AS (SELECT DISTINCT doc_id, g FROM grams),
split AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS UBIGINT) % 100 < 10 AS is_test
    FROM documents),
train_g AS (
    SELECT DISTINCT g FROM dg JOIN split USING (doc_id)
    WHERE NOT is_test)
SELECT dg.doc_id, COUNT(*) AS n_shared
FROM dg JOIN split ON dg.doc_id = split.doc_id
        JOIN train_g ON dg.g = train_g.g
WHERE split.is_test
GROUP BY dg.doc_id
"""
