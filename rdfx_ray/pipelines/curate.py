"""End-to-end corpus curation — the pipeline a training-data team
actually runs, composed from the engine's oracled operators:

1. deterministic hash SPLIT (train side only;
   ``functions/packing.py::split_corpus`` semantics),
2. exact DEDUP (keep the min-doc_id copy of each md5(text) group;
   ``functions/dedup.py::exact_dedup`` semantics),
3. model-score QUALITY FILTER (``functions/scoring.py``),
4. domain-mix BALANCE (integer-bp hash rates from exact per-source
   counts; ``functions/packing.py::balance_sources`` semantics),
5. sequence PACKING over the kept set (exclusive prefix sum of token
   counts in doc_id order — the distributed window scan of
   ``pack_sequences``, which works unchanged over a doc_id set WITH
   GAPS because ranges are id-intervals, not row-intervals).

→ (doc_id, n_tokens, start_offset) for every kept training document.

Every stage is bounded: ONE streaming pass computes all per-doc flags
and features (split hash, score, text md5, token count); the only
exchanges are the dedup-keeper groupby (O(distinct hashes)), the
per-source count fold (O(sources)) and the per-range token totals
(O(n_docs / range_docs)). The whole composition is one DuckDB SQL
statement, so the driver hash-checks the END-TO-END pipeline, not just
its parts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.packing import SPLIT_PCT
from ..functions.scoring import KEEP_THRESHOLD, QualityModel


# keeper-set rows above which the dedup filter routes through a hash
# join instead of a broadcast id set (keepers ≈ distinct texts ≈
# corpus size at low dup rates — the one side of this pipeline that
# is NOT bounded)
CURATE_BROADCAST_CUTOFF = 2_000_000


def curate_corpus(sf_dir: str, test_pct: int = SPLIT_PCT,
                  range_docs: int = 8192,
                  broadcast_cutoff: int = CURATE_BROADCAST_CUTOFF):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    model_holder: list = []

    def flags(batch: pa.Table) -> pa.Table:
        """One pass: md5 split bucket + balance bucket, text md5,
        model score, token count — everything per-doc."""
        if not model_holder:
            model_holder.append(QualityModel())
        scored = model_holder[0](batch)
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        id_hex = [hashlib.md5(str(i).encode()).hexdigest()[:8]
                  for i in ids]
        hv = np.fromiter((int(h, 16) for h in id_hex),
                         dtype=np.int64, count=len(ids))
        text_md5 = [hashlib.md5((t or "").encode()).hexdigest()
                    for t in texts]
        import polars as pl
        n_tok = pl.from_arrow(batch.select(["text"])).select(
            pl.col("text").fill_null("")
            .str.count_matches(r"\S+").cast(pl.Int64))["text"] \
            .to_numpy()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": batch.column("source"),
            "is_train": pa.array(hv % 100 >= test_pct, pa.bool_()),
            "bal_bucket": pa.array(hv % 10000, pa.int64()),
            "text_hash": pa.array(text_md5, pa.string()),
            "score_keep": scored.column("keep"),
            "n_tokens": pa.array(n_tok, pa.int64()),
        })

    base = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source", "text"])
            .map_batches(flags, batch_format="pyarrow",
                         batch_size=4096)
            .materialize())

    # dedup keepers: min doc_id per text hash (O(distinct) exchange).
    # Count-gated delivery: the keeper set is corpus-sized at low dup
    # rates, so above the cutoff it must NOT collect on the driver —
    # the keeper flag rides a native hash join on doc_id instead.
    keepers = (base.select_columns(["text_hash", "doc_id"])
               .groupby("text_hash")
               .aggregate(Min("doc_id", alias_name="keeper"))
               .materialize())    # count gate + delivery: one groupby
    n_keepers = keepers.count()
    kref = None
    if n_keepers <= broadcast_cutoff:
        k_tbl = pa.concat_tables(list(keepers.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        kref = ray.put(k_tbl.column("keeper").combine_chunks())
    else:
        marked = keepers.map_batches(
            lambda b: pa.table({
                "_keeper_r": b.column("keeper"),
                "_is_keeper": pa.array(
                    np.ones(b.num_rows, dtype=np.int8))}),
            batch_format="pyarrow")
        base = (base.join(marked, "left_outer", 16, on=("doc_id",),
                          right_on=("_keeper_r",))
                .materialize())

    # balance rates from EXACT per-source counts (tiny exchange)
    def src_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(b.column("source").combine_chunks())
        return pa.table({"source": vc.field("values"),
                         "n": pa.array(vc.field("counts"), pa.int64())})

    counts = (base.map_batches(src_partial, batch_format="pyarrow")
              .groupby("source").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    mn = int(counts["n"].min())
    rate_bp = {s: (mn * 10000) // int(n)
               for s, n in zip(counts["source"], counts["n"])}

    def keep_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.broadcast import cached_get
        keep = pc.and_(batch.column("is_train"),
                       batch.column("score_keep"))
        if kref is not None:
            is_keeper = pc.is_in(batch.column("doc_id"),
                                 value_set=cached_get(kref))
        else:
            is_keeper = pc.is_valid(batch.column("_is_keeper"))
        keep = pc.and_(keep, is_keeper)
        rates = np.fromiter(
            (rate_bp[s] for s in batch.column("source").to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        keep = pc.and_(keep, pa.array(
            batch.column("bal_bucket").to_numpy() < rates))
        out = batch.filter(keep)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "n_tokens": out.column("n_tokens"),
            "rng": pa.array(out.column("doc_id").to_numpy()
                            // range_docs, pa.int64()),
        })

    slim = base.map_batches(keep_filter,
                            batch_format="pyarrow").materialize()

    # exclusive prefix sum over the kept set (pack_sequences plan:
    # per-range totals → driver prefix → broadcast bases → in-range
    # cumsum; id-gaps are fine, ranges are id-intervals)
    def rng_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("rng", as_index=False)[
            "n_tokens"].sum()
        return pa.table({"rng": pa.array(df["rng"], pa.int64()),
                         "tok": pa.array(df["n_tokens"], pa.int64())})

    totals = (slim.map_batches(rng_partial, batch_format="pyarrow")
              .groupby("rng").aggregate(Sum("tok", alias_name="tok"))
              .to_pandas().sort_values("rng"))
    n_ranges = int(totals["rng"].max()) + 1 if len(totals) else 0
    range_tok = np.zeros(n_ranges, dtype=np.int64)
    if len(totals):
        range_tok[totals["rng"].to_numpy()] = totals["tok"].to_numpy()
    bases = np.concatenate([[0], np.cumsum(range_tok)[:-1]]) \
        if n_ranges else np.zeros(0, np.int64)
    bref = ray.put(bases)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import cached_get
        bases = cached_get(bref)
        g = group.sort_values("doc_id")
        tok = g["n_tokens"].to_numpy()
        start = (int(bases[int(g["rng"].iloc[0])])
                 + np.concatenate([[0], np.cumsum(tok)[:-1]]))
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "n_tokens": tok,
                             "start_offset": start})

    return slim.groupby("rng").map_groups(assign,
                                          batch_format="pandas")


CURATE_SQL = rf"""
WITH f AS (
    SELECT doc_id, source,
           len(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n_tokens,
           length(text) AS n_chars,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               AS n_alpha,
           len(list_filter(
               list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                              x -> lower(x)),
               x -> x IN ('the','and','of','to','in','is','for','with')))
               AS stop_n,
           md5(text) AS text_hash,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS UBIGINT) AS id_hash
    FROM documents),
scored AS (
    SELECT *,
           2 * LEAST(n_tokens, 100)
           + 3 * ((n_alpha * 10000 // GREATEST(n_chars, 1)) // 100)
           + 5 * stop_n
           - 1 * (abs(n_chars * 100 // GREATEST(n_tokens, 1)
                      - 550) // 10) AS score
    FROM f),
keeper AS (
    SELECT text_hash, MIN(doc_id) AS keeper FROM f GROUP BY text_hash),
c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
m AS (SELECT MIN(n) AS mn FROM c),
kept AS (
    SELECT s.doc_id, s.n_tokens
    FROM scored s
    JOIN keeper k ON s.text_hash = k.text_hash
    JOIN c ON s.source = c.source
    WHERE s.id_hash % 100 >= {SPLIT_PCT}
      AND s.doc_id = k.keeper
      AND s.score >= {KEEP_THRESHOLD}
      AND s.id_hash % 10000 < (SELECT mn FROM m) * 10000 // c.n)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER
            (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
FROM kept
"""
