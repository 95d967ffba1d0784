"""Round-5 analytics additions — final-round operator shapes the
registry didn't yet cover, every one SQL-oracled:

- ``events_user_islands``: interval coalescing (gaps-and-islands with
  VARIABLE-length intervals — a long interval can swallow several
  later short ones, so the merge needs a running-max-end sweep, not
  the fixed-gap rule ``events_sessionize`` already covers).
- ``orders_skyline``: the Pareto frontier (skyline) of the orders
  fact — non-dominated (price ↓, date ↑) points — via per-batch local
  skylines that shrink each block to its own frontier before one
  small driver fold.
- ``docs_familiarity``: CCNet-style n-gram LM quality scoring — each
  document scored by how familiar its bigrams are to the TRAIN split
  of the corpus.  Counts, not log-probs, so the score is exact
  integer arithmetic and hash-matches SQL (the monotone transform
  doesn't change a filter's ranking).
- ``docs_ngram_topk_per_lang``: grouped top-k over the corpus bigram
  profile (per-language most-frequent bigrams, deterministic
  tiebreak).
- ``docs_edit_distance_pairs``: string-similarity self-join (edit
  distance ≤ k on a normalized key) — the fuzzy-key dedup shape —
  with (lang, length-bucket) blocking and vectorized C verification.

Reference scope note: the reference (surroundaustralia/rdfx) has no
analytics plane at all — these extend the engine's training-data
surface (SURVEY.md beyond-§2 family), like the round-3/4 siblings in
``analytics_r4.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# interval coalescing (gaps-and-islands, variable-length intervals)
# ---------------------------------------------------------------------------

# deterministic per-event duration (µs): 1..600 s derived from the id,
# so both engines compute the identical interval set with no RNG
ISLAND_DUR_MOD = 600
ISLAND_BUCKETS = 32


def events_user_islands(sf_dir: str,
                        num_buckets: "int | None" = None):
    """Merge each user's event intervals ``[t, t + dur)`` into maximal
    overlapping islands → (user_id, island_start, island_end,
    n_events), all epoch-µs BIGINT.

    Durations vary per event (``(event_id % 600 + 1)`` seconds), so a
    single long interval can cover many later events — the coalescing
    needs the running max of interval ENDS, which is the general
    interval-merge shape (``events_sessionize``'s fixed inter-event
    gap is the degenerate equal-durations case).

    Plan: one int64 ``user_id % B`` bucket exchange co-locates each
    user's rows, then ONE vectorized polars sweep per bucket (sort by
    (user, t, event_id) — event_id makes the frame deterministic
    under timestamp ties, the same tiebreak the SQL twin orders by —
    shifted cumulative max end over the user window, flag → cumsum →
    island ids, one group_by). Per-round state is O(bucket rows);
    nothing is collected on the driver. ``num_buckets=None`` derives
    B from the exact event count (one bucket is one in-memory sweep
    frame, so its rows must stay ~2^17 at any stream size — the
    components ``_auto_buckets`` rule).
    """
    import ray.data as rd

    from ..functions.components import _auto_buckets

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    B = (num_buckets if num_buckets is not None
         else max(ISLAND_BUCKETS, _auto_buckets(ds.count())))

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        dur = ((eid % ISLAND_DUR_MOD) + 1) * 1_000_000
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch.column("user_id"),
            "t": ts,
            "dur": pa.array(dur.astype(np.int64), pa.int64()),
            "event_id": batch.column("event_id"),
            "_jb": pa.array((uid % B).astype(np.int64), pa.int64()),
        })

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        d = (pl.from_pandas(g[["user_id", "t", "dur", "event_id"]])
             .sort(["user_id", "t", "event_id"])
             .with_columns((pl.col("t") + pl.col("dur")).alias("end")))
        d = d.with_columns(
            pl.col("end").cum_max().shift(1).over("user_id")
            .alias("prev_end"))
        d = d.with_columns(
            (pl.col("prev_end").is_null()
             | (pl.col("t") > pl.col("prev_end")))
            .cast(pl.Int64).alias("new_island"))
        d = d.with_columns(
            pl.col("new_island").cum_sum().over("user_id")
            .alias("island"))
        out = (d.group_by(["user_id", "island"])
               .agg(island_start=pl.col("t").min(),
                    island_end=pl.col("end").max(),
                    n_events=pl.len().cast(pl.Int64))
               .drop("island"))
        return out.to_pandas()

    schema = pa.schema([
        ("user_id", pa.int64()), ("island_start", pa.int64()),
        ("island_end", pa.int64()), ("n_events", pa.int64())])
    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("_jb")
            .map_groups(merge_bucket, batch_format="pandas")
            .map_batches(lambda b: b.cast(schema),
                         batch_format="pyarrow"))


EVENTS_USER_ISLANDS_SQL = f"""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS t,
           ((event_id % {ISLAND_DUR_MOD}) + 1) * 1000000 AS dur,
           event_id
    FROM events),
m AS (
    SELECT user_id, t, dur, event_id,
           MAX(t + dur) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_end
    FROM e),
f AS (
    SELECT user_id, t, dur, event_id,
           CASE WHEN prev_end IS NULL OR t > prev_end
                THEN 1 ELSE 0 END AS new_island
    FROM m),
g AS (
    SELECT user_id, t, dur,
           SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY t, event_id) AS island
    FROM f)
SELECT user_id,
       CAST(MIN(t) AS BIGINT) AS island_start,
       CAST(MAX(t + dur) AS BIGINT) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, island
"""


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def _local_skyline(price: np.ndarray, d: np.ndarray
                   ) -> "tuple[np.ndarray, np.ndarray]":
    """Skyline of (minimize price, maximize d) over distinct points:
    per-price max date, then a sorted sweep keeping dates strictly
    above the running max of all cheaper prices. O(n log n), fully
    vectorized."""
    order = np.lexsort((-d, price))
    p_s, d_s = price[order], d[order]
    # per-price group head = max date for that price (d sorted desc
    # within price)
    head = np.concatenate([[True], p_s[1:] != p_s[:-1]])
    p_g, d_g = p_s[head], d_s[head]
    run = np.maximum.accumulate(d_g)
    keep = np.concatenate([[True], d_g[1:] > run[:-1]])
    return p_g[keep], d_g[keep]


def orders_skyline(sf_dir: str):
    """Pareto frontier of orders under (totalprice ↓, orderdate ↑):
    every order no other order beats on both axes → (o_orderkey,
    price_c, d), price in integer cents, date epoch-µs.

    Plan: per-batch local skylines (dominance is transitive, so the
    global skyline is a subset of the union of local ones) shrink
    each block to its frontier — typically a few dozen points from
    tens of thousands — then ONE driver fold over the concatenated
    partials computes the global frontier, which broadcasts back as a
    hash set for a streaming membership filter. The driver holds
    O(skyline × blocks) points, never the fact table; the filter pass
    keeps every order that TIES a frontier point (duplicated optimal
    points all survive, matching the SQL dominance semantics)."""
    import ray
    import ray.data as rd

    def to_keys(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy(
            zero_copy_only=False)
        price_c = np.floor(price * 100 + 0.5).astype(np.int64)
        d = (batch.column("o_orderdate").cast(pa.timestamp("us"))
             .cast(pa.int64()).to_numpy(zero_copy_only=False))
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "price_c": pa.array(price_c, pa.int64()),
            "d": pa.array(d, pa.int64())})

    # deliberately NOT materialized: the keys plan re-executes for the
    # partial-skyline fold and the final membership filter (2 scans of
    # a 3-column pruned read) — the rescan-vs-materialize trade the
    # events_above_p95 adjudication picked for 100-TB memory safety
    keys = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice",
                                     "o_orderdate"])
            .map_batches(to_keys, batch_format="pyarrow"))

    def partial(batch: pa.Table) -> pa.Table:
        p, d = _local_skyline(
            batch.column("price_c").to_numpy(zero_copy_only=False),
            batch.column("d").to_numpy(zero_copy_only=False))
        return pa.table({"price_c": pa.array(p, pa.int64()),
                         "d": pa.array(d, pa.int64())})

    parts = pa.concat_tables(list(
        keys.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    p_fin, d_fin = _local_skyline(
        parts.column("price_c").to_numpy(zero_copy_only=False),
        parts.column("d").to_numpy(zero_copy_only=False))
    # frontier prices are unique (per-price max date), so membership
    # is price→expected-date lookup — vectorized searchsorted
    o = np.argsort(p_fin)
    sky = ray.put((p_fin[o], d_fin[o]))

    def member(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get
        sp, sd = cached_get(sky)
        p = batch.column("price_c").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(sp, p), 0, len(sp) - 1)
        keep = (sp[pos] == p) & (sd[pos] == d)
        return batch.filter(pa.array(keep))

    return keys.map_batches(member, batch_format="pyarrow")


ORDERS_SKYLINE_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
           epoch_us(o_orderdate) AS d
    FROM orders),
pm AS (SELECT price_c, MAX(d) AS d FROM o GROUP BY price_c),
s AS (
    SELECT price_c, d,
           MAX(d) OVER (ORDER BY price_c
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM pm),
sky AS (SELECT price_c, d FROM s
        WHERE prev_max IS NULL OR d > prev_max)
SELECT o.o_orderkey, o.price_c, o.d
FROM o JOIN sky ON o.price_c = sky.price_c AND o.d = sky.d
"""

# semantic twin for the skyline definition (quadratic — test-only, run
# at sf0.001 to pin that the window form above IS the NOT EXISTS
# dominance semantics)
ORDERS_SKYLINE_NOT_EXISTS_SQL = """
WITH o AS (
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
           epoch_us(o_orderdate) AS d
    FROM orders)
SELECT a.o_orderkey, a.price_c, a.d FROM o a
WHERE NOT EXISTS (
    SELECT 1 FROM o b
    WHERE b.price_c <= a.price_c AND b.d >= a.d
      AND (b.price_c < a.price_c OR b.d > a.d))
"""


# ---------------------------------------------------------------------------
# n-gram LM familiarity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

FAMILIARITY_MIN_COUNT = 2
# train bigram vocabularies fit comfortably in one broadcast at any
# tested SF; above this the score pass switches to the distributed
# join route (never raises — the round-4 embedding_decontaminate rule)
FAMILIARITY_BROADCAST_CUTOFF = 5_000_000


def _bigram_partial(batch: pa.Table, extra_cols: "tuple[str, ...]" = ()
                    ) -> "object":
    """Shared per-batch tokenize→bigram explode (the proven
    byte-identical tokenization of ``text.ngram_counts``): polars
    frame of (doc_id, *extra_cols, bigram)."""
    import polars as pl
    d = pl.from_arrow(batch.select(["doc_id", "text",
                                    *extra_cols]))
    d = d.with_columns(
        pl.col("text").fill_null("")
        .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
    d = (d.explode("w").drop_nulls("w")
         .with_columns(pl.col("w").str.to_lowercase()))
    d = d.with_columns(
        pl.col("w").shift(-1).over("doc_id").alias("w2"))
    return (d.drop_nulls("w2")
            .with_columns((pl.col("w") + pl.lit(" ") + pl.col("w2"))
                          .alias("bigram"))
            .drop(["w", "w2"]))


def docs_familiarity(sf_dir: str,
                     min_count: int = FAMILIARITY_MIN_COUNT,
                     broadcast_cutoff: int =
                     FAMILIARITY_BROADCAST_CUTOFF):
    """Bigram-LM familiarity score for EVERY document against the
    TRAIN split's bigram counts → (doc_id, n_bigrams, familiarity):
    ``familiarity`` = Σ over the doc's bigram positions of the train
    count of that bigram (test-split docs score low on held-out text;
    gibberish scores ~0) — the CCNet perplexity-filter shape in exact
    integer form (counts are a monotone proxy for the LM probability
    the float version would use, so threshold filters rank the same).

    Plan: train counts via the ``ngram_counts`` per-batch fold (the
    shuffle carries O(distinct × blocks) count rows). Scoring is
    count-gated: below the cutoff the count table broadcasts once
    (``ray.put`` → per-batch dict lookup via numpy searchsorted);
    above it, docs explode to per-batch (bigram, doc) partial counts
    that hash-join the count table and fold back per doc — the
    familiar broadcast-vs-exchange pair, never a raise. Per-doc
    ``n_bigrams`` is exact in one batch because one doc is one row
    (the `decontaminate` argument)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.packing import SPLIT_PCT
    from .analytics_r4 import _md5_bucket

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def train_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        train = _md5_bucket(ids) >= SPLIT_PCT
        bg = _bigram_partial(batch.filter(pa.array(train)))
        counts = bg.group_by("bigram").len(name="n")
        return counts.to_arrow().cast(pa.schema([
            ("bigram", pa.string()), ("n", pa.int64())]))

    counts = (docs.map_batches(train_partial, batch_format="pyarrow",
                               batch_size=8192)
              .groupby("bigram").aggregate(Sum("n", alias_name="n"))
              .map_batches(
                  lambda b: b.filter(pc.greater_equal(
                      b.column("n"), min_count)),
                  batch_format="pyarrow")
              .materialize())
    n_vocab = counts.count()

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
        ("familiarity", pa.int64())])

    if n_vocab <= broadcast_cutoff:
        tbl = pa.concat_tables(list(counts.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        ref = ray.put(tbl)  # one ray.put, re-wrapped zero-copy below

        def score(batch: pa.Table) -> pa.Table:
            import polars as pl

            from ..functions.broadcast import cached_get
            cnt = pl.from_arrow(cached_get(ref))
            bg = _bigram_partial(batch)
            per_doc = (bg.join(cnt, on="bigram", how="left")
                       .with_columns(pl.col("n").fill_null(0))
                       .group_by("doc_id")
                       .agg(n_bigrams=pl.len().cast(pl.Int64),
                            familiarity=pl.col("n").sum()))
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False)
            out = (pl.DataFrame({"doc_id": ids.astype(np.int64)})
                   .join(per_doc, on="doc_id", how="left")
                   .fill_null(0))
            return out.to_arrow().cast(out_schema)

        return docs.map_batches(score, batch_format="pyarrow",
                                batch_size=8192)

    # join route: per-batch (doc_id, bigram, k) partials join the
    # count table on bigram (both sides distinct-sized), fold per doc
    def doc_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        bg = _bigram_partial(batch)
        g = bg.group_by(["doc_id", "bigram"]).len(name="k")
        return g.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("bigram", pa.string()),
            ("k", pa.int64())]))

    pairs = docs.map_batches(doc_partial, batch_format="pyarrow",
                             batch_size=8192)
    joined = pairs.join(counts, join_type="inner", on=("bigram",),
                        num_partitions=16)

    def mul(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "familiarity": pa.array((k * n).astype(np.int64),
                                    pa.int64())})

    # materialized so the two JoinOperators never run in ONE streaming
    # plan — concurrent join actor pools starve each other at small
    # CPU counts (the triangle_count lesson, CLAUDE.md)
    fam = (joined.map_batches(mul, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("familiarity", alias_name="familiarity"))
           .materialize())

    # per-doc n_bigrams is exact in one batch (one doc = one row);
    # familiarity attaches by an int64 doc_id join — the whole route
    # stays a Dataset (no driver collect of a doc-sized table)
    def nbg_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        bg = _bigram_partial(batch)
        g = bg.group_by("doc_id").len(name="n_bigrams")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out = (pl.DataFrame({"doc_id": ids.astype(np.int64)})
               .join(g, on="doc_id", how="left")
               .with_columns(pl.col("n_bigrams").fill_null(0)
                             .cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_bigrams", pa.int64())]))

    nbg = docs.map_batches(nbg_partial, batch_format="pyarrow",
                           batch_size=8192)
    out = nbg.join(fam, join_type="left_outer", on=("doc_id",),
                   num_partitions=16)

    def finish(batch: pa.Table) -> pa.Table:
        f = batch.column("familiarity")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bigrams": batch.column("n_bigrams"),
            "familiarity": pc.fill_null(f.cast(pa.int64()), 0)})

    return out.map_batches(finish, batch_format="pyarrow")


def _familiarity_sql(min_count: int = FAMILIARITY_MIN_COUNT) -> str:
    from ..functions.packing import SPLIT_PCT
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                          x -> lower(x)) AS w
    FROM documents),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1])) AS bigram
    FROM toks),
train_counts AS (
    SELECT bigram, COUNT(*) AS n FROM bg
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 100 >= {SPLIT_PCT}
    GROUP BY bigram HAVING COUNT(*) >= {min_count}),
fam AS (
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(COALESCE(t.n, 0)) AS BIGINT) AS familiarity
    FROM bg d LEFT JOIN train_counts t USING (bigram)
    GROUP BY d.doc_id)
SELECT documents.doc_id,
       COALESCE(fam.n_bigrams, 0) AS n_bigrams,
       COALESCE(fam.familiarity, 0) AS familiarity
FROM documents LEFT JOIN fam ON documents.doc_id = fam.doc_id
"""


# ---------------------------------------------------------------------------
# grouped top-k n-grams
# ---------------------------------------------------------------------------

NGRAM_TOPK = 5


def docs_ngram_topk_per_lang(sf_dir: str, k: int = NGRAM_TOPK):
    """The ``k`` most frequent bigrams per language → (lang, bigram,
    n, rk), ties broken by bigram text (deterministic both engines).

    Plan: per-batch (lang, bigram) count folds → one global groupby
    sum (the shuffle carries distinct-bigram count rows), then the
    grouped-top-N pattern of ``events_topn_per_type``: a per-batch
    partial top-k prunes each block to ≤ k·langs rows before the tiny
    per-lang final."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        bg = _bigram_partial(batch, extra_cols=("lang",))
        counts = bg.group_by(["lang", "bigram"]).len(name="n")
        return counts.to_arrow().cast(pa.schema([
            ("lang", pa.string()), ("bigram", pa.string()),
            ("n", pa.int64())]))

    summed = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
              .map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
              .groupby(["lang", "bigram"])
              .aggregate(Sum("n", alias_name="n")))

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["lang", "n", "bigram"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("lang").head(k),
                                    preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "bigram"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (summed.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(final_topk, batch_format="pandas")
            .map_batches(lambda b: b.cast(pa.schema([
                ("lang", pa.string()), ("bigram", pa.string()),
                ("n", pa.int64()), ("rk", pa.int64())])),
                batch_format="pyarrow"))


DOCS_NGRAM_TOPK_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang,
           list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                          x -> lower(x)) AS w
    FROM documents),
bg AS (
    SELECT lang,
           unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1])) AS bigram
    FROM toks),
c AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2),
r AS (SELECT lang, bigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram) AS rk
      FROM c)
SELECT lang, bigram, n, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {NGRAM_TOPK}
"""


# ---------------------------------------------------------------------------
# edit-distance similarity self-join
# ---------------------------------------------------------------------------

EDIT_K = 2
EDIT_KEY_LEN = 24
# above this many rows in ONE (lang, length-bucket) blocking group the
# all-pairs route's map_groups frame stops fitting a worker — switch
# to the PassJoin segment-pigeonhole candidate join (exact, no group
# materialization)
EDIT_BLOCK_GROUP_CUTOFF = 200_000


def _edit_keys(sf_dir: str, key_len: int):
    """(doc_id, lang, key, klen) Dataset — keys computed by embedded
    DuckDB so lower/substr unicode semantics match the oracle's by
    construction."""
    import ray.data as rd

    from ..functions.md5keys import _con

    def keyed(batch: pa.Table) -> pa.Table:
        con = _con()
        tbl = batch.select(["doc_id", "lang", "text"])  # noqa: F841
        return con.execute(
            f"SELECT doc_id, lang,"
            f" lower(substr(COALESCE(text, ''), 1, {int(key_len)}))"
            f" AS key, length(lower(substr(COALESCE(text, ''), 1,"
            f" {int(key_len)}))) AS klen FROM tbl").arrow()

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "text"])
            .map_batches(keyed, batch_format="pyarrow",
                         batch_size=8192))


def docs_edit_distance_pairs(sf_dir: str, k: int = EDIT_K,
                             key_len: int = EDIT_KEY_LEN,
                             route: str = "auto",
                             block_group_cutoff: int =
                             EDIT_BLOCK_GROUP_CUTOFF):
    """Fuzzy-key self-join: pairs of documents whose normalized key
    (lowercased first ``key_len`` characters) is within edit distance
    ``k``, same language → (doc_a, doc_b, dist), doc_a < doc_b.

    The similarity-join shape exact dedup can't cover (OCR noise,
    near-identical titles). Two exact routes, count-gated on the
    EXACT blocking-group sizes (one tiny fold):

    - ``block`` (small groups): (lang, ⌊len/(k+1)⌋) length blocking —
      strings within distance k differ in length by ≤ k, so each row
      replicates to its own and the NEXT bucket and every qualifying
      pair meets exactly once; one vectorized C ``levenshtein``
      (embedded single-thread DuckDB, the md5keys pattern) verifies
      each group's length-filtered candidate pairs. Θ(group²) pairs
      AND the whole group materializes in one ``map_groups`` frame —
      fine until a language's keys collapse into one length bucket at
      corpus scale.
    - ``passjoin`` (any group above the cutoff): the segment
      pigeonhole — k edits touch ≤ k of the shorter key's k+1
      segments, so one segment survives VERBATIM with position shift
      ≤ k. Index rows carry each key's k+1 exact segments; probe rows
      carry each key's substrings at every (target-length, segment,
      ±k shift) window; ONE hash join on (lang, L, seg_idx, content)
      yields a candidate superset that dedupes and verifies per
      batch. No group ever materializes; the exchange is keyed by
      8-char segment content (high entropy), and candidates are
      dup-bounded × O(k³) windows. Pairs whose SHORTER key has ≤ k
      chars (where empty segments would void the pigeonhole) verify
      in one tiny ≤2k-length all-pairs group — disjoint from the
      passjoin set by the min-length split, so nothing double-counts.

    Both routes return identical rows (forced-route test) and
    hash-match the quadratic SQL oracle."""
    keys = _edit_keys(sf_dir, key_len).materialize()

    if route == "auto":
        import polars as pl
        counts = pa.concat_tables(list(
            keys.map_batches(
                lambda b: pl.from_arrow(b)
                .with_columns((pl.col("klen") // (k + 1)).alias("grp"))
                .group_by(["lang", "grp"]).len(name="n").to_arrow()
                .cast(pa.schema([("lang", pa.string()),
                                 ("grp", pa.int64()),
                                 ("n", pa.int64())])),
                batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20,
                          batch_format="pyarrow")))
        per_group = (pd.DataFrame(counts.to_pydict())
                     .groupby(["lang", "grp"])["n"].sum())
        route = ("passjoin" if len(per_group) and
                 per_group.max() > block_group_cutoff else "block")

    if route == "passjoin":
        return _edit_pairs_passjoin(keys, k)
    return _edit_pairs_block(keys, k)


def _edit_pairs_block(keys, k: int):
    """The small-group route: next-bucket replication + per-group
    all-pairs verify (see docs_edit_distance_pairs)."""
    from ..functions.md5keys import _con

    def tag(batch: pa.Table) -> pa.Table:
        klen = batch.column("klen").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bkt = klen // (k + 1)
        orig = batch.append_column(
            "grp", pa.array(bkt, pa.int64())).append_column(
            "is_repl", pa.array(np.zeros(len(klen), np.int8)))
        repl = batch.append_column(
            "grp", pa.array(bkt + 1, pa.int64())).append_column(
            "is_repl", pa.array(np.ones(len(klen), np.int8)))
        return pa.concat_tables([orig, repl])

    keys = keys.map_batches(tag, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        con = _con()
        orig = g[g["is_repl"] == 0]
        repl = g[g["is_repl"] == 1]
        o_tbl = pa.Table.from_pandas(  # noqa: F841
            orig[["doc_id", "key", "klen"]], preserve_index=False)
        r_tbl = pa.Table.from_pandas(  # noqa: F841
            repl[["doc_id", "key", "klen"]], preserve_index=False)
        sql_pairs = (
            # same-bucket pairs (orig × orig, a < b)
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            f" levenshtein(a.key, b.key) AS dist"
            f" FROM o_tbl a JOIN o_tbl b ON a.doc_id < b.doc_id"
            f" AND abs(a.klen - b.klen) <= {int(k)}"
            f" UNION ALL "
            # adjacent-bucket pairs (orig in THIS group × replica
            # carried up from the previous group)
            f"SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,"
            f" GREATEST(a.doc_id, b.doc_id) AS doc_b,"
            f" levenshtein(a.key, b.key) AS dist"
            f" FROM o_tbl a JOIN r_tbl b ON a.doc_id != b.doc_id"
            f" AND abs(a.klen - b.klen) <= {int(k)}")
        out = con.execute(
            f"SELECT doc_a, doc_b, CAST(dist AS BIGINT) AS dist"
            f" FROM ({sql_pairs}) WHERE dist <= {int(k)}").df()
        return out

    return (keys.groupby(["lang", "grp"])
            .map_groups(verify, batch_format="pandas")
            .map_batches(lambda b: b.cast(_EDIT_PAIRS_SCHEMA),
                         batch_format="pyarrow"))


_EDIT_PAIRS_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("dist", pa.int64())])


def _edit_pairs_passjoin(keys, k: int):
    """The scale route: exact PassJoin-style segment-pigeonhole
    candidate generation (see docs_edit_distance_pairs). ``keys`` is
    the materialized (doc_id, lang, key, klen) Dataset."""
    import polars as pl
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..functions.md5keys import _con

    P = k + 1

    def _geom(L: np.ndarray, i: int):
        """Segment i's (position, length) for keys of length L —
        near-equal split, first L%P segments one char longer."""
        base, rem = L // P, L % P
        ln = base + (i < rem)
        pos = i * base + np.minimum(i, rem)
        return pos, ln

    # --- short side: pairs whose shorter key has ≤ k chars (empty
    # segments void the pigeonhole there); both sides then have ≤ 2k
    # chars, so one per-lang all-pairs group covers them exactly,
    # restricted to min(len) ≤ k so it is DISJOINT from the passjoin
    # candidate set (which only ever pairs keys of length ≥ k+1)
    def short_filter(b: pa.Table) -> pa.Table:
        klen = b.column("klen").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(klen <= 2 * k))

    def short_verify(g: pd.DataFrame) -> pd.DataFrame:
        con = _con()
        s_tbl = pa.Table.from_pandas(  # noqa: F841
            g[["doc_id", "key", "klen"]], preserve_index=False)
        return con.execute(
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            f" CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist"
            f" FROM s_tbl a JOIN s_tbl b ON a.doc_id < b.doc_id"
            f" AND LEAST(a.klen, b.klen) <= {int(k)}"
            f" AND abs(a.klen - b.klen) <= {int(k)}"
            f" WHERE levenshtein(a.key, b.key) <= {int(k)}").df()

    short_pairs = (keys.map_batches(short_filter,
                                    batch_format="pyarrow")
                   .groupby("lang")
                   .map_groups(short_verify, batch_format="pandas")
                   .map_batches(lambda b: b.cast(_EDIT_PAIRS_SCHEMA),
                                batch_format="pyarrow"))

    # --- index side: each key's k+1 exact segments
    def index_rows(b: pa.Table) -> pa.Table:
        d = pl.from_arrow(b)
        d = d.filter(pl.col("klen") >= P)
        if not len(d):
            return _PJ_SCHEMA.empty_table()
        klen = d["klen"].to_numpy()
        outs = []
        for i in range(P):
            pos, ln = _geom(klen, i)
            outs.append(d.with_columns(
                pl.Series("_pos", pos), pl.Series("_ln", ln))
                .with_columns(
                    pl.lit(np.int64(i)).alias("si"),
                    pl.col("key").str.slice(
                        pl.col("_pos"), pl.col("_ln")).alias("seg"),
                    pl.col("klen").alias("L")))
        out = pl.concat(outs).select(
            ["lang", "L", "si", "seg", "doc_id", "key"])
        return out.rename({"doc_id": "doc_i", "key": "key_i"}) \
            .to_arrow().cast(_PJ_INDEX_SCHEMA)

    # --- probe side: substrings at every (target length, segment,
    # ±k shift) window, deduped per key before the exchange
    def probe_rows(b: pa.Table) -> pa.Table:
        d = pl.from_arrow(b)
        d = d.filter(pl.col("klen") >= P)
        if not len(d):
            return _PJ_PROBE_SCHEMA.empty_table()
        outs = []
        for off in range(k + 1):
            dl = d.with_columns((pl.col("klen") - off).alias("L")) \
                .filter(pl.col("L") >= P)
            if not len(dl):
                continue
            L = dl["L"].to_numpy()
            la = dl["klen"].to_numpy()
            for i in range(P):
                pos0, ln = _geom(L, i)
                for delta in range(-k, k + 1):
                    pos = pos0 + delta
                    valid = (pos >= 0) & (pos + ln <= la)
                    if not valid.any():
                        continue
                    dv = dl.filter(pl.Series(valid))
                    outs.append(dv.with_columns(
                        pl.Series("_pos", pos[valid]),
                        pl.Series("_ln", ln[valid]))
                        .with_columns(
                            pl.lit(np.int64(i)).alias("si"),
                            pl.col("key").str.slice(
                                pl.col("_pos"), pl.col("_ln"))
                            .alias("seg")))
        if not outs:
            return _PJ_PROBE_SCHEMA.empty_table()
        out = (pl.concat(outs)
               .select(["lang", "L", "si", "seg", "doc_id", "key"])
               .unique())
        return out.rename({"doc_id": "doc_p", "key": "key_p"}) \
            .to_arrow().cast(_PJ_PROBE_SCHEMA)

    probes = keys.map_batches(probe_rows,
                              batch_format="pyarrow").materialize()
    index = keys.map_batches(index_rows,
                             batch_format="pyarrow").materialize()
    # partition clamp: empty right-side partitions crash Ray's hash
    # join (the local_clustering lesson, CLAUDE.md)
    parts = max(1, min(16,
                       min(probes.count(), index.count()) // 4096 + 1))
    cand = probes.join(index, join_type="inner",
                       on=("lang", "L", "si", "seg"),
                       num_partitions=parts)

    # orient + locally dedupe, then ONE aggregate exchange makes the
    # pair set globally distinct (a pair can match several windows)
    def orient(b: pa.Table) -> pa.Table:
        dp = b.column("doc_p").to_numpy(zero_copy_only=False)
        di = b.column("doc_i").to_numpy(zero_copy_only=False)
        keep = dp != di
        d = pl.from_arrow(b.filter(pa.array(keep)))
        if not len(d):
            return _PJ_CAND_SCHEMA.empty_table()
        d = d.with_columns(
            pl.min_horizontal("doc_p", "doc_i").alias("doc_a"),
            pl.max_horizontal("doc_p", "doc_i").alias("doc_b"),
            pl.when(pl.col("doc_p") < pl.col("doc_i"))
            .then(pl.col("key_p")).otherwise(pl.col("key_i"))
            .alias("key_a"),
            pl.when(pl.col("doc_p") < pl.col("doc_i"))
            .then(pl.col("key_i")).otherwise(pl.col("key_p"))
            .alias("key_b"))
        return (d.select(["doc_a", "doc_b", "key_a", "key_b"])
                .unique().to_arrow().cast(_PJ_CAND_SCHEMA))

    distinct = (cand.map_batches(orient, batch_format="pyarrow")
                .groupby(["doc_a", "doc_b", "key_a", "key_b"])
                .aggregate(Count(alias_name="_c")))

    def verify_batch(b: pa.Table) -> pa.Table:
        con = _con()
        c_tbl = b.select(  # noqa: F841
            ["doc_a", "doc_b", "key_a", "key_b"])
        return con.execute(
            f"SELECT doc_a, doc_b,"
            f" CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist"
            f" FROM c_tbl"
            f" WHERE levenshtein(key_a, key_b) <= {int(k)}").arrow() \
            .cast(_EDIT_PAIRS_SCHEMA)

    long_pairs = distinct.map_batches(verify_batch,
                                      batch_format="pyarrow")
    return long_pairs.union(short_pairs)


_PJ_INDEX_SCHEMA = pa.schema([
    ("lang", pa.string()), ("L", pa.int64()), ("si", pa.int64()),
    ("seg", pa.string()), ("doc_i", pa.int64()),
    ("key_i", pa.string())])
_PJ_PROBE_SCHEMA = pa.schema([
    ("lang", pa.string()), ("L", pa.int64()), ("si", pa.int64()),
    ("seg", pa.string()), ("doc_p", pa.int64()),
    ("key_p", pa.string())])
_PJ_CAND_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("key_a", pa.string()), ("key_b", pa.string())])
_PJ_SCHEMA = _PJ_INDEX_SCHEMA


DOCS_EDIT_PAIRS_SQL = f"""
WITH kx AS (
    SELECT doc_id, lang,
           lower(substr(COALESCE(text, ''), 1, {EDIT_KEY_LEN})) AS key
    FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
FROM kx a JOIN kx b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
 AND abs(length(a.key) - length(b.key)) <= {EDIT_K}
WHERE levenshtein(a.key, b.key) <= {EDIT_K}
"""


# ---------------------------------------------------------------------------
# fuzzy entity-resolution clusters (edit-distance pairs → components)
# ---------------------------------------------------------------------------


FUZZY_PAIRS_DRIVER_CUTOFF = 2_000_000


def docs_fuzzy_clusters(sf_dir: str, k: int = EDIT_K,
                        key_len: int = EDIT_KEY_LEN,
                        driver_cutoff: int = FUZZY_PAIRS_DRIVER_CUTOFF):
    """End-to-end fuzzy dedup / entity resolution: blocking →
    pairwise edit-distance scoring → connected components → every
    document labelled with its cluster id (min doc_id reachable
    through ≤``k``-edit links; singletons label themselves) →
    (doc_id, cluster).

    The composition the similarity-join exists FOR: the pair table
    from :func:`docs_edit_distance_pairs` is dup-bounded (orders of
    magnitude below the corpus), so the component fold runs on the
    candidate-pair scale — count-gated like ``dedup_corpus``: below
    ``driver_cutoff`` pairs the broadcast-label
    ``connected_components`` (its documented operating point), above
    it the pinned-bucket ``connected_components_ds`` round plan over
    the SAME pair Dataset. The final label attach is one broadcast
    searchsorted over the streaming doc table (cluster tables are
    dup-bounded, not corpus-bounded)."""
    import ray
    import ray.data as rd

    from ..functions.components import (
        connected_components,
        connected_components_ds,
    )

    pairs = docs_edit_distance_pairs(sf_dir, k=k, key_len=key_len) \
        .materialize()
    n_pairs = pairs.count()
    if n_pairs > driver_cutoff:
        e64 = pairs.map_batches(
            lambda b: pa.table({"src": b.column("doc_a"),
                                "dst": b.column("doc_b")}),
            batch_format="pyarrow")
        from ray.data.aggregate import Count

        def endpoints_unique(b: pa.Table) -> pa.Table:
            ids = np.concatenate([
                b.column("doc_a").to_numpy(zero_copy_only=False),
                b.column("doc_b").to_numpy(zero_copy_only=False)])
            return pa.table({"node": pa.array(
                np.unique(ids).astype(np.int64), pa.int64())})

        nodes64 = (pairs.map_batches(endpoints_unique,
                                     batch_format="pyarrow")
                   .groupby("node")
                   .aggregate(Count(alias_name="c"))
                   .map_batches(lambda b: b.select(["node"]),
                                batch_format="pyarrow"))
        labels = pa.concat_tables(list(
            connected_components_ds(e64, nodes64, n_edges=n_pairs)
            .iter_batches(batch_size=1 << 20,
                          batch_format="pyarrow")))
    else:
        pair_tbl = pa.concat_tables(list(pairs.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")))
        labels, _stats = connected_components(pair_tbl.select(
            ["doc_a", "doc_b"]))
    nodes = labels.column("node").to_numpy(zero_copy_only=False)
    labs = labels.column("label").to_numpy(zero_copy_only=False)
    o = np.argsort(nodes)
    ref = ray.put((nodes[o], labs[o]))

    def attach(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get
        nds, lbs = cached_get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(nds):
            pos = np.clip(np.searchsorted(nds, ids), 0, len(nds) - 1)
            hit = nds[pos] == ids
            cluster = np.where(hit, lbs[pos], ids)
        else:
            cluster = ids
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cluster.astype(np.int64), pa.int64())})

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
            .map_batches(attach, batch_format="pyarrow"))


DOCS_FUZZY_CLUSTERS_SQL = f"""
WITH kx AS (
    SELECT doc_id, lang,
           lower(substr(COALESCE(text, ''), 1, {EDIT_KEY_LEN})) AS key
    FROM documents),
p AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM kx a JOIN kx b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(length(a.key) - length(b.key)) <= {EDIT_K}
    WHERE levenshtein(a.key, b.key) <= {EDIT_K}),
e AS (SELECT doc_a AS s, doc_b AS o FROM p
      UNION ALL SELECT doc_b, doc_a FROM p),
r AS (
    WITH RECURSIVE reach(node, m) AS (
        SELECT s, s FROM e
        UNION
        SELECT e.s, r2.m FROM e JOIN reach r2 ON e.o = r2.node
    )
    SELECT node, MIN(m) AS label FROM reach GROUP BY node)
SELECT d.doc_id,
       CAST(COALESCE(r.label, d.doc_id) AS BIGINT) AS cluster
FROM documents d LEFT JOIN r ON d.doc_id = r.node
"""


# ---------------------------------------------------------------------------
# systematic PPS (weight-proportional) sampling
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_TARGET = 64
WEIGHTED_RANGE_DOCS = 4096


def docs_weighted_sample(sf_dir: str,
                         n_target: int = WEIGHTED_SAMPLE_TARGET,
                         range_docs: int = WEIGHTED_RANGE_DOCS):
    """Systematic probability-proportional-to-size sampling: walk the
    corpus in doc_id order accumulating weight (``n_chars``); every
    time the cumulative weight crosses a multiple of ``step =
    max(W_total // n_target, 1)`` the current document is selected →
    (doc_id, w, n_hits), n_hits = how many step-multiples the doc's
    weight interval covers (≥ 2 means the doc alone outweighs a
    stride — the PPS analogue of sampling it with multiplicity). All
    integer arithmetic: reproducible across engines and partitionings
    with no RNG.

    Plan: the ``pack_sequences`` distributed-prefix-sum shape —
    per-range weight totals fold to ONE tiny table (a row per
    ``range_docs`` ids), the driver prefix-sums it, and each batch
    reconstructs its docs' exact global interval starts from the
    broadcast bases plus an in-range cumulative sum; selection is then
    a pure per-row formula. No corpus-sized exchange anywhere."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def range_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch)
        d = d.with_columns((pl.col("doc_id") // range_docs)
                           .alias("rng"))
        g = d.group_by("rng").agg(w=pl.col("n_chars").sum())
        return g.to_arrow().cast(pa.schema([
            ("rng", pa.int64()), ("w", pa.int64())]))

    ranges = (docs.map_batches(range_partial, batch_format="pyarrow")
              .groupby("rng").aggregate(Sum("w", alias_name="w"))
              .to_pandas().sort_values("rng"))
    totals = ranges["w"].to_numpy().astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])
    w_total = int(totals.sum())
    step = max(w_total // n_target, 1)
    base_ref = ray.put((ranges["rng"].to_numpy().astype(np.int64),
                        bases))

    def select(batch: pa.Table) -> pa.Table:
        import polars as pl

        from ..functions.broadcast import cached_get
        rng_ids, rng_bases = cached_get(base_ref)
        d = (pl.from_arrow(batch)
             .sort("doc_id")
             .with_columns((pl.col("doc_id") // range_docs)
                           .alias("rng")))
        w = d["n_chars"].to_numpy().astype(np.int64)
        # in-range exclusive prefix + broadcast base = global start.
        # Exact only when a range's docs share one batch — guaranteed
        # by re-keying batches to ranges below.
        starts = np.cumsum(w) - w
        rg = d["rng"].to_numpy()
        head = np.concatenate([[True], rg[1:] != rg[:-1]])
        # subtract each range's first in-batch prefix, add its base
        grp_first = np.maximum.accumulate(
            np.where(head, np.arange(len(w)), 0))
        starts = starts - starts[grp_first]
        pos = np.searchsorted(rng_ids, rg)
        starts = starts + rng_bases[pos]
        end = starts + w
        n_hits = ((end - 1) // step
                  - np.maximum((starts - 1) // step, 0))
        keep = n_hits >= 1
        return pa.table({
            "doc_id": pa.array(d["doc_id"].to_numpy()[keep],
                               pa.int64()),
            "w": pa.array(w[keep], pa.int64()),
            "n_hits": pa.array(n_hits[keep].astype(np.int64),
                               pa.int64())})

    # co-locate each range's docs in one group so the in-batch prefix
    # sum is exact (the pack_sequences layout)
    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_rng", pa.array((ids // range_docs).astype(np.int64),
                             pa.int64()))

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        out = select(pa.Table.from_pandas(
            g[["doc_id", "n_chars"]], preserve_index=False))
        return out.to_pandas()

    return (docs.map_batches(tag, batch_format="pyarrow")
            .groupby("_rng")
            .map_groups(per_range, batch_format="pandas")
            .map_batches(lambda b: b.cast(pa.schema([
                ("doc_id", pa.int64()), ("w", pa.int64()),
                ("n_hits", pa.int64())])), batch_format="pyarrow"))


def _weighted_sample_sql(n_target: int = WEIGHTED_SAMPLE_TARGET) -> str:
    return f"""
WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
c AS (SELECT doc_id, w,
             COALESCE(SUM(w) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS strt
      FROM w),
t AS (SELECT GREATEST(CAST(SUM(w) AS BIGINT) // {n_target}, 1)
          AS step FROM w),
s AS (SELECT doc_id, w,
             CAST((strt + w - 1) // step
                  - GREATEST((strt - 1) // step, 0) AS BIGINT)
                 AS n_hits
      FROM c, t)
SELECT doc_id, w, n_hits FROM s WHERE n_hits >= 1
"""


# ---------------------------------------------------------------------------
# per-document TF-IDF top terms
# ---------------------------------------------------------------------------

TOP_TERMS_K = 3
TOP_TERMS_IDF_SCALE = 1000
# vocab tables broadcast at every tested SF; past this the score pass
# would switch to the docs_familiarity join route (same shape)
TOP_TERMS_BROADCAST_CUTOFF = 5_000_000


def docs_top_terms(sf_dir: str, k: int = TOP_TERMS_K,
                   broadcast_cutoff: int = TOP_TERMS_BROADCAST_CUTOFF):
    """Each document's ``k`` most characteristic terms by integer
    TF-IDF (score = tf × ((N × {scale}) // df), ties broken by term)
    → (doc_id, term, score, rk).

    Plan: the corpus df table folds once (the ``doc_frequency``
    exchange, O(distinct × blocks) count rows). Scoring is
    count-gated on the EXACT vocabulary size: below the cutoff the df
    table broadcasts and the pass is per-batch-exact with ZERO
    further exchange — one document is one input row, so its term
    counts, scores and top-k all complete inside its own batch (the
    one-doc-one-row argument). Above it (vocabularies that exceed one
    machine), per-batch (doc, term, tf) partials hash-join the df
    Dataset on term and the top-k folds through one doc_id exchange —
    the docs_familiarity join-route shape, never a raise."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(
            pl.col("text").fill_null("")
            .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
        d = (d.explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase()))
        g = d.group_by("w").agg(df=pl.col("doc_id").n_unique())
        return g.rename({"w": "term"}).to_arrow().cast(pa.schema([
            ("term", pa.string()), ("df", pa.int64())]))

    df_ds = (docs.map_batches(df_partial, batch_format="pyarrow",
                              batch_size=8192)
             .groupby("term").aggregate(Sum("df", alias_name="df"))
             .materialize())
    n_vocab = df_ds.count()
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()),
        ("score", pa.int64()), ("rk", pa.int64())])

    if n_vocab > broadcast_cutoff:
        def tf_partial(batch: pa.Table) -> pa.Table:
            import polars as pl
            d = pl.from_arrow(batch.select(["doc_id", "text"]))
            d = d.with_columns(
                pl.col("text").fill_null("")
                .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
            d = (d.explode("w").drop_nulls("w")
                 .with_columns(pl.col("w").str.to_lowercase()))
            g = d.group_by(["doc_id", "w"]).len(name="tf") \
                .rename({"w": "term"})
            return g.to_arrow().cast(pa.schema([
                ("doc_id", pa.int64()), ("term", pa.string()),
                ("tf", pa.int64())]))

        pairs = docs.map_batches(tf_partial, batch_format="pyarrow",
                                 batch_size=8192)
        joined = pairs.join(df_ds, join_type="inner", on=("term",),
                            num_partitions=16)

        def scored(batch: pa.Table) -> pa.Table:
            tf = batch.column("tf").to_numpy(zero_copy_only=False)
            df = batch.column("df").to_numpy(zero_copy_only=False)
            score = tf * ((n_docs * TOP_TERMS_IDF_SCALE) // df)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "score": pa.array(score.astype(np.int64),
                                  pa.int64())})

        def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["score", "term"],
                              ascending=[False, True]).head(k)
            g = g.reset_index(drop=True)
            g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
            return g[["doc_id", "term", "score", "rk"]]

        return (joined.map_batches(scored, batch_format="pyarrow")
                .groupby("doc_id")
                .map_groups(doc_topk, batch_format="pandas")
                .map_batches(lambda b: b.cast(out_schema),
                             batch_format="pyarrow"))

    df_tbl = pa.concat_tables(list(df_ds.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")))
    ref = ray.put(df_tbl)

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl

        from ..functions.broadcast import cached_get
        df = pl.from_arrow(cached_get(ref))
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(
            pl.col("text").fill_null("")
            .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
        d = (d.explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase()))
        tf = (d.group_by(["doc_id", "w"]).len(name="tf")
              .rename({"w": "term"})
              .join(df, on="term", how="inner")
              .with_columns(
                  (pl.col("tf")
                   * ((n_docs * TOP_TERMS_IDF_SCALE)
                      // pl.col("df"))).alias("score")))
        top = (tf.sort(["doc_id", "score", "term"],
                       descending=[False, True, False])
               .with_columns(pl.col("term").cum_count().over("doc_id")
                             .alias("rk"))
               .filter(pl.col("rk") <= k)
               .select(["doc_id", "term", "score", "rk"]))
        return top.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("term", pa.string()),
            ("score", pa.int64()), ("rk", pa.int64())]))

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=8192)


DOCS_TOP_TERMS_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                                 x -> lower(x))) AS term
    FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS nd FROM documents),
s AS (SELECT tf.doc_id, tf.term,
             CAST(tf.tf * ((n.nd * {TOP_TERMS_IDF_SCALE}) // dfx.df)
                  AS BIGINT) AS score
      FROM tf JOIN dfx USING (term), n),
r AS (SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rk
      FROM s)
SELECT doc_id, term, score, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {TOP_TERMS_K}
"""


# ---------------------------------------------------------------------------
# semi-structured (JSON) column extraction
# ---------------------------------------------------------------------------


def events_props_stats(sf_dir: str):
    """Parse the semi-structured ``props`` JSON column and aggregate
    the extracted field per event_type → (event_type, n, sum_k,
    n_distinct_k). The JSON-plane shape (log/telemetry payloads) the
    registry didn't cover: extraction is one vectorized polars
    ``json_path_match`` per batch (no per-row json.loads), and the
    distinct count folds exactly through a two-level exchange —
    per-batch (type, k, cnt) partials → global (type, k) sum (the
    value domain, not the event stream) → per-type final where
    ``n_distinct_k`` is just the surviving row count."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["event_type", "props"]))
        d = d.with_columns(
            pl.col("props").str.json_path_match("$.k")
            .cast(pl.Int64).alias("k")).drop("props")
        g = (d.group_by(["event_type", "k"])
             .agg(cnt=pl.len().cast(pl.Int64)))
        return g.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("k", pa.int64()),
            ("cnt", pa.int64())]))

    per_value = (rd.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_type", "props"])
                 .map_batches(partial, batch_format="pyarrow")
                 .groupby(["event_type", "k"])
                 .aggregate(Sum("cnt", alias_name="cnt")))

    def widen(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        c = batch.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("cnt"),
            "sum_k": pa.array((k * c).astype(np.int64), pa.int64()),
            "one": pa.array(np.ones(len(k), np.int64), pa.int64())})

    return (per_value.map_batches(widen, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_k", alias_name="sum_k"),
                       Sum("one", alias_name="n_distinct_k")))


EVENTS_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS n_distinct_k
FROM events GROUP BY event_type
"""
