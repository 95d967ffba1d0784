"""Batched model-scoring stage — the "run a classifier over every
document" shape a training-data pipeline uses for quality filtering
(fastText-style): per-actor model state loaded ONCE in ``__init__``
(weights + a compiled feature tokenizer — the expensive setup a real
model has), a fully vectorized ``__call__`` per batch, and a keep
decision at a threshold.

The model here is a deterministic integer-arithmetic linear scorer so
DuckDB can replay it EXACTLY (the same reason the quality/lang-id
kernels are integer: float logits never hash-match). The plumbing —
stateful actor pool, batched feature extraction, vectorized scoring,
threshold filter — is the real inference shape; swapping the linear
weights for a real model changes ``__init__``/``_score`` only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# stopword evidence feature — ASCII so Python/DuckDB lowercasing and
# token membership agree byte-for-byte
_STOPWORDS = ("the", "and", "of", "to", "in", "is", "for", "with")

# integer model weights (basis-point arithmetic; would be a loaded
# artifact for a real model)
W_TOKENS, W_ALPHA, W_STOP, W_LEN_PEN = 2, 3, 5, 1
KEEP_THRESHOLD = 360        # ~corpus median at every tested scale


class QualityModel:
    """Callable-class stage for ``map_batches(QualityModel, ...)``:
    weights and the token pattern build once per actor (or once per
    worker process under the stateless-task default), every batch is
    one vectorized polars pass."""

    def __init__(self):
        import polars as pl
        self.pl = pl
        self.stop = pl.Series(list(_STOPWORDS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = self.pl
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(pl.col("text").fill_null(""))
        feats = d.select(
            pl.col("doc_id"),
            pl.col("text").str.count_matches(r"\S+")
              .cast(pl.Int64).alias("n_tokens"),
            # len_chars, not len_bytes: DuckDB length() counts
            # CHARACTERS — byte counts diverge on any non-ASCII doc
            pl.col("text").str.len_chars()
              .cast(pl.Int64).alias("n_chars"),
            pl.col("text").str.count_matches("[a-zA-Z]")
              .cast(pl.Int64).alias("n_alpha"),
            pl.col("text").str.extract_all(r"[A-Za-z]+")
              .list.eval(pl.element().str.to_lowercase()
                         .is_in(self.stop))
              .list.sum().fill_null(0).cast(pl.Int64).alias("stop_n"),
        )
        doc_id = feats["doc_id"].to_numpy()
        n_tok = feats["n_tokens"].to_numpy()
        n_chr = feats["n_chars"].to_numpy()
        n_alp = feats["n_alpha"].to_numpy()
        stop_n = feats["stop_n"].to_numpy()
        alpha_bp = n_alp * 10000 // np.maximum(n_chr, 1)
        # chars-per-token in centi-units: 5.5 chars/token → 550
        wordlen_cb = n_chr * 100 // np.maximum(n_tok, 1)
        score = (W_TOKENS * np.minimum(n_tok, 100)
                 + W_ALPHA * (alpha_bp // 100)
                 + W_STOP * stop_n
                 - W_LEN_PEN * (np.abs(wordlen_cb - 550) // 10))
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "score": pa.array(score.astype(np.int64), pa.int64()),
            "keep": pa.array(score >= KEEP_THRESHOLD, pa.bool_()),
        })


_PROC_MODEL: list = []


def _score_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task path: the model builds once per worker PROCESS
    (module-level cache), not once per batch — the same state
    discipline as the actor pool without reserving actors (the
    library's small-session deadlock rule)."""
    if not _PROC_MODEL:
        _PROC_MODEL.append(QualityModel())
    return _PROC_MODEL[0](batch)


def score_documents(sf_dir: str, concurrency: int | None = None):
    """Score every document with the quality model → (doc_id, score,
    keep). Default is STATELESS TASKS with a per-process model cache
    (the library rule: stacked actor pools starve small sessions);
    pass ``concurrency=N`` to opt into an actor pool."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    if concurrency:
        return ds.map_batches(QualityModel, batch_format="pyarrow",
                              batch_size=4096,
                              concurrency=concurrency)
    return ds.map_batches(_score_batch, batch_format="pyarrow",
                          batch_size=4096)


SCORE_DOCUMENTS_SQL = r"""
WITH f AS (
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n_tokens,
           length(text) AS n_chars,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               AS n_alpha,
           len(list_filter(
               list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                              x -> lower(x)),
               x -> x IN ('the','and','of','to','in','is','for','with')))
               AS stop_n
    FROM documents),
s AS (
    SELECT doc_id,
           CAST(2 * LEAST(n_tokens, 100)
                + 3 * ((n_alpha * 10000 // GREATEST(n_chars, 1)) // 100)
                + 5 * stop_n
                - 1 * (abs(n_chars * 100 // GREATEST(n_tokens, 1)
                           - 550) // 10) AS BIGINT) AS score
    FROM f)
SELECT doc_id, score, score >= 360 AS keep FROM s
"""
