"""Text-analysis operators over a documents table (doc_id, text, ...).

All operators are ``map_batches`` transforms over pruned column reads;
per-batch kernels are vectorized (pandas/pyarrow string kernels) or
cheap C calls per row (md5). Oracle-equivalent DuckDB SQL for each is
registered in ``__ray_entry__.oracle_sql`` — definitions are chosen so
Python and DuckDB compute byte-identical results (verified parity:
regexp_split tokenization, md5 hex, [a-zA-Z] alpha classes).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_documents(sf_dir: str, columns):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


_WS = re.compile(r"\s+")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc token/char/alpha counts (whitespace tokenization)."""
    df = batch.to_pandas()
    text = df["text"].fillna("")
    # vectorized: a token is a maximal \S+ run — one C regex count per
    # row, identical to counting non-empty regexp_split(\s+) pieces
    n_tokens = text.str.count(r"\S+")
    n_chars = text.str.len()
    n_alpha = text.str.count(r"[a-zA-Z]")
    return pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_alpha": pa.array(n_alpha, pa.int64()),
    })


def token_stats(sf_dir: str):
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow", batch_size=8192)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (content-defined identity for exact dedup across formatting
    differences)."""
    df = batch.to_pandas()
    norm = (df["text"].fillna("").str.lower()
            .str.replace(_WS, " ", regex=True).str.strip())
    from .md5keys import md5_hex_text
    return pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "fingerprint": md5_hex_text(pa.array(norm, pa.string())),
    })


def fingerprints(sf_dir: str):
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) — stateful actor stage
# ---------------------------------------------------------------------------

_LANG_PROFILES: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "es", "en", "un", "una"},
    "zh": set(),  # han-script detection below
}


class LangId:
    """Actor-pool language identifier: profiles compiled once per
    actor; the batch path is fully vectorized — one pandas
    ``str.count`` per language profile (stopwords as a
    boundary-guarded alternation over the lowercased column) builds a
    score matrix, argmax picks the language. ``_guess`` keeps the
    per-string reference semantics (first-max tie-break, 'und' on zero
    score, han-script → 'zh'); the vectorized path reproduces it
    exactly (argmax returns the first maximum, same profile order)."""

    _WORD_CLASS = "a-zA-Zäöüéèàç"

    def __init__(self):
        self.word = re.compile(rf"[{self._WORD_CLASS}]+")
        self.han = re.compile(r"[一-鿿]")
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items() if v}
        self.langs = list(self.profiles)
        # one compiled counting regex per language: a stopword matches
        # only as a MAXIMAL word (boundary lookarounds on the same word
        # class the tokenizer uses), so counts equal token membership
        self.lang_res = {
            lang: re.compile(
                rf"(?<![{self._WORD_CLASS}])(?:{'|'.join(sorted(stops))})"
                rf"(?![{self._WORD_CLASS}])")
            for lang, stops in self.profiles.items()
        }

    def _guess(self, text: str) -> str:
        if self.han.search(text):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "und"
        best, best_score = "und", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        text = df["text"].fillna("")
        low = text.str.lower()
        scores = np.stack(
            [low.str.count(self.lang_res[lang]).to_numpy()
             for lang in self.langs], axis=1)
        best = np.argmax(scores, axis=1)       # first max = loop order
        maxs = scores.max(axis=1)
        pred = np.where(maxs > 0, np.asarray(self.langs, dtype=object)[best],
                        "und")
        has_han = text.str.contains(self.han).to_numpy()
        pred = np.where(has_han, "zh", pred)
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "lang_pred": pa.array(pred, pa.string()),
        })


_LANG_ID: Optional[LangId] = None


def _lang_id_kernel(batch: pa.Table) -> pa.Table:
    """Stateless-task route: the compiled profile regexes live in a
    process-level cache (Ray reuses worker processes), so tasks
    amortize the build exactly like an actor pool — without pinning a
    fixed pool size (the old ``concurrency=2`` default starved 32-cpu
    sessions; round-3 VERDICT minor #7)."""
    global _LANG_ID
    if _LANG_ID is None:
        _LANG_ID = LangId()
    return _LANG_ID(batch)


def lang_id(sf_dir: str, concurrency: Optional[int] = None):
    """Language-ID over the documents table — stateless tasks by
    default (library-wide rule: per-process state cache, no CPU
    reservation); pass ``concurrency=`` to opt into an actor pool."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    if concurrency is None:
        return ds.map_batches(_lang_id_kernel, batch_format="pyarrow",
                              batch_size=4096)
    return ds.map_batches(LangId, batch_format="pyarrow",
                          batch_size=4096, concurrency=concurrency)


def _lang_id_sql() -> str:
    """DuckDB replay of LangId. RE2 has no lookarounds, so the
    boundary-guarded count is re-expressed as token membership —
    equivalent because a boundary-guarded stopword match must start
    and end exactly at token boundaries of the SAME word class the
    tokenizer splits on. The CASE cascade encodes the first-max
    tiebreak in profile order (en, de, fr, es), 'und' on zero score,
    han-script → 'zh' — byte-for-byte the kernel's semantics."""
    wc = LangId._WORD_CLASS
    score = {
        lang: ("len(list_filter(toks, w -> w IN ("
               + ", ".join(f"'{w}'" for w in sorted(stops)) + ")))")
        for lang, stops in _LANG_PROFILES.items() if stops
    }
    return f"""
WITH t AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^{wc}]+'),
                       w -> w <> '') AS toks,
           regexp_matches(text, '[一-鿿]') AS has_han
    FROM documents),
s AS (
    SELECT doc_id, has_han,
           {score['en']} AS s_en, {score['de']} AS s_de,
           {score['fr']} AS s_fr, {score['es']} AS s_es
    FROM t)
SELECT doc_id,
       CASE WHEN has_han THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM s
"""


LANG_ID_SQL = _lang_id_sql()


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals per doc: counts plus ratio-based score in
    [0, 100] (integer so results hash-compare exactly)."""
    stats = token_stats_batch(batch).to_pandas()
    n_chars = stats["n_chars"].to_numpy()
    n_tokens = stats["n_tokens"].to_numpy()
    n_alpha = stats["n_alpha"].to_numpy()
    alpha_ratio = np.divide(n_alpha, np.maximum(n_chars, 1))
    mean_tok = np.divide(n_chars, np.maximum(n_tokens, 1))
    # floor(x + 0.5) rounding: identical semantics in numpy and SQL
    # (np.rint / SQL ROUND disagree on exact halves)
    score = (
        np.clip(n_tokens, 0, 50) +                          # length credit
        np.floor(alpha_ratio * 40 + 0.5).astype(np.int64) +  # alpha density
        np.where((mean_tok >= 3) & (mean_tok <= 10), 10, 0)  # plausible words
    ).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(stats["doc_id"], pa.int64()),
        "n_tokens": pa.array(stats["n_tokens"], pa.int64()),
        "quality_score": pa.array(np.clip(score, 0, 100), pa.int64()),
    })


def quality_scores(sf_dir: str):
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling hash) — MOSS-style content fingerprints
# ---------------------------------------------------------------------------

_WIN_BASE = np.uint64(1_000_003)


def _kgram_rolling_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hashes of all k-byte grams, vectorized: k
    shifted vector ops over the byte array (the MinHashBands stride
    trick), no per-gram Python."""
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * _WIN_BASE + data[j:n - k + 1 + j]
    return acc


def winnow_doc(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer/Wilkerson/Aiken): take the minimum k-gram
    hash in every sliding window of ``window`` hashes; the selected
    set is position-independent for shared substrings of length ≥
    k + window - 1 — the guarantee the shared-substring test pins."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    h = _kgram_rolling_hashes(b, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view
    mins = sliding_window_view(h, window).min(axis=1)
    return np.unique(mins)


def winnow_fingerprints(sf_dir: str, k: int = 8, window: int = 16):
    """(doc_id, fingerprint) rows — one row per selected winnowing
    hash. Two docs sharing any substring of length ≥ k + window - 1
    share at least one fingerprint, so a groupby(fingerprint) over
    this output is a containment-style candidate generator (the same
    hot-bucket pipeline as MinHash-LSH applies downstream)."""
    import ray.data as rd

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def batch_fps(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_fp = [], []
        for d, t in zip(doc_ids, texts):
            fps = winnow_doc(t or "", k, window)
            out_doc.extend([int(d)] * len(fps))
            out_fp.extend(fps.view(np.int64).tolist())
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "fingerprint": pa.array(out_fp, pa.int64()),
        })

    return ds.map_batches(batch_fps, batch_format="pyarrow",
                          batch_size=4096)


# ---------------------------------------------------------------------------
# BPE-ish token counting (pre-tokenizer regex)
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape restricted to constructs Python re
# and DuckDB's RE2 count identically (no lookarounds, ASCII classes):
# optional-space-prefixed letter runs / digit runs / punctuation runs,
# plus whitespace runs.
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_stats(sf_dir: str):
    """Per-doc BPE-ish pre-token counts (the unit an LLM tokenizer's
    pre-split produces — the budget number a training-data pipeline
    reports) alongside whitespace tokens, one vectorized regex count
    each."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        text = df["text"].fillna("")
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "n_ws_tokens": pa.array(text.str.count(r"\S+"), pa.int64()),
            "n_bpe_tokens": pa.array(text.str.count(BPE_RE), pa.int64()),
        })

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          batch_size=8192)


BPE_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text,
           ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS n_bpe_tokens
FROM documents
"""


def ngram_counts(sf_dir: str, min_count: int = 5):
    """Corpus-level word-bigram frequencies (≥ ``min_count``) —
    the n-gram profile a contamination / memorization check runs over
    a training corpus → (bigram, n).

    Tokens are ASCII ``[A-Za-z]+`` runs lowercased AFTER extraction
    (pure-ASCII tokens, so Python and DuckDB lowercasing agree
    byte-for-byte on any input). Per batch the bigram build is fully
    vectorized polars (extract_all → explode → shift-within-doc) and
    folds to a local count table, so the shuffle carries
    O(distinct × blocks) rows — corpus-sized bigram bags never move.
    The HAVING filter runs after the global sum (a bigram can cross
    the threshold only globally)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(
            pl.col("text").fill_null("")
              .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
        d = (d.explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase()))
        d = d.with_columns(
            pl.col("w").shift(-1).over("doc_id").alias("w2"))
        bg = (d.drop_nulls("w2")
              .select((pl.col("w") + pl.lit(" ") + pl.col("w2"))
                      .alias("bigram")))
        counts = bg.group_by("bigram").len(name="n")
        return counts.to_arrow().cast(pa.schema([
            ("bigram", pa.string()), ("n", pa.int64())]))

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    summed = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=8192)
              .groupby("bigram").aggregate(Sum("n", alias_name="n")))
    def threshold(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b.column("n"), min_count))

    return summed.map_batches(threshold, batch_format="pyarrow")


def doc_frequency(sf_dir: str, min_df: int = 5):
    """Corpus vocabulary with term + document frequencies — the
    corpus-side statistics TF-IDF weighting and vocab construction
    need → (term, tf, df).

    Tokens are ASCII ``[A-Za-z]+`` runs lowercased after extraction
    (the tokenization the whole text family shares, proven
    byte-identical between Python and DuckDB). Per batch the fold is
    one vectorized polars ``group_by(term).agg(len, n_unique(doc))``;
    the per-batch ``n_unique`` partial is globally EXACT because a
    document's text is one input row, so all of a doc's tokens live in
    one batch — partial df values sum to the true distinct-doc count
    (the same one-doc-one-row argument the decontamination pass uses,
    ``packing.decontaminate``). The shuffle therefore carries
    O(distinct-terms × blocks) count rows, never token bags, and the
    ``min_df`` threshold runs after the global sum (a term can cross
    it only globally)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(
            pl.col("text").fill_null("")
              .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
        d = (d.explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase()))
        counts = d.group_by("w").agg(
            tf=pl.len(), df=pl.col("doc_id").n_unique())
        return counts.rename({"w": "term"}).to_arrow().cast(pa.schema([
            ("term", pa.string()), ("tf", pa.int64()),
            ("df", pa.int64())]))

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    summed = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=8192)
              .groupby("term").aggregate(Sum("tf", alias_name="tf"),
                                         Sum("df", alias_name="df")))

    def threshold(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b.column("df"), min_df))

    return summed.map_batches(threshold, batch_format="pyarrow")


DOC_FREQUENCY_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                                 x -> lower(x))) AS term
    FROM documents)
SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM toks GROUP BY term
HAVING COUNT(DISTINCT doc_id) >= 5
"""


def repetition_stats(sf_dir: str):
    """Gopher/C4-style repetition signals per document — the filters
    a training-data pipeline uses to drop degenerate text →
    (doc_id, n_tokens, n_distinct, distinct_bp, top_word_bp):
    distinct-token ratio and most-frequent-token share, both in
    integer basis points so DuckDB replays them exactly. Docs with
    zero alphabetic tokens produce no row (same on both engines:
    unnest of an empty list yields nothing).

    One vectorized polars pass per batch: extract_all → explode →
    per-(doc, token) counts → per-doc fold. All of a doc's tokens
    live in one batch (one doc = one input row), so the per-batch
    fold is globally exact — pure streaming, no shuffle at all."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl
        d = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = d.with_columns(
            pl.col("text").fill_null("")
              .str.extract_all(r"[A-Za-z]+").alias("w")).drop("text")
        d = (d.explode("w").drop_nulls("w")
             .with_columns(pl.col("w").str.to_lowercase()))
        per = d.group_by(["doc_id", "w"]).len(name="n")
        agg = per.group_by("doc_id").agg(
            n_tokens=pl.col("n").sum(),
            n_distinct=pl.len(),
            top_word_n=pl.col("n").max())
        agg = agg.with_columns(
            (pl.col("n_distinct") * 10000 // pl.col("n_tokens"))
            .alias("distinct_bp"),
            (pl.col("top_word_n") * 10000 // pl.col("n_tokens"))
            .alias("top_word_bp"))
        return agg.select(["doc_id", "n_tokens", "n_distinct",
                           "distinct_bp", "top_word_bp"]) \
            .to_arrow().cast(pa.schema([
                ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                ("n_distinct", pa.int64()), ("distinct_bp", pa.int64()),
                ("top_word_bp", pa.int64())]))

    return _read_documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=8192)


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_LONGNUM_RE = r"[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"


def redact_pii(sf_dir: str):
    """PII scrubbing — the redaction pass a training corpus runs
    before release: emails → ``<EMAIL>``, 7+-digit number runs
    (phone/account shapes) → ``<NUM>`` → (doc_id, clean_hash,
    n_redactions) with ``clean_hash = md5(redacted text)`` so the
    oracle verifies the EXACT output text without shipping it.

    Both patterns stay inside RE2's common subset (no lookarounds, no
    bounded repetition shorthand differences — the counted-char runs
    are spelled out) and both engines run RE2
    (``pc.replace_substring_regex`` / DuckDB ``regexp_replace(…,
    'g')``), so redaction output is byte-identical by construction.
    Pure streaming map; the only per-row C call is the md5 the
    fingerprint oracle already pins."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # null text = empty doc (every sibling kernel's fill_null
        # discipline; the SQL mirrors with COALESCE)
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        half = pc.replace_substring_regex(text, PII_EMAIL_RE,
                                          "<EMAIL>")
        clean = pc.replace_substring_regex(half, PII_LONGNUM_RE,
                                           "<NUM>")
        # count substitutions actually performed: the number-run count
        # runs on the email-redacted text, else an address like
        # 1234567@x.org double-counts
        n_red = pc.add(
            pc.count_substring_regex(text, PII_EMAIL_RE),
            pc.count_substring_regex(half, PII_LONGNUM_RE))
        from .md5keys import md5_hex_text
        return pa.table({
            "doc_id": pa.array(batch.column("doc_id"), pa.int64()),
            "clean_hash": md5_hex_text(clean),
            "n_redactions": pa.array(
                n_red.to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
        })

    return _read_documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=8192)


REDACT_PII_SQL = r"""
WITH h AS (
    SELECT doc_id,
           COALESCE(text, '') AS text,
           regexp_replace(COALESCE(text, ''),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+',
               '<EMAIL>', 'g') AS half
    FROM documents)
SELECT doc_id,
       md5(regexp_replace(half,
           '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g'))
           AS clean_hash,
       CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+'))
            + len(regexp_extract_all(half,
                '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+'))
            AS BIGINT) AS n_redactions
FROM h
"""


REPETITION_STATS_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                                 x -> lower(x))) AS w
    FROM documents),
per AS (
    SELECT doc_id, w, COUNT(*) AS n FROM toks GROUP BY doc_id, w),
agg AS (
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct, MAX(n) AS top_word_n
    FROM per GROUP BY doc_id)
SELECT doc_id, n_tokens, n_distinct,
       CAST(n_distinct * 10000 // n_tokens AS BIGINT) AS distinct_bp,
       CAST(top_word_n * 10000 // n_tokens AS BIGINT) AS top_word_bp
FROM agg
"""


NGRAM_COUNTS_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                          x -> lower(x)) AS w
    FROM documents),
bg AS (
    SELECT unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1])) AS bigram
    FROM toks)
SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
HAVING COUNT(*) >= 5
"""
