"""Driver-contract registry guards — catch registration drift without
running any pipeline: every query is either SQL-oracled or on the
explicit rows-only list (each with a documented reason), and every
oracle SQL parses in DuckDB against the driver's view set."""

import importlib.util

# rows-only queries and why no ANSI-SQL oracle exists for them
ROWS_ONLY = {
    "ann_brute_topk": "float32 ranking (quantized twin is oracled)",
    "ann_ivf_topk": "approximate (recall + full-probe==brute pinned)",
    "ann_lsh_topk": "approximate (full-ball==brute pinned)",
    "ann_pq_topk": "approximate (compressed-index ADC; recall floor "
                   "pinned vs brute)",
    "corpus_decontaminate_hashed": "uint64 rolling hash (string twin oracled)",
    "corpus_decontaminate_winnow":
        "winnowing fingerprint subset (flag parity test-pinned)",
    "embedding_kmeans":
        "iterative refinement has no SQL twin (invariance test-pinned)",
    "embedding_pca":
        "eigendecomposition has no SQL twin (numpy parity + "
        "orthonormality + bit-determinism test-pinned)",
    "dedup_corpus": "composition incl. LSH candidates",
    "docs_segment_dedup_sampled":
        "subsampled fingerprint stream (exact twin oracled; zero-FP "
        "+ recall floor test-pinned)",
    "dedup_embedding_pairs": "IVF bucketing not SQL-expressible",
    "dedup_minhash_pairs": "minhash signatures not SQL-expressible",
    "dedup_simhash_pairs": "siphash bit folds not SQL-expressible",
    "events_hll_users": "approximate sketch (error bound pinned)",
    "events_user_counts_cms": "approximate sketch (overcount bound pinned)",
    "kg_citation_pagerank": "iterative float (3+1 routes cross-pinned)",
    "kg_convert_roundtrip": "format round-trip, no tabular oracle",
    "kg_distributed_merge": "NT-line output of the merge verb",
    "kg_extract_triples": "full KG pipeline (invariant + P/R pinned)",
    "kg_media_features": "md5-derived fake decode (stub declared)",
    "kg_media_frames": "md5-derived fake decode (stub declared)",
    "kg_media_thumbnails": "md5-derived fake decode (stub declared)",
    "kg_span_invariant": "pipeline invariant checker",
    "orders_price_quantiles_tdigest": "approximate (<=1% error pinned)",
    "text_winnow_fingerprints": "rolling hash not SQL-expressible",
    "customer_k_core": "iterative peeling (invariants test-pinned)",
}


def _entry():
    spec = importlib.util.spec_from_file_location(
        "e", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_every_query_oracled_or_documented_rows_only():
    m = _entry()
    q, o = set(m.queries()), set(m.oracle_sql())
    assert o <= q, f"oracle without query: {sorted(o - q)}"
    rows_only = q - o
    undocumented = rows_only - set(ROWS_ONLY)
    assert not undocumented, f"rows-only without reason: {sorted(undocumented)}"
    stale = set(ROWS_ONLY) - rows_only
    assert not stale, f"stale rows-only entries: {sorted(stale)}"


def test_every_oracle_sql_parses_in_duckdb():
    import duckdb

    m = _entry()
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for v in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                    f"'{sf}/{v}.parquet'")
    for name, sql in m.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{name}: oracle SQL invalid: {e}")


def test_cli_query_verb(tmp_path):
    """`python -m rdfx_ray query` lists every registered query and
    runs one end-to-end in a subprocess (its own Ray session)."""
    import json
    import subprocess
    import sys

    names = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "query", "--list"],
        capture_output=True, text=True, cwd="/root/repo",
        check=True).stdout.split()
    assert "events_type_share" in names and len(names) >= 120

    out = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "query", "events_type_share",
         "--cpus", "2", "--limit", "0"],
        capture_output=True, text=True, cwd="/root/repo",
        check=True).stdout
    head = json.loads([ln for ln in out.splitlines()
                       if ln.startswith("{")][0])
    assert head["rows"] == 5
    assert head["columns"] == ["event_type", "n", "total"]
