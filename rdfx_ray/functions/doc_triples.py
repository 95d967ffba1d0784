"""Metadata-triple extraction over a flat documents table
(doc_id:int64, text, lang, source, n_chars) — the SQL-oracle-able
face of the KG machinery: same columnar triple schema, same dedup and
partition semantics, but rules simple enough that DuckDB can replay
them exactly (driver correctness gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SDO = "https://schema.org/"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
N_GRAPHS = 16


def doc_triples_batch(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    doc_id = df["doc_id"].to_numpy()
    subj = np.char.add("urn:doc:", doc_id.astype(str))
    graph = np.char.add("urn:graph:", (doc_id % N_GRAPHS).astype(str))
    n = len(df)

    parts = []
    for pred, values, dtype in (
        (SDO + "inLanguage", df["lang"].astype(str).to_numpy(), None),
        (SDO + "isBasedOn", df["source"].astype(str).to_numpy(), None),
        (SDO + "characterCount", df["n_chars"].astype(np.int64).astype(str),
         XSD_INTEGER),
    ):
        parts.append(pd.DataFrame({
            "subj": subj,
            "pred": np.repeat(pred, n),
            "obj_kind": np.repeat("literal", n),
            "obj_value": values,
            "obj_datatype": np.repeat(dtype, n),
            "graph_iri": graph,
        }))
    out = pd.concat(parts, ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False).cast(pa.schema([
        ("subj", pa.string()), ("pred", pa.string()),
        ("obj_kind", pa.string()), ("obj_value", pa.string()),
        ("obj_datatype", pa.string()), ("graph_iri", pa.string()),
    ]))


def doc_triples(sf_dir: str):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return ds.map_batches(doc_triples_batch, batch_format="pyarrow",
                          batch_size=8192)


def doc_triples_merged_dedup(sf_dir: str):
    """Union the triple stream with itself, then exact-dedup — the
    merge verb's set-union semantics (rdfx/rdfx_cli.py:91-93) in
    columnar form, oracle = SELECT DISTINCT."""
    a = doc_triples(sf_dir)
    b = doc_triples(sf_dir)
    unioned = a.union(b)

    def local_dedup(batch: pa.Table) -> pa.Table:
        import polars as pl
        return (pl.from_arrow(batch).unique(keep="first")
                  .to_arrow().cast(batch.schema))

    cols = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
            "graph_iri"]
    # DISTINCT as a vectorized aggregate: groupby(all columns).count()
    # emits one row per key — no per-group Python (map_groups over
    # mostly-singleton groups pays ~ms of overhead per group)
    from ray.data.aggregate import Count

    deduped = (
        unioned.map_batches(local_dedup, batch_format="pyarrow")
               .groupby(cols)
               .aggregate(Count(alias_name="_n"))
    )
    return deduped.map_batches(
        lambda t: t.select(cols), batch_format="pyarrow")


CITATION_CHAIN = 16


def doc_citation_triples(sf_dir: str):
    """Chain-structured IRI→IRI relation over the documents table —
    the graph shape property paths need (doc_triples' predicates are
    all doc→literal, so ``p+`` over them is depth-1). Deterministic
    and SQL-replayable: ``urn:doc:N sdo:citation urn:doc:N-1``
    whenever ``N % CITATION_CHAIN != 0`` → disjoint chains of up to
    CITATION_CHAIN docs, roots at the multiples."""
    import ray.data as rd

    schema = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()),
        ("obj_kind", pa.string()), ("obj_value", pa.string()),
        ("obj_datatype", pa.string()), ("graph_iri", pa.string()),
    ])

    def fn(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy()
        doc_id = doc_id[doc_id % CITATION_CHAIN != 0]
        n = len(doc_id)
        return pa.table({
            "subj": np.char.add("urn:doc:", doc_id.astype(str)),
            "pred": np.repeat(SDO + "citation", n),
            "obj_kind": np.repeat("iri", n),
            "obj_value": np.char.add("urn:doc:", (doc_id - 1).astype(str)),
            "obj_datatype": pa.nulls(n, pa.string()),
            "graph_iri": np.char.add("urn:graph:",
                                     (doc_id % N_GRAPHS).astype(str)),
        }).cast(schema)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


CITATION_EDGES_SQL = f"""
    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s,
           'urn:doc:' || CAST(doc_id - 1 AS VARCHAR) AS o
    FROM documents WHERE doc_id % {CITATION_CHAIN} <> 0
"""


def graph_partition_sizes(sf_dir: str):
    """Triple count per named-graph partition — the engine's
    ``asset_collection_size`` analogue (SOP SPARQL COUNT,
    rdfx/persistence_systems.py:582-590) grouped over all graphs."""
    from ray.data.aggregate import Count
    return (doc_triples(sf_dir).groupby("graph_iri")
            .aggregate(Count(alias_name="n_triples")))


def predicate_counts(sf_dir: str):
    from ray.data.aggregate import Count
    return (doc_triples(sf_dir).groupby("pred")
            .aggregate(Count(alias_name="n")))


DOC_TRIPLES_SQL = f"""
SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
       '{SDO}inLanguage' AS pred,
       'literal' AS obj_kind,
       lang AS obj_value,
       CAST(NULL AS VARCHAR) AS obj_datatype,
       'urn:graph:' || CAST(doc_id % {N_GRAPHS} AS VARCHAR) AS graph_iri
FROM documents
UNION ALL
SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR),
       '{SDO}isBasedOn', 'literal', source, CAST(NULL AS VARCHAR),
       'urn:graph:' || CAST(doc_id % {N_GRAPHS} AS VARCHAR)
FROM documents
UNION ALL
SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR),
       '{SDO}characterCount', 'literal', CAST(n_chars AS VARCHAR),
       '{XSD_INTEGER}',
       'urn:graph:' || CAST(doc_id % {N_GRAPHS} AS VARCHAR)
FROM documents
"""
