"""Vectorized N-Triples rendering for columnar triple batches.

Same lexical rules as :func:`rdfx_ray.rdf.terms.nt_term`, but applied
with pandas' C string kernels over whole columns — the hot-path
serializer for partition materialization (per-row Python calls would
dominate the sink at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _escape_series(s: pd.Series) -> pd.Series:
    # fast path: escape only the rows that need it (typically ~0%) —
    # five full-column replace scans were a top sink cost
    needs = s.str.contains(r'[\\"\n\r\t]', regex=True)
    if not needs.any():
        return s
    out = s.copy()
    sub = s[needs]
    # order matters: backslash first
    out[needs] = (
        sub.str.replace("\\", "\\\\", regex=False)
           .str.replace('"', '\\"', regex=False)
           .str.replace("\n", "\\n", regex=False)
           .str.replace("\r", "\\r", regex=False)
           .str.replace("\t", "\\t", regex=False)
    )
    return out


def nt_lines(batch: pa.Table) -> pd.Series:
    """Render one NT line per row of a TRIPLES_SCHEMA batch."""
    df = batch.select(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"]
    ).to_pandas()

    subj = np.where(
        df["subj"].str.startswith("_:").to_numpy(), df["subj"], "<" + df["subj"] + ">"
    )
    pred = "<" + df["pred"] + ">"

    obj = pd.Series(np.empty(len(df), dtype=object))
    kind = df["obj_kind"]
    is_iri = (kind == "iri").to_numpy()
    is_bnode = (kind == "bnode").to_numpy()
    is_lit = ~(is_iri | is_bnode)

    if is_iri.any():
        obj[is_iri] = "<" + df.loc[is_iri, "obj_value"] + ">"
    if is_bnode.any():
        obj[is_bnode] = "_:" + df.loc[is_bnode, "obj_value"]
    if is_lit.any():
        lex = '"' + _escape_series(df.loc[is_lit, "obj_value"]) + '"'
        dt = df.loc[is_lit, "obj_datatype"]
        lang = df.loc[is_lit, "obj_lang"]
        suffix = pd.Series("", index=lex.index)
        has_lang = lang.notna()
        has_dt = dt.notna() & ~has_lang
        suffix[has_lang] = "@" + lang[has_lang]
        suffix[has_dt] = "^^<" + dt[has_dt] + ">"
        obj[is_lit] = lex + suffix

    return subj + " " + pred + " " + obj.to_numpy() + " ."


def nt_bytes(batch: pa.Table) -> bytes:
    """Render a whole TRIPLES batch to newline-joined NT bytes with
    polars expressions (~2× the pandas path; parity pinned by
    tests/test_rdf_property.py and the sink tests)."""
    import polars as pl

    df = pl.from_arrow(batch.select(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
         "obj_lang"]))
    esc = (pl.col("obj_value")
           .str.replace_all("\\", "\\\\", literal=True)
           .str.replace_all('"', '\\"', literal=True)
           .str.replace_all("\n", "\\n", literal=True)
           .str.replace_all("\r", "\\r", literal=True)
           .str.replace_all("\t", "\\t", literal=True))
    needs = pl.col("obj_value").str.contains(r'[\\"\n\r\t]')
    lex = pl.when(needs).then(esc).otherwise(pl.col("obj_value"))
    obj = (pl.when(pl.col("obj_kind") == "iri")
             .then(pl.concat_str([pl.lit("<"), pl.col("obj_value"),
                                  pl.lit(">")]))
           .when(pl.col("obj_kind") == "bnode")
             .then(pl.concat_str([pl.lit("_:"), pl.col("obj_value")]))
           .when(pl.col("obj_lang").is_not_null())
             .then(pl.concat_str([pl.lit('"'), lex, pl.lit('"@'),
                                  pl.col("obj_lang")]))
           .when(pl.col("obj_datatype").is_not_null())
             .then(pl.concat_str([pl.lit('"'), lex, pl.lit('"^^<'),
                                  pl.col("obj_datatype"), pl.lit(">")]))
           .otherwise(pl.concat_str([pl.lit('"'), lex, pl.lit('"')])))
    subj = (pl.when(pl.col("subj").str.starts_with("_:"))
              .then(pl.col("subj"))
              .otherwise(pl.concat_str([pl.lit("<"), pl.col("subj"),
                                        pl.lit(">")])))
    line = pl.concat_str([subj, pl.lit(" <"), pl.col("pred"), pl.lit("> "),
                          obj, pl.lit(" .")])
    joined = df.select(line.alias("l"))["l"].str.join("\n")[0]
    return (joined + "\n").encode("utf-8")
