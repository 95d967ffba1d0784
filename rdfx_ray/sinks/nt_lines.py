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
