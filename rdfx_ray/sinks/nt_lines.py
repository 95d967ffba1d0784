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
import pyarrow.compute as pc


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


# rows per internal render slice: bounds the 32-bit string-offset
# budget of the final binary_join (a slice's rendered bytes must stay
# < 2 GB; ~100 B/line ⇒ 1M rows ≈ 100 MB, 20× headroom)
_NT_SLICE_ROWS = 1_000_000


def nt_bytes(batch: pa.Table) -> bytes:
    """Render a whole TRIPLES batch to newline-terminated NT bytes
    with pure Arrow C kernels — measured 1.6× the previous polars
    expression path (and immune to nested-pool oversubscription: no
    thread pool at all). Constant-ish columns (pred, obj_datatype) are
    dictionary-encoded so their decoration renders once per DISTINCT
    value and fans out via an index take. Byte parity with
    :func:`rdfx_ray.rdf.terms.nt_term` is pinned by
    tests/test_rdf_property.py and the sink tests."""
    if batch.num_rows == 0:
        return b""
    if batch.num_rows > _NT_SLICE_ROWS:
        return b"".join(
            nt_bytes(batch.slice(lo, _NT_SLICE_ROWS))
            for lo in range(0, batch.num_rows, _NT_SLICE_ROWS))

    subj = batch.column("subj").combine_chunks()
    pred = batch.column("pred").combine_chunks()
    kind = batch.column("obj_kind").combine_chunks()
    val = batch.column("obj_value").combine_chunks()
    dt = batch.column("obj_datatype").combine_chunks()
    lang = batch.column("obj_lang").combine_chunks()

    subj_t = pc.if_else(pc.starts_with(subj, "_:"), subj,
                        pc.binary_join_element_wise("<", subj, ">", ""))
    pe = pc.dictionary_encode(pred)
    pred_t = pc.take(
        pc.binary_join_element_wise("<", pe.dictionary, ">", ""),
        pe.indices)

    # escape fast path: one C-regex scan; the 5 replace passes run only
    # when some row actually needs them (typically none)
    needs = pc.match_substring_regex(val, r'[\\"\n\r\t]')
    if pc.any(needs).as_py():
        esc = val
        for raw, rep in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                         ("\r", "\\r"), ("\t", "\\t")):
            esc = pc.replace_substring(esc, raw, rep)
        lex = pc.if_else(needs, esc, val)
    else:
        lex = val
    de = pc.dictionary_encode(dt)
    suffix = pc.take(
        pc.binary_join_element_wise("^^<", de.dictionary, ">", ""),
        de.indices)                      # null where datatype is null
    suffix = pc.if_else(pc.is_valid(lang),
                        pc.binary_join_element_wise("@", lang, ""),
                        pc.fill_null(suffix, ""))
    lit_t = pc.binary_join_element_wise('"', lex, '"', suffix, "")
    obj_t = pc.if_else(
        pc.equal(kind, "iri"),
        pc.binary_join_element_wise("<", val, ">", ""),
        pc.if_else(pc.equal(kind, "bnode"),
                   pc.binary_join_element_wise("_:", val, ""),
                   lit_t))
    line = pc.binary_join_element_wise(subj_t, pred_t, obj_t, ".\n", " ")
    lst = pa.ListArray.from_arrays(
        pa.array([0, len(line)], pa.int32()), line)
    return pc.binary_join(lst, "")[0].as_py().encode("utf-8")
