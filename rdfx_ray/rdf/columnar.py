"""Bridge between term-tuple triples and the columnar Arrow plane."""

from __future__ import annotations

from typing import Iterable, List, Optional

import pyarrow as pa

from .terms import BNODE, IRI, LITERAL, Term, Triple, bnode, iri, literal

COLUMNAR_FIELDS = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
                   "obj_lang"]

COLUMNAR_SCHEMA = pa.schema([
    pa.field("subj", pa.string()),
    pa.field("pred", pa.string()),
    pa.field("obj_kind", pa.string()),
    pa.field("obj_value", pa.string()),
    pa.field("obj_datatype", pa.string()),
    pa.field("obj_lang", pa.string()),
])


def triples_to_table(triples: Iterable[Triple],
                     skolem_prefix: Optional[str] = None) -> pa.Table:
    """Decompose term-tuple triples into the columnar schema. Blank
    nodes are either kept (obj_kind='bnode' / subj '_:label') when
    ``skolem_prefix`` is None, or skolemized to
    ``urn:skolem:{skolem_prefix}:{label}`` IRIs — the stable-identity
    choice batch sinks need (SURVEY.md §0)."""
    cols = {k: [] for k in COLUMNAR_FIELDS}

    def subj_str(t: Term) -> str:
        if t[0] == IRI:
            return t[1]
        if skolem_prefix is not None:
            return f"urn:skolem:{skolem_prefix}:{t[1]}"
        return "_:" + t[1]

    for s, p, o in triples:
        cols["subj"].append(subj_str(s))
        cols["pred"].append(p[1])
        if o[0] == LITERAL:
            cols["obj_kind"].append("literal")
            cols["obj_value"].append(o[1])
            cols["obj_datatype"].append(o[2])
            cols["obj_lang"].append(o[3])
        elif o[0] == BNODE and skolem_prefix is not None:
            cols["obj_kind"].append("iri")
            cols["obj_value"].append(f"urn:skolem:{skolem_prefix}:{o[1]}")
            cols["obj_datatype"].append(None)
            cols["obj_lang"].append(None)
        else:
            cols["obj_kind"].append("bnode" if o[0] == BNODE else "iri")
            cols["obj_value"].append(o[1])
            cols["obj_datatype"].append(None)
            cols["obj_lang"].append(None)
    return pa.table(
        {k: pa.array(v, pa.string()) for k, v in cols.items()},
    ).cast(COLUMNAR_SCHEMA)


def table_to_triples(table: pa.Table) -> List[Triple]:
    out: List[Triple] = []
    subj = table.column("subj").to_pylist()
    pred = table.column("pred").to_pylist()
    ok = table.column("obj_kind").to_pylist()
    ov = table.column("obj_value").to_pylist()
    dt = table.column("obj_datatype").to_pylist()
    lg = table.column("obj_lang").to_pylist()
    for s, p, k, v, d, l in zip(subj, pred, ok, ov, dt, lg):
        st = bnode(s[2:]) if s.startswith("_:") else iri(s)
        if k == "literal":
            o: Term = literal(v, datatype=d, lang=l)
        elif k == "bnode":
            o = bnode(v)
        else:
            o = iri(v)
        out.append((st, iri(p), o))
    return out
