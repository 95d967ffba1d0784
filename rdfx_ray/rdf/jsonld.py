"""JSON-LD parser + serializer (expanded form), from scratch.

Scope: the expanded JSON-LD document form used by the reference corpus
(/root/reference/tests/data/file_03.json-ld): a list (or single
object, or ``{"@graph": [...]}``) of node objects with ``@id``,
``@type`` and predicate → list-of-value-objects entries, where a value
object is ``{"@id": ...}`` or ``{"@value": ..., "@type"|"@language":
...}``. A top-level ``@context`` of simple prefix/term mappings is
honored on parse; output is always expanded form (what rdflib's
json-ld serializer emits for context-free graphs).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterable, List, Optional

from .terms import (
    BNODE,
    IRI,
    LITERAL,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    Term,
    Triple,
    bnode,
    iri,
    literal,
)


class JsonLdParseError(ValueError):
    pass


def _expand_iri(ref: str, context: Dict[str, str]) -> str:
    if ref in context:
        return context[ref]
    prefix, sep, local = ref.partition(":")
    if sep and prefix in context:
        return context[prefix] + local
    return ref


def _node_term(ref: str, context: Dict[str, str], bnode_prefix: str) -> Term:
    if ref.startswith("_:"):
        return bnode(bnode_prefix + "_" + ref[2:])
    return iri(_expand_iri(ref, context))


def parse_jsonld(text: str, bnode_prefix: str = "b") -> List[Triple]:
    doc = json.loads(text)
    triples: List[Triple] = []
    context: Dict[str, str] = {}
    anon = [0]

    if isinstance(doc, dict):
        raw_ctx = doc.get("@context")
        if isinstance(raw_ctx, dict):
            for k, v in raw_ctx.items():
                if isinstance(v, str):
                    context[k] = v
                elif isinstance(v, dict) and isinstance(v.get("@id"), str):
                    context[k] = v["@id"]
        nodes = doc.get("@graph", [doc] if "@id" in doc or any(
            not k.startswith("@") for k in doc) else [])
    elif isinstance(doc, list):
        nodes = doc
    else:
        raise JsonLdParseError("JSON-LD document must be an object or array")

    def new_bnode() -> Term:
        anon[0] += 1
        return bnode(f"{bnode_prefix}j{anon[0]}")

    def parse_node(node: Dict[str, Any]) -> Term:
        nid = node.get("@id")
        subj = _node_term(nid, context, bnode_prefix) if nid else new_bnode()
        types = node.get("@type", [])
        if isinstance(types, str):
            types = [types]
        for t in types:
            triples.append((subj, iri(RDF_TYPE), iri(_expand_iri(t, context))))
        for key, values in node.items():
            if key.startswith("@"):
                continue
            pred = iri(_expand_iri(key, context))
            if not isinstance(values, list):
                values = [values]
            for v in values:
                triples.append((subj, pred, parse_value(v)))
        return subj

    def parse_value(v: Any) -> Term:
        if isinstance(v, dict):
            if "@value" in v:
                val = v["@value"]
                dt = v.get("@type")
                lang = v.get("@language")
                if isinstance(val, bool):
                    return literal("true" if val else "false", datatype=XSD_BOOLEAN)
                if isinstance(val, int):
                    return literal(str(val), datatype=dt or XSD_INTEGER)
                if isinstance(val, float):
                    return literal(repr(val), datatype=dt or XSD_DOUBLE)
                return literal(str(val),
                               datatype=_expand_iri(dt, context) if dt else None,
                               lang=lang)
            if "@list" in v:
                raise JsonLdParseError("@list values are not supported")
            if "@id" in v and len([k for k in v if not k.startswith("@")]) == 0 \
                    and "@type" not in v:
                return _node_term(v["@id"], context, bnode_prefix)
            # embedded node object
            return parse_node(v)
        if isinstance(v, bool):
            return literal("true" if v else "false", datatype=XSD_BOOLEAN)
        if isinstance(v, int):
            return literal(str(v), datatype=XSD_INTEGER)
        if isinstance(v, float):
            return literal(repr(v), datatype=XSD_DOUBLE)
        return literal(str(v))

    for node in nodes:
        if not isinstance(node, dict):
            raise JsonLdParseError(f"Node object expected, got {type(node)}")
        parse_node(node)
    return triples


def serialize_jsonld(triples: Iterable[Triple]) -> str:
    """Expanded-form JSON-LD, node objects sorted by @id."""
    by_subj: Dict[Term, Dict[str, List[Any]]] = {}
    types: Dict[Term, List[str]] = {}
    for s, p, o in triples:
        if p[1] == RDF_TYPE and o[0] == IRI:
            types.setdefault(s, []).append(o[1])
            by_subj.setdefault(s, {})
            continue
        slot = by_subj.setdefault(s, {}).setdefault(p[1], [])
        if o[0] == IRI:
            slot.append({"@id": o[1]})
        elif o[0] == BNODE:
            slot.append({"@id": "_:" + o[1]})
        else:
            v: Dict[str, Any] = {"@value": o[1]}
            if o[2]:
                v["@type"] = o[2]
            if o[3]:
                v["@language"] = o[3]
            slot.append(v)

    def subj_id(s: Term) -> str:
        return s[1] if s[0] == IRI else "_:" + s[1]

    out = []
    for s in sorted(by_subj, key=subj_id):
        node: Dict[str, Any] = {"@id": subj_id(s)}
        if s in types:
            node["@type"] = sorted(types[s])
        for pred in sorted(by_subj[s]):
            node[pred] = sorted(
                by_subj[s][pred],
                key=lambda v: (str(v.get("@id", "")), str(v.get("@value", ""))),
            )
        out.append(node)
    return json.dumps(out, indent=2, ensure_ascii=False) + "\n"
