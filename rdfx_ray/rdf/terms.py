"""RDF term model, written from scratch (rdflib is not available here).

Semantics mirror the reference engine's data model (rdfx v0.4.11, which
delegates to rdflib): a triple is ``(subject, predicate, object)`` with
subject ∈ {IRI, blank node}, predicate ∈ {IRI}, object ∈ {IRI, blank
node, literal}; literals carry an optional datatype IRI or language tag
(see /root/reference/rdfx/rdfx_cli.py:144-145 and the golden N-Triples
in /root/reference/tests/test_convert.py:13-20).

Terms are plain tuples so they are hashable, cheap, and serialize
through Arrow / pickle without custom types:

- ``("iri", value)``
- ``("bnode", label)``
- ``("literal", lexical, datatype_or_None, lang_or_None)``

The columnar (Ray Data) plane never builds these tuples for the hot
path; it stores the decomposed columns (subj, pred, obj_kind,
obj_value, obj_datatype, obj_lang). These helpers are the shared
meeting point between the two planes.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

IRI = "iri"
BNODE = "bnode"
LITERAL = "literal"

Term = Union[Tuple[str, str], Tuple[str, str, Optional[str], Optional[str]]]
Triple = Tuple[Term, Term, Term]

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"
XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"

# Well-known prefix bindings used when auto-binding namespaces
# (mirrors rdflib's core namespace registrations observed in the
# reference goldens: owl/sdo/xsd at tests/data/file_01.ttl:1-3).
WELL_KNOWN_PREFIXES = {
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "xsd": XSD_NS,
    "owl": OWL_NS,
    "sdo": "https://schema.org/",
}


def iri(value: str) -> Term:
    return (IRI, value)


def bnode(label: str) -> Term:
    return (BNODE, label)


def literal(
    lexical: str, datatype: Optional[str] = None, lang: Optional[str] = None
) -> Term:
    if datatype == XSD_STRING:
        # rdflib normalizes xsd:string-typed literals to plain literals
        # for comparison/serialization purposes; we store them plain.
        datatype = None
    return (LITERAL, lexical, datatype, lang)


def is_iri(t: Term) -> bool:
    return t[0] == IRI


def is_bnode(t: Term) -> bool:
    return t[0] == BNODE


def is_literal(t: Term) -> bool:
    return t[0] == LITERAL


# --- N-Triples lexical forms ------------------------------------------------

_LITERAL_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def escape_literal(s: str) -> str:
    """Escape a literal's lexical form for N-Triples / Turtle quoting."""
    if not any(c in s for c in '\\"\n\r\t'):
        return s
    out = []
    for c in s:
        out.append(_LITERAL_ESCAPES.get(c, c))
    return "".join(out)


def unescape_string(s: str) -> str:
    """Decode \\-escapes (including \\uXXXX / \\UXXXXXXXX) in NT/Turtle strings."""
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    simple = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
              '"': '"', "'": "'", "\\": "\\"}
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in simple:
                out.append(simple[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= n:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= n:
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


def nt_term(t: Term) -> str:
    """Render one term in canonical N-Triples form."""
    kind = t[0]
    if kind == IRI:
        return f"<{t[1]}>"
    if kind == BNODE:
        return f"_:{t[1]}"
    # literal
    lex = escape_literal(t[1])
    dt, lang = t[2], t[3]
    if lang:
        return f'"{lex}"@{lang}'
    if dt:
        return f'"{lex}"^^<{dt}>'
    return f'"{lex}"'


def nt_object_parts(kind: str, value: str, datatype: Optional[str],
                    lang: Optional[str]) -> str:
    """Columnar-plane variant of :func:`nt_term` for decomposed objects."""
    if kind == IRI:
        return f"<{value}>"
    if kind == BNODE:
        return f"_:{value}"
    lex = escape_literal(value)
    if lang:
        return f'"{lex}"@{lang}'
    if datatype:
        return f'"{lex}"^^<{datatype}>'
    return f'"{lex}"'


def nt_triple(t: Triple) -> str:
    return f"{nt_term(t[0])} {nt_term(t[1])} {nt_term(t[2])} ."
