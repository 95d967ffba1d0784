"""RDF/XML parser + serializer (from scratch, stdlib ElementTree).

Scope: the constructs in the reference corpus
(/root/reference/tests/data/file_02.rdf) plus the common RDF/XML
abbreviations — rdf:Description and typed node elements, rdf:about /
rdf:ID / rdf:nodeID, property elements with rdf:resource /
rdf:datatype / rdf:nodeID / xml:lang, nested node elements, and
rdf:parseType="Resource". Exotic forms (rdf:li containers,
parseType="Collection"/"Literal", property attributes) raise a clear
error rather than mis-parsing.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Dict, Iterable, List, Optional, Tuple

from .terms import (
    BNODE,
    IRI,
    LITERAL,
    RDF_NS,
    RDF_TYPE,
    Term,
    Triple,
    bnode,
    iri,
    literal,
)

_RDF = "{" + RDF_NS + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"


class RdfXmlParseError(ValueError):
    pass


class _XmlParser:
    def __init__(self, bnode_prefix: str = "b"):
        self.triples: List[Triple] = []
        self._count = 0
        self._bnode_prefix = bnode_prefix
        self._base = ""

    def _new_bnode(self) -> Term:
        self._count += 1
        return bnode(f"{self._bnode_prefix}x{self._count}")

    def parse(self, text: str) -> List[Triple]:
        root = ET.fromstring(text)
        self._base = root.get(_XML_BASE, "")
        if root.tag == _RDF + "RDF":
            nodes = list(root)
        else:
            nodes = [root]
        for node in nodes:
            self._parse_node(node)
        return self.triples

    def _subject_of(self, el: ET.Element) -> Term:
        about = el.get(_RDF + "about")
        if about is not None:
            return iri(self._resolve(about))
        rid = el.get(_RDF + "ID")
        if rid is not None:
            return iri(self._base + "#" + rid)
        nid = el.get(_RDF + "nodeID")
        if nid is not None:
            return bnode(self._bnode_prefix + "_" + nid)
        return self._new_bnode()

    def _resolve(self, ref: str) -> str:
        if self._base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", ref):
            return self._base + ref
        return ref

    @staticmethod
    def _tag_iri(el: ET.Element) -> str:
        tag = el.tag
        if not tag.startswith("{"):
            raise RdfXmlParseError(f"Unqualified element {tag!r}")
        ns, local = tag[1:].split("}", 1)
        return ns + local

    def _parse_node(self, el: ET.Element) -> Term:
        subj = self._subject_of(el)
        if el.tag != _RDF + "Description":
            self.triples.append((subj, iri(RDF_TYPE), iri(self._tag_iri(el))))
        for prop in el:
            self._parse_property(subj, prop)
        return subj

    def _parse_property(self, subj: Term, prop: ET.Element):
        pred = iri(self._tag_iri(prop))
        resource = prop.get(_RDF + "resource")
        if resource is not None:
            self.triples.append((subj, pred, iri(self._resolve(resource))))
            return
        nid = prop.get(_RDF + "nodeID")
        if nid is not None:
            self.triples.append((subj, pred, bnode(self._bnode_prefix + "_" + nid)))
            return
        ptype = prop.get(_RDF + "parseType")
        if ptype == "Resource":
            node = self._new_bnode()
            self.triples.append((subj, pred, node))
            for sub in prop:
                self._parse_property(node, sub)
            return
        if ptype is not None:
            raise RdfXmlParseError(f"Unsupported rdf:parseType={ptype!r}")
        children = list(prop)
        if children:
            if len(children) != 1:
                raise RdfXmlParseError(
                    f"Property element {prop.tag} with {len(children)} child nodes"
                )
            obj = self._parse_node(children[0])
            self.triples.append((subj, pred, obj))
            return
        dt = prop.get(_RDF + "datatype")
        lang = prop.get(_XML_LANG)
        text = prop.text or ""
        self.triples.append((subj, pred, literal(text, datatype=dt, lang=lang)))


def parse_rdfxml(text: str, bnode_prefix: str = "b") -> List[Triple]:
    return _XmlParser(bnode_prefix=bnode_prefix).parse(text)


# --------------------------------------------------------------------------
# Serializer
# --------------------------------------------------------------------------


def _split_iri(u: str) -> Tuple[str, str]:
    """Split an IRI into (namespace, XML-NCName local part)."""
    m = re.search(r"[A-Za-z_][A-Za-z0-9_.\-]*$", u)
    if not m or m.start() == 0:
        raise ValueError(f"Cannot form an XML QName from predicate IRI {u!r}")
    return u[: m.start()], m.group()


def _xml_escape(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # \r must be a char-ref or the parser's line-ending normalization
    # rewrites it to \n (XML 1.0 §2.11); in attributes \n and \t are
    # likewise normalized to spaces
    s = s.replace("\r", "&#xD;")
    if attr:
        s = s.replace('"', "&quot;").replace("\n", "&#xA;").replace("\t", "&#x9;")
    return s


def serialize_rdfxml(
    triples: Iterable[Triple], prefixes: Optional[Dict[str, str]] = None
) -> str:
    """Plain (non-typed-node) RDF/XML: one rdf:Description per subject,
    matching the shape rdflib's xml serializer writes (see
    /root/reference/tests/data/file_02.rdf)."""
    tlist = list(triples)
    by_subj: Dict[Term, List[Tuple[Term, Term]]] = {}
    for s, p, o in tlist:
        by_subj.setdefault(s, []).append((p, o))

    # namespace table from predicate IRIs (+ declared prefixes)
    ns_to_prefix: Dict[str, str] = {RDF_NS: "rdf"}
    declared = {v: k for k, v in (prefixes or {}).items() if k and k != "rdf"}
    auto = 0
    pred_parts: Dict[str, Tuple[str, str]] = {}
    for s, p, o in tlist:
        ns, local = _split_iri(p[1])
        pred_parts[p[1]] = (ns, local)
        if ns not in ns_to_prefix:
            if ns in declared and declared[ns] not in ns_to_prefix.values():
                ns_to_prefix[ns] = declared[ns]
            else:
                auto += 1
                ns_to_prefix[ns] = f"ns{auto}"

    lines = ['<?xml version="1.0" encoding="utf-8"?>', "<rdf:RDF"]
    for ns, pref in sorted(ns_to_prefix.items(), key=lambda kv: kv[1]):
        lines.append(f'   xmlns:{pref}="{_xml_escape(ns, attr=True)}"')
    lines.append(">")

    def term_sort(t: Term):
        return (t[0] != IRI, t[1])

    for s in sorted(by_subj, key=term_sort):
        if s[0] == IRI:
            lines.append(f'  <rdf:Description rdf:about="{_xml_escape(s[1], attr=True)}">')
        else:
            lines.append(f'  <rdf:Description rdf:nodeID="{_xml_escape(s[1], attr=True)}">')
        for p, o in sorted(by_subj[s], key=lambda po: (po[0][1] != RDF_TYPE, po[0][1],
                                                       po[1][1])):
            ns, local = pred_parts[p[1]]
            tag = f"{ns_to_prefix[ns]}:{local}"
            if o[0] == IRI:
                lines.append(f'    <{tag} rdf:resource="{_xml_escape(o[1], attr=True)}"/>')
            elif o[0] == BNODE:
                lines.append(f'    <{tag} rdf:nodeID="{_xml_escape(o[1], attr=True)}"/>')
            else:
                attrs = ""
                if o[2]:
                    attrs = f' rdf:datatype="{_xml_escape(o[2], attr=True)}"'
                elif o[3]:
                    attrs = f' xml:lang="{o[3]}"'
                lines.append(f"    <{tag}{attrs}>{_xml_escape(o[1])}</{tag}>")
        lines.append("  </rdf:Description>")
    lines.append("</rdf:RDF>")
    return "\n".join(lines) + "\n"
