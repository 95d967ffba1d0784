"""HTML (RDFa-lite subset) parser, from scratch on stdlib html.parser.

The north-star format list includes html; in the reference stack this
arrives via rdflib's ``guess_format`` mapping ``.html`` → the rdfa
parser (parse-only — rdflib has no html serializer, and html is not in
the reference's VALID_RDF_FORMATS write matrix, persistence_systems.py
:20-21). We mirror that: parse-only, covering the RDFa-lite attribute
set (vocab, prefix, about, typeof, property, resource, content,
href/src, datatype, xml:lang/lang) with subject inheritance down the
element tree and property+resource chaining. Full RDFa 1.1 processing
(e.g. @rel/@rev, @inlist, xmlns: bindings) is out of scope and raises
nothing — unknown attributes are simply inert, like minimal RDFa
processors."""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from .terms import RDF_TYPE, Term, Triple, bnode, iri, literal

_CURIE = re.compile(r"^([A-Za-z_][\w\-]*):(\S*)$")
_VOID_ELEMENTS = {"br", "hr", "img", "input", "link", "meta", "area",
                  "base", "col", "embed", "source", "track", "wbr"}


class _Ctx:
    __slots__ = ("subject", "vocab", "prefixes", "prop_for_text", "datatype",
                 "lang", "text")

    def __init__(self, subject, vocab, prefixes):
        self.subject = subject
        self.vocab = vocab
        self.prefixes = prefixes
        self.prop_for_text: Optional[List[Term]] = None
        self.datatype: Optional[str] = None
        self.lang: Optional[str] = None
        self.text: List[str] = []


class _RdfaParser(HTMLParser):
    def __init__(self, bnode_prefix: str = "b"):
        super().__init__(convert_charrefs=True)
        self.triples: List[Triple] = []
        self._stack: List[Tuple[_Ctx, bool]] = []
        self._root = _Ctx(None, "", {})
        self._anon = 0
        self._bnode_prefix = bnode_prefix

    def _cur(self) -> _Ctx:
        return self._stack[-1][0] if self._stack else self._root

    def _new_bnode(self) -> Term:
        self._anon += 1
        return bnode(f"{self._bnode_prefix}h{self._anon}")

    def _expand(self, ref: str, ctx: _Ctx, is_term_pos: bool) -> Optional[str]:
        ref = ref.strip()
        if not ref:
            return None
        m = _CURIE.match(ref)
        if m and m.group(1) in ctx.prefixes:
            return ctx.prefixes[m.group(1)] + m.group(2)
        if m and m.group(1) in ("http", "https", "urn", "mailto", "tag"):
            return ref
        if is_term_pos and ctx.vocab and not m:
            return ctx.vocab + ref
        return ref if m else None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        parent = self._cur()
        vocab = a.get("vocab", parent.vocab).strip() if "vocab" in a else parent.vocab
        prefixes = dict(parent.prefixes)
        if "prefix" in a:
            toks = a["prefix"].split()
            for i in range(0, len(toks) - 1, 2):
                p = toks[i].rstrip(":")
                prefixes[p] = toks[i + 1]
        ctx = _Ctx(parent.subject, vocab, prefixes)
        ctx.lang = a.get("lang", a.get("xml:lang", parent.lang))

        about = a.get("about")
        resource = a.get("resource")
        typeof = a.get("typeof")
        prop = a.get("property")

        if about is not None:
            expanded = self._expand(about, ctx, False)
            ctx.subject = iri(expanded) if expanded else self._new_bnode()

        # typeof without about/resource → fresh bnode subject
        obj_node: Optional[Term] = None
        if resource is not None:
            expanded = self._expand(resource, ctx, False)
            obj_node = iri(expanded) if expanded else self._new_bnode()
        elif "href" in a or "src" in a:
            href = a.get("href", a.get("src"))
            expanded = self._expand(href, ctx, False)
            if expanded and prop:
                obj_node = iri(expanded)

        if typeof is not None and about is None and resource is None:
            ctx.subject = self._new_bnode()

        type_target = obj_node if (typeof and resource is not None) else ctx.subject
        if typeof:
            for t in typeof.split():
                tiri = self._expand(t, ctx, True)
                if tiri and type_target is not None:
                    self.triples.append((type_target, iri(RDF_TYPE), iri(tiri)))

        if prop:
            preds = [iri(x) for x in
                     (self._expand(t, ctx, True) for t in prop.split()) if x]
            if typeof is not None and about is None and resource is None:
                # RDFa chaining: property + typeof (no about/resource)
                # → the typed bnode is the OBJECT; it becomes the
                # subject for descendants
                psubj = parent.subject or self._new_bnode()
                for p in preds:
                    self.triples.append((psubj, p, ctx.subject))
                if tag not in _VOID_ELEMENTS:
                    self._stack.append((ctx, True))
                return
            # subject = this element's (about) if set, else inherited
            subj = ctx.subject
            if subj is None:
                subj = self._new_bnode()
                ctx.subject = subj
            dt = a.get("datatype")
            dtiri = self._expand(dt, ctx, True) if dt else None
            if "content" in a:
                for p in preds:
                    self.triples.append(
                        (subj, p, literal(a["content"], datatype=dtiri,
                                          lang=None if dtiri else ctx.lang)))
            elif obj_node is not None:
                for p in preds:
                    self.triples.append((subj, p, obj_node))
                if resource is not None:
                    ctx.subject = obj_node
            else:
                ctx.prop_for_text = preds
                ctx.datatype = dtiri
        elif resource is not None and obj_node is not None:
            # resource without property: sets subject for descendants
            ctx.subject = obj_node

        if tag not in _VOID_ELEMENTS:
            self._stack.append((ctx, True))
        else:
            # void element: finalize immediately (no text content)
            if ctx.prop_for_text:
                subj = ctx.subject or self._new_bnode()
                for p in ctx.prop_for_text:
                    self.triples.append((subj, p, literal("")))

    def handle_data(self, data):
        if self._stack:
            self._stack[-1][0].text.append(data)

    def handle_endtag(self, tag):
        if not self._stack:
            return
        ctx, _ = self._stack.pop()
        if ctx.prop_for_text:
            subj = ctx.subject if ctx.subject is not None else (
                self._stack[-1][0].subject if self._stack else None)
            if subj is None:
                subj = self._new_bnode()
            text = "".join(ctx.text)
            for p in ctx.prop_for_text:
                self.triples.append(
                    (subj, p, literal(text, datatype=ctx.datatype,
                                      lang=None if ctx.datatype else ctx.lang)))
        elif self._stack:
            # propagate collected text upward for enclosing property
            self._stack[-1][0].text.append("".join(ctx.text))


def parse_rdfa(text: str, bnode_prefix: str = "b") -> List[Triple]:
    p = _RdfaParser(bnode_prefix=bnode_prefix)
    p.feed(text)
    p.close()
    return p.triples
