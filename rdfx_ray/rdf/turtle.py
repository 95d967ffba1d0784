"""Turtle (and N3-subset) parser + serializer, from scratch.

Parser: a recursive-descent implementation of the Turtle grammar
covering the constructs the reference corpus and typical LOD data use:
@prefix/@base (+ SPARQL-style PREFIX/BASE), prefixed names, 'a',
predicate lists (';'), object lists (','), anonymous/labelled blank
nodes, RDF collections, all four string quote forms, numeric/boolean
shorthand literals, ^^datatypes and @lang tags, comments.

Serializer: byte-compatible with the reference goldens
(/root/reference/tests/test_persistence_systems_generic_methods.py:20-31,
 tests/test_convert.py:43-61): sorted @prefix header for *used*
namespaces, blank line, subject blocks with 'a' first then predicates
sorted by IRI, objects sorted, 4-space predicate indent / 8-space
object-continuation indent, statements terminated " .", one blank
line between blocks.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

from .terms import (
    BNODE,
    IRI,
    LITERAL,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Term,
    Triple,
    bnode,
    escape_literal,
    iri,
    literal,
    unescape_string,
)

# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<string_long_dq>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
    | (?P<string_long_sq>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<string_dq>"(?:[^"\\\n]|\\.)*")
    | (?P<string_sq>'(?:[^'\\\n]|\\.)*')
    | (?P<prefix_decl>@prefix\b|PREFIX\b)
    | (?P<base_decl>@base\b|BASE\b)
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<blank>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*)
    | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<dtype>\^\^)
    | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_\-.]*)?:(?:[A-Za-z0-9_:%\-.]|\\.)*)
    | (?P<kw_a>a(?=[\s<\[]))
    | (?P<boolean>(?:true|false)\b)
    | (?P<punct>[.;,\[\]()])
    """,
    re.X,
)

_PN_LOCAL_ESC = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")


class TurtleParseError(ValueError):
    pass


class _Tokens:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.n = len(text)
        self._peeked: Optional[Tuple[str, str]] = None

    def _scan(self) -> Tuple[str, str]:
        while self.pos < self.n:
            m = _TOKEN.match(self.text, self.pos)
            if not m:
                snippet = self.text[self.pos : self.pos + 40]
                raise TurtleParseError(f"Unrecognized turtle syntax at: {snippet!r}")
            self.pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            return kind, m.group()
        return ("eof", "")

    def peek(self) -> Tuple[str, str]:
        if self._peeked is None:
            self._peeked = self._scan()
        return self._peeked

    def next(self) -> Tuple[str, str]:
        tok = self.peek()
        self._peeked = None
        return tok

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise TurtleParseError(f"Expected {kind}, got {k} {v!r}")
        return v


class TurtleParser:
    """One parser instance per document; blank-node labels are scoped to
    the document (callers that need cross-document distinctness prefix
    them, mirroring rdflib's fresh-bnode-per-parse behavior relied on by
    the reference merge at /root/reference/rdfx/rdfx_cli.py:91-93)."""

    def __init__(self, bnode_prefix: str = "b"):
        self.prefixes: Dict[str, str] = {}
        self.base: str = ""
        self.triples: List[Triple] = []
        self._bnode_prefix = bnode_prefix
        self._anon_count = 0

    # -- entry ---------------------------------------------------------------
    def parse(self, text: str) -> List[Triple]:
        toks = _Tokens(text)
        while True:
            kind, val = toks.peek()
            if kind == "eof":
                break
            if kind == "prefix_decl":
                toks.next()
                pname = toks.expect("pname")
                if not pname.endswith(":"):
                    raise TurtleParseError(f"Bad prefix declaration: {pname!r}")
                iriref = toks.expect("iriref")
                self.prefixes[pname[:-1]] = self._resolve(iriref[1:-1])
                if val == "@prefix":
                    self._expect_dot(toks)
                continue
            if kind == "base_decl":
                toks.next()
                iriref = toks.expect("iriref")
                self.base = self._resolve(iriref[1:-1])
                if val == "@base":
                    self._expect_dot(toks)
                continue
            self._parse_statement(toks)
        return self.triples

    def _expect_dot(self, toks: _Tokens):
        k, v = toks.next()
        if not (k == "punct" and v == "."):
            raise TurtleParseError(f"Expected '.', got {v!r}")

    # -- grammar -------------------------------------------------------------
    def _parse_statement(self, toks: _Tokens):
        kind, val = toks.peek()
        if kind == "punct" and val == "[":
            subj = self._parse_bnode_property_list(toks)
            k, v = toks.peek()
            if k == "punct" and v == ".":
                toks.next()
                return
            self._parse_predicate_object_list(toks, subj)
        else:
            subj = self._parse_term(toks, position="subject")
            self._parse_predicate_object_list(toks, subj)
        self._expect_dot(toks)

    def _parse_predicate_object_list(self, toks: _Tokens, subj: Term):
        while True:
            kind, val = toks.peek()
            if kind == "kw_a":
                toks.next()
                pred = iri(RDF_TYPE)
            else:
                pred = self._parse_term(toks, position="predicate")
            self._parse_object_list(toks, subj, pred)
            kind, val = toks.peek()
            if kind == "punct" and val == ";":
                toks.next()
                # allow trailing ';' before '.' or ']'
                k2, v2 = toks.peek()
                if k2 == "punct" and v2 in ".]":
                    return
                if k2 == "eof":
                    return
                continue
            return

    def _parse_object_list(self, toks: _Tokens, subj: Term, pred: Term):
        while True:
            obj = self._parse_term(toks, position="object")
            self.triples.append((subj, pred, obj))
            kind, val = toks.peek()
            if kind == "punct" and val == ",":
                toks.next()
                continue
            return

    def _new_bnode(self) -> Term:
        self._anon_count += 1
        return bnode(f"{self._bnode_prefix}{self._anon_count}")

    def _parse_bnode_property_list(self, toks: _Tokens) -> Term:
        toks.expect("punct")  # '['  (peeked by caller)
        node = self._new_bnode()
        kind, val = toks.peek()
        if not (kind == "punct" and val == "]"):
            self._parse_predicate_object_list(toks, node)
        k, v = toks.next()
        if not (k == "punct" and v == "]"):
            raise TurtleParseError(f"Expected ']', got {v!r}")
        return node

    def _parse_collection(self, toks: _Tokens) -> Term:
        toks.next()  # '('
        items: List[Term] = []
        while True:
            kind, val = toks.peek()
            if kind == "punct" and val == ")":
                toks.next()
                break
            items.append(self._parse_term(toks, position="object"))
        if not items:
            return iri(RDF_NIL)
        head = self._new_bnode()
        node = head
        for idx, item in enumerate(items):
            self.triples.append((node, iri(RDF_FIRST), item))
            if idx == len(items) - 1:
                self.triples.append((node, iri(RDF_REST), iri(RDF_NIL)))
            else:
                nxt = self._new_bnode()
                self.triples.append((node, iri(RDF_REST), nxt))
                node = nxt
        return head

    def _resolve(self, ref: str) -> str:
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", ref):
            # minimal relative-IRI resolution (absolute-enough for corpus)
            if ref.startswith("#") or not ref:
                return self.base + ref
            return re.sub(r"[^/]*$", "", self.base) + ref
        return ref

    def _pname_to_iri(self, pname: str) -> str:
        prefix, _, local = pname.partition(":")
        if prefix not in self.prefixes:
            raise TurtleParseError(f"Undefined prefix {prefix!r} in {pname!r}")
        local = _PN_LOCAL_ESC.sub(r"\1", local)
        return self.prefixes[prefix] + local

    def _parse_term(self, toks: _Tokens, position: str) -> Term:
        kind, val = toks.next()
        if kind == "iriref":
            return iri(self._resolve(unescape_string(val[1:-1])))
        if kind == "pname":
            return iri(self._pname_to_iri(val))
        if kind == "kw_a" and position == "predicate":
            return iri(RDF_TYPE)
        if position == "predicate":
            raise TurtleParseError(f"Invalid predicate token {val!r}")
        if kind == "blank":
            return bnode(self._bnode_prefix + "_" + val[2:])
        if kind == "punct" and val == "[":
            # push back the '[' for the property-list parser
            toks._peeked = (kind, val)
            return self._parse_bnode_property_list(toks)
        if kind == "punct" and val == "(":
            toks._peeked = (kind, val)
            return self._parse_collection(toks)
        if kind in ("string_dq", "string_sq", "string_long_dq", "string_long_sq"):
            if kind.startswith("string_long"):
                lex = unescape_string(val[3:-3])
            else:
                lex = unescape_string(val[1:-1])
            nk, nv = toks.peek()
            if nk == "langtag":
                toks.next()
                return literal(lex, lang=nv[1:])
            if nk == "dtype":
                toks.next()
                dk, dv = toks.next()
                if dk == "iriref":
                    return literal(lex, datatype=self._resolve(dv[1:-1]))
                if dk == "pname":
                    return literal(lex, datatype=self._pname_to_iri(dv))
                raise TurtleParseError(f"Bad datatype token {dv!r}")
            return literal(lex)
        if kind == "integer":
            return literal(val, datatype=XSD_INTEGER)
        if kind == "decimal":
            return literal(val, datatype=XSD_DECIMAL)
        if kind == "double":
            return literal(val, datatype=XSD_DOUBLE)
        if kind == "boolean":
            return literal(val, datatype=XSD_BOOLEAN)
        raise TurtleParseError(f"Unexpected token {val!r} in {position} position")


def parse_turtle(
    text: str, bnode_prefix: str = "b"
) -> Tuple[List[Triple], Dict[str, str]]:
    p = TurtleParser(bnode_prefix=bnode_prefix)
    triples = p.parse(text)
    return triples, p.prefixes


# --------------------------------------------------------------------------
# Serializer
# --------------------------------------------------------------------------


def _used_prefixes(
    triples: Iterable[Triple], prefixes: Dict[str, str]
) -> Dict[str, str]:
    """Keep bindings whose namespace is a prefix of some term IRI
    (incl. literal datatypes) — rdflib emits only bound+used prefixes,
    and the reference's clean verb filters by substring membership
    (/root/reference/rdfx/rdfx_cli.py:127-136)."""
    iris = set()
    for s, p, o in triples:
        if s[0] == IRI:
            iris.add(s[1])
        if p[0] == IRI:
            iris.add(p[1])
        if o[0] == IRI:
            iris.add(o[1])
        elif o[0] == LITERAL and o[2]:
            iris.add(o[2])
    used = {}
    for pref, ns in prefixes.items():
        for u in iris:
            if u.startswith(ns) and len(u) > len(ns):
                used[pref] = ns
                break
    return used


def _qname(u: str, ns_sorted: List[Tuple[str, str]], used: set) -> Optional[str]:
    """Render an IRI as prefix:local when a binding covers it and the
    local part is a valid PN_LOCAL (no '/', '#', ':' inside). Records
    emitted prefixes in `used` so the header lists exactly the
    bindings the body uses (rdflib emits only bound+used prefixes —
    e.g. `rdf:` is absent from the goldens because rdf:type renders
    as 'a')."""
    for pref, ns in ns_sorted:
        if u.startswith(ns) and len(u) > len(ns):
            local = u[len(ns) :]
            if re.fullmatch(r"[A-Za-z0-9_][A-Za-z0-9_.\-]*", local) and not local.endswith("."):
                used.add(pref)
                return f"{pref}:{local}"
    return None


def _ttl_term(t: Term, ns_sorted: List[Tuple[str, str]], used: set) -> str:
    kind = t[0]
    if kind == IRI:
        q = _qname(t[1], ns_sorted, used)
        return q if q else f"<{t[1]}>"
    if kind == BNODE:
        return f"_:{t[1]}"
    lex = escape_literal(t[1])
    dt, lang = t[2], t[3]
    if lang:
        return f'"{lex}"@{lang}'
    if dt:
        q = _qname(dt, ns_sorted, used)
        dts = q if q else f"<{dt}>"
        return f'"{lex}"^^{dts}'
    return f'"{lex}"'


def _term_sort_key(t: Term) -> Tuple:
    # IRIs sort by value; bnodes and literals after, by their lexical parts
    if t[0] == IRI:
        return (0, t[1])
    if t[0] == BNODE:
        return (1, t[1])
    return (2, t[1], t[2] or "", t[3] or "")


def _cyclic_marked_bnodes(by_subj) -> set:
    """Bnodes on (or entering) a bnode→bnode object cycle, found with
    an ITERATIVE white/gray/black DFS (no recursion: list chains can
    be arbitrarily long). Marks both endpoints of every back edge —
    enough to guarantee inline rendering terminates: any cycle walk
    must pass a marked node, which renders as a label instead of
    recursing."""
    WHITE, GRAY, BLACK = 0, 1, 2
    color: Dict[Term, int] = {}
    marked: set = set()

    def children(n):
        return [o for objs in by_subj[n].values() for o in objs
                if o[0] == BNODE and o in by_subj]

    for root in [s for s in by_subj if s[0] == BNODE]:
        if color.get(root, WHITE) != WHITE:
            continue
        color[root] = GRAY
        stack = [(root, iter(children(root)))]
        while stack:
            node, it = stack[-1]
            advanced = False
            for ch in it:
                c = color.get(ch, WHITE)
                if c == WHITE:
                    color[ch] = GRAY
                    stack.append((ch, iter(children(ch))))
                    advanced = True
                    break
                if c == GRAY:  # back edge
                    marked.add(ch)
                    marked.add(node)
            if not advanced:
                color[node] = BLACK
                stack.pop()
    return marked


def serialize_turtle(
    triples: Iterable[Triple],
    prefixes: Dict[str, str],
    emit_unused_prefixes: bool = False,
) -> str:
    """Serialize to turtle matching the reference golden layout.

    Pretty-printing: a bnode referenced exactly ONCE as an object (and
    not on a bnode cycle) is re-inlined at its reference site — as a
    collection ``( … )`` when its subgraph is a well-formed
    rdf:first/rdf:rest chain of single-reference nodes, else as a
    property list ``[ … ]``; a referenced leaf bnode with no outgoing
    triples renders ``[]``. Shared (ref ≥ 2) and cyclic bnodes keep
    their ``_:label`` form and a top-level block, which is always
    valid. This mirrors rdflib's pretty turtle (the parse side already
    accepted both forms).

    Ends with one trailing newline after the last statement block plus
    one blank line — i.e. the string ends ``" .\\n\\n"`` exactly as the
    reference's ``generate_string`` goldens do
    (tests/test_persistence_systems_generic_methods.py:20-31).
    """
    tlist = list(triples)
    ns = dict(prefixes)
    if not emit_unused_prefixes:
        ns = _used_prefixes(tlist, ns)
    # longest-namespace-first so the most specific binding wins
    ns_sorted = sorted(ns.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    used: set = set()

    # group by subject
    by_subj: Dict[Term, Dict[Term, List[Term]]] = {}
    for s, p, o in tlist:
        by_subj.setdefault(s, {}).setdefault(p, []).append(o)

    # ---- inline planning (bnode pretty-printing) ----------------------------
    obj_refs: Dict[Term, int] = {}
    for s, p, o in tlist:
        if o[0] == BNODE:
            obj_refs[o] = obj_refs.get(o, 0) + 1
    cyc = _cyclic_marked_bnodes(by_subj)
    inline_set = {o for o, c in obj_refs.items() if c == 1 and o not in cyc}

    first_t, rest_t, nil_t = iri(RDF_FIRST), iri(RDF_REST), iri(RDF_NIL)

    # ---- render-depth bound ----------------------------------------------
    # _render_obj recurses once per inline NESTING level (not per list
    # element — chains walk iteratively), so a deep chain of inlinable
    # bnodes (b0 p b1 . b1 p b2 . …) would blow Python's recursion
    # limit. Compute each candidate's nesting depth with an ITERATIVE
    # upward parent walk — a rdf:rest link out of a pure list node is
    # free (the whole chain renders in one stack frame) — and demote
    # too-deep candidates to labeled top-level blocks (always valid).
    # each inline level costs several Python frames (_render_obj →
    # _ttl_term → _qname → re), so stay well under the ~1000-frame
    # default recursion limit
    _MAX_INLINE_DEPTH = 100
    if inline_set:
        parent_edge: Dict[Term, Tuple[Term, Term]] = {}
        for s, p, o in tlist:
            if o in inline_set:
                parent_edge[o] = (s, p)  # unique: ref count == 1

        def _is_pure_list_node(n: Term) -> bool:
            preds = by_subj.get(n)
            return (preds is not None and set(preds) == {first_t, rest_t}
                    and len(preds[first_t]) == 1 and len(preds[rest_t]) == 1)

        depth_memo: Dict[Term, int] = {}
        for start in list(inline_set):
            path = []
            node = start
            while (node in inline_set and node not in depth_memo
                    and node in parent_edge):
                path.append(node)
                node = parent_edge[node][0]
            base = depth_memo.get(node, 0) if node in inline_set else 0
            for n in reversed(path):
                par, pred = parent_edge[n]
                free = pred == rest_t and _is_pure_list_node(par) \
                    and _is_pure_list_node(n)
                base = base if free else base + 1
                depth_memo[n] = base
        inline_set = {b for b in inline_set
                      if depth_memo.get(b, 0) <= _MAX_INLINE_DEPTH}

    def _list_chain(head: Term) -> Optional[List[Term]]:
        """Items of a well-formed collection chain starting at head
        (every node has exactly {rdf:first: 1, rdf:rest: 1} and every
        node is inlinable), else None. Iterative — chains can be
        long."""
        items: List[Term] = []
        node = head
        while True:
            preds = by_subj.get(node)
            if (preds is None or node not in inline_set
                    or set(preds) != {first_t, rest_t}
                    or len(preds[first_t]) != 1 or len(preds[rest_t]) != 1):
                return None
            items.append(preds[first_t][0])
            nxt = preds[rest_t][0]
            if nxt == nil_t:
                return items
            if nxt[0] != BNODE:
                return None
            node = nxt

    def _render_obj(o: Term) -> str:
        if o[0] != BNODE or o not in inline_set:
            return _ttl_term(o, ns_sorted, used)
        chain = _list_chain(o)
        if chain is not None:
            return "( " + " ".join(_render_obj(i) for i in chain) + " )"
        preds = by_subj.get(o)
        if not preds:
            return "[]"
        parts = []
        for p in sorted(preds, key=lambda p: (p[1] != RDF_TYPE, p[1])):
            ps = "a" if p[1] == RDF_TYPE else _ttl_term(p, ns_sorted, used)
            objs = sorted(set(preds[p]), key=_term_sort_key)
            parts.append(f"{ps} " + ", ".join(_render_obj(x) for x in objs))
        return "[ " + " ; ".join(parts) + " ]"

    # collection interior nodes consumed by a chain render: every node
    # of a valid chain is in inline_set, and chain membership is a pure
    # function of the graph, so skipping all inline_set subjects at the
    # top level emits each triple exactly once
    blocks = []
    for s in sorted(by_subj, key=_term_sort_key):
        if s in inline_set:
            continue  # rendered inline at its single reference site
        preds = by_subj[s]
        # 'a' (rdf:type) first, then predicates sorted by IRI
        pred_order = sorted(preds, key=lambda p: (p[1] != RDF_TYPE, p[1]))
        lines = []
        subj_str = _ttl_term(s, ns_sorted, used)
        for pi, p in enumerate(pred_order):
            pred_str = "a" if p[1] == RDF_TYPE else _ttl_term(p, ns_sorted, used)
            objs = sorted(set(preds[p]), key=_term_sort_key)
            obj_strs = [_render_obj(o) for o in objs]
            joined = ",\n        ".join(obj_strs)
            if pi == 0:
                lines.append(f"{subj_str} {pred_str} {joined}")
            else:
                lines.append(f"    {pred_str} {joined}")
        blocks.append(" ;\n".join(lines) + " .\n")

    header = "".join(
        f"@prefix {p}: <{n}> .\n" for p, n in sorted(ns.items()) if p in used
    )
    body = "\n".join(blocks)
    out = header
    if header and body:
        out += "\n"
    out += body
    if body:
        out += "\n"
    return out
