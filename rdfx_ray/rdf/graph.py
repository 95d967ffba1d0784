"""Small in-memory RDF graph for driver-side work and per-batch kernels.

This is NOT the engine's distributed data plane (that is a
``ray.data.Dataset`` over the columnar triple schema, see
``rdfx_ray.stages``) — it is the meeting point for (a) parsing a
single document/file inside a ``map_batches`` kernel, (b) tests and
goldens, (c) tiny driver-side results, mirroring the role
``rdflib.Graph`` plays in the reference (set semantics of triples:
/root/reference/rdfx/rdfx_cli.py:91-93).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Set, Tuple

from . import jsonld, ntriples, rdfxml, turtle
from .formats import CANONICAL_FORMAT, rdf_format_validator
from .terms import (
    BNODE,
    IRI,
    LITERAL,
    Term,
    Triple,
    WELL_KNOWN_PREFIXES,
    bnode,
    iri,
    nt_term,
)


class Graph:
    """A set of triples + prefix bindings (≈ rdflib.Graph surface used
    by the reference: parse, serialize, add, len, iteration,
    namespaces, bind)."""

    def __init__(self) -> None:
        self._triples: Set[Triple] = set()
        self._prefixes: Dict[str, str] = {}
        self._parse_count = 0

    # -- collection protocol -------------------------------------------------
    def __len__(self) -> int:
        return len(self._triples)

    def __iter__(self):
        return iter(self._triples)

    def __contains__(self, t: Triple) -> bool:
        return t in self._triples

    def add(self, t: Triple) -> "Graph":
        self._triples.add(t)
        return self

    def triples(self) -> Set[Triple]:
        return self._triples

    # -- namespaces ----------------------------------------------------------
    def bind(self, prefix: str, namespace: str) -> None:
        self._prefixes[prefix] = namespace

    def namespaces(self) -> List[Tuple[str, str]]:
        return list(self._prefixes.items())

    # -- parse / serialize ---------------------------------------------------
    def parse(self, data: str, rdf_format: str = "turtle",
              bnode_prefix: Optional[str] = None) -> "Graph":
        """Parse `data` into this graph (union semantics; fresh blank
        node labels per parse call, like rdflib — the reference merge
        relies on that for cross-file bnode distinctness)."""
        fmt = CANONICAL_FORMAT.get(rdf_format)
        if fmt is None and rdf_format in ("html", "rdfa"):
            fmt = "html"   # parse-only format (north-star matrix;
            #                rdflib guess_format maps .html → rdfa)
        if fmt is None:
            rdf_format_validator(rdf_format)
        self._parse_count += 1
        bp = bnode_prefix if bnode_prefix is not None else f"p{self._parse_count}"
        if fmt == "html":
            from . import rdfa
            trs = rdfa.parse_rdfa(data, bnode_prefix=bp)
            self._triples.update(trs)
            self._autobind()
            return self
        if fmt in ("turtle", "n3"):
            trs, prefixes = turtle.parse_turtle(data, bnode_prefix=bp)
            for k, v in prefixes.items():
                self._prefixes.setdefault(k, v)
        elif fmt == "nt":
            trs = ntriples.parse_nt(data)
        elif fmt == "xml":
            trs = rdfxml.parse_rdfxml(data, bnode_prefix=bp)
        elif fmt == "json-ld":
            trs = jsonld.parse_jsonld(data, bnode_prefix=bp)
        else:  # pragma: no cover
            raise ValueError(f"Unknown format {rdf_format!r}")
        self._triples.update(trs)
        if fmt in ("xml", "json-ld"):
            self._autobind()
        return self

    def _autobind(self) -> None:
        """Bind well-known prefixes whose namespaces occur in the graph
        (rdflib pre-binds core namespaces; the goldens depend on owl /
        xsd / sdo appearing after an xml or json-ld parse)."""
        for pref, ns in WELL_KNOWN_PREFIXES.items():
            if pref in self._prefixes:
                continue
            for t in self._triples:
                for term in t:
                    u = None
                    if term[0] in (IRI,):
                        u = term[1]
                    elif term[0] == LITERAL and term[2]:
                        u = term[2]
                    if u and u.startswith(ns):
                        self._prefixes[pref] = ns
                        break
                else:
                    continue
                break

    def serialize(self, format: str = "turtle") -> str:
        fmt = CANONICAL_FORMAT.get(format)
        if fmt is None:
            rdf_format_validator(format)
        self._autobind()
        if fmt in ("turtle", "n3"):
            return turtle.serialize_turtle(self._triples, self._prefixes)
        if fmt == "nt":
            return ntriples.serialize_nt(self._triples)
        if fmt == "xml":
            return rdfxml.serialize_rdfxml(self._triples, self._prefixes)
        if fmt == "json-ld":
            return jsonld.serialize_jsonld(self._triples)
        raise ValueError(f"Unknown format {format!r}")  # pragma: no cover

    # -- projections (reference: rdfx/rdfx_cli.py:128-130) --------------------
    def subjects(self) -> List[Term]:
        return [s for s, _, _ in self._triples]

    def predicates(self) -> List[Term]:
        return [p for _, p, _ in self._triples]

    def objects(self) -> List[Term]:
        return [o for _, _, o in self._triples]

    # -- equality ------------------------------------------------------------
    def isomorphic(self, other: "Graph") -> bool:
        return isomorphic(self._triples, other._triples)


# --------------------------------------------------------------------------
# Graph isomorphism (blank-node-aware set equality)
# --------------------------------------------------------------------------


def _canonical_bnode_labels(triples: Set[Triple]) -> Dict[str, str]:
    """Deterministic relabeling of blank nodes by iterative signature
    refinement (color refinement) run to a FIXPOINT with hashed colors
    — bounded rounds were insufficient for long bnode chains, which
    need ~n rounds to distinguish positions. Colors are md5 digests so
    per-round work stays O(E) (no nested-signature string blowup).
    Nodes still tied at the fixpoint are automorphic for every
    non-pathological graph this engine emits (the same criterion
    rdflib's isomorphic() implements via hashing), so relabeling them
    in any deterministic order yields the same canonical triple set."""
    import hashlib

    labels = {t[0][1] for t in triples if t[0][0] == BNODE}
    labels |= {t[2][1] for t in triples if t[2][0] == BNODE}
    if not labels:
        return {}

    def _h(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()[:16]

    # precompute the per-edge static strings once; per round only the
    # neighbour color varies
    edges: List[Tuple[str, str, Optional[str], str]] = []
    for s, p, o in triples:
        s_b = s[0] == BNODE
        o_b = o[0] == BNODE
        pnt = nt_term(p)
        if s_b:
            edges.append((s[1], f"+{pnt}|",
                          o[1] if o_b else None,
                          "" if o_b else nt_term(o)))
        if o_b:
            edges.append((o[1], f"-{pnt}|",
                          s[1] if s_b else None,
                          "" if s_b else nt_term(s)))

    sig: Dict[str, str] = {b: "0" for b in labels}
    n_classes = 0
    for _ in range(len(labels) + 1):
        parts: Dict[str, List[str]] = {b: [] for b in labels}
        for node, pre, nbr, fixed in edges:
            parts[node].append(
                pre + (f"B({sig[nbr]})" if nbr is not None else fixed))
        # include the previous color: partitions only ever refine,
        # so "class count stopped growing" == fixpoint reached
        sig = {b: _h(sig[b] + "|" + ";".join(sorted(v)))
               for b, v in parts.items()}
        k = len(set(sig.values()))
        if k == n_classes or k == len(labels):
            break
        n_classes = k
    order = sorted(labels, key=lambda b: (sig[b], b))
    return {b: f"cb{idx}" for idx, b in enumerate(order)}


def canonical_triples(triples: Iterable[Triple]) -> Set[Triple]:
    ts = set(triples)
    relabel = _canonical_bnode_labels(ts)
    if not relabel:
        return ts
    out = set()
    for s, p, o in ts:
        if s[0] == BNODE:
            s = bnode(relabel[s[1]])
        if o[0] == BNODE:
            o = bnode(relabel[o[1]])
        out.add((s, p, o))
    return out


def isomorphic(a: Iterable[Triple], b: Iterable[Triple]) -> bool:
    return canonical_triples(a) == canonical_triples(b)
