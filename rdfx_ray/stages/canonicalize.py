"""IRI canonicalization + blank-node skolemization.

Mirrors the reference's prefix handling (used-namespace filtering and
sorted rebinding, /root/reference/rdfx/rdfx_cli.py:127-143) as a
broadcast prefix map applied inside batch kernels, and makes blank
nodes stable across batches by skolemizing to deterministic IRIs
derived from (doc_id, local label) — required because an
INSERT-DATA-per-batch sink cannot preserve cross-batch blank-node
identity (SURVEY.md §0 discrepancy note).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

SKOLEM_PREFIX = "urn:skolem:"

# IRI-normalization aliases applied during canonicalization: the
# left-hand namespace is rewritten to the right-hand one. schema.org
# is the classic case (http vs https both occur in the wild; the
# reference corpus uses https, tests/data/file_01.ttl:2).
DEFAULT_NAMESPACE_ALIASES = {
    "http://schema.org/": "https://schema.org/",
}


class IriCanonicalizer:
    """Stateful canonicalizer: compile once per actor (__init__), apply
    per batch. Holds the prefix map (curie expansion) and namespace
    aliases (IRI rewriting)."""

    def __init__(self, prefixes: Optional[Dict[str, str]] = None,
                 aliases: Optional[Dict[str, str]] = None):
        self.prefixes = dict(prefixes or {})
        self.aliases = dict(DEFAULT_NAMESPACE_ALIASES if aliases is None else aliases)
        # longest alias first so the most specific rewrite wins
        self._alias_items = sorted(self.aliases.items(), key=lambda kv: -len(kv[0]))
        self._curie_re = re.compile(r"^([A-Za-z_][A-Za-z0-9_\-]*):(?!//)(\S*)$")

    def expand_curie(self, ref: str) -> str:
        m = self._curie_re.match(ref)
        if m and m.group(1) in self.prefixes:
            return self.prefixes[m.group(1)] + m.group(2)
        return ref

    def canonicalize(self, iri_value: str) -> str:
        iri_value = self.expand_curie(iri_value)
        for src, dst in self._alias_items:
            if iri_value.startswith(src):
                return dst + iri_value[len(src):]
        return iri_value

    def canonicalize_many(self, values: Iterable[str]) -> List[str]:
        return [self.canonicalize(v) for v in values]


def skolemize(doc_id: str, label: str) -> str:
    """Deterministic skolem IRI for a blank node scoped to one document
    (stable across batches, runs and resume: pure function of input)."""
    return f"{SKOLEM_PREFIX}{doc_id}:{label}"


def used_namespaces(term_iris: Iterable[str],
                    prefixes: Dict[str, str]) -> List[Tuple[str, str]]:
    """Bindings whose namespace occurs in some term, sorted by prefix —
    the reference clean semantics (rdfx/rdfx_cli.py:127-139)."""
    terms = list(term_iris)
    used = []
    for pref, ns in prefixes.items():
        if any(ns in t for t in terms):
            used.append((pref, ns))
    used.sort(key=lambda kv: kv[0])
    return used
