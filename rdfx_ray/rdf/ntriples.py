"""N-Triples parser + serializer (from scratch; no rdflib in this env).

Conformance target: the unordered-line-set golden in the reference's
tests (/root/reference/tests/test_convert.py:13-33) and rdflib's NT
output shapes (`"lex"^^<dt>`, `"lex"@lang`, `<iri>`, `_:label`).
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Tuple

from .terms import (
    BNODE,
    IRI,
    LITERAL,
    Term,
    Triple,
    bnode,
    iri,
    literal,
    nt_triple,
    unescape_string,
)

# One NT statement: subject predicate object .
_NT_LINE = re.compile(
    r"""^[ \t]*
        (?:
          <(?P<s_iri>[^>]*)> | _:(?P<s_bn>\S+)
        )
        [ \t]+
        <(?P<p_iri>[^>]*)>
        [ \t]+
        (?:
          <(?P<o_iri>[^>]*)>
          | _:(?P<o_bn>\S+)
          | "(?P<o_lex>(?:[^"\\]|\\.)*)"
            (?:\^\^<(?P<o_dt>[^>]*)> | @(?P<o_lang>[A-Za-z0-9-]+))?
        )
        [ \t]*\.[ \t]*$""",
    re.X,
)


def parse_nt_line(line: str) -> Optional[Triple]:
    """Parse one N-Triples line; returns None for blank/comment lines."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _NT_LINE.match(line)
    if not m:
        raise ValueError(f"Invalid N-Triples line: {line!r}")
    if m.group("s_iri") is not None:
        s: Term = iri(unescape_string(m.group("s_iri")))
    else:
        s = bnode(m.group("s_bn"))
    p = iri(unescape_string(m.group("p_iri")))
    if m.group("o_iri") is not None:
        o: Term = iri(unescape_string(m.group("o_iri")))
    elif m.group("o_bn") is not None:
        o = bnode(m.group("o_bn"))
    else:
        o = literal(
            unescape_string(m.group("o_lex")),
            datatype=m.group("o_dt"),
            lang=m.group("o_lang"),
        )
    return (s, p, o)


def parse_nt(text: str) -> List[Triple]:
    out = []
    for line in text.split("\n"):
        t = parse_nt_line(line)
        if t is not None:
            out.append(t)
    return out


def serialize_nt(triples: Iterable[Triple], sort: bool = True) -> str:
    """Serialize triples to N-Triples.

    Lines are sorted for determinism (the reference compares NT output
    as an unordered line set, so any order is conformant; a stable
    order makes our partition files reproducible and diffable). A
    trailing blank line matches rdflib's NT serializer (the golden at
    tests/test_convert.py:13-20 ends with one).
    """
    lines = [nt_triple(t) for t in triples]
    if sort:
        lines.sort()
    if not lines:
        return "\n"
    return "\n".join(lines) + "\n\n"
