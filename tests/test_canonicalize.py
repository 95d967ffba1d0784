"""IRI canonicalization / skolemization unit tests (SURVEY.md §2.3
prefix-handling semantics, rdfx/rdfx_cli.py:127-143)."""

from rdfx_ray.stages.canonicalize import (
    IriCanonicalizer,
    skolemize,
    used_namespaces,
)


def test_curie_expansion():
    c = IriCanonicalizer(prefixes={"sdo": "https://schema.org/"})
    assert c.expand_curie("sdo:Person") == "https://schema.org/Person"
    # absolute IRIs and unknown prefixes pass through
    assert c.expand_curie("http://x/y") == "http://x/y"
    assert c.expand_curie("unknown:thing") == "unknown:thing"


def test_namespace_alias_rewrite():
    c = IriCanonicalizer()
    assert c.canonicalize("http://schema.org/name") == "https://schema.org/name"
    assert c.canonicalize("https://schema.org/name") == "https://schema.org/name"
    assert c.canonicalize("http://other.org/x") == "http://other.org/x"


def test_longest_alias_wins():
    c = IriCanonicalizer(aliases={"http://a/": "http://x/",
                                  "http://a/b/": "http://y/"})
    assert c.canonicalize("http://a/b/c") == "http://y/c"
    assert c.canonicalize("http://a/z") == "http://x/z"


def test_curie_then_alias():
    c = IriCanonicalizer(prefixes={"s": "http://schema.org/"})
    assert c.canonicalize("s:name") == "https://schema.org/name"


def test_skolemize_deterministic():
    a = skolemize("doc-00000001", "b3")
    assert a == "urn:skolem:doc-00000001:b3"
    assert skolemize("doc-00000001", "b3") == a


def test_used_namespaces_sorted_and_filtered():
    terms = ["http://used.example/s", "http://used.example/p",
             "http://zz.example/o"]
    prefixes = {"zz": "http://zz.example/", "aa": "http://used.example/",
                "nope": "http://unused.example/"}
    out = used_namespaces(terms, prefixes)
    assert out == [("aa", "http://used.example/"), ("zz", "http://zz.example/")]
