"""From-scratch RDF core: term model, parsers and serializers for
turtle / nt / rdf-xml / json-ld / n3, a small Graph, and isomorphism.

The columnar (Arrow) triple schema lives in
:mod:`rdfx_ray.stages.schema`; this package provides the per-document
kernels those stages call.
"""

from .formats import (
    CANONICAL_FORMAT,
    OUTPUT_FILE_ENDINGS,
    RDF_FILE_ENDINGS,
    VALID_RDF_FORMATS,
    get_input_format,
    rdf_format_validator,
)
from .graph import Graph, canonical_triples, isomorphic
from .terms import (
    BNODE,
    IRI,
    LITERAL,
    RDF_TYPE,
    Term,
    Triple,
    bnode,
    iri,
    literal,
    nt_term,
    nt_triple,
)

__all__ = [
    "BNODE", "CANONICAL_FORMAT", "Graph", "IRI", "LITERAL",
    "OUTPUT_FILE_ENDINGS", "RDF_FILE_ENDINGS", "RDF_TYPE", "Term",
    "Triple", "VALID_RDF_FORMATS", "bnode", "canonical_triples",
    "get_input_format", "iri", "isomorphic", "literal", "nt_term",
    "nt_triple", "rdf_format_validator",
]
