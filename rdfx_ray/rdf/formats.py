"""RDF format registry — mirrors the reference's tables exactly.

RDF_FILE_ENDINGS: /root/reference/rdfx/persistence_systems.py:23-34
(duplicated at rdfx/rdfx_cli.py:12-23); OUTPUT_FILE_ENDINGS:
rdfx/rdfx_cli.py:25-31; VALID_RDF_FORMATS:
rdfx/persistence_systems.py:20-21; get_input_format:
rdfx/rdfx_cli.py:34-45 (rdflib guess_format + json-ld fallback).
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

VALID_RDF_FORMATS = ("ttl", "turtle", "xml", "json-ld", "nt", "n3")

RDF_FILE_ENDINGS = {
    "ttl": "turtle",
    "turtle": "turtle",
    "json": "json-ld",
    "json-ld": "json-ld",
    "jsonld": "json-ld",
    "owl": "xml",
    "xml": "xml",
    "rdf": "xml",
    "nt": "nt",
    "n3": "n3",
    # parse-only (north-star matrix; rdflib guess_format maps .html →
    # its rdfa parser). Appended AFTER the reference's pinned keys so
    # prepare_files_list's test-pinned expansion order is unchanged.
    "html": "html",
    "htm": "html",
}

# formats that can be read but not written (mirrors rdflib: no html
# serializer plugin)
PARSE_ONLY_FORMATS = ("html",)

OUTPUT_FILE_ENDINGS = {
    "turtle": "ttl",
    "ttl": "ttl",
    "xml": "xml",
    "json-ld": "json-ld",
    "nt": "nt",
    "n3": "n3",
}

# canonical format token (both 'ttl' and 'turtle' are accepted everywhere,
# like rdflib's plugin aliases)
CANONICAL_FORMAT = {
    "ttl": "turtle",
    "turtle": "turtle",
    "xml": "xml",
    "json-ld": "json-ld",
    "nt": "nt",
    "n3": "n3",
}


def rdf_format_validator(rdf_format: str) -> None:
    """Reference: rdfx/persistence_systems.py:78-83."""
    if rdf_format not in VALID_RDF_FORMATS:
        raise ValueError(
            "The RDF format selected must be one of " + ", ".join(VALID_RDF_FORMATS)
        )


def get_input_format(file_path: Union[str, Path]) -> str:
    """Infer the parse format from a filename (rdfx/rdfx_cli.py:34-45)."""
    suffix = Path(file_path).suffix.lstrip(".").lower()
    fmt = RDF_FILE_ENDINGS.get(suffix)
    if fmt is None:
        s = str(file_path)
        if s.endswith("json-ld") or s.endswith("jsonld"):
            fmt = "json-ld"
        else:
            raise ValueError(
                f"ERROR: Cannot guess the RDF format of input file {file_path}"
            )
    return fmt
