"""Distributed SOP sink: the scale plane of the SOP persistence
system — the reference uploads one whole in-RAM Graph per call
(rdfx/persistence_systems.py:453-488); here triple batches stream
through an ACTOR POOL whose members each hold one authenticated
client (built once in ``__init__``, the stateful-stage rule) and POST
per-named-graph turtle chunks through the same ``SOP.write`` flow
(ImportRDFFileService multipart upload, workflow tag resolution).

Chunked uploads are correct because SOP imports are set-union merges
into the target graph — exactly the engine's triple-set semantics —
and subjects are skolemized IRIs, so cross-batch blank-node identity
(SURVEY.md §0 discrepancy note) never arises.

``client_factory`` injects the transport per actor (tests pass a
factory that connects to a shared fake-server Ray actor); without it
each actor builds a real httpx client.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import pyarrow as pa

from ..persistence import SOP
from ..rdf.graph import Graph
from ..rdf.terms import bnode, iri, literal

UPLOAD_STATS_SCHEMA = pa.schema([
    ("graph_iri", pa.string()),
    ("triples", pa.int64()),
    ("message", pa.string()),
])


def _graph_from_rows(subj, pred, obj_kind, obj_value, obj_datatype,
                     obj_lang) -> Graph:
    g = Graph()
    for s, p, ok, ov, dt, lg in zip(subj, pred, obj_kind, obj_value,
                                    obj_datatype, obj_lang):
        s_term = bnode(s[2:]) if s.startswith("_:") else iri(s)
        if ok == "iri":
            o_term = iri(ov)
        elif ok == "bnode":
            o_term = bnode(ov)
        else:
            o_term = literal(ov, datatype=dt, lang=lg)
        g.add((s_term, iri(p), o_term))
    return g


class SopUpload:
    """map_batches actor: one SOP client per actor; per batch, group
    rows by ``graph_iri`` and upload each group as a turtle chunk.
    Returns one stats row per (batch, graph) upload."""

    def __init__(self, location: str = "http://localhost:8083",
                 username: str = "Administrator",
                 password: Optional[str] = None,
                 client_factory: Optional[Callable] = None):
        client = client_factory() if client_factory is not None else None
        self.ps = SOP(location=location, username=username,
                      password=password, client=client)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        stats: Dict[str, List] = {"graph_iri": [], "triples": [],
                                  "message": []}
        df = pl.from_arrow(batch)
        for (graph_iri,), part in df.group_by(["graph_iri"]):
            g = _graph_from_rows(
                part["subj"].to_list(), part["pred"].to_list(),
                part["obj_kind"].to_list(), part["obj_value"].to_list(),
                part["obj_datatype"].to_list(), part["obj_lang"].to_list())
            msg = self.ps.write(g, str(graph_iri))
            stats["graph_iri"].append(str(graph_iri))
            stats["triples"].append(len(g))
            stats["message"].append(msg)
        return pa.Table.from_pydict(stats, schema=UPLOAD_STATS_SCHEMA)


def upload_triples(triples_ds, location: str = "http://localhost:8083",
                   username: str = "Administrator",
                   password: Optional[str] = None,
                   client_factory: Optional[Callable] = None,
                   concurrency: int = 2, batch_size: int = 8192):
    """Stream a triples Dataset into SOP through the upload actor
    pool. Size ``concurrency`` to what the server can absorb — the
    bottleneck is the HTTP endpoint, not the cluster."""
    return triples_ds.map_batches(
        SopUpload,
        fn_constructor_kwargs={
            "location": location, "username": username,
            "password": password, "client_factory": client_factory,
        },
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
