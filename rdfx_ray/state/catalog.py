"""Named-graph catalog over a finished KG output directory.

The reference's SOP asset/datagraph lifecycle (create_datagraph
:592-629, create_workflow :631-662, asset_exists :760-784,
asset_collection_size :582-590) becomes manifest bookkeeping here:
graphs are partitions, their existence/size/lineage live in the
checkpoint ledger — O(1) catalog lookups, no data scan."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional

from .manifest import CheckpointLedger


class GraphCatalog:
    def __init__(self, out_dir: str):
        self.out = Path(out_dir)
        self.ledger = CheckpointLedger(self.out)

    def _bucket_entries(self) -> List[Dict[str, Any]]:
        # stage2-bucket-* (pipeline partitions) + stage2-graphfile-*
        # (single-file ingests) — both are named-graph partitions
        return [e for e in self.ledger.all("stage2-").values()
                if e and "graph_iri" in e]

    def graphs(self) -> List[str]:
        return sorted(e["graph_iri"] for e in self._bucket_entries())

    def asset_exists(self, graph_iri: str) -> bool:
        """Existence via manifest (reference: ASK / head_object)."""
        return any(e["graph_iri"] == graph_iri for e in self._bucket_entries())

    def asset_collection_size(self, graph_iri: str) -> int:
        """Triple count via manifest (reference: SPARQL COUNT,
        rdfx/persistence_systems.py:582-590) — no scan."""
        for e in self._bucket_entries():
            if e["graph_iri"] == graph_iri:
                return int(e["rows"])
        raise KeyError(f"No such graph: {graph_iri}")

    def sizes(self) -> Dict[str, int]:
        return {e["graph_iri"]: int(e["rows"]) for e in self._bucket_entries()}

    def lineage(self, graph_iri: str) -> List[str]:
        for e in self._bucket_entries():
            if e["graph_iri"] == graph_iri:
                return list(e.get("input_fragments", []))
        raise KeyError(f"No such graph: {graph_iri}")

    # -- creation ops (registry records, mirroring SOP's create_*) ----------
    def create_datagraph(self, name: Optional[str] = None,
                         namespace: Optional[str] = None,
                         creator: str = "engine") -> str:
        """Register a logical datagraph (reference default-name and
        default-namespace semantics, rdfx/persistence_systems.py:604-610)."""
        if name is None:
            name = f"Python_created_Datagraph_by_{creator}"
        if namespace is None:
            namespace = f"https://example.org/data/{name}#"
        iri = f"urn:x-evn-master:{name}"
        self.ledger.commit(f"datagraph-{name}", {
            "graph_iri": iri, "namespace": namespace,
            "creator": creator, "created_at": time.time(),
        })
        return iri

    def create_workflow(self, datagraph_urn: str, workflow_name: str,
                        creator: str = "engine") -> str:
        """Branch entry (reference master→tag swap, :659-662)."""
        dg = datagraph_urn.split(":")[-1]
        iri = f"urn:x-evn-tag:{dg}:{workflow_name}:{creator}"
        self.ledger.commit(f"workflow-{dg}-{workflow_name}", {
            "workflow_iri": iri, "datagraph": datagraph_urn,
            "creator": creator, "created_at": time.time(),
        })
        return iri

    def create_manifest(self, name: str, imports: Optional[List[str]] = None,
                        creator: str = "engine") -> str:
        """Collection-level manifest record (reference
        create_manifest: CreateProjectService with OntologyRegister
        type + owlImports, rdfx/persistence_systems.py:664-709)."""
        iri = f"urn:x-evn-master:{name}"
        self.ledger.commit(f"manifest-{name}", {
            "graph_iri": iri, "type": "OntologyRegister",
            "imports": list(imports or []),
            "creator": creator, "created_at": time.time(),
        })
        return iri

    def create_file(self, local_file_path, graph_iri: str,
                    base_uri: Optional[str] = None) -> Dict[str, Any]:
        """Ingest-one-file helper (reference create_file skeleton +
        upload, rdfx/persistence_systems.py:711-758; duplicate baseURI
        → ValueError :746-752): parse a local RDF file and materialize
        it as a named-graph partition (parquet + NT + ledger entry),
        addressable through the same catalog surface."""
        import hashlib

        import pyarrow.parquet as pq

        from ..rdf.columnar import triples_to_table
        from ..rdf.formats import get_input_format
        from ..rdf.graph import Graph
        from ..sinks.nt_lines import nt_lines

        base_uri = base_uri or graph_iri
        unit_id = hashlib.md5(graph_iri.encode()).hexdigest()[:12]
        unit = f"stage2-graphfile-{unit_id}"
        existing = self.ledger.read(unit)
        if existing is not None:
            raise ValueError(
                f"An asset with baseURI {base_uri} already exists")

        p = Path(local_file_path)
        g = Graph().parse(p.read_text(encoding="utf-8"), get_input_format(p))
        tag = f"file-{unit_id}"
        table = triples_to_table(iter(g), skolem_prefix=tag)
        import pyarrow as pa
        n = table.num_rows
        table = (table
                 .append_column("graph_iri",
                                pa.array([graph_iri] * n, pa.string()))
                 .append_column("doc_rank", pa.array([0] * n, pa.int64()))
                 .append_column("span_idx",
                                pa.array([0] * n, pa.int32())))

        d = self.out / "final" / f"graphfile={unit_id}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, d / "triples.parquet", compression="snappy")
        lines = nt_lines(table)
        (d / "part.nt").write_bytes(
            (lines.str.cat(sep="\n") + "\n").encode("utf-8"))
        entry = {
            "graph_iri": graph_iri, "base_uri": base_uri,
            "rows": n, "source_file": str(p),
            "input_fragments": [], "created_at": time.time(),
        }
        self.ledger.commit(unit, entry)
        return entry
