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
        return [e for e in self.ledger.all("stage2-bucket-").values() if e]

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
