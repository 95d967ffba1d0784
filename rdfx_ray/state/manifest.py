"""Per-partition checkpoint manifests — the resume unit of the engine.

A pipeline run owns a ``_checkpoints/`` directory. Each unit of work
(stage-1 input shard, stage-2 output bucket) commits one JSON manifest
atomically (tmp + rename) AFTER its output files are durable; on
restart, units whose manifest exists are skipped wholesale and their
outputs trusted (north_rule: "resumes without recomputation, with
per-partition lineage + metrics").

Manifests double as the metrics ledger: rows, bytes, wall seconds and
input lineage per unit.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any, Dict, List, Optional


class CheckpointLedger:
    def __init__(self, root: Path):
        self.dir = Path(root) / "_checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, unit: str) -> Path:
        return self.dir / f"{unit}.json"

    def is_committed(self, unit: str) -> bool:
        return self._path(unit).exists()

    def read(self, unit: str) -> Optional[Dict[str, Any]]:
        p = self._path(unit)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def commit(self, unit: str, payload: Dict[str, Any]) -> None:
        fd, tmp = tempfile.mkstemp(dir=str(self.dir))
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        os.replace(tmp, self._path(unit))

    def committed_units(self, prefix: str = "") -> List[str]:
        return sorted(
            p.stem for p in self.dir.glob(f"{prefix}*.json")
        )

    def all(self, prefix: str = "") -> Dict[str, Dict[str, Any]]:
        return {u: self.read(u) for u in self.committed_units(prefix)}
