"""Minimal Lance-style versioned columnar store.

The north rule specifies Lance tables, but ``lance``/``lancedb`` are
not installed and there is no network, so this shim provides the same
*shape*: a dataset directory of immutable parquet fragments plus a
versioned manifest listing fragments, schema fingerprint, row counts
and lineage. The API is deliberately tiny and swappable for
``ray.data.read_lance`` / ``lance.write_dataset`` when the real
library is present (SURVEY.md §1.2).

Layout::

    <uri>/
      data/frag-<id>.parquet        # immutable fragments
      _manifest/<version>.json      # {"version", "schema_fp", "fragments":
                                    #   [{"path", "rows", "lineage": {...}}]}
      _manifest/LATEST              # current version number (atomic rename)

Writes are atomic at fragment granularity: fragments land under
``data/`` with a temp name and are renamed, then a new manifest
version referencing them is committed — exactly the idempotent-sink
pattern a resumable 100-TB run needs.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def _schema_fingerprint(schema: pa.Schema) -> str:
    return hashlib.md5(schema.serialize().to_pybytes()).hexdigest()


class LanceShim:
    def __init__(self, uri: str):
        self.root = Path(uri)
        self.data_dir = self.root / "data"
        self.manifest_dir = self.root / "_manifest"

    # -- write ---------------------------------------------------------------
    def create(self, schema: pa.Schema) -> None:
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        self._commit_manifest(
            {"version": 0, "schema_fp": _schema_fingerprint(schema),
             "schema": schema.to_string(), "fragments": []}
        )

    def write_fragment(self, table: pa.Table, fragment_id: str,
                       lineage: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Write one immutable fragment atomically (tmp + rename).
        Idempotent: re-writing the same fragment_id replaces the file
        with identical content, so retried tasks are safe."""
        self.data_dir.mkdir(parents=True, exist_ok=True)
        final = self.data_dir / f"frag-{fragment_id}.parquet"
        fd, tmp = tempfile.mkstemp(dir=str(self.data_dir), suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(table, tmp, compression="zstd")
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return {
            "path": f"data/{final.name}",
            "rows": table.num_rows,
            "bytes": final.stat().st_size,
            "lineage": lineage or {},
        }

    def commit(self, fragments: List[Dict[str, Any]], schema: pa.Schema,
               extra: Optional[Dict[str, Any]] = None) -> int:
        """Commit a new dataset version from fragment entries."""
        current = self.latest_manifest()
        version = (current["version"] + 1) if current else 1
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "schema_fp": _schema_fingerprint(schema),
            "schema": schema.to_string(),
            "fragments": fragments,
            "rows": sum(f["rows"] for f in fragments),
        }
        if extra:
            manifest.update(extra)
        self._commit_manifest(manifest)
        return version

    def _commit_manifest(self, manifest: Dict[str, Any]) -> None:
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        vpath = self.manifest_dir / f"{manifest['version']}.json"
        fd, tmp = tempfile.mkstemp(dir=str(self.manifest_dir))
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, vpath)
        fd, tmp = tempfile.mkstemp(dir=str(self.manifest_dir))
        with os.fdopen(fd, "w") as f:
            f.write(str(manifest["version"]))
        os.replace(tmp, self.manifest_dir / "LATEST")

    # -- read ----------------------------------------------------------------
    def latest_manifest(self) -> Optional[Dict[str, Any]]:
        latest = self.manifest_dir / "LATEST"
        if not latest.exists():
            return None
        version = latest.read_text().strip()
        return json.loads((self.manifest_dir / f"{version}.json").read_text())

    def fragment_paths(self) -> List[str]:
        m = self.latest_manifest()
        if not m:
            return []
        return [str(self.root / f["path"]) for f in m["fragments"]]

    def count_rows(self) -> int:
        m = self.latest_manifest()
        return m["rows"] if m else 0


def write_dataset(table_or_batches, uri: str, fragment_rows: int = 1 << 18,
                  lineage: Optional[Dict[str, Any]] = None) -> LanceShim:
    """One-shot driver-side writer: split a pyarrow Table into
    fragments and commit version 1. For distributed writes, tasks call
    ``write_fragment`` and the driver calls ``commit``."""
    shim = LanceShim(uri)
    if isinstance(table_or_batches, pa.Table):
        batches = [table_or_batches.slice(i, fragment_rows)
                   for i in range(0, max(table_or_batches.num_rows, 1), fragment_rows)]
        schema = table_or_batches.schema
    else:
        batches = list(table_or_batches)
        schema = batches[0].schema
    shim.create(schema)
    frags = []
    for i, b in enumerate(batches):
        if isinstance(b, pa.RecordBatch):
            b = pa.Table.from_batches([b])
        frags.append(shim.write_fragment(b, f"{i:06d}", lineage))
    shim.commit(frags, schema, extra={"writer": "write_dataset"})
    return shim


def read_dataset(uri: str, columns: Optional[List[str]] = None,
                 concurrency: Optional[int] = None):
    """Read a shim dataset as a ``ray.data.Dataset`` (fragment-parallel,
    column-pruned at the read — swap-in point for ray.data.read_lance)."""
    import ray.data as rd

    shim = LanceShim(uri)
    paths = shim.fragment_paths()
    if not paths:
        raise FileNotFoundError(f"No committed fragments at {uri}")
    return rd.read_parquet(paths, columns=columns, concurrency=concurrency)
