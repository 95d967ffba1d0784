"""Stage-1 shuffle-file compaction tier (Spark shuffle-service
analogue — the standard step past a one-level shuffle).

At fixed extract batch size the number of shuffle fragments PER BUCKET
grows linearly with corpus size: every map task writes one
consolidated file with one row group per bucket, so every reduce task
reads from every map output (BASELINE.md scale ladder: a measured
0.78× per-doc efficiency at the 2M-doc point, per-fragment read-call
overhead). This tier folds a bucket's fragments into a few large "run"
files before finalize, bounding fragments-per-bucket at any corpus
size.

Properties:

- **Proportional to NEW data.** Each bucket's ledger unit
  (``compact-bucket-<b>``) records committed runs as
  ``{"inputs": [fragment refs], "output": path, "rows": n}``. A
  resumed or incrementally-extended job reuses every committed run
  whose inputs are still part of the bucket's fragment set and
  compacts only uncovered fragments — so repeated appends never
  re-read already-compacted data.
- **Orphan-safe.** Run files carry uuid names; a retried task's
  half-written file is never referenced (only ledger-committed runs
  are), mirroring the stage-1 idempotency contract.
- **Output-transparent.** Compaction concatenates rows unchanged (no
  dedup, no re-sort) — finalize's full sort + keep-first dedup is
  order-independent, so final parquet/NT bytes are identical with or
  without compaction (pinned by tests/test_kg_pipeline.py).
- Fragments stay dictionary-encoded through compaction (schema.py
  STAGE1 note) — no string materialization in this tier.
"""

from __future__ import annotations

import uuid
from pathlib import Path
from typing import Any, Dict, List

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.schema import STAGE1_TRIPLES_SCHEMA
from ..state.manifest import CheckpointLedger
from .partitioned import _cap_worker_threads, _pqfile, _split_fragment_ref

COMPACT_CONTROL_SCHEMA = pa.schema([
    pa.field("bucket", pa.int32()),
    pa.field("paths", pa.list_(pa.string())),
    pa.field("rows_est", pa.int64()),
    pa.field("runs_written", pa.int32()),
])


def _compact_run(out: Path, bucket: int, refs: List[str],
                 max_run_rows: int) -> List[Dict[str, Any]]:
    """Fold ``refs`` (fragment refs relative to ``out``) into one or
    more run files of ≤ max_run_rows rows each. Returns the run
    records to commit. Memory is bounded by max_run_rows (runs flush
    as they fill)."""
    d = out / "stage1-compact" / f"bucket={bucket:05d}"
    d.mkdir(parents=True, exist_ok=True)

    runs: List[Dict[str, Any]] = []
    pending_tables: List[pa.Table] = []
    pending_refs: List[str] = []
    pending_rows = 0

    def flush():
        nonlocal pending_tables, pending_refs, pending_rows
        if not pending_refs:
            return
        path = d / f"run-{uuid.uuid4().hex}.parquet"
        writer = pq.ParquetWriter(path, STAGE1_TRIPLES_SCHEMA,
                                  compression="snappy",
                                  write_statistics=False)
        try:
            for t in pending_tables:
                writer.write_table(t, row_group_size=t.num_rows)
        finally:
            writer.close()
        runs.append({
            "inputs": list(pending_refs),
            "output": str(path.relative_to(out)),
            "rows": pending_rows,
        })
        pending_tables, pending_refs, pending_rows = [], [], 0

    for ref in refs:
        p, rg = _split_fragment_ref(ref)
        f = _pqfile(str(out / p))
        rgs = range(f.num_row_groups) if rg is None else [rg]
        for i in rgs:
            t = f.read_row_group(i)
            if t.schema != STAGE1_TRIPLES_SCHEMA:
                # pre-round-3 plain-string fragments fold in via a
                # string→dictionary cast
                t = t.cast(STAGE1_TRIPLES_SCHEMA)
            pending_tables.append(t)
            pending_rows += t.num_rows
        pending_refs.append(ref)
        if pending_rows >= max_run_rows:
            flush()
    flush()
    return runs


def compact_buckets_kernel(control: pa.Table, *, out_dir: str,
                           threshold: int,
                           max_run_rows: int = 4_000_000) -> pa.Table:
    """map_batches kernel over the bucket control dataset. For each
    bucket: reuse committed runs still covered by the current fragment
    set, compact uncovered fragments when they exceed ``threshold``,
    and emit the bucket's effective fragment list (run outputs +
    uncompacted leftovers) for finalize."""
    _cap_worker_threads(2)
    out = Path(out_dir)
    ledger = CheckpointLedger(out)
    res: Dict[str, List[Any]] = {"bucket": [], "paths": [], "rows_est": [],
                                 "runs_written": []}
    for row in control.to_pylist():
        b = int(row["bucket"])
        frags: List[str] = list(row["paths"])
        frag_set = set(frags)
        unit = f"compact-bucket-{b:05d}"
        state = ledger.read(unit) or {"runs": []}

        # runs whose inputs are all still part of this bucket's
        # fragment set remain valid; a recomputed shard invalidates
        # the runs that covered its old fragments (their files become
        # unreferenced orphans) and those fragments recompact below
        valid_runs = [r for r in state["runs"]
                      if set(r["inputs"]) <= frag_set]
        covered = {f for r in valid_runs for f in r["inputs"]}
        uncovered = [f for f in frags if f not in covered]

        written = 0
        if len(uncovered) > threshold:
            new_runs = _compact_run(out, b, uncovered, max_run_rows)
            written = len(new_runs)
            valid_runs = valid_runs + new_runs
            uncovered = []
        if valid_runs != state["runs"]:
            ledger.commit(unit, {"bucket": b, "runs": valid_runs})

        res["bucket"].append(b)
        res["paths"].append([r["output"] for r in valid_runs] + uncovered)
        res["rows_est"].append(int(row.get("rows_est") or 0))
        res["runs_written"].append(written)
    return pa.Table.from_pydict(res, schema=COMPACT_CONTROL_SCHEMA)
