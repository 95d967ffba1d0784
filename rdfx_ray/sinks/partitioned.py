"""Partitioned triple materialization: the engine's only shuffle.

Stage 1 (map side): each extract task sorts its output batch by
``bucket = hash(subj) % P`` and writes ONE consolidated parquet file
under ``stage1/shard=<s>/`` with one row group per bucket — a
write-side exchange (map-side shuffle files, Spark-style consolidated)
instead of an in-memory all-to-all, chosen because it makes every
shard independently checkpointable and restartable (SURVEY.md §4).
Fragments are addressed as ``path#rg=<i>``; stage 2 reads only its
bucket's row groups. Task retries may leave orphan duplicate files;
that is safe by construction because stage 2 performs exact dedup and
only reads fragments listed in committed shard manifests.

Stage 2 (reduce side): one task per bucket reads that bucket's
fragments across all shards, exact-dedups on the full triple key
(keep-first by (doc_rank, span_idx) — deterministic lineage), and
writes the final partition: sorted parquet + sorted ``.nt`` text +
its own checkpoint manifest. Hub-entity skew needs no special pass
here: dedup keys are full triples, so sub-chunking by triple hash
("salting") keeps correctness while bounding per-chunk work
(SURVEY.md §4 'salting by full-triple-hash stays correct').
"""

from __future__ import annotations

import time
import uuid
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.schema import (STAGE1_PLAIN_SCHEMA, STAGE1_TRIPLES_SCHEMA,
                             TRIPLE_KEY_COLUMNS, TRIPLES_SCHEMA)
from ..state.manifest import CheckpointLedger
from .nt_lines import nt_bytes

STATS_SCHEMA = pa.schema([
    pa.field("bucket", pa.int32()),
    pa.field("path", pa.string()),
    pa.field("rows", pa.int64()),
])


def write_partitioned_batch(batch: pa.Table, *, out_dir: str,
                            shard_id: int) -> pa.Table:
    """map_batches kernel: sort one triple batch by bucket and write
    ONE consolidated parquet file with one row group per bucket
    (Spark-style shuffle-file consolidation). Stage 2 reads just its
    bucket's row groups, addressed as ``path#rg=<i>`` fragment refs —
    so the file count per shard is P_tasks, not P_tasks × P_buckets
    (~6.3k tiny files at bench scale before), writes are large and
    sequential, and reads stay pruned. File names are unique per task
    attempt (uuid) — idempotency comes from manifest-listed reads +
    stage-2 dedup, not from overwrites."""
    _cap_worker_threads(2)
    out = Path(out_dir)
    buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = batch.take(pa.array(order))
    sorted_buckets = buckets[order]
    bounds = np.flatnonzero(np.diff(sorted_buckets)) + 1
    starts = np.concatenate([[0], bounds])
    stops = np.concatenate([bounds, [len(sorted_buckets)]])

    d = out / "stage1" / f"shard={shard_id:05d}"
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{uuid.uuid4().hex}.parquet"
    rel = str(path.relative_to(out))

    stats: Dict[str, List[Any]] = {"bucket": [], "path": [], "rows": []}
    # snappy: stage-1 fragments are transient shuffle files; cheap
    # encode/decode beats ratio here (zstd compress was the dominant
    # CPU in the sink)
    # statistics off: these are transient shuffle files addressed by
    # explicit (file, row-group) refs — nobody predicate-pushes into
    # them, and 64-row-group footers with per-column stats made every
    # stage-2 footer parse measurably expensive
    writer = pq.ParquetWriter(path, STAGE1_TRIPLES_SCHEMA,
                              compression="snappy",
                              write_statistics=False)
    try:
        rg = 0
        for lo, hi in zip(starts, stops):
            if hi == lo:
                continue
            b = int(sorted_buckets[lo])
            part = (sorted_tbl.slice(lo, hi - lo).drop_columns(["bucket"])
                    .cast(STAGE1_TRIPLES_SCHEMA))
            # one write_table call per bucket slice = exactly ONE row
            # group: pass row_group_size explicitly, because above the
            # default cap (~1M rows, reachable via write_batch_rows)
            # ParquetWriter silently splits a table into several row
            # groups, which would shift every subsequent #rg=<i>
            # fragment ref and make stage 2 read the wrong buckets
            writer.write_table(part, row_group_size=part.num_rows)
            stats["bucket"].append(b)
            stats["path"].append(f"{rel}#rg={rg}")
            stats["rows"].append(part.num_rows)
            rg += 1
    finally:
        writer.close()
    return pa.Table.from_pydict(stats, schema=STATS_SCHEMA)


def _attach_graph_iri(table: pa.Table, bucket: int) -> pa.Table:
    """Re-attach the bucket-determined graph_iri as a constant column
    (dropped from the shuffle plane — schema.py STAGE1 note) and order
    columns to the final TRIPLES_SCHEMA."""
    iri = f"urn:graph:bucket-{bucket:04d}"
    out = table.append_column(
        "graph_iri", pa.array(np.full(table.num_rows, iri), pa.string()))
    return out.select([f.name for f in TRIPLES_SCHEMA]).cast(TRIPLES_SCHEMA)


_PQFILE_CACHE: Dict[str, "pq.ParquetFile"] = {}


def _pqfile(path: str) -> "pq.ParquetFile":
    """Process-level ParquetFile cache. Every bucket task opens every
    consolidated shuffle file it touches; without the cache a worker
    re-parses each many-row-group footer once PER BUCKET — a per-job
    cost of O(tasks × buckets) footer parses that grows quadratically
    with corpus size at fixed batch size (measured: it dominated
    stage 2 at 1M docs). One parse per (worker, file) instead."""
    f = _PQFILE_CACHE.get(path)
    if f is None:
        if len(_PQFILE_CACHE) > 4096:  # bound FDs across jobs
            for old in _PQFILE_CACHE.values():
                try:
                    old.close()
                except Exception:
                    pass
            _PQFILE_CACHE.clear()
        f = pq.ParquetFile(path)
        _PQFILE_CACHE[path] = f
    return f


def _split_fragment_ref(ref: str) -> Tuple[str, Optional[int]]:
    """``path#rg=<i>`` → (path, i); bare paths (pre-consolidation
    layout) → (path, None) meaning 'all row groups'."""
    if "#rg=" in ref:
        p, _, i = ref.rpartition("#rg=")
        return p, int(i)
    return ref, None


class BucketFinalizer:
    """Actor-pool stage over the control dataset of buckets (one row
    per bucket: bucket id + its stage-1 fragment paths). Each call
    finalizes one bucket end-to-end and commits its checkpoint, so a
    killed run resumes at bucket granularity."""

    def __init__(self, out_dir: str, salt_chunk_rows: int = 2_000_000,
                 write_nt: bool = True,
                 streaming_rows: Optional[int] = 8_000_000):
        self.out = Path(out_dir)
        self.ledger = CheckpointLedger(self.out)
        self.salt_chunk_rows = salt_chunk_rows
        self.write_nt = write_nt
        # buckets above this row count use the spill-based streaming
        # path (peak memory = one salt chunk, not the bucket)
        self.streaming_rows = streaming_rows

    def _dedup(self, table: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(table)
        if df.height > self.salt_chunk_rows:
            # salt: split by full-triple hash; identical triples share a
            # chunk, so per-chunk dedup is globally exact. Lineage sort
            # first (deterministic winner), key re-sort after concat.
            df = df.sort(["doc_rank", "span_idx"])
            n_chunks = (df.height + self.salt_chunk_rows - 1) // self.salt_chunk_rows
            df = df.with_columns(
                (pl.struct(TRIPLE_KEY_COLUMNS).hash(seed=0) % n_chunks)
                .alias("_salt")
            )
            parts = [
                part.unique(subset=TRIPLE_KEY_COLUMNS, keep="first",
                            maintain_order=True).drop("_salt")
                for _, part in df.group_by("_salt")
            ]
            # full key + lineage sort: polars sort is unstable and the
            # group_by concat order is nondeterministic, so sorting by
            # a 4-column prefix left rows differing only in
            # obj_datatype/obj_lang in arbitrary relative order —
            # breaking byte-identical reruns across the size-dependent
            # strategy switch. Same key as the small path.
            df = pl.concat(parts).sort(
                TRIPLE_KEY_COLUMNS + ["doc_rank", "span_idx"])
        else:
            # ONE sort: key columns first (= the final output order),
            # lineage last — so unique keep-first still picks the
            # min-(doc_rank, span_idx) winner per triple key, and no
            # second sort is needed
            df = (df.sort(TRIPLE_KEY_COLUMNS + ["doc_rank", "span_idx"])
                    .unique(subset=TRIPLE_KEY_COLUMNS, keep="first",
                            maintain_order=True))
        out = df.to_arrow()
        # polars emits large_string; normalize back to the engine schema
        return out.cast(table.schema)

    def _fragment_plan(self, refs: List[str]) -> List[Tuple[str, Optional[List[int]]]]:
        """Fragment refs → per-file read plan: (abs path, row-group ids
        or None for 'whole file')."""
        plan: Dict[str, Optional[List[int]]] = {}
        for ref in refs:
            p, rg = _split_fragment_ref(ref)
            full = str(self.out / p)
            if rg is None:
                plan[full] = None
            else:
                cur = plan.get(full)
                if full not in plan:
                    plan[full] = [rg]
                elif cur is not None:
                    cur.append(rg)
        return [(p, (sorted(r) if r is not None else None))
                for p, r in plan.items()]

    @staticmethod
    def _plan_rows(plan: List[Tuple[str, Optional[List[int]]]]) -> int:
        total = 0
        for p, rgs in plan:
            meta = _pqfile(p).metadata
            if rgs is None:
                total += meta.num_rows
            else:
                total += sum(meta.row_group(i).num_rows for i in rgs)
        return total

    @staticmethod
    def _iter_plan_tables(plan: List[Tuple[str, Optional[List[int]]]],
                          columns: List[str]):
        """Yield one table per row group of the plan (row-group-pruned
        reads: only this bucket's groups leave the consolidated
        shuffle files). Dictionary-encoded shuffle columns (pred/
        obj_kind/obj_datatype — schema.py note) are decoded to plain
        strings here, BEFORE any polars key hashing or sorting:
        polars categoricals hash/sort by physical index, which is not
        stable across chunks with different dictionaries. Pre-round-3
        shuffle files are already plain and pass through the cast
        unchanged."""
        for p, rgs in plan:
            f = _pqfile(p)
            for rg in (range(f.num_row_groups) if rgs is None else rgs):
                t = f.read_row_group(rg, columns=columns)
                if t.schema != STAGE1_PLAIN_SCHEMA:
                    t = t.cast(STAGE1_PLAIN_SCHEMA)
                yield t

    def _finalize_streaming(self, plan, b: int, d: Path, est_rows: int):
        """Memory-bounded finalize for buckets larger than worker heap
        (the 10^12-doc path): spill rows into salt-chunk files keyed by
        full-triple hash (identical triples colocate ⇒ per-chunk dedup
        is globally exact), dedup + append each chunk independently.
        Peak memory = one chunk, not the bucket. Output ordering is
        per-chunk sorted (chunk id is a pure function of content, so
        resume/rerun output is still deterministic)."""
        import polars as pl

        columns = [f.name for f in STAGE1_PLAIN_SCHEMA]
        n_chunks = max(2, (est_rows + self.salt_chunk_rows - 1)
                       // self.salt_chunk_rows)

        spill = d / "_spill"
        spill.mkdir(parents=True, exist_ok=True)
        writers = {}
        try:
            for t in self._iter_plan_tables(plan, columns):
                    df = pl.from_arrow(t)
                    df = df.with_columns(
                        (pl.struct(TRIPLE_KEY_COLUMNS).hash(seed=0)
                         % n_chunks).alias("_salt"))
                    for (salt,), part in df.group_by("_salt"):
                        w = writers.get(salt)
                        pt = part.drop("_salt").to_arrow().cast(
                            STAGE1_PLAIN_SCHEMA)
                        if w is None:
                            w = pq.ParquetWriter(
                                spill / f"chunk-{salt:06d}.parquet",
                                STAGE1_PLAIN_SCHEMA, compression="snappy")
                            writers[salt] = w
                        w.write_table(pt)
        finally:
            for w in writers.values():
                w.close()

        out_writer = pq.ParquetWriter(d / "triples.parquet", TRIPLES_SCHEMA,
                                      compression="snappy")
        nt_path = d / f"part-{b:05d}.nt"
        nt_f = nt_path.open("wb") if self.write_nt else None
        total = 0
        nt_size = 0
        try:
            for chunk_file in sorted(spill.glob("chunk-*.parquet")):
                t = pq.read_table(chunk_file, columns=columns)
                df = (pl.from_arrow(t).sort(["doc_rank", "span_idx"])
                        .unique(subset=TRIPLE_KEY_COLUMNS, keep="first",
                                maintain_order=True)
                        .sort(TRIPLE_KEY_COLUMNS + ["doc_rank", "span_idx"]))
                part = _attach_graph_iri(
                    df.to_arrow().cast(STAGE1_PLAIN_SCHEMA), b)
                out_writer.write_table(part)
                total += part.num_rows
                if nt_f is not None:
                    data = nt_bytes(part)
                    nt_f.write(data)
                    nt_size += len(data)
        finally:
            out_writer.close()
            if nt_f is not None:
                nt_f.close()
            for chunk_file in spill.glob("chunk-*.parquet"):
                chunk_file.unlink()
            spill.rmdir()
        return total, nt_size

    _WRITE_CHUNK_ROWS = 262_144

    def _write_final(self, deduped: pa.Table, b: int, d: Path
                     ) -> Tuple[int, int]:
        """Write the final partition with NT rendering INTERLEAVED
        with the parquet write: one ~256k-row slice at a time becomes
        one row group + one appended NT block. The per-slice working
        set (slice + its rendered lines) stays cache/heap-small instead
        of holding the whole bucket's parquet encode state AND its full
        NT byte string at once — this stage is memory-bandwidth-bound
        under 16-way concurrency. Byte output is identical to the
        whole-table form (NT rendering is row-wise; blocks concatenate
        with their trailing newlines)."""
        n = deduped.num_rows
        nt_size = 0
        writer = pq.ParquetWriter(d / "triples.parquet", TRIPLES_SCHEMA,
                                  compression="snappy")
        nt_f = (d / f"part-{b:05d}.nt").open("wb") if self.write_nt else None
        try:
            for lo in range(0, n, self._WRITE_CHUNK_ROWS):
                part = deduped.slice(lo, self._WRITE_CHUNK_ROWS)
                writer.write_table(part, row_group_size=part.num_rows)
                if nt_f is not None:
                    data = nt_bytes(part)
                    nt_f.write(data)
                    nt_size += len(data)
        finally:
            writer.close()
            if nt_f is not None:
                nt_f.close()
        return n, nt_size

    def __call__(self, control: pa.Table) -> pa.Table:
        results = {"bucket": [], "rows": [], "skipped": [], "seconds": []}
        for row in control.to_pylist():
            b = int(row["bucket"])
            unit = f"stage2-bucket-{b:05d}"
            done = self.ledger.read(unit)
            # skip ONLY if the committed entry covers exactly this
            # input-fragment set — incremental appends (new input
            # shards) change a bucket's fragment list and force its
            # recompute, while untouched buckets still skip
            if done is not None and set(done.get("input_fragments", [])) \
                    == set(row["paths"]):
                results["bucket"].append(b)
                results["rows"].append(done["rows"])
                results["skipped"].append(True)
                results["seconds"].append(0.0)
                continue
            t0 = time.time()
            plan = self._fragment_plan(row["paths"])
            d = self.out / "final" / f"bucket={b:05d}"
            d.mkdir(parents=True, exist_ok=True)
            n = 0
            nt_size = 0
            # manifest-carried row count (stage-1 stats) saves a footer
            # parse per file per bucket; metadata fallback for old runs
            est_rows = int(row.get("rows_est") or 0)
            if not est_rows:
                est_rows = self._plan_rows(plan) if plan else 0
            if est_rows and (self.streaming_rows is not None
                             and est_rows > self.streaming_rows):
                n, nt_size = self._finalize_streaming(plan, b, d, est_rows)
            elif est_rows:
                # explicit column list: keeps hive-style dir names from
                # being inferred as extra partition columns (row-group
                # pruned: only this bucket's groups are read)
                cols = [f.name for f in STAGE1_PLAIN_SCHEMA]
                table = pa.concat_tables(
                    list(self._iter_plan_tables(plan, cols)))
                deduped = _attach_graph_iri(self._dedup(table), b)
                n, nt_size = self._write_final(deduped, b, d)
            secs = time.time() - t0
            self.ledger.commit(unit, {
                "bucket": b,
                "rows": n,
                "nt_bytes": nt_size,
                "seconds": round(secs, 4),
                "input_fragments": row["paths"],
                "graph_iri": f"urn:graph:bucket-{b:04d}",
            })
            results["bucket"].append(b)
            results["rows"].append(n)
            results["skipped"].append(False)
            results["seconds"].append(round(secs, 4))
        return pa.Table.from_pydict(results)


_THREADS_CAPPED = False


def _cap_worker_threads(n: int = 2) -> None:
    """Cap Arrow's AND polars' per-process thread pools inside Ray
    workers. Many concurrent tasks each spawning a machine-width
    zstd/IO/sort pool oversubscribes the node by an order of magnitude
    (measured: 16 concurrent finalizes × a 32-thread polars pool each
    inflated per-bucket time ~5×); per-task parallelism belongs to
    Ray, not to nested pools. Override or disable (0) via
    RAY_GRAFT_ARROW_THREADS. POLARS_MAX_THREADS only takes effect if
    polars has not been imported yet in this process — kernels call
    this BEFORE their first polars import."""
    import os
    import sys

    global _THREADS_CAPPED
    if not _THREADS_CAPPED:
        n = int(os.environ.get("RAY_GRAFT_ARROW_THREADS", n))
        if n > 0:
            pa.set_cpu_count(n)
            pa.set_io_thread_count(max(2, n))
            if "polars" not in sys.modules:
                os.environ.setdefault("POLARS_MAX_THREADS", str(n))
        _THREADS_CAPPED = True


def finalize_buckets_kernel(control: pa.Table, *, out_dir: str,
                            salt_chunk_rows: int = 2_000_000,
                            write_nt: bool = True,
                            streaming_rows: Optional[int] = 8_000_000
                            ) -> pa.Table:
    """Stateless-task wrapper around BucketFinalizer (construction is
    just path setup) — elastic scheduling, no actor-pool CPU
    reservation, so finalize parallelism tracks the cluster size."""
    _cap_worker_threads(2)
    return BucketFinalizer(out_dir, salt_chunk_rows=salt_chunk_rows,
                           write_nt=write_nt,
                           streaming_rows=streaming_rows)(control)
