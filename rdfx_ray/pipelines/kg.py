"""The flagship pipeline: interleaved documents → deduplicated,
partitioned N-Triples knowledge graph.

Topology (Ray-Data-first, SURVEY.md §7 steps 3-6)::

    for each input shard (group of Lance-shim fragments):     # resume unit 1
        read_parquet(shard fragments)                          # column-pruned
          → map_batches(ExtractLink, concurrency=A)            # actor pool
          → map_batches(write_partitioned_batch)               # map-side shuffle
        commit stage1-shard manifest
    control dataset of buckets                                 # resume unit 2
          → map_batches(BucketFinalizer, concurrency=B)        # dedup + NT
    job manifest with docs/s + triples/s metrics

The only all-to-all movement is the write-side bucket exchange; there
is no driver-side materialization of data (only tiny stats tables).
The reference equivalent is parse → merge-into-one-Graph → serialize
(rdfx/rdfx_cli.py:70,91-94) — whole-graph-in-RAM, which this design
replaces (SURVEY.md §3.2 "the core scalability wall").
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

from ..sinks.compact import compact_buckets_kernel
from ..sinks.partitioned import (
    BucketFinalizer,
    finalize_buckets_kernel,
    write_partitioned_batch,
)
from ..sources import vocab
from ..stages.extract import (BUCKET_FN_VERSION, ExtractLink,
                              extract_link_kernel)
from ..state.manifest import CheckpointLedger
from ..store.lance_shim import LanceShim


@dataclass
class KGConfig:
    n_buckets: int = 32           # output partitions; scale with data volume
    n_entities: int = 10_000
    batch_size: int = 1024        # docs per extract batch
    # triples per consolidated shuffle-file write; None (default) =
    # fused with the extract batch — no object-store hop. Setting a
    # larger value trades fewer/bigger shuffle files for streaming the
    # triples through the object store between the stages; MEASURED at
    # the 1M-doc ladder point the hop+rebatch cost far exceeded the
    # file-count saving (160s vs 35s) — the per-worker ParquetFile
    # cache already removes the many-files footer cost. Keep None
    # unless the filesystem itself is file-count-bound.
    write_batch_rows: Optional[int] = None
    # None = elastic stateless tasks (default; scales with the
    # cluster). An int pins an actor pool of that size instead.
    extract_concurrency: Optional[int] = None
    finalize_concurrency: Optional[int] = None
    # CPU ask per finalize task. A finalize task holds a whole bucket
    # (read + dedup + serialize ≈ several × the bucket's bytes) in
    # heap; asking for >1 CPU bounds concurrent finalizes so aggregate
    # heap stays inside node memory — full-width concurrency here
    # caused 40× slowdowns from memory pressure, not CPU.
    finalize_num_cpus: float = 2.0
    shard_fragments: int = 4      # input fragments per checkpoint shard
    salt_chunk_rows: int = 2_000_000
    # buckets above this use the spill-based streaming finalize
    # (peak memory = one salt chunk); None disables
    streaming_rows: Optional[int] = 8_000_000
    # shuffle compaction tier (sinks/compact.py): buckets with more
    # than this many UNCOMPACTED stage-1 fragments fold them into
    # large run files before finalize; None disables. Default sits
    # above the ~100-fragment bench point (where per-fragment overhead
    # is still negligible) and well below the 2M-doc cliff (~490
    # fragments/bucket, measured 0.78× per-doc efficiency).
    compact_threshold: Optional[int] = 160
    compact_run_rows: int = 4_000_000
    compact_num_cpus: float = 1.0
    # overlap compaction with later shards' extraction: committed
    # shards' fragments compact in a background pass while the next
    # shard extracts, so on multi-shard jobs compaction IO hides
    # behind stage-1 instead of stalling between the stages. Safe at
    # any timing: the kernel is idempotent and ledger-keyed, and the
    # pre-finalize pass below is authoritative.
    compact_overlap: bool = True
    write_nt: bool = True
    broadcast_alias: bool = True  # ray.put the alias dict once per job
    # test-only failpoint: raise after committing this many shards, to
    # drill the kill/resume path (north_rule resumability criterion)
    failpoint_after_shards: Optional[int] = None


def run_kg_pipeline(input_uri: str, out_dir: str,
                    config: Optional[KGConfig] = None) -> Dict[str, Any]:
    """Run (or resume) the KG-construction pipeline. Assumes Ray is
    already initialised (driver contract)."""
    import ray
    import ray.data as rd

    cfg = config or KGConfig()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ledger = CheckpointLedger(out)

    # -- bucket-layout guard --------------------------------------------------
    # Every derived artifact (stage-1 shuffle files, compaction runs,
    # finalized buckets) is keyed by the bucket layout = (bucket
    # function version, bucket count). Resuming an output dir written
    # under a DIFFERENT layout must not just recompute shards (the
    # per-shard guard below) — it must also drop the stale derived
    # state, or read_final_triples would pick up leftover
    # final/bucket=* dirs beyond the new range and compact ledgers
    # would mis-attribute coverage. On mismatch: wipe derived state,
    # keep nothing (the input dataset is untouched).
    layout = {"bucket_fn": BUCKET_FN_VERSION, "n_buckets": cfg.n_buckets}
    prior = ledger.read("layout")
    if prior is None:
        # pre-upgrade output dir: infer the layout from any committed
        # shard manifest (absent fields read as None ≠ current values)
        for u in ledger.committed_units("stage1-shard-"):
            st = ledger.read(u)
            prior = {"bucket_fn": st.get("bucket_fn"),
                     "n_buckets": st.get("n_buckets")}
            break
    if prior is not None and prior != layout:
        _wipe_derived_state(out, ledger)
    ledger.commit("layout", layout)

    shim = LanceShim(input_uri)
    manifest = shim.latest_manifest()
    if manifest is None:
        raise FileNotFoundError(f"No committed input dataset at {input_uri}")
    frag_paths = shim.fragment_paths()
    n_docs_total = manifest["rows"]

    # broadcast the linker dictionary once; every actor ray.get()s the
    # same immutable copy from the object store (no per-batch reship)
    alias_ref = None
    if cfg.broadcast_alias:
        alias_ref = ray.put(vocab.build_alias_index(cfg.n_entities))

    t_start = time.time()
    shard_stats: List[Dict[str, Any]] = []
    shards = [frag_paths[i:i + cfg.shard_fragments]
              for i in range(0, len(frag_paths), cfg.shard_fragments)]

    docs_processed = 0
    triples_written = 0

    # -- overlapped compaction bookkeeping -----------------------------------
    import threading
    compact_thread: Optional[threading.Thread] = None
    frags_since_kick = 0

    def _compact_pass(files_snapshot: Dict[int, List[str]]) -> None:
        comp_ctrl = rd.from_items([
            {"bucket": b, "paths": p, "rows_est": 0}
            for b, p in files_snapshot.items() if p
        ])
        # result discarded: the ledger carries the committed runs; the
        # authoritative pre-finalize pass below re-reads them
        comp_ctrl.map_batches(
            compact_buckets_kernel,
            fn_kwargs={"out_dir": str(out),
                       "threshold": cfg.compact_threshold,
                       "max_run_rows": cfg.compact_run_rows},
            batch_format="pyarrow", batch_size=1,
            num_cpus=cfg.compact_num_cpus,
        ).materialize()

    def _bucket_files_of(stats_list) -> Dict[int, List[str]]:
        files: Dict[int, List[str]] = {b: [] for b in range(cfg.n_buckets)}
        for st in stats_list:
            for b, ps in st["fragments"].items():
                files[int(b)].extend(ps)
        return files

    for s, paths in enumerate(shards):
        unit = f"stage1-shard-{s:05d}"
        committed = ledger.read(unit)
        # A shard is reusable only if it covered the SAME fragment set:
        # after extend_documents appends fragments, a shard that was
        # previously the (short) tail gains fragments and must be
        # recomputed — mirroring stage-2's input_fragments comparison.
        # Skipping on existence alone silently dropped the appended docs.
        # ... and only if it was bucketed by the SAME bucket LAYOUT —
        # function version AND bucket count: mixing layouts would
        # scatter one triple's copies across buckets and stage-2's
        # per-bucket dedup would silently miss them
        if (committed is not None
                and committed.get("input_paths") == paths
                and committed.get("bucket_fn") == BUCKET_FN_VERSION
                and committed.get("n_buckets") == cfg.n_buckets):
            shard_stats.append(committed)
            docs_processed += committed["docs"]
            triples_written += committed["triples"]
            continue
        t0 = time.time()
        ds = rd.read_parquet(paths)
        # stateless tasks (elastic; per-process state via the kernel
        # cache). Set extract_concurrency to pin an actor pool instead.
        if cfg.extract_concurrency is None:
            triples = ds.map_batches(
                extract_link_kernel,
                fn_kwargs={
                    "n_entities": cfg.n_entities,
                    "n_buckets": cfg.n_buckets,
                    "alias_ref": alias_ref,
                },
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            )
        else:
            triples = ds.map_batches(
                ExtractLink,
                fn_constructor_kwargs={
                    "n_entities": cfg.n_entities,
                    "n_buckets": cfg.n_buckets,
                    "alias_ref": alias_ref,
                },
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=cfg.extract_concurrency,
            )
        stats_ds = triples.map_batches(
            write_partitioned_batch,
            fn_kwargs={"out_dir": str(out), "shard_id": s},
            batch_format="pyarrow",
            **({"batch_size": cfg.write_batch_rows}
               if cfg.write_batch_rows else {}),
        )
        stats = stats_ds.to_pandas()  # tiny: one row per (task, bucket)
        _maybe_dump_stats(stats_ds, out, f"stage1-shard-{s:05d}")
        n_docs = sum(_parquet_rows(p) for p in paths)
        payload = {
            "shard": s,
            "docs": int(n_docs),
            "triples": int(stats["rows"].sum()),
            "seconds": round(time.time() - t0, 4),
            "fragments": {
                str(b): grp["path"].tolist()
                for b, grp in stats.groupby("bucket")
            },
            # per-bucket row totals: finalize sizes its strategy from
            # these instead of re-parsing every shuffle-file footer
            "fragment_rows": {
                str(b): int(grp["rows"].sum())
                for b, grp in stats.groupby("bucket")
            },
            "input_paths": paths,
            "bucket_fn": BUCKET_FN_VERSION,
            "n_buckets": cfg.n_buckets,
        }
        ledger.commit(unit, payload)
        shard_stats.append(payload)
        docs_processed += payload["docs"]
        triples_written += payload["triples"]
        if (cfg.failpoint_after_shards is not None
                and s + 1 >= cfg.failpoint_after_shards):
            raise RuntimeError(
                f"failpoint: killed after {s + 1} committed shards"
            )
        # kick a background compaction over COMMITTED shards' fragments
        # once enough new fragments accumulated (one pass at a time;
        # per-bucket uncovered counts are ~frags/n_buckets since the
        # bucket sort spreads every task's output over all buckets)
        frags_since_kick += sum(len(p)
                                for p in payload["fragments"].values())
        if (cfg.compact_threshold is not None and cfg.compact_overlap
                and s + 1 < len(shards)
                and frags_since_kick > cfg.compact_threshold * cfg.n_buckets
                and (compact_thread is None
                     or not compact_thread.is_alive())):
            snapshot = _bucket_files_of(shard_stats)
            compact_thread = threading.Thread(
                target=lambda: _run_quietly(_compact_pass, snapshot),
                daemon=True)
            compact_thread.start()
            frags_since_kick = 0

    # -- stage 2: bucket finalize (dedup + materialize) ----------------------
    bucket_files: Dict[int, List[str]] = {b: [] for b in range(cfg.n_buckets)}
    bucket_rows: Dict[int, int] = {b: 0 for b in range(cfg.n_buckets)}
    # rows_est is only trustworthy if EVERY contributing shard carries
    # fragment_rows; a resumed pre-upgrade output dir has shards without
    # it, and a partial sum would undercount — letting an over-
    # streaming_rows bucket take the in-memory path (OOM risk) and
    # undersizing streaming n_chunks. Emit 0 → finalize falls back to
    # _plan_rows (footer metadata).
    rows_known = all("fragment_rows" in st for st in shard_stats)
    for st in shard_stats:
        for b, paths in st["fragments"].items():
            bucket_files[int(b)].extend(paths)
        if rows_known:
            for b, nrows in st["fragment_rows"].items():
                bucket_rows[int(b)] += int(nrows)

    # give any in-flight background compaction a bounded window to
    # land, then proceed regardless: the pre-finalize pass below is
    # authoritative and idempotent, and a hung opportunistic pass (two
    # driver threads driving Ray Data is the known small-CPU starvation
    # regime) must not block the job. Racing is safe — compaction only
    # ADDS run files (originals are never deleted) and finalize reads
    # the explicit path list this thread computes, so a late background
    # ledger commit can't invalidate files already chosen.
    if compact_thread is not None:
        compact_thread.join(timeout=300.0)
        if compact_thread.is_alive():
            import warnings
            warnings.warn("background compaction still running after "
                          "300 s; proceeding with the authoritative "
                          "pre-finalize pass (idempotent)")

    # -- compaction tier: bound fragments-per-bucket before the reduce --------
    if cfg.compact_threshold is not None and any(
            len(paths) > cfg.compact_threshold
            for paths in bucket_files.values()):
        comp_ctrl = rd.from_items([
            {"bucket": b, "paths": paths, "rows_est": bucket_rows[b]}
            for b, paths in bucket_files.items()
        ])
        comp = comp_ctrl.map_batches(
            compact_buckets_kernel,
            fn_kwargs={"out_dir": str(out),
                       "threshold": cfg.compact_threshold,
                       "max_run_rows": cfg.compact_run_rows},
            batch_format="pyarrow", batch_size=1,
            num_cpus=cfg.compact_num_cpus,
        ).to_pandas()   # tiny: one row per bucket
        bucket_files = {int(r.bucket): list(r.paths)
                        for r in comp.itertuples()}

    control = rd.from_items([
        {"bucket": b, "paths": paths, "rows_est": bucket_rows[b]}
        for b, paths in bucket_files.items()
    ])
    fin_kwargs = {
        "out_dir": str(out),
        "salt_chunk_rows": cfg.salt_chunk_rows,
        "write_nt": cfg.write_nt,
        "streaming_rows": cfg.streaming_rows,
    }
    if cfg.finalize_concurrency is None:
        result_ds = control.map_batches(
            finalize_buckets_kernel, fn_kwargs=fin_kwargs,
            batch_format="pyarrow",
            batch_size=1,          # one bucket per call → per-bucket commit
            num_cpus=cfg.finalize_num_cpus,
        )
    else:
        result_ds = control.map_batches(
            BucketFinalizer, fn_constructor_kwargs=fin_kwargs,
            batch_format="pyarrow", batch_size=1,
            concurrency=cfg.finalize_concurrency,
            num_cpus=cfg.finalize_num_cpus,
        )
    result = result_ds.to_pandas()
    _maybe_dump_stats(result_ds, out, "stage2-finalize")

    wall = time.time() - t_start
    final_triples = int(result["rows"].sum())
    job = {
        "input_uri": str(input_uri),
        "out_dir": str(out),
        "n_docs": int(n_docs_total),
        "docs_processed_this_run": int(docs_processed),
        "triples_pre_dedup": int(triples_written),
        "triples_final": final_triples,
        "n_buckets": cfg.n_buckets,
        "wall_seconds": round(wall, 4),
        "docs_per_sec": round(n_docs_total / wall, 2) if wall > 0 else None,
        "triples_per_sec": round(final_triples / wall, 2) if wall > 0 else None,
        "buckets_skipped_resume": int(result["skipped"].sum()),
    }
    ledger.commit("job", job)
    return job


def _wipe_derived_state(out: Path, ledger: CheckpointLedger) -> None:
    """Drop everything derived under the bucket layout: shuffle files,
    compaction runs, finalized buckets, and their checkpoints. The
    input dataset is external and untouched."""
    import shutil

    for sub in ("stage1", "stage1-compact", "final", "_stats"):
        shutil.rmtree(out / sub, ignore_errors=True)
    for prefix in ("stage1-shard-", "compact-bucket-", "stage2-bucket-",
                   "job", "layout"):
        for u in ledger.committed_units(prefix):
            ledger._path(u).unlink(missing_ok=True)


def _run_quietly(fn, *args) -> None:
    """Background-compaction wrapper: a failed opportunistic pass is
    harmless (the pre-finalize pass is authoritative and will redo the
    work), so log and continue instead of killing the job."""
    try:
        fn(*args)
    except Exception as e:  # pragma: no cover - defensive
        import logging
        logging.getLogger(__name__).warning(
            "background compaction pass failed (will retry in the "
            "pre-finalize pass): %s", e)


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(path).metadata.num_rows


def _maybe_dump_stats(ds, out_dir: Path, name: str) -> None:
    """RAY_GRAFT_STATS=1 → write the executed Dataset's per-operator
    ``ds.stats()`` report under ``<out>/_stats/`` (the feedback loop
    the tuning docs reference: wall time must be dominated by the
    extract/finalize compute, not scheduling or IO waits)."""
    import os

    if os.environ.get("RAY_GRAFT_STATS") != "1":
        return
    try:
        d = out_dir / "_stats"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{name}.txt").write_text(ds.stats())
    except Exception:
        pass  # stats are best-effort observability, never fail the job


def read_final_triples(out_dir: str):
    """The finished KG as a Ray Dataset (one parquet per bucket)."""
    import ray.data as rd

    from ..stages.schema import TRIPLES_SCHEMA
    paths = sorted(str(p) for p in Path(out_dir).glob("final/bucket=*/triples.parquet"))
    if not paths:
        raise FileNotFoundError(f"No finalized buckets under {out_dir}")
    # explicit columns: keeps the hive-style bucket= dir name from
    # being inferred as an extra partition column
    return rd.read_parquet(paths, columns=[f.name for f in TRIPLES_SCHEMA])
