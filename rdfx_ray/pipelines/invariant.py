"""Span-sequence invariant: reconstruct (kind, text, media_ref, order)
per document from the OUTPUT graph and compare with the input
(BASELINE.json input_hint per-row invariant).

Works because every span becomes a skolem node
``urn:skolem:{doc_id}:s{j}`` carrying rdf:type (kind), sdo:text,
sdo:contentUrl (media_ref) and sdo:position (offset), and all triples
of one span node share its subject-hash bucket — so reconstruction is
bucket-local (no shuffle)."""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import pyarrow as pa

from ..sources import vocab

_SPAN_NODE = re.compile(r"^urn:skolem:(doc-\d{8}):s(\d+)$")
_CLASS_TO_KIND = {v: k for k, v in vocab.SPAN_CLASSES.items()}

SpanTuple = Tuple[str, str, str, int]  # kind, text, media_ref, offset


def accumulate_span_slots(batch: pa.Table,
                          acc: Dict[Tuple[str, int], Dict[str, object]]
                          ) -> None:
    """Fold one triple batch into the raw slot accumulator keyed by
    (doc_id, span_idx). A span node's triples may straddle batch
    boundaries, so tuples must only be built AFTER all batches are
    folded — finalizing per batch yields two partial entries for a
    straddling node (a false invariant failure on a correct graph)."""
    subj = batch.column("subj").to_pylist()
    pred = batch.column("pred").to_pylist()
    obj_value = batch.column("obj_value").to_pylist()
    for s, p, v in zip(subj, pred, obj_value):
        m = _SPAN_NODE.match(s)
        if not m:
            continue
        key = (m.group(1), int(m.group(2)))
        slot = acc.setdefault(key, {"kind": None, "text": "", "media_ref": "",
                                    "offset": None})
        if p == vocab.RDF_TYPE:
            slot["kind"] = _CLASS_TO_KIND.get(v, v)
        elif p == vocab.SDO + "text":
            slot["text"] = v
        elif p == vocab.SDO + "contentUrl":
            slot["media_ref"] = v
        elif p == vocab.SDO + "position":
            slot["offset"] = int(v)


def finalize_span_slots(acc: Dict[Tuple[str, int], Dict[str, object]]
                        ) -> Dict[str, List[Tuple[int, SpanTuple]]]:
    """Slot accumulator → doc_id → [(span_idx, span tuple)]."""
    out: Dict[str, List[Tuple[int, SpanTuple]]] = {}
    for (doc_id, j), slot in acc.items():
        out.setdefault(doc_id, []).append(
            (j, (slot["kind"], slot["text"], slot["media_ref"], slot["offset"]))
        )
    return out


def spans_from_triples(batch: pa.Table) -> Dict[str, List[Tuple[int, SpanTuple]]]:
    """Rebuild span rows from ONE self-contained triple table (single
    batch — see accumulate/finalize pair for the streaming form)."""
    acc: Dict[Tuple[str, int], Dict[str, object]] = {}
    accumulate_span_slots(batch, acc)
    return finalize_span_slots(acc)


def check_span_invariant(out_dir: str, input_uri: str) -> Dict[str, int]:
    """Compare reconstructed span sequences against the input table.
    Streams both sides; returns counts. Raises AssertionError on the
    first mismatching document.

    Scale note: the reconstruction accumulator is driver-side (fits to
    ~10^7 docs); at full scale the same comparison runs bucketed — the
    span-node subject hash co-locates each doc's span triples, so the
    check shards by doc_id range with no shuffle."""
    import ray.data as rd

    from ..store.lance_shim import LanceShim

    # reconstruct from output (bucket-parallel)
    from .kg import read_final_triples

    slots: Dict[Tuple[str, int], Dict[str, object]] = {}
    for batch in read_final_triples(out_dir).iter_batches(
            batch_size=200_000, batch_format="pyarrow"):
        accumulate_span_slots(batch, slots)
    recon = finalize_span_slots(slots)

    checked = 0
    for batch in rd.read_parquet(LanceShim(input_uri).fragment_paths()) \
                   .iter_batches(batch_size=4096, batch_format="pyarrow"):
        doc_ids = batch.column("doc_id").to_pylist()
        spans = batch.column("spans").to_pylist()
        for doc_id, row_spans in zip(doc_ids, spans):
            got = sorted(recon.get(doc_id, []))
            want = [
                (j, (sp["kind"], sp["text"], sp["media_ref"], sp["offset"]))
                for j, sp in enumerate(row_spans)
            ]
            assert got == want, (
                f"span invariant violated for {doc_id}:\n got {got}\nwant {want}"
            )
            checked += 1
    return {"docs_checked": checked}
