"""Deterministic synthetic corpus of interleaved text+media documents.

Schema is the BASELINE.json ``input_hint`` contract::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

Every field is a pure function of (seed, doc rank, span index) via a
splitmix64-style mixer, so generation is shard-independent (the same
doc is identical no matter how the corpus is fragmented), and the
golden triples for any doc are derivable without generating the whole
corpus (FIXTURES.md §1).

Generation rules (FIXTURES.md §1): 1–16 spans/doc, first span always
text, ~20% media spans interleaved; ~70% of text spans carry exactly
one templated entity mention from the closed vocabulary; a skew knob
sends a configurable fraction of docs (default 5%) to one hub entity.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Set, Tuple

import numpy as np
import pyarrow as pa

from ..stages.schema import DOCUMENTS_SCHEMA
from ..store.lance_shim import LanceShim
from . import vocab

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 → uint64."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


class CorpusSpec:
    def __init__(self, n_docs: int, seed: int = 42, n_entities: int = 10_000,
                 hub_pct: int = 5, hub_entity: int = 0):
        self.n_docs = n_docs
        self.seed = seed
        self.n_entities = n_entities
        self.hub_pct = hub_pct
        self.hub_entity = hub_entity

    # -- per-doc derivations (pure) -----------------------------------------
    def _doc_u(self, rank: int, salt: int) -> int:
        return int(_mix(np.array([rank * 1_000_003 + salt * 97 + self.seed],
                                 dtype=np.uint64))[0])

    def n_spans(self, rank: int) -> int:
        return 1 + self._doc_u(rank, 1) % 16

    def is_hub_doc(self, rank: int) -> bool:
        return self._doc_u(rank, 2) % 100 < self.hub_pct

    def span_fields(self, rank: int, j: int) -> Tuple[str, str, str]:
        """(kind, text, media_ref) for span j of doc rank."""
        u = self._doc_u(rank, 1000 + j)
        doc_id = f"doc-{rank:08d}"
        if j > 0 and u % 10 < 2:  # ~20% media spans; first span always text
            kind = ("image", "audio", "video", "table")[(u >> 8) % 4]
            return kind, "", f"media://{doc_id}/{j}"
        if u % 10 < 7 or (j == 0 and self.is_hub_doc(rank)):
            # mention span
            if self.is_hub_doc(rank) and j == 0:
                k = self.hub_entity
            else:
                k = (u >> 16) % self.n_entities
            return "text", vocab.mention_sentence(k), ""
        return "text", f"Filler note {u % 997} with no entities to speak of.", ""

    def doc_rows(self, rank: int) -> List[Tuple[str, str, str, int]]:
        """All spans of one doc as (kind, text, media_ref, offset);
        offsets strictly increasing (cumulative char position)."""
        rows = []
        offset = 0
        for j in range(self.n_spans(rank)):
            kind, text, media_ref = self.span_fields(rank, j)
            rows.append((kind, text, media_ref, offset))
            offset += max(len(text), 1) + 1
        return rows

    def mentioned_entities(self, rank: int) -> List[Tuple[int, int]]:
        """(span_idx, entity_index) for every mention span of the doc —
        the rule-derived golden used by the P/R gate."""
        out = []
        for j in range(self.n_spans(rank)):
            kind, text, _ = self.span_fields(rank, j)
            if kind == "text" and " is a " in text:
                # reverse-lookup is exact: the name prefix is unique
                name = text.split(" is a ")[0]
                k = int(name.rsplit("-", 1)[1])
                out.append((j, k))
        return out

    # -- batch generation ----------------------------------------------------
    def table_for_ranks(self, ranks: range) -> pa.Table:
        doc_ids = []
        spans_col = []
        for r in ranks:
            doc_ids.append(f"doc-{r:08d}")
            spans_col.append([
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in self.doc_rows(r)
            ])
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": spans_col}, schema=DOCUMENTS_SCHEMA
        )


def generate_documents(uri: str, n_docs: int, seed: int = 42,
                       n_entities: int = 10_000, hub_pct: int = 5,
                       fragment_rows: int = 16_384) -> LanceShim:
    """Materialize the corpus as a Lance-shim dataset of parquet
    fragments (idempotent: same args → byte-identical fragments)."""
    spec = CorpusSpec(n_docs, seed=seed, n_entities=n_entities, hub_pct=hub_pct)
    shim = LanceShim(uri)
    shim.create(DOCUMENTS_SCHEMA)
    frags = []
    for start in range(0, n_docs, fragment_rows):
        stop = min(start + fragment_rows, n_docs)
        table = spec.table_for_ranks(range(start, stop))
        frags.append(shim.write_fragment(
            table, f"{start:010d}",
            lineage={"rank_start": start, "rank_stop": stop, "seed": seed},
        ))
    shim.commit(frags, DOCUMENTS_SCHEMA,
                extra={"spec": {"n_docs": n_docs, "seed": seed,
                                "n_entities": n_entities, "hub_pct": hub_pct}})
    return shim


# --------------------------------------------------------------------------
# Rule-derived golden triples (decomposed columnar form)
# --------------------------------------------------------------------------

ColumnarTriple = Tuple[str, str, str, str, Optional[str], Optional[str]]


def golden_triples_for_doc(spec: CorpusSpec, rank: int) -> Set[ColumnarTriple]:
    """The exact triple set the pipeline must emit for one document
    (deterministic skolemization ⇒ plain set comparison stands in for
    graph isomorphism; SURVEY.md §5)."""
    doc_id = f"doc-{rank:08d}"
    doc_node = f"urn:skolem:{doc_id}:doc"
    out: Set[ColumnarTriple] = set()
    rows = spec.doc_rows(rank)
    for j, (kind, text, media_ref, offset) in enumerate(rows):
        span_node = f"urn:skolem:{doc_id}:s{j}"
        out.add((doc_node, vocab.SDO + "hasPart", "iri", span_node, None, None))
        out.add((span_node, vocab.RDF_TYPE, "iri", vocab.SPAN_CLASSES[kind],
                 None, None))
        out.add((span_node, vocab.SDO + "position", "literal", str(offset),
                 vocab.XSD_INTEGER, None))
        if media_ref:
            out.add((span_node, vocab.SDO + "contentUrl", "literal", media_ref,
                     vocab.XSD_ANYURI, None))
        if text:
            out.add((span_node, vocab.SDO + "text", "literal", text, None, None))
    for j, k in spec.mentioned_entities(rank):
        a = vocab.person_attrs(k)
        out.add((doc_node, vocab.SDO + "mentions", "iri", a["iri"], None, None))
        for t in vocab.entity_triples(k):
            out.add(t)
    return out


def generate_documents_ray(uri: str, n_docs: int, seed: int = 42,
                           n_entities: int = 10_000, hub_pct: int = 5,
                           fragment_rows: int = 16_384) -> LanceShim:
    """Ray-parallel corpus generation: one task per fragment (each
    fragment is a pure function of (seed, rank range), so parallel
    generation is byte-identical to the sequential path)."""
    import pyarrow as pa
    import ray.data as rd

    spec_args = dict(n_docs=n_docs, seed=seed, n_entities=n_entities,
                     hub_pct=hub_pct)
    shim = LanceShim(uri)
    shim.create(DOCUMENTS_SCHEMA)

    ranges = [(start, min(start + fragment_rows, n_docs))
              for start in range(0, n_docs, fragment_rows)]

    def gen_fragment(batch: "pa.Table") -> "pa.Table":
        import json
        spec = CorpusSpec(**spec_args)
        entries = []
        for start, stop in zip(batch.column("start").to_pylist(),
                               batch.column("stop").to_pylist()):
            table = spec.table_for_ranks(range(start, stop))
            entry = shim.write_fragment(
                table, f"{start:010d}",
                lineage={"rank_start": start, "rank_stop": stop, "seed": seed})
            entries.append(json.dumps(entry))
        return pa.table({"entry": pa.array(entries, pa.string())})

    import json
    ds = rd.from_items([{"start": a, "stop": b} for a, b in ranges])
    out = ds.map_batches(gen_fragment, batch_format="pyarrow", batch_size=1)
    frags = [json.loads(r["entry"]) for r in out.take_all()]
    frags.sort(key=lambda e: e["path"])
    shim.commit(frags, DOCUMENTS_SCHEMA,
                extra={"spec": {"n_docs": n_docs, "seed": seed,
                                "n_entities": n_entities, "hub_pct": hub_pct}})
    return shim


def extend_documents(uri: str, n_total: int, seed: int = 42,
                     n_entities: int = 10_000, hub_pct: int = 5,
                     fragment_rows: int = 16_384) -> LanceShim:
    """Append documents up to rank n_total as NEW fragments and commit
    a new dataset version (existing fragments untouched — incremental
    ingest; downstream shard checkpoints for old fragments stay valid,
    bucket finalizes recompute only where their input set grew)."""
    shim = LanceShim(uri)
    m = shim.latest_manifest()
    if m is None:
        return generate_documents(uri, n_total, seed=seed,
                                  n_entities=n_entities, hub_pct=hub_pct,
                                  fragment_rows=fragment_rows)
    n_existing = m["rows"]
    if n_total <= n_existing:
        return shim
    spec = CorpusSpec(n_total, seed=seed, n_entities=n_entities,
                      hub_pct=hub_pct)
    frags = list(m["fragments"])
    for start in range(n_existing, n_total, fragment_rows):
        stop = min(start + fragment_rows, n_total)
        table = spec.table_for_ranks(range(start, stop))
        frags.append(shim.write_fragment(
            table, f"{start:010d}",
            lineage={"rank_start": start, "rank_stop": stop, "seed": seed}))
    frags.sort(key=lambda e: e["path"])
    shim.commit(frags, DOCUMENTS_SCHEMA,
                extra={"spec": {"n_docs": n_total, "seed": seed,
                                "n_entities": n_entities,
                                "hub_pct": hub_pct}})
    return shim
