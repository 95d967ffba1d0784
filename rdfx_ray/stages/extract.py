"""Extraction + entity-linking stage: interleaved documents → triples.

One actor-pool ``map_batches`` stage (callable class, state built once
per actor in ``__init__``): mention detection (compiled regex),
entity linking (broadcast alias dictionary), IRI canonicalization and
skolemization compose in a single pass so the hot path pays exactly
one batch traversal and no intermediate exchange (SURVEY.md §7 steps
4-5; generalizes the reference's parse step, rdfx/rdfx_cli.py:70).

Input batch (pyarrow, zero-copy): doc_id: string, spans:
list<struct<kind,text,media_ref,offset>>. Output: TRIPLES_SCHEMA plus
a ``bucket`` column (hash(subj) % n_buckets) that drives the
partitioned shuffle-by-write.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources import vocab
from .canonicalize import IriCanonicalizer
from .schema import TRIPLES_SCHEMA

# name shape of the closed vocabulary: "First Last-00042"
MENTION_RE = r"[A-Z][a-z]+ [A-Z][a-zA-Z]+-\d{5}"


EXTRACT_OUTPUT_SCHEMA = TRIPLES_SCHEMA.append(pa.field("bucket", pa.int32()))

# triple columns before partition assignment (bucket/graph added after
# the local dedup so the hash runs over fewer rows)
_FAMILY_SCHEMA = pa.schema([
    pa.field("subj", pa.string()),
    pa.field("pred", pa.string()),
    pa.field("obj_kind", pa.string()),
    pa.field("obj_value", pa.string()),
    pa.field("obj_datatype", pa.string()),
    pa.field("obj_lang", pa.string()),
    pa.field("doc_rank", pa.int64()),
    pa.field("span_idx", pa.int32()),
])


def subject_bucket(subjects: pd.Series, n_buckets: int) -> np.ndarray:
    """Deterministic subject-hash partition (stable across processes —
    pandas' siphash with its fixed default key)."""
    h = pd.util.hash_pandas_object(subjects, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int32)


def graph_iri_for_bucket(bucket: np.ndarray,
                         n_buckets: Optional[int] = None) -> np.ndarray:
    """bucket ids → graph IRIs via a tiny lookup table (only
    n_buckets distinct strings — formatting per row was a measured
    hotspot)."""
    n = n_buckets if n_buckets is not None else (int(bucket.max()) + 1 if
                                                 len(bucket) else 1)
    lut = np.array([f"urn:graph:bucket-{b:04d}" for b in range(n)])
    return lut[bucket]


class ExtractLink:
    """The extract+link kernel. Usable two ways:

    - as a stateless task fn via :func:`extract_link_kernel` (the
      default in the pipeline — elastic, no CPU reservation, state
      amortized through Ray's worker-process reuse), or
    - as an actor-pool class via ``map_batches(ExtractLink,
      fn_constructor_kwargs=..., concurrency=N)`` when explicit pool
      sizing is wanted.

    ``__init__`` runs once per actor/process: builds/loads the alias
    index (pass ``alias_ref`` from ``ray.put`` to broadcast a prebuilt
    dict; otherwise derived from the deterministic vocabulary),
    compiles the mention regex, and constructs the canonicalizer.
    """

    def __init__(self, n_entities: int = 10_000, n_buckets: int = 32,
                 alias_ref=None,
                 prefixes: Optional[Dict[str, str]] = None):
        if alias_ref is not None:
            import ray
            self.alias: Dict[str, int] = ray.get(alias_ref)
        else:
            self.alias = vocab.build_alias_index(n_entities)
        self.n_buckets = n_buckets
        self.mention_re = re.compile(MENTION_RE)
        self.canon = IriCanonicalizer(prefixes=prefixes)
        self._entity_cache: Dict[int, List] = {}

    # -- helpers -------------------------------------------------------------
    def _entity_triples(self, k: int) -> List:
        t = self._entity_cache.get(k)
        if t is None:
            t = [
                (self.canon.canonicalize(s) if ok == "iri" else s, p, ok, ov, dt, lg)
                for (s, p, ok, ov, dt, lg) in vocab.entity_triples(k)
            ]
            # canonicalize IRI objects too
            t = [
                (s, self.canon.canonicalize(p), ok,
                 self.canon.canonicalize(ov) if ok == "iri" else ov, dt, lg)
                for (s, p, ok, ov, dt, lg) in t
            ]
            self._entity_cache[k] = t
        return t

    # -- batch kernel --------------------------------------------------------
    @staticmethod
    def _family(subj, pred, obj_kind, obj_value, obj_datatype, rank, j):
        """One triple family as an Arrow table built straight from
        numpy arrays — no per-row Python objects in the hot path."""
        n = len(subj)
        dt_col = (pa.nulls(n, pa.string()) if obj_datatype is None
                  else pa.array(np.full(n, obj_datatype)))
        return pa.table({
            "subj": pa.array(subj),
            "pred": pa.array(np.full(n, pred)),
            "obj_kind": pa.array(np.full(n, obj_kind)),
            "obj_value": pa.array(obj_value),
            "obj_datatype": dt_col,
            "obj_lang": pa.nulls(n, pa.string()),
            "doc_rank": pa.array(rank, pa.int64()),
            "span_idx": pa.array(j, pa.int32()),
        }).cast(_FAMILY_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        doc_ids = batch.column("doc_id").combine_chunks()
        n_docs = len(doc_ids)

        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        flat = spans.flatten()
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        text = flat.field("text").to_numpy(zero_copy_only=False)
        media_ref = flat.field("media_ref").to_numpy(zero_copy_only=False)
        offset = flat.field("offset").to_numpy(zero_copy_only=False)

        sizes = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(sizes[:-1], out=starts[1:] if n_docs > 1 else starts[:0])
        span_j = (np.arange(len(parent)) - np.repeat(starts, sizes)).astype(np.int32)

        doc_rank_np = pc.cast(
            pc.utf8_slice_codeunits(doc_ids, 4, 32), pa.int64()
        ).to_numpy(zero_copy_only=False)

        # vectorized skolem-IRI assembly — arrow C kernels (np.char's
        # _vec_string was a measured hotspot)
        doc_rank_span = doc_rank_np[parent]
        parent_idx = pa.array(parent)
        doc_id_span_arr = pc.take(doc_ids, parent_idx)
        doc_node_span = pc.binary_join_element_wise(
            "urn:skolem:", doc_id_span_arr, ":doc", "").to_numpy(
                zero_copy_only=False)
        span_node = pc.binary_join_element_wise(
            "urn:skolem:", doc_id_span_arr, ":s",
            pc.cast(pa.array(span_j), pa.string()), "").to_numpy(
                zero_copy_only=False)

        kind_class = np.select(
            [kind == k for k in vocab.SPAN_CLASSES],
            [np.str_(v) for v in vocab.SPAN_CLASSES.values()],
            default="",
        )

        SDO = vocab.SDO
        families = [
            self._family(doc_node_span, SDO + "hasPart", "iri", span_node,
                         None, doc_rank_span, span_j),
            self._family(span_node, vocab.RDF_TYPE, "iri", kind_class,
                         None, doc_rank_span, span_j),
            self._family(span_node, SDO + "position", "literal",
                         offset.astype("U12"), vocab.XSD_INTEGER,
                         doc_rank_span, span_j),
        ]
        is_media = media_ref != ""
        if is_media.any():
            mi = np.nonzero(is_media)[0]
            families.append(self._family(
                span_node[mi], SDO + "contentUrl", "literal", media_ref[mi],
                vocab.XSD_ANYURI, doc_rank_span[mi], span_j[mi]))
        # text spans re-emit their text as sdo:text literals so the
        # full span invariant (kind, text, media_ref, order) is
        # reconstructible from the output graph alone — no passthrough
        # copy of the input needed at scale
        has_text = text != ""
        if has_text.any():
            xi = np.nonzero(has_text)[0]
            families.append(self._family(
                span_node[xi], SDO + "text", "literal", text[xi],
                None, doc_rank_span[xi], span_j[xi]))

        # mention detection + linking (regex over text spans; alias dict
        # lookup; entity attribute triples emitted once per batch)
        findall = self.mention_re.findall
        alias = self.alias
        seen_entities: Dict[int, tuple] = {}
        mention_edges = set()
        rows = {k: [] for k in ("subj", "pred", "obj_kind", "obj_value",
                                "obj_datatype", "obj_lang", "doc_rank",
                                "span_idx")}

        def emit(s, p, ok, ov, dt, lg, rank, j):
            rows["subj"].append(s)
            rows["pred"].append(p)
            rows["obj_kind"].append(ok)
            rows["obj_value"].append(ov)
            rows["obj_datatype"].append(dt)
            rows["obj_lang"].append(lg)
            rows["doc_rank"].append(rank)
            rows["span_idx"].append(j)

        ti = np.nonzero(kind == "text")[0]
        for i in ti:
            t = text[i]
            if not t:
                continue
            for name in findall(t):
                k = alias.get(name)
                if k is None:
                    continue
                edge = (doc_rank_span[i], k)
                if edge not in mention_edges:
                    mention_edges.add(edge)
                    emit(str(doc_node_span[i]), SDO + "mentions", "iri",
                         vocab.person_iri(k), None, None,
                         int(doc_rank_span[i]), int(span_j[i]))
                if k not in seen_entities:
                    seen_entities[k] = (int(doc_rank_span[i]), int(span_j[i]))
        for k, (rank, j) in seen_entities.items():
            for (s, p, ok, ov, dt, lg) in self._entity_triples(k):
                emit(s, p, ok, ov, dt, lg, rank, j)

        if rows["subj"]:
            families.append(pa.table({
                "subj": pa.array(rows["subj"], pa.string()),
                "pred": pa.array(rows["pred"], pa.string()),
                "obj_kind": pa.array(rows["obj_kind"], pa.string()),
                "obj_value": pa.array(rows["obj_value"], pa.string()),
                "obj_datatype": pa.array(rows["obj_datatype"], pa.string()),
                "obj_lang": pa.array(rows["obj_lang"], pa.string()),
                "doc_rank": pa.array(rows["doc_rank"], pa.int64()),
                "span_idx": pa.array(rows["span_idx"], pa.int32()),
            }).cast(_FAMILY_SCHEMA))

        out = pa.concat_tables(families)

        # local (within-batch) exact dedup first (smaller hash input) —
        # the partial-aggregation pattern: collapses per-doc repeats
        # before the shuffle
        import polars as pl
        df = pl.from_arrow(out)
        df = df.sort(["doc_rank", "span_idx"]).unique(
            subset=["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
                    "obj_lang"],
            keep="first", maintain_order=True)
        out = df.to_arrow().cast(_FAMILY_SCHEMA)

        bucket = subject_bucket(out.column("subj").to_pandas(), self.n_buckets)
        out = out.append_column(
            "graph_iri", pa.array(graph_iri_for_bucket(bucket, self.n_buckets))
        ).append_column("bucket", pa.array(bucket, pa.int32()))
        return out.select([f.name for f in EXTRACT_OUTPUT_SCHEMA]).cast(
            EXTRACT_OUTPUT_SCHEMA)


_KERNEL_CACHE: Dict[tuple, ExtractLink] = {}


def extract_link_kernel(batch: pa.Table, *, n_entities: int = 10_000,
                        n_buckets: int = 32, alias_ref=None,
                        prefixes=None) -> pa.Table:
    """Stateless-task wrapper: one ExtractLink instance per worker
    process (keyed by config), so tasks stay elastic while the alias
    dict / regex / entity cache amortize like actor state."""
    key = (n_entities, n_buckets,
           alias_ref.hex() if alias_ref is not None else None)
    inst = _KERNEL_CACHE.get(key)
    if inst is None:
        _KERNEL_CACHE.clear()
        inst = ExtractLink(n_entities=n_entities, n_buckets=n_buckets,
                           alias_ref=alias_ref, prefixes=prefixes)
        _KERNEL_CACHE[key] = inst
    return inst(batch)
