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
from .canonicalize import IriCanonicalizer, skolemize
from .schema import TRIPLES_SCHEMA

# name shape of the closed vocabulary: "First Last-00042"
MENTION_RE = r"[A-Z][a-z]+ [A-Z][a-zA-Z]+-\d{5}"


EXTRACT_OUTPUT_SCHEMA = TRIPLES_SCHEMA.append(pa.field("bucket", pa.int32()))


def subject_bucket(subjects: pd.Series, n_buckets: int) -> np.ndarray:
    """Deterministic subject-hash partition (stable across processes —
    pandas' siphash with its fixed default key)."""
    h = pd.util.hash_pandas_object(subjects, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int32)


def graph_iri_for_bucket(bucket: np.ndarray) -> np.ndarray:
    return np.char.add(
        "urn:graph:bucket-",
        np.char.zfill(bucket.astype("U4"), 4),
    )


class ExtractLink:
    """Callable class for ``map_batches(..., concurrency=N)``.

    ``__init__`` runs once per actor: builds/loads the alias index
    (pass ``alias_ref`` from ``ray.put`` to broadcast a prebuilt dict;
    otherwise derived from the deterministic vocabulary), compiles the
    mention regex, and constructs the canonicalizer.
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
    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):  # pragma: no cover
            spans = spans.combine_chunks()
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

        doc_id_np = doc_ids.to_numpy(zero_copy_only=False)
        doc_rank_np = pc.cast(
            pc.utf8_slice_codeunits(doc_ids, 4, 32), pa.int64()
        ).to_numpy(zero_copy_only=False)

        doc_id_span = doc_id_np[parent]
        doc_rank_span = doc_rank_np[parent]
        doc_node_span = np.array(
            ["urn:skolem:" + d + ":doc" for d in doc_id_span], dtype=object
        )
        span_node = np.array(
            [skolemize(d, f"s{j}") for d, j in zip(doc_id_span, span_j)],
            dtype=object,
        )

        cols = {k: [] for k in ("subj", "pred", "obj_kind", "obj_value",
                                "obj_datatype", "obj_lang", "doc_rank",
                                "span_idx")}

        def emit(subj, pred, obj_kind, obj_value, dt, lang, rank, j):
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj_kind"].append(obj_kind)
            cols["obj_value"].append(obj_value)
            cols["obj_datatype"].append(dt)
            cols["obj_lang"].append(lang)
            cols["doc_rank"].append(rank)
            cols["span_idx"].append(j)

        def emit_arrays(subj, pred, obj_kind, obj_value, dt, lang, rank, j):
            n = len(subj)
            cols["subj"].extend(subj)
            cols["pred"].extend([pred] * n if isinstance(pred, str) else pred)
            cols["obj_kind"].extend([obj_kind] * n)
            cols["obj_value"].extend(obj_value)
            cols["obj_datatype"].extend([dt] * n if not isinstance(dt, (list, np.ndarray)) else dt)
            cols["obj_lang"].extend([lang] * n)
            cols["doc_rank"].extend(rank)
            cols["span_idx"].extend(j)

        SDO = vocab.SDO
        # structure triples for every span (vectorized assembly)
        emit_arrays(doc_node_span, SDO + "hasPart", "iri", span_node,
                    None, None, doc_rank_span, span_j)
        emit_arrays(span_node, vocab.RDF_TYPE, "iri",
                    [vocab.SPAN_CLASSES[k] for k in kind],
                    None, None, doc_rank_span, span_j)
        emit_arrays(span_node, SDO + "position", "literal",
                    offset.astype("U12").tolist(),
                    vocab.XSD_INTEGER, None, doc_rank_span, span_j)
        is_media = media_ref != ""
        if is_media.any():
            mi = np.nonzero(is_media)[0]
            emit_arrays(span_node[mi], SDO + "contentUrl", "literal",
                        media_ref[mi].tolist(), vocab.XSD_ANYURI, None,
                        doc_rank_span[mi], span_j[mi])
        # text spans re-emit their text as sdo:text literals so the
        # full span invariant (kind, text, media_ref, order) is
        # reconstructible from the output graph alone — no passthrough
        # copy of the input needed at scale
        has_text = text != ""
        if has_text.any():
            xi = np.nonzero(has_text)[0]
            emit_arrays(span_node[xi], SDO + "text", "literal",
                        text[xi].tolist(), None, None,
                        doc_rank_span[xi], span_j[xi])

        # mention detection + linking (regex over text spans; alias dict
        # lookup; entity attribute triples emitted once per batch)
        findall = self.mention_re.findall
        alias = self.alias
        seen_entities = {}
        mention_edges = set()
        ti = np.nonzero(kind == "text")[0]
        for i in ti:
            t = text[i]
            if not t:
                continue
            for name in findall(t):
                k = alias.get(name)
                if k is None:
                    continue
                edge = (doc_node_span[i], k)
                if edge not in mention_edges:
                    mention_edges.add(edge)
                    emit(doc_node_span[i], SDO + "mentions", "iri",
                         vocab.person_iri(k), None, None,
                         int(doc_rank_span[i]), int(span_j[i]))
                if k not in seen_entities:
                    seen_entities[k] = (int(doc_rank_span[i]), int(span_j[i]))
        for k, (rank, j) in seen_entities.items():
            for (s, p, ok, ov, dt, lg) in self._entity_triples(k):
                emit(s, p, ok, ov, dt, lg, rank, j)

        subj_series = pd.Series(cols["subj"], dtype="object")
        bucket = subject_bucket(subj_series, self.n_buckets)
        out = pa.table({
            "subj": pa.array(cols["subj"], pa.string()),
            "pred": pa.array(cols["pred"], pa.string()),
            "obj_kind": pa.array(cols["obj_kind"], pa.string()),
            "obj_value": pa.array(cols["obj_value"], pa.string()),
            "obj_datatype": pa.array(cols["obj_datatype"], pa.string()),
            "obj_lang": pa.array(cols["obj_lang"], pa.string()),
            "graph_iri": pa.array(graph_iri_for_bucket(bucket).tolist(), pa.string()),
            "doc_rank": pa.array(cols["doc_rank"], pa.int64()),
            "span_idx": pa.array(cols["span_idx"], pa.int32()),
            "bucket": pa.array(bucket, pa.int32()),
        })
        # local (within-batch) exact dedup — the partial-aggregation
        # pattern: collapses per-doc repeats before the shuffle
        import polars as pl
        df = pl.from_arrow(out)
        df = df.sort(["doc_rank", "span_idx"]).unique(
            subset=["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
                    "obj_lang"],
            keep="first", maintain_order=True)
        return df.to_arrow().cast(EXTRACT_OUTPUT_SCHEMA)
