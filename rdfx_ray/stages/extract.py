"""Extraction + entity-linking stage: interleaved documents → triples.

One actor-pool ``map_batches`` stage (callable class, state built once
per actor in ``__init__``): mention detection (compiled regex),
entity linking (broadcast alias dictionary), IRI canonicalization and
skolemization compose in a single pass so the hot path pays exactly
one batch traversal and no intermediate exchange (SURVEY.md §7 steps
4-5; generalizes the reference's parse step, rdfx/rdfx_cli.py:70).

Input batch (pyarrow, zero-copy): doc_id: string, spans:
list<struct<kind,text,media_ref,offset>>. Output:
STAGE1_TRIPLES_SCHEMA (graph_iri deliberately absent — it is
bucket-determined and re-attached at finalize) plus a ``bucket``
column (hash(subj) % n_buckets) that drives the partitioned
shuffle-by-write.
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
from .schema import STAGE1_TRIPLES_SCHEMA

# name shape of the closed vocabulary: "First Last-00042"
MENTION_RE = r"[A-Z][a-z]+ [A-Z][a-zA-Z]+-\d{5}"


EXTRACT_OUTPUT_SCHEMA = STAGE1_TRIPLES_SCHEMA.append(pa.field("bucket", pa.int32()))

# triple columns before partition assignment. pred/obj_kind/
# obj_datatype are dictionary-encoded (schema.py note): families are
# constant in these columns, so they're built as zero-index dictionary
# arrays — no n-row string materialization in the hot kernel.
_DICT = pa.dictionary(pa.int32(), pa.string())
_FAMILY_SCHEMA = pa.schema([
    pa.field("subj", pa.string()),
    pa.field("pred", _DICT),
    pa.field("obj_kind", _DICT),
    pa.field("obj_value", pa.string()),
    pa.field("obj_datatype", _DICT),
    pa.field("obj_lang", pa.string()),
    pa.field("doc_rank", pa.int64()),
    pa.field("span_idx", pa.int32()),
])


def subject_bucket(subjects: pd.Series, n_buckets: int) -> np.ndarray:
    """Deterministic subject-STRING hash partition (stable across
    processes — pandas' siphash with its fixed default key). Kept for
    external callers / arbitrary subjects; the extract kernel itself
    derives buckets from numeric subject ids (:func:`_mix64` below),
    which is ~30 ms/batch cheaper than hashing ~200k strings."""
    h = pd.util.hash_pandas_object(subjects, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int32)


# Version marker for the bucket-assignment function, recorded in every
# stage-1 shard manifest: resuming an output dir whose shards were
# bucketed by a DIFFERENT function must recompute them — mixing two
# bucket layouts would scatter copies of one triple across buckets and
# stage-2's per-bucket dedup would silently miss them.
BUCKET_FN_VERSION = "sid-mix64-v3"


def _mix64(u: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 subject ids — a high-quality
    vectorized mix so bucket loads stay uniform even though span ids
    are sequential."""
    u = u + np.uint64(0x9E3779B97F4A7C15)
    u = (u ^ (u >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    u = (u ^ (u >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return u ^ (u >> np.uint64(31))


# Numeric subject identity: every subject IRI this kernel emits is a
# bijective rendering of (doc_rank), (doc_rank, span_j) or (entity k),
# so bucket-by-sid IS bucket-by-subject-string — identical triples
# still colocate, with zero string hashing.
#   span node: rank << 21 | j << 1      (even low bit; j < 2^20)
#   doc node:  rank << 21 | 1           (odd low bit)
#   entity:    1 << 62 | k
def _sid_span(rank: np.ndarray, j: np.ndarray) -> np.ndarray:
    return ((rank.astype(np.uint64) << np.uint64(21))
            | (j.astype(np.uint64) << np.uint64(1)))


def _sid_doc(rank: np.ndarray) -> np.ndarray:
    return (rank.astype(np.uint64) << np.uint64(21)) | np.uint64(1)


def _sid_entity(k: np.ndarray) -> np.ndarray:
    return (np.uint64(1) << np.uint64(62)) | k.astype(np.uint64)


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
        self.n_entities = n_entities
        self.n_buckets = n_buckets
        self.mention_re = re.compile(MENTION_RE)
        self.canon = IriCanonicalizer(prefixes=prefixes)
        self._entity_cache: Dict[int, List] = {}
        self._person_lut: Optional[np.ndarray] = None
        self._ent_cols: Optional[pa.Table] = None
        self._alias_pl = None

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

    _ENT_ROWS = 5  # entity_triples emits exactly 5 rows per entity

    def _entity_table(self) -> pa.Table:
        """Arrow table of ALL entities' attribute triples (5 rows per
        entity, contiguous), pred/obj_kind/obj_datatype pre-dictionary-
        encoded — built once per process so per-batch emission is one
        Arrow ``take`` (dictionary columns take by index: no string
        movement)."""
        if self._ent_cols is None:
            cols = {c: [] for c in ("subj", "pred", "obj_kind",
                                    "obj_value", "obj_datatype")}
            for k in range(self.n_entities):
                rows = self._entity_triples(k)
                assert len(rows) == self._ENT_ROWS
                for (s, p, ok, ov, dt, lg) in rows:
                    cols["subj"].append(s)
                    cols["pred"].append(p)
                    cols["obj_kind"].append(ok)
                    cols["obj_value"].append(ov)
                    cols["obj_datatype"].append(dt)
            self._ent_cols = pa.table({
                "subj": pa.array(cols["subj"], pa.string()),
                "pred": pa.array(cols["pred"], pa.string())
                         .dictionary_encode().cast(_DICT),
                "obj_kind": pa.array(cols["obj_kind"], pa.string())
                             .dictionary_encode().cast(_DICT),
                "obj_value": pa.array(cols["obj_value"], pa.string()),
                "obj_datatype": pa.array(cols["obj_datatype"], pa.string())
                                 .dictionary_encode().cast(_DICT),
            })
        return self._ent_cols

    def _person_iris(self) -> np.ndarray:
        if self._person_lut is None:
            self._person_lut = np.array(
                [vocab.person_iri(k) for k in range(self.n_entities)],
                dtype=object)
        return self._person_lut

    def _alias_series(self):
        """The alias dict as a cached (names, ks) polars series pair —
        the vectorized lookup table for replace_strict (built once per
        actor/process, not per batch)."""
        if self._alias_pl is None:
            import polars as pl
            self._alias_pl = (
                pl.Series("name", list(self.alias.keys()), dtype=pl.String),
                pl.Series("k", list(self.alias.values()), dtype=pl.Int64),
            )
        return self._alias_pl

    # -- batch kernel --------------------------------------------------------
    @staticmethod
    def _const_dict(n: int, value: Optional[str]) -> pa.DictionaryArray:
        """A length-n dictionary column holding one constant value (or
        all nulls): a zeros int32 index buffer + a 1-entry dictionary —
        O(4·n) bytes instead of materializing n string copies."""
        if value is None:
            return pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, np.int32),
                         mask=np.ones(n, bool)),
                pa.array([""], pa.string()))
        return pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(n, np.int32)), pa.array([value], pa.string()))

    @classmethod
    def _family(cls, subj, pred, obj_kind, obj_value, obj_datatype, rank, j):
        """One triple family as an Arrow table built straight from
        numpy arrays — no per-row Python objects in the hot path;
        constant columns are zero-index dictionary arrays."""
        n = len(subj)
        return pa.table({
            "subj": pa.array(subj),
            "pred": cls._const_dict(n, pred),
            "obj_kind": cls._const_dict(n, obj_kind),
            "obj_value": pa.array(obj_value),
            "obj_datatype": cls._const_dict(n, obj_datatype),
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

        # kind masks via Arrow C kernels (object-dtype == is a Python
        # loop per element); masks reused for media/text selection too
        kind_arr = flat.field("kind")
        kind_masks = {k: pc.equal(kind_arr, k).to_numpy(zero_copy_only=False)
                      for k in vocab.SPAN_CLASSES}
        kind_class = np.select(
            list(kind_masks.values()),
            [np.str_(v) for v in vocab.SPAN_CLASSES.values()],
            default="",
        )

        SDO = vocab.SDO
        sid_span = _sid_span(doc_rank_span, span_j)
        sid_doc = _sid_doc(doc_rank_span)
        families = [
            self._family(doc_node_span, SDO + "hasPart", "iri", span_node,
                         None, doc_rank_span, span_j),
            self._family(span_node, vocab.RDF_TYPE, "iri", kind_class,
                         None, doc_rank_span, span_j),
            self._family(span_node, SDO + "position", "literal",
                         offset.astype("U12"), vocab.XSD_INTEGER,
                         doc_rank_span, span_j),
        ]
        # numeric subject ids, one array per family, same order —
        # bucket assignment happens once over the concatenation below
        sids = [sid_doc, sid_span, sid_span]
        is_media = media_ref != ""
        if is_media.any():
            mi = np.nonzero(is_media)[0]
            families.append(self._family(
                span_node[mi], SDO + "contentUrl", "literal", media_ref[mi],
                vocab.XSD_ANYURI, doc_rank_span[mi], span_j[mi]))
            sids.append(sid_span[mi])
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
            sids.append(sid_span[xi])

        # mention detection + linking: vectorized end-to-end — polars'
        # Rust regex extracts ALL matches per text span (extract_all),
        # the explode keeps (row-major, in-match-order) global order
        # (identical to the old single-big-string scan order, so the
        # keep-first dedups below are unchanged), and alias linking is
        # one vectorized replace_strict against the cached name→k
        # series. No per-match Python.
        ti = np.nonzero(kind_masks["text"])[0]
        n_matches = 0
        if len(ti):
            import polars as pl
            s = pl.Series("t", text[ti]).fill_null("")
            dfm_pl = (pl.DataFrame({
                "row": np.arange(len(ti), dtype=np.int64),
                "name": s.str.extract_all(MENTION_RE),
            }).explode("name").drop_nulls("name"))
            n_matches = dfm_pl.height
        if n_matches:
            ao, an = self._alias_series()
            dfm_pl = dfm_pl.with_columns(
                pl.col("name").replace_strict(old=ao, new=an, default=-1,
                                              return_dtype=pl.Int64)
                .alias("k")).filter(pl.col("k") >= 0)
            ks = dfm_pl["k"].to_numpy()
            rowi = dfm_pl["row"].to_numpy()
            if len(ks):
                span_rows = ti[rowi]
                dfm = pd.DataFrame({
                    "rank": doc_rank_span[span_rows],
                    "k": ks,
                    "j": span_j[span_rows],
                    "row": span_rows,
                })
                edges = dfm.drop_duplicates(["rank", "k"], keep="first")
                ents = dfm.drop_duplicates(["k"], keep="first")

                erow = edges["row"].to_numpy()
                families.append(self._family(
                    doc_node_span[erow], SDO + "mentions", "iri",
                    self._person_iris()[edges["k"].to_numpy()], None,
                    edges["rank"].to_numpy(),
                    edges["j"].to_numpy().astype(np.int32)))
                sids.append(sid_doc[erow])

                ent = self._entity_table()
                K = ents["k"].to_numpy()
                idx = (K[:, None] * self._ENT_ROWS
                       + np.arange(self._ENT_ROWS)).ravel()
                n_ent_rows = len(idx)
                # one Arrow take over the prebuilt entity table:
                # dictionary columns move int32 indices only
                taken = ent.take(pa.array(idx, pa.int64()))
                families.append(pa.table({
                    "subj": taken.column("subj"),
                    "pred": taken.column("pred"),
                    "obj_kind": taken.column("obj_kind"),
                    "obj_value": taken.column("obj_value"),
                    "obj_datatype": taken.column("obj_datatype"),
                    "obj_lang": pa.nulls(n_ent_rows, pa.string()),
                    "doc_rank": pa.array(
                        np.repeat(ents["rank"].to_numpy(), self._ENT_ROWS),
                        pa.int64()),
                    "span_idx": pa.array(
                        np.repeat(ents["j"].to_numpy(),
                                  self._ENT_ROWS).astype(np.int32),
                        pa.int32()),
                }).cast(_FAMILY_SCHEMA))
                sids.append(np.repeat(_sid_entity(K), self._ENT_ROWS))

        out = pa.concat_tables(families)

        # NO local dedup: batch output is unique BY CONSTRUCTION —
        # span families are keyed by the per-row span_node, mention
        # edges are drop_duplicates(["rank","k"]) and entity attribute
        # rows drop_duplicates(["k"]) above, and families never collide
        # across predicates. Measured: the former polars sort+unique
        # round-trip here collapsed 0 rows and cost ~25% of the kernel.
        # Cross-batch duplicates (the same entity in many batches) are
        # exactly what stage-2's finalize dedup collapses.

        # bucket from numeric subject ids (pure function of the subject
        # string by construction — _mix64 note): no string hashing
        bucket = (_mix64(np.concatenate(sids))
                  % np.uint64(self.n_buckets)).astype(np.int32)
        # graph_iri is NOT materialized here: it is bucket-determined
        # and re-attached as a constant at finalize (schema.py note)
        out = out.append_column("bucket", pa.array(bucket, pa.int32()))
        return out.select([f.name for f in EXTRACT_OUTPUT_SCHEMA]).cast(
            EXTRACT_OUTPUT_SCHEMA)


_KERNEL_CACHE: Dict[tuple, ExtractLink] = {}


def extract_link_kernel(batch: pa.Table, *, n_entities: int = 10_000,
                        n_buckets: int = 32, alias_ref=None,
                        prefixes=None) -> pa.Table:
    """Stateless-task wrapper: one ExtractLink instance per worker
    process (keyed by config), so tasks stay elastic while the alias
    dict / regex / entity cache amortize like actor state."""
    from ..sinks.partitioned import _cap_worker_threads
    _cap_worker_threads(2)
    key = (n_entities, n_buckets,
           alias_ref.hex() if alias_ref is not None else None)
    inst = _KERNEL_CACHE.get(key)
    if inst is None:
        _KERNEL_CACHE.clear()
        inst = ExtractLink(n_entities=n_entities, n_buckets=n_buckets,
                           alias_ref=alias_ref, prefixes=prefixes)
        _KERNEL_CACHE[key] = inst
    return inst(batch)
