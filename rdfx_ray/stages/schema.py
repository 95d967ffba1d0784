"""Arrow schemas for the two logical tables of the engine
(SURVEY.md §1.2; input shape fixed by BASELINE.json input_hint)."""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("offset", pa.int32()),
])

DOCUMENTS_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
])

# Columnar triple table: the distributed Graph. doc_rank is the integer
# form of doc_id ("doc-{rank:08d}") so lineage aggregates stay numeric.
TRIPLES_SCHEMA = pa.schema([
    pa.field("subj", pa.string()),
    pa.field("pred", pa.string()),
    pa.field("obj_kind", pa.string()),       # 'iri' | 'literal' | 'bnode'
    pa.field("obj_value", pa.string()),
    pa.field("obj_datatype", pa.string()),   # null = plain literal
    pa.field("obj_lang", pa.string()),       # null = no language tag
    pa.field("graph_iri", pa.string()),      # output partition key
    pa.field("doc_rank", pa.int64()),        # lineage
    pa.field("span_idx", pa.int32()),        # lineage
])

# Stage-1 shuffle-file schema: graph_iri is a PURE FUNCTION of the
# bucket (urn:graph:bucket-%04d), so carrying it as a ~22-byte string
# column through extract output, the bucket sort/take, the shuffle
# files and the finalize read is pure memory-bandwidth waste — it is
# re-attached as a constant column at finalize.
#
# pred / obj_kind / obj_datatype are DICTIONARY-encoded through the
# whole shuffle plane: they have ~10 / 3 / ~3 distinct values, so as
# plain strings they were ~60-80 bytes/row of pure repetition moved
# through extract output, the bucket sort/take, the shuffle-file
# encode/decode and the finalize read — on a memory-bandwidth-bound
# stage. int32 indices + a tiny dictionary per chunk instead; decoded
# back to plain strings at finalize read (_iter_plan_tables), so the
# dedup/sort/NT plane and the public TRIPLES_SCHEMA stay plain.
_DICT = pa.dictionary(pa.int32(), pa.string())
STAGE1_TRIPLES_SCHEMA = pa.schema([
    pa.field(f.name, _DICT) if f.name in ("pred", "obj_kind",
                                          "obj_datatype") else f
    for f in TRIPLES_SCHEMA if f.name != "graph_iri"
])

# the same columns as plain strings: the finalize-side decode target
# (also exactly the pre-round-3 shuffle schema, so resuming an old
# output dir needs no special casing)
STAGE1_PLAIN_SCHEMA = pa.schema(
    [f for f in TRIPLES_SCHEMA if f.name != "graph_iri"])

TRIPLE_KEY_COLUMNS = [
    "subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang",
]


def doc_id_from_rank(rank: int) -> str:
    return f"doc-{rank:08d}"
