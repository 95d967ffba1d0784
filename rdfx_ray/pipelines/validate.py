"""SHACL-lite shape validation over the columnar triple plane — the
KG-construction QA step (cardinality, datatype and value-set
constraints), expressed with the engine's partial-aggregation
discipline: every constraint folds per batch, the only exchange is
O(subjects) (cardinality) or a scalar pair (streaming counts).

Three constraint kinds (the common SHACL core subset):

- ``sh:minCount``/``sh:maxCount`` 1 on a predicate: per-subject
  occurrence counts (batch-local value_counts → groupby sum), violated
  when a checked subject's count ≠ 1;
- ``sh:datatype xsd:integer``: the literal must lex as an integer —
  vectorized RE2 match per batch;
- ``sh:in (…)``: the value must belong to a closed set — vectorized
  ``is_in`` per batch.

Returns one row per constraint: (shape_rule, n_checked, n_violations).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def validate_shapes(triples_ds, card_pred: str, dtype_pred: str,
                    in_pred: str, in_values) -> "object":
    """Run the three constraint checks; see module docstring.
    ``n_checked`` is the distinct-subject count for the cardinality
    rule and the triple count for the value rules."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .query import triple_pattern

    # -- cardinality: per-subject counts of card_pred -----------------------
    def subj_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("subj").combine_chunks())
        return pa.table({"subj": vc.field("values"),
                         "n": pa.array(vc.field("counts"), pa.int64())})

    per_subj = (triple_pattern(triples_ds, pred=card_pred)
                .map_batches(subj_counts, batch_format="pyarrow")
                .groupby("subj").aggregate(Sum("n", alias_name="n")))

    def card_fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "checked": pa.array([len(n)], pa.int64()),
            "viol": pa.array([int((n != 1).sum())], pa.int64())})

    card = (per_subj.map_batches(card_fold, batch_format="pyarrow")
            .to_pandas().sum())

    # -- datatype: integer lexical form -------------------------------------
    def dtype_fold(batch: pa.Table) -> pa.Table:
        v = batch.column("obj_value")
        ok = pc.match_substring_regex(v, r"^[0-9]+$")
        return pa.table({
            "checked": pa.array([batch.num_rows], pa.int64()),
            "viol": pa.array(
                [batch.num_rows - int(pc.sum(ok).as_py() or 0)],
                pa.int64())})

    dtype = (triple_pattern(triples_ds, pred=dtype_pred)
             .map_batches(dtype_fold, batch_format="pyarrow")
             .to_pandas().sum())

    # -- value-in-set --------------------------------------------------------
    vset = pa.array(list(in_values), pa.string())

    def in_fold(batch: pa.Table) -> pa.Table:
        hit = pc.is_in(batch.column("obj_value"), value_set=vset)
        return pa.table({
            "checked": pa.array([batch.num_rows], pa.int64()),
            "viol": pa.array(
                [batch.num_rows - int(pc.sum(hit).as_py() or 0)],
                pa.int64())})

    inset = (triple_pattern(triples_ds, pred=in_pred)
             .map_batches(in_fold, batch_format="pyarrow")
             .to_pandas().sum())

    return pd.DataFrame({
        "shape_rule": ["card_exactly_1", "dtype_integer", "value_in_set"],
        "n_checked": np.array([card["checked"], dtype["checked"],
                               inset["checked"]], dtype=np.int64),
        "n_violations": np.array([card["viol"], dtype["viol"],
                                  inset["viol"]], dtype=np.int64),
    })


def doc_shapes_report(sf_dir: str):
    """The documents-table shape report (oracle-replayable: on this
    corpus every doc carries exactly one inLanguage, an integer
    characterCount and a closed language vocabulary, so the oracle
    pins checked counts and zero violations; the corrupted-graph path
    is pinned by the unit test)."""
    from ..functions.doc_triples import SDO, doc_triples

    return validate_shapes(doc_triples(sf_dir),
                           card_pred=SDO + "inLanguage",
                           dtype_pred=SDO + "characterCount",
                           in_pred=SDO + "inLanguage",
                           in_values=["en", "de", "fr", "es", "zh"])


DOC_SHAPES_SQL = """
SELECT 'card_exactly_1' AS shape_rule, COUNT(*) AS n_checked,
       CAST(COUNT(*) FILTER (WHERE lang IS NULL) AS BIGINT)
           AS n_violations
FROM documents
UNION ALL
SELECT 'dtype_integer', COUNT(*),
       CAST(COUNT(*) FILTER (
           WHERE NOT regexp_matches(CAST(n_chars AS VARCHAR),
                                    '^[0-9]+$')) AS BIGINT)
FROM documents
UNION ALL
SELECT 'value_in_set', COUNT(*),
       CAST(COUNT(*) FILTER (
           WHERE lang NOT IN ('en', 'de', 'fr', 'es', 'zh'))
           AS BIGINT)
FROM documents
"""
