"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on a small
deterministic corpus; ``queries()`` exposes every implemented
operator/pipeline (SURVEY.md §2 + training-data ops); ``oracle_sql()``
gives DuckDB-equivalent SQL for the SQL-expressible ones (identical
column names; integer-scaled arithmetic so value hashes match
exactly). Ray is initialised by the driver — nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from pathlib import Path
from typing import Any

_KG_CACHE = "/tmp/rdfx_ray_entry"


def _kg_output(n_docs: int = 2000, n_entities: int = 500) -> str:
    """Run (or reuse — the pipeline is resumable/idempotent) the KG
    pipeline on the deterministic synthetic corpus."""
    from rdfx_ray.pipelines.kg import KGConfig, run_kg_pipeline
    from rdfx_ray.sources.documents import generate_documents

    root = Path(_KG_CACHE) / f"d{n_docs}-e{n_entities}"
    input_uri = str(root / "input")
    out_dir = str(root / "out")
    if not (Path(input_uri) / "_manifest" / "LATEST").exists():
        generate_documents(input_uri, n_docs=n_docs, n_entities=n_entities,
                           fragment_rows=1024)
    run_kg_pipeline(input_uri, out_dir, KGConfig(
        n_buckets=8, n_entities=n_entities, batch_size=512,
        shard_fragments=2))
    return out_dir


def entry() -> Any:
    """Flagship pipeline: interleaved docs → deduplicated partitioned
    triples (returns the final triple Dataset)."""
    from rdfx_ray.pipelines.kg import read_final_triples

    out_dir = _kg_output()
    return read_final_triples(out_dir)


def _kg_span_invariant(sf_dir: str):
    """Per-row span-sequence invariant (BASELINE.json input_hint):
    reconstruct (kind, text, media_ref, order) from the OUTPUT graph
    and compare with the input for every document. Raises on any
    mismatch; returns the checked-count row."""
    import pandas as pd

    from rdfx_ray.pipelines.invariant import check_span_invariant

    out_dir = _kg_output()
    root = Path(_KG_CACHE) / "d2000-e500"
    res = check_span_invariant(out_dir, str(root / "input"))
    return pd.DataFrame([{"docs_checked": res["docs_checked"],
                          "invariant_holds": True}])


def _revenue_shuffle(sf_dir: str):
    from rdfx_ray.pipelines.joins import revenue_by_region_shuffle
    return revenue_by_region_shuffle(sf_dir)


def _kg_distributed_merge(sf_dir: str):
    """Distributed merge verb over the reference corpus (3 files + a
    duplicate): union → exact-dedup shuffle → 18 distinct triples,
    returned as the merged NT lines (set-union semantics of
    rdfx/rdfx_cli.py:91-93)."""
    import shutil

    import pandas as pd

    from rdfx_ray.pipelines.verbs import merge_files
    from rdfx_ray.rdf import Graph

    data = Path(__file__).parent / "tests" / "data"
    work = Path(_KG_CACHE) / "merge_demo"
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    files = []
    for name in ("file_01.ttl", "file_02.rdf", "file_03.json-ld",
                 "file_01.ttl"):
        dst = work / (f"dup_{name}" if (work / name).exists() else name)
        shutil.copy(data / name, dst)
        files.append(dst)
    out = merge_files(files, work / "merged", "nt")
    g = Graph().parse(out.read_text(), "nt")
    lines = sorted({l for l in g.serialize("nt").split("\n") if l.strip()})
    return pd.DataFrame({"nt_line": lines})


def _kg_query_filter(sf_dir: str):
    """Single-triple-pattern SELECT: subjects whose sdo:inLanguage is
    'en' (exercises the vectorized pattern filter)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import subjects_of

    return subjects_of(doc_triples(sf_dir), SDO + "inLanguage", "en")


def _kg_query_bgp(sf_dir: str):
    """Two-pattern BGP joined on subject: ?s inLanguage ?va .
    ?s isBasedOn ?vb (broadcast map-side join)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import bgp_join

    return bgp_join(doc_triples(sf_dir), SDO + "inLanguage",
                    SDO + "isBasedOn")


def _kg_query_bgp_native(sf_dir: str):
    """Same BGP through Ray Data's native Dataset.join hash-shuffle
    operator (both-sides-large strategy; identical oracle)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import bgp_join_native

    return bgp_join_native(doc_triples(sf_dir), SDO + "inLanguage",
                           SDO + "isBasedOn")


def _events_asof_orders(sf_dir: str):
    """As-of join: each event ⋈ the latest deterministic order
    snapshot at-or-before its timestamp (bucket exchange + per-bucket
    merge_asof — the operator Ray Data lacks natively)."""
    from rdfx_ray.pipelines.asof import events_asof_orders
    return events_asof_orders(sf_dir)


def _events_in_order_windows(sf_dir: str):
    """Range (interval) join: each derived per-order promo window
    collects its customer's events with w_start <= ts < w_end (bucket
    exchange + per-bucket sorted-interval probe with exact integer
    prefix sums — the second join operator Ray Data lacks natively)."""
    from rdfx_ray.pipelines.rangejoin import events_in_order_windows
    return events_in_order_windows(sf_dir)


def _events_asof_orders_forward(sf_dir: str):
    """Forward as-of join: each event's NEXT order snapshot at or
    after its timestamp plus the count of later snapshots — the same
    bucket exchange as the backward as-of, merge direction flipped
    (pipelines/asof.py)."""
    from rdfx_ray.pipelines.asof import events_asof_orders
    return events_asof_orders(sf_dir, direction="forward")


def _orders_price_rank(sf_dir: str):
    """Full-table window ranking: every order's RANK / ROW_NUMBER /
    NTILE(4) within its priority by quantized price — value-bucket
    co-location + driver prefix sum over the tiny bucket-count table
    (exact, including ties; pipelines/rank.py)."""
    from rdfx_ray.pipelines.rank import orders_price_rank

    return orders_price_rank(sf_dir)


def _r4():
    """Round-4 analytics module (sampling / unpivot / cross join /
    grouping sets / MAD / order-statistic filter)."""
    from rdfx_ray.pipelines import analytics_r4
    return analytics_r4


def _r5():
    """Round-5 analytics module (interval coalescing / skyline /
    n-gram familiarity scoring / grouped top-k / edit-distance
    similarity join)."""
    from rdfx_ray.pipelines import analytics_r5
    return analytics_r5


def _r5b():
    """Round-5 analytics part 2 (transition matrix / TPC-H Q3-Q10-Q14
    join chains / cohort retention / exact-integer anomaly filter)."""
    from rdfx_ray.pipelines import analytics_r5b
    return analytics_r5b


def _orders_percent_rank(sf_dir: str):
    """PERCENT_RANK / CUME_DIST for every order within its priority —
    the same value-bucket co-location machinery as orders_price_rank,
    integer-scaled at 1e9 (pipelines/rank.py)."""
    from rdfx_ray.pipelines.rank import orders_percent_rank

    return orders_percent_rank(sf_dir)


def _citation_components(sf_dir: str):
    """Connected components over the undirected citation chains —
    label = smallest doc in the component; count-gated broadcast-label
    propagation vs the Dataset-native min-label route
    (functions/components.py; oracle = recursive CTE)."""
    from rdfx_ray.functions.components import citation_components

    return citation_components(sf_dir)


def _citation_bfs_depth(sf_dir: str):
    """Iterative frontier BFS over the citation chains: min hop count
    to each chain root, count-gated driver numpy vs Dataset frontier
    loop (functions/components.py; oracle = recursive CTE)."""
    from rdfx_ray.functions.components import citation_bfs_depth

    return citation_bfs_depth(sf_dir)


def _customer_triangles(sf_dir: str):
    """Triangle count over the deterministic derived customer chain
    graph — bucketed wedge generation + distinct-key closing join
    (functions/graph.py; the clustering-coefficient building block)."""
    from rdfx_ray.functions.graph import customer_triangles

    return customer_triangles(sf_dir)


def _customer_clustering(sf_dir: str):
    """Global clustering coefficient (3x triangles, wedge total) over
    the derived customer graph — exact integer parts so the oracle
    hashes (functions/graph.py)."""
    from rdfx_ray.functions.graph import customer_clustering

    return customer_clustering(sf_dir)


def _customer_local_clustering(sf_dir: str):
    """Per-node local clustering: each closed wedge credits all three
    corners; coefficient = n_tri / n_pairs (functions/graph.py)."""
    from rdfx_ray.functions.graph import customer_local_clustering

    return customer_local_clustering(sf_dir)


def _customer_k_core(sf_dir: str):
    """2-core of the derived customer graph: iterative peeling until
    every surviving node has degree >= 2 (rows-only: iterative;
    invariants pinned in tests/test_graph.py)."""
    from rdfx_ray.functions.graph import customer_chain_edges, k_core

    out, _stats = k_core(customer_chain_edges(sf_dir), k=2)
    return out


def _kg_query_path_inverse(sf_dir: str):
    """SPARQL inverse path ?s ^citation ?o — streaming role swap over
    the pattern filter (SPARQL 1.1 property-path feature)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_citation_triples
    from rdfx_ray.pipelines.query import property_path_inverse

    return property_path_inverse(doc_citation_triples(sf_dir),
                                 SDO + "citation")


def _kg_query_path_zero_or_one(sf_dir: str):
    """SPARQL zero-or-one path ?s citation? ?o — one-step pairs plus
    the zero-length (n, n) set (same term convention as path_star)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_citation_triples
    from rdfx_ray.pipelines.query import property_path_zero_or_one

    return property_path_zero_or_one(doc_citation_triples(sf_dir),
                                     SDO + "citation")


def _kg_query_group_count_distinct(sf_dir: str):
    """SPARQL GROUP BY + COUNT(DISTINCT ?v): distinct sources per
    language over the two-pattern BGP (query.py)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import group_count_distinct_bgp

    return group_count_distinct_bgp(doc_triples(sf_dir),
                                    SDO + "inLanguage",
                                    SDO + "isBasedOn")


def _kg_query_graph_scoped(sf_dir: str):
    """SPARQL GRAPH clause: predicate counts scoped to ONE named
    graph (GRAPH <urn:graph:3> { ?s ?p ?o }) — the graph_iri column
    is a first-class pattern dimension, so scoping is the same
    vectorized filter as any pattern leg."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    from rdfx_ray.functions.doc_triples import doc_triples
    from rdfx_ray.pipelines.query import triple_pattern

    return (triple_pattern(doc_triples(sf_dir),
                           graph_iri="urn:graph:3")
            .groupby("pred").aggregate(Count(alias_name="n")))


def _kg_query_ask(sf_dir: str):
    """ASK over two probes (one true, one false) → (probe, ask 0/1).
    The true branch short-circuits via limit(1); the false branch is a
    single column-pruned scan (SOP.asset_exists issues this shape)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import ask_report

    return ask_report(doc_triples(sf_dir), [
        ("lang_en", {"pred": SDO + "inLanguage", "obj_value": "en"}),
        ("lang_zz", {"pred": SDO + "inLanguage", "obj_value": "zz"}),
    ])


def _kg_query_bind(sf_dir: str):
    """BIND expression: ?s isBasedOn ?v . BIND(STRLEN(?v) AS ?len) —
    streaming vectorized utf8_length, no shuffle."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import bind_strlen_bgp

    return bind_strlen_bgp(doc_triples(sf_dir), SDO + "isBasedOn")


def _events_user_counts_cms(sf_dir: str):
    """Count-Min sketch estimated counts for the exact top-20 users
    (mergeable frequency sketch; approximate -> rows-only, overcount
    +epsilon*N bound pinned by tests)."""
    from rdfx_ray.functions.sketch import events_user_counts_cms
    return events_user_counts_cms(sf_dir)


def _events_hll_users(sf_dir: str):
    """HyperLogLog distinct-user estimate per event type (mergeable
    sketch; approximate → rows-only check, error pinned by tests)."""
    from rdfx_ray.functions.sketch import events_hll_users
    return events_hll_users(sf_dir)


def _kg_query_bgp3(sf_dir: str):
    """Three-pattern star BGP with a constant filter pattern:
    ?s inLanguage 'en' . ?s isBasedOn ?vb . ?s characterCount ?vc —
    planned as const-first chained native hash joins."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import star_bgp

    return star_bgp(doc_triples(sf_dir), [
        (SDO + "inLanguage", "en"),
        (SDO + "isBasedOn", "?vb"),
        (SDO + "characterCount", "?vc"),
    ])


def _kg_query_bgp_var(sf_dir: str):
    """Variable-predicate BGP: ?s inLanguage 'en' . ?s ?p ?o with ?p
    projected — count-gated broadcast subject-set semi-filter (or
    native hash semi-join when the subject set is large)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import var_predicate_bgp

    return var_predicate_bgp(doc_triples(sf_dir), SDO + "inLanguage", "en")


def _kg_query_two_hop(sf_dir: str):
    """Cross-subject BGP joined on a shared OBJECT variable:
    ?a inLanguage 'de' . ?a isBasedOn ?v . ?b isBasedOn ?v — doc pairs
    sharing a source (hot-key exchange; count-gated broadcast vs
    salted partitioned hash join)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import object_join_bgp

    return object_join_bgp(doc_triples(sf_dir), SDO + "isBasedOn",
                           SDO + "isBasedOn",
                           filter_pred=SDO + "inLanguage",
                           filter_obj="de")


def _kg_query_optional(sf_dir: str):
    """OPTIONAL BGP (SPARQL left join): ?s inLanguage ?va OPTIONAL
    { ?s isBasedOn ?vb FILTER(?vb = 'src3') } — vb null for docs not
    based on src3; count-gated broadcast left join vs native
    left_outer hash join."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import optional_bgp

    return optional_bgp(doc_triples(sf_dir), SDO + "inLanguage",
                        SDO + "isBasedOn", opt_obj="src3")


def _kg_query_union(sf_dir: str):
    """UNION BGP (bag semantics): { ?s inLanguage ?v } UNION
    { ?s isBasedOn ?v } — streaming block-wise union, no shuffle."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import union_bgp

    return union_bgp(doc_triples(sf_dir),
                     [SDO + "inLanguage", SDO + "isBasedOn"])


def _kg_query_minus(sf_dir: str):
    """MINUS / FILTER NOT EXISTS BGP: ?s inLanguage ?va FILTER NOT
    EXISTS { ?s isBasedOn 'src3' } — count-gated broadcast is_in
    anti-filter vs left_outer null-marker anti-join."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import minus_bgp

    return minus_bgp(doc_triples(sf_dir), SDO + "inLanguage",
                     SDO + "isBasedOn", minus_obj="src3")


def _kg_query_path_plus(sf_dir: str):
    """Property path ?s citation+ ?o: transitive closure of the
    chain-structured sdo:citation relation — count-gated broadcast
    pointer-chasing vs distributed semi-naive iteration; oracle is a
    DuckDB recursive CTE."""
    from rdfx_ray.functions.doc_triples import SDO, doc_citation_triples
    from rdfx_ray.pipelines.query import property_path_plus

    return property_path_plus(doc_citation_triples(sf_dir),
                              SDO + "citation")


def _kg_query_path_seq(sf_dir: str):
    """Sequence path ?s citation/citation ?o (grandparent hop):
    two-hop composition through the intermediate node — count-gated
    broadcast probe vs native hash-shuffle join."""
    from rdfx_ray.functions.doc_triples import SDO, doc_citation_triples
    from rdfx_ray.pipelines.query import property_path_seq

    return property_path_seq(doc_citation_triples(sf_dir),
                             SDO + "citation", SDO + "citation")


def _kg_query_path_star(sf_dir: str):
    """Property path ?s citation* ?o: the + closure plus the
    zero-length path over the relation's node set."""
    from rdfx_ray.functions.doc_triples import SDO, doc_citation_triples
    from rdfx_ray.pipelines.query import property_path_star

    return property_path_star(doc_citation_triples(sf_dir),
                              SDO + "citation")


def _kg_query_path_alt(sf_dir: str):
    """Alternative path ?s (inLanguage|isBasedOn) ?o — set-semantic
    predicate union (streaming is_in filter + distinct shuffle)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import property_path_alt

    return property_path_alt(doc_triples(sf_dir), SDO + "inLanguage",
                             SDO + "isBasedOn")


def _kg_query_negated_props(sf_dir: str):
    """Negated property set ?s !(characterCount) ?o — all triples
    whose predicate is outside the excluded set (pure streaming)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import negated_property_set_bgp

    return negated_property_set_bgp(doc_triples(sf_dir),
                                    [SDO + "characterCount"])


def _kg_query_having(sf_dir: str):
    """GROUP BY ?v HAVING COUNT(?s) >= 75 over ?s inLanguage ?v —
    post-aggregate threshold on the grouped count."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import having_bgp

    return having_bgp(doc_triples(sf_dir), SDO + "inLanguage", 75)


def _kg_query_group_minmax(sf_dir: str):
    """MIN/MAX(xsd:integer(?x)) per language over characterCount —
    lossless partial-fold aggregates (no scaling dance)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import group_minmax_bgp

    return group_minmax_bgp(doc_triples(sf_dir), SDO + "inLanguage",
                            SDO + "characterCount")


def _kg_query_construct(sf_dir: str):
    """CONSTRUCT { ?s urn:derived:langSource ?vb } WHERE
    { ?s inLanguage 'en' . ?s isBasedOn ?vb } — template rewrite into
    the engine's full triple schema (materialized-view shape)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import construct_bgp

    return construct_bgp(doc_triples(sf_dir), SDO + "inLanguage", "en",
                         SDO + "isBasedOn", "urn:derived:langSource")


def _kg_query_describe(sf_dir: str):
    """DESCRIBE ?s WHERE { ?s inLanguage 'de' } — every triple about
    each matching subject; count-gated broadcast is_in vs semi-join
    membership filter (pipelines/query.py::describe_subjects)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import describe_subjects

    return describe_subjects(doc_triples(sf_dir),
                             SDO + "inLanguage", "de")


def _kg_query_group_concat(sf_dir: str):
    """GROUP_CONCAT(DISTINCT ?w ORDER BY ?w) per language — distinct
    pair shuffle then per-group ordered concat."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import group_concat_bgp

    return group_concat_bgp(doc_triples(sf_dir), SDO + "inLanguage",
                            SDO + "isBasedOn")


def _kg_query_group_avg(sf_dir: str):
    """AVG aggregate per language over xsd:integer characterCount,
    integer-scaled ((Σx·100)//n) so the hash matches exactly."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import group_avg_bgp

    return group_avg_bgp(doc_triples(sf_dir), SDO + "inLanguage",
                         SDO + "characterCount")


def _kg_validate_shapes(sf_dir: str):
    """SHACL-lite shape report over the triple plane: cardinality,
    integer-datatype and value-in-set constraints (partial-agg folds;
    the only exchange is O(subjects))."""
    from rdfx_ray.pipelines.validate import doc_shapes_report
    return doc_shapes_report(sf_dir)


def _kg_query_group_count(sf_dir: str):
    """SPARQL GROUP BY aggregate: SELECT ?v (COUNT(?s) AS n)
    { ?s inLanguage ?v } GROUP BY ?v — per-batch partial value_counts
    bound the shuffle to O(distinct × blocks)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import group_count_bgp

    return group_count_bgp(doc_triples(sf_dir), SDO + "inLanguage")


def _kg_query_filter_expr(sf_dir: str):
    """Numeric FILTER expression: ?s characterCount ?c
    FILTER(xsd:integer(?c) >= 300) — typed-literal comparison,
    streaming vectorized cast + compare."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import filter_expr_bgp

    return filter_expr_bgp(doc_triples(sf_dir), SDO + "characterCount",
                           min_value=300)


def _kg_query_filter_regex(sf_dir: str):
    """FILTER regex(?v, 'src1[0-9]$') over ?s isBasedOn ?v — RE2 on
    both engines (pyarrow match_substring_regex / DuckDB
    regexp_matches)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import filter_regex_bgp

    return filter_regex_bgp(doc_triples(sf_dir), SDO + "isBasedOn",
                            "src1[0-9]$")


def _kg_query_values(sf_dir: str):
    """VALUES inline data: VALUES ?v { 'en' 'de' } . ?s inLanguage ?v
    — closure-shipped bind set, vectorized is_in per batch."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import values_bgp

    return values_bgp(doc_triples(sf_dir), SDO + "inLanguage",
                      ["en", "de"])


def _kg_query_order_limit(sf_dir: str):
    """ORDER BY DESC(xsd:integer(?c)) LIMIT 100 over ?s characterCount
    ?c — distributed top-k (per-batch partial top-k before the sort
    exchange), deterministic subj tiebreak."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import order_limit_bgp

    return order_limit_bgp(doc_triples(sf_dir), SDO + "characterCount",
                           k=100)


def _kg_query_distinct(sf_dir: str):
    """SELECT DISTINCT ?v { ?s isBasedOn ?v } — batch-local unique →
    distinct shuffle (groupby-aggregate form)."""
    from rdfx_ray.functions.doc_triples import SDO, doc_triples
    from rdfx_ray.pipelines.query import distinct_values_bgp

    return distinct_values_bgp(doc_triples(sf_dir), SDO + "isBasedOn")


def _kg_citation_pagerank(sf_dir: str):
    """PageRank over the sdo:citation graph — count-gated driver vs
    distributed join/groupby power iteration (iterative float
    algorithm → rows-only check; route-equality pinned by test)."""
    from rdfx_ray.functions.components import citation_pagerank
    return citation_pagerank(sf_dir)


def _customers_bloom(sf_dir: str):
    """Bloom-join: a row-count-independent bitmap pre-filters the
    probe side before the exact verify — EXISTS semantics preserved,
    same oracle as the exact semi join."""
    from rdfx_ray.functions.sketch import customers_with_urgent_order_bloom
    return customers_with_urgent_order_bloom(sf_dir)


def _docs_model_scores(sf_dir: str):
    """Batched model inference: actor-pool quality classifier over
    every document (integer linear scorer → DuckDB-exact)."""
    from rdfx_ray.functions.scoring import score_documents
    return score_documents(sf_dir)


def _orders_quantiles_tdigest(sf_dir: str):
    """Approximate grouped p50/p95 via mergeable t-digests — the
    O(delta)-state scale path beyond the exact distinct-value
    histogram (sketch → rows-only check; ≤1% error pinned by test)."""
    from rdfx_ray.functions.sketch import orders_price_quantiles_tdigest
    return orders_price_quantiles_tdigest(sf_dir)


def _corpus_curate(sf_dir: str):
    """Flagship curation composition: split → exact dedup → model
    quality filter → domain balance → sequence packing, end-to-end
    hash-checked by ONE DuckDB statement."""
    from rdfx_ray.pipelines.curate import curate_corpus
    return curate_corpus(sf_dir)


def _packing():
    from rdfx_ray.functions import packing
    return packing


def queries() -> dict[str, Callable[[str], Any]]:
    from rdfx_ray.functions import dedup, doc_triples, similarity, text
    from rdfx_ray.pipelines import analytics, analytics_ext
    from rdfx_ray.pipelines import analytics_window as _win

    def kg_extract(sf_dir: str):
        from rdfx_ray.pipelines.kg import read_final_triples
        return read_final_triples(_kg_output())

    def _media_input() -> str:
        root = Path(_KG_CACHE) / "d2000-e500"
        if not (root / "input" / "_manifest" / "LATEST").exists():
            _kg_output()
        return str(root / "input")

    def kg_media_features(sf_dir: str):
        from rdfx_ray.functions.multimodal import media_features
        return media_features(_media_input())

    def kg_media_thumbnails(sf_dir: str):
        from rdfx_ray.functions.multimodal import media_thumbnails
        return media_thumbnails(_media_input())

    def kg_media_frames(sf_dir: str):
        from rdfx_ray.functions.multimodal import media_frame_samples
        return media_frame_samples(_media_input())

    def kg_convert_corpus(sf_dir: str):
        """Reference-corpus conversion round-trip: each golden file
        parsed and re-serialized to every format, returned as
        (file, format, n_triples, roundtrip_isomorphic) rows."""
        import pandas as pd
        from rdfx_ray.rdf import Graph, isomorphic
        from rdfx_ray.rdf.formats import VALID_RDF_FORMATS

        data = Path(__file__).parent / "tests" / "data"
        rows = []
        for name, fmt in (("file_01.ttl", "turtle"), ("file_02.rdf", "xml"),
                          ("file_03.json-ld", "json-ld")):
            g = Graph().parse((data / name).read_text(), fmt)
            for out_fmt in VALID_RDF_FORMATS:
                back = Graph().parse(g.serialize(out_fmt), out_fmt)
                rows.append({"file": name, "format": out_fmt,
                             "n_triples": len(back),
                             "roundtrip_iso": isomorphic(g, back)})
        return pd.DataFrame(rows)

    return {
        # KG machinery (SQL-oracle-able over the documents table)
        "kg_doc_triples": lambda sf: doc_triples.doc_triples(sf),
        "kg_merge_dedup": lambda sf: doc_triples.doc_triples_merged_dedup(sf),
        "kg_graph_sizes": lambda sf: doc_triples.graph_partition_sizes(sf),
        "kg_predicate_counts": lambda sf: doc_triples.predicate_counts(sf),
        # flagship pipeline + RDF core (non-SQL: rows-only checks)
        "kg_extract_triples": kg_extract,
        "kg_span_invariant": _kg_span_invariant,
        "kg_media_features": kg_media_features,
        "kg_media_thumbnails": kg_media_thumbnails,
        "kg_media_frames": kg_media_frames,
        "kg_convert_roundtrip": kg_convert_corpus,
        "kg_distributed_merge": _kg_distributed_merge,
        # query surface over the triple plane (SPARQL-shape analogues)
        "kg_query_filter": _kg_query_filter,
        "kg_query_bgp": _kg_query_bgp,
        "kg_query_bgp_native": _kg_query_bgp_native,
        "kg_query_bgp3": _kg_query_bgp3,
        "kg_query_bgp_var": _kg_query_bgp_var,
        "kg_query_two_hop": _kg_query_two_hop,
        "kg_query_optional": _kg_query_optional,
        "kg_query_union": _kg_query_union,
        "kg_query_minus": _kg_query_minus,
        "kg_query_path_plus": _kg_query_path_plus,
        "kg_query_path_seq": _kg_query_path_seq,
        "kg_query_path_star": _kg_query_path_star,
        "kg_query_group_avg": _kg_query_group_avg,
        "kg_query_path_alt": _kg_query_path_alt,
        "kg_query_negated_props": _kg_query_negated_props,
        "kg_query_having": _kg_query_having,
        "kg_query_group_minmax": _kg_query_group_minmax,
        "kg_validate_shapes": _kg_validate_shapes,
        "kg_query_construct": _kg_query_construct,
        "kg_query_describe": _kg_query_describe,
        "kg_query_group_concat": _kg_query_group_concat,
        "kg_query_ask": _kg_query_ask,
        "kg_query_bind": _kg_query_bind,
        "kg_query_path_inverse": _kg_query_path_inverse,
        "kg_query_path_zero_or_one": _kg_query_path_zero_or_one,
        "kg_query_graph_scoped": _kg_query_graph_scoped,
        "kg_query_group_count_distinct": _kg_query_group_count_distinct,
        # correlated subquery (decorrelated max-per-group filter)
        "docs_max_chars_per_lang":
            lambda sf: analytics_ext.docs_max_chars_per_lang(sf),
        # ratio-to-report window (share of total)
        "events_type_share":
            lambda sf: analytics_ext.events_type_share(sf),
        # MODE per group (deterministic tiebreak)
        "events_value_mode":
            lambda sf: analytics_ext.events_value_mode(sf),
        # funnel analysis (ordered step match per user)
        "events_funnel":
            lambda sf: analytics_ext.events_funnel(sf),
        # referential-integrity data-quality check
        "orders_lineitem_integrity":
            lambda sf: analytics_ext.orders_lineitem_integrity(sf),
        # part-dimension join: revenue per brand (count-gated routes)
        "brand_revenue": lambda sf: analytics_ext.brand_revenue(sf),
        # cohort retention (first-day cohort x day offset)
        "events_cohort_retention":
            lambda sf: analytics_ext.events_cohort_retention(sf),
        # TPC-H Q3-shaped 3-table top-k revenue pipeline
        "tpch_q3ish": lambda sf: analytics_ext.tpch_q3ish(sf),
        # interpolated median as exact 2x integer (percentile_cont)
        "orders_price_median2x":
            lambda sf: analytics_ext.orders_price_median2x(sf),
        # all-pairs cosine histogram (near-dup threshold diagnostic)
        "embedding_pair_sim_histogram":
            lambda sf: similarity.pair_sim_histogram(sf),
        "kg_query_group_count": _kg_query_group_count,
        "kg_query_filter_expr": _kg_query_filter_expr,
        "kg_query_filter_regex": _kg_query_filter_regex,
        "kg_query_values": _kg_query_values,
        "kg_query_order_limit": _kg_query_order_limit,
        "kg_query_distinct": _kg_query_distinct,
        # wide-op analytics
        "pricing_summary": lambda sf: analytics.pricing_summary(sf),
        "events_hourly": lambda sf: analytics.events_hourly(sf),
        "events_sessionize": lambda sf: analytics.sessionize(sf),
        "revenue_by_region": lambda sf: analytics.revenue_by_region(sf),
        "revenue_by_region_shuffle": _revenue_shuffle,
        "events_topk_users": lambda sf: analytics_ext.events_topk_users(sf),
        "events_topn_per_type":
            lambda sf: analytics_ext.events_topn_per_type(sf),
        "customers_no_urgent_order":
            lambda sf: analytics_ext.customers_order_antijoin(sf),
        "customers_with_urgent_order":
            lambda sf: analytics_ext.customers_order_antijoin(sf, semi=True),
        # bloom-join optimization of the same semi join (same oracle)
        "customers_with_urgent_order_bloom": _customers_bloom,
        "docs_rollup_stats":
            lambda sf: analytics_ext.docs_rollup_stats(sf),
        "events_user_gaps":
            lambda sf: analytics_ext.events_user_gaps(sf),
        "events_hour_coverage":
            lambda sf: analytics_ext.events_hour_coverage(sf),
        "events_distinct_users":
            lambda sf: analytics_ext.events_distinct_users(sf),
        "docs_lang_source_stats":
            lambda sf: analytics_ext.docs_lang_source_stats(sf),
        "supplier_balance_by_nation":
            lambda sf: analytics_ext.supplier_balance_by_nation(sf),
        "orders_priority_filter":
            lambda sf: analytics_ext.orders_priority_filter(sf),
        "events_hopping_windows":
            lambda sf: analytics_ext.events_hopping_windows(sf),
        "orders_price_quantiles":
            lambda sf: analytics_ext.orders_price_quantiles(sf),
        # mergeable-sketch twin of the exact quantiles (approximate by
        # design → rows-only; error bound pinned by test)
        "orders_price_quantiles_tdigest": _orders_quantiles_tdigest,
        "events_asof_orders": _events_asof_orders,
        # forward as-of (next snapshot >= ts — the lead-time shape)
        "events_asof_orders_forward": _events_asof_orders_forward,
        "events_hll_users": _events_hll_users,
        # Count-Min sketch frequency estimates (rows-only; overcount
        # bound pinned by tests)
        "events_user_counts_cms": _events_user_counts_cms,
        # range (interval) join: events into derived per-order windows
        "events_in_order_windows": _events_in_order_windows,
        # window family: histogram / moving frame / argmax / moments
        "events_value_histogram":
            lambda sf: _win.events_value_histogram(sf),
        "orders_daily_moving":
            lambda sf: _win.orders_daily_moving(sf),
        "events_latest_per_user":
            lambda sf: _win.events_latest_per_user(sf),
        "events_value_moments":
            lambda sf: _win.events_value_moments(sf),
        "events_user_rolling":
            lambda sf: _win.events_user_rolling(sf),
        # semi-structured: JSON field extraction + aggregate
        "events_props_k_stats":
            lambda sf: _win.events_props_k_stats(sf),
        # sequence transitions (categorical LAG -> Markov counts)
        "events_type_transitions":
            lambda sf: _win.events_type_transitions(sf),
        # time-series resample with gap fill (zero rows included)
        "events_resample_15min":
            lambda sf: _win.events_resample_15min(sf),
        # streaming tumbling window with watermark + allowed lateness
        "events_streaming_tumbling":
            lambda sf: _win.events_streaming_tumbling(sf),
        # COUNT(DISTINCT) per time window (hourly active users)
        "events_hourly_active_users":
            lambda sf: _win.events_hourly_active_users(sf),
        "lineitem_comoments":
            lambda sf: _win.lineitem_comoments(sf),
        "orders_year_priority_pivot":
            lambda sf: analytics_ext.orders_year_priority_pivot(sf),
        "docs_cube_stats":
            lambda sf: analytics_ext.docs_cube_stats(sf),
        # distributed full-table window rank (RANK / ROW_NUMBER / NTILE)
        "orders_price_rank": _orders_price_rank,
        # distributed triangle counting (wedge + closing-edge join)
        "customer_triangles": _customer_triangles,
        # global clustering coefficient as exact integer parts
        "customer_clustering": _customer_clustering,
        # per-node local clustering (triangle credit attribution)
        "customer_local_clustering": _customer_local_clustering,
        # k-core pruning (iterative peeling; rows-only)
        "customer_k_core": _customer_k_core,
        # set operations (INTERSECT / EXCEPT) from one presence fold
        "events_users_intersect":
            lambda sf: analytics_ext.users_type_intersect(sf),
        "events_users_except":
            lambda sf: analytics_ext.users_type_except(sf),
        # round-4 additions: sampling / reshape / cross join /
        # grouping sets / robust stats / order-statistic filter
        "docs_sample_hash":
            lambda sf: _r4().docs_sample_hash(sf),
        "events_stratified_sample":
            lambda sf: _r4().events_stratified_sample(sf),
        "orders_unpivot": lambda sf: _r4().orders_unpivot(sf),
        "nation_region_cross":
            lambda sf: _r4().nation_region_cross(sf),
        "docs_grouping_sets":
            lambda sf: _r4().docs_grouping_sets(sf),
        "orders_price_mad": lambda sf: _r4().orders_price_mad(sf),
        "events_above_p95": lambda sf: _r4().events_above_p95(sf),
        # per-group deterministic reservoir (k smallest hashes)
        "docs_lang_sample": lambda sf: _r4().docs_lang_sample(sf),
        # time-weighted aggregate over irregular series (step-hold)
        "events_time_weighted":
            lambda sf: _r4().events_time_weighted(sf),
        # RANGE-frame (time-window) rolling sum/count per user
        "events_user_rolling_time":
            lambda sf: _r4().events_user_rolling_time(sf),
        # period-over-period delta (LAG over the aggregated series)
        "orders_monthly_delta":
            lambda sf: _r4().orders_monthly_delta(sf),
        # deterministic epoch shuffle (global permutation → shards)
        "corpus_epoch_shuffle":
            lambda sf: _r4().corpus_epoch_shuffle(sf),
        # context-window chunk plan (long-doc splitting with overlap)
        "docs_chunk_overlap":
            lambda sf: _r4().docs_chunk_overlap(sf),
        # interval coalescing (gaps-and-islands, variable-length
        # intervals — the general running-max-end merge)
        "events_user_islands":
            lambda sf: _r5().events_user_islands(sf),
        # Pareto frontier (skyline) of the orders fact
        "orders_skyline": lambda sf: _r5().orders_skyline(sf),
        # bigram-LM familiarity scoring vs the train split (CCNet
        # perplexity-filter shape in exact integer form)
        "docs_familiarity": lambda sf: _r5().docs_familiarity(sf),
        # grouped top-k over the corpus bigram profile
        "docs_ngram_topk_per_lang":
            lambda sf: _r5().docs_ngram_topk_per_lang(sf),
        # edit-distance similarity self-join (fuzzy-key dedup)
        "docs_edit_distance_pairs":
            lambda sf: _r5().docs_edit_distance_pairs(sf),
        # fuzzy entity resolution end-to-end (blocking → pairwise
        # scoring → connected components → cluster labels)
        "docs_fuzzy_clusters":
            lambda sf: _r5().docs_fuzzy_clusters(sf),
        # systematic PPS sampling (weight-proportional, exact integer)
        "docs_weighted_sample":
            lambda sf: _r5().docs_weighted_sample(sf),
        # per-document TF-IDF top terms (integer idf)
        "docs_top_terms": lambda sf: _r5().docs_top_terms(sf),
        # semi-structured JSON column extraction + aggregate
        "events_props_stats":
            lambda sf: _r5().events_props_stats(sf),
        # per-user Markov transition matrix (LAG over (ts, event_id))
        "events_user_transitions":
            lambda sf: _r5b().events_user_transitions(sf),
        # TPC-H Q3 shape: segment/date join chain → revenue top-k
        "orders_shipping_priority":
            lambda sf: _r5b().orders_shipping_priority(sf),
        # TPC-H Q10 shape: returned-item revenue per customer, top-k
        "customer_returns_topn":
            lambda sf: _r5b().customer_returns_topn(sf),
        # TPC-H Q14 shape: conditional-aggregate ratio, one row
        "promo_revenue_share":
            lambda sf: _r5b().promo_revenue_share(sf),
        # cohort retention matrix (first-month × months-since)
        "orders_cohort_retention":
            lambda sf: _r5b().orders_cohort_retention(sf),
        # exact-integer 3-sigma anomaly counts per event type
        "events_anomaly_zscore":
            lambda sf: _r5b().events_anomaly_zscore(sf),
        # distributed PCA (quantize-then-sum covariance, driver eigh)
        "embedding_pca": lambda sf: similarity.pca_fit(sf),
        # segment-level exact dedup (substring-dedup shape)
        "docs_segment_dedup":
            lambda sf: _r5b().docs_segment_dedup(sf),
        # 100-TB mode: deterministic 1/8 fingerprint subsample —
        # every exchange and the dup set shrink ~8×; zero false
        # positives, recall bound pinned vs the exact twin
        "docs_segment_dedup_sampled":
            lambda sf: _r5b().docs_segment_dedup(sf, sample_hex=2),
        # NTILE revenue-concentration report (80/20 shape)
        "orders_revenue_deciles":
            lambda sf: _r5b().orders_revenue_deciles(sf),
        # session path mining (top-k navigation paths)
        "events_top_paths": lambda sf: _r5b().events_top_paths(sf),
        # DAU / rolling-7-day WAU (exact sliding-window distinct)
        "events_dau_wau": lambda sf: _r5b().events_dau_wau(sf),
        # vocabulary coverage curve (tokenizer-budget planning)
        "docs_vocab_coverage":
            lambda sf: _r5b().docs_vocab_coverage(sf),
        # RFM segmentation (composite 3× NTILE over one orders fold)
        "orders_rfm_segments":
            lambda sf: _r5b().orders_rfm_segments(sf),
        # PMI collocation mining (exact integer quantized ranking)
        "docs_bigram_pmi": lambda sf: _r5b().docs_bigram_pmi(sf),
        # PERCENT_RANK / CUME_DIST (full-table window, integer-scaled)
        "orders_percent_rank": _orders_percent_rank,
        # iterative frontier BFS (min-hop depth to chain roots)
        "citation_bfs_depth": _citation_bfs_depth,
        # connected components with a recursive-CTE oracle
        # (count-gated broadcast-label vs Dataset-native min-label)
        "citation_components": _citation_components,
        # text analysis
        "text_token_stats": lambda sf: text.token_stats(sf),
        "text_fingerprints": lambda sf: text.fingerprints(sf),
        "text_quality": lambda sf: text.quality_scores(sf),
        "text_lang_id": lambda sf: text.lang_id(sf),
        "text_winnow_fingerprints":
            lambda sf: text.winnow_fingerprints(sf),
        "text_bpe_tokens": lambda sf: text.bpe_token_stats(sf),
        "text_ngram_counts": lambda sf: text.ngram_counts(sf),
        "text_doc_frequency": lambda sf: text.doc_frequency(sf),
        "docs_model_scores": _docs_model_scores,
        "docs_repetition_stats":
            lambda sf: text.repetition_stats(sf),
        "docs_redact_pii": lambda sf: text.redact_pii(sf),
        # training-batch preparation
        "corpus_curate": _corpus_curate,
        "corpus_pack_sequences": lambda sf: _packing().pack_sequences(sf),
        "corpus_split_hash": lambda sf: _packing().split_corpus(sf),
        "corpus_balance_sources":
            lambda sf: _packing().balance_sources(sf),
        "corpus_decontaminate":
            lambda sf: _packing().decontaminate(sf),
        # scale mode: uint64 rolling-hash grams through the join plane
        # (per-run hash identities → rows-only; equality with the
        # string mode pinned by test)
        "corpus_decontaminate_hashed":
            lambda sf: _packing().decontaminate(sf, hashed=True),
        # 100-TB mode: winnowing fingerprints (window-min of the
        # rolling-hash stream) — ~2/(w+1) of the hashed mode's rows;
        # n_shared counts shared fingerprints (detection report);
        # flag parity on planted long overlaps pinned by test
        "corpus_decontaminate_winnow":
            lambda sf: _packing().decontaminate(sf, hashed=True,
                                                winnow_window=16),
        # dedup family
        "dedup_exact": lambda sf: dedup.exact_dedup(sf),
        "dedup_minhash_pairs": lambda sf: dedup.minhash_lsh_pairs(sf),
        "dedup_simhash_pairs": lambda sf: dedup.simhash_pairs(sf),
        "dedup_embedding_pairs": lambda sf: dedup.embedding_neardup_pairs(sf),
        "dedup_corpus": lambda sf: dedup.dedup_corpus(sf),
        # graph analytics
        "kg_citation_pagerank": _kg_citation_pagerank,
        # similarity search
        "ann_brute_topk": lambda sf: similarity.brute_topk(sf),
        # integer-quantized ranking → SQL-oracle-able exact ANN
        "ann_topk_quantized":
            lambda sf: similarity.brute_topk_quantized(sf),
        # per-label centroid vector aggregate (quantize-then-sum)
        "embedding_label_centroids":
            lambda sf: similarity.label_centroids(sf),
        "ann_ivf_topk": lambda sf: similarity.ivf_topk(sf),
        "ann_lsh_topk": lambda sf: similarity.lsh_topk(sf),
        # compressed-index ANN (product quantization, ADC code scan)
        "ann_pq_topk": lambda sf: similarity.pq_topk(sf),
        # distributed Lloyd's k-means (iterative; integer folds make
        # the fit bit-deterministic under any partitioning)
        "embedding_kmeans": lambda sf: similarity.kmeans_fit(sf),
        # embedding-space decontamination (test-vs-train max cosine)
        "embedding_decontaminate":
            lambda sf: similarity.embedding_decontaminate(sf),
    }


def oracle_sql() -> dict[str, str]:
    from rdfx_ray.functions.doc_triples import (
        CITATION_EDGES_SQL as _CITE_SQL,
        DOC_TRIPLES_SQL,
    )

    _PATH_PLUS_SQL = f"""
        WITH RECURSIVE closure(s, o) AS (
            SELECT s, o FROM ({_CITE_SQL})
            UNION
            SELECT c.s, e.o
            FROM closure c JOIN ({_CITE_SQL}) e ON c.o = e.s
        )
        SELECT s AS subj, o AS obj FROM closure
    """
    from rdfx_ray.pipelines import analytics_ext as _EXT
    from rdfx_ray.pipelines import analytics_window as _WIN
    from rdfx_ray.pipelines.asof import (
        EVENTS_ASOF_ORDERS_FORWARD_SQL as _ASOF_FWD_SQL,
        EVENTS_ASOF_ORDERS_SQL as _ASOF_SQL,
    )
    from rdfx_ray.pipelines.rangejoin import (
        EVENTS_IN_ORDER_WINDOWS_SQL as _RANGEJOIN_SQL,
    )
    from rdfx_ray.pipelines.rank import (
        ORDERS_PERCENT_RANK_SQL as _PRANK_SQL,
        ORDERS_PRICE_RANK_SQL as _RANK_SQL,
    )
    from rdfx_ray.pipelines import analytics_r4 as _R4
    from rdfx_ray.pipelines import analytics_r5 as _R5
    from rdfx_ray.pipelines import analytics_r5b as _R5B
    from rdfx_ray.functions.components import (
        _citation_bfs_sql,
        _citation_components_sql,
    )
    _BFS_SQL = _citation_bfs_sql()
    _CC_SQL = _citation_components_sql()
    from rdfx_ray.functions.graph import (
        CUSTOMER_CLUSTERING_SQL as _CLUST_SQL,
        CUSTOMER_LOCAL_CLUSTERING_SQL as _LOCAL_CLUST_SQL,
        CUSTOMER_TRIANGLES_SQL as _TRI_SQL,
    )
    from rdfx_ray.functions.similarity import (
        EMBEDDING_DECONTAMINATE_SQL as _EMB_DECON_SQL,
        PAIR_SIM_HISTOGRAM_SQL as _PAIR_HIST_SQL,
    )
    from rdfx_ray.pipelines.analytics import (
        REVENUE_BY_REGION_SQL as _REVENUE_SQL_REF,
        SESSIONIZE_SQL as _SESSIONIZE_SQL_REF,
    )

    return {
        "kg_doc_triples": DOC_TRIPLES_SQL,
        "kg_merge_dedup": f"SELECT DISTINCT * FROM ({DOC_TRIPLES_SQL})",
        "kg_graph_sizes": f"""
            SELECT graph_iri, COUNT(*) AS n_triples
            FROM ({DOC_TRIPLES_SQL}) GROUP BY graph_iri
        """,
        "kg_predicate_counts": f"""
            SELECT pred, COUNT(*) AS n
            FROM ({DOC_TRIPLES_SQL}) GROUP BY pred
        """,
        "kg_query_filter": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj
            FROM documents WHERE lang = 'en'
        """,
        "kg_query_bgp": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   lang AS va, source AS vb
            FROM documents
        """,
        "kg_query_bgp_native": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   lang AS va, source AS vb
            FROM documents
        """,
        "kg_query_bgp3": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   source AS vb, CAST(n_chars AS VARCHAR) AS vc
            FROM documents WHERE lang = 'en'
        """,
        "kg_query_bgp_var": f"""
            SELECT subj, pred AS p, obj_value AS o
            FROM ({DOC_TRIPLES_SQL})
            WHERE subj IN (SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR)
                           FROM documents WHERE lang = 'en')
        """,
        "kg_query_two_hop": """
            SELECT 'urn:doc:' || CAST(da.doc_id AS VARCHAR) AS a,
                   'urn:doc:' || CAST(db.doc_id AS VARCHAR) AS b,
                   da.source AS v
            FROM documents da JOIN documents db ON da.source = db.source
            WHERE da.lang = 'de'
        """,
        "kg_query_optional": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   lang AS va,
                   CASE WHEN source = 'src3' THEN source END AS vb
            FROM documents
        """,
        "kg_query_union": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   lang AS v FROM documents
            UNION ALL
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), source
            FROM documents
        """,
        "kg_query_minus": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   lang AS va
            FROM documents WHERE source <> 'src3'
        """,
        "kg_query_group_avg": """
            SELECT lang AS v,
                   CAST(SUM(n_chars) * 100 // COUNT(*) AS BIGINT)
                       AS avg_c
            FROM documents GROUP BY lang
        """,
        "kg_validate_shapes": __import__(
            "rdfx_ray.pipelines.validate",
            fromlist=["DOC_SHAPES_SQL"]).DOC_SHAPES_SQL,
        "kg_query_construct": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   'urn:derived:langSource' AS pred,
                   'literal' AS obj_kind,
                   source AS obj_value,
                   CAST(NULL AS VARCHAR) AS obj_datatype,
                   CAST(NULL AS VARCHAR) AS obj_lang,
                   'urn:graph:derived' AS graph_iri
            FROM documents WHERE lang = 'en'
        """,
        "kg_query_group_concat": """
            SELECT lang AS v,
                   string_agg(DISTINCT source, ',' ORDER BY source)
                       AS vals
            FROM documents GROUP BY lang
        """,
        "kg_query_describe": f"""
            SELECT * FROM ({DOC_TRIPLES_SQL})
            WHERE subj IN (
                SELECT subj FROM ({DOC_TRIPLES_SQL})
                WHERE pred = 'https://schema.org/inLanguage'
                  AND obj_value = 'de')
        """,
        "kg_query_group_count": """
            SELECT lang AS v, COUNT(*) AS n
            FROM documents GROUP BY lang
        """,
        "kg_query_filter_expr": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   CAST(n_chars AS BIGINT) AS c
            FROM documents WHERE n_chars >= 300
        """,
        "kg_query_filter_regex": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   source AS v
            FROM documents WHERE regexp_matches(source, 'src1[0-9]$')
        """,
        "kg_query_values": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   lang AS v
            FROM documents WHERE lang IN ('en', 'de')
        """,
        "kg_query_order_limit": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   CAST(n_chars AS BIGINT) AS c
            FROM documents
            ORDER BY c DESC, subj LIMIT 100
        """,
        "kg_query_distinct": """
            SELECT DISTINCT source AS v FROM documents
        """,
        "kg_query_path_alt": f"""
            SELECT DISTINCT subj, obj_value AS obj
            FROM ({DOC_TRIPLES_SQL})
            WHERE pred IN ('https://schema.org/inLanguage',
                           'https://schema.org/isBasedOn')
        """,
        "kg_query_negated_props": f"""
            SELECT subj, pred AS p, obj_value AS o
            FROM ({DOC_TRIPLES_SQL})
            WHERE pred NOT IN ('https://schema.org/characterCount')
        """,
        "kg_query_having": """
            SELECT lang AS v, COUNT(*) AS n
            FROM documents GROUP BY lang HAVING COUNT(*) >= 75
        """,
        "kg_query_group_minmax": """
            SELECT lang AS v, CAST(MIN(n_chars) AS BIGINT) AS min_c,
                   CAST(MAX(n_chars) AS BIGINT) AS max_c
            FROM documents GROUP BY lang
        """,
        "kg_query_path_plus": _PATH_PLUS_SQL,
        "kg_query_path_seq": f"""
            SELECT e1.s AS subj, e2.o AS obj
            FROM ({_CITE_SQL}) e1 JOIN ({_CITE_SQL}) e2 ON e1.o = e2.s
        """,
        "kg_query_path_inverse": f"""
            SELECT o AS subj, s AS obj FROM ({_CITE_SQL})
        """,
        "kg_query_path_zero_or_one": f"""
            SELECT s AS subj, o AS obj FROM ({_CITE_SQL})
            UNION
            SELECT n AS subj, n AS obj FROM (
                SELECT s AS n FROM ({_CITE_SQL})
                UNION
                SELECT o FROM ({_CITE_SQL}))
        """,
        "kg_query_path_star": f"""
            {_PATH_PLUS_SQL}
            UNION
            SELECT n AS subj, n AS obj FROM (
                SELECT s AS n FROM ({_CITE_SQL})
                UNION
                SELECT o FROM ({_CITE_SQL}))
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_qty_c,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_price_c,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_disc_price_c4,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_value_c,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_sessionize": _SESSIONIZE_SQL_REF,
        "revenue_by_region": _REVENUE_SQL_REF,
        "revenue_by_region_shuffle": _REVENUE_SQL_REF,
        "events_topk_users": _EXT.EVENTS_TOPK_USERS_SQL,
        "events_topn_per_type": _EXT.EVENTS_TOPN_PER_TYPE_SQL,
        "customers_no_urgent_order": _EXT.CUSTOMERS_NO_ORDERS_SQL,
        "customers_with_urgent_order": _EXT.CUSTOMERS_WITH_ORDERS_SQL,
        "customers_with_urgent_order_bloom":
            _EXT.CUSTOMERS_WITH_ORDERS_SQL,
        "docs_rollup_stats": _EXT.DOCS_ROLLUP_SQL,
        "events_user_gaps": _EXT.EVENTS_USER_GAPS_SQL,
        "events_hour_coverage": _EXT.EVENTS_HOUR_COVERAGE_SQL,
        "events_distinct_users": _EXT.EVENTS_DISTINCT_USERS_SQL,
        "docs_lang_source_stats": _EXT.DOCS_LANG_SOURCE_SQL,
        "supplier_balance_by_nation": _EXT.SUPPLIER_BALANCE_SQL,
        "orders_priority_filter": _EXT.ORDERS_PRIORITY_SQL,
        "events_hopping_windows": _EXT.EVENTS_HOPPING_SQL,
        "orders_price_quantiles": _EXT.ORDERS_QUANTILES_SQL,
        "events_asof_orders": _ASOF_SQL,
        "events_asof_orders_forward": _ASOF_FWD_SQL,
        "events_in_order_windows": _RANGEJOIN_SQL,
        "events_value_histogram": _WIN.EVENTS_VALUE_HISTOGRAM_SQL,
        "orders_daily_moving": _WIN.ORDERS_DAILY_MOVING_SQL,
        "events_latest_per_user": _WIN.EVENTS_LATEST_PER_USER_SQL,
        "events_value_moments": _WIN.EVENTS_VALUE_MOMENTS_SQL,
        "lineitem_comoments": _WIN.LINEITEM_COMOMENTS_SQL,
        "events_user_rolling": _WIN.EVENTS_USER_ROLLING_SQL,
        "events_props_k_stats": _WIN.EVENTS_PROPS_K_STATS_SQL,
        "events_type_transitions": _WIN.EVENTS_TYPE_TRANSITIONS_SQL,
        "events_hourly_active_users": _WIN.EVENTS_HOURLY_ACTIVE_SQL,
        "events_streaming_tumbling":
            _WIN.EVENTS_STREAMING_TUMBLING_SQL,
        "events_resample_15min": _WIN.EVENTS_RESAMPLE_SQL,
        "orders_year_priority_pivot":
            _EXT.ORDERS_YEAR_PRIORITY_PIVOT_SQL,
        "docs_cube_stats": _EXT.DOCS_CUBE_SQL,
        "orders_price_rank": _RANK_SQL,
        "customer_triangles": _TRI_SQL,
        "customer_clustering": _CLUST_SQL,
        "customer_local_clustering": _LOCAL_CLUST_SQL,
        "events_users_intersect": _EXT.USERS_TYPE_INTERSECT_SQL,
        "docs_max_chars_per_lang": _EXT.DOCS_MAX_CHARS_SQL,
        "events_type_share": _EXT.EVENTS_TYPE_SHARE_SQL,
        "events_value_mode": _EXT.EVENTS_VALUE_MODE_SQL,
        "embedding_pair_sim_histogram": _PAIR_HIST_SQL,
        "embedding_decontaminate": _EMB_DECON_SQL,
        "events_funnel": _EXT.EVENTS_FUNNEL_SQL,
        "orders_price_median2x": _EXT.ORDERS_MEDIAN2X_SQL,
        "brand_revenue": _EXT.BRAND_REVENUE_SQL,
        "orders_lineitem_integrity":
            _EXT.ORDERS_LINEITEM_INTEGRITY_SQL,
        "events_cohort_retention": _EXT.EVENTS_COHORT_RETENTION_SQL,
        "tpch_q3ish": _EXT.TPCH_Q3ISH_SQL,
        "events_users_except": _EXT.USERS_TYPE_EXCEPT_SQL,
        "docs_sample_hash": _R4.DOCS_SAMPLE_HASH_SQL,
        "events_stratified_sample":
            _R4.EVENTS_STRATIFIED_SAMPLE_SQL,
        "orders_unpivot": _R4.ORDERS_UNPIVOT_SQL,
        "nation_region_cross": _R4.NATION_REGION_CROSS_SQL,
        "docs_grouping_sets": _R4.DOCS_GROUPING_SETS_SQL,
        "orders_price_mad": _R4.ORDERS_PRICE_MAD_SQL,
        "events_above_p95": _R4.EVENTS_ABOVE_P95_SQL,
        "corpus_epoch_shuffle": _R4.CORPUS_EPOCH_SHUFFLE_SQL,
        "docs_chunk_overlap": _R4.DOCS_CHUNK_OVERLAP_SQL,
        "docs_lang_sample": _R4.DOCS_LANG_SAMPLE_SQL,
        "events_time_weighted": _R4.EVENTS_TIME_WEIGHTED_SQL,
        "events_user_rolling_time":
            _R4.EVENTS_USER_ROLLING_TIME_SQL,
        "orders_monthly_delta": _R4.ORDERS_MONTHLY_DELTA_SQL,
        "events_user_islands": _R5.EVENTS_USER_ISLANDS_SQL,
        "orders_skyline": _R5.ORDERS_SKYLINE_SQL,
        "docs_familiarity": _R5._familiarity_sql(),
        "docs_ngram_topk_per_lang": _R5.DOCS_NGRAM_TOPK_SQL,
        "docs_edit_distance_pairs": _R5.DOCS_EDIT_PAIRS_SQL,
        "docs_fuzzy_clusters": _R5.DOCS_FUZZY_CLUSTERS_SQL,
        "docs_weighted_sample": _R5._weighted_sample_sql(),
        "docs_top_terms": _R5.DOCS_TOP_TERMS_SQL,
        "events_props_stats": _R5.EVENTS_PROPS_STATS_SQL,
        "events_user_transitions":
            _R5B.EVENTS_USER_TRANSITIONS_SQL,
        "orders_shipping_priority":
            _R5B.ORDERS_SHIPPING_PRIORITY_SQL,
        "customer_returns_topn": _R5B.CUSTOMER_RETURNS_TOPN_SQL,
        "promo_revenue_share": _R5B.PROMO_REVENUE_SHARE_SQL,
        "orders_cohort_retention":
            _R5B.ORDERS_COHORT_RETENTION_SQL,
        "events_anomaly_zscore": _R5B.EVENTS_ANOMALY_ZSCORE_SQL,
        "docs_segment_dedup": _R5B.DOCS_SEGMENT_DEDUP_SQL,
        "orders_revenue_deciles": _R5B.ORDERS_REVENUE_DECILES_SQL,
        "events_top_paths": _R5B.EVENTS_TOP_PATHS_SQL,
        "events_dau_wau": _R5B.EVENTS_DAU_WAU_SQL,
        "docs_vocab_coverage": _R5B.DOCS_VOCAB_COVERAGE_SQL,
        "orders_rfm_segments": _R5B.ORDERS_RFM_SEGMENTS_SQL,
        "docs_bigram_pmi": _R5B.DOCS_BIGRAM_PMI_SQL,
        "orders_percent_rank": _PRANK_SQL,
        "citation_bfs_depth": _BFS_SQL,
        "citation_components": _CC_SQL,
        "kg_query_ask": """
            SELECT 'lang_en' AS probe,
                   CAST(CASE WHEN EXISTS (SELECT 1 FROM documents
                                          WHERE lang = 'en')
                        THEN 1 ELSE 0 END AS BIGINT) AS ask
            UNION ALL
            SELECT 'lang_zz',
                   CAST(CASE WHEN EXISTS (SELECT 1 FROM documents
                                          WHERE lang = 'zz')
                        THEN 1 ELSE 0 END AS BIGINT)
        """,
        "kg_query_group_count_distinct": """
            SELECT lang AS g, COUNT(DISTINCT source) AS n_distinct
            FROM documents GROUP BY lang
        """,
        "kg_query_graph_scoped": f"""
            SELECT pred, COUNT(*) AS n
            FROM ({DOC_TRIPLES_SQL})
            WHERE graph_iri = 'urn:graph:3'
            GROUP BY pred
        """,
        "kg_query_bind": """
            SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
                   source AS v,
                   CAST(LENGTH(source) AS BIGINT) AS len
            FROM documents
        """,
        "text_token_stats": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                       AS n_alpha
            FROM documents
        """,
        "text_fingerprints": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                       AS fingerprint
            FROM documents
        """,
        "text_quality": r"""
            WITH t AS (
                SELECT doc_id,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '')) AS n_tokens,
                       length(text) AS n_chars,
                       length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                           AS n_alpha
                FROM documents)
            SELECT doc_id, n_tokens,
                   LEAST(100, GREATEST(0,
                       LEAST(n_tokens, 50)
                       + CAST(FLOOR(CAST(n_alpha AS DOUBLE)
                                    / GREATEST(n_chars, 1) * 40 + 0.5)
                              AS BIGINT)
                       + CASE WHEN CAST(n_chars AS DOUBLE)
                                   / GREATEST(n_tokens, 1) BETWEEN 3 AND 10
                              THEN 10 ELSE 0 END)) AS quality_score
            FROM t
        """,
        "text_bpe_tokens": __import__("rdfx_ray.functions.text",
                                      fromlist=["BPE_TOKEN_STATS_SQL"]
                                      ).BPE_TOKEN_STATS_SQL,
        "text_lang_id": __import__("rdfx_ray.functions.text",
                                   fromlist=["LANG_ID_SQL"]).LANG_ID_SQL,
        "text_ngram_counts": __import__(
            "rdfx_ray.functions.text",
            fromlist=["NGRAM_COUNTS_SQL"]).NGRAM_COUNTS_SQL,
        "text_doc_frequency": __import__(
            "rdfx_ray.functions.text",
            fromlist=["DOC_FREQUENCY_SQL"]).DOC_FREQUENCY_SQL,
        "docs_model_scores": __import__(
            "rdfx_ray.functions.scoring",
            fromlist=["SCORE_DOCUMENTS_SQL"]).SCORE_DOCUMENTS_SQL,
        "docs_repetition_stats": __import__(
            "rdfx_ray.functions.text",
            fromlist=["REPETITION_STATS_SQL"]).REPETITION_STATS_SQL,
        "docs_redact_pii": __import__(
            "rdfx_ray.functions.text",
            fromlist=["REDACT_PII_SQL"]).REDACT_PII_SQL,
        "corpus_curate": __import__(
            "rdfx_ray.pipelines.curate",
            fromlist=["CURATE_SQL"]).CURATE_SQL,
        "corpus_pack_sequences": r"""
            WITH t AS (
                SELECT doc_id,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '')) AS n_tokens
                FROM documents)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER w, 0) AS BIGINT)
                       AS start_offset,
                   CAST(COALESCE(SUM(n_tokens) OVER w, 0) // 2048
                        AS BIGINT) AS bin_id
            FROM t
            WINDOW w AS (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
        """,
        "corpus_split_hash": """
            WITH t AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS UBIGINT) % 100
                           AS bucket_val
                FROM documents)
            SELECT doc_id, CAST(bucket_val AS BIGINT) AS bucket_val,
                   CASE WHEN bucket_val < 10 THEN 'test'
                        ELSE 'train' END AS split
            FROM t
        """,
        "corpus_balance_sources": __import__(
            "rdfx_ray.functions.packing",
            fromlist=["BALANCE_SOURCES_SQL"]).BALANCE_SOURCES_SQL,
        "corpus_decontaminate": __import__(
            "rdfx_ray.functions.packing",
            fromlist=["DECONTAMINATE_SQL"]).DECONTAMINATE_SQL,
        "ann_topk_quantized": __import__(
            "rdfx_ray.functions.similarity",
            fromlist=["ANN_TOPK_QUANTIZED_SQL"]).ANN_TOPK_QUANTIZED_SQL,
        "embedding_label_centroids": __import__(
            "rdfx_ray.functions.similarity",
            fromlist=["LABEL_CENTROIDS_SQL"]).LABEL_CENTROIDS_SQL,
        "dedup_exact": """
            SELECT md5(text) AS text_hash,
                   MIN(doc_id) AS keeper_doc_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        # dedup_minhash_pairs / dedup_simhash_pairs /
        # dedup_embedding_pairs / ann_* / kg_extract_triples /
        # kg_media_features / kg_convert_roundtrip: genuinely
        # non-SQL-expressible (sketches, LSH, float-order-sensitive
        # ANN ranking, stateful extraction) → rows-only checks.
    }
