"""The reference CLI verbs — convert / merge / clean — in two planes.

Driver plane (small files, byte-compatible with the reference CLI):
``convert`` (rdfx/rdfx_cli.py:61-71 incl. the output-beside-input
quirk), ``merge`` (:74-94, set-union into one graph), ``clean_ttl``
(:106-152, used-namespace filter + sorted rebind + comment
preservation), ``persist_to`` (:97-103).

Distributed plane (many/large files): the same semantics expressed as
Ray Data pipelines — ``convert_files`` is an embarrassingly parallel
map over files; ``merge_files`` unions per-file triple tables and
exact-dedups (the one required shuffle, replacing the reference's
driver-RAM accumulator graph — SURVEY.md §3.2).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union

from ..persistence import File, PersistenceSystem
from ..rdf.formats import RDF_FILE_ENDINGS, get_input_format
from ..rdf.graph import Graph


# --------------------------------------------------------------------------
# Driver plane (reference-compatible)
# --------------------------------------------------------------------------

def make_output_file_path(input_file_path: Path, input_format: str,
                          output_format: str, in_place: bool) -> Path:
    """Output-naming rule (reference rdfx/rdfx_cli.py:48-58; dead code
    there — kept for surface parity): stem + '.new' iff same format
    and not in place, + mapped extension, beside the input."""
    from ..rdf.formats import OUTPUT_FILE_ENDINGS

    input_file_path = Path(input_file_path)
    output_file_name = input_file_path.name.split(".")[0]
    if input_format == output_format and not in_place:
        output_file_name += ".new"
    output_file_name = (output_file_name + "."
                        + OUTPUT_FILE_ENDINGS[output_format])
    return input_file_path.parent / output_file_name


def convert(input_file_path: Path, persistence_system, output_filename: str,
            output_format: str, comments: Optional[List[str]] = None):
    """Parse one file, write it in output_format. Mirrors the quirk
    that converted files land beside the input (output_file_path
    override, rdfx/rdfx_cli.py:69-71 — pinned by
    tests/test_cmd_line_util.py)."""
    input_file_path = Path(input_file_path)
    input_format = get_input_format(input_file_path)
    output_file_path = input_file_path.parent
    g = Graph().parse(input_file_path.read_text(encoding="utf-8"), input_format)
    persistence_system.write(g, output_filename, output_format, comments,
                             output_file_path)


def merge(rdf_files: List[Path], persistence_system, output_format: str,
          output_filename: str, leading_comments: Optional[List[str]] = None):
    """Set-union merge of files into one graph (rdfx/rdfx_cli.py:74-94):
    identical ground triples dedup; blank nodes stay distinct per file
    (fresh bnode labels per parse)."""
    for f in rdf_files:
        if not f.name.endswith(tuple(RDF_FILE_ENDINGS.keys())):
            raise ValueError(
                "Files to be merged must have a known RDF suffix (one of "
                + ", ".join(RDF_FILE_ENDINGS) + ")"
            )
    g = Graph()
    for f in rdf_files:
        g.parse(Path(f).read_text(encoding="utf-8"),
                RDF_FILE_ENDINGS[f.suffix.lstrip(".")])
    persistence_system.write(g, output_filename, output_format, leading_comments)


def persist_to(persistence_system: PersistenceSystem, g: Graph):
    # NOTE the reference *returns* (not raises) the ValueError
    # (rdfx/rdfx_cli.py:97-103); we keep raise semantics as the sane
    # variant and document the deviation.
    if not issubclass(type(persistence_system), PersistenceSystem):
        raise ValueError(
            "You must select one of the subclasses of PersistenceSystem "
            "to use for the persistence_system argument"
        )
    persistence_system.write(g)


def clean_ttl(input_file_path: Union[str, Path]) -> Path:
    """Remove unused namespace bindings, re-serialize with prefixes in
    sorted order, preserve the leading comment block
    (rdfx/rdfx_cli.py:106-152). Our serializer emits only bound+used
    prefixes sorted by prefix, which is the documented semantics the
    reference's golden tests encode."""
    import os

    input_file_path = Path(input_file_path)
    text = input_file_path.read_text(encoding="utf-8", errors="ignore")

    # leading comment block scan (reference :109-123)
    comments_list: List[str] = []
    for index, line in enumerate(text.split("\n")):
        stripped = line.strip()
        if stripped.startswith("#") and index == len(comments_list):
            comments_list.append(stripped[2:] if stripped.startswith("# ")
                                 else stripped.lstrip("#"))
        else:
            break

    g = Graph().parse(text, get_input_format(input_file_path))
    os.remove(input_file_path)
    ps = File(directory=input_file_path.parent)
    if comments_list:
        return ps.write(g=g, filename=input_file_path.stem, rdf_format="ttl",
                        leading_comments=comments_list)
    return ps.write(g=g, filename=input_file_path.stem, rdf_format="ttl")


# --------------------------------------------------------------------------
# Distributed plane (Ray Data)
# --------------------------------------------------------------------------

def _parse_file_to_rows(path: str):
    """Parse one RDF file into columnar triple rows; blank nodes are
    skolemized per source file so cross-file identity matches the
    reference's fresh-bnode-per-parse behavior."""
    import hashlib

    import pyarrow as pa

    from ..rdf.columnar import triples_to_table

    p = Path(path)
    fmt = get_input_format(p)
    g = Graph().parse(p.read_text(encoding="utf-8"), fmt)
    tag = hashlib.md5(str(p).encode()).hexdigest()[:10]
    table = triples_to_table(iter(g), skolem_prefix=f"file-{tag}")
    return table.append_column(
        "source_path", pa.array([str(p)] * table.num_rows, pa.string())
    )


def convert_files(paths: List[Union[str, Path]], output_dir: Union[str, Path],
                  output_format: str,
                  leading_comments: Optional[List[str]] = None) -> List[Path]:
    """Distributed convert: one task per file (no shuffle). Returns the
    written paths. Ray must already be initialised."""
    import ray
    import ray.data as rd

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    def _convert_batch(batch):
        import pyarrow as pa
        outs = []
        for path in batch["path"].to_pylist():
            p = Path(path)
            fmt = get_input_format(p)
            g = Graph().parse(p.read_text(encoding="utf-8"), fmt)
            ps = File(output_dir)
            out = ps.write(g, p.stem, output_format, leading_comments)
            outs.append(str(out))
        return pa.table({"written": pa.array(outs, pa.string())})

    ds = rd.from_items([{"path": str(p)} for p in paths])
    written = ds.map_batches(_convert_batch, batch_format="pyarrow",
                             batch_size=1)
    return [Path(r["written"]) for r in written.take_all()]


def read_rdf_files(paths: List[Union[str, Path]]):
    """Source: Dataset of columnar triples from a list of RDF files
    (one parse task per file; bnodes skolemized per file)."""
    import ray.data as rd

    def _parse_batch(batch):
        import pyarrow as pa
        tables = [_parse_file_to_rows(p) for p in batch["path"].to_pylist()]
        return pa.concat_tables(tables) if tables else tables

    ds = rd.from_items([{"path": str(p)} for p in paths])
    return ds.map_batches(_parse_batch, batch_format="pyarrow", batch_size=1)


# deduped triples above which an NT merge output streams batch-rendered
# lines to the file instead of funnelling through a driver-side Graph
# (a Graph holds every term as a Python object — ~100 bytes/term)
MERGE_DRIVER_GRAPH_CUTOFF_ROWS = 2_000_000


def merge_files(paths: List[Union[str, Path]], output_path: Union[str, Path],
                output_format: str = "nt",
                leading_comments: Optional[List[str]] = None,
                driver_graph_cutoff_rows: int =
                MERGE_DRIVER_GRAPH_CUTOFF_ROWS) -> Path:
    """Distributed merge: union per-file triple datasets, exact-dedup
    on the full triple key (Ray groupby shuffle), serialize once.

    The deduped set is MATERIALIZED in the object store (distributed
    blocks, spillable — not driver memory), so its exact count is free
    and iteration never re-runs the shuffle. Count-gated output: an NT
    result above ``driver_graph_cutoff_rows`` is globally sorted and
    streamed to the file one vectorized ``nt_bytes`` batch at a time —
    O(batch) driver memory, no Graph. Below the cutoff (and for every
    non-NT format, whose serializers need whole-graph prefix/bnode
    context) the reference-shaped driver-Graph path runs unchanged."""
    for f in [Path(p) for p in paths]:
        if not f.name.endswith(tuple(RDF_FILE_ENDINGS.keys())):
            raise ValueError(
                "Files to be merged must have a known RDF suffix (one of "
                + ", ".join(RDF_FILE_ENDINGS) + ")"
            )
    ds = read_rdf_files(paths)

    # local pre-dedup per batch, then global exact dedup
    def _local_dedup(batch):
        import polars as pl
        df = pl.from_arrow(batch)
        df = df.unique(subset=["subj", "pred", "obj_kind", "obj_value",
                               "obj_datatype", "obj_lang"], keep="first")
        return df.to_arrow().cast(batch.schema)

    # DISTINCT as a vectorized aggregate (one row per key) — avoids
    # per-group Python over mostly-singleton groups
    from ray.data.aggregate import Count

    key = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
           "obj_lang"]
    deduped = (
        ds.map_batches(_local_dedup, batch_format="pyarrow")
          .groupby(key)
          .aggregate(Count(alias_name="_n"))
    )

    from ..rdf.columnar import table_to_triples
    import pyarrow as pa

    deduped = deduped.materialize()
    output_path = Path(output_path)

    if (output_format == "nt"
            and deduped.count() > driver_graph_cutoff_rows):
        # leading comments require turtle (leading_comment_validator) —
        # mirror that contract before writing anything
        from ..persistence import PersistenceSystem
        PersistenceSystem.leading_comment_validator(leading_comments,
                                                    output_format)
        out_file = output_path.parent / f"{output_path.stem}.nt"
        output_path.parent.mkdir(parents=True, exist_ok=True)

        def render(b: pa.Table) -> pa.Table:
            # render BEFORE the sort: distinct triples give distinct
            # lines, and sorting one never-null string column avoids
            # Ray sort choking on the all-null obj_datatype/obj_lang
            # key columns
            from ..sinks.nt_lines import nt_lines
            return pa.table({"line": pa.array(
                nt_lines(b.select(key)).to_numpy(), pa.string())})

        sorted_ds = deduped.map_batches(
            render, batch_format="pyarrow").sort("line")
        with out_file.open("wb") as f:
            for b in sorted_ds.iter_batches(batch_size=500_000,
                                            batch_format="pyarrow"):
                if b.num_rows:
                    f.write(("\n".join(b.column("line").to_pylist())
                             + "\n").encode("utf-8"))
        return out_file

    batches = [b for b in deduped.iter_batches(batch_size=500_000,
                                               batch_format="pyarrow")]
    table = pa.concat_tables([b.select(["subj", "pred", "obj_kind",
                                        "obj_value", "obj_datatype",
                                        "obj_lang"]) for b in batches])
    g = Graph()
    for t in table_to_triples(table):
        g.add(t)
    ps = File(output_path.parent)
    return ps.write(g, output_path.stem, output_format, leading_comments)


def read_nt_dataset(paths):
    """At-scale NT ingestion: ``read_text`` (line-parallel) →
    fully-vectorized per-batch parse via a single pandas
    ``str.extract`` of the NT grammar — no per-line Python. This is
    the path for 10^12-triple N-Triples interchange files; other
    formats (turtle/xml/json-ld) are document-structured and parse
    per file via :func:`read_rdf_files`."""
    import ray.data as rd

    from ..rdf.columnar import COLUMNAR_SCHEMA

    def parse_lines(batch):
        import pandas as pd
        import pyarrow as pa

        from ..rdf.ntriples import _NT_LINE
        from ..rdf.terms import unescape_string

        s = pd.Series(batch.column("text").to_pylist(), dtype="object")
        s = s[s.str.strip().astype(bool)]
        s = s[~s.str.lstrip().str.startswith("#")]
        if s.empty:
            return COLUMNAR_SCHEMA.empty_table()
        ext = s.str.extract(_NT_LINE, expand=True)
        bad = ext["p_iri"].isna() & s.notna()
        if bad.any():
            raise ValueError(
                f"Invalid N-Triples line: {s[bad].iloc[0]!r}")

        subj = ext["s_iri"].fillna("_:" + ext["s_bn"].fillna(""))
        obj_kind = pd.Series("literal", index=ext.index)
        obj_kind[ext["o_iri"].notna()] = "iri"
        obj_kind[ext["o_bn"].notna()] = "bnode"
        obj_value = ext["o_iri"].fillna(ext["o_bn"]).fillna(ext["o_lex"])
        # unescape only rows that contain backslashes (rare)
        esc = obj_value.str.contains("\\", regex=False, na=False)
        if esc.any():
            obj_value[esc] = obj_value[esc].map(unescape_string)
        subj_esc = subj.str.contains("\\", regex=False, na=False)
        if subj_esc.any():
            subj[subj_esc] = subj[subj_esc].map(unescape_string)

        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(ext["p_iri"], pa.string()),
            "obj_kind": pa.array(obj_kind, pa.string()),
            "obj_value": pa.array(obj_value, pa.string()),
            # explicit ^^xsd:string normalizes to a plain literal,
            # matching terms.literal() (the tuple-plane constructor) so
            # the same NT ingested via either path yields equal rows
            "obj_datatype": pa.array(
                ext["o_dt"].where(
                    ext["o_dt"].notna()
                    & (ext["o_dt"]
                       != "http://www.w3.org/2001/XMLSchema#string"),
                    None), pa.string()),
            "obj_lang": pa.array(
                ext["o_lang"].where(ext["o_lang"].notna(), None), pa.string()),
        }).cast(COLUMNAR_SCHEMA)

    ds = rd.read_text([str(p) for p in paths])
    return ds.map_batches(parse_lines, batch_format="pyarrow",
                          batch_size=65536)


def write_turtle_partitions(out_dir, prefixes=None):
    """Distributed 'clean'-semantics turtle materialization: one .ttl
    per finished bucket partition, each with exactly its used prefixes
    bound and sorted (the reference clean verb per graph,
    rdfx/rdfx_cli.py:127-143, applied partition-parallel). The prefix
    table is a broadcast side input; serialization reuses the
    golden-compatible turtle writer per bucket.

    Returns the written paths. Buckets are independent tasks (no
    shuffle: triples are already partitioned by subject hash)."""
    import ray.data as rd

    from ..rdf.terms import WELL_KNOWN_PREFIXES

    out = Path(out_dir)
    buckets = sorted(p.parent for p in out.glob("final/bucket=*/triples.parquet"))
    prefix_map = dict(WELL_KNOWN_PREFIXES)
    if prefixes:
        prefix_map.update(prefixes)

    def per_bucket(batch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..rdf.columnar import table_to_triples
        from ..rdf.turtle import serialize_turtle

        written = []
        for d in batch.column("dir").to_pylist():
            d = Path(d)
            t = pq.read_table(d / "triples.parquet",
                              columns=["subj", "pred", "obj_kind",
                                       "obj_value", "obj_datatype",
                                       "obj_lang"])
            text = serialize_turtle(table_to_triples(t), prefix_map)
            p = d / (d.name.replace("bucket=", "part-") + ".ttl")
            p.write_text(text, encoding="utf-8")
            written.append(str(p))
        return pa.table({"written": pa.array(written, pa.string())})

    ds = rd.from_items([{"dir": str(d)} for d in buckets])
    res = ds.map_batches(per_bucket, batch_format="pyarrow", batch_size=1)
    return [Path(r["written"]) for r in res.take_all()]
