"""convert / merge / clean verb tests, mirroring the reference e2e
suites (tests/test_convert.py, test_merge.py, test_cmd_line_util.py)."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from rdfx_ray.persistence import File
from rdfx_ray.pipelines.verbs import clean_ttl, convert, merge
from rdfx_ray.rdf import Graph, isomorphic

DATA = Path(__file__).parent / "data"


def test_convert_writes_beside_input(tmp_path):
    # the reference quirk: -o is overridden, converted files land
    # beside inputs (rdfx/rdfx_cli.py:69-71)
    src = tmp_path / "file_01.ttl"
    shutil.copy(DATA / "file_01.ttl", src)
    ps = File(tmp_path / "elsewhere")
    convert(src, ps, "converted", "nt")
    out = tmp_path / "converted.nt"
    assert out.exists()
    assert not (tmp_path / "elsewhere" / "converted.nt").exists()
    g = Graph().parse(out.read_text(), "nt")
    assert len(g) == 6


def test_convert_all_formats_roundtrip(tmp_path):
    src_graph = Graph().parse((DATA / "file_01.ttl").read_text())
    for fmt in ("turtle", "xml", "json-ld", "nt", "n3"):
        src = tmp_path / f"in_{fmt}.ttl"
        shutil.copy(DATA / "file_01.ttl", src)
        convert(src, File(tmp_path), f"out_{fmt}", fmt)
        out = tmp_path / f"out_{fmt}.{fmt}"
        back = Graph().parse(out.read_text(), fmt)
        assert isomorphic(src_graph, back), fmt


def test_merge_three_files_18_triples(tmp_path):
    # FIXTURES.md §4: distinct subjects → 18 triples
    files = [DATA / "file_01.ttl", DATA / "file_02.rdf", DATA / "file_03.json-ld"]
    ps = File(tmp_path)
    merge(files, ps, "nt", "merged")
    g = Graph().parse((tmp_path / "merged.nt").read_text(), "nt")
    assert len(g) == 18


def test_merge_self_dedups(tmp_path):
    files = [DATA / "file_01.ttl", DATA / "file_01.ttl"]
    merge(files, File(tmp_path), "nt", "merged")
    g = Graph().parse((tmp_path / "merged.nt").read_text(), "nt")
    assert len(g) == 6


def test_merge_rejects_unknown_suffix(tmp_path):
    bad = tmp_path / "data.csv"
    bad.write_text("x")
    with pytest.raises(ValueError, match="known RDF suffix"):
        merge([bad], File(tmp_path), "nt", "merged")


def test_clean_ttl_drops_unused_prefix(tmp_path):
    src = tmp_path / "dirty.ttl"
    src.write_text(
        "# keep this comment\n\n"
        "@prefix used: <http://used.example/> .\n"
        "@prefix unused: <http://unused.example/> .\n\n"
        "used:s used:p used:o .\n"
    )
    out = clean_ttl(src)
    text = out.read_text()
    assert "unused.example" not in text
    assert "@prefix used: <http://used.example/> ." in text
    assert text.startswith("# keep this comment\n\n")
    g = Graph().parse(text)
    assert len(g) == 1


def test_clean_ttl_sorted_prefixes(tmp_path):
    src = tmp_path / "order.ttl"
    src.write_text(
        "@prefix zz: <http://zz.example/> .\n"
        "@prefix aa: <http://aa.example/> .\n\n"
        "zz:s zz:p aa:o .\n"
    )
    text = clean_ttl(src).read_text()
    assert text.index("@prefix aa:") < text.index("@prefix zz:")


def test_cli_convert_and_merge(tmp_path):
    # subprocess e2e like the reference's test_cmd_line_util.py
    work = tmp_path / "work"
    work.mkdir()
    for f in ("file_01.ttl", "file_02.rdf", "file_03.json-ld"):
        shutil.copy(DATA / f, work / f)
    r = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "convert", "-f", "xml",
         "-o", str(work), str(work / "file_01.ttl")],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert (work / "file_01.xml").exists()

    r = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "merge", "-f", "ttl",
         "-o", str(tmp_path), str(work)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    merged = tmp_path / "merged.ttl"
    assert merged.exists()
    # merged graph holds all three subjects (18 + the 6 from the
    # converted xml copy's subject duplicate = still 18 distinct)
    g = Graph().parse(merged.read_text())
    assert len(g) == 18


def test_distributed_merge_matches_driver_merge(tmp_path, ray_session):
    from rdfx_ray.pipelines.verbs import merge_files
    files = [DATA / "file_01.ttl", DATA / "file_02.rdf",
             DATA / "file_03.json-ld", DATA / "file_01.ttl"]
    out = merge_files(files, tmp_path / "dmerged", "nt")
    g = Graph().parse(out.read_text(), "nt")
    assert len(g) == 18


def test_distributed_convert(tmp_path, ray_session):
    from rdfx_ray.pipelines.verbs import convert_files
    written = convert_files([DATA / "file_01.ttl", DATA / "file_02.rdf"],
                            tmp_path, "nt")
    assert sorted(p.name for p in written) == ["file_01.nt", "file_02.nt"]
    for p in written:
        assert len(Graph().parse(p.read_text(), "nt")) == 6


def test_cli_convert_directory(tmp_path):
    # reference: test_convert_directory — converting a directory
    # creates one output per input beside the originals
    work = tmp_path / "d"
    work.mkdir()
    for f in ("file_01.ttl", "file_02.rdf", "file_03.json-ld"):
        shutil.copy(DATA / f, work / f)
    r = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "convert", "-f", "nt",
         "-o", str(work), str(work)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    made = sorted(p.name for p in work.glob("*.nt"))
    assert made == ["file_01.nt", "file_02.nt", "file_03.nt"]
    for p in work.glob("*.nt"):
        assert len(Graph().parse(p.read_text(), "nt")) == 6


def test_cli_extract_and_gen(tmp_path):
    """CLI gen → extract end-to-end (subprocess owns its Ray session)."""
    import json
    corpus = tmp_path / "corpus"
    r = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "gen", "--output", str(corpus),
         "--docs", "300", "--entities", "100"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "wrote 300 docs" in r.stdout

    out = tmp_path / "kg"
    r = subprocess.run(
        [sys.executable, "-m", "rdfx_ray", "extract", "--input", str(corpus),
         "--output", str(out), "--buckets", "4", "--entities", "100",
         "--batch-size", "100", "--cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 0, r.stderr
    job = json.loads(r.stdout.strip().splitlines()[-1])
    assert job["triples_final"] > 0
    assert len(list(out.glob("final/bucket=*/part-*.nt"))) == 4


def test_nt_xsd_string_normalizes_like_literal(tmp_path, ray_session):
    """An explicit ^^xsd:string in NT must ingest identically to a
    plain literal via BOTH planes: the columnar read_nt_dataset and
    the tuple-plane Graph.parse (ADVICE round 1: the two paths
    disagreed, breaking cross-plane dedup)."""
    from rdfx_ray.pipelines.verbs import read_nt_dataset
    from rdfx_ray.rdf.graph import Graph

    nt = ('<urn:s> <urn:p> "v"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
          '<urn:s2> <urn:p> "v" .\n')
    f = tmp_path / "x.nt"
    f.write_text(nt)
    df = read_nt_dataset([f]).to_pandas().sort_values("subj")
    assert df["obj_datatype"].isna().all()
    g = Graph().parse(nt, "nt")
    # tuple plane: object term = ("literal", lexical, datatype, lang);
    # xsd:string drops to None there too
    dts = {t[2][2] for t in g}
    assert dts == {None}


def test_cli_pipe_file_to_file(tmp_path, capsys):
    """The app-flow CLI: File read → preview → File write with
    comments carried from input (rdfxWebApp semantics)."""
    import shutil
    from rdfx_ray.cli import main
    from rdfx_ray.rdf import Graph, isomorphic

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    data = Path(__file__).parent / "data" / "file_01.ttl"
    # prepend a comment block so 'from-input' has something to carry
    (src_dir / "x.ttl").write_text("# hello\n\n" + data.read_text())
    out_dir = tmp_path / "out"
    rc = main(["pipe", "--read-system", "File", "--read-dir", str(src_dir),
               "--read-name", "x.ttl", "--write-system", "File",
               "--write-dir", str(out_dir), "--write-name", "y",
               "-f", "ttl", "--preview"])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "# hello" in outp          # preview pane shows the comments
    written = out_dir / "y.ttl"
    assert written.exists()
    comments, g2 = __import__("rdfx_ray.persistence",
                              fromlist=["File"]).File(out_dir).read("y.ttl")
    assert comments == ["hello"]
    g1 = Graph().parse(data.read_text(), "turtle")
    assert isomorphic(g1, g2)


def test_cli_pipe_env_var_error(tmp_path):
    import os
    import pytest
    from rdfx_ray.cli import main
    os.environ.pop("READ_SOP_LOCATION", None)
    with pytest.raises(ValueError, match='"READ_SOP_LOCATION" not set'):
        main(["pipe", "--read-system", "SOP", "--read-name", "urn:x",
              "--write-system", "String"])


def test_merge_large_output_streams_without_driver_graph(tmp_path,
                                                         ray_session):
    """Above the deduped-row cutoff an NT merge streams sorted
    batch-rendered lines to the file (no driver Graph). Same triple
    SET as the small-path result; duplicates across inputs collapse."""
    from rdfx_ray.pipelines.verbs import merge_files
    from rdfx_ray.rdf import Graph

    # 3 NT files, 60k lines total with an overlapping middle third
    def lines(lo, hi):
        return "".join(
            f"<urn:s:{i}> <urn:p> \"v{i}\" .\n" for i in range(lo, hi))
    (tmp_path / "a.nt").write_text(lines(0, 25_000))
    (tmp_path / "b.nt").write_text(lines(15_000, 40_000))
    (tmp_path / "c.nt").write_text(lines(30_000, 50_000))
    files = [tmp_path / n for n in ("a.nt", "b.nt", "c.nt")]

    big = merge_files(files, tmp_path / "big", "nt",
                      driver_graph_cutoff_rows=10_000)   # force streaming
    small = merge_files(files, tmp_path / "small", "nt")  # driver Graph
    g_big = Graph().parse(big.read_text(), "nt")
    g_small = Graph().parse(small.read_text(), "nt")
    assert len(g_big) == 50_000
    assert set(g_big) == set(g_small)
    # streamed output is globally sorted by the triple key
    body = [l for l in big.read_text().splitlines() if l.strip()]
    assert body == sorted(body)


def test_cli_profile_and_curate(tmp_path):
    """Subprocess e2e for the training-data verbs: profile prints one
    JSON line; curate writes a kept-doc manifest parquet."""
    import json

    env = {**__import__("os").environ, "RAY_GRAFT_CPUS": "4"}
    r = subprocess.run(
        ["python", "-m", "rdfx_ray", "profile",
         "--input", "/root/testdata/sf0.001"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    prof = json.loads(r.stdout.strip().splitlines()[-1])
    assert prof["n_docs"] == 500 and prof["total_tokens"] > 0

    out = tmp_path / "curated"
    r = subprocess.run(
        ["python", "-m", "rdfx_ray", "curate",
         "--input", "/root/testdata/sf0.001", "--output", str(out)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.dataset as pads
    t = pads.dataset(str(out)).to_table()
    assert 0 < t.num_rows < 500
    assert set(t.schema.names) == {"doc_id", "n_tokens", "start_offset"}
