"""Persistence-system tests mirroring the reference suites
(tests/test_persistence_system_file.py, tests/test_persistence_systems
_generic_methods.py, SOP URN helpers)."""

from pathlib import Path

import pytest

from rdfx_ray.persistence import (
    PERSISTENCE_SYSTEMS,
    File,
    Fuseki,
    GraphDB,
    SOP,
    String,
    prepare_files_list,
)
from rdfx_ray.rdf import Graph

DATA = Path(__file__).parent / "data"

TINY = """<a:> <b:> <c:> .
<a:> <d:> <e:> .
"""


def test_file_write_creates_file(tmp_path):
    g = Graph().parse(TINY, "nt")
    ps = File(tmp_path)
    out = ps.write(g, filename="file_test", rdf_format="ttl")
    assert out.exists()
    assert ps.asset_exists("file_test.ttl")


def test_file_roundtrip_with_comments(tmp_path):
    g = Graph().parse((DATA / "file_01.ttl").read_text())
    ps = File(tmp_path)
    comments = ["test comment one", "test comment two"]
    out = ps.write(g, "commented", "turtle", comments)
    text = out.read_text()
    assert text.startswith("# test comment one\n# test comment two\n\n@prefix")
    back_comments, back = ps.read("commented.turtle", "turtle")
    assert back_comments == comments
    assert back.isomorphic(g)


def test_file_trailing_newline_trim(tmp_path):
    # reference File.write removes one of a doubled trailing newline
    # (persistence_systems.py:207-209)
    g = Graph().parse(TINY, "nt")
    out = File(tmp_path).write(g, "trim", "turtle")
    text = out.read_text()
    assert text.endswith(" .\n")
    assert not text.endswith("\n\n")


def test_string_roundtrip():
    g = Graph().parse((DATA / "file_01.ttl").read_text())
    s = String().write(g, "turtle", ["a comment"])
    comments, back = String().read(s, "turtle")
    assert comments == ["a comment"]
    assert back.isomorphic(g)


def test_file_rejects_bad_directory_type():
    with pytest.raises(ValueError):
        File(123)


def test_prepare_files_list_single():
    assert prepare_files_list(str(DATA / "file_01.ttl")) == [DATA / "file_01.ttl"]
    assert prepare_files_list(DATA / "file_01.ttl") == [DATA / "file_01.ttl"]


def test_prepare_files_list_dir_order():
    # expansion order is pinned by RDF_FILE_ENDINGS key order
    # (reference tests/test_persistence_systems_generic_methods.py:118-135)
    expected = [DATA / "file_01.ttl", DATA / "file_03.json-ld", DATA / "file_02.rdf"]
    assert prepare_files_list(DATA) == expected
    assert prepare_files_list(str(DATA)) == expected


def test_prepare_files_list_bad_type():
    with pytest.raises(ValueError):
        prepare_files_list(42)


def test_registry():
    assert set(PERSISTENCE_SYSTEMS) == {
        "String", "File", "S3", "GraphDB", "Fuseki", "SOP"
    }


def test_stub_systems_validate_iri():
    g = Graph()
    for cls in (GraphDB, Fuseki):
        ps = cls("http://host", "repo")
        with pytest.raises(ValueError):
            ps.write(g, "not-an-iri")
        with pytest.raises((NotImplementedError, RuntimeError)):
            ps.write(g, "urn:ok")


def test_sop_urn_helpers():
    wf = "urn:x-evn-tag:datagraph_name:workflow_name:Administrator"
    assert SOP.graph_from_workflow(wf) == "urn:x-evn-master:datagraph_name"
    assert SOP.tag_from_workflow(wf) == "urn:x-tags:workflow_name"
    with pytest.raises(ValueError):
        SOP.graph_from_workflow("urn:other:x")
    with pytest.raises(ValueError):
        SOP.tag_from_workflow("urn:other:x")


def test_s3_ctor_validation():
    from rdfx_ray.persistence import S3
    with pytest.raises(ValueError):
        S3("bucket", None, "secret")
