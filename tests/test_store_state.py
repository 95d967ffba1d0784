"""Unit tests: lance-shim store, checkpoint ledger, vectorized NT
serializer (parity with the scalar term serializer)."""

import json
from pathlib import Path

import pyarrow as pa
import pytest

from rdfx_ray.sinks.nt_lines import nt_lines
from rdfx_ray.state.manifest import CheckpointLedger
from rdfx_ray.store.lance_shim import LanceShim, write_dataset


def test_shim_write_commit_read(tmp_path):
    uri = str(tmp_path / "ds")
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    shim = LanceShim(uri)
    shim.create(t.schema)
    f1 = shim.write_fragment(t, "000001", lineage={"src": "test"})
    v = shim.commit([f1], t.schema)
    assert v == 1
    assert shim.count_rows() == 3
    assert len(shim.fragment_paths()) == 1
    m = shim.latest_manifest()
    assert m["fragments"][0]["lineage"] == {"src": "test"}


def test_shim_versioning(tmp_path):
    uri = str(tmp_path / "ds")
    t = pa.table({"a": [1]})
    shim = LanceShim(uri)
    shim.create(t.schema)
    f1 = shim.write_fragment(t, "a")
    shim.commit([f1], t.schema)
    f2 = shim.write_fragment(t, "b")
    v2 = shim.commit([f1, f2], t.schema)
    assert v2 == 2
    assert shim.count_rows() == 2
    # old manifest still readable
    old = json.loads((Path(uri) / "_manifest" / "1.json").read_text())
    assert old["rows"] == 1


def test_shim_fragment_idempotent_rewrite(tmp_path):
    uri = str(tmp_path / "ds")
    t = pa.table({"a": [1, 2]})
    shim = LanceShim(uri)
    shim.create(t.schema)
    e1 = shim.write_fragment(t, "x")
    e2 = shim.write_fragment(t, "x")  # retry: replaces, same content
    assert e1["path"] == e2["path"]
    assert len(list((Path(uri) / "data").glob("*.parquet"))) == 1


def test_write_dataset_driver_helper(tmp_path):
    uri = str(tmp_path / "ds")
    t = pa.table({"a": list(range(10))})
    write_dataset(t, uri, fragment_rows=4)
    shim = LanceShim(uri)
    assert shim.count_rows() == 10
    assert len(shim.fragment_paths()) == 3  # 4+4+2


def test_ledger_commit_and_resume(tmp_path):
    led = CheckpointLedger(tmp_path)
    assert not led.is_committed("stage1-shard-00001")
    led.commit("stage1-shard-00001", {"rows": 5})
    assert led.is_committed("stage1-shard-00001")
    assert led.read("stage1-shard-00001")["rows"] == 5
    led.commit("stage2-bucket-00003", {"rows": 2})
    assert led.committed_units("stage1-") == ["stage1-shard-00001"]
    assert set(led.all()) == {"stage1-shard-00001", "stage2-bucket-00003"}


def test_nt_lines_matches_scalar_serializer():
    from rdfx_ray.rdf.terms import nt_object_parts

    batch = pa.table({
        "subj": ["http://s/1", "_:b1", "http://s/2", "http://s/3"],
        "pred": ["http://p"] * 4,
        "obj_kind": ["iri", "literal", "literal", "literal"],
        "obj_value": ["http://o", 'quote " and \\ back\nnl\ttab',
                      "plain", "tagged"],
        "obj_datatype": [None, None,
                         "http://www.w3.org/2001/XMLSchema#integer", None],
        "obj_lang": [None, None, None, "en"],
    })
    lines = nt_lines(batch).tolist()
    for i, line in enumerate(lines):
        kind = batch.column("obj_kind")[i].as_py()
        obj = nt_object_parts(kind, batch.column("obj_value")[i].as_py(),
                              batch.column("obj_datatype")[i].as_py(),
                              batch.column("obj_lang")[i].as_py())
        s = batch.column("subj")[i].as_py()
        subj = s if s.startswith("_:") else f"<{s}>"
        assert line == f"{subj} <http://p> {obj} ."
    # escaped line parses back through the strict NT parser
    from rdfx_ray.rdf.ntriples import parse_nt_line
    assert parse_nt_line(lines[1]) is not None
