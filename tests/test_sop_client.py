"""SOP client against the fake in-memory server — mirrors the
reference's live-server suite semantics
(tests/test_persistence_system_local_sop.py) plus the auth handshake
and URL-shape checks that suite can't see, all offline. S3 round-trip
via the boto3-shaped fake (reference runs these under moto)."""

import pytest

from tests.fake_sop import FakeS3Client, FakeSOPServer
from rdfx_ray.persistence import S3, SOP
from rdfx_ray.rdf.graph import Graph

SAMPLE_TTL = """
<a:> <b:> <c:> .
<a:> <d:> <e:> .
"""
KENNEDYS = "http://topbraid.org/examples/kennedys"


def local_sop():
    server = FakeSOPServer()
    return SOP(client=server), server


def test_location_validation():
    with pytest.raises(ValueError, match="must start with"):
        SOP(location="ftp://nope")


def test_client_handshake_appends_tbl_once():
    ps, server = local_sop()
    assert ps.location.endswith("/tbl")
    # first request is the GET of /tbl (reference :821-824)
    assert server.requests[0] == ("GET", "http://localhost:8083/tbl", {})
    ps._create_client()
    assert ps.location.count("/tbl") == 1  # no /tbl/tbl growth


def test_remote_auth_success_and_failure():
    server = FakeSOPServer(users={"alice": "pw"})
    ps = SOP(location="http://sop.example.com", username="alice",
             password="pw", client=server)
    assert server.logged_in
    # login form fields exactly as the reference sends them (:828-836)
    method, url, data = server.requests[1]
    assert url.endswith("/tbl/j_security_check")
    assert data == {"j_username": "alice", "j_password": "pw",
                    "login": "LOGIN"}

    with pytest.raises(ValueError, match="Invalid username"):
        SOP(location="http://sop.example.com", username="alice",
            password="wrong", client=FakeSOPServer(users={"alice": "pw"}))


def test_asset_exists_positive_and_negative():
    ps, _ = local_sop()
    assert ps.asset_exists(KENNEDYS)
    assert not ps.asset_exists("urn:x-evn-master:nonexistent")


def test_query_select_limit_bindings():
    ps, _ = local_sop()
    results = ps.query("SELECT * { ?s ?p ?o } LIMIT 10", KENNEDYS)
    assert len(results) == 10
    assert all(isinstance(r, dict) and set(r) == {"s", "p", "o"}
               for r in results)
    assert all(isinstance(k, str) for r in results for k in r)


def test_create_datagraph():
    ps, _ = local_sop()
    name = "datagraph_abc123"
    assert not ps.asset_exists(name)
    iri = ps.create_datagraph(name)
    assert ps.asset_exists(iri)
    assert iri.split(":")[2] == name


def test_duplicate_datagraph_names_differ():
    ps, _ = local_sop()
    a = ps.create_datagraph(datagraph_name="dg_dup")
    b = ps.create_datagraph(datagraph_name="dg_dup")
    assert a != b


def test_create_workflow_and_exists():
    ps, _ = local_sop()
    dg = ps.create_datagraph("dg_for_wf")
    wf = ps.create_workflow(graph_iri=dg, workflow_name="wf_one")
    assert wf.startswith("urn:x-evn-tag:dg_for_wf:wf_one:")
    assert ps.asset_exists(wf)  # resolves workflow → master (:769-773)


def test_create_manifest():
    ps, _ = local_sop()
    iri = ps.create_manifest(manifest_name="manifest_x")
    assert ps.asset_exists(iri)


def test_workflow_insert_message():
    ps, server = local_sop()
    dg = ps.create_datagraph("dg_ins")
    wf = ps.create_workflow(dg, workflow_name="wf_ins")
    g = Graph().parse(SAMPLE_TTL, "turtle")
    msg = ps.write(g, wf)
    assert msg == "File with 2 statements has been imported successfully. \n"
    # upload form carried workflow resolution (reference :464-475)
    method, url, data = server.requests[-1]
    assert url.endswith("/importFileUpload")
    assert data["projectGraph"] == dg          # master, not the tag urn
    assert data["tag"] == "urn:x-tags:wf_ins"
    assert data["_base"] == wf
    assert data["format"] == "turtle"


def test_asset_collection_size():
    ps, server = local_sop()
    dg = ps.create_datagraph("dg_size")
    assert ps.asset_collection_size(dg) == FakeSOPServer.BOILERPLATE
    ps.write(Graph().parse(SAMPLE_TTL, "turtle"), dg)
    assert ps.asset_collection_size(dg) == FakeSOPServer.BOILERPLATE + 2


def test_read_asset_roundtrip():
    ps, _ = local_sop()
    dg = ps.create_datagraph("dg_read")
    ps.write(Graph().parse(SAMPLE_TTL, "turtle"), dg)
    comments, g = ps.read(dg)
    assert len(g) == FakeSOPServer.BOILERPLATE + 2
    assert comments and comments[0].startswith("baseURI:")


def test_read_workflow_url_shape():
    ps, server = local_sop()
    dg = ps.create_datagraph("dg_wfread")
    wf = ps.create_workflow(dg, workflow_name="wf_read")
    ps.write(Graph().parse(SAMPLE_TTL, "turtle"), wf)
    comments, g = ps.read(wf)
    # workflow copies parent boilerplate + the 2 inserted triples
    assert len(g) == FakeSOPServer.BOILERPLATE + 2
    get_urls = [u for (m, u, _) in server.requests if m == "GET"]
    # workflow export uses the dotted dg.wf service path (:518-525)
    assert any("/service/dg_wfread.wf_read/tbs/exportRDFFile" in u
               for u in get_urls)


def test_read_unsupported_iri():
    ps, _ = local_sop()
    with pytest.raises(NotImplementedError):
        ps.read("http://not-a-urn.example.com/g")


def test_read_legacy_sparqlmotion():
    ps, server = local_sop()
    dg = ps.create_datagraph("dg_legacy")
    ps.write(Graph().parse(SAMPLE_TTL, "turtle"), dg)
    comments, g = ps.read(dg, legacy=True)
    assert len(g) == FakeSOPServer.BOILERPLATE + 2
    method, url, params = server.requests[-1]
    assert url.endswith("/sparqlmotion")
    assert params["id"] == "ExportToRDF"
    assert params["projectGraph"] == dg


def test_read_deprecated_returns_graph():
    # XML-serializable predicates (RDF/XML needs QName-able IRIs; the
    # boilerplate <urn:sop:metaN> and schema.org-style preds qualify)
    ttl = ("<urn:ex:s> <https://schema.org/name> \"n\" .\n"
           "<urn:ex:s> <https://schema.org/email> \"e\" .\n")
    ps, _ = local_sop()
    dg = ps.create_datagraph("dg_dep")
    ps.write(Graph().parse(ttl, "turtle"), dg)
    g = ps.read_deprecated("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }", dg)
    assert len(g) == FakeSOPServer.BOILERPLATE + 2


def test_create_file_and_duplicate_rejected(tmp_path):
    import shutil
    from pathlib import Path
    data = Path(__file__).parent / "data" / "file_01.ttl"
    local = tmp_path / "file_01.ttl"
    shutil.copy(data, local)
    ps, _ = local_sop()
    uri = ps.create_file(local)
    assert ps.asset_exists(uri)
    with pytest.raises(ValueError, match="already exists"):
        ps.create_file(local)


def test_write_invalid_graph_iri():
    ps, _ = local_sop()
    with pytest.raises(ValueError, match="not valid"):
        ps.write(Graph(), "not-an-iri")


def test_close_purges_session():
    ps, server = local_sop()
    ps._close()
    assert any("/purgeuser" in u for (m, u, _) in server.requests)


# -- S3 with the boto3-shaped fake (reference: moto round-trips) -------------


def test_s3_write_read_roundtrip():
    from rdfx_ray.rdf.graph import isomorphic
    fake = FakeS3Client()
    ps = S3("bucket", "key", "secret", client=fake)
    g = Graph().parse(SAMPLE_TTL, "turtle")
    key = ps.write(g, "sample", "turtle")
    assert key == "sample.turtle"
    comments, g2 = ps.read(key, "turtle")
    assert len(g2) == 2 and isomorphic(g, g2)


def test_s3_roundtrip_with_comments():
    fake = FakeS3Client()
    ps = S3("bucket", "key", "secret", client=fake)
    g = Graph().parse(SAMPLE_TTL, "turtle")
    ps.write(g, "c", "turtle", leading_comments=["hello", "world"])
    comments, g2 = ps.read("c.turtle", "turtle")
    assert comments == ["hello", "world"]
    assert len(g2) == 2


def test_s3_asset_exists():
    fake = FakeS3Client()
    ps = S3("bucket", "key", "secret", client=fake)
    assert not ps.asset_exists("missing.ttl")
    ps.write(Graph().parse(SAMPLE_TTL, "turtle"), "there", "ttl")
    assert ps.asset_exists("there.ttl")


def test_s3_non_string_args_rejected():
    with pytest.raises(ValueError, match="must be a string"):
        S3("bucket", 123, "secret")


def test_distributed_sop_upload(ray_session, tmp_path):
    """Triples stream through the SopUpload actor pool into a SHARED
    fake SOP server (a Ray actor): per-graph chunked uploads across
    multiple client actors merge to exactly the source triple set —
    the distributed plane of SOP.write."""
    import ray

    from tests.fake_sop import RemoteFakeTransport, make_fake_sop_actor
    from rdfx_ray.functions.doc_triples import doc_triples
    from rdfx_ray.rdf.graph import Graph
    from rdfx_ray.sinks.sop_sink import upload_triples

    handle = make_fake_sop_actor()
    sf = "/root/testdata/sf0.001"
    ds = doc_triples(sf).map_batches(   # attach the obj_lang column the
        lambda b: b.append_column(      # sink schema expects
            "obj_lang", __import__("pyarrow").nulls(b.num_rows,
                                                    __import__("pyarrow").string())),
        batch_format="pyarrow")
    # the fake import endpoint accepts any graph; pre-seed not required
    stats = upload_triples(
        ds, client_factory=lambda: RemoteFakeTransport(handle),
        concurrency=2, batch_size=2048).to_pandas()
    assert (stats["triples"] > 0).all()
    assert stats["message"].str.contains("imported successfully").all()

    # server-side union across all chunks == source triple set
    want = doc_triples(sf).to_pandas()
    total_server = 0
    for giri in sorted(want["graph_iri"].unique()):
        n = ray.get(handle.graph_len.remote(giri))
        assert n >= 0, f"graph {giri} missing on server"
        total_server += n
        # spot-check one graph's content exactly
    g0 = sorted(want["graph_iri"].unique())[0]
    nt = ray.get(handle.graph_nt.remote(g0))
    got = Graph().parse(nt, "nt")
    want0 = want[want["graph_iri"] == g0]
    assert len(got) == len(want0.drop_duplicates(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype"]))
    # no duplicates server-side (set-union semantics)
    assert total_server == len(want.drop_duplicates(
        ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
         "graph_iri"]))
