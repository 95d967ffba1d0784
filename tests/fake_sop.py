"""In-memory fake SOP server speaking the HTTP surface the SOP client
uses — the offline stand-in for the live server the reference's SOP
suites need (tests/test_persistence_system_local_sop.py). Also a
boto3-shaped fake S3 client (the reference runs its S3 round-trips
under moto; moto/boto3 are absent here).
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Tuple
from urllib.parse import parse_qsl, urlencode, urlparse

from rdfx_ray.rdf.graph import Graph


class FakeResponse:
    def __init__(self, status_code: int = 200, text: str = ""):
        self.status_code = status_code
        self.text = text


_ASK_RE = re.compile(r"ASK WHERE \{GRAPH <([^>]+)> \{\?s \?p \?o\} \}")
_COUNT_RE = re.compile(
    r"SELECT \(COUNT\(\*\) as \?count\) WHERE \{GRAPH <([^>]+)> "
    r"\{\?s \?p \?o\} \}")
_LIMIT_RE = re.compile(r"SELECT \* \{ \?s \?p \?o \} LIMIT (\d+)")


class FakeSOPServer:
    """Implements the client transport interface (get/post returning
    .status_code/.text, plus .cookies) over an in-memory graph store.

    Graph lifecycle semantics emulated: created datagraphs start with
    ``BOILERPLATE`` metadata triples; workflows copy their parent;
    imports merge (set-union); duplicate names get a numeric suffix
    (SOP 'will try to make it valid' — reference local test notes).
    """

    BOILERPLATE = 3

    def __init__(self, users: Optional[Dict[str, str]] = None):
        self.users = users or {"Administrator": "secret"}
        self.graphs: Dict[str, Graph] = {}
        self.requests: List[Tuple[str, str, dict]] = []
        self.cookies: Dict[str, str] = {}
        self.logged_in = False
        # ships with the kennedys example graph, as real SOP does
        nt = "\n".join(
            f"<urn:kennedy:{i}> <urn:p:rel> <urn:kennedy:{i+1}> ."
            for i in range(12))
        self.graphs["http://topbraid.org/examples/kennedys"] = \
            Graph().parse(nt, "nt")

    # -- helpers -------------------------------------------------------------

    def _boilerplate(self, iri: str) -> Graph:
        nt = "\n".join(
            f"<{iri}> <urn:sop:meta{i}> \"m{i}\" ."
            for i in range(self.BOILERPLATE))
        return Graph().parse(nt, "nt")

    def _fresh_id(self, name: str) -> str:
        base = name.replace(" ", "_")
        cand, i = base, 0
        while f"urn:x-evn-master:{cand}" in self.graphs:
            i += 1
            cand = f"{base}_{i}"
        return cand

    def _resolve_export(self, spec: str) -> Optional[str]:
        if "." in spec:
            dg, wf = spec.split(".", 1)
            prefix = f"urn:x-evn-tag:{dg}:{wf}:"
            for iri in self.graphs:
                if iri.startswith(prefix):
                    return iri
            return None
        iri = f"urn:x-evn-master:{spec}"
        return iri if iri in self.graphs else None

    def _export_text(self, iri: str) -> str:
        return (f"# baseURI: {iri}\n\n"
                + self.graphs[iri].serialize("turtle"))

    # -- transport interface -------------------------------------------------

    def get(self, url, params=None, headers=None, **kw) -> FakeResponse:
        self.requests.append(("GET", url, dict(params or {})))
        path = urlparse(url).path
        if path.endswith("/tbl"):
            return FakeResponse(200, "")
        if path.endswith("/purgeuser"):
            self.logged_in = False
            return FakeResponse(200, "")
        m = re.search(r"/service/([^/]+)/tbs/exportRDFFile", path)
        if m:
            iri = self._resolve_export(m.group(1))
            if iri is None:
                return FakeResponse(404, "No such asset")
            return FakeResponse(200, self._export_text(iri))
        if path.endswith("/sparqlmotion"):
            p = dict(params or {})
            iri = p.get("_base")
            if p.get("tag"):
                # legacy workflow export resolves via projectGraph+tag
                iri = p["_base"]
            if iri not in self.graphs:
                return FakeResponse(404, "No such asset")
            return FakeResponse(200, self._export_text(iri))
        return FakeResponse(404, f"Unknown GET {url}")

    def post(self, url, data=None, files=None, headers=None, cookies=None,
             timeout=None, **kw) -> FakeResponse:
        data = dict(data or {})
        self.requests.append(("POST", url, data))
        path = urlparse(url).path
        if path.endswith("/j_security_check"):
            ok = self.users.get(data.get("j_username")) == data.get("j_password")
            self.logged_in = ok
            # real container semantics: empty body on success, an HTML
            # error page otherwise (client raises on ANY body)
            return FakeResponse(200, "" if ok else "Invalid username or password")
        if path.endswith("/importFileUpload"):
            base = data["_base"]
            body = files["file"].read().decode("utf-8")
            g = Graph().parse(body, "turtle")
            target = self.graphs.setdefault(base, Graph())
            n = len(g)
            for t in g:
                target.add(t)
            return FakeResponse(200, urlencode({
                "message": f"File with {n} statements has been imported "
                           "successfully. \n"}))
        if path.endswith("/sparql"):
            return self._sparql(data, headers or {})
        if path.endswith("/swp"):
            return self._swp(data)
        return FakeResponse(404, f"Unknown POST {url}")

    # -- endpoint logic ------------------------------------------------------

    def _sparql(self, data: dict, headers: dict) -> FakeResponse:
        q = " ".join(data["query"].split())
        m = _ASK_RE.search(q)
        if m:
            iri = m.group(1)
            exists = iri in self.graphs and len(self.graphs[iri]) > 0
            return FakeResponse(200, json.dumps({"boolean": exists}))
        m = _COUNT_RE.search(q)
        if m:
            iri = m.group(1)
            n = len(self.graphs.get(iri, Graph()))
            return FakeResponse(200, json.dumps({
                "results": {"bindings": [
                    {"count": {"type": "literal", "value": str(n)}}]}}))
        m = _LIMIT_RE.search(q)
        if m:
            limit = int(m.group(1))
            iri = data.get("default-graph-uri")
            g = self.graphs.get(iri, Graph())
            bindings = []
            for (s, p, o) in sorted(g, key=lambda t: tuple(map(str, t)))[:limit]:
                bindings.append({
                    "s": {"type": "uri", "value": str(s)},
                    "p": {"type": "uri", "value": str(p)},
                    "o": {"type": "uri", "value": str(o)},
                })
            if headers.get("Accept") == "application/rdf+xml":
                return FakeResponse(200, g.serialize("xml"))
            return FakeResponse(200, json.dumps(
                {"results": {"bindings": bindings}}))
        if headers.get("Accept") == "application/rdf+xml":
            iri = data.get("default-graph-uri")
            g = self.graphs.get(iri, Graph())
            return FakeResponse(200, g.serialize("xml"))
        return FakeResponse(400, f"Unsupported query shape: {q}")

    def _swp(self, data: dict) -> FakeResponse:
        view = data.get("_viewClass", "")
        if view.endswith("#CreateProjectService"):
            gid = self._fresh_id(data["name"])
            iri = f"urn:x-evn-master:{gid}"
            self.graphs[iri] = self._boilerplate(iri)
            return FakeResponse(200, json.dumps({
                "response": f"Successfully created {gid}", "id": gid}))
        if view.endswith("#AddTagService"):
            parent = data["projectGraph"]
            if parent not in self.graphs:
                return FakeResponse(200, json.dumps(
                    {"error": f"No such datagraph {parent}"}))
            wf = data["name"].replace(" ", "_")
            tag_iri = f"{parent}:{wf}:Administrator".replace(
                "urn:x-evn-master", "urn:x-evn-tag")
            g = Graph()
            for t in self.graphs[parent]:
                g.add(t)
            self.graphs[tag_iri] = g
            return FakeResponse(200, json.dumps({
                "changed": True, "rootResource": f"urn:x-tags:{wf}"}))
        if view.endswith("#createRDFFile"):
            base = data["baseURI"]
            self.graphs.setdefault(base, Graph())
            return FakeResponse(200, json.dumps({
                "response": f"Successfully created file {data['fileName']}",
                "id": data["fileName"]}))
        return FakeResponse(400, f"Unknown viewClass {view}")


class FakeS3Client:
    """boto3-shaped in-memory S3 (get_object/put_object/head_object) —
    carries the reference's moto round-trip tests offline."""

    def __init__(self):
        self.objects: Dict[Tuple[str, str], bytes] = {}

    def put_object(self, Bucket, Key, Body):
        self.objects[(Bucket, Key)] = Body
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def get_object(self, Bucket, Key):
        import io
        body = self.objects[(Bucket, Key)]
        return {"Body": io.BytesIO(body)}

    def head_object(self, Bucket, Key):
        if (Bucket, Key) not in self.objects:
            raise KeyError(Key)
        return {}


class RemoteFakeTransport:
    """Client-side adapter that routes the SOP client's HTTP calls to
    a shared FakeSOPServer living inside a Ray actor — so multiple
    upload actors (separate processes) hit ONE stateful fake server,
    like they would one real endpoint. File objects are drained to
    bytes before crossing the process boundary."""

    def __init__(self, handle):
        import ray
        self._ray = ray
        self.handle = handle
        self.cookies = {}

    def get(self, url, params=None, headers=None, **kw):
        return self._ray.get(self.handle.get.remote(url, params=params,
                                                    headers=headers))

    def post(self, url, data=None, files=None, headers=None, cookies=None,
             timeout=None, **kw):
        file_bytes = None
        if files:
            file_bytes = {k: v.read() for k, v in files.items()}
        return self._ray.get(self.handle.post_raw.remote(
            url, data=data, file_bytes=file_bytes, headers=headers))


def make_fake_sop_actor():
    """Spawn the shared fake-SOP Ray actor; returns its handle."""
    import ray

    @ray.remote(num_cpus=0)
    class FakeSOPActor:
        def __init__(self):
            self.server = FakeSOPServer()

        def get(self, url, params=None, headers=None):
            return self.server.get(url, params=params, headers=headers)

        def post_raw(self, url, data=None, file_bytes=None, headers=None):
            import io
            files = ({k: io.BytesIO(v) for k, v in file_bytes.items()}
                     if file_bytes else None)
            return self.server.post(url, data=data, files=files,
                                    headers=headers)

        def graph_len(self, iri):
            g = self.server.graphs.get(iri)
            return -1 if g is None else len(g)

        def graph_nt(self, iri):
            return self.server.graphs[iri].serialize("nt")

        def seed_graph(self, iri):
            self.server.graphs.setdefault(iri, Graph())

    return FakeSOPActor.remote()
