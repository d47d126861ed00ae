"""HTTP service backends, tested against fake transports the way the
reference tests its clients with mocked HTTP (no network in CI).

Each fake session implements the service's REST semantics in memory, so the
tests exercise the full protocol: version listing → create → batched upsert
→ payload indices / index+load → alias flip → retire.
"""

import json

import pytest

from wurzel_spark.sinks.http_backends import (
    DecagonKBClient,
    ElevenLabsKBClient,
    HTTPError,
    MilvusHTTPBackend,
    QdrantHTTPBackend,
    WonderfulKBClient,
)
from wurzel_spark.sinks.versioned import VersionedCollectionWriter


class FakeResp:
    def __init__(self, status=200, body=None):
        self.status_code = status
        self._body = body if body is not None else {}
        self.text = json.dumps(self._body)

    def json(self):
        return self._body


class FakeQdrant:
    """In-memory Qdrant REST server."""

    def __init__(self):
        self.collections = {}  # name -> {points: {}, indices: []}
        self.aliases = {}
        self.calls = []

    def request(self, method, url, json=None, timeout=None, **kw):
        path = url.split("://", 1)[-1].split("/", 1)[1]
        self.calls.append((method, "/" + path, json))
        return self._route(method, "/" + path, json or {})

    def _route(self, method, path, body):
        if (method, path) == ("GET", "/collections"):
            return FakeResp(
                body={"result": {"collections": [{"name": n} for n in self.collections]}}
            )
        if method == "PUT" and path.startswith("/collections/") and path.endswith("/index"):
            name = path.split("/")[2]
            self.collections[name]["indices"].append(body["field_name"])
            return FakeResp()
        if method == "PUT" and "/points" in path:
            name = path.split("/")[2].split("?")[0]
            for p in body["points"]:
                self.collections[name]["points"][p["id"]] = p
            return FakeResp()
        if method == "PUT" and path.startswith("/collections/"):
            self.collections[path.split("/")[2]] = {"points": {}, "indices": []}
            return FakeResp()
        if (method, path) == ("POST", "/collections/aliases"):
            for action in body["actions"]:
                if "delete_alias" in action:
                    self.aliases.pop(action["delete_alias"]["alias_name"], None)
                else:
                    c = action["create_alias"]
                    self.aliases[c["alias_name"]] = c["collection_name"]
            return FakeResp()
        if (method, path) == ("GET", "/aliases"):
            return FakeResp(
                body={
                    "result": {
                        "aliases": [
                            {"alias_name": a, "collection_name": c}
                            for a, c in self.aliases.items()
                        ]
                    }
                }
            )
        if method == "DELETE" and path.startswith("/collections/"):
            self.collections.pop(path.split("/")[2], None)
            return FakeResp()
        return FakeResp(404, {"status": "no route " + path})


def qdrant_pair():
    server = FakeQdrant()
    backend = QdrantHTTPBackend(
        base_url="http://qdrant:6333", vector_size=4, session_factory=lambda: server
    )
    return server, backend


def test_qdrant_full_protocol():
    server, be = qdrant_pair()
    assert be.list_collections() == []
    be.create_collection("kb_v1", {"columns": ["text"], "vector_size": 4})
    # payload indices parity: keywords/url/text/history (qdrant/step.py:189-219)
    assert server.collections["kb_v1"]["indices"] == ["keywords", "url", "text", "history"]
    be.upsert_batch("kb_v1", [{"id": 1, "vector": [0.1] * 4, "text": "a", "url": "u"}])
    assert server.collections["kb_v1"]["points"][1]["payload"] == {"text": "a", "url": "u"}
    be.set_alias("kb", "kb_v1")
    assert be.get_alias("kb") == "kb_v1"
    # alias flip on update is atomic delete+create in one call
    be.create_collection("kb_v2", {"vector_size": 4})
    be.set_alias("kb", "kb_v2")
    assert be.get_alias("kb") == "kb_v2"
    flip = [c for c in server.calls if c[1] == "/collections/aliases"][-1]
    assert [list(a)[0] for a in flip[2]["actions"]] == ["delete_alias", "create_alias"]
    be.drop_collection("kb_v1")
    assert be.list_collections() == ["kb_v2"]


def test_qdrant_versioned_writer_next_version():
    server, be = qdrant_pair()
    be.create_collection("kb_v3", {})
    be.create_collection("other_v9", {})
    writer = VersionedCollectionWriter(lambda: be, "kb")
    assert writer.next_version(be) == "kb_v4"


class FakeMilvus:
    def __init__(self):
        self.collections = {}
        self.aliases = {}
        self.indexed = set()
        self.loaded = set()
        self.fail_insert_count = None  # simulate partial insert

    def post(self, url, json=None, timeout=None, **kw):
        path = url.split("/v2/vectordb", 1)[1]
        body = json or {}
        if path == "/collections/list":
            return FakeResp(body={"code": 0, "data": list(self.collections)})
        if path == "/collections/create":
            self.collections[body["collectionName"]] = []
            return FakeResp(body={"code": 0})
        if path == "/entities/insert":
            n = self.fail_insert_count
            rows = body["data"]
            self.collections[body["collectionName"]] += rows
            return FakeResp(
                body={"code": 0, "data": {"insertCount": n if n is not None else len(rows)}}
            )
        if path == "/indexes/create":
            self.indexed.add(body["collectionName"])
            return FakeResp(body={"code": 0})
        if path == "/collections/load":
            self.loaded.add(body["collectionName"])
            return FakeResp(body={"code": 0})
        if path == "/aliases/alter":
            if body["aliasName"] not in self.aliases:
                return FakeResp(body={"code": 1100, "message": "alias not found"})
            self.aliases[body["aliasName"]] = body["collectionName"]
            return FakeResp(body={"code": 0})
        if path == "/aliases/create":
            self.aliases[body["aliasName"]] = body["collectionName"]
            return FakeResp(body={"code": 0})
        if path == "/aliases/describe":
            if body["aliasName"] in self.aliases:
                return FakeResp(
                    body={"code": 0, "data": {"collectionName": self.aliases[body["aliasName"]]}}
                )
            return FakeResp(body={"code": 1100, "message": "not found"})
        if path in ("/collections/release", "/collections/drop"):
            if path.endswith("drop"):
                self.collections.pop(body["collectionName"], None)
            return FakeResp(body={"code": 0})
        return FakeResp(404, {"code": 404, "message": path})


def test_milvus_full_protocol():
    server = FakeMilvus()
    be = MilvusHTTPBackend(
        base_url="http://milvus:19530", vector_dim=4, session_factory=lambda: server
    )
    be.create_collection("emb_v1", {"vector_size": 4})
    be.upsert_batch("emb_v1", [{"text": "t", "vector": [0.0] * 4, "url": "u", "id": 1}])
    assert server.collections["emb_v1"][0]["url"] == "u"
    be.set_alias("emb", "emb_v1")
    # milvus/step.py:90-98 — index build + load happen before the alias flip
    assert "emb_v1" in server.indexed and "emb_v1" in server.loaded
    assert be.get_alias("emb") == "emb_v1"
    be.set_alias("emb", "emb_v1")  # alter path (alias now exists)
    be.drop_collection("emb_v1")
    assert be.list_collections() == []


def test_milvus_partial_insert_raises():
    server = FakeMilvus()
    server.fail_insert_count = 0
    be = MilvusHTTPBackend(base_url="http://m", session_factory=lambda: server)
    be.create_collection("c_v1", {})
    with pytest.raises(HTTPError):
        be.upsert_batch("c_v1", [{"text": "x", "vector": [], "url": "", "id": 1}])


class FakeWonderful:
    def __init__(self):
        self.files = {}  # name -> {id, content}
        self.storage = {}  # presigned-url -> name
        self.synced = 0
        self.next_id = 0
        self.fail_put = False

    def request(self, method, url, json=None, files=None, data=None, timeout=None, **kw):
        path = url.split("/api/v1", 1)[1]
        if (method, path) == ("GET", "/knowledgebases/kb1/files"):
            return FakeResp(
                body={"data": [{"name": n, "id": f["id"]} for n, f in self.files.items()]}
            )
        if (method, path) == ("POST", "/knowledgebases/kb1/files"):
            self.next_id += 1
            fid = f"f{self.next_id}"
            name = json["filename"]
            self.files[name] = {"id": fid, "content": b""}
            presigned = f"https://s3/{fid}"
            self.storage[presigned] = name
            return FakeResp(body={"data": {"id": fid, "url": presigned}})
        if (method, path) == ("POST", "/storage/upload"):
            fid = data["file_id"]
            for f in self.files.values():
                if f["id"] == fid:
                    f["content"] = files["file"][1]
            return FakeResp()
        if (method, path) == ("DELETE", "/knowledgebases/kb1/files"):
            ids = set(json["file_ids"])
            self.files = {n: f for n, f in self.files.items() if f["id"] not in ids}
            return FakeResp()
        return FakeResp(404, {})

    def put(self, url, data=None, headers=None, timeout=None):
        if self.fail_put:
            return FakeResp(500, {})
        name = self.storage[url]
        self.files[name]["content"] = data
        return FakeResp()

    def post(self, url, timeout=None, **kw):
        if url.endswith("/sync"):
            self.synced += 1
            return FakeResp(524, {})  # gateway timeout — must not raise
        return FakeResp(404, {})


def wonderful_pair():
    server = FakeWonderful()
    client = WonderfulKBClient(
        base_url="https://t.api",
        api_key="k",
        kb_id="kb1",
        session_factory=lambda: server,
        bare_session_factory=lambda: server,
    )
    return server, client


def test_wonderful_create_update_prune_sync():
    server, kb = wonderful_pair()
    kb.upsert_doc("doc-a", {"md": "# A"})  # create → presigned PUT
    assert server.files["doc-a"]["content"] == b"# A"
    kb.upsert_doc("doc-a", {"md": "# A2"})  # update → in-place storage upload
    assert server.files["doc-a"]["content"] == b"# A2"
    assert server.next_id == 1  # no duplicate record
    kb.upsert_doc("doc-b", {"md": "B"})
    assert kb.list_docs("") == ["doc-a", "doc-b"]
    kb.delete_doc("doc-a")
    assert kb.list_docs("") == ["doc-b"]
    kb.sync()  # 524 → treated as started
    assert server.synced == 1


def test_wonderful_orphan_rollback():
    server, kb = wonderful_pair()
    server.fail_put = True
    with pytest.raises(HTTPError):
        kb.upsert_doc("doc-x", {"md": "X"})
    assert kb.list_docs("") == []  # created record rolled back


class FakeElevenLabs:
    def __init__(self):
        self.docs = []  # {id, name, type, content}
        self.next_id = 0

    def get(self, url, params=None, timeout=None):
        page = [d for d in self.docs]  # single page, has_more False
        return FakeResp(body={"documents": page, "has_more": False})

    def post(self, url, json=None, timeout=None):
        self.next_id += 1
        doc_id = f"d{self.next_id}"
        self.docs.append(
            {"id": doc_id, "name": json["name"], "type": "text", "content": json["text"]}
        )
        return FakeResp(body={"id": doc_id})

    def request(self, method, url, json=None, timeout=None, **kw):
        assert method == "PATCH"
        doc_id = url.rsplit("/", 1)[1]
        for d in self.docs:
            if d["id"] == doc_id:
                d["content"] = json["content"]
        return FakeResp()

    def delete(self, url, params=None, timeout=None):
        doc_id = url.rsplit("/", 1)[1].split("?")[0]
        self.docs = [d for d in self.docs if d["id"] != doc_id]
        return FakeResp()


def test_elevenlabs_scoped_names_and_dedupe():
    server = FakeElevenLabs()
    kb = ElevenLabsKBClient(
        base_url="https://11", api_key="k", name_prefix="pfx-", session_factory=lambda: server
    )
    kb.upsert_doc("a", {"history": "h1", "md": "A"})
    assert server.docs[0]["name"] == "pfx-h1a"
    # foreign doc outside the scope is invisible
    server.docs.append({"id": "zz", "name": "other", "type": "text"})
    assert kb.list_docs("h1") == ["pfx-h1a"]
    # re-upsert PATCHes in place (stable id), never duplicates
    kb.upsert_doc("a", {"history": "h1", "md": "A2"})
    mine = [d for d in server.docs if d["name"].startswith("pfx-")]
    assert [(d["id"], d["name"], d["content"]) for d in mine] == [("d1", "pfx-h1a", "A2")]
    # duplicate names in the namespace: keep first, delete rest on listing
    server.docs.append({"id": "dup", "name": "pfx-h1a", "type": "text"})
    kb2 = ElevenLabsKBClient(  # fresh client → fresh listing (cache is per-run)
        base_url="https://11", api_key="k", name_prefix="pfx-", session_factory=lambda: server
    )
    assert kb2.list_docs("h1") == ["pfx-h1a"]
    assert not any(d["id"] == "dup" for d in server.docs)


class FakeDecagon:
    def __init__(self):
        self.articles = []

    def post(self, url, json=None, timeout=None):
        if url.endswith("/article/chunks"):
            # split on blank lines like a chunker would
            chunks = [c for c in json["content"].split("\n\n") if c.strip()]
            return FakeResp(body={"chunks": chunks})
        if url.endswith("/article/new"):
            self.articles.append(json)
            return FakeResp(body={"id": len(self.articles)})
        return FakeResp(404, {})


def test_decagon_remote_chunking():
    server = FakeDecagon()
    kb = DecagonKBClient(api_url="https://d", api_key="k", session_factory=lambda: server)
    kb.upsert_doc(
        "t", {"md": "part one\n\npart two", "url": "http://u", "keywords": "a, b"}
    )
    assert len(server.articles) == 2
    assert server.articles[0]["content"] == "part one"
    assert server.articles[0]["tags"] == ["a", "b"]
    assert server.articles[1]["article_metadata"] == {
        "chunk_index": 1,
        "total_chunks": 2,
        "original_url": "http://u",
    }
