"""ElevenLabs KB dialect — reference behavioral corpus ported from
tests/steps/elevenlabs/step_test.py (786 LoC, Apache-2.0; behavioral
assertions re-expressed against our client/sink, fresh fixtures).

The reference's hard-won production semantics, each pinned here:
  - update-in-place PATCHes {"content": ...} so the document id (and any
    agent attachment) stays stable — never delete+recreate, never POST a
    second copy (step_test.py:253-265)
  - PARENT_FOLDER_ID scopes BOTH creates and the listing (PR #247: unscoped
    listing made every previously-created doc look "new" → duplicates
    doubled the KB every run) (step_test.py:350-365,690-700)
  - NAME_PREFIX filtering is client-side, never the API's `search` param;
    out-of-prefix docs never enter `existing` and are never prune
    candidates (step_test.py:330-390)
  - DELETE always carries an explicit force flag (step_test.py:299-305,548)
  - a create is never retried after a read timeout — the server may already
    have processed it (step_test.py:480-491); updates and listings are
    idempotent and retried
  - a failed listing raises instead of falling back to "nothing exists"
    (exactly the sequence that produced duplicates in practice)
    (step_test.py:429-441)
  - duplicate names self-heal: keep the first id, delete the rest
    (step_test.py:415-427)
  - prune is skipped whenever a push failed this run (step_test.py:576-598)
"""

import re
import sys
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark import cloudpickle

# the sink tests ship fakes from this module into Spark's Python workers,
# which can't import test modules — pickle this module's defs by value
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from wurzel_spark.sinks.http_backends import ElevenLabsKBClient, HTTPError
from wurzel_spark.sinks.kb import (
    KBUploaderSink,
    NonRetryableError,
    history_tag,
    retry_call,
    url_doc_name,
    url_doc_name_col,
)

KB_PATH = "/v1/convai/knowledge-base"


class FakeResp:
    def __init__(self, status=200, body=None, text=None):
        self.status_code = status
        self._body = body
        self.text = text if text is not None else ("" if body is None else str(body))

    def json(self):
        if self._body is None:
            raise ValueError("no JSON body")
        return self._body


class Request:
    def __init__(self, method, url, params=None, json_body=None):
        self.method = method
        self.path = urlparse(url).path
        self.qs = {k: v for k, v in parse_qs(urlparse(url).query).items()}
        if params:
            self.qs.update({k: [str(v)] for k, v in params.items()})
        self.json_body = json_body


class StatefulFakeKB:
    """In-memory ElevenLabs KB: paged GET, POST create, PATCH update,
    DELETE — so a second run sees documents the first one created (the
    reference's StatefulFakeKB exists for the same reason: single-shot
    mocks can't catch bugs that only show up across repeated runs)."""

    def __init__(self, page_size_default=100):
        self.docs = {}  # id -> {name, content, type, parent_folder_id}
        self._next = 0
        self.history = []  # Request log
        self.fail = {}  # (method, path-regex) -> exception or FakeResp to return once/always
        self.page_size_default = page_size_default

    # -- programmable failures ------------------------------------------
    def fail_with(self, method, path_re, responses):
        """responses: list consumed one per matching call; last repeats."""
        self.fail[(method, path_re)] = list(responses)

    def _maybe_fail(self, method, path):
        for (m, pat), queue in self.fail.items():
            if m == method and re.search(pat, path):
                item = queue.pop(0) if len(queue) > 1 else queue[0]
                if isinstance(item, Exception):
                    raise item
                if item is not None:
                    return item
        return None

    # -- requests.Session surface ---------------------------------------
    def get(self, url, params=None, timeout=None):
        req = Request("GET", url, params)
        self.history.append(req)
        planned = self._maybe_fail("GET", req.path)
        if planned is not None:
            return planned
        folder = req.qs.get("parent_folder_id", [None])[0]
        page_size = int(req.qs.get("page_size", [str(self.page_size_default)])[0])
        cursor = int(req.qs.get("cursor", ["0"])[0])
        items = [
            (i, d)
            for i, d in self.docs.items()
            if d.get("parent_folder_id") == folder
        ]
        page = items[cursor : cursor + page_size]
        nxt = cursor + page_size
        has_more = nxt < len(items)
        return FakeResp(
            body={
                "documents": [
                    {"id": i, "name": d["name"], "type": d.get("type", "text")}
                    for i, d in page
                ],
                "has_more": has_more,
                "next_cursor": str(nxt) if has_more else None,
            }
        )

    def post(self, url, json=None, timeout=None):
        req = Request("POST", url, json_body=json)
        self.history.append(req)
        planned = self._maybe_fail("POST", req.path)
        if planned is not None:
            return planned
        self._next += 1
        doc_id = f"doc-{self._next}"
        self.docs[doc_id] = {
            "name": json["name"],
            "content": json["text"],
            "type": "text",
            "parent_folder_id": json.get("parent_folder_id"),
        }
        return FakeResp(body={"id": doc_id, "name": json["name"]})

    def request(self, method, url, json=None, timeout=None, **kw):
        if method == "GET":
            return self.get(url, timeout=timeout)
        if method == "POST":
            return self.post(url, json=json, timeout=timeout)
        req = Request(method, url, json_body=json)
        self.history.append(req)
        planned = self._maybe_fail(method, req.path)
        if planned is not None:
            return planned
        if method == "PATCH":
            doc_id = req.path.rsplit("/", 1)[-1]
            self.docs[doc_id]["content"] = json["content"]
            return FakeResp(body={})
        raise AssertionError(f"unrouted {method} {req.path}")

    def delete(self, url, params=None, timeout=None):
        req = Request("DELETE", url, params)
        self.history.append(req)
        planned = self._maybe_fail("DELETE", req.path)
        if planned is not None:
            return planned
        self.docs.pop(req.path.rsplit("/", 1)[-1], None)
        return FakeResp(text="")  # real API: empty non-JSON body

    def methods(self):
        return [r.method for r in self.history]


def client(server, **kw):
    return ElevenLabsKBClient(
        base_url="https://api.11", api_key="k", session_factory=lambda: server, **kw
    )


# ── Name generation (step_test.py:137-179) ──────────────────────────────


@pytest.mark.parametrize(
    "url, idx, expected",
    [
        ("https://example.com/tmcz/baze/magenta-wi-fi", 0, "tmcz/baze/magenta-wi-fi"),
        ("https://example.com/", 0, "document_0000"),
        ("", 3, "document_0003"),
    ],
)
def test_url_doc_name_reference_cases(url, idx, expected):
    assert url_doc_name(url, idx) == expected


def test_url_doc_name_prefix_and_history():
    assert url_doc_name("https://example.com/a", 0, prefix="wurzel/") == "wurzel/a"
    tag = history_tag("SourceA", "ElevenLabsKnowledgeBase")
    assert tag == "SourceA-ElevenLabsKnowledgeBase/"
    assert url_doc_name("https://example.com/a", 0, tag=tag) == (
        "SourceA-ElevenLabsKnowledgeBase/a"
    )
    assert url_doc_name("https://example.com/a", 0, prefix="wurzel/", tag=history_tag("SourceA")) == (
        "wurzel/SourceA/a"
    )
    assert history_tag() == ""  # unset history → no extra scoping


def test_url_doc_name_stable_across_calls():
    u = "https://example.com/docs/test-doc"
    assert url_doc_name(u, 0) == url_doc_name(u, 0)


def test_url_doc_name_col_matches_python(spark):
    import pyspark.sql.functions as F

    rows = [
        ("https://example.com/tmcz/baze/magenta-wi-fi", 0),
        ("https://example.com/", 0),
        ("", 3),
        (None, 7),
        ("https://example.com/a/b/", 12),
    ]
    df = spark.createDataFrame(rows, "url string, idx int")
    got = {
        (r["url"], r["idx"]): r["name"]
        for r in df.select(
            "url", "idx", url_doc_name_col(F.col("url"), F.col("idx"), prefix="p/").alias("name")
        ).collect()
    }
    for url, idx in rows:
        assert got[(url, idx)] == url_doc_name(url or "", idx, prefix="p/")


# ── Create / update (step_test.py:241-292) ──────────────────────────────


def test_new_document_created_with_text_and_name():
    server = StatefulFakeKB()
    kb = client(server)
    kb.upsert_doc("docs/test-doc", {"md": "# Test"})
    post = next(r for r in server.history if r.method == "POST")
    assert post.json_body["text"] == "# Test"
    assert post.json_body["name"] == "docs/test-doc"


def test_existing_document_patched_in_place_not_recreated():
    server = StatefulFakeKB()
    server.docs["doc-existing"] = {"name": "docs/test-doc", "content": "old", "type": "text"}
    kb = client(server)
    kb.upsert_doc("docs/test-doc", {"md": "# New"})
    assert "PATCH" in server.methods()
    assert "POST" not in server.methods()
    assert "DELETE" not in server.methods()  # id stays stable — never replace
    patch = next(r for r in server.history if r.method == "PATCH")
    assert patch.json_body == {"content": "# New"}
    assert server.docs["doc-existing"]["content"] == "# New"


def test_parent_folder_id_in_create_payload_and_list_params():
    server = StatefulFakeKB()
    kb = client(server, parent_folder_id="folder-1")
    kb.upsert_doc("a", {"md": "A"})
    get = next(r for r in server.history if r.method == "GET")
    assert get.qs.get("parent_folder_id") == ["folder-1"]
    post = next(r for r in server.history if r.method == "POST")
    assert post.json_body["parent_folder_id"] == "folder-1"


def test_listing_never_uses_search_param():
    server = StatefulFakeKB()
    kb = client(server, name_prefix="wurzel/")
    kb.upsert_doc("a", {"md": "A"})
    get = next(r for r in server.history if r.method == "GET")
    assert "search" not in get.qs
    assert get.qs.get("types") == ["text"]


# ── Listing semantics (step_test.py:311-441) ────────────────────────────


def test_follows_cursor_across_pages():
    server = StatefulFakeKB()
    for i in range(150):
        server.docs[f"d{i}"] = {"name": f"doc{i:03d}", "content": "", "type": "text"}
    kb = client(server, page_size=100)
    names = kb.list_docs("")
    assert len(names) == 150
    gets = [r for r in server.history if r.method == "GET"]
    assert len(gets) == 2
    assert gets[1].qs.get("cursor") == ["100"]


def test_name_prefix_filters_client_side_and_protects_foreign_docs():
    server = StatefulFakeKB()
    server.docs["doc-mine"] = {"name": "wurzel/docs/a", "content": "", "type": "text"}
    server.docs["doc-other"] = {"name": "unrelated/doc", "content": "", "type": "text"}
    kb = client(server, name_prefix="wurzel/")
    assert kb.list_docs("") == ["wurzel/docs/a"]
    # an out-of-prefix doc must never be a prune candidate
    kb.delete_doc("unrelated/doc")
    assert "doc-other" in server.docs


def test_non_text_document_ignored_even_if_server_filter_leaks_it():
    server = StatefulFakeKB()
    server.docs["doc-text"] = {"name": "docs/a", "content": "", "type": "text"}
    server.docs["doc-folder"] = {"name": "docs/a", "content": "", "type": "folder"}
    kb = client(server)
    kb.upsert_doc("docs/a", {"md": "new"})
    assert "PATCH" in server.methods()
    assert "DELETE" not in server.methods()  # the folder "duplicate" untouched
    assert "doc-folder" in server.docs


def test_duplicate_name_self_heals_keep_first_delete_rest():
    server = StatefulFakeKB()
    server.docs["doc-first"] = {"name": "docs/a", "content": "", "type": "text"}
    server.docs["doc-dup"] = {"name": "docs/a", "content": "", "type": "text"}
    kb = client(server)
    kb.upsert_doc("docs/a", {"md": "new"})
    assert "doc-dup" not in server.docs
    assert "doc-first" in server.docs
    assert "PATCH" in server.methods()  # updated the kept id
    assert "POST" not in server.methods()  # no third copy


def test_list_failure_raises_instead_of_creating_a_duplicate():
    server = StatefulFakeKB()
    server.fail_with("GET", KB_PATH + "$", [FakeResp(500, text="boom")])
    kb = client(server)
    with pytest.raises(HTTPError):
        kb.upsert_doc("docs/a", {"md": "A"})
    assert "POST" not in server.methods()  # never "assume nothing exists"


def test_listing_cached_once_per_run():
    server = StatefulFakeKB()
    kb = client(server)
    for i in range(5):
        kb.upsert_doc(f"doc{i}", {"md": "x"})
    gets = [r for r in server.history if r.method == "GET"]
    assert len(gets) == 1  # one listing for the whole run, not one per doc
    # and the cache stayed current: a re-upsert PATCHes instead of duplicating
    kb.upsert_doc("doc0", {"md": "y"})
    assert len(server.docs) == 5
    assert "PATCH" in server.methods()


# ── Delete / force flag (step_test.py:296-305,548-561) ──────────────────


def test_delete_always_passes_force_false_by_default():
    server = StatefulFakeKB()
    server.docs["doc-1"] = {"name": "a", "content": "", "type": "text"}
    kb = client(server)
    kb.delete_doc("a")
    dele = next(r for r in server.history if r.method == "DELETE")
    assert dele.qs.get("force") == ["false"]


def test_delete_force_passed_through():
    server = StatefulFakeKB()
    server.docs["doc-1"] = {"name": "a", "content": "", "type": "text"}
    kb = client(server, force_delete=True)
    kb.delete_doc("a")
    dele = next(r for r in server.history if r.method == "DELETE")
    assert dele.qs.get("force") == ["true"]


def test_delete_handles_empty_response_body():
    server = StatefulFakeKB()  # its DELETE returns an empty non-JSON body
    server.docs["doc-1"] = {"name": "a", "content": "", "type": "text"}
    kb = client(server)
    kb.delete_doc("a")  # must not raise on JSON decode
    assert "doc-1" not in server.docs


# ── Retry semantics (step_test.py:447-512) ──────────────────────────────


def test_create_not_retried_on_read_timeout():
    import requests

    server = StatefulFakeKB()
    server.fail_with("POST", "/text$", [requests.exceptions.ReadTimeout("slow")])
    kb = client(server)
    with pytest.raises(NonRetryableError):
        retry_call(kb.upsert_doc, "docs/a", {"md": "A"}, base=0)
    posts = [r for r in server.history if r.method == "POST"]
    assert len(posts) == 1  # the document may already exist server-side


def test_create_retried_on_connection_error():
    import requests

    server = StatefulFakeKB()
    server.fail_with("POST", "/text$", [requests.exceptions.ConnectionError("down"), None])
    kb = client(server)
    retry_call(kb.upsert_doc, "docs/a", {"md": "A"}, base=0)
    posts = [r for r in server.history if r.method == "POST"]
    assert len(posts) == 2  # never reached the server — safe to re-send
    assert len(server.docs) == 1


def test_transient_500_on_list_retried_and_succeeds():
    server = StatefulFakeKB()
    server.docs["doc-existing"] = {"name": "docs/a", "content": "", "type": "text"}
    server.fail_with("GET", KB_PATH + "$", [FakeResp(500, text="boom"), None])
    kb = client(server)
    retry_call(kb.upsert_doc, "docs/a", {"md": "new"}, base=0)
    gets = [r for r in server.history if r.method == "GET"]
    assert len(gets) == 2
    assert "PATCH" in server.methods()


def test_permanent_4xx_not_retried():
    server = StatefulFakeKB()
    server.fail_with("GET", KB_PATH + "$", [FakeResp(403, text="forbidden")])
    kb = client(server)
    with pytest.raises(HTTPError):
        retry_call(kb.list_docs, "", base=0)
    gets = [r for r in server.history if r.method == "GET"]
    assert len(gets) == 1  # permanent client error — no retry


# ── Second run against a persistent KB (step_test.py:657-716) ───────────
#
# KBUploaderSink uploads via foreachPartition — the client runs in Spark's
# Python workers, so the fake server must be cross-process (a pickled
# in-memory dict would mutate a worker-side COPY and the driver would see
# nothing). File-backed, like LocalKBClient and for the same reason.


class FileBackedFakeKB(StatefulFakeKB):
    """StatefulFakeKB with docs + request log persisted under a directory,
    so worker-side mutations are visible to the driver. Single-writer
    (tests coalesce(1)) — no locking needed."""

    def __init__(self, root, page_size_default=100):
        super().__init__(page_size_default)
        import os

        self.root = str(root)
        os.makedirs(self.root, exist_ok=True)
        # .docs / .history are read-through properties below; the parent
        # __init__'s assignments hit their no-op setters

    @property
    def docs(self):
        import json
        import os

        p = os.path.join(self.root, "docs.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    @docs.setter
    def docs(self, value):  # pragma: no cover — only __init__'s del path
        pass

    def _store(self, docs):
        import json
        import os

        with open(os.path.join(self.root, "docs.json"), "w") as f:
            json.dump(docs, f)

    @property
    def history(self):
        import json
        import os

        p = os.path.join(self.root, "log.jsonl")
        if not os.path.exists(p):
            return []
        out = []
        with open(p) as f:
            for line in f:
                rec = json.loads(line)
                r = Request(rec["method"], "https://x" + rec["path"])
                r.qs = rec["qs"]
                out.append(r)
        return out

    @history.setter
    def history(self, value):  # pragma: no cover
        pass

    def _log(self, req):
        import json
        import os

        with open(os.path.join(self.root, "log.jsonl"), "a") as f:
            f.write(json.dumps({"method": req.method, "path": req.path, "qs": req.qs}) + "\n")

    # override mutation endpoints to persist
    def get(self, url, params=None, timeout=None):
        req = Request("GET", url, params)
        self._log(req)
        planned = self._maybe_fail("GET", req.path)
        if planned is not None:
            return planned
        docs = self.docs
        folder = req.qs.get("parent_folder_id", [None])[0]
        page_size = int(req.qs.get("page_size", [str(self.page_size_default)])[0])
        cursor = int(req.qs.get("cursor", ["0"])[0])
        items = sorted(
            (i, d) for i, d in docs.items() if d.get("parent_folder_id") == folder
        )
        page = items[cursor : cursor + page_size]
        nxt = cursor + page_size
        has_more = nxt < len(items)
        return FakeResp(
            body={
                "documents": [
                    {"id": i, "name": d["name"], "type": d.get("type", "text")}
                    for i, d in page
                ],
                "has_more": has_more,
                "next_cursor": str(nxt) if has_more else None,
            }
        )

    def post(self, url, json=None, timeout=None):
        import hashlib

        req = Request("POST", url, json_body=json)
        self._log(req)
        planned = self._maybe_fail("POST", req.path)
        if planned is not None:
            return planned
        docs = self.docs
        doc_id = "doc-" + hashlib.sha256(json["name"].encode()).hexdigest()[:8]
        docs[doc_id] = {
            "name": json["name"],
            "content": json["text"],
            "type": "text",
            "parent_folder_id": json.get("parent_folder_id"),
        }
        self._store(docs)
        return FakeResp(body={"id": doc_id, "name": json["name"]})

    def request(self, method, url, json=None, timeout=None, **kw):
        if method in ("GET", "POST"):
            return super().request(method, url, json=json, timeout=timeout, **kw)
        req = Request(method, url, json_body=json)
        self._log(req)
        planned = self._maybe_fail(method, req.path)
        if planned is not None:
            return planned
        if method == "PATCH":
            docs = self.docs
            docs[req.path.rsplit("/", 1)[-1]]["content"] = json["content"]
            self._store(docs)
            return FakeResp(body={})
        raise AssertionError(f"unrouted {method} {req.path}")

    def delete(self, url, params=None, timeout=None):
        req = Request("DELETE", url, params)
        self._log(req)
        planned = self._maybe_fail("DELETE", req.path)
        if planned is not None:
            return planned
        docs = self.docs
        docs.pop(req.path.rsplit("/", 1)[-1], None)
        self._store(docs)
        return FakeResp(text="")


def docs_df(spark, n):
    return spark.createDataFrame(
        [(f"https://example.com/doc{i}", f"# Doc {i}") for i in range(n)],
        "url string, md string",
    )


def run_sink(spark, server, n, prune=True):
    # fresh client per run (like a fresh step instance per pipeline run)
    root = server.root
    fails = server.fail
    sink = KBUploaderSink(
        client_factory=lambda: _mk_client(root, fails),
        history="h",
        prune=prune,
    )
    sink.write(docs_df(spark, n).coalesce(1))


def _mk_client(root, fails):
    server = FileBackedFakeKB(root)
    server.fail = fails
    return client(server, name_prefix="wurzel/")


def test_second_run_updates_in_place_and_prunes(spark, tmp_path):
    server = FileBackedFakeKB(tmp_path / "kb")
    run_sink(spark, server, 3)
    assert len(server.docs) == 3

    run_sink(spark, server, 3)  # unchanged input: update in place, never duplicate
    assert len(server.docs) == 3, f"expected update-in-place, got {server.docs}"

    run_sink(spark, server, 2)  # one doc removed from source: prune it
    assert len(server.docs) == 2, f"expected prune, got {server.docs}"


def test_second_run_beyond_one_page_does_not_duplicate(spark, tmp_path):
    server = FileBackedFakeKB(tmp_path / "kb")
    run_sink(spark, server, 250, prune=False)  # > PAGE_SIZE — listing must paginate
    assert len(server.docs) == 250
    run_sink(spark, server, 250, prune=False)
    assert len(server.docs) == 250, "pagination miss made existing docs look new"


def test_prune_skipped_when_a_push_failed_this_run(spark, tmp_path):
    server = FileBackedFakeKB(tmp_path / "kb")
    run_sink(spark, server, 3)
    assert len(server.docs) == 3
    # next run: every create/update hard-fails → the write aborts before
    # prune; a systemic failure must never also delete real content
    server.fail_with("PATCH", ".", [FakeResp(400, text="bad")])
    server.fail_with("POST", "/text$", [FakeResp(400, text="bad")])
    with pytest.raises(Exception):
        run_sink(spark, server, 2)
    assert len(server.docs) == 3  # nothing was pruned
    assert "DELETE" not in server.methods()
