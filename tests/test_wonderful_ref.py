"""Wonderful RAG dialect — reference behavioral corpus ported from
tests/steps/wonderful/step_test.py (617 LoC, Apache-2.0; behavioral
assertions re-expressed against our client/sink, fresh fixtures).

Pinned reference semantics:
  - filenames mirror the URL path with a ``.md`` extension appended unless
    already present; no URL → ``document_{idx:04d}.md`` (step_test.py:99-121)
  - two inputs mapping to one filename issue ONE create (step_test.py:158-178)
  - existing file → in-place /storage/upload, no new record, no DELETE
    (step_test.py:180-195)
  - a missing presigned URL fails the doc and rolls back the orphaned
    record by id (step_test.py:209-215,500-512)
  - sync is fire-and-forget: connection errors, read timeouts and
    gateway 524s never fail the step (step_test.py:217-248)
  - retries: 5xx/connection retried, 4xx permanent, create never re-sent
    after a read timeout (step_test.py:400-498)
  - the "neverejn" stem filter drops non-public docs (both Czech genders)
    from upload while passing the full input through (step_test.py:351-394)
  - prune deletes per-file (the batch endpoint 404s on large id lists),
    a read-timeout delete is assumed completed server-side, and prune
    failures never fail the run (step_test.py:515-617)
"""

import json
import os
import sys

import pytest
from pyspark import cloudpickle

from wurzel_spark.sinks.http_backends import HTTPError, WonderfulKBClient
from wurzel_spark.sinks.kb import (
    KBUploaderSink,
    NonRetryableError,
    retry_call,
    url_doc_name,
    url_doc_name_col,
)

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class FakeResp:
    def __init__(self, status=200, body=None, text=""):
        self.status_code = status
        self._body = body
        self.text = text or ("" if body is None else json.dumps(body))

    def json(self):
        if self._body is None:
            raise ValueError("no JSON body")
        return self._body


class FileBackedWonderful:
    """File-backed fake of Wonderful's REST surface (create→presigned PUT,
    in-place storage upload, batch delete, whole-KB sync) — cross-process
    so the sink's foreachPartition workers and the driver share state."""

    def __init__(self, root):
        self.root = str(root)
        os.makedirs(self.root, exist_ok=True)
        self.fail = {}  # key -> list of planned FakeResp/Exception (last repeats)

    # -- state helpers ---------------------------------------------------
    def _files_path(self):
        return os.path.join(self.root, "files.json")

    @property
    def files(self):
        if not os.path.exists(self._files_path()):
            return {}
        with open(self._files_path()) as f:
            return json.load(f)

    def _store(self, files):
        with open(self._files_path(), "w") as f:
            json.dump(files, f)

    def _log(self, method, path):
        with open(os.path.join(self.root, "log.jsonl"), "a") as f:
            f.write(json.dumps({"method": method, "path": path}) + "\n")

    @property
    def calls(self):
        p = os.path.join(self.root, "log.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f]

    def fail_with(self, key, responses):
        self.fail[key] = list(responses)

    def _maybe_fail(self, key):
        if key in self.fail:
            queue = self.fail[key]
            item = queue.pop(0) if len(queue) > 1 else queue[0]
            if isinstance(item, Exception):
                raise item
            return item
        return None

    @property
    def synced(self):
        return sum(1 for c in self.calls if c["path"].endswith("/sync"))

    # -- session surface -------------------------------------------------
    def request(self, method, url, json=None, files=None, data=None, timeout=None, **kw):
        path = url.split("/api/v1", 1)[1]
        self._log(method, path)
        if (method, path) == ("GET", "/knowledgebases/kb1/files"):
            planned = self._maybe_fail("list")
            if planned is not None:
                return planned
            return FakeResp(
                body={"data": [{"name": n, "id": f["id"]} for n, f in sorted(self.files.items())]}
            )
        if (method, path) == ("POST", "/knowledgebases/kb1/files"):
            planned = self._maybe_fail("create")
            if planned is not None:
                return planned
            store = self.files
            fid = f"f-{json['filename']}"
            store[json["filename"]] = {"id": fid, "content": ""}
            self._store(store)
            if self._maybe_fail("create_no_url") is not None:
                return FakeResp(body={"data": {"id": fid}})  # missing presigned URL
            return FakeResp(body={"data": {"id": fid, "url": f"https://s3/{fid}"}})
        if (method, path) == ("POST", "/storage/upload"):
            planned = self._maybe_fail("update")
            if planned is not None:
                return planned
            store = self.files
            for f in store.values():
                if f["id"] == data["file_id"]:
                    f["content"] = files["file"][1].decode()
            self._store(store)
            return FakeResp(body={})
        if (method, path) == ("DELETE", "/knowledgebases/kb1/files"):
            planned = self._maybe_fail("delete")
            if planned is not None:
                return planned
            ids = set(json["file_ids"])
            self._store({n: f for n, f in self.files.items() if f["id"] not in ids})
            return FakeResp(body={})
        raise AssertionError(f"unrouted {method} {path}")

    def put(self, url, data=None, headers=None, timeout=None):
        self._log("PUT", url)
        planned = self._maybe_fail("put")
        if planned is not None:
            return planned
        fid = url.split("https://s3/", 1)[1]
        store = self.files
        for f in store.values():
            if f["id"] == fid:
                f["content"] = data.decode()
        self._store(store)
        return FakeResp()

    def post(self, url, timeout=None, **kw):
        path = url.split("/api/v1", 1)[1]
        self._log("POST", path)
        if path.endswith("/sync"):
            planned = self._maybe_fail("sync")
            if planned is not None:
                if isinstance(planned, FakeResp):
                    return planned
            return FakeResp(body={})
        raise AssertionError(f"unrouted POST {path}")


def client(server, **kw):
    return WonderfulKBClient(
        base_url="https://t.api",
        api_key="k",
        kb_id="kb1",
        session_factory=lambda: server,
        bare_session_factory=lambda: server,
        **kw,
    )


# ── Filename generation (step_test.py:99-121) ───────────────────────────


@pytest.mark.parametrize(
    "url, idx, expected",
    [
        ("https://example.com/tmcz/baze/magenta-wi-fi", 0, "tmcz/baze/magenta-wi-fi.md"),
        ("https://example.com/docs/page.md", 0, "docs/page.md"),
        ("https://example.com/some-page", 0, "some-page.md"),
        ("", 5, "document_0005.md"),
    ],
)
def test_filename_reference_cases(url, idx, expected):
    assert url_doc_name(url, idx, ext=".md") == expected


def test_filename_stable_and_distinct():
    u = "https://example.com/docs/my-article"
    assert url_doc_name(u, 0, ext=".md") == url_doc_name(u, 99, ext=".md")
    a = url_doc_name("https://example.com/en/article", 0, ext=".md")
    b = url_doc_name("https://example.com/cs/article", 1, ext=".md")
    assert a != b


def test_filename_col_matches_python(spark):
    import pyspark.sql.functions as F

    rows = [
        ("https://example.com/tmcz/baze/magenta-wi-fi", 0),
        ("https://example.com/docs/page.md", 0),
        ("https://example.com/some-page", 0),
        ("", 5),
        (None, 9),
    ]
    df = spark.createDataFrame(rows, "url string, idx int")
    got = {
        (r["url"], r["idx"]): r["name"]
        for r in df.select(
            "url", "idx", url_doc_name_col(F.col("url"), F.col("idx"), ext=".md").alias("name")
        ).collect()
    }
    for url, idx in rows:
        assert got[(url, idx)] == url_doc_name(url or "", idx, ext=".md")


# ── Upload semantics (step_test.py:127-195) ─────────────────────────────


def test_new_file_create_then_presigned_put(tmp_path):
    server = FileBackedWonderful(tmp_path)
    kb = client(server)
    kb.upsert_doc("docs/a.md", {"md": "# A"})
    assert server.files["docs/a.md"]["content"] == "# A"
    methods = [c["method"] for c in server.calls]
    assert methods == ["GET", "POST", "PUT"]  # list once, create, S3 put


def test_existing_file_updates_in_place_no_new_record(tmp_path):
    server = FileBackedWonderful(tmp_path)
    server._store({"docs/a.md": {"id": "f-old", "content": "old"}})
    kb = client(server)
    kb.upsert_doc("docs/a.md", {"md": "# New"})
    assert server.files["docs/a.md"] == {"id": "f-old", "content": "# New"}
    paths = [(c["method"], c["path"]) for c in server.calls]
    assert ("POST", "/storage/upload") in paths
    assert ("POST", "/knowledgebases/kb1/files") not in paths
    assert not any(m == "DELETE" for m, _ in paths)


def test_listing_cached_once_per_run(tmp_path):
    server = FileBackedWonderful(tmp_path)
    kb = client(server)
    for i in range(4):
        kb.upsert_doc(f"d{i}.md", {"md": "x"})
    gets = [c for c in server.calls if c["method"] == "GET"]
    assert len(gets) == 1
    # cache stays current: re-upsert goes down the update path
    kb.upsert_doc("d0.md", {"md": "y"})
    assert len([c for c in server.calls if c["method"] == "GET"]) == 1
    assert server.files["d0.md"]["content"] == "y"
    assert len(server.files) == 4


def test_missing_presigned_url_fails_and_rolls_back(tmp_path):
    server = FileBackedWonderful(tmp_path)
    server.fail_with("create_no_url", [FakeResp(200, body={})])
    kb = client(server)
    with pytest.raises(Exception):
        kb.upsert_doc("docs/a.md", {"md": "# A"})
    # orphaned record rolled back by id via the batch endpoint
    assert server.files == {}
    assert any(c["method"] == "DELETE" for c in server.calls)


def test_s3_put_failure_rolls_back_orphan_record(tmp_path):
    server = FileBackedWonderful(tmp_path)
    server.fail_with("put", [FakeResp(500, text="s3 down")])
    kb = client(server)
    with pytest.raises(HTTPError):
        kb.upsert_doc("docs/a.md", {"md": "# A"})
    assert server.files == {}  # record rolled back


# ── Sync fire-and-forget (step_test.py:217-248,440-450) ─────────────────


def test_sync_524_and_timeout_and_connection_error_never_raise(tmp_path):
    import requests

    server = FileBackedWonderful(tmp_path)
    kb = client(server)
    server.fail_with("sync", [FakeResp(524, text="<html>gateway timeout</html>")])
    kb.sync()  # 524 → indexing started server-side
    server.fail_with("sync", [requests.exceptions.ReadTimeout("slow")])
    kb.sync()  # client read timeout → fire-and-forget
    server.fail_with("sync", [requests.exceptions.ConnectionError("down")])
    kb.sync()  # connection error → logged, not raised
    assert server.synced == 3  # each triggered exactly once, never retried


# ── Retry semantics (step_test.py:400-512) ──────────────────────────────


def test_create_not_retried_on_read_timeout(tmp_path):
    import requests

    server = FileBackedWonderful(tmp_path)
    server.fail_with("create", [requests.exceptions.ReadTimeout("timeout")])
    kb = client(server)
    with pytest.raises(NonRetryableError):
        retry_call(kb.upsert_doc, "a.md", {"md": "A"}, base=0)
    creates = [c for c in server.calls if c["path"] == "/knowledgebases/kb1/files" and c["method"] == "POST"]
    assert len(creates) == 1  # the record may already exist server-side


def test_create_retried_on_transient_connection_error(tmp_path):
    import requests

    server = FileBackedWonderful(tmp_path)
    server.fail_with("create", [requests.exceptions.ConnectionError("transient"), None])
    kb = client(server)
    retry_call(kb.upsert_doc, "a.md", {"md": "A"}, base=0)
    creates = [c for c in server.calls if c["path"] == "/knowledgebases/kb1/files" and c["method"] == "POST"]
    assert len(creates) == 2
    assert server.files["a.md"]["content"] == "A"


def test_server_error_retried_client_error_not(tmp_path):
    server = FileBackedWonderful(tmp_path)
    server.fail_with("create", [FakeResp(503, text="busy"), None])
    kb = client(server)
    retry_call(kb.upsert_doc, "a.md", {"md": "A"}, base=0)
    assert server.files["a.md"]["content"] == "A"

    server2 = FileBackedWonderful(tmp_path / "second")
    server2.fail_with("create", [FakeResp(403, text="forbidden")])
    kb2 = client(server2)
    with pytest.raises(HTTPError):
        retry_call(kb2.upsert_doc, "b.md", {"md": "B"}, base=0)
    creates = [c for c in server2.calls if c["path"] == "/knowledgebases/kb1/files" and c["method"] == "POST"]
    assert len(creates) == 1  # 4xx is permanent — one attempt


def test_prune_delete_read_timeout_assumed_completed(tmp_path):
    import requests

    server = FileBackedWonderful(tmp_path)
    server._store({"stale.md": {"id": "f-stale", "content": ""}})
    kb = client(server)
    server.fail_with("delete", [requests.exceptions.ReadTimeout("slow delete")])
    kb.delete_doc("stale.md")  # must NOT raise — server finishes it
    deletes = [c for c in server.calls if c["method"] == "DELETE"]
    assert len(deletes) == 1  # single attempt, no retry pile-up


# ── Sink-level: dedupe, neverejn filter, best-effort prune ──────────────


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "url string, md string")


def run_sink(spark, root, rows, fails=None, prune=True, exclude="neverejn"):
    fails = fails or {}

    def factory():
        server = FileBackedWonderful(root)
        server.fail = fails
        return client(server)

    sink = KBUploaderSink(
        client_factory=factory, history="h", prune=prune, exclude_url_substr=exclude
    )
    sink.write(docs_df(spark, rows).coalesce(1))


def test_input_deduped_by_name_one_create(spark, tmp_path):
    rows = [
        ("https://example.com/same/path", "# v1"),
        ("https://example.com/same/path", "# v2"),
    ]
    run_sink(spark, tmp_path, rows)
    server = FileBackedWonderful(tmp_path)
    assert len(server.files) == 1  # one create, not a worker-pool race
    creates = [
        c
        for c in server.calls
        if c["path"] == "/knowledgebases/kb1/files" and c["method"] == "POST"
    ]
    assert len(creates) == 1
    # deterministic winner: max md wins the dedupe window
    assert list(server.files.values())[0]["content"] == "# v2"


def test_neverejny_filter_uploads_only_public(spark, tmp_path):
    rows = [
        ("https://example.com/docs/nabidka_verejny.md", "# Public"),
        ("https://example.com/docs/nabidka_neverejny.md", "# Secret m."),
        ("https://example.com/docs/nabidka_neverejna.md", "# Secret f."),
        ("https://example.com/docs/nabidka_NEVEREJNY.md", "# Secret caps"),
    ]
    run_sink(spark, tmp_path, rows)
    server = FileBackedWonderful(tmp_path)
    contents = {f["content"] for f in server.files.values()}
    assert contents == {"# Public"}  # the neverejn stem catches both genders + case


def test_all_neverejny_uploads_nothing(spark, tmp_path):
    rows = [
        ("https://example.com/docs/nabidka_neverejny.md", "# A"),
        ("https://example.com/docs/prehled_neverejna.md", "# B"),
    ]
    run_sink(spark, tmp_path, rows, prune=False)
    server = FileBackedWonderful(tmp_path)
    assert server.files == {}
    creates = [
        c
        for c in server.calls
        if c["path"] == "/knowledgebases/kb1/files" and c["method"] == "POST"
    ]
    assert creates == []


def test_prune_failure_does_not_fail_run(spark, tmp_path):
    # first run seeds two docs; second run drops one but the prune DELETE
    # hard-fails — the run must still succeed (uploads persisted)
    rows2 = [("https://example.com/keep", "# Keep")]
    run_sink(
        spark,
        tmp_path,
        [("https://example.com/keep", "# Keep"), ("https://example.com/stale", "# Stale")],
    )
    server = FileBackedWonderful(tmp_path)
    assert len(server.files) == 2
    run_sink(spark, tmp_path, rows2, fails={"delete": [FakeResp(500, text="boom")]})
    server = FileBackedWonderful(tmp_path)
    assert len(server.files) == 2  # stale doc survived the failed prune — and no raise
