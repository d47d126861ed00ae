"""Test doubles that must cross the executor boundary.

Fakes used only on the driver live in the test modules (the
tests/test_http_backends.py pattern). A transport injected into a
``mapInPandas`` operator, however, is pickled INTO Python worker
processes, so (a) its class must be importable there — hence this module
inside the package — and (b) driver-side call recording is useless: each
worker mutates its own copy. :class:`FakeTEISession` therefore records
every request as a JSON file in a shared ``log_dir`` (same machine in
local mode) and scripts failures by request CONTENT (a marker substring),
which is deterministic across processes, unlike a per-process call
counter.
"""

from __future__ import annotations

import json
import os
import uuid


class FakeHTTPResp:
    def __init__(self, status=200, body=None, raw=None):
        self.status_code = status
        self._body = body
        self._raw = raw

    def json(self):
        if self._raw is not None:
            return json.loads(self._raw)  # raises ValueError on bad json
        return self._body


class FakeTEISession:
    """In-memory Text-Embeddings-Inference server: ``GET /info`` and
    ``POST /embed`` (list inputs → one deterministic 4-dim vector per
    input). Any /embed whose inputs contain ``fail_marker`` returns
    HTTP 500 — the whole batch fails, like a real request would."""

    def __init__(
        self,
        model_id: str = "intfloat/multilingual-e5-large",
        log_dir: str | None = None,
        fail_marker: str = "FAILME",
    ):
        self.model_id = model_id
        self.log_dir = log_dir
        self.fail_marker = fail_marker

    def _log(self, record: dict) -> None:
        if self.log_dir is None:
            return
        os.makedirs(self.log_dir, exist_ok=True)
        name = f"{os.getpid()}-{uuid.uuid4().hex}.json"
        with open(os.path.join(self.log_dir, name), "w") as f:
            json.dump(record, f)

    def request(self, method, url, json=None, timeout=None, **kw):
        path = "/" + url.split("://", 1)[-1].split("/", 1)[1]
        body = json
        self._log({"method": method, "path": path, "body": body})
        if (method, path) == ("GET", "/info"):
            return FakeHTTPResp(body={"model_id": self.model_id})
        if (method, path) == ("POST", "/embed"):
            inputs = body["inputs"]
            if any(self.fail_marker in t for t in inputs):
                return FakeHTTPResp(status=500)
            return FakeHTTPResp(
                body=[[float(len(t)), 1.0, 2.0, 3.0] for t in inputs]
            )
        return FakeHTTPResp(status=404)


def read_fake_tei_log(log_dir: str) -> list[dict]:
    """All requests recorded by every :class:`FakeTEISession` copy
    (driver + workers), unordered."""
    out = []
    if not os.path.isdir(log_dir):
        return out
    for name in sorted(os.listdir(log_dir)):
        with open(os.path.join(log_dir, name)) as f:
            out.append(json.load(f))
    return out
