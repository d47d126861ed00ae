"""Retirement policy: newest-N + never-aliased + telemetry window + dry-run
(mirrors the reference's tests/steps/qdrant/retirement_test.py scenarios)."""

from datetime import datetime, timedelta, timezone

from wurzel_spark.sinks.retirement import CollectionRetirer
from wurzel_spark.sinks.versioned import LocalCollectionBackend


def _store(tmp_path, versions, alias_to=None):
    be = LocalCollectionBackend(str(tmp_path / "store"))
    for v in versions:
        be.create_collection(f"kb_v{v}", {})
    if alias_to:
        be.set_alias("kb", alias_to)
    return be


def test_keeps_newest_n_and_drops_rest(tmp_path):
    be = _store(tmp_path, range(1, 6), alias_to="kb_v5")
    dropped = CollectionRetirer(be, history_len=2).retire("kb")
    assert dropped == ["kb_v1", "kb_v2", "kb_v3"]
    assert be.list_collections() == ["kb_v4", "kb_v5"]


def test_aliased_collection_survives_even_outside_window(tmp_path):
    # alias pinned to an OLD version — must never be dropped (another env's
    # alias may target it; retirement.py:96-99)
    be = _store(tmp_path, range(1, 6), alias_to="kb_v1")
    dropped = CollectionRetirer(be, history_len=2).retire("kb")
    assert "kb_v1" not in dropped
    assert "kb_v1" in be.list_collections()


def test_recently_used_collection_survives(tmp_path):
    be = _store(tmp_path, range(1, 6), alias_to="kb_v5")
    now = datetime.now(timezone.utc)
    usage = {
        "kb_v2": now - timedelta(hours=12),  # inside 2-day window → keep
        "kb_v1": now - timedelta(days=30),  # stale → drop
    }
    dropped = CollectionRetirer(be, history_len=2, usage_fetcher=lambda: usage).retire("kb")
    assert dropped == ["kb_v1", "kb_v3"]
    assert "kb_v2" in be.list_collections()


def test_dry_run_logs_but_keeps(tmp_path):
    be = _store(tmp_path, range(1, 6), alias_to="kb_v5")
    retirer = CollectionRetirer(be, history_len=2, dry_run=True)
    planned = retirer.retire("kb")
    assert planned == ["kb_v1", "kb_v2", "kb_v3"]
    assert retirer.planned == planned
    assert be.list_collections() == [f"kb_v{v}" for v in range(1, 6)]  # nothing dropped


def test_disabled_retirement_is_noop(tmp_path):
    be = _store(tmp_path, range(1, 6), alias_to="kb_v5")
    assert CollectionRetirer(be, history_len=2, enabled=False).retire("kb") == []
    assert len(be.list_collections()) == 5


def test_missing_versions_gaps_ok(tmp_path):
    # version gaps (retirement_test.py:109) — numbering, not density, decides
    be = _store(tmp_path, [1, 7, 9], alias_to="kb_v9")
    dropped = CollectionRetirer(be, history_len=2).retire("kb")
    assert dropped == ["kb_v1"]


def test_foreign_base_untouched(tmp_path):
    be = _store(tmp_path, range(1, 6), alias_to="kb_v5")
    be.create_collection("other_v1", {})
    CollectionRetirer(be, history_len=1).retire("kb")
    assert "other_v1" in be.list_collections()


def test_qdrant_telemetry_parse():
    from tests.test_http_backends import FakeQdrant, FakeResp
    from wurzel_spark.sinks.http_backends import QdrantHTTPBackend

    server = FakeQdrant()
    telemetry = {
        "result": {
            "collections": {
                "collections": [
                    {
                        "id": "kb_v1",
                        "shards": [
                            {
                                "local": {
                                    "optimizations": {
                                        "optimizations": {
                                            "last_responded": "2026-08-12T10:00:00Z"
                                        }
                                    }
                                },
                                "remote": [
                                    {"searches": {"last_responded": "2026-08-13T01:00:00Z"}}
                                ],
                            }
                        ],
                    },
                    {"id": "kb_v2", "shards": []},
                ]
            }
        }
    }
    orig = server._route
    server._route = lambda m, p, b: (
        FakeResp(body=telemetry) if p.startswith("/telemetry") else orig(m, p, b)
    )
    be = QdrantHTTPBackend(base_url="http://q", session_factory=lambda: server)
    usage = be.usage_timestamps()
    assert set(usage) == {"kb_v1"}  # kb_v2 has no stamps
    assert usage["kb_v1"].isoformat() == "2026-08-13T01:00:00+00:00"  # max of shards
