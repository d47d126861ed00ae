"""Middleware chain: ordering, secret resolution, prometheus gauges, env
selection, and manifest wiring (reference: wurzel/middlewares/*)."""

import pytest

from wurzel_spark.middleware import (
    MiddlewareChain,
    SecretResolverError,
    StepContext,
    chain_from_env,
    prometheus,
    secret_resolver,
)


def test_chain_order_is_outermost_first():
    calls = []

    def mk(tag):
        def mw(ctx, call_next):
            calls.append(f"{tag}:in")
            out = call_next(ctx)
            calls.append(f"{tag}:out")
            return out

        return mw

    chain = MiddlewareChain([mk("a"), mk("b")])
    ctx = StepContext("s", {})
    assert chain.execute(ctx, lambda c: "result") == "result"
    assert calls == ["a:in", "b:in", "b:out", "a:out"]


def test_secret_resolver_env_and_file(tmp_path, monkeypatch):
    monkeypatch.setenv("WURZEL_SECRET_API_KEY", "from-env")
    (tmp_path / "db-pass").write_text("from-file\n")
    from wurzel_spark.middleware import env_file_secret_source

    mw = secret_resolver(env_file_secret_source(str(tmp_path)))
    ctx = StepContext(
        "s",
        {
            "token": "Bearer ${secret:api_key}",
            "nested": {"password": "${secret:db-pass}", "n": 3},
            "items": ["${secret:api_key}", "plain"],
        },
    )
    seen = {}
    MiddlewareChain([mw]).execute(ctx, lambda c: seen.update(c.settings))
    assert seen["token"] == "Bearer from-env"
    assert seen["nested"] == {"password": "from-file", "n": 3}
    assert seen["items"] == ["from-env", "plain"]


def test_secret_resolver_missing_fails_before_step():
    mw = secret_resolver(lambda name: (_ for _ in ()).throw(SecretResolverError(name)))
    ctx = StepContext("s", {"k": "${secret:ghost}"})
    ran = []
    with pytest.raises(SecretResolverError):
        MiddlewareChain([mw]).execute(ctx, lambda c: ran.append(1))
    assert ran == []  # step never ran — fail up front, not mid-write


def test_prometheus_pushes_gauges_and_reports():
    pushed = []
    mw = prometheus(push=pushed.append)
    ctx = StepContext("mystep", {}, run_id="r42")
    assert MiddlewareChain([mw]).execute(ctx, lambda c: "ok") == "ok"
    (payload,) = pushed
    assert 'wurzel_step_duration_seconds{step_name="mystep",run_id="r42"}' in payload
    assert 'wurzel_step_status{step_name="mystep",run_id="r42"} 1' in payload
    assert ctx.report["status"] == 1 and ctx.report["seconds"] >= 0


def test_prometheus_records_failure_status():
    pushed = []
    mw = prometheus(push=pushed.append)
    ctx = StepContext("boom", {}, run_id="r1")
    with pytest.raises(RuntimeError):
        MiddlewareChain([mw]).execute(
            ctx, lambda c: (_ for _ in ()).throw(RuntimeError("x"))
        )
    assert 'wurzel_step_status{step_name="boom",run_id="r1"} 0' in pushed[0]
    assert ctx.report["status"] == 0


def test_chain_from_env_selects_builtins(monkeypatch):
    assert chain_from_env("").middlewares == []
    assert len(chain_from_env("secret_resolver,prometheus").middlewares) == 2
    monkeypatch.setenv("MIDDLEWARES", "prometheus")
    assert len(chain_from_env().middlewares) == 1
    from wurzel_spark.middleware import MiddlewareError

    with pytest.raises(MiddlewareError, match="unknown middleware"):
        chain_from_env("nope")


def test_manifest_runs_through_chain(spark, md_folder, monkeypatch):
    """MIDDLEWARES=secret_resolver resolves placeholders in manifest
    settings before the step fn runs (end-to-end wiring)."""
    monkeypatch.setenv("MIDDLEWARES", "secret_resolver")
    monkeypatch.setenv("WURZEL_SECRET_MD_PATH", md_folder)
    from wurzel_spark.manifest import Manifest, run_manifest

    m = Manifest.from_yaml(
        """
steps:
  source:
    uses: markdown_source
    settings: {path: "${secret:md_path}"}
  dedup:
    uses: dedup
    dependsOn: [source]
"""
    )
    outs = run_manifest(spark, m)
    assert outs["dedup"].count() >= 3
