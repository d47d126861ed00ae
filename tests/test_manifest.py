"""Manifest parsing/validation/execution + env overrides + CLI."""

import os
import subprocess
import sys

import pytest

from wurzel_spark.manifest import Manifest, ManifestError, run_manifest

YAML = """
pipeline:
  name: demo
  schedule: "0 3 * * *"
steps:
  source:
    uses: markdown_source
    settings: {path: "%PATH%"}
  dedup:
    uses: dedup
    dependsOn: [source]
  split:
    uses: split
    dependsOn: [dedup]
    settings: {token_limit: 128}
"""


def _manifest(md_folder):
    return Manifest.from_yaml(YAML.replace("%PATH%", md_folder))


def test_parse_and_topo(md_folder):
    m = _manifest(md_folder)
    assert m.name == "demo"
    assert m.topo_order() == ["source", "dedup", "split"]
    assert m.terminals() == ["split"]


def test_dangling_dep_rejected():
    with pytest.raises(ManifestError, match="unknown step"):
        Manifest.from_yaml(
            "steps:\n  a:\n    uses: dedup\n    dependsOn: [ghost]\n"
        )


def test_cycle_rejected():
    with pytest.raises(ManifestError, match="cycle"):
        Manifest.from_yaml(
            "steps:\n"
            "  a:\n    uses: dedup\n    dependsOn: [b]\n"
            "  b:\n    uses: dedup\n    dependsOn: [a]\n"
        )


def test_run_manifest(spark, md_folder):
    outs = run_manifest(spark, _manifest(md_folder))
    assert set(outs) == {"split"}
    assert outs["split"].count() >= 5


def test_env_override_wins(md_folder, monkeypatch):
    monkeypatch.setenv("SPLIT__TOKEN_LIMIT", "64")
    m = _manifest(md_folder)
    assert m.env_settings("split")["token_limit"] == "64"


def test_cli_inspect_and_run(md_folder, tmp_path):
    mf = tmp_path / "m.yaml"
    mf.write_text(YAML.replace("%PATH%", md_folder))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    r = subprocess.run(
        [sys.executable, "-m", "wurzel_spark", "inspect", str(mf)],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=120,
    )
    assert r.returncode == 0
    assert "terminals: split" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "-m", "wurzel_spark", "env", str(mf)],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=120,
    )
    assert "SPLIT__TOKEN_LIMIT" in r2.stdout


def test_extended_registry_pipeline(spark, md_folder, tmp_path):
    """Full-surface manifest: source -> clean -> dedup -> truncate -> split
    -> metrics, plus a snapshot sink terminal."""
    import yaml as _yaml

    from wurzel_spark.manifest import Manifest, run_manifest

    manifest = Manifest.from_yaml(
        f"""
pipeline: {{name: full}}
steps:
  source:
    uses: markdown_source
    settings: {{path: {md_folder}}}
  clean:
    uses: clean_md
    dependsOn: [source]
  dedup:
    uses: dedup
    dependsOn: [clean]
  truncate:
    uses: truncate
    settings: {{token_limit: 64}}
    dependsOn: [dedup]
  split:
    uses: split
    settings: {{token_limit: 32, token_limit_buffer: 8, token_limit_min: 4}}
    dependsOn: [truncate]
  metrics:
    uses: doc_metrics
    dependsOn: [split]
  snap:
    uses: snapshot_sink
    settings: {{root: {tmp_path}/snaps, timestamp: "2026-01-01T000000Z"}}
    dependsOn: [metrics]
"""
    )
    outs = run_manifest(spark, manifest)
    assert list(outs) == ["snap"]
    rows = outs["snap"].collect()
    assert len(rows) >= 5  # every doc produced at least one chunk row
    assert {"md_char_len", "md_line_count", "keywords_count"} <= set(outs["snap"].columns)
    import os

    assert os.path.exists(f"{tmp_path}/snaps/latest.json")
