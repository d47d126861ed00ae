"""Reference manifest-validator corpus, ported
(tests/manifest/validator_test.py → wurzel_spark.manifest.ManifestValidator).

The reference validator returns ERROR LISTS — no exceptions — so a user
sees every problem aggregated in one pass; Manifest.validate (raising,
parse-time) keeps the fail-fast contract separately.
"""

from __future__ import annotations

import subprocess
import sys

from wurzel_spark.manifest import Manifest, ManifestValidator, StepSpec


def _make(steps: list[dict]) -> Manifest:
    specs = {
        s["name"]: StepSpec(
            name=s["name"],
            uses=s.get("uses", "dedup"),
            depends_on=s.get("dependsOn", []),
            settings={},
        )
        for s in steps
    }
    return Manifest(name="test", steps=specs)


class TestValidateStepRefs:
    def test_valid_refs_returns_no_errors(self):
        m = _make([{"name": "a"}, {"name": "b", "dependsOn": ["a"]}])
        assert ManifestValidator(m).validate_step_refs() == []

    def test_undefined_ref_returns_error(self):
        m = _make([{"name": "b", "dependsOn": ["nonexistent"]}])
        errors = ManifestValidator(m).validate_step_refs()
        assert len(errors) == 1 and "nonexistent" in errors[0]

    def test_multiple_undefined_refs(self):
        m = _make([{"name": "b", "dependsOn": ["x", "y"]}])
        assert len(ManifestValidator(m).validate_step_refs()) == 2

    def test_fan_in_valid_refs(self):
        m = _make(
            [{"name": "a"}, {"name": "b"}, {"name": "c", "dependsOn": ["a", "b"]}]
        )
        assert ManifestValidator(m).validate_step_refs() == []


class TestValidateNoCycles:
    def test_linear_chain_no_cycle(self):
        m = _make(
            [{"name": "a"}, {"name": "b", "dependsOn": ["a"]},
             {"name": "c", "dependsOn": ["b"]}]
        )
        assert ManifestValidator(m).validate_no_cycles() == []

    def test_direct_cycle_detected(self):
        m = _make([{"name": "a", "dependsOn": ["b"]}, {"name": "b", "dependsOn": ["a"]}])
        assert len(ManifestValidator(m).validate_no_cycles()) >= 1

    def test_self_reference_detected(self):
        m = _make([{"name": "a", "dependsOn": ["a"]}])
        assert len(ManifestValidator(m).validate_no_cycles()) >= 1

    def test_transitive_cycle_detected(self):
        m = _make(
            [{"name": "a", "dependsOn": ["c"]}, {"name": "b", "dependsOn": ["a"]},
             {"name": "c", "dependsOn": ["b"]}]
        )
        assert len(ManifestValidator(m).validate_no_cycles()) >= 1

    def test_fan_in_no_cycle(self):
        m = _make(
            [{"name": "a"}, {"name": "b"}, {"name": "c", "dependsOn": ["a", "b"]}]
        )
        assert ManifestValidator(m).validate_no_cycles() == []

    def test_undefined_ref_skipped_in_cycle_check(self):
        """validator_test.py:175-188: a dependsOn naming a nonexistent
        step is SKIPPED by the cycle check (not a crash, not a cycle);
        validate_step_refs catches the bad ref separately."""
        m = _make([{"name": "a", "dependsOn": ["nonexistent"]}])
        assert ManifestValidator(m).validate_no_cycles() == []
        assert len(ManifestValidator(m).validate_step_refs()) == 1


class TestValidateUses:
    def test_registry_name_no_error(self):
        m = _make([{"name": "s", "uses": "markdown_source"}])
        assert ManifestValidator(m).validate_uses() == []

    def test_module_path_no_error(self):
        m = _make([{"name": "s", "uses": "wurzel_spark.manifest:_dedup"}])
        assert ManifestValidator(m).validate_uses() == []

    def test_nonexistent_module_returns_error(self):
        m = _make([{"name": "s", "uses": "nonexistent.module:Step"}])
        errors = ManifestValidator(m).validate_uses()
        assert len(errors) == 1 and "nonexistent.module:Step" in errors[0]

    def test_nonexistent_attr_in_valid_module_returns_error(self):
        m = _make([{"name": "s", "uses": "wurzel_spark.manifest:NoSuchFn"}])
        assert len(ManifestValidator(m).validate_uses()) == 1

    def test_unknown_registry_name_returns_error(self):
        m = _make([{"name": "s", "uses": "no_such_step"}])
        assert len(ManifestValidator(m).validate_uses()) == 1


class TestValidateMiddlewareNames:
    def test_registered_middleware_no_error(self):
        m = _make([{"name": "s"}])
        assert ManifestValidator(m).validate_middleware_names(["prometheus"]) == []

    def test_unregistered_middleware_returns_error(self):
        m = _make([{"name": "s"}])
        errors = ManifestValidator(m).validate_middleware_names(
            ["nonexistent_middleware"]
        )
        assert len(errors) == 1 and "nonexistent_middleware" in errors[0]

    def test_empty_middlewares_no_error(self, monkeypatch):
        monkeypatch.delenv("MIDDLEWARES", raising=False)
        m = _make([{"name": "s"}])
        assert ManifestValidator(m).validate_middleware_names() == []

    def test_env_middlewares_checked(self, monkeypatch):
        monkeypatch.setenv("MIDDLEWARES", "prometheus,ghost")
        m = _make([{"name": "s"}])
        errors = ManifestValidator(m).validate_middleware_names()
        assert len(errors) == 1 and "ghost" in errors[0]


class TestValidateAll:
    def test_valid_manifest_returns_no_errors(self):
        m = _make(
            [{"name": "src", "uses": "markdown_source"},
             {"name": "spl", "uses": "split", "dependsOn": ["src"]}]
        )
        assert ManifestValidator(m).validate_all(middlewares=[]) == []

    def test_multiple_errors_aggregated(self):
        """validator_test.py:201-209: a bad ref AND a bad class path
        both surface in one validate_all pass."""
        m = _make([{"name": "a", "uses": "no.such:Module", "dependsOn": ["ghost"]}])
        errors = ManifestValidator(m).validate_all(middlewares=[])
        assert len(errors) >= 2
        assert any("ghost" in e for e in errors)
        assert any("no.such:Module" in e for e in errors)


ENV_YAML = """
pipeline: {name: demo}
steps:
  source:
    uses: markdown_source
    settings: {path: null}
  split:
    uses: split
    dependsOn: [source]
    settings: {token_limit: 128}
"""


def _run_cli(argv, tmp_path, yaml_text=ENV_YAML, env=None):
    import os

    mf = tmp_path / "m.yaml"
    mf.write_text(yaml_text)
    return subprocess.run(
        [sys.executable, "-m", "wurzel_spark", *argv, str(mf)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
        env={**os.environ, **(env or {})},
    )


class TestEnvCmdModes:
    """Reference env_cmd modes ported (tests/cli/main_test.py:171-248):
    required/optional flagging, --only-required filter, --gen-env file
    emission seeded from env-or-default, --check exit semantics."""

    def test_listing_marks_required_and_optional(self, tmp_path):
        r = _run_cli(["env"], tmp_path)
        assert "SOURCE__PATH (required)" in r.stdout
        assert "SPLIT__TOKEN_LIMIT (optional) default=128" in r.stdout

    def test_only_required_filters_optional(self, tmp_path):
        r = _run_cli(["env", "--only-required"], tmp_path)
        assert "SOURCE__PATH" in r.stdout
        assert "SPLIT__TOKEN_LIMIT" not in r.stdout

    def test_gen_env_seeds_from_environment_and_defaults(self, tmp_path):
        r = _run_cli(
            ["env", "--gen-env"], tmp_path, env={"SOURCE__PATH": "/tmp/custom"}
        )
        assert "# Generated env vars" in r.stdout
        assert "# source" in r.stdout and "# split" in r.stdout
        assert "SOURCE__PATH=/tmp/custom" in r.stdout
        assert "SPLIT__TOKEN_LIMIT=128" in r.stdout

    def test_gen_env_empty_when_no_default_no_env(self, tmp_path):
        r = _run_cli(["env", "--gen-env"], tmp_path)
        assert "SOURCE__PATH=\n" in r.stdout

    def test_check_failure_lists_missing_and_exits_one(self, tmp_path):
        r = _run_cli(["env", "--check"], tmp_path)
        assert r.returncode == 1
        assert "Missing environment variables" in r.stdout
        assert "SOURCE__PATH" in r.stdout

    def test_check_success(self, tmp_path):
        r = _run_cli(["env", "--check"], tmp_path, env={"SOURCE__PATH": "/tmp"})
        assert r.returncode == 0
        assert "All required environment variables are set." in r.stdout


def test_env_settings_nested_delimiter(monkeypatch):
    """Reference nested-settings semantics (core/settings.py:42
    env_nested_delimiter='__', tests/settings/base_test.py:40-170):
    {STEP}__{OUTER}__{INNER} descends into a dict-valued setting,
    coerced against the nested default; manifest defaults stay
    unmutated; a path whose first segment is NOT a dict stays flat."""
    m = Manifest.from_yaml(
        "pipeline: {name: d}\n"
        "steps:\n"
        "  tune:\n"
        "    uses: dedup\n"
        "    settings:\n"
        "      http: {timeout: 30, retries: {max: 3}}\n"
        "      flat: 1\n"
    )
    monkeypatch.setenv("TUNE__HTTP__TIMEOUT", "60")
    monkeypatch.setenv("TUNE__HTTP__RETRIES__MAX", "9")
    monkeypatch.setenv("TUNE__FLAT", "2")
    monkeypatch.setenv("TUNE__NEW__THING", "x")
    s = m.env_settings("tune")
    assert s["http"]["timeout"] == 60  # coerced to int via nested default
    assert s["http"]["retries"]["max"] == 9
    assert s["flat"] == 2
    assert s["new__thing"] == "x"  # no dict default to descend → flat key
    # copy-on-write: the manifest defaults are untouched
    assert m.steps["tune"].settings["http"]["timeout"] == 30
    assert m.steps["tune"].settings["http"]["retries"]["max"] == 3


def test_cli_validate_aggregates_and_exits_nonzero(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        "pipeline: {name: demo}\n"
        "steps:\n"
        "  a:\n    uses: no.such:Module\n    dependsOn: [ghost]\n"
    )
    r = subprocess.run(
        [sys.executable, "-m", "wurzel_spark", "validate", str(bad)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 1
    assert "ghost" in r.stdout and "no.such:Module" in r.stdout

    good = tmp_path / "good.yaml"
    good.write_text("pipeline: {name: demo}\nsteps:\n  a: {uses: dedup}\n")
    r2 = subprocess.run(
        [sys.executable, "-m", "wurzel_spark", "validate", str(good)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r2.returncode == 0 and "OK" in r2.stdout
