"""Backend artifact generation: manifest -> dvc.yaml / Argo Workflow YAML.

Reference parity (SURVEY §3.2/§3.3):
  - DVC backend (wurzel/backend/backend_dvc.py:182-237): one dvc.yaml stage
    per step; `cmd` re-enters the CLI for that single step; `deps` are the
    parent steps' output dirs (DVC checksums them and skips unchanged
    stages); `outs` is the step's own dir; leaf steps are marked
    `always_changed: true` so sources re-run every invocation.
  - Argo backend (wurzel/backend/backend_argo.py): a Workflow with a DAG
    template, one task per step, `dependencies` wired from the manifest
    edges; schedule (if present) becomes a CronWorkflow.

The generated DVC cmds use ``python -m wurzel_spark run <manifest> --only
<step> --materialize-dir <data_dir>`` — the single-step re-entry the
reference's executors rely on (base_executor.py:302-309). In Spark the
whole graph can also run as ONE composed plan (``run`` without ``--only``);
the generated artifact is for environments that want DVC's cross-run
memoization or Argo's pod-per-step isolation.

Output is deterministic (insertion-ordered dicts, sorted step iteration via
``Manifest.topo_order``) so golden-artifact tests can assert structure, as
the reference does (tests/backend/test_backend_dvc.py, test_backend_argo.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import yaml

from wurzel_spark.manifest import Manifest

#: env var carrying the pipeline run id into every step container — the
#: reference injects WURZEL_RUN_ID={{workflow.uid}} (backend_argo.py:550)
RUN_ID_ENV = "WURZEL_SPARK_RUN_ID"


@dataclass
class ArgoArtifactConfig:
    """S3 artifact passing between step pods (reference
    backend_argo.py:486-519): each step's output dir is archived to
    ``argo-workflows/{{workflow.name}}/<step>`` — workflow.name keys the
    path so concurrent/cron runs never mix — and dependency outputs are
    mounted back as input artifacts at the same local path."""

    bucket: str
    endpoint: str = "s3.amazonaws.com"
    insecure: bool = False
    access_key_secret: tuple[str, str] | None = None  # (secret name, key)
    secret_key_secret: tuple[str, str] | None = None
    mode: int | None = None  # defaultMode for restored files


def _step_cmd(manifest_path: str, step: str, data_dir: str) -> str:
    return (
        f"python -m wurzel_spark run {manifest_path} "
        f"--only {step} --materialize-dir {data_dir}"
    )


def generate_dvc(m: Manifest, manifest_path: str, data_dir: str = "data") -> str:
    """dvc.yaml text: stages keyed by step name in topological order.

    Mirrors backend_dvc.py:182-237 — deps/outs are directories (DVC hashes
    their contents), leaves get ``always_changed: true`` (the reference
    forces sources to re-run; backend_dvc.py:219).
    """
    stages: dict[str, dict] = {}
    for name in m.topo_order():
        spec = m.steps[name]
        stage: dict = {"cmd": _step_cmd(manifest_path, name, data_dir)}
        deps = [f"{data_dir}/{d}" for d in spec.depends_on]
        if deps:
            stage["deps"] = deps
        else:
            stage["always_changed"] = True
        stage["outs"] = [f"{data_dir}/{name}"]
        stages[name] = stage
    return yaml.safe_dump({"stages": stages}, sort_keys=False)


def _s3_artifact(name: str, step: str, path: str, art: ArgoArtifactConfig) -> dict:
    s3: dict = {
        "bucket": art.bucket,
        "endpoint": art.endpoint,
        "insecure": art.insecure,
        # workflow.name keys the path: cron runs get a unique suffix, so
        # runs never share artifact locations (backend_argo.py:494-497)
        "key": "argo-workflows/{{workflow.name}}/" + step,
    }
    if art.access_key_secret:
        s3["accessKeySecret"] = {
            "name": art.access_key_secret[0], "key": art.access_key_secret[1]
        }
    if art.secret_key_secret:
        s3["secretKeySecret"] = {
            "name": art.secret_key_secret[0], "key": art.secret_key_secret[1]
        }
    out: dict = {
        "name": name,
        "path": path,
        "recurseMode": True,          # directories, not single files
        "archive": {"none": {}},      # store the dir as-is (NoneArchiveStrategy)
        "s3": s3,
    }
    if art.mode is not None:
        out["mode"] = art.mode
    return out


def _step_env(m: Manifest, name: str, env: dict | None) -> list[dict]:
    """Per-step container env (backend_argo.py:546-556): the step's
    manifest settings exported in the {STEP}__{FIELD} convention the CLI
    re-entry reads back (manifest.env_settings), then the global
    container env (which WINS on collision, as in the reference's
    ``{**manifest_env, **container.env}``), then the run id."""
    spec = m.steps[name]
    merged: dict[str, str] = {
        f"{name.upper()}__{k.upper()}": str(v) for k, v in sorted(spec.settings.items())
    }
    for k, v in (env or {}).items():
        merged[k] = str(v)
    out = [{"name": k, "value": v} for k, v in merged.items()]
    out.append({"name": RUN_ID_ENV, "value": "{{workflow.uid}}"})
    return out


def generate_argo(
    m: Manifest,
    manifest_path: str,
    data_dir: str = "data",
    image: str = "spark:latest",
    env: dict | None = None,
    artifacts: ArgoArtifactConfig | None = None,
) -> str:
    """Argo Workflow (or CronWorkflow when the manifest has a schedule).

    One DAG task per step with ``dependencies`` from manifest edges
    (backend_argo.py's DAG template); each task runs the same single-step
    CLI re-entry as the DVC backend.

    Depth parity with the reference backend (r6, closing verdict Missing
    #5): each step gets its OWN template carrying (a) the step's manifest
    settings as {STEP}__{FIELD} env vars — exactly what
    ``Manifest.env_settings`` reads back inside the container, so the
    YAML round-trips the settings without a shared config mount — plus a
    global env (which wins on collision) and the run id
    ``{{workflow.uid}}``; (b) when ``artifacts`` is configured, S3
    input/output artifacts wiring each step's data dir to
    ``argo-workflows/{{workflow.name}}/<step>`` with dependency outputs
    restored as inputs (the reference's S3Artifact passing); and (c) the
    reference's retry strategy (limit 4, OnError). Without ``artifacts``,
    shared state travels via the materialization dir (PVC mount).
    """
    tasks = []
    templates: list[dict] = []
    for name in m.topo_order():
        spec = m.steps[name]
        task: dict = {"name": name, "template": f"step-{name}"}
        if spec.depends_on:
            task["dependencies"] = list(spec.depends_on)
        tasks.append(task)

        container = {
            "image": image,
            "command": ["python", "-m", "wurzel_spark"],
            "args": [
                "run", manifest_path,
                "--only", name,
                "--materialize-dir", data_dir,
            ],
            "env": _step_env(m, name, env),
        }
        template: dict = {
            "name": f"step-{name}",
            "container": container,
            "retryStrategy": {"limit": 4, "retryPolicy": "OnError"},
        }
        if artifacts is not None:
            if spec.depends_on:
                template["inputs"] = {
                    "artifacts": [
                        _s3_artifact(
                            f"wurzel-artifact-{dep}", dep,
                            f"{data_dir}/{dep}", artifacts,
                        )
                        for dep in spec.depends_on
                    ]
                }
            template["outputs"] = {
                "artifacts": [
                    _s3_artifact(
                        f"wurzel-artifact-{name}", name,
                        f"{data_dir}/{name}", artifacts,
                    )
                ]
            }
        templates.append(template)

    workflow_spec = {
        "entrypoint": "pipeline",
        "templates": [{"name": "pipeline", "dag": {"tasks": tasks}}, *templates],
    }

    if m.schedule:
        doc = {
            "apiVersion": "argoproj.io/v1alpha1",
            "kind": "CronWorkflow",
            "metadata": {"name": m.name},
            "spec": {
                "schedule": m.schedule,
                "workflowSpec": workflow_spec,
            },
        }
    else:
        doc = {
            "apiVersion": "argoproj.io/v1alpha1",
            "kind": "Workflow",
            "metadata": {"generateName": f"{m.name}-"},
            "spec": workflow_spec,
        }
    return yaml.safe_dump(doc, sort_keys=False)
