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

import yaml

from wurzel_spark.manifest import Manifest


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


def generate_argo(
    m: Manifest,
    manifest_path: str,
    data_dir: str = "data",
    image: str = "spark:latest",
) -> str:
    """Argo Workflow (or CronWorkflow when the manifest has a schedule).

    One DAG task per step with ``dependencies`` from manifest edges
    (backend_argo.py's DAG template); each task runs the same single-step
    CLI re-entry as the DVC backend. Shared state travels via the
    materialization dir (the reference uses S3/PVC mounts for the same).
    """
    tasks = []
    for name in m.topo_order():
        spec = m.steps[name]
        task: dict = {"name": name, "template": "step", "arguments": {
            "parameters": [{"name": "step", "value": name}],
        }}
        if spec.depends_on:
            task["dependencies"] = list(spec.depends_on)
        tasks.append(task)

    workflow_spec = {
        "entrypoint": "pipeline",
        "templates": [
            {"name": "pipeline", "dag": {"tasks": tasks}},
            {
                "name": "step",
                "inputs": {"parameters": [{"name": "step"}]},
                "container": {
                    "image": image,
                    "command": ["python", "-m", "wurzel_spark"],
                    "args": [
                        "run", manifest_path,
                        "--only", "{{inputs.parameters.step}}",
                        "--materialize-dir", data_dir,
                    ],
                },
            },
        ],
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
