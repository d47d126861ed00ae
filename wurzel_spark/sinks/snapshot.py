"""Timestamped JSON snapshot sink (S3MarkdownStep parity,
wurzel/steps/s3/step.py:23-104).

Protocol: write the full document set as JSON to ``<root>/<ts>.json`` plus
a ``latest.json`` copy; stamp provenance metadata; NEVER clobber ``latest``
on empty input (s3/step.py:71-77). Timestamp format %Y-%m-%dT%H%M%SZ
(s3/step.py:80) — injected by the caller for testability.

At scale the single-object write becomes partitioned JSON under
``<root>/<ts>/`` with a tiny ``latest.json`` manifest — both modes here.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame


def write_snapshot(
    df: DataFrame,
    root: str,
    timestamp: str,
    history: str = "",
    partitioned: bool | None = None,
) -> dict:
    """Returns the snapshot manifest. ``partitioned=None`` auto-selects:
    single JSON array for small outputs (reference behavior), partitioned
    JSONL dir beyond ~100k rows.
    """
    os.makedirs(root, exist_ok=True)
    n = df.count()
    if n == 0:
        # never clobber latest on empty input (s3/step.py:71-77)
        return {"rows": 0, "skipped": True}

    if partitioned is None:
        partitioned = n > 100_000

    manifest = {
        "rows": n,
        "timestamp": timestamp,
        "history": history,
        "skipped": False,
    }
    if partitioned:
        path = os.path.join(root, timestamp)
        df.orderBy(df.columns[0]).write.mode("overwrite").json(path)
        manifest["path"] = path
    else:
        path = os.path.join(root, f"{timestamp}.json")
        rows = [r.asDict(recursive=True) for r in df.orderBy(df.columns[0]).collect()]
        with open(path, "w") as f:
            json.dump(rows, f, sort_keys=True)
        manifest["path"] = path
        shutil.copyfile(path, os.path.join(root, "latest.json"))

    with open(os.path.join(root, "latest.manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest
