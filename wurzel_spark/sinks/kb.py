"""Passthrough knowledge-base uploader sinks.

One generic implementation covers the reference's three KB sinks — they
share the same skeleton (SURVEY §2.6):
  - WonderfulRAGStep (wurzel/steps/wonderful/step.py:26-386): 2-phase
    create/update per doc + post-upload sync; prune stale docs
  - ElevenLabsKnowledgeBaseStep (elevenlabs/step.py:31-358): deterministic
    doc names from URL + lineage tag; prune scoped by lineage
  - DecagonKnowledgeBaseStep (decagon/step.py:21-161): remote chunking then
    per-chunk create

Shared mechanics re-expressed for Spark:
  - uploads run in ``foreachPartition`` with a per-partition client and
    retry w/ full-jitter exponential backoff (wonderful/step.py:41-47,
    elevenlabs/step.py:108-121)
  - doc names derive deterministically from (url, history) so task retries
    are idempotent (elevenlabs/step.py:38-49)
  - prune-stale = LEFT ANTI join of the remote listing against the input's
    names, scoped to this pipeline's history tag (elevenlabs/step.py:284)
"""

from __future__ import annotations

import hashlib
import random
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_RETRIES = 3  # wonderful/step.py:67
BACKOFF_BASE = 0.5  # wonderful/step.py:68


def doc_name(url: str, history: str) -> str:
    """Deterministic doc name from (url, lineage) — elevenlabs/step.py:38-49."""
    return hashlib.sha256(f"{history}::{url}".encode()).hexdigest()[:32]


def doc_name_col(url, history: str):
    """Column twin of :func:`doc_name` — JVM-side sha2/concat, no Python UDF."""
    return F.substring(
        F.sha2(
            F.concat(F.lit(f"{history}::"), F.coalesce(url, F.lit(""))).cast("binary"),
            256,
        ),
        1,
        32,
    )


def retry_call(fn, *args, max_retries: int = MAX_RETRIES, base: float = BACKOFF_BASE):
    """Full-jitter exponential backoff (elevenlabs/step.py:108-121)."""
    for attempt in range(max_retries + 1):
        try:
            return fn(*args)
        except Exception:
            if attempt == max_retries:
                raise
            time.sleep(random.uniform(0, base * (2**attempt)))


class KBClient:
    """Protocol for a remote knowledge base (subset used by the sinks)."""

    def list_docs(self, tag: str) -> list[str]:
        raise NotImplementedError

    def upsert_doc(self, name: str, payload: dict) -> None:
        raise NotImplementedError

    def delete_doc(self, name: str) -> None:
        raise NotImplementedError

    def sync(self) -> None:  # wonderful/step.py:151 fire-and-forget
        pass


class LocalKBClient(KBClient):
    """Filesystem-backed test double. Must be cross-process: upload runs in
    Spark's Python workers while list/prune run on the driver — an
    in-memory dict would silently see nothing.
    """

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, name: str) -> str:
        import os

        return os.path.join(self.root, f"{name}.json")

    def list_docs(self, tag: str) -> list[str]:
        import json
        import os

        out = []
        for f in sorted(os.listdir(self.root)):
            if f.endswith(".json"):
                with open(os.path.join(self.root, f)) as fh:
                    if json.load(fh).get("history") == tag:
                        out.append(f[: -len(".json")])
        return out

    def upsert_doc(self, name: str, payload: dict) -> None:
        import json

        with open(self._p(name), "w") as f:
            json.dump(payload, f, sort_keys=True)

    def delete_doc(self, name: str) -> None:
        import contextlib
        import os

        with contextlib.suppress(FileNotFoundError):
            os.remove(self._p(name))


@dataclass
class KBUploaderSink:
    """Generic passthrough KB sink: upload every doc, optionally prune
    remote docs (same lineage) that are no longer in the input.
    """

    client_factory: object  # Callable[[], KBClient], picklable
    history: str = ""
    prune: bool = True
    uploaded_names: list = field(default_factory=list)

    def write(self, df: DataFrame) -> DataFrame:
        history = self.history
        factory = self.client_factory

        def upload(rows) -> None:
            client = factory()
            for r in rows:
                d = r.asDict(recursive=True)
                name = doc_name(d.get("url", ""), history)
                payload = {**d, "history": history, "name": name}
                retry_call(client.upsert_doc, name, payload)

        df.foreachPartition(upload)

        if self.prune:
            client = factory()
            remote = client.list_docs(history)
            spark = df.sparkSession
            remote_df = spark.createDataFrame(
                [(n,) for n in remote] or [(None,)], "name string"
            ).filter(F.col("name").isNotNull())
            current = df.select(doc_name_col(F.col("url"), history).alias("name")).distinct()
            stale = remote_df.join(current, "name", "left_anti")
            # KB listings are service-bounded (thousands of docs, not data
            # rows) — the collect() here is a small control-plane result.
            for row in stale.collect():
                retry_call(client.delete_doc, row["name"])

        client = factory()
        client.sync()
        return df

    def write_delta(self, new_df: DataFrame, old_df: DataFrame) -> DataFrame:
        """Incremental publish (round 5): upload only the SNAPSHOT DELTA —
        docs whose content hash changed or that are new since ``old_df``
        (operators/snapshots.snapshot_diff keyed on the url identity) —
        then prune against the FULL new snapshot's names so removed docs
        disappear and unchanged docs survive untouched. Uploads scale
        with the delta, not the corpus; upserts are idempotent by
        deterministic doc name, so re-running a partially-failed delta
        publish converges.
        """
        from wurzel_spark.operators.snapshots import snapshot_diff

        changed = (
            snapshot_diff(old_df, new_df, id_col="url", text_col="text")
            .filter(F.col("status") != "removed")
            .select("url")
        )
        delta = new_df.join(changed, "url", "left_semi")
        history = self.history
        factory = self.client_factory

        def upload(rows) -> None:
            client = factory()
            for r in rows:
                d = r.asDict(recursive=True)
                name = doc_name(d.get("url", ""), history)
                payload = {**d, "history": history, "name": name}
                retry_call(client.upsert_doc, name, payload)

        delta.foreachPartition(upload)

        if self.prune:
            client = factory()
            remote = client.list_docs(history)
            spark = new_df.sparkSession
            remote_df = spark.createDataFrame(
                [(n,) for n in remote] or [(None,)], "name string"
            ).filter(F.col("name").isNotNull())
            current = new_df.select(
                doc_name_col(F.col("url"), history).alias("name")
            ).distinct()
            stale = remote_df.join(current, "name", "left_anti")
            for row in stale.collect():
                retry_call(client.delete_doc, row["name"])

        client = factory()
        client.sync()
        return delta
