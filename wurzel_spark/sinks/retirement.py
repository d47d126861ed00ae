"""Versioned-collection retirement with usage telemetry and dry-run.

Reference parity (wurzel/steps/qdrant/retirement.py:21-117): a collection
is retired only when ALL hold:
  - not among the newest ``history_len`` versions,
  - not currently targeted by ANY alias,
  - not used within the last ``usage_retention_days`` (per service
    telemetry — the most recent responded-at timestamp across shards).

``dry_run`` logs the would-be deletions without deleting
(retirement.py:81-87); ``enabled=False`` skips retirement entirely
(retirement.py:35-38). Defaults mirror qdrant/settings.py: history 10,
retention 2 days.

Driver-side metadata work only — nothing here touches the distributed
write path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from logging import getLogger
from typing import Callable

from wurzel_spark.sinks.versioned import HISTORY_LEN, _VERSION_RE, CollectionBackend

log = getLogger(__name__)

USAGE_RETENTION_DAYS = 2  # qdrant/settings.py:50


@dataclass
class CollectionRetirer:
    """Keep-newest-N + never-aliased + not-recently-used retirement."""

    backend: CollectionBackend
    history_len: int = HISTORY_LEN
    usage_retention_days: int = USAGE_RETENTION_DAYS
    dry_run: bool = False
    enabled: bool = True
    # collection name -> last-used timestamp (tz-aware). Injected so any
    # backend can supply telemetry; QdrantHTTPBackend.usage_timestamps fits.
    usage_fetcher: Callable[[], dict[str, datetime]] | None = None
    # filled by retire() in dry-run mode: names that WOULD be dropped
    planned: list = field(default_factory=list)

    def retire(self, base: str) -> list[str]:
        """Retire old ``{base}_v{n}`` collections. Returns dropped names
        (or, under dry_run, the names that would have been dropped)."""
        if not self.enabled:
            log.info("collection retirement disabled — skipping")
            return []
        versions = sorted(
            (int(m.group("n")), c)
            for c in self.backend.list_collections()
            if (m := _VERSION_RE.match(c)) and m.group("base") == base
        )
        if not versions:
            return []
        keep_versions = {n for n, _ in versions[-self.history_len :]}
        aliased = set(self.backend.list_aliases().values())
        usage = self.usage_fetcher() if self.usage_fetcher else {}
        threshold = datetime.now(timezone.utc) - timedelta(days=self.usage_retention_days)

        dropped: list[str] = []
        for n, name in versions:
            if n in keep_versions:
                continue
            if name in aliased:
                log.info("skip retirement: still aliased", extra={"collection": name})
                continue
            last_used = usage.get(name)
            if last_used is not None and last_used > threshold:
                log.info("skip retirement: recently used", extra={"collection": name})
                continue
            if self.dry_run:
                log.info("[DRY RUN] would retire collection", extra={"collection": name})
                self.planned.append(name)
            else:
                log.info("retiring collection", extra={"collection": name})
                self.backend.drop_collection(name)
            dropped.append(name)
        return dropped
