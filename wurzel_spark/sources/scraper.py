"""Web-scrape source (SURVEY §2.1; reference ScraperAPIStep,
wurzel/steps/scraperapi/step.py:29-106).

Input contract: UrlItem rows ``{url: string}`` (scraperapi/data.py:14-20).
Output contract: MarkdownDataContract ``{md, keywords, url, metadata}``.

Spark shape: ``mapInPandas`` over the URL table — one HTTP session per
partition (the reference's N_JOBS thread pool, step.py:88-89, becomes
partition parallelism), retry with backoff per request (step.py:37-41),
then the §2.8 HTML pipeline per page: extract <main> (the reference's
XPath body filter, scraperapi/settings.py:24) → clean → absolutize URLs →
markdown. Keywords default to the first heading, else the page title.

At 100 TB-scale crawls the URL table is just another DataFrame:
``repartition(n)`` controls fetch concurrency, failed fetches become null
rows filtered out (skip-don't-fail, like the reference's per-doc error
handling), and the HTML→MD conversion is pure map work.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wurzel_spark.functions import html as H

#: MarkdownDataContract (common.py:80-85)
MD_SCHEMA = T.StructType(
    [
        T.StructField("md", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

MAX_RETRIES = 3
BACKOFF_BASE = 0.5  # step.py:37-41 retry policy shape


def http_fetcher(timeout: float = 10.0) -> Callable[[str], str]:
    """Real fetcher: one requests.Session per partition, full-jitter
    exponential backoff (wonderful/step.py:41-47 policy).
    Construct INSIDE the partition function — sessions don't pickle.
    """
    import requests

    session = requests.Session()

    def fetch(url: str) -> str:
        last: Exception | None = None
        for attempt in range(MAX_RETRIES):
            try:
                r = session.get(url, timeout=timeout)
                r.raise_for_status()
                return r.text
            except Exception as e:  # noqa: BLE001 - retry any transport error
                last = e
                time.sleep(random.uniform(0, BACKOFF_BASE * 2**attempt))
        raise last  # type: ignore[misc]

    return fetch


def _first_heading_or_title(md: str, html: str) -> str:
    for line in md.splitlines():
        if line.startswith("#"):
            return line.lstrip("#").strip()
    tree = H.parse_html(html)
    title = H._find(tree, "title")
    return H._raw_text(title).strip() if title is not None else ""


def page_to_markdown(html: str, url: str) -> tuple[str, str]:
    """One page through the §2.8 pipeline (step.py:104-106: body filter →
    html2md). Returns (md, keywords)."""
    body = H.extract_main(html)
    body = H.normalize_urls(body, url)
    md = H.to_markdown(body)
    return md, _first_heading_or_title(md, html)


def scrape_stage(
    df_urls: DataFrame,
    fetcher_factory: Callable[[], Callable[[str], str]] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """UrlItem table → MarkdownDataContract table.

    ``fetcher_factory`` builds the per-partition fetch function (defaults to
    a retrying requests session; tests inject a local-file or dict fetcher).
    Fetch failures yield a null ``md`` and are filtered out — a partial crawl
    is a smaller corpus, not a failed job.
    """
    factory = fetcher_factory or http_fetcher

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = factory()
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                try:
                    html = fetch(url)
                    md, kw = page_to_markdown(html, url)
                    rows.append(
                        {"md": md, "keywords": kw, "url": url, "metadata": None}
                    )
                except Exception:  # noqa: BLE001 - skip-don't-fail per doc
                    rows.append(
                        {"md": None, "keywords": None, "url": url, "metadata": None}
                    )
            yield pd.DataFrame(rows, columns=["md", "keywords", "url", "metadata"])

    out = df_urls.mapInPandas(run, schema=MD_SCHEMA)
    return out.filter(F.col("md").isNotNull())
