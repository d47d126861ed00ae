"""Scraper / docling / SFTP source plumbing (SURVEY §2.1)."""

import pytest

from wurzel_spark.sources import docling as D
from wurzel_spark.sources import scraper as S
from wurzel_spark.sources import sftp as SFTP

PAGE = """<html><head><title>Fallback Title</title></head><body>
<nav>skip me</nav>
<main><h1>Scraped Page</h1><p>Body with <a href="/other">rel link</a>.</p></main>
</body></html>"""

PAGE_NO_HEADING = """<html><head><title>Only Title</title></head>
<body><main><p>just text</p></main></body></html>"""


def _dict_fetcher(pages):
    def factory():
        def fetch(url):
            if url not in pages:
                raise IOError(f"404 {url}")
            return pages[url]

        return fetch

    return factory


def test_scrape_stage(spark):
    pages = {
        "https://ex.com/a": PAGE,
        "https://ex.com/b": PAGE_NO_HEADING,
        # /dead missing -> fetch error -> skipped
    }
    urls = spark.createDataFrame(
        [("https://ex.com/a",), ("https://ex.com/b",), ("https://ex.com/dead",)],
        ["url"],
    )
    out = S.scrape_stage(urls, fetcher_factory=_dict_fetcher(pages))
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {"https://ex.com/a", "https://ex.com/b"}  # dead skipped
    a = rows["https://ex.com/a"]
    assert "# Scraped Page" in a["md"]
    assert "skip me" not in a["md"]  # nav outside <main>
    assert "[rel link](https://ex.com/other)" in a["md"]  # absolutized
    assert a["keywords"] == "Scraped Page"  # first heading
    assert rows["https://ex.com/b"]["keywords"] == "Only Title"  # title fallback


def test_docling_stub_stage(spark, tmp_path):
    (tmp_path / "report.pdf").write_bytes(b"%PDF-fake-bytes")
    (tmp_path / "notes.docx").write_bytes(b"PK-fake-docx")
    docs = D.read_binary_docs(spark, str(tmp_path))
    out = D.convert_stage(docs).orderBy("url").collect()
    assert [r["url"] for r in out] == ["docling://notes.docx", "docling://report.pdf"]
    assert out[1]["keywords"] == "report"
    assert out[1]["metadata"]["source_format"] == "pdf"
    assert "[stub-converted 15 bytes" in out[1]["md"]
    # deterministic: same input -> same md
    again = D.convert_stage(D.read_binary_docs(spark, str(tmp_path))).orderBy("url").collect()
    assert [r["md"] for r in again] == [r["md"] for r in out]


def test_docling_injected_converter(spark, tmp_path):
    (tmp_path / "x.pdf").write_bytes(b"abc")
    docs = D.read_binary_docs(spark, str(tmp_path))
    out = D.convert_stage(docs, converter=lambda n, c: f"# Real {n}\n\n{len(c)}").collect()
    assert out[0]["md"] == "# Real x.pdf\n\n3"


def test_sftp_sync_and_read(spark, tmp_path):
    remote = tmp_path / "remote"
    (remote / "sub").mkdir(parents=True)
    (remote / "top.md").write_text("# Top\n\ndoc\n")
    (remote / "sub" / "deep.md").write_text("---\nkeywords: \"k1,k2\"\n---\n# Deep\n\nd\n")
    (remote / "skip.txt").write_text("not md")
    staging = tmp_path / "staging"

    client = SFTP.LocalDirClient(str(remote))
    df = SFTP.read_sftp_markdown(spark, client, "/", str(staging), url_prefix="sftp://host")
    rows = sorted(df.collect(), key=lambda r: r["keywords"])
    assert len(rows) == 2
    assert rows[0]["keywords"] == "k1,k2"  # front-matter wins
    assert rows[1]["keywords"] == "top"  # stem default
    # non-recursive only syncs top level
    staging2 = tmp_path / "staging2"
    n = SFTP.sync_tree(client, "/", str(staging2), recursive=False)
    assert n == 1


# ------------------------------------- Python Data Source (wurzel_markdown)

def test_markdown_datasource_matches_expression_reader(spark, md_folder):
    """spark.read.format("wurzel_markdown") must emit exactly the rows of
    read_markdown_folder on the same fixture (both implement
    MarkdownDataContract.from_file)."""
    from wurzel_spark.sources.datasource import register
    from wurzel_spark.sources.markdown import read_markdown_folder

    register(spark)
    via_ds = (
        spark.read.format("wurzel_markdown")
        .option("filesPerPartition", 2)
        .load(md_folder)
    )
    via_expr = read_markdown_folder(spark, md_folder)
    key = lambda r: r["url"]
    a = sorted(via_ds.collect(), key=key)
    b = sorted(via_expr.collect(), key=key)
    assert len(a) == len(b) == 5
    for ra, rb in zip(a, b):
        assert (ra["md"], ra["keywords"], ra["url"], ra["metadata"]) == (
            rb["md"], rb["keywords"], rb["url"], rb["metadata"]
        )


def test_markdown_datasource_partition_planning(spark, md_folder):
    """filesPerPartition must drive the task split (5 files, 2 per
    partition -> 3 partitions)."""
    from wurzel_spark.sources.datasource import register

    register(spark)
    df = (
        spark.read.format("wurzel_markdown")
        .option("filesPerPartition", 2)
        .load(md_folder)
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5
