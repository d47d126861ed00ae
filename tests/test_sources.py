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


def _make_docx(paras):
    """Minimal valid .docx: zip with [Content_Types].xml + document.xml.
    paras: list of (heading_level_or_0, text)."""
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    for lvl, text in paras:
        style = f'<w:pPr><w:pStyle w:val="Heading{lvl}"/></w:pPr>' if lvl else ""
        body.append(f"<w:p>{style}<w:r><w:t>{text}</w:t></w:r></w:p>")
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{W}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _make_pdf(text):
    """Minimal one-page PDF with an uncompressed text content stream."""
    stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>stream\n" + stream + b"\nendstream",
    ]
    out = b"%PDF-1.4\n"
    offs = []
    for i, o in enumerate(objs, 1):
        offs.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n0000000000 65535 f \n"
    for off in offs:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    return out


def test_builtin_docx_conversion(spark, tmp_path):
    """Round 5: real DOCX parsing with the stdlib — headings map to # and
    keywords come from the first heading, not the stub."""
    (tmp_path / "guide.docx").write_bytes(
        _make_docx([(1, "User Guide"), (0, "Welcome to the product."), (2, "Setup")])
    )
    out = D.convert_stage(D.read_binary_docs(spark, str(tmp_path))).collect()
    assert len(out) == 1
    md = out[0]["md"]
    assert "# User Guide" in md and "## Setup" in md
    assert "Welcome to the product." in md
    assert out[0]["keywords"] == "User Guide"
    assert "[stub-converted" not in md


def test_builtin_pdf_conversion(spark, tmp_path):
    """Round 5: real (simple) PDF text extraction — Tj operators inside
    BT/ET, not the stub."""
    (tmp_path / "paper.pdf").write_bytes(_make_pdf("Hello PDF extraction"))
    out = D.convert_stage(D.read_binary_docs(spark, str(tmp_path))).collect()
    assert "Hello PDF extraction" in out[0]["md"]
    assert "[stub-converted" not in out[0]["md"]


def test_builtin_pdf_flate_and_escapes():
    """FlateDecode streams and escaped parens/octal unescape correctly."""
    import zlib

    from wurzel_spark.sources.docling import pdf_to_markdown

    inner = rb"BT (Line \(one\)) Tj ET BT [(Li) (ne two)] TJ ET"
    z = zlib.compress(inner)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(z)).encode()
        + b" >>stream\n"
        + z
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    md = pdf_to_markdown(pdf)
    assert "Line (one)" in md and "Line two" in md


def test_builtin_converter_falls_back_to_stub_for_garbage(spark, tmp_path):
    """Bytes that aren't really the claimed format still convert (stub),
    never fail the stage — docling_step's skip-don't-fail contract."""
    (tmp_path / "broken.pdf").write_bytes(b"%PDF-but-not-really")
    (tmp_path / "broken.docx").write_bytes(b"PK-not-a-zip")
    out = D.convert_stage(D.read_binary_docs(spark, str(tmp_path))).collect()
    assert len(out) == 2
    assert all("[stub-converted" in r["md"] for r in out)


def test_jsonl_corpus_source(spark, tmp_path):
    """JSONL → MarkdownDataContract: field aliasing, url/keyword
    fallbacks, corrupt-line skip, declared (never inferred) schema."""
    import json

    from wurzel_spark.sources.jsonl import read_jsonl_corpus

    lines = [
        {"md": "# Title A\n\nbody a", "url": "https://x/a", "keywords": "ka"},
        {"text": "# Heading B\n\nbody b", "id": "b1"},      # text alias, heading kw
        {"content": "plain body c", "id": "c1"},             # content alias, id kw
        {"md": "", "id": "empty"},                           # empty body → dropped
        {"irrelevant": 1},                                   # no body → dropped
    ]
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
        f.write("{not valid json\n")  # corrupt line → skipped
    out = {r["url"]: r for r in read_jsonl_corpus(spark, str(p)).collect()}
    assert len(out) == 3
    assert out["https://x/a"]["keywords"] == "ka"
    assert out["jsonl://b1"]["keywords"] == "Heading B"  # first-heading fallback
    assert out["jsonl://c1"]["keywords"] == "c1"  # id fallback
    # on_corrupt='fail' surfaces the bad line
    import pytest as _pytest

    with _pytest.raises(ValueError, match="corrupt"):
        read_jsonl_corpus(spark, str(p), on_corrupt="fail")
