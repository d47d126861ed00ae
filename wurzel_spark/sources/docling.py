"""Document-conversion source (SURVEY §2.1; reference DoclingStep,
wurzel/steps/docling/docling_step.py:63-141 — PDF/DOCX/PPTX → markdown with
OCR via the docling library).

Spark shape (real plumbing; codec tiers by capability):
  1. Driver fetches/loads the document list (settings.URLS,
     docling/settings.py:51) into a DataFrame of
     ``{name: string, content: binary}`` — documents as opaque binary
     columns, the same pattern as the multimodal module.
  2. ``mapInPandas`` converts each document to markdown. Converter
     resolution per partition: injected > docling (when installed) >
     BUILTIN (round 5: real stdlib-only parsing for DOCX — zip +
     WordprocessingML with heading styles; simple PDFs — unencrypted
     Flate/raw content streams, BT/ET text operators; HTML — the
     repo's own to_markdown; txt/md pass through) > deterministic stub.
  3. Keywords = first markdown heading (docling_step.py:92-109), else the
     file stem.

At scale the binary column rides normal Spark partitioning; OCR-class
conversion is CPU-heavy map work, so partitions ≈ cores and no shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from docling.document_converter import DocumentConverter  # type: ignore

    HAS_DOCLING = True
except ImportError:
    HAS_DOCLING = False

BINARY_DOC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

MD_SCHEMA = T.StructType(
    [
        T.StructField("md", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_binary_docs(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Load documents as binary rows via Spark's binaryFile source —
    distributed read, no driver materialization."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("name"),
            F.col("content"),
        )
    )


def docling_convert(name: str, content: bytes) -> str:  # pragma: no cover
    """Real converter (docling_step.py:77-90). Requires the docling wheel +
    models; not available in this container."""
    if not HAS_DOCLING:
        raise NotImplementedError(
            "docling is not installed; inject converter= into convert_stage "
            "or install docling (DoclingStep parity needs its OCR models)."
        )
    conv = DocumentConverter()
    return conv.convert(content).document.export_to_markdown()


_DOCX_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_to_markdown(content: bytes) -> str:
    """Real DOCX → markdown with the stdlib only: a .docx is a zip whose
    ``word/document.xml`` is WordprocessingML (ECMA-376, public format).
    Paragraph text from ``w:t`` runs; ``HeadingN`` paragraph styles map to
    markdown ``#`` levels. Tables/images degrade to their text runs."""
    import io
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    body = root.find(f"{_DOCX_W}body")
    if body is None:
        raise ValueError("no document body")
    lines: list[str] = []
    for p in body.iter(f"{_DOCX_W}p"):
        text = "".join(t.text or "" for t in p.iter(f"{_DOCX_W}t")).strip()
        if not text:
            continue
        lvl = 0
        style = p.find(f"{_DOCX_W}pPr/{_DOCX_W}pStyle")
        if style is not None:
            m = re.match(r"Heading(\d)", style.get(f"{_DOCX_W}val") or "", re.I)
            if m:
                lvl = int(m.group(1))
        lines.append(f"{'#' * lvl} {text}".strip() if lvl else text)
    if not lines:
        raise ValueError("no extractable text")
    return "\n\n".join(lines) + "\n"


def _pdf_unescape(raw: bytes) -> bytes:
    """PDF literal-string unescape (\\n \\r \\t \\( \\) \\\\ and octal)."""
    import re

    def sub(m):
        e = m.group(1)
        table = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"(": b"(", b")": b")", b"\\": b"\\"}
        if e in table:
            return table[e]
        if e.isdigit():
            return bytes([int(e, 8) & 0xFF])
        return e

    return re.sub(rb"\\(\d{1,3}|.)", sub, raw)


def pdf_to_markdown(content: bytes) -> str:
    """Simple-PDF text extraction with the stdlib: unencrypted PDFs whose
    content streams are raw or FlateDecode, reading the Tj / ' / " / TJ
    text-showing operators inside BT…ET blocks (PDF 32000-1, public
    format). Per-font encodings beyond latin-1 and compressed xref
    object streams are out of scope — such files raise and fall through
    to the stub (skip-don't-fail)."""
    import re
    import zlib

    if not content.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    if b"/Encrypt" in content:
        raise ValueError("encrypted PDF")
    paras: list[str] = []
    for m in re.finditer(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", content, re.S):
        d, data = m.group(1), m.group(2)
        if b"FlateDecode" in d:
            try:
                data = zlib.decompress(data)
            except Exception:  # noqa: BLE001 — not a content stream
                continue
        elif b"/Filter" in d:
            continue  # unsupported filter
        for bt in re.finditer(rb"BT(.*?)ET", data, re.S):
            block = bt.group(1)
            parts: list[bytes] = []
            for sm in re.finditer(
                rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|')", block, re.S
            ):
                parts.append(_pdf_unescape(sm.group(1)))
            for am in re.finditer(rb"\[(.*?)\]\s*TJ", block, re.S):
                parts.append(
                    b"".join(
                        _pdf_unescape(x.group(1))
                        for x in re.finditer(rb"\(((?:\\.|[^\\()])*)\)", am.group(1))
                    )
                )
            if parts:
                paras.append(b" ".join(parts).decode("latin-1", "replace"))
    if not paras:
        raise ValueError("no extractable text")
    return "\n\n".join(paras) + "\n"


def builtin_convert(name: str, content: bytes) -> str:
    """Stdlib-only conversion by extension; raises for formats that need
    a real OCR/layout stack (routed to the stub by convert_stage)."""
    ext = name.rsplit(".", 1)[-1].lower()
    if ext == "docx":
        return docx_to_markdown(content)
    if ext == "pdf":
        return pdf_to_markdown(content)
    if ext in ("html", "htm"):
        from wurzel_spark.functions.html import to_markdown

        return to_markdown(content.decode("utf-8", "replace"))
    if ext in ("md", "txt", "markdown"):
        return content.decode("utf-8", "replace")
    raise ValueError(f"no builtin converter for .{ext}")


def stub_convert(name: str, content: bytes) -> str:
    """Deterministic stand-in used when docling is absent: emits a valid
    markdown doc derived only from (name, len, sha256 prefix) so plumbing
    tests are reproducible. CLEARLY A STUB — not a document parser.
    """
    import hashlib

    digest = hashlib.sha256(content or b"").hexdigest()[:12]
    stem = name.rsplit(".", 1)[0]
    return f"# {stem}\n\n[stub-converted {len(content or b'')} bytes sha256:{digest}]\n"


def convert_stage(
    df_docs: DataFrame,
    converter: Callable[[str, bytes], str] | None = None,
    url_prefix: str = "docling://",
) -> DataFrame:
    """Binary documents → MarkdownDataContract rows.

    ``converter`` is resolved per partition: injected > docling > stub.
    Conversion failures yield null md (skip-don't-fail, docling_step.py's
    per-document error handling), filtered out.
    """

    def _fallback_convert(name: str, content: bytes) -> str:
        # builtin stdlib parsers for the public formats; stub only for
        # formats that genuinely need the OCR/layout stack
        try:
            return builtin_convert(name, content)
        except Exception:  # noqa: BLE001
            return stub_convert(name, content)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conv = converter or (docling_convert if HAS_DOCLING else _fallback_convert)
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["name"], pdf["content"]):
                try:
                    md = conv(name, content)
                    kw = next(
                        (
                            ln.lstrip("#").strip()
                            for ln in md.splitlines()
                            if ln.startswith("#")
                        ),
                        name.rsplit(".", 1)[0],
                    )
                    rows.append(
                        {
                            "md": md,
                            "keywords": kw,
                            "url": url_prefix + name,
                            "metadata": {"source_format": name.rsplit(".", 1)[-1]},
                        }
                    )
                except Exception:  # noqa: BLE001
                    rows.append(
                        {"md": None, "keywords": None, "url": url_prefix + name, "metadata": None}
                    )
            yield pd.DataFrame(rows, columns=["md", "keywords", "url", "metadata"])

    return df_docs.mapInPandas(run, schema=MD_SCHEMA).filter(F.col("md").isNotNull())
