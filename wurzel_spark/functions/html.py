"""HTML → Markdown scalar function library (SURVEY §2.8).

Reference parity (wurzel/utils/to_markdown/html2md.py):
  - ``to_markdown``      — html2md.py:54-105 (external Go binary there; a
    pure-Python converter here, so it runs inside executor UDFs with no
    per-platform binary distribution problem)
  - ``clean_html``       — html2md.py:137-166 (drop script/link/style/svg/
    footer/nav/... subtrees)
  - ``normalize_urls``   — html2md.py:167-223 (absolutize href/src against a
    base URL, DOM-aware)
  - ``remove_images``    — html2md.py:107-136 (strip image tokens + thematic
    breaks from markdown)
  - ``html_to_text``     — html2md.py:224+ (tag-stripped text)
  - ``extract_main``     — the scraper's ``//main`` body filter
    (wurzel/steps/scraperapi/settings.py:24, step.py:104-106)

All functions are pure ``str -> str`` built on stdlib ``html.parser`` (no
lxml in this container). Spark surface: Arrow-batched pandas UDFs — one
Python boundary crossing per batch, compiled parser state reused across the
batch. At 100 TB this stage is embarrassingly parallel map work: no shuffle,
scales linearly with partitions.
"""

from __future__ import annotations

import re
from html import escape, unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Subtrees dropped entirely (html2md.py:137-166's clean_tree list).
DROP_TAGS = {
    "script", "style", "svg", "link", "meta", "noscript", "iframe",
    "footer", "nav", "form", "button", "head",
}

VOID_TAGS = {
    "br", "hr", "img", "input", "area", "base", "col", "embed",
    "source", "track", "wbr", "link", "meta",
}

_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "body", "html", "ul", "ol",
    "li", "table", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
    # container tags that must recurse as BLOCKS: an <h1> inside <header>
    # is still a heading (markdown_test.py:55-59), not inline text
    "header", "aside", "figure", "figcaption", "hgroup", "details",
    "summary", "fieldset", "address",
}


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    """Builds a lenient DOM tree; unclosed tags are tolerated (stack pop
    searches for the nearest matching open tag, like browsers do).
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


# ------------------------------------------------------------------ clean

def _clean(node: _Node) -> None:
    node.children = [
        c for c in node.children
        if not (isinstance(c, _Node) and c.tag in DROP_TAGS)
    ]
    for c in node.children:
        if isinstance(c, _Node):
            _clean(c)


def _render_html(node: _Node) -> str:
    out: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            out.append(escape(c, quote=False))
        else:
            attrs = "".join(f' {k}="{escape(str(v or ""))}"' for k, v in c.attrs.items())
            if c.tag in VOID_TAGS:
                out.append(f"<{c.tag}{attrs}/>")
            else:
                out.append(f"<{c.tag}{attrs}>{_render_html(c)}</{c.tag}>")
    return "".join(out)


def _clean_tree_ref(node: _Node) -> None:
    """The reference clean_tree's two extra rules (html2md.py:143-155):
    every <img> becomes <span>{alt}</span> (empty span without alt) and
    <div id="js-footer"> subtrees are removed."""
    new_children = []
    for c in node.children:
        if isinstance(c, _Node):
            if c.tag == "img":
                span = _Node("span", {})
                alt = c.attrs.get("alt")
                if alt:
                    span.children.append(alt)
                new_children.append(span)
                continue
            if c.tag == "div" and c.attrs.get("id") == "js-footer":
                continue
            _clean_tree_ref(c)
        new_children.append(c)
    node.children = new_children


def clean_html(html: str) -> str:
    """Drop script/style/svg/footer/nav/... subtrees, replace images with
    their alt text in a <span>, drop the js-footer div
    (html2md.py:137-166)."""
    tree = parse_html(html)
    _clean(tree)
    _clean_tree_ref(tree)
    return _render_html(tree)


# -------------------------------------------------------- URL normalizing

def _normalize(node: _Node, base: str) -> None:
    for c in node.children:
        if isinstance(c, _Node):
            for attr in ("href", "src"):
                v = c.attrs.get(attr)
                if v and not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", v) and not v.startswith("#"):
                    c.attrs[attr] = urljoin(base, v)
            _normalize(c, base)


def normalize_urls(html: str, base: str) -> str:
    """Absolutize relative href/src against ``base`` (html2md.py:167-223).
    DOM-aware — regex replacement can't distinguish attribute context.
    """
    tree = parse_html(html)
    _normalize(tree, base)
    return _render_html(tree)


# ------------------------------------------------------------ text / main

def _text(node: _Node, out: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        else:
            _text(c, out)
            if c.tag in _BLOCK_TAGS:
                out.append("\n")


def html_to_text(html: str) -> str:
    """Tag-stripped text content (html2md.py:224+)."""
    out: list[str] = []
    tree = parse_html(html)
    _clean(tree)
    _text(tree, out)
    return re.sub(r"\n{3,}", "\n\n", "".join(out)).strip()


def _find(node: _Node, tag: str) -> _Node | None:
    for c in node.children:
        if isinstance(c, _Node):
            if c.tag == tag:
                return c
            found = _find(c, tag)
            if found is not None:
                return found
    return None


def extract_main(html: str) -> str:
    """The scraper's ``//main`` body filter (scraperapi/step.py:104-106):
    keep only the <main> subtree; fall back to <body>, then the whole doc.
    """
    tree = parse_html(html)
    node = _find(tree, "main") or _find(tree, "body") or tree
    return _render_html(node)


# ------------------------------------------------------------- to_markdown

_WS_RE = re.compile(r"[ \t\r\n]+")


def _inline(node, md_ctx) -> str:
    if isinstance(node, str):
        return _WS_RE.sub(" ", node)
    t = node.tag
    inner = "".join(_inline(c, md_ctx) for c in node.children)
    if t == "br":
        return "\n"
    if t in ("strong", "b"):
        s = inner.strip()
        return f"**{s}**" if s else ""
    if t in ("em", "i"):
        s = inner.strip()
        return f"*{s}*" if s else ""
    if t == "code":
        return f"`{inner.strip()}`"
    if t == "a":
        href = node.attrs.get("href", "")
        s = inner.strip() or href
        return f"[{s}]({href})" if href else s
    if t == "img":
        alt = node.attrs.get("alt", "")
        src = node.attrs.get("src", "")
        return f"![{alt}]({src})"
    return inner


def _table_md(node: _Node) -> str:
    rows: list[list[str]] = []
    header_seen = False

    def walk(n):
        nonlocal header_seen
        for c in n.children:
            if isinstance(c, _Node):
                if c.tag == "tr":
                    cells = [
                        _inline(cell, None).strip()
                        for cell in c.children
                        if isinstance(cell, _Node) and cell.tag in ("td", "th")
                    ]
                    if cells:
                        rows.append(cells)
                        if any(
                            isinstance(cell, _Node) and cell.tag == "th"
                            for cell in c.children
                        ) and len(rows) == 1:
                            header_seen = True
                else:
                    walk(c)

    walk(node)
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = ["| " + " | ".join(rows[0]) + " |", "|" + " --- |" * width]
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def _block(node: _Node, depth: int = 0) -> list[str]:
    """Render a node's children as markdown blocks."""
    blocks: list[str] = []
    inline_buf: list[str] = []

    def flush():
        txt = "".join(inline_buf).strip()
        inline_buf.clear()
        if txt:
            blocks.append(txt)

    for c in node.children:
        if isinstance(c, str) or (isinstance(c, _Node) and c.tag not in _BLOCK_TAGS):
            inline_buf.append(_inline(c, None))
            continue
        flush()
        t = c.tag
        if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
            blocks.append("#" * int(t[1]) + " " + _inline(c, None).strip())
        elif t == "pre":
            code = _raw_text(c)
            blocks.append("```\n" + code.strip("\n") + "\n```")
        elif t in ("ul", "ol"):
            blocks.append("\n".join(_list_items(c, t == "ol", depth)))
        elif t == "table":
            md = _table_md(c)
            if md:
                blocks.append(md)
        elif t == "blockquote":
            inner = "\n\n".join(_block(c, depth))
            blocks.append("\n".join("> " + ln for ln in inner.splitlines()))
        else:  # p, div, section, article, main, body, html, li
            blocks.extend(_block(c, depth))
    flush()
    return blocks


def _raw_text(node: _Node) -> str:
    out: list[str] = []

    def walk(n):
        for c in n.children:
            if isinstance(c, str):
                out.append(c)
            else:
                walk(c)

    walk(node)
    return "".join(out)


def _list_items(node: _Node, ordered: bool, depth: int) -> list[str]:
    items: list[str] = []
    idx = 0
    for c in node.children:
        if isinstance(c, _Node) and c.tag == "li":
            idx += 1
            bullet = f"{idx}." if ordered else "-"
            inner = _block(c, depth + 1)
            pad = "  " * depth
            first = f"{pad}{bullet} {inner[0] if inner else ''}"
            items.append(first)
            for extra in inner[1:]:
                items.extend("  " * (depth + 1) + ln for ln in extra.splitlines())
    return items


class MarkdownConvertFailed(ValueError):
    """Conversion produced no content (html2md.py raises the same on a
    whitespace-empty result)."""


def to_markdown(html: str, strict: bool = False) -> str:
    """HTML → Markdown (html2md.py:54-105's contract, pure Python).
    Deterministic text→text; whitespace collapsed, blocks separated by one
    blank line. ``strict=True`` mirrors the reference exactly: a
    whitespace-empty conversion raises :class:`MarkdownConvertFailed`
    (markdown_test.py:86-90); the default stays lenient because in the
    distributed pipeline an empty page is a dropped row, not a failed job.
    """
    tree = parse_html(unescape_entities_safe(html))
    # Parity with the reference pipeline: to_markdown converts
    # clean_html's output (html2md.py:94 `cleaned_html = clean_html(html)`),
    # so the clean_tree rules — img→alt-span, <div id="js-footer">
    # subtree drop — apply before conversion, not just in clean_html.
    _clean(tree)
    _clean_tree_ref(tree)
    md = "\n\n".join(_block(tree)).strip()
    if strict and not md:
        raise MarkdownConvertFailed(f"Failed to convert {html!r} to md")
    return md


def unescape_entities_safe(html: str) -> str:
    # convert_charrefs in the parser already unescapes character data;
    # this hook exists for raw fragments that bypass the parser.
    return html or ""


# ---------------------------------------------------- markdown post-passes

_IMG_MD_RE = re.compile(r"!\[[^\]]*\]\([^)]*\)")
_HR_RE = re.compile(r"(?m)^(\s*)(---+|\*\*\*+|___+)\s*$")


def remove_images(md: str) -> str:
    """Strip image tokens + thematic breaks from markdown
    (html2md.py:107-136 removes Image/ThematicBreak AST tokens).
    YAML front-matter fences (leading ``---``) are preserved.
    """
    if md is None:
        return md
    body = md
    prefix = ""
    if body.startswith("---\n"):
        end = body.find("\n---\n", 4)
        if end != -1:
            prefix, body = body[: end + 5], body[end + 5 :]
    body = _IMG_MD_RE.sub("", body)
    body = _HR_RE.sub("", body)
    body = re.sub(r"\n{3,}", "\n\n", body)
    return prefix + body


# ------------------------------------------------------------ Spark UDFs

def _make_str_udf(fn):
    @F.pandas_udf(T.StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: fn(x) if x is not None else None)

    return _udf


#: Arrow-batched column functions — the Spark-facing surface.
html_to_md = _make_str_udf(to_markdown)
html_clean = _make_str_udf(clean_html)
html_text = _make_str_udf(html_to_text)
html_main = _make_str_udf(extract_main)
md_remove_images = _make_str_udf(remove_images)


@F.pandas_udf(T.StringType())
def html_normalize_urls(html: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [
            normalize_urls(h, b or "") if h is not None else None
            for h, b in zip(html, base)
        ]
    )


# ------------------------------------------------- markdown normalization

_TRAILING_WS_RE = re.compile(r"[ \t]+$", re.MULTILINE)
_HEADING_NORM_RE = re.compile(r"(?m)^(#{1,6})[ \t]+")
_BULLET_NORM_RE = re.compile(r"(?m)^(\s*)[*+](\s+|$)")


_FENCE_OPEN_RE = re.compile(r"^(\s*)(`{3,}|~{3,})(.*)$")
# CommonMark permits a setext underline indented up to 3 spaces (4+ is
# an indented code block) — both the setext→ATX pass and hard-break
# suppression must tolerate that indentation, or an indented underline
# gets a spurious trailing backslash instead of heading treatment.
_SETEXT1_RE = re.compile(r"^ {0,3}=+\s*$")
_SETEXT2_RE = re.compile(r"^ {0,3}-{2,}\s*$")
# lines that can NOT be setext heading content (already block markers)
_SETEXT_EXCLUDE_RE = re.compile(
    r"^\s*(#|[-*+][ \t]|\d+[.)][ \t]|\||>|(`{3,}|~{3,}))"
)
_THEMATIC_RE = re.compile(r"^\s*((\*[ \t]*){3,}|(-[ \t]*){3,}|(_[ \t]*){3,})$")
_ORDERED_NORM_RE = re.compile(r"^(\s*)(\d+)\)([ \t])")

# ------------------------- pipe-table reflow (mdformat-tables parity)

_TABLE_DELIM_RE = re.compile(r"^\s{0,3}\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?\s*$")
_TABLE_ROW_RE = re.compile(r"^\s{0,3}\S.*\|")
_CELL_SPLIT_RE = re.compile(r"(?<!\\)\|")


def _table_cells(line: str) -> list[str]:
    """Split a pipe-table row into stripped cells; leading/trailing
    boundary pipes are delimiters, escaped pipes stay cell content."""
    parts = _CELL_SPLIT_RE.split(line.strip())
    if parts and parts[0].strip() == "":
        parts = parts[1:]
    if parts and parts[-1].strip() == "":
        parts = parts[:-1]
    return [p.strip() for p in parts]


def _cell_width(s: str) -> int:
    """Display width: East-Asian wide/fullwidth chars count 2 (the
    wcwidth rule mdformat-tables pads by)."""
    import unicodedata

    return sum(2 if unicodedata.east_asian_width(ch) in ("W", "F") else 1 for ch in s)


def _reflow_table(lines: list[str]) -> list[str]:
    """mdformat-tables normalization: every column padded to its widest
    cell (min 3), alignment markers preserved and applied (none/left →
    ljust, right → rjust, center → centered), delimiter dashes stretched
    to the column width (``---``, ``:--``, ``--:``, ``:-:`` shapes)."""
    rows = [_table_cells(ln) for ln in lines]
    header, delim, body = rows[0], rows[1], rows[2:]
    aligns = []
    for cell in delim:
        left, right = cell.startswith(":"), cell.endswith(":")
        aligns.append(
            "center" if left and right else "left" if left else "right" if right else ""
        )
    ncols = len(header)
    widths = [
        max(3, *(_cell_width(r[c]) for r in [header, *body]))
        for c in range(ncols)
    ]

    def pad(cell: str, width: int, align: str) -> str:
        gap = width - _cell_width(cell)
        if align == "right":
            return " " * gap + cell
        if align == "center":
            return " " * (gap // 2) + cell + " " * (gap - gap // 2)
        return cell + " " * gap

    def delim_cell(width: int, align: str) -> str:
        if align == "left":
            return ":" + "-" * (width - 1)
        if align == "right":
            return "-" * (width - 1) + ":"
        if align == "center":
            return ":" + "-" * (width - 2) + ":"
        return "-" * width

    out = ["| " + " | ".join(pad(c, w, a) for c, w, a in zip(header, widths, aligns)) + " |"]
    out.append("| " + " | ".join(delim_cell(w, a) for w, a in zip(widths, aligns)) + " |")
    for r in body:
        out.append(
            "| " + " | ".join(pad(c, w, a) for c, w, a in zip(r, widths, aligns)) + " |"
        )
    return out


def _try_reflow_table(lines: list[str], i: int) -> tuple[list[str], int] | None:
    """If ``lines[i:]`` starts a GFM pipe table (header row, delimiter
    row with the same cell count, body rows while they keep that cell
    count), return (reflowed lines, lines consumed). Tables whose rows
    DISAGREE on cell count are left verbatim — mdformat's parser would
    truncate extra cells, and silently dropping cell data is the one
    mdformat behavior a data pipeline must not replicate (pinned in
    tests/test_html.py)."""
    line = lines[i]
    if "|" not in line or not _TABLE_ROW_RE.match(line) or _TABLE_DELIM_RE.match(line):
        return None
    if i + 1 >= len(lines) or not _TABLE_DELIM_RE.match(lines[i + 1]):
        return None
    header = _table_cells(line)
    delim = _table_cells(lines[i + 1])
    if not header or len(header) != len(delim):
        return None
    block = [line, lines[i + 1]]
    j = i + 2
    while j < len(lines) and "|" in lines[j] and lines[j].strip():
        cells = _table_cells(lines[j])
        if len(cells) != len(header):
            return None  # ragged table: leave the whole block verbatim
        block.append(lines[j])
        j += 1
    return _reflow_table(block), j - i


def normalize_markdown(md: str) -> str:
    """mdformat-lite normalization (reference semantic_splitter.py:107-119
    runs mdformat after splitting): trailing whitespace stripped, heading
    markers single-spaced, setext headings converted to ATX, * / + bullets
    unified to -, ``N)`` ordered markers to ``N.``, thematic breaks
    (``- - -`` / ``___`` / spaced stars) to ``***``, ≥2 blank lines collapsed
    to one, single trailing newline — and NONE of it applied inside
    fenced code blocks, whose content (including blank runs and trailing
    whitespace) passes through verbatim, as mdformat guarantees.
    Idempotent (property-tested).
    """
    if md is None:
        return md
    lines = md.split("\n")
    out: list[str] = []
    in_fence = False
    fence_close: re.Pattern[str] | None = None
    blanks = 0
    i = 0
    while i < len(lines):
        line = lines[i]
        if in_fence:
            out.append(line.rstrip() if fence_close.match(line) else line)
            if fence_close.match(line):
                in_fence = False
                fence_close = None
            i += 1
            continue
        m = _FENCE_OPEN_RE.match(line)
        if m and not m.group(3).strip().startswith(m.group(2)[0]):
            in_fence = True
            fence_close = re.compile(
                rf"^\s*{re.escape(m.group(2)[0])}{{{len(m.group(2))},}}\s*$"
            )
            blanks = 0
            out.append(line.rstrip())
            i += 1
            continue
        # pipe tables reflow as a unit (mdformat-tables parity, r12)
        t = _try_reflow_table(lines, i)
        if t is not None:
            reflowed, consumed = t
            blanks = 0
            out.extend(reflowed)
            i += consumed
            continue
        # mdformat preserves trailing-double-space HARD breaks as a
        # backslash break (a bare rstrip would silently delete the line
        # break semantics); only mid-paragraph — when the NEXT line is a
        # plain continuation. A blank line, setext underline, or any
        # block starter (heading/list/table/quote/fence/thematic break)
        # INTERRUPTS the paragraph, so the trailing spaces are not a
        # break there and mdformat drops them; table/heading/quote lines
        # themselves never take a backslash (it would invalidate a GFM
        # delimiter row).
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        hard_break = (
            line.rstrip("\n").endswith("  ")
            and line.strip() != ""
            and nxt.strip() != ""
            and not _SETEXT1_RE.match(nxt)
            and not _SETEXT2_RE.match(nxt)
            and not _SETEXT_EXCLUDE_RE.match(nxt)
            and not _THEMATIC_RE.match(nxt)
            and not line.lstrip().startswith(("#", "|", ">"))
            and not _THEMATIC_RE.match(line)
        )
        line = line.rstrip()
        if not line:
            blanks += 1
            if blanks == 1:
                out.append("")
            i += 1
            continue
        blanks = 0
        # setext → ATX: a plain-paragraph line underlined by === or ---
        if (
            i + 1 < len(lines)
            and not _SETEXT_EXCLUDE_RE.match(line)
            and not _THEMATIC_RE.match(line)
        ):
            nxt = lines[i + 1].rstrip()
            if _SETEXT1_RE.match(nxt):
                out.append("# " + line.strip())
                i += 2
                continue
            if _SETEXT2_RE.match(nxt):
                out.append("## " + line.strip())
                i += 2
                continue
        if _THEMATIC_RE.match(line):
            # normalized mark is *** — a "---" here would look like a
            # setext-2 underline for the PRECEDING line on the next pass
            # (idempotence break); *** is never a setext underline
            out.append("***")
            i += 1
            continue
        line = _HEADING_NORM_RE.sub(r"\1 ", line)
        line = _BULLET_NORM_RE.sub(r"\1-\2", line)
        line = _ORDERED_NORM_RE.sub(r"\1\2.\3", line)
        if hard_break and not line.endswith("\\"):
            line += "\\"
        out.append(line)
        i += 1
    joined = "\n".join(out)
    return joined.strip("\n") + "\n" if joined.strip() else ""


md_normalize = _make_str_udf(normalize_markdown)
