"""Text Column builders — pure `pyspark.sql.functions` compositions.

Everything here compiles into whole-stage codegen (no Python in the hot
path) and has an exact ANSI-SQL twin for the DuckDB oracle.

Reference parity (SURVEY §2.8): whitespace tokenizer
(wurzel/steps/embedding/step.py:35,172-175), content hashes
(wurzel/steps/qdrant/step.py:259-283), keyword list parse
(wurzel/datacontract/common.py:150), per-doc metrics (common.py:149-157).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws(col: Column) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def words(col: Column) -> Column:
    """Whitespace tokenization → array<string>. Empty/blank input → []."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != "")


def word_count(col: Column) -> Column:
    return F.size(words(col))


def char_len(col: Column) -> Column:
    return F.length(col)


def line_count(col: Column) -> Column:
    """Number of lines (md_line_count, common.py:153)."""
    return F.size(F.split(col, "\n"))


def keywords_count(col: Column) -> Column:
    """Count of non-blank comma-separated keywords (common.py:150)."""
    return F.size(F.filter(F.split(col, ","), lambda k: F.trim(k) != ""))


def sha256_hex(col: Column) -> Column:
    """Content hash (qdrant/step.py:282, semantic_splitter.py:808-811)."""
    return F.sha2(col, 256)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: sha256 over lowercased, whitespace-normalized
    text — stable under formatting-only edits.
    """
    return sha256_hex(normalize_ws(F.lower(col)))


def replace_urls(col: Column, token: str = "LINK") -> Column:
    """URL → sentinel replacement (embedding/step.py:214-233, URL regex :36)."""
    return F.regexp_replace(col, r"https?://\S+", token)


def strip_markdown(col: Column) -> Column:
    """Markdown → plain text, regex approximation of
    wurzel/steps/embedding/step.py:187-212 (strip headings, emphasis,
    links→text, images, code fences, tables pipes).
    """
    c = F.regexp_replace(col, r"```[\s\S]*?```", " ")  # code fences
    c = F.regexp_replace(c, r"!\[[^\]]*\]\([^)]*\)", " ")  # images
    c = F.regexp_replace(c, r"\[([^\]]*)\]\([^)]*\)", r"$1")  # links → text
    c = F.regexp_replace(c, r"(?m)^#{1,6}\s+", "")  # headings
    c = F.regexp_replace(c, r"[*_`|>]+", " ")  # emphasis/table/quote chars
    return normalize_ws(c)


def first_heading(col: Column) -> Column:
    """First `# ` heading (decagon/step.py:100-103, docling_step.py:92-109)."""
    return F.regexp_extract(col, r"(?m)^# (.+)$", 1)


def tlsh_like_digest(col: Column) -> Column:
    """Locality-sensitive content digest filling the reference's
    ``text_tlsh_hash`` slot (qdrant/step.py:264-283 — computed with the tlsh
    C library there, gated behind HAS_TLSH, stored but never joined).

    The tlsh library isn't available here, so this is a 64-hex-char
    **minwise digest**, not TLSH wire format: 4 seeded min-hashes over the
    word-hash set, each rendered as 16 hex chars. Near-duplicate texts agree
    on whole 16-char segments with probability ≈ their word-set Jaccard per
    segment — so unlike TLSH's distance score, segment equality is directly
    GROUP BY-able / joinable at scale (the upgrade the north star asks for).

    Pure pyspark.sql.functions — no Python on executors. The word-hash
    array is let-bound via transform(array(...), arr -> ...)[0] so the 4
    seeded folds share ONE evaluation of the tokenize+hash pipeline (HOF
    lambdas re-evaluate captured subexpressions per element otherwise).
    Empty/blank text → 64 zeros.
    """
    hashes = F.transform(words(col), lambda w: F.xxhash64(w))
    return F.transform(
        F.array(hashes),
        lambda arr: F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda seed: F.lpad(
                    F.hex(
                        F.coalesce(
                            F.array_min(F.transform(arr, lambda h: F.xxhash64(h, seed))),
                            F.lit(0),
                        )
                    ),
                    16,
                    "0",
                ),
            ),
        ),
    )[0]


def marker_words_count(col: Column, markers: tuple[str, ...]) -> Column:
    """Total occurrences of any of ``markers`` as whole (whitespace-
    delimited) words. One pass over the word ARRAY — the padded-string
    ``replace``-count trick needed a full string scan PER marker and
    undercounted adjacent repeats ("the the" counted once: the shared
    space is consumed by the first non-overlapping match)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words(col), lambda w: F.array_contains(arr, w)))
