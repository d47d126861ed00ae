"""Splitter semantics (reference golden behaviors,
tests/splitter/splitter_test.py + FIXTURES §6)."""

import hashlib

import pytest

from wurzel_spark.functions import tokens as TK
from wurzel_spark.operators.splitter import (
    split_markdown_document,
    split_markdown_table,
    split_sentences,
    split_stage,
)


def test_short_doc_passes_through_unchanged():
    # splitter_test.py:29-42
    md = "# Title\n\nOne short paragraph."
    chunks = split_markdown_document(md, "kw", "http://u")
    assert len(chunks) == 1
    assert chunks[0]["md"] == md
    assert chunks[0]["metadata"]["chunk_index"] == "0"
    assert chunks[0]["metadata"]["chunks_count"] == "1"


def test_heading_only_doc_unchanged():
    # splitter_test.py:44-56
    md = "# Just a heading"
    chunks = split_markdown_document(md)
    assert len(chunks) == 1
    assert chunks[0]["md"] == md


def test_long_doc_splits_with_metadata():
    sections = [
        f"## Section {i}\n\n" + " ".join(f"word{j}" for j in range(220)) for i in range(4)
    ]
    md = "# Guide\n\n" + "\n\n".join(sections)
    chunks = split_markdown_document(md, "kw", "u", token_limit=256)
    assert len(chunks) > 1
    n = len(chunks)
    src = hashlib.sha256(md.encode()).hexdigest()
    count = TK.token_counter()
    for i, c in enumerate(chunks):
        meta = c["metadata"]
        assert meta["chunk_index"] == str(i)
        assert meta["chunks_count"] == str(n)
        assert meta["source_sha256_hash"] == src  # splitter_test.py:112
        assert int(meta["token_len"]) == count(c["md"])
        assert int(meta["char_len"]) == len(c["md"])


def test_heading_path_reattached():
    body = " ".join(f"w{j}" for j in range(400))
    md = f"# Top\n\n## Sub\n\n{body}"
    chunks = split_markdown_document(md, token_limit=128)
    # chunks from the Sub section carry '# Top - Sub' (semantic_splitter.py:728-744)
    assert any(c["md"].startswith("# Top - Sub") for c in chunks)


def test_table_split_repeats_header_never_mid_row():
    # markdown_table_splitter.py:48-66
    header = "| id | name | value |"
    sep = "|---|---|---|"
    rows = [f"| {i} | name{i} | value{i} |" for i in range(80)]
    table = "\n".join([header, sep, *rows])
    count = TK.token_counter()
    chunks = split_markdown_table(table, 100, count)
    assert len(chunks) > 1
    for c in chunks:
        lines = c.split("\n")
        assert lines[0] == header  # header repeated
        assert lines[1] == sep
        for ln in lines[2:]:
            assert ln.startswith("|") and ln.endswith("|")  # never mid-row
    # all rows preserved
    got = [ln for c in chunks for ln in c.split("\n")[2:]]
    assert got == rows


def test_sentence_splitter_abbreviations():
    # sentence_splitter_test_cases.py semantics: abbreviations don't split
    s = split_sentences("Dr. Smith went home. He slept.")
    assert s == ["Dr. Smith went home.", "He slept."]
    s2 = split_sentences("This costs ca. 5 euros. Cheap.")
    assert s2 == ["This costs ca. 5 euros.", "Cheap."]


def test_split_stage_explodes(spark):
    body = " ".join(f"tok{j}" for j in range(600))
    df = spark.createDataFrame(
        [("# Big\n\n" + body, "kw", "http://x", None)],
        "md string, keywords string, url string, metadata map<string,string>",
    )
    out = split_stage(df).collect()
    assert len(out) > 1
    assert all(r["metadata"]["chunks_count"] == str(len(out)) for r in out)
    assert all(r["keywords"] == "kw" for r in out)


# Case corpus modeled on the reference's sentence-splitter coverage
# dimensions (tests/splitter/sentence_splitter_test_cases.py: abbreviations,
# initials, ordinals/dates, decimals, quotes/parens, ellipses, lowercase
# continuations) — cases written fresh against OUR documented semantics.
SENTENCE_CASES = [
    # (text, expected sentence list)
    ("Dr. Smith met Prof. Jones. They talked.",
     ["Dr. Smith met Prof. Jones.", "They talked."]),
    ("J. R. R. Tolkien wrote it. It was long.",
     ["J. R. R. Tolkien wrote it.", "It was long."]),
    ("Das kostet z.B. 5 Euro. Billig.",
     ["Das kostet z.B. 5 Euro.", "Billig."]),
    ("Am 3. Januar war es kalt. Dann nicht.",
     ["Am 3. Januar war es kalt.", "Dann nicht."]),
    ("Pi is 3.14159 roughly. Indeed.",
     ["Pi is 3.14159 roughly.", "Indeed."]),
    ("Wait... What happened? Nothing!",
     ["Wait...", "What happened?", "Nothing!"]),
    ('He said "Stop." Then he left.',
     ['He said "Stop."', "Then he left."]),
    ('She asked: "Why?" Nobody answered.',
     ['She asked: "Why?"', "Nobody answered."]),
    ("Visit https://example.com. Then report back.",
     ["Visit https://example.com.", "Then report back."]),
    ("It works (see Fig. 2). Great.",
     ["It works (see Fig. 2).", "Great."]),
    ("Nr. 7 ist frei. Nr. 8 nicht.",
     ["Nr. 7 ist frei.", "Nr. 8 nicht."]),
    ("First sentence! Second sentence? Third.",
     ["First sentence!", "Second sentence?", "Third."]),
    ("i.e. this merges. e.g. this too.",
     ["i.e. this merges. e.g. this too."]),
    ("Vgl. Abschnitt 4. Dort steht mehr.",
     ["Vgl. Abschnitt 4. Dort steht mehr."]),
    ("Das gilt usw. Aber nicht immer.",
     ["Das gilt usw. Aber nicht immer."]),
    ("Mr. Brown met Mrs. Green. Hello.",
     ["Mr. Brown met Mrs. Green.", "Hello."]),
    # trailing "4." is treated as a potential German ordinal -> stays joined
    ("Siehe Abb. 3 bzw. Abb. 4. Fertig.",
     ["Siehe Abb. 3 bzw. Abb. 4. Fertig."]),
    ("no caps after. period stays joined.",
     ["no caps after. period stays joined."]),
]


@pytest.mark.parametrize("text,expected", SENTENCE_CASES)
def test_sentence_case_corpus(text, expected):
    got = split_sentences(text)
    assert got == expected
    # lossless modulo inter-sentence whitespace
    assert " ".join(got).split() == text.split()


def test_punkt_learns_corpus_abbreviations(spark):
    # "qrt." is an invented abbreviation the static list can't know: it
    # always carries a period and is followed by a capitalized name.
    # "meeting" ends sentences sometimes but mostly appears bare — the
    # length discount and period-free penalty must reject it.
    sents = (
        ["We met Qrt. Smith at noon today."] * 12
        + ["The meeting ran long."] * 4
        + ["That meeting was short and the next meeting happened fast."] * 8
    )
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sents)], "doc_id long, text string"
    )
    from wurzel_spark.operators.splitter import (
        learn_punkt_abbreviations,
        sentence_splitter,
    )

    learned = learn_punkt_abbreviations(df)
    assert "qrt" in learned
    assert "meeting" not in learned

    punkt = sentence_splitter("punkt", abbreviations=learned)
    got = punkt("We met Qrt. Smith at noon. He waved back.")
    assert got == ["We met Qrt. Smith at noon.", "He waved back."]
    # without the learned set the same text over-splits at "Qrt."
    regex = sentence_splitter("regex")
    assert regex("We met Qrt. Smith at noon. He waved back.")[0] == "We met Qrt."


def test_split_stage_with_bpe_tokenizer_distributed(spark, sf_dir):
    """The BPE vocab must load executor-side (package data, not closure):
    run the distributed splitter with tokenizer_name='bpe' and check every
    chunk respects the limit under the same tokenizer."""
    from pyspark.sql import functions as F

    from wurzel_spark.functions import tokens as TK
    from wurzel_spark.operators.splitter import split_stage
    from wurzel_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(50).select(
        F.col("text").alias("md"),
        F.col("source").alias("keywords"),
        F.col("doc_id").cast("string").alias("url"),
    )
    chunks = split_stage(docs, token_limit=32, token_limit_buffer=8,
                         token_limit_min=8, tokenizer_name="bpe").collect()
    assert len(chunks) >= 50
    count = TK.token_counter("bpe")
    assert all(count(r["md"]) <= 40 for r in chunks)
