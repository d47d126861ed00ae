"""ExactSubstr (Lee et al. 2022) removal — semantic guarantees the
oracle compare can't express: full-coverage removal of exact duplicate
docs, within-doc repetition handling, sub-L immunity, boundary precision
around a point edit, and stats↔strip accounting agreement."""

import pytest
from pyspark.sql import functions as F

L = 8  # test-sized min length (operators default to 20)


def _stats(df):
    from wurzel_spark.operators.substrings import exact_substring_removal

    return {
        r["doc_id"]: r for r in exact_substring_removal(df, length=L).collect()
    }


def _strip(df):
    from wurzel_spark.operators.substrings import strip_exact_substrings

    return {
        r["doc_id"]: r["cleaned_text"]
        for r in strip_exact_substrings(df, length=L).collect()
    }


WORDS = "w{} " * 30


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_docs_fully_removed(spark):
    """Two identical ≥L docs: every token of both is covered."""
    text = " ".join(f"tok{i}" for i in range(12))
    df = _mk(spark, [(1, text), (2, text), (3, "unique words only here now")])
    st = _stats(df)
    assert st[1]["n_removed_tokens"] == 12 and st[2]["n_removed_tokens"] == 12
    assert st[1]["removed_frac"] == 1.0
    assert st[3]["n_removed_tokens"] == 0
    cleaned = _strip(df)
    assert cleaned[1] == "" and cleaned[2] == ""
    assert cleaned[3] == "unique words only here now"


def test_within_doc_repetition_removed(spark):
    """A doc repeating its own ≥L run twice is self-duplicated — both
    occurrences are covered (Lee et al. count positions, not docs)."""
    run = " ".join(f"r{i}" for i in range(L))
    df = _mk(spark, [(1, f"{run} middle bits {run}")])
    st = _stats(df)[1]
    assert st["n_runs"] == 2
    assert st["n_removed_tokens"] == 2 * L
    assert _strip(df)[1] == "middle bits"


def test_sub_L_overlap_is_immune(spark):
    """Shared runs SHORTER than L are kept — the min-length contract."""
    short = " ".join(f"s{i}" for i in range(L - 1))
    df = _mk(spark, [(1, f"{short} alpha beta gamma delta epsilon zeta eta theta"),
                     (2, f"{short} one two three four five six seven eight")])
    st = _stats(df)
    assert st[1]["n_removed_tokens"] == 0 and st[2]["n_removed_tokens"] == 0


def test_point_edit_boundary_precision(spark):
    """Doc B = doc A with ONE middle token changed: removal covers
    exactly the tokens within L-window reach of an unbroken shared run;
    the edited token itself always survives in B."""
    n = 3 * L
    a_toks = [f"t{i}" for i in range(n)]
    b_toks = list(a_toks)
    edit = n // 2
    b_toks[edit] = "EDITED"
    df = _mk(spark, [(1, " ".join(a_toks)), (2, " ".join(b_toks))])
    cleaned = _strip(df)
    kept_b = cleaned[2].split()
    assert "EDITED" in kept_b
    st = _stats(df)
    # the prefix and suffix around the edit are ≥L shared runs, covered
    # in BOTH docs; every window crossing the edit position occurs once
    # (it differs between A and B), so each doc keeps exactly its own
    # middle token — edit-locality is symmetric.
    assert st[1]["n_removed_tokens"] == n - 1
    assert st[2]["n_removed_tokens"] == n - 1
    assert cleaned[1].split() == [a_toks[edit]]
    assert kept_b == ["EDITED"]


def test_stats_and_strip_agree(spark, sf_dir):
    """Accounting identity on the real corpus: n_tokens − n_removed ==
    token count of the cleaned text, per doc."""
    from wurzel_spark.operators.substrings import (
        exact_substring_removal,
        strip_exact_substrings,
    )
    from wurzel_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    st = exact_substring_removal(docs)
    cl = strip_exact_substrings(docs).select(
        "doc_id", F.size(F.split(F.col("cleaned_text"), r"\s+")).alias("n_kept_raw"),
        F.col("cleaned_text"),
    )
    j = st.join(cl, "doc_id").collect()
    assert len(j) == docs.count()
    for r in j:
        kept = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert r["n_tokens"] - r["n_removed_tokens"] == kept, r["doc_id"]


def test_short_docs_contribute_no_windows(spark):
    df = _mk(spark, [(1, "a b c"), (2, "a b c")])  # < L tokens, identical
    st = _stats(df)
    assert st[1]["n_removed_tokens"] == 0 and st[1]["n_dup_windows"] == 0
    assert _strip(df)[1] == "a b c"
