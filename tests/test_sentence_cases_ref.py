"""Reference sentence-splitter case corpus, run against the vendored
strategies (VERDICT r10 Next #5).

The reference enforces REGEX_CASES on its RegexSentenceSplitter and the
BASIC/DE/HR/PL/EL corpora on spacy (skipped without the model). Here:

  - `regex-ref` (the reference-parity strategy) must pass its target
    REGEX corpus EXACTLY — same contract the reference tests enforce.
  - Every (strategy, corpus) pair's pass rate is PINNED, divergent case
    indices named, so any behavior drift in a splitter shows up as a
    test failure with the exact case that moved.

Comparison normalizes whitespace per sentence (strip + drop empties):
the engine strategies preserve inter-sentence whitespace by design
(chunk goldens depend on it), while the reference strips — sentence
BOUNDARIES are what this corpus checks.

Recorded divergences (all are cases the reference itself only passes
with the spacy model, i.e. its own regex splitter shares them):
  - em-dash starts, Greek «, Greek capitals and the Greek question
    mark — CLOSED in r12 for regex-ref (extended lookahead,
    splitter.py:_REF_SPLIT_RE); the engine strategies keep the
    reference-regex behavior;
  - German/Polish/Croatian „quote starts — regex-ref mirrors the
    reference lookahead (no „); the engine regex strategy handles them;
  - "Smith v. Jones" legal citation + "Inc." — regex-ref merges per the
    reference abbreviation list only partially;
  - "p.m. Amazing" / "No. 5" / "Sept. 2020" — the ENGINE regex strategy
    diverges from the reference contract here (it merges after p.m. and
    lacks No./month merge-back); regex-ref exists precisely to provide
    the contract-exact behavior without shifting engine chunk goldens.
"""

from __future__ import annotations

import pytest

from wurzel_spark.operators.splitter import (
    sentence_splitter,
    split_sentences,
    split_sentences_learned,
    split_sentences_ref,
)

from sentence_case_corpus import ALL_CORPORA, REGEX_CASES


def _norm(sents):
    return [s.strip() for s in sents if s.strip()]


def test_regex_ref_passes_reference_regex_contract_exactly():
    """The reference's own regex test (sentence_splitter_test.py:127-134)
    — every active case, exact output."""
    for text, expected in REGEX_CASES:
        assert split_sentences_ref(text) == expected, text


def test_factory_routes_regex_ref():
    assert sentence_splitter("regex-ref") is split_sentences_ref


# Pinned pass counts per (strategy, corpus): strategy → {corpus: (passed,
# total, divergent case indices)}. A failing case that starts passing is
# ALSO a pin violation — update the table consciously, not silently.
_PINNED = {
    "regex": {
        "regex": (1, 4, (0, 1, 2)),
        "basic": (13, 14, (7,)),
        "de": (5, 5, ()),
        "hr": (3, 3, ()),
        "pl": (4, 4, ()),
        "el": (1, 3, (1, 2)),
    },
    # r12 (VERDICT r11 Next #5): regex-ref's lookahead gained em-dash
    # starts, Greek « openers, Greek capitals, and the Greek question
    # mark (';' before a Greek-capital start only) — basic 7 and el 1/2
    # moved to passing; the reference regex contract stays 4/4 exact.
    "regex-ref": {
        "regex": (4, 4, ()),
        "basic": (13, 14, (13,)),
        "de": (4, 5, (2,)),
        "hr": (2, 3, (1,)),
        "pl": (3, 4, (1,)),
        "el": (3, 3, ()),
    },
    "learned": {
        "regex": (1, 4, (0, 1, 2)),
        "basic": (13, 14, (7,)),
        "de": (5, 5, ()),
        "hr": (3, 3, ()),
        "pl": (4, 4, ()),
        "el": (1, 3, (1, 2)),
    },
}

_STRATEGIES = {
    "regex": split_sentences,
    "regex-ref": split_sentences_ref,
    "learned": lambda t: split_sentences_learned(t, frozenset()),
}


@pytest.mark.parametrize("strategy", sorted(_PINNED))
def test_case_corpus_pass_rates_pinned(strategy):
    fn = _STRATEGIES[strategy]
    for corpus, cases in ALL_CORPORA.items():
        exp_pass, exp_total, exp_fail_idx = _PINNED[strategy][corpus]
        assert exp_total == len(cases)
        failed = tuple(
            i
            for i, (text, expected) in enumerate(cases)
            if _norm(fn(text)) != _norm(expected)
        )
        assert failed == exp_fail_idx, (
            f"{strategy}/{corpus}: divergent cases moved "
            f"(expected {exp_fail_idx}, got {failed})"
        )
        assert len(cases) - len(failed) == exp_pass


def test_overall_fidelity_floor():
    """Aggregate floor across all strategies' BEST result per case: the
    corpus-wide coverage the vendored strategies provide together."""
    total = best = 0
    for cases in ALL_CORPORA.values():
        for text, expected in cases:
            total += 1
            if any(
                _norm(fn(text)) == _norm(expected)
                for fn in _STRATEGIES.values()
            ):
                best += 1
    # 33/33 since r12: regex-ref's extended lookahead (em-dash, Greek
    # «/capitals/question mark) closed the last three spacy-only cases.
    assert best == total == 33, (best, total)


def test_closer_drop_quirk_matches_reference():
    """re.split discards the consumed closing quote between terminator
    and split point — the reference's _split_re (non-capturing closer
    group fed to re.split) does the identical thing, so this is CODE
    parity, pinned so a well-meaning 'fix' surfaces as a conscious
    divergence from the reference."""
    import re

    ref_split = re.compile(
        r"(?<=[.!?…])" r"(?:['\")\]]*)" r"(?=\s+(?=[“\"'(\[]?[A-Z0-9]))"
    )
    text = 'He shouted "Go!" Then silence.'
    ref_parts = [p.strip() for p in ref_split.split(text) if p.strip()]
    assert split_sentences_ref(text) == ref_parts == [
        'He shouted "Go!',
        "Then silence.",
    ]
