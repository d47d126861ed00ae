"""Tokenizer adapter behavior (tokenizers.py parity)."""

from wurzel_spark.functions import tokens as TK


def test_regex_tokenizer_counts():
    tok = TK.from_name("regex")
    assert tok.token_count("one two") == 2  # short words = 1 token each
    assert tok.token_count("one, two!") == 4  # punctuation separate
    # words longer than 4 chars split into 4-char pieces
    assert tok.token_count("abcdefgh") == 2
    assert tok.token_count("hello") == 2


def test_limit_token_count_preserves_prefix():
    text = "one two three four five six"
    out = TK.limit_token_count(text, 4)  # 'three' counts as 2 pieces
    assert out == "one two three"
    assert TK.from_name("regex").token_count(out) == 4
    assert TK.limit_token_count(text, 3) == "one two"  # no partial words


def test_limit_noop_when_under():
    assert TK.limit_token_count("a b", 10) == "a b"


def test_singleton_cached():
    assert TK.from_name("regex") is TK.from_name("regex")
