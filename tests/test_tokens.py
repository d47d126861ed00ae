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


# ------------------------------------------------------------------ BPE


def test_bpe_merge_order_is_lowest_rank_first():
    """Greedy LOWEST-rank merging (tiktoken's rule), not left-to-right:
    with ranks making 'bc' cheaper than 'ab', 'abc' must merge b+c first."""
    from wurzel_spark.functions.bpe import BPETokenizer

    ranks = {bytes([i]): i for i in range(256)}
    ranks[b"bc"] = 256  # lower rank -> merges first
    ranks[b"ab"] = 257
    tok = BPETokenizer(ranks)
    # b+c merges first (rank 256 < 257) leaving [a, bc] — left-to-right
    # greedy would instead produce [ab, c]
    assert tok.encode("abc") == [ranks[b"a"], ranks[b"bc"]]
    # merging cascades: with 'abc' also in the vocab, a+bc merges next
    ranks2 = dict(ranks)
    ranks2[b"abc"] = 258
    tok2 = BPETokenizer(ranks2)
    assert tok2.encode("abcd") == [258, ranks[b"d"]]


def test_bpe_round_trip_exact_on_fixture_and_unicode():
    from wurzel_spark.functions import tokens as TK

    tok = TK.from_name("bpe")
    faq = open("tests/data/ref_splitter/german_faq.md").read()
    for text in (faq, "Überprüfen — ßäöü 🙂 mixed 12345", "", "a", "\n\n\t "):
        assert tok.decode(tok.encode(text)) == text


def test_bpe_tiktoken_file_round_trip(tmp_path):
    from wurzel_spark.functions.bpe import (
        BPETokenizer,
        load_tiktoken_file,
        save_tiktoken_file,
        train_bpe,
    )

    ranks = train_bpe(["the quick brown fox jumps over the lazy dog " * 20], 300)
    p = str(tmp_path / "v.tiktoken")
    save_tiktoken_file(ranks, p)
    loaded = load_tiktoken_file(p)
    assert loaded.ranks == ranks
    t = BPETokenizer(ranks)
    assert loaded.encode("the quick brown fox") == t.encode("the quick brown fox")


def test_bpe_training_deterministic_and_byte_complete():
    from wurzel_spark.functions.bpe import train_bpe

    corpus = ["wiederholen wiederholen wieder", "holen sie die wieder"]
    r1 = train_bpe(corpus, 300)
    r2 = train_bpe(list(corpus), 300)
    assert r1 == r2
    # all single bytes present -> any input encodable
    assert all(bytes([i]) in r1 for i in range(256))


def test_bpe_limit_token_count_encode_slice_decode():
    from wurzel_spark.functions import tokens as TK

    tok = TK.from_name("bpe")
    text = "Überprüfen Sie, ob das Netzteil angeschlossen ist. " * 10
    kept, discarded = tok.limit_token_count(text, 20, return_discarded_text=True)
    assert kept + discarded == text
    assert tok.token_count(kept) <= 20
    # module-level helper routes through the same protocol
    assert TK.limit_token_count(text, 20, name="bpe") == kept


def test_bpe_vendored_vocab_compression_sane():
    """The vendored vocab must land in the BPE ballpark (~3 chars/token on
    its training domain) — guards against a corrupted fixture file."""
    from wurzel_spark.functions import tokens as TK

    tok = TK.from_name("bpe")
    faq = open("tests/data/ref_splitter/german_faq.md").read()
    cpt = len(faq) / tok.token_count(faq)
    assert 2.0 < cpt < 6.0


def test_bpe_env_override_routes_vocab(monkeypatch):
    """$WURZEL_SPARK_BPE_VOCAB redirects the default 'bpe' tokenizer to
    the named vocab file (the cl100k drop-in hook, VERDICT r4 #4)."""
    from wurzel_spark.functions import tokens as TK

    vendored = TK._vendored_bpe_path()
    monkeypatch.setenv(TK.BPE_VOCAB_ENV, vendored)
    tok_env = TK.from_name("bpe")
    tok_direct = TK.from_name(f"bpe:{vendored}")
    assert tok_env is tok_direct  # same resolved singleton
    monkeypatch.delenv(TK.BPE_VOCAB_ENV)
    assert TK.from_name("bpe").token_count("hello world") == tok_env.token_count(
        "hello world"
    )
