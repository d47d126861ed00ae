"""BPE training: pair counts, merge learning, tokenizer integration
(operators/bpetrain.py)."""

from wurzel_spark.operators import bpetrain


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )


def test_pair_counts_weighted_by_word_frequency(spark):
    docs = _docs(spark, ["abab abab", "abab", "xy"])
    out = {r["pair"]: r["n"] for r in bpetrain.bpe_pair_counts(docs).collect()}
    # "abab" occurs 3 times; each occurrence has pairs ab, ba, ab
    assert out["ab"] == 6
    assert out["ba"] == 3
    assert out["xy"] == 1


def test_pair_counts_single_char_words_contribute_nothing(spark):
    docs = _docs(spark, ["a b c"])
    assert bpetrain.bpe_pair_counts(docs).count() == 0


def test_train_bpe_merges_classic_fixture():
    # Sennrich-style fixture: 'aaab' x5, 'ab' x2 — first merge must be
    # the most frequent pair (a,a)=10, then greedy re-application
    wf = [("aaab", 5), ("ab", 2)]
    merges = bpetrain.train_bpe_merges(wf, num_merges=3)
    assert merges[0] == ("a", "a", 10)
    # after (a,a): 'aaab' -> ('aa','a','b') x5; pairs: (aa,a)=5, (a,b)=7
    assert merges[1] == ("a", "b", 7)
    # after (a,b): 'aaab' -> ('aa','ab') x5, 'ab' -> ('ab',) x2
    assert merges[2] == ("aa", "ab", 5)


def test_train_bpe_tie_breaks_lexicographically():
    merges = bpetrain.train_bpe_merges([("xy", 3), ("ab", 3)], num_merges=1)
    assert merges[0] == ("a", "b", 3)


def test_train_bpe_stops_when_no_pairs_left():
    merges = bpetrain.train_bpe_merges([("ab", 1)], num_merges=10)
    assert len(merges) == 1  # one pair, then single symbol per word


def test_trained_tokenizer_compresses_and_round_trips(spark):
    texts = ["the cat sat on the mat", "the cat ran", "the the the"]
    docs = _docs(spark, texts)
    merges = bpetrain.train_bpe(docs, num_merges=30)
    tok = bpetrain.tokenizer_from_merges(merges)
    sample = "the cat sat"
    ids = tok.encode(sample)
    assert tok.decode(ids) == sample  # lossless round trip
    assert len(ids) < len(sample.encode())  # merged below char level
    # 'the' is the most frequent word: must have become a single token
    assert tok.token_count("the") == 1


def test_train_bpe_is_deterministic(spark):
    docs = _docs(spark, ["foo bar baz foo bar", "foo qux"])
    a = bpetrain.train_bpe(docs, num_merges=10)
    b = bpetrain.train_bpe(docs, num_merges=10)
    assert a == b


def test_trained_tokenizer_tiktoken_roundtrip(spark, tmp_path):
    from wurzel_spark.functions.bpe import load_tiktoken_file, save_tiktoken_file

    docs = _docs(spark, ["round trip tokens round trip", "round round"])
    merges = bpetrain.train_bpe(docs, num_merges=15)
    tok = bpetrain.tokenizer_from_merges(merges)
    p = str(tmp_path / "trained.tiktoken")
    save_tiktoken_file(tok.ranks, p)
    tok2 = load_tiktoken_file(p)
    s = "round trip tokens"
    assert tok2.encode(s) == tok.encode(s)
    assert tok2.decode(tok2.encode(s)) == s


def test_trained_tokenizer_compresses_unseen_nonascii_inflection():
    # 'füße' is trained; the unseen inflection 'füßen' must still benefit
    # from the learned 'fü'/'füß' prefix merges — requires the multi-byte
    # character vocab entries tokenizer_from_merges inserts
    merges = bpetrain.train_bpe_merges([("füße", 50), ("fuss", 5)], num_merges=6)
    tok = bpetrain.tokenizer_from_merges(merges)
    unseen = "füßen"
    n = tok.token_count(unseen)
    assert n < len(unseen.encode("utf-8"))  # strictly better than raw bytes
    assert tok.decode(tok.encode(unseen)) == unseen
