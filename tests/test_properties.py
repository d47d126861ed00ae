"""Property-based tests (hypothesis) for the pure-function core.

The reference's splitter asserts its token-window invariant at runtime
(semantic_splitter.py:492-493); here the same invariants are checked over
generated inputs, plus total-function robustness for the HTML pipeline.
All Python-side (no Spark session) — these are the functions that run
inside UDFs, so their invariants ARE the distributed operators' invariants.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from wurzel_spark.functions import html as H
from wurzel_spark.functions import tokens as TK
from wurzel_spark.operators.splitter import split_markdown_document, split_sentences

TEXTISH = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=2000
)


@settings(max_examples=60, deadline=None)
@given(TEXTISH)
def test_splitter_token_window_invariant(md):
    limit, buffer = 32, 8
    count = TK.token_counter()
    chunks = split_markdown_document(md, token_limit=limit, token_limit_buffer=buffer, token_limit_min=4)
    assert chunks, "at least one chunk even for empty input"
    n = len(chunks)
    for i, c in enumerate(chunks):
        meta = c["metadata"]
        assert int(meta["chunk_index"]) == i
        assert int(meta["chunks_count"]) == n
        assert int(meta["token_len"]) == count(c["md"])
        # the reference's hard invariant: no chunk exceeds limit+buffer —
        # except an unsplittable single token-run longer than the window,
        # which the hard-cut fallback bounds by construction
        if n > 1:
            assert count(c["md"]) <= limit + buffer, c["md"][:80]


@settings(max_examples=60, deadline=None)
@given(TEXTISH, st.integers(min_value=1, max_value=64))
def test_truncation_is_prefix_within_limit(text, limit):
    out = TK.limit_token_count(text, limit)
    assert text.startswith(out)
    assert TK.from_name().token_count(out) <= limit


@settings(max_examples=60, deadline=None)
@given(TEXTISH)
def test_tokenizer_total_and_consistent(text):
    tok = TK.from_name()
    assert tok.token_count(text) == len(tok.encode(text))


@settings(max_examples=60, deadline=None)
@given(TEXTISH)
def test_html_pipeline_total(raw):
    """to_markdown / clean / text extraction never raise on arbitrary input
    (scraped pages are adversarial by nature)."""
    md = H.to_markdown(raw)
    assert isinstance(md, str)
    assert isinstance(H.clean_html(raw), str)
    assert isinstance(H.html_to_text(raw), str)


@settings(max_examples=60, deadline=None)
@given(TEXTISH)
def test_remove_images_idempotent(md):
    once = H.remove_images(md)
    assert H.remove_images(once) == once


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["Dr. Smith went home", "It rained", "No.", "z.B. hier", "End"]), min_size=1, max_size=6))
def test_sentence_split_preserves_content(parts):
    text = ". ".join(parts) + "."
    sents = split_sentences(text)
    # no characters lost (modulo the split whitespace)
    assert "".join(sents).replace(" ", "") == text.replace(" ", "")


@settings(max_examples=60, deadline=None)
@given(TEXTISH)
def test_normalize_markdown_idempotent(md):
    once = H.normalize_markdown(md)
    assert H.normalize_markdown(once) == once


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_shape(h, w, seed):
    """Builtin PNG decoder inverts a filter-0 encoding for ANY image
    shape and content (driverless property — no Spark)."""
    import struct
    import zlib

    import numpy as np

    from wurzel_spark.operators.multimodal import _png_pixels

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(_png_pixels(png), px)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_tlsh_total_function_and_symmetry(data):
    """tlsh_digest never raises on arbitrary bytes; valid digests have
    the fixed format and symmetric self-distance 0."""
    from wurzel_spark.functions.tlsh import tlsh_digest, tlsh_distance

    d = tlsh_digest(data)
    if len(data) < 50:
        assert d is None
    if d is not None:
        assert len(d) == 72 and d.startswith("T1")
        assert tlsh_distance(d, d) == 0
        other = tlsh_digest(data + b" tail of different content appended here")
        if other is not None:
            assert tlsh_distance(d, other) == tlsh_distance(other, d)


@given(st.binary(min_size=50, max_size=300))
@settings(max_examples=40, deadline=None)
def test_tlsh_deterministic(data):
    from wurzel_spark.functions.tlsh import tlsh_digest

    assert tlsh_digest(data) == tlsh_digest(data)
