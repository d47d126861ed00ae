"""Tokenizer adapters (reference: wurzel/utils/tokenizers.py:16-201).

The reference wraps tiktoken (``:52-76``) or HuggingFace tokenizers
(``:170-201``) behind a Tokenizer protocol with ``encode / decode /
limit_token_count`` and a ``from_name`` factory (``:78-127``). We keep the
same protocol; when neither library is installed (this container) the
default is a deterministic regex tokenizer that approximates BPE behavior:
words are split further into ≤4-char pieces, punctuation is its own token.

On Spark executors, tokenizers are process-level lazy singletons — never
pickled into closures (SURVEY §7 hard parts).
"""

from __future__ import annotations

import re
from collections.abc import Callable

try:  # pragma: no cover - not installed in this container
    import tiktoken

    HAS_TIKTOKEN = True
except ImportError:
    HAS_TIKTOKEN = False

# words, or runs of one repeated punctuation char (---- ==== ....):
# BPE vocabularies encode long same-char runs as single tokens, so a
# markdown table separator row must not count one token per dash.
_WORD_RE = re.compile(r"\w+|([^\w\s])\1*", re.UNICODE)
_RUN_PIECE = 16  # ~chars of a same-char punctuation run per BPE token


class RegexTokenizer:
    """Deterministic BPE-ish tokenizer: unicode words + punctuation, words
    longer than ``piece`` chars split into fixed-size pieces (public
    rule-of-thumb: ~4 chars/token for BPE vocabularies); same-char
    punctuation runs count ~``_RUN_PIECE`` chars per token.
    """

    def __init__(self, piece: int = 4):
        self.piece = piece

    def _pieces(self, w: str) -> list[str]:
        size = self.piece if (w[0].isalnum() or w[0] == "_") else _RUN_PIECE
        if len(w) <= size:
            return [w]
        return [w[i : i + size] for i in range(0, len(w), size)]

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for m in _WORD_RE.finditer(text):
            out.extend(self._pieces(m.group(0)))
        return out

    def token_count(self, text: str) -> int:
        return len(self.encode(text))


class TiktokenTokenizer:  # pragma: no cover - optional dependency
    """tiktoken adapter (tokenizers.py:52-76)."""

    def __init__(self, encoding: str = "cl100k_base"):
        self.enc = tiktoken.get_encoding(encoding)

    def encode(self, text: str):
        return self.enc.encode(text)

    def token_count(self, text: str) -> int:
        return len(self.enc.encode(text))


_SINGLETONS: dict[str, object] = {}


def _vendored_bpe_path() -> str:
    import os

    return os.path.join(os.path.dirname(__file__), "data", "german_faq_bpe.tiktoken")


#: Env override for the default 'bpe' vocab: point it at the real
#: cl100k_base.tiktoken file and every ``from_name("bpe")`` call site
#: (splitter, token stats) becomes tiktoken-identical with zero code
#: change — the reference's cl100k counts (semantic_splitter.py:188)
#: then reproduce exactly (see tests/test_splitter_ref.py's gated
#: 5-chunk golden).
BPE_VOCAB_ENV = "WURZEL_SPARK_BPE_VOCAB"


def from_name(name: str = "regex") -> object:
    """Factory (tokenizers.py:78-127): 'regex' always works; 'bpe' loads
    the vendored pure-Python byte-level BPE vocab (functions/bpe.py) —
    or the file named by $WURZEL_SPARK_BPE_VOCAB when set; 'bpe:<path>'
    loads any public ``.tiktoken`` vocab file (drop in the real
    cl100k_base file for tiktoken-identical ids); other names use
    tiktoken when installed. Cached per process (executor-side singleton).
    """
    import os

    key = name
    if name == "bpe":
        env_path = os.environ.get(BPE_VOCAB_ENV)
        if env_path:
            key = f"bpe:{env_path}"
    if key not in _SINGLETONS:
        if key == "bpe" or key.startswith("bpe:"):
            from wurzel_spark.functions.bpe import load_tiktoken_file

            path = key[4:] if key.startswith("bpe:") else _vendored_bpe_path()
            _SINGLETONS[key] = load_tiktoken_file(path, key)
        elif key == "regex" or not HAS_TIKTOKEN:
            _SINGLETONS[key] = RegexTokenizer()
        else:  # pragma: no cover
            _SINGLETONS[key] = TiktokenTokenizer(key)
    return _SINGLETONS[key]


def token_counter(name: str = "regex") -> Callable[[str], int]:
    tok = from_name(name)
    return tok.token_count


def limit_token_count(text: str, limit: int, name: str = "regex") -> str:
    """Truncate text to ≤ limit tokens preserving original spacing
    (tokenizers.py:170-201 uses offset mapping; the regex tokenizer can
    reconstruct via match offsets).
    """
    tok = from_name(name)
    if isinstance(tok, RegexTokenizer):
        count = 0
        end = 0
        for m in _WORD_RE.finditer(text):
            n = len(tok._pieces(m.group(0)))
            if count + n > limit:
                break
            count += n
            end = m.end()
        return text[:end]
    if hasattr(tok, "limit_token_count"):  # BPE (and any protocol tokenizer)
        return tok.limit_token_count(text, limit)
    ids = tok.encode(text)[:limit]  # pragma: no cover
    return tok.enc.decode(ids)  # pragma: no cover
