"""CLIP byte-pair-encoding tokenizer.

Functional mirror of CLIP's SimpleTokenizer
(`modeling/clip/simple_tokenizer.py` in maxingan2412/Signal, itself the
stock OpenAI implementation): reversible byte-level BPE over a 49,152-merge
vocabulary, with <|startoftext|>/<|endoftext|> specials and 77-token
context padding (`clip.tokenize`, `modeling/clip/clip.py`).

The merge table is DATA, not code. Resolution order (`resolve_bpe_path`):
explicit ``bpe_path`` arg → ``SIGNAL_TPU_BPE_PATH`` env var → the vendored
``models/data/bpe_simple_vocab_16e6.txt.gz`` (OpenAI's standard CLIP
vocabulary, shipped with every CLIP distribution — the reference vendors
the identical file at `modeling/clip/bpe_simple_vocab_16e6.txt.gz`).
Out of the box, token ids therefore match OpenAI's `clip.tokenize`.
If no table resolves, a byte-fallback vocabulary keeps the pipeline
runnable for from-scratch training (with a one-time warning); loading a
PRETRAINED text tower against the fallback vocab is a hard error — the
ids would silently mismatch the tower's embedding rows
(see `clip_loader.load_clip_into_params`).
"""

from __future__ import annotations

import gzip
import html
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte↔unicode map avoiding whitespace/control chars
    (the standard GPT-2/CLIP construction)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def resolve_bpe_path(bpe_path: Optional[str] = None) -> Optional[str]:
    """Find a merge table: explicit arg → SIGNAL_TPU_BPE_PATH → vendored
    copy. Returns None only if nothing resolves."""
    candidates = [
        bpe_path,
        os.environ.get("SIGNAL_TPU_BPE_PATH"),
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "bpe_simple_vocab_16e6.txt.gz"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


class ClipTokenizer:
    CONTEXT_LENGTH = 77

    def __init__(self, bpe_path: Optional[str] = None):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        base_vocab = list(bytes_to_unicode().values())
        vocab = base_vocab + [v + "</w>" for v in base_vocab]

        merges: List[Tuple[str, str]] = []
        resolved = resolve_bpe_path(bpe_path)
        if resolved:
            raw = gzip.open(resolved).read().decode("utf-8").split("\n")
            raw = raw[1:49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in raw]
            vocab += ["".join(m) for m in merges]
        else:
            import logging

            logging.getLogger("signal_tpu.model").warning(
                "No BPE merge table found (arg/SIGNAL_TPU_BPE_PATH/vendored"
                " copy all missing) — using a byte-fallback vocabulary. "
                "Token ids will NOT match OpenAI CLIP; loading a pretrained"
                " text tower with this tokenizer is an error.")

        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
            if _HAS_REGEX else
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
            re.IGNORECASE)

    @property
    def has_merges(self) -> bool:
        """True when a real BPE merge table loaded (ids match OpenAI CLIP);
        False for the byte-fallback vocabulary."""
        return bool(self.bpe_ranks)

    @property
    def sot_token(self) -> int:
        return self.encoder["<|startoftext|>"]

    @property
    def eot_token(self) -> int:
        return self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return word[0]
        pairs = _get_pairs(word)
        if not self.bpe_ranks:
            # no merge table (fallback vocab): stay at byte granularity
            out = " ".join(word)
            self.cache[token] = out
            return out
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: List[int]) -> str:
        text = "".join(self.decoder[t] for t in tokens)
        return bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts, context_length: int = CONTEXT_LENGTH):
        """→ int32 array [N, context_length] (CLIP `clip.tokenize` semantics)."""
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [self.sot_token] + self.encode(text) + [self.eot_token]
            if len(toks) > context_length:
                raise RuntimeError(f"Input too long for context {context_length}: {text!r}")
            result[i, : len(toks)] = toks
        return result


try:  # python's `re` lacks \p classes; `regex` ships with transformers
    import regex as _regex_mod  # noqa: F401

    _HAS_REGEX = True
    re = _regex_mod  # type: ignore[assignment]
except ImportError:  # pragma: no cover
    _HAS_REGEX = False
