"""Tokenization, vocabularies, and detokenization.

Rebuilds the reference's text handling:

* ``sentence_tokenize`` — word / trial / word-piece / phoneme modes
  (reference data_generators.py:446-475).  Word tokens carry a trailing
  ``_`` (``"word_"``), the ``trial`` mode joins the whole sentence into a
  single token, and word-piece mode encodes against a subword vocab (the
  reference shells out to tensor2tensor's SubwordTextEncoder at
  data_generators.py:451-461; here a native greedy-longest-match subword
  encoder with a BPE-style builder replaces it).
* vocab files — one token per line, beginning ``<pad>``, ``<EOS>``,
  ``<OOV>`` (reference auxiliary/vocab.mocha-timit.1806).
* ``target_inds_to_sequences`` — index → text detokenization: join,
  ``_`` → space, strip pad/EOS (reference trainers.py:952-963).
* ``string_seq_to_index_seq`` — token → id with OOV fallback and optional
  ``<EOS>`` append (the per-tensor transform of the reference's
  SequenceDataManifest, subjects.py:338-367).
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Iterable, Sequence

from . import EOS_token, OOV_token, SPECIAL_TOKENS, pad_token

WORD_SUFFIX = "_"


# --------------------------------------------------------------------------
# vocab files
# --------------------------------------------------------------------------


def read_vocab_file(path: str) -> list[str]:
    """One token per line; lines are taken verbatim (tokens include their
    ``_`` suffix)."""
    with open(path, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.rstrip("\n")]


def write_vocab_file(path: str, tokens: Sequence[str]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for token in tokens:
            f.write(token + "\n")


def with_special_tokens(
    tokens: Iterable[str], TARGETS_ARE_SEQUENCES: bool = True
) -> list[str]:
    """Prepend the special tokens to a token list, deduplicating.

    Sequence targets get ``[<pad>, <EOS>, <OOV>]``; non-sequence token
    types ('word'/'trial') get ``[<pad>, <OOV>]`` — the reference adds
    EOS to the class list only when targets are sequences (reference
    trainers.py:191-199).  A token list that already contains an
    uninserted special keeps it in place (vocab files are verbatim)."""
    specials = (
        [pad_token, EOS_token, OOV_token]
        if TARGETS_ARE_SEQUENCES
        else [pad_token, OOV_token]
    )
    rest = [t for t in tokens if t not in specials]
    return specials + rest


def oov_index(class_list: Sequence[str]) -> int:
    """Index of ``<OOV>`` if present, else the literal 2 (reference
    subjects.py:349-352)."""
    try:
        return class_list.index(OOV_token)
    except ValueError:
        return 2


# --------------------------------------------------------------------------
# tokenization
# --------------------------------------------------------------------------


def sentence_tokenize(
    sentence: str | Sequence[str],
    token_type: str = "word_sequence",
    subword_encoder: "SubwordEncoder | None" = None,
) -> list[str]:
    """Sentence → token list under the reference's modes
    (data_generators.py:446-475).

    * ``word`` / ``word_sequence`` / ``phoneme`` / ``phoneme_sequence``:
      one token per word/phoneme, words get the ``_`` suffix;
    * ``trial``: the entire sentence as ONE token of ``_``-postfixed
      words;
    * ``word_piece_sequence``: greedy subword encode (requires
      ``subword_encoder``).
    """
    words = sentence.split() if isinstance(sentence, str) else list(sentence)
    if token_type == "word_piece_sequence":
        if subword_encoder is None:
            raise ValueError("word_piece_sequence requires a subword_encoder")
        text = " ".join(words)
        return subword_encoder.encode(text)
    if token_type == "trial":
        return ["".join(w + WORD_SUFFIX for w in words)]
    if token_type in ("phoneme", "phoneme_sequence"):
        return [str(w) for w in words]
    # word / word_sequence default
    return [w + WORD_SUFFIX for w in words]


def target_inds_to_sequences(
    hypotheses,
    class_list: Sequence[str],
    indices: Sequence[int] | None = None,
) -> list[str]:
    """Token-index sequences → sentences (reference trainers.py:952-963):
    look up tokens, join, ``_`` → space, strip pad/EOS, collapse space."""
    if indices is None:
        indices = range(len(hypotheses))
    sentences = []
    for i in indices:
        tokens = []
        for idx in hypotheses[i]:
            token = class_list[int(idx)]
            if token == EOS_token:
                break
            if token == pad_token:
                continue
            tokens.append(token)
        text = "".join(tokens).replace(WORD_SUFFIX, " ").strip()
        sentences.append(" ".join(text.split()))
    return sentences


def string_seq_to_index_seq(
    tokens: Sequence[str],
    class_list: Sequence[str],
    APPEND_EOS: bool = False,
) -> list[int]:
    """Token strings → class indices with OOV fallback; optionally append
    ``<EOS>`` (reference subjects.py:338-367, tf_helpers contract)."""
    index = {token: i for i, token in enumerate(class_list)}
    oov = oov_index(class_list)
    out = [index.get(t, oov) for t in tokens]
    if APPEND_EOS:
        out.append(index[EOS_token])
    return out


# --------------------------------------------------------------------------
# subword (word-piece) encoder
# --------------------------------------------------------------------------


class SubwordEncoder:
    """Greedy longest-match subword tokenizer with a BPE-style vocabulary
    builder — native stand-in for tensor2tensor's SubwordTextEncoder
    (reference data_generators.py:451-461).

    Subword units terminate words with the ``_`` marker (so decode is
    concatenate + ``_``→space, the same rule as word tokens).  Unknown
    characters fall back to ``<OOV>``.
    """

    def __init__(self, subwords: Sequence[str]):
        # longest-first for greedy matching
        self.subwords = list(subwords)
        self._by_length = sorted(
            (s for s in self.subwords if s not in SPECIAL_TOKENS),
            key=len,
            reverse=True,
        )

    @classmethod
    def build_from_corpus(
        cls,
        sentences: Iterable[str],
        target_vocab_size: int = 256,
        max_subword_len: int = 12,
    ) -> "SubwordEncoder":
        """Count all substrings of ``word_`` forms up to
        ``max_subword_len``; keep the most frequent until
        ``target_vocab_size`` (always keeping single characters so any
        string is encodable)."""
        counts: Counter[str] = Counter()
        chars: set[str] = set()
        for sentence in sentences:
            for word in sentence.split():
                marked = word + WORD_SUFFIX
                chars.update(marked)
                for i in range(len(marked)):
                    for j in range(i + 1, min(i + 1 + max_subword_len, len(marked) + 1)):
                        counts[marked[i:j]] += 1
        keep = sorted(chars)
        budget = max(target_vocab_size - len(keep), 0)
        multi = [
            s
            for s, _ in counts.most_common()
            if len(s) > 1 and s not in chars
        ][:budget]
        return cls(with_special_tokens(keep + multi))

    @classmethod
    def from_vocab_file(cls, path: str) -> "SubwordEncoder":
        return cls(read_vocab_file(path))

    def encode(self, text: str) -> list[str]:
        """Greedy longest-match over each ``word_`` form."""
        out: list[str] = []
        for word in text.split():
            marked = word + WORD_SUFFIX
            i = 0
            while i < len(marked):
                match = None
                for s in self._by_length:
                    if marked.startswith(s, i):
                        match = s
                        break
                if match is None:
                    match = marked[i]
                    if match not in self.subwords:
                        out.append(OOV_token)
                        i += 1
                        continue
                out.append(match)
                i += len(match)
        return out

    def decode(self, tokens: Sequence[str]) -> str:
        text = "".join(t for t in tokens if t not in SPECIAL_TOKENS)
        return " ".join(text.replace(WORD_SUFFIX, " ").split())
