"""CTC phoneme head: alignment-free loss, greedy decode, and
lexicon-constrained word rescoring.

BASELINE.json configs[3]: "Phoneme-level targets with CTC-style
alignment loss + word-level rescoring against vocab.mocha-timit.1806".
The reference's encoder heads are frame-aligned (SURVEY §2.8); CTC drops
the alignment requirement — the head emits per-encoder-step logits over
phonemes+blank and marginalizes over alignments (``optax.ctc_loss``,
forward-backward under jit).

Word-level rescoring is a CTC **prefix beam search over a lexicon
trie** (Hannun et al. 2014, public): beams are word-lattice prefixes
whose phoneme expansion must follow the trie built from the word vocab,
so every emitted hypothesis is a sequence of in-vocabulary words.  It
consumes the (small) per-utterance posterior grid on the host — the
heavy part (posteriors) is jitted; the search is O(T·beam·branching).

Blank id is the LAST class (num_phonemes), so phoneme ids keep their
vocab positions.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def ctc_loss(
    logits: jax.Array,  # (T, B, K+1) time-major encoder-head logits
    logit_lengths: jax.Array,  # (B,)
    labels: jax.Array,  # (B, L) int32 phoneme ids (no blanks)
    label_lengths: jax.Array,  # (B,)
) -> jax.Array:
    """Mean per-label-token CTC negative log-likelihood."""
    logits_bm = jnp.moveaxis(logits, 0, 1)  # (B, T, K+1)
    B, T = logits_bm.shape[:2]
    L = labels.shape[1]
    logit_paddings = (
        jnp.arange(T)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(L)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    blank_id = logits.shape[-1] - 1
    per_seq = optax.ctc_loss(
        logits_bm, logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(label_lengths), 1)


def collapse_alignment(aligned: np.ndarray) -> np.ndarray:
    """Frame-aligned labels → label sequence (merge repeats).  Used to
    derive CTC label sequences from the per-sample phoneme targets the
    featurization layer stores."""
    aligned = np.asarray(aligned)
    if len(aligned) == 0:
        return aligned
    keep = np.ones(len(aligned), bool)
    keep[1:] = aligned[1:] != aligned[:-1]
    return aligned[keep]


def ctc_greedy_decode(
    logits: jax.Array, lengths: jax.Array
) -> list[list[int]]:
    """Best-path decode: argmax per step, collapse repeats, drop blanks.
    Host-side post-processing of a jit-friendly argmax."""
    blank = logits.shape[-1] - 1
    path = np.asarray(jnp.argmax(logits, axis=-1))  # (T, B)
    lengths = np.asarray(lengths)
    out = []
    for b in range(path.shape[1]):
        seq = collapse_alignment(path[: lengths[b], b])
        out.append([int(p) for p in seq if p != blank])
    return out


# --------------------------------------------------------------------------
# lexicon trie + prefix beam search
# --------------------------------------------------------------------------


class LexiconTrie:
    """Phoneme-sequence trie over a word vocabulary.

    ``lexicon``: {word: [phoneme ids]}.  Node = dict phoneme_id → node;
    words that END at a node are stored under the ``words`` key."""

    def __init__(self, lexicon: dict[str, Sequence[int]]):
        self.root: dict = {"words": []}
        for word, phonemes in lexicon.items():
            node = self.root
            for p in phonemes:
                node = node.setdefault(int(p), {"words": []})
            node["words"].append(word)

    def children(self, node: dict) -> list[int]:
        return [k for k in node if k != "words"]


def _logsumexp2(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


class CTCWordBeamState:
    """Carryable lexicon-constrained CTC prefix-beam state.

    The per-step transition is identical to the classic from-scratch
    search, so ``advance`` over a stream of chunks produces EXACTLY the
    beams of one ``advance`` over the concatenation (the search is a
    per-step recurrence; pruning happens after every step either way —
    tested).  This is the incremental entry point a streaming
    ``partial()`` needs (VERDICT r2 #5): per-call cost is O(new steps),
    not O(history).

    Beam key: (words emitted, partial phoneme tuple, last phoneme id) →
    [trie node, log p ending in blank/boundary, log p ending
    non-blank].  ``last`` is PART OF THE KEY: two beams reaching the
    same (words, partial) via different final phonemes must not merge,
    or the repeat-needs-blank gate would apply with the wrong phoneme
    at the next extension (e.g. across a word boundary)."""

    def __init__(
        self,
        trie: LexiconTrie,
        beam_width: int = 16,
        word_insertion_bonus: float = 0.0,
    ):
        self.trie = trie
        self.beam_width = beam_width
        self.bonus = word_insertion_bonus
        NEG = -math.inf
        self.beams: dict[tuple, list] = {((), (), -1): [trie.root, 0.0, NEG]}
        self.num_steps = 0

    def advance(self, log_probs: np.ndarray) -> "CTCWordBeamState":
        """Consume (T_new, K+1) posterior rows; returns self."""
        trie = self.trie
        blank = log_probs.shape[1] - 1
        NEG = -math.inf
        beams = self.beams
        for t in range(log_probs.shape[0]):
            lp = log_probs[t]
            new: dict[tuple, list] = {}

            def add(key, node, pb, pnb):
                if key in new:
                    entry = new[key]
                    entry[1] = _logsumexp2(entry[1], pb)
                    entry[2] = _logsumexp2(entry[2], pnb)
                else:
                    new[key] = [node, pb, pnb]

            for (words, partial, last), (node, pb, pnb) in beams.items():
                total = _logsumexp2(pb, pnb)
                # 1) blank: prefix unchanged
                add((words, partial, last), node, total + lp[blank], NEG)
                # 2) repeat last non-blank phoneme: stays in the same
                # prefix (contributes to the non-blank mass only)
                if last >= 0 and pnb != NEG:
                    add((words, partial, last), node, NEG, pnb + lp[last])
                # 3) extend with a phoneme allowed by the trie
                for p in trie.children(node):
                    child = node[p]
                    # repeated phone needs an intervening blank to extend
                    src = total if p != last else pb
                    if src == NEG:
                        continue
                    npnb = src + lp[p]
                    new_partial = partial + (p,)
                    # continue mid-word
                    add((words, new_partial, p), child, NEG, npnb)
                    # or close out any word completed at this node
                    for word in child["words"]:
                        add(
                            (words + (word,), (), p),
                            trie.root,
                            NEG,
                            npnb + self.bonus,
                        )
            # prune
            scored = sorted(
                new.items(),
                key=lambda kv: -_logsumexp2(kv[1][1], kv[1][2]),
            )
            beams = dict(scored[: self.beam_width])
        self.beams = beams
        self.num_steps += log_probs.shape[0]
        return self

    def best(self) -> list[str]:
        """Best completed-word hypothesis so far (does not mutate —
        callable after every chunk)."""
        NEG = -math.inf
        # ignore dangling partials; beams differing only in `last`
        # describe the same word sequence, so merge their mass first
        by_words: dict[tuple, float] = {}
        for (words, partial, _last), (node, pb, pnb) in self.beams.items():
            if partial:
                continue
            score = _logsumexp2(pb, pnb)
            by_words[words] = _logsumexp2(by_words.get(words, NEG), score)
        if by_words:
            return list(max(by_words.items(), key=lambda kv: kv[1])[0])
        if self.beams:
            (words, _, _), _ = max(
                self.beams.items(),
                key=lambda kv: _logsumexp2(kv[1][1], kv[1][2]),
            )
            return list(words)
        return []


def ctc_word_beam_search(
    log_probs: np.ndarray,  # (T, K+1) posteriors for ONE utterance
    trie: LexiconTrie,
    beam_width: int = 16,
    word_insertion_bonus: float = 0.0,
) -> list[str]:
    """Lexicon-constrained CTC prefix beam search → best word sequence
    (the from-scratch oracle; one-shot :class:`CTCWordBeamState`)."""
    return (
        CTCWordBeamState(trie, beam_width, word_insertion_bonus)
        .advance(log_probs)
        .best()
    )


def build_lexicon(
    words: Sequence[str],
    word_to_phonemes,
    phoneme_list: Sequence[str],
) -> dict[str, list[int]]:
    """Word vocab (``word_``-suffixed entries, e.g.
    vocab.mocha-timit.1806) → {word: phoneme-id sequence}."""
    index = {p: i for i, p in enumerate(phoneme_list)}
    lexicon = {}
    for token in words:
        word = token.rstrip("_")
        if not word or token.startswith("<"):
            continue
        phonemes = [index[p] for p in word_to_phonemes(word) if p in index]
        if phonemes:
            lexicon[word] = phonemes
    return lexicon
