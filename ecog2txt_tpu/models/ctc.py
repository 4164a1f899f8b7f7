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

import ctypes
import math
import os
import subprocess
import weakref
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


# --------------------------------------------------------------------------
# native (C++) search backend — native/ctcbeam.cpp
# --------------------------------------------------------------------------
#
# The search runs on the serving host per chunk per stream
# (serve.partial / pool.partial); the Python recurrence costs
# ~0.6 ms/step at beam 16 over the 1806-word MOCHA lexicon, which at
# pool scale rivals the device step itself.  The C++ twin implements
# the identical recurrence (double math); CTCWordBeamState dispatches
# to it automatically when the library builds, keeping the Python
# implementation as the always-available oracle (use_native=False).

_NATIVE_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "ctcbeam.cpp",
)
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_native"
)
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_NATIVE_SRC):
        return None
    # every failure below (read-only install dir, no g++, compile
    # error/timeout) must degrade to the Python oracle, never raise
    try:
        os.makedirs(_NATIVE_DIR, exist_ok=True)
    except OSError:
        return None
    so_path = os.path.join(_NATIVE_DIR, "libctcbeam.so")
    if not (
        os.path.exists(so_path)
        and os.path.getmtime(so_path) >= os.path.getmtime(_NATIVE_SRC)
    ):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               _NATIVE_SRC, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:  # pragma: no cover
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ctcbeam_trie_new.restype = ctypes.c_void_p
    lib.ctcbeam_trie_free.argtypes = [ctypes.c_void_p]
    lib.ctcbeam_trie_add.restype = ctypes.c_int32
    lib.ctcbeam_trie_add.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.ctcbeam_state_new.restype = ctypes.c_void_p
    lib.ctcbeam_state_new.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_double,
    ]
    lib.ctcbeam_state_free.argtypes = [ctypes.c_void_p]
    lib.ctcbeam_advance.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_int32,
    ]
    lib.ctcbeam_best.restype = ctypes.c_long
    lib.ctcbeam_best.argtypes = [ctypes.c_void_p, i32p, ctypes.c_long]
    lib.ctcbeam_best_score.restype = ctypes.c_double
    lib.ctcbeam_best_score.argtypes = [ctypes.c_void_p]
    lib.ctcbeam_num_steps.restype = ctypes.c_long
    lib.ctcbeam_num_steps.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _native_trie(trie: LexiconTrie):
    """Build (and cache on the LexiconTrie) the C++ trie + word table.
    Returns (handle, words list) or None when the library is absent."""
    lib = _load_native()
    if lib is None:
        return None
    cached = getattr(trie, "_native", None)
    if cached is not None:
        return cached if cached is not False else None
    handle = lib.ctcbeam_trie_new()
    words: list[str] = []
    stack = [(trie.root, [])]
    while stack:
        node, path = stack.pop()
        for word in node["words"]:
            arr = np.asarray(path, dtype=np.int32)
            ok = lib.ctcbeam_trie_add(
                handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(path),
                len(words),
            )
            if not ok:
                # an id overflows the C++ packed beam-key fields
                # (phoneme id > 510 or > 2^23-1 trie nodes): this
                # lexicon must use the Python search
                lib.ctcbeam_trie_free(handle)
                trie._native = False
                return None
            words.append(word)
        for p in trie.children(node):
            stack.append((node[p], path + [p]))
    weakref.finalize(trie, lib.ctcbeam_trie_free, handle)
    trie._native = (handle, words)
    return trie._native


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
    at the next extension (e.g. across a word boundary).

    Dispatches to the C++ backend (native/ctcbeam.cpp, ~25× at serving
    beam widths) when it builds; ``use_native=False`` keeps the Python
    oracle.  Both are deterministic, but natural lexicons carry
    EXACTLY-tied beams (word-segmentation twins: 'x'+'y' vs 'xy' with
    identical phoneme paths score identically forever at zero bonus),
    and once pruning cuts inside a tied group the two implementations
    may keep different members — both results are valid beam-search
    outputs; ``best_score()`` is the quantity to compare across
    backends (tested unpruned-exact on the MOCHA lexicon)."""

    def __init__(
        self,
        trie: LexiconTrie,
        beam_width: int = 16,
        word_insertion_bonus: float = 0.0,
        use_native: bool | None = None,
    ):
        self.trie = trie  # also keeps the cached native trie alive
        self.beam_width = beam_width
        self.bonus = word_insertion_bonus
        NEG = -math.inf
        self.beams: dict[tuple, list] = {((), (), -1): [trie.root, 0.0, NEG]}
        self.num_steps = 0
        # native backend: same recurrence in C++ (use_native=None →
        # auto when the library builds; False → Python oracle)
        self._h = None
        if use_native is None or use_native:
            native = _native_trie(trie)
            if native is not None:
                self._lib = _load_native()
                self._trie_handle, self._words = native
                self._h = self._lib.ctcbeam_state_new(
                    self._trie_handle, beam_width, word_insertion_bonus
                )
                self._finalizer = weakref.finalize(
                    self, self._lib.ctcbeam_state_free, self._h
                )
            elif use_native:
                raise RuntimeError(
                    "native ctcbeam backend unavailable (build failed, or "
                    "the lexicon's ids overflow its packed beam keys)"
                )

    def advance(self, log_probs: np.ndarray) -> "CTCWordBeamState":
        """Consume (T_new, K+1) posterior rows; returns self."""
        if self._h is not None:
            logp = np.ascontiguousarray(log_probs, dtype=np.float64)
            T, K1 = logp.shape
            self._lib.ctcbeam_advance(
                self._h,
                logp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                T,
                K1,
            )
            self.num_steps += T
            return self
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
        if self._h is not None:
            cap = self.num_steps + 1  # one word needs ≥1 step
            out = np.empty(cap, dtype=np.int32)
            n = self._lib.ctcbeam_best(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                cap,
            )
            return [self._words[i] for i in out[: min(n, cap)]]
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

    def best_score(self) -> float:
        """Merged log score of :meth:`best`'s hypothesis.  Distinct
        word segmentations of one phoneme path carry EQUALLY-scored
        beams (with zero word bonus), so tie-breaks between them are
        arbitrary — the score is the cross-implementation invariant
        (and the confidence a serving client wants next to the words)."""
        if self._h is not None:
            return float(self._lib.ctcbeam_best_score(self._h))
        NEG = -math.inf
        by_words: dict[tuple, float] = {}
        for (words, partial, _last), (node, pb, pnb) in self.beams.items():
            if partial:
                continue
            score = _logsumexp2(pb, pnb)
            by_words[words] = _logsumexp2(by_words.get(words, NEG), score)
        if by_words:
            return max(by_words.values())
        if self.beams:
            return max(
                _logsumexp2(entry[1], entry[2])
                for entry in self.beams.values()
            )
        return NEG


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
