"""CTC head tests: loss, greedy decode, lexicon beam search, e2e."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.datagen import word_to_phonemes
from ecog2txt_tpu.models.ctc import (
    LexiconTrie,
    build_lexicon,
    collapse_alignment,
    ctc_greedy_decode,
    ctc_loss,
    ctc_word_beam_search,
)


def test_collapse_alignment():
    np.testing.assert_array_equal(
        collapse_alignment([1, 1, 2, 2, 2, 1, 3]), [1, 2, 1, 3]
    )
    assert len(collapse_alignment([])) == 0


def test_ctc_loss_perfect_prediction_low():
    """Sharp logits matching the label path → near-zero loss."""
    K = 4  # phonemes 0..3, blank = 4
    labels = jnp.asarray([[0, 1, 2]], jnp.int32)
    T = 6
    path = [0, 4, 1, 4, 2, 4]  # label, blank alternation
    logits = jnp.full((T, 1, K + 1), -20.0)
    for t, p in enumerate(path):
        logits = logits.at[t, 0, p].set(20.0)
    loss = ctc_loss(
        logits, jnp.asarray([T]), labels, jnp.asarray([3])
    )
    assert float(loss) < 0.01
    # wrong labels → large loss
    bad = ctc_loss(
        logits, jnp.asarray([T]), jnp.asarray([[3, 3, 3]], jnp.int32),
        jnp.asarray([3]),
    )
    assert float(bad) > 5.0


def test_ctc_greedy_decode():
    K = 3
    # path: blank, 0, 0, blank, 2 → [0, 2]
    path = [3, 0, 0, 3, 2]
    logits = jnp.full((5, 1, K + 1), -10.0)
    for t, p in enumerate(path):
        logits = logits.at[t, 0, p].set(10.0)
    out = ctc_greedy_decode(logits, jnp.asarray([5]))
    assert out == [[0, 2]]
    # length masking cuts the tail
    out = ctc_greedy_decode(logits, jnp.asarray([3]))
    assert out == [[0]]


def test_lexicon_trie_and_beam_search():
    phoneme_list = ["A", "B", "C"]
    lexicon = {"ab": [0, 1], "ac": [0, 2], "b": [1]}
    trie = LexiconTrie(lexicon)
    # posterior grid spelling A B <blank> B: "ab" then "b"
    T, K = 6, 3
    grid = np.full((T, K + 1), -15.0)
    for t, p in enumerate([0, 1, 3, 1, 3, 3]):
        grid[t, p] = 0.0
    words = ctc_word_beam_search(grid, trie, beam_width=8)
    assert words == ["ab", "b"]


def test_beam_search_respects_lexicon():
    """A phoneme path not in the lexicon maps to the closest legal words."""
    lexicon = {"ab": [0, 1]}
    trie = LexiconTrie(lexicon)
    grid = np.full((4, 4), -8.0)
    for t, p in enumerate([2, 2, 2, 2]):  # 'C C C C' — not in lexicon
        grid[t, p] = 0.0
    words = ctc_word_beam_search(grid, trie, beam_width=4)
    assert all(w in lexicon for w in words)


def test_incremental_beam_equals_from_scratch():
    """CTCWordBeamState.advance over chunks == the one-shot search over
    the concatenation, at every prefix — the streaming-partials
    contract (VERDICT r2 #5)."""
    from ecog2txt_tpu.models.ctc import CTCWordBeamState

    lexicon = {"ab": [0, 1], "ac": [0, 2], "b": [1], "ca": [2, 0]}
    trie = LexiconTrie(lexicon)
    rng = np.random.default_rng(3)
    T, K = 24, 3
    # noisy posterior grid (normalized log-probs)
    grid = rng.normal(size=(T, K + 1)) * 2.0
    grid = grid - np.log(np.exp(grid).sum(axis=1, keepdims=True))
    state = CTCWordBeamState(trie, beam_width=6)
    for start in range(0, T, 5):  # ragged chunking
        chunk = grid[start : start + 5]
        state.advance(chunk)
        upto = min(start + 5, T)
        oracle = ctc_word_beam_search(grid[:upto], trie, beam_width=6)
        assert state.best() == oracle
        assert state.num_steps == upto


def test_build_lexicon_from_vocab():
    vocab = ["<pad>", "<EOS>", "<OOV>", "dog_", "cat_"]
    phoneme_list = sorted({p for w in ("dog", "cat") for p in word_to_phonemes(w)})
    lex = build_lexicon(vocab, word_to_phonemes, phoneme_list)
    assert set(lex) == {"dog", "cat"}
    assert all(isinstance(p, int) for p in lex["dog"])


def test_ctc_in_seq2seq_loss(rng):
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, init_seq2seq, seq2seq_loss,
    )

    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
        aux_heads=(AuxHead("encoder_1_targets", "CTC", 11),),  # 10 + blank
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=6,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    batch = {
        "encoder_inputs": jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32),
        "encoder_lengths": jnp.asarray([32, 20], jnp.int32),
        "decoder_targets": jnp.asarray(rng.integers(2, 12, size=(2, 5)), jnp.int32),
        "decoder_lengths": jnp.asarray([5, 3], jnp.int32),
        "encoder_1_targets": jnp.asarray(rng.integers(0, 10, size=(2, 6)), jnp.int32),
        "encoder_1_targets_lengths": jnp.asarray([6, 4], jnp.int32),
        "subject_idx": jnp.asarray(0, jnp.int32),
    }
    loss, metrics = seq2seq_loss(params, cfg, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "loss_encoder_1_targets" in metrics
    g = jax.grad(
        lambda p: seq2seq_loss(p, cfg, batch, jax.random.PRNGKey(1), False)[0]
    )(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_ctc_e2e_trainer(tmp_path):
    """Full pipeline with `phoneme_sequence_distribution: CTC`."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [16], "encoder_rnn": [24],
            "encoder_1_projection": [16], "decoder_embedding": [12],
            "decoder_rnn": [48], "decoder_projection": [],
        },
        phoneme_sequence_distribution="CTC",
    )
    tr = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                            "N_epochs": 10},
        VERBOSE=False,
    )
    head = [h for h in tr.net_config.aux_heads
            if h.name == "encoder_1_targets"][0]
    assert head.distribution == "CTC"
    ds = tr.packed_dataset("training")
    assert "encoder_1_targets_lengths" in ds.aux_targets
    # labels are collapsed sequences, much shorter than T
    assert ds.aux_targets["encoder_1_targets"].shape[2] < ds.encoder_inputs.shape[2]
    history = tr.fit(assess=True)
    assert history  # trains and assesses without error


# --------------------------------------------------------------------------
# native (C++) search backend parity — native/ctcbeam.cpp
# --------------------------------------------------------------------------


def _mocha_trie():
    """Real-scale lexicon (1806-word MOCHA vocab) with homophone
    expansions deduplicated: two words with an identical phoneme
    expansion tie EXACTLY forever, and the tie-break is insertion-order
    on the Python side vs key-order natively — a legitimate
    don't-care the parity assertion must exclude."""
    from ecog2txt_tpu import text_dir
    from ecog2txt_tpu.datagen import word_to_phonemes
    from ecog2txt_tpu.models.ctc import build_lexicon

    ref = "/root/reference/ecog2txt/auxiliary/vocab.mocha-timit.1806"
    vocab = ref if os.path.exists(ref) else os.path.join(
        text_dir, "vocab.demo.36"
    )
    with open(vocab) as f:
        words = [w.strip() for w in f]
    phoneme_list = sorted({
        p for w in words if not w.startswith("<")
        for p in word_to_phonemes(w.rstrip("_"))
    })
    lex = build_lexicon(words, word_to_phonemes, phoneme_list)
    seen: set = set()
    dedup = {}
    for w, ph in lex.items():
        if tuple(ph) not in seen:
            seen.add(tuple(ph))
            dedup[w] = ph
    return LexiconTrie(dedup), len(phoneme_list)


def _unambiguous_trie(rng, K=8, num_words=40):
    """All words are distinct phoneme TRIPLES: expansions are unique
    AND any phoneme string segments into words in at most one way, so
    the best hypothesis is tie-free and exact word-sequence parity is
    well-defined (unlike a natural lexicon, where 'x'+'y' vs 'xy'
    carry equal-scored beams forever and tie-breaks are arbitrary)."""
    triples = set()
    while len(triples) < num_words:
        triples.add(tuple(int(p) for p in rng.integers(0, K, 3)))
    lexicon = {
        "w%03d" % i: list(t) for i, t in enumerate(sorted(triples))
    }
    return LexiconTrie(lexicon), K


def test_native_beam_matches_python_oracle():
    from ecog2txt_tpu.models.ctc import CTCWordBeamState, _load_native

    if _load_native() is None:
        pytest.skip("native ctcbeam unavailable")
    rng = np.random.default_rng(7)
    trie, K = _unambiguous_trie(rng)
    for trial in range(4):
        T = int(rng.integers(15, 60))
        grid = rng.normal(size=(T, K + 1)) * 2.0
        grid = grid - np.log(np.exp(grid).sum(axis=1, keepdims=True))
        py = CTCWordBeamState(trie, beam_width=12, use_native=False)
        nat = CTCWordBeamState(trie, beam_width=12, use_native=True)
        assert nat._h is not None and py._h is None
        assert py.advance(grid).best() == nat.advance(grid).best()
        assert py.best_score() == pytest.approx(
            nat.best_score(), abs=1e-9
        )
        # streamed native == one-shot native at a mid-stream prefix too
        chunked = CTCWordBeamState(trie, beam_width=12, use_native=True)
        pos = 0
        while pos < T:
            step = int(rng.integers(1, 8))
            chunked.advance(grid[pos : pos + step])
            pos += step
        assert chunked.best() == nat.best()
        assert chunked.num_steps == T


def test_native_beam_mocha_lexicon_score_parity():
    """Real-lexicon parity, unpruned: a natural lexicon carries
    EXACTLY-tied beams (word-segmentation twins) at every closure
    step, so once pruning bites, which twin survives the cutoff is
    tie-order dependent and the searches legitimately diverge — parity
    is only well-defined when the beam is wide enough that pruning
    never discards anything.  Short T + huge width exercises the full
    MOCHA trie's transition math on both sides exactly."""
    from ecog2txt_tpu.models.ctc import CTCWordBeamState, _load_native

    if _load_native() is None:
        pytest.skip("native ctcbeam unavailable")
    trie, K = _mocha_trie()
    rng = np.random.default_rng(11)
    for bonus in (0.0, -1.5, 1.0):
        grid = rng.normal(size=(3, K + 1)) * 2.0
        grid = grid - np.log(np.exp(grid).sum(axis=1, keepdims=True))
        py = CTCWordBeamState(trie, 200_000, bonus, use_native=False)
        nat = CTCWordBeamState(trie, 200_000, bonus, use_native=True)
        py.advance(grid)
        nat.advance(grid)
        assert len(py.beams) < 200_000  # genuinely unpruned
        assert py.best_score() == pytest.approx(
            nat.best_score(), abs=1e-9
        )


def test_native_beam_overflow_falls_back_to_python():
    """Phoneme ids beyond the C++ packed-key field (9 bits for last+1,
    so id ≤ 510) must NOT silently alias beams: the native trie build
    reports overflow and CTCWordBeamState degrades to the Python
    search, which has no id limits."""
    from ecog2txt_tpu.models.ctc import CTCWordBeamState, _load_native

    if _load_native() is None:
        pytest.skip("native ctcbeam unavailable")
    # subword-scale unit ids — far past the packed 9-bit field
    lexicon = {"big": [600, 601], "units": [602]}
    trie = LexiconTrie(lexicon)
    auto = CTCWordBeamState(trie, beam_width=4)  # use_native=None
    assert auto._h is None  # fell back
    assert trie._native is False  # cached: don't rebuild per state
    with pytest.raises(RuntimeError):
        CTCWordBeamState(trie, beam_width=4, use_native=True)
    # and the Python path still searches this lexicon correctly
    K = 603
    grid = np.full((3, K + 1), -12.0)
    for t, p in enumerate([600, 601, K]):
        grid[t, p] = 0.0
    assert auto.advance(grid).best() == ["big"]


def test_native_beam_mocha_chunked_deterministic():
    """Pruned, real lexicon: the native search is deterministic —
    chunked advance reproduces the one-shot advance exactly (same
    float ops in the same order), words and score."""
    from ecog2txt_tpu.models.ctc import CTCWordBeamState, _load_native

    if _load_native() is None:
        pytest.skip("native ctcbeam unavailable")
    trie, K = _mocha_trie()
    rng = np.random.default_rng(13)
    grid = rng.normal(size=(50, K + 1)) * 2.0
    grid = grid - np.log(np.exp(grid).sum(axis=1, keepdims=True))
    oneshot = CTCWordBeamState(trie, 12, use_native=True).advance(grid)
    chunked = CTCWordBeamState(trie, 12, use_native=True)
    pos = 0
    while pos < 50:
        step = int(rng.integers(1, 9))
        chunked.advance(grid[pos : pos + step])
        pos += step
    assert chunked.best() == oneshot.best()
    assert chunked.best_score() == oneshot.best_score()
    assert oneshot.best()  # decodes to words
