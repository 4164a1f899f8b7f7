"""CTC head tests: loss, greedy decode, lexicon beam search, e2e."""

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
