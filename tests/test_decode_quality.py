"""Decode-quality discrimination at a calibrated nonzero-WER operating
point (VERDICT r4 #2: every e2e run saturated at WER 0, so beam /
temperature / rescoring / transfer orderings — the paper's actual
claims (Makin et al., reference README.md:4; beam_width/temperature at
mocha-1_word_sequence.yaml:31,82) — were untestable).

The operating point: ``synth_pattern_correlation=0.35`` +
``synth_noise_scale=0.15`` (word spatial patterns pulled toward one
shared pattern — confusable by construction, which i.i.d. noise alone
cannot achieve) at a fixed 160-epoch budget lands the default demo
model at val WER ≈ 0.08 (measured; see RESULTS.md round-5 table).
"""

import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.train import MultiSubjectTrainer

OP_POINT = dict(
    synth_pattern_correlation=0.35,
    synth_noise_scale=0.15,
    num_unique_sentences=12,
    num_sentences_per_block=12,
    num_training_blocks=3,
)


def _make_trainer(root, subject_ids=(1,), **overrides):
    kw = dict(OP_POINT)
    kw.update(overrides)
    mp = make_demo_experiment(
        str(root), subject_ids=subject_ids, grid_size=(4, 4),
        phoneme_sequence_distribution="CTC", **kw,
    )
    return MultiSubjectTrainer(
        mp, list(subject_ids),
        SN_kwargs={"batch_size": 12, "max_dec_len": 10,
                   "learning_rate": 3e-3},
        VERBOSE=False,
    )


def _val_wer(trainer, beam=1, temp=0.0):
    trainer.beam_width = beam
    trainer.SN_kwargs["temperature"] = temp
    out = trainer.assess(["validation"])["validation"]
    return out["word_error_rate"], out


def test_difficulty_knobs_shape_and_validation(tmp_path):
    """pattern_correlation pulls word spatial patterns toward a shared
    one (mean pairwise cosine similarity rises); channel_dropout zeroes
    a per-trial channel subset; both validate their range."""
    from ecog2txt_tpu.config import Manifest
    from ecog2txt_tpu.datagen import SyntheticDataGenerator

    def gen(**kw):
        base = {
            "grid_size": [4, 4], "sampling_rate": 200,
            "token_type": "word_sequence",
            "tf_record_partial_path": str(tmp_path / "r_B{0}.tfrecord"),
        }
        base.update(kw)
        return SyntheticDataGenerator(Manifest(base, 1), 1, VERBOSE=False)

    def mean_cos(g):
        pats = [
            g._word_pattern(w)[0] for w in ["dog", "cat", "house", "green"]
        ]
        sims = []
        for i in range(len(pats)):
            for j in range(i + 1, len(pats)):
                a, b = pats[i], pats[j]
                sims.append(
                    float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                )
        return np.mean(sims)

    assert mean_cos(gen(synth_pattern_correlation=0.8)) > mean_cos(gen()) + 0.05

    g = gen(synth_channel_dropout=0.4)
    trial = next(g._ecog_token_generator(1))
    dead = np.all(trial["ecog_sequence"] == 0.0, axis=0)
    assert 0 < dead.sum() < g.num_ECoG_channels

    with pytest.raises(ValueError, match="synth_pattern_correlation"):
        gen(synth_pattern_correlation=1.5)
    with pytest.raises(ValueError, match="synth_channel_dropout"):
        gen(synth_channel_dropout=-0.1)


def test_difficulty_is_monotonic_without_training(tmp_path):
    """The axis discriminates before any training: nearest-pattern word
    classification on noisy trials degrades as (correlation, noise)
    rise — the corpus-level guarantee behind the measured WER ramp
    (0.104 → 0.910 val WER at a fixed 80-epoch budget, RESULTS.md)."""
    from ecog2txt_tpu.config import Manifest
    from ecog2txt_tpu.datagen import SyntheticDataGenerator

    def accuracy(alpha, noise):
        base = {
            "grid_size": [4, 4], "sampling_rate": 200,
            "token_type": "word_sequence",
            "synth_pattern_correlation": alpha,
            "synth_noise_scale": noise,
            "tf_record_partial_path": str(tmp_path / "r_B{0}.tfrecord"),
        }
        g = SyntheticDataGenerator(Manifest(base, 1), 1, VERBOSE=False)
        words = sorted({w for s in g.sentences for w in s.split()})
        protos = {w: g._word_pattern(w) for w in words}
        spw = g.samples_per_word
        hits = total = 0
        for trial in g._ecog_token_generator(1):
            ecog = trial["ecog_sequence"]
            for k, tok in enumerate(trial["text_sequence"]):
                w = tok.rstrip("_")
                seg = ecog[k * spw : (k + 1) * spw]
                best = min(
                    words,
                    key=lambda c: np.sum((seg - protos[c]) ** 2),
                )
                hits += best == w
                total += 1
        return hits / total

    easy = accuracy(0.0, 0.05)
    mid = accuracy(0.6, 0.6)
    hard = accuracy(0.9, 1.5)
    assert easy > mid > hard
    assert easy > 0.95
    assert hard < 0.9


@pytest.mark.slow
def test_decode_modes_at_operating_point(tmp_path):
    """At the calibrated operating point the WER axis discriminates:
    greedy val WER sits in (0, 0.3]; beam-8 never hurts (≤ greedy —
    equality allowed: the trained posterior is peaked, and beam's
    top-1 log-prob ≥ greedy's is separately asserted in test_beam.py);
    the CTC-head-only lexicon rescoring produces usable words
    (< 0.5 WER with ≥ 3 phonemes/utterance surviving collapse)."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.assess import wer_vector
    from ecog2txt_tpu.datagen import word_to_phonemes
    from ecog2txt_tpu.models.ctc import (
        CTCWordBeamState, LexiconTrie, collapse_alignment,
    )
    from ecog2txt_tpu.models.seq2seq import encode
    from ecog2txt_tpu.serve import _ctc_head_apply

    tr = _make_trainer(tmp_path / "op")
    tr.fit(num_epochs=160, assess=False)

    wer_greedy, out_g = _val_wer(tr, beam=1, temp=0.0)
    assert 0.0 < wer_greedy <= 0.3
    wer_beam, _ = _val_wer(tr, beam=8, temp=0.0)
    assert wer_beam <= wer_greedy

    # CTC-head-only decode, lexicon-rescored into words
    phoneme_list = tr.target_subject.data_manifests[
        "encoder_1_targets"
    ].feature_list
    word_list = tr.target_subject.data_manifests[
        "decoder_targets"
    ].feature_list
    id_map = {p: i for i, p in enumerate(phoneme_list)}
    lex = {
        w: [id_map[p] for p in word_to_phonemes(w.rstrip("_"))]
        for w in word_list
        if not w.startswith("<")
        and all(p in id_map for p in word_to_phonemes(w.rstrip("_")))
    }
    trie = LexiconTrie(lex)
    blank = len(phoneme_list)
    ds = tr.packed_dataset("validation")
    cfg, params = tr.net_config, tr.state.ema
    enc_out, _, enc_lens = encode(
        params, cfg, jnp.asarray(ds.encoder_inputs[0]),
        jnp.asarray(ds.encoder_lengths[0]), jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(0), train=False,
    )
    enc_bm = np.moveaxis(np.asarray(enc_out), 0, 1)  # (B, T', D)
    hyps, n_phon = [], []
    for i in range(enc_bm.shape[0]):
        n = int(enc_lens[i])
        path, logp = _ctc_head_apply(
            params, cfg, "encoder_1_targets", jnp.asarray(enc_bm[i : i + 1, :n]),
            want_logp=True,
        )
        n_phon.append(
            len([x for x in collapse_alignment(np.asarray(path)[:, 0])
                 if int(x) != blank])
        )
        st = CTCWordBeamState(trie, beam_width=8)
        st.advance(np.asarray(logp)[:, 0])
        hyps.append(" ".join(w.rstrip("_") for w in st.best()))
    wer_lex = float(np.mean(wer_vector(out_g["references"], hyps)))
    assert np.mean(n_phon) >= 3.0  # the head is alive, not blank-collapsed
    assert wer_lex < 0.5


@pytest.mark.slow
def test_transfer_beats_cold_at_operating_point(tmp_path):
    """The transfer-learning claim at a WER point that can show it:
    a donor-pretrained target (sequential curriculum, reference
    trainers.py:329-374) beats the cold target at the same target
    epoch budget."""
    tr_tl = _make_trainer(tmp_path / "tl", subject_ids=(2, 1))
    tr_tl.sequential_transfer_learn(
        pretraining=40, training=80, posttraining=80
    )
    wer_tl, _ = _val_wer(tr_tl)

    tr_cold = _make_trainer(tmp_path / "cold")
    tr_cold.fit(num_epochs=160, assess=False)
    wer_cold, _ = _val_wer(tr_cold)

    assert wer_tl < wer_cold
    assert wer_cold > 0.0  # the operating point discriminates
