"""ArrayDataGenerator (file-backed, zero-subclassing) tests: channel
referencing, block discovery, and the export→retrain e2e parity
(VERDICT r2 #8)."""

import os

import numpy as np
import pytest

from ecog2txt_tpu.config import Manifest
from ecog2txt_tpu.datagen import (
    ArrayDataGenerator,
    export_trials_to_arrays,
)
from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.train import MultiSubjectTrainer

TINY = {
    "encoder_embedding": [16],
    "encoder_rnn": [24],
    "encoder_1_projection": [16],
    "decoder_embedding": [12],
    "decoder_rnn": [32],
    "decoder_projection": [],
}


def _manifest(trial_dir, **over):
    base = {
        "grid_size": [2, 2],
        "grid_step": 1,
        "sampling_rate": 200,
        "token_type": "word_sequence",
        "trial_dir": trial_dir,
        "tf_record_partial_path": os.path.join(
            trial_dir, "rec", "s_B{0}.tfrecord"
        ),
    }
    base.update(over)
    return Manifest(base, 1)


def test_block_discovery_and_query(tmp_path):
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B3"))
    np.savez(
        os.path.join(d, "B3", "a.npz"),
        ecog=np.zeros((10, 4), np.float32), text="hi there",
    )
    np.savez(
        os.path.join(d, "B5_t0.npz"),
        ecog=np.zeros((10, 4), np.float32), text="yo",
    )
    gen = ArrayDataGenerator(_manifest(d), 1)
    assert gen._all_blocks() == [3, 5]
    assert gen._query([3, 5]) == 2
    trials = list(gen._ecog_token_generator(3))
    assert trials[0]["ecog_sequence"].shape == (10, 4)
    assert trials[0]["text_sequence"] == ["hi_", "there_"]


def test_full_grid_channel_selection(tmp_path):
    """Files carrying full electrode columns get the grid referencing:
    bad electrodes dropped in layout order; bipolar mode differences
    good pairs."""
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B1"))
    T = 6
    # 2x3 grid: 6 electrodes, 7 bipolar pairs — channel counts differ
    # from the electrode count in every mode, so full-grid columns are
    # unambiguous
    ecog = np.arange(T * 6, dtype=np.float32).reshape(T, 6)
    np.savez(os.path.join(d, "B1", "t.npz"), ecog=ecog, text="a")
    gen = ArrayDataGenerator(
        _manifest(d, grid_size=[2, 3]), 1, bad_electrodes=[0]
    )
    assert gen.num_ECoG_channels == 5
    (trial,) = gen._ecog_token_generator(1)
    sel = trial["ecog_sequence"]
    assert sel.shape == (T, 5)
    layout_order = [e for e in gen.elec_layout.flatten() if e != 0]
    np.testing.assert_array_equal(sel, ecog[:, layout_order])

    gen_bi = ArrayDataGenerator(
        _manifest(d, grid_size=[2, 3], REFERENCE_BIPOLAR=True), 1
    )
    (trial,) = gen_bi._ecog_token_generator(1)
    pairs = gen_bi.bipolar_to_elec_map
    expect = np.stack(
        [ecog[:, a] - ecog[:, b] for a, b in pairs], axis=1
    )
    np.testing.assert_array_equal(trial["ecog_sequence"], expect)


def test_channel_mismatch_raises(tmp_path):
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B1"))
    np.savez(
        os.path.join(d, "B1", "t.npz"),
        ecog=np.zeros((5, 7), np.float32), text="a",
    )
    gen = ArrayDataGenerator(_manifest(d), 1)
    with pytest.raises(ValueError, match="7 columns"):
        list(gen._ecog_token_generator(1))


def test_mat_file_support(tmp_path):
    from scipy.io import savemat

    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B2"))
    savemat(
        os.path.join(d, "B2", "t.mat"),
        {"ecog": np.ones((8, 4), np.float32), "text": "dog ate"},
    )
    gen = ArrayDataGenerator(_manifest(d), 1)
    (trial,) = gen._ecog_token_generator(2)
    assert trial["ecog_sequence"].shape == (8, 4)
    assert trial["text_sequence"] == ["dog_", "ate_"]


@pytest.mark.slow
def test_export_retrain_same_wer(tmp_path):
    """Export the synthetic corpus to per-trial npz files, train through
    ArrayDataGenerator with zero subclassing: identical trials →
    identical records → the SAME WER trajectory (VERDICT r2 #8
    done-criterion)."""
    sn = {"batch_size": 8, "max_dec_len": 10, "learning_rate": 3e-3}

    mp_syn = make_demo_experiment(
        str(tmp_path / "syn"), subject_ids=(1,), layer_sizes=TINY
    )
    tr_syn = MultiSubjectTrainer(mp_syn, [1], SN_kwargs=sn, VERBOSE=False)
    gen = tr_syn.ecog_subjects[0].data_generator
    n = export_trials_to_arrays(gen, str(tmp_path / "arrays"))
    assert n > 0

    mp_arr = make_demo_experiment(
        str(tmp_path / "arr"), subject_ids=(1,), layer_sizes=TINY,
        DataGenerator="ArrayDataGenerator",
        trial_dir=str(tmp_path / "arrays"),
    )
    tr_arr = MultiSubjectTrainer(mp_arr, [1], SN_kwargs=sn, VERBOSE=False)
    agen = tr_arr.ecog_subjects[0].data_generator
    assert isinstance(agen, ArrayDataGenerator)

    h_syn = tr_syn.fit(num_epochs=20)
    h_arr = tr_arr.fit(num_epochs=20)
    wers_syn = [h["training"]["word_error_rate"] for h in h_syn.values()]
    wers_arr = [h["training"]["word_error_rate"] for h in h_arr.values()]
    assert wers_syn == wers_arr
    assert wers_arr[-1] < wers_arr[0]


# ---------------------------------------------------------------------------
# raw-voltage trials (features.py front end; VERDICT r4 missing #1)
# ---------------------------------------------------------------------------

HG = {"num_bands": 4, "pad_seconds": 0.25}  # small/fast chain for tests


def _save_raw_trial(path, raw, text, rate=None, **extra):
    arrays = {"raw": raw, "text": text, **extra}
    if rate is not None:
        arrays["raw_rate"] = rate
    np.savez(path, **arrays)


def test_raw_trials_match_offline_chain(tmp_path):
    """Files carrying 'raw' voltages are featurized through
    features.extract_high_gamma (trial z-score), exactly; 'ecog' files
    mix freely in the same block."""
    from ecog2txt_tpu.features import extract_high_gamma_np

    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B1"))
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(1000, 4)).astype(np.float32)
    _save_raw_trial(os.path.join(d, "B1", "a.npz"), raw, "hi there", 1000.0)
    np.savez(
        os.path.join(d, "B1", "b.npz"),
        ecog=np.ones((10, 4), np.float32), text="yo",
    )
    gen = ArrayDataGenerator(_manifest(d, high_gamma=HG), 1)
    trials = list(gen._ecog_token_generator(1))
    cfg = gen.high_gamma_config(1000.0)
    assert cfg.zscore == "trial" and cfg.out_rate == 200.0
    want = extract_high_gamma_np(raw, cfg)
    np.testing.assert_allclose(
        trials[0]["ecog_sequence"], want, rtol=1e-5, atol=1e-6
    )
    assert trials[0]["ecog_sequence"].shape == (200, 4)  # q = 5
    assert trials[0]["text_sequence"] == ["hi_", "there_"]
    np.testing.assert_array_equal(
        trials[1]["ecog_sequence"], np.ones((10, 4), np.float32)
    )


def test_raw_block_zscore_pools_block_stats(tmp_path):
    """hg_zscore='block': per-channel stats pool over every raw trial in
    the block (the serving-calibration normalization mode)."""
    from ecog2txt_tpu.features import extract_high_gamma_np

    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B1"))
    rng = np.random.default_rng(1)
    raws = [
        rng.normal(size=(800, 4)).astype(np.float32) * (i + 1)
        for i in range(3)
    ]
    for i, raw in enumerate(raws):
        _save_raw_trial(
            os.path.join(d, "B1", f"t{i}.npz"), raw, "a", 1000.0
        )
    gen = ArrayDataGenerator(_manifest(d, high_gamma=HG), 1,
                             hg_zscore="block")
    cfg = gen.high_gamma_config(1000.0)
    assert cfg.zscore == "none"
    feats = [extract_high_gamma_np(r, cfg) for r in raws]
    stacked = np.concatenate(feats)
    mu = stacked.mean(0, keepdims=True)
    sd = np.maximum(stacked.std(0, keepdims=True), 1e-6)
    trials = list(gen._ecog_token_generator(1))
    for trial, f in zip(trials, feats):
        np.testing.assert_allclose(
            trial["ecog_sequence"], (f - mu) / sd, rtol=1e-5, atol=1e-6
        )
    got = np.concatenate([t["ecog_sequence"] for t in trials])
    np.testing.assert_allclose(got.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(got.std(0), 1.0, atol=1e-3)


def test_raw_int16_manifest_rate_and_referencing(tmp_path):
    """int16 raw columns are scaled by input_scale BEFORE grid
    referencing (bipolar differences would overflow int16); the raw
    rate may come from the manifest instead of the file."""
    from ecog2txt_tpu.features import extract_high_gamma_np

    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B1"))
    rng = np.random.default_rng(2)
    # full 2x2 electrode grid with one bad electrode -> referencing path
    raw = (rng.normal(size=(1000, 4)) * 3000).astype(np.int16)
    _save_raw_trial(os.path.join(d, "B1", "t.npz"), raw, "a")
    hg = dict(HG, input_scale=1e-4)
    gen = ArrayDataGenerator(
        _manifest(d, raw_sampling_rate=1000.0, high_gamma=hg), 1,
        bad_electrodes=[0],
    )
    assert gen.num_ECoG_channels == 3
    (trial,) = gen._ecog_token_generator(1)
    cfg = gen.high_gamma_config(1000.0)
    scaled = raw.astype(np.float32) * 1e-4
    layout_order = [e for e in gen.elec_layout.flatten() if e != 0]
    want = extract_high_gamma_np(scaled[:, layout_order], cfg)
    np.testing.assert_allclose(
        trial["ecog_sequence"], want, rtol=1e-5, atol=1e-6
    )


def test_raw_requires_rate_and_validates_zscore(tmp_path):
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "B1"))
    _save_raw_trial(
        os.path.join(d, "B1", "t.npz"),
        np.zeros((100, 4), np.float32), "a",
    )
    gen = ArrayDataGenerator(_manifest(d), 1)
    with pytest.raises(ValueError, match="raw_rate"):
        list(gen._ecog_token_generator(1))
    with pytest.raises(ValueError, match="hg_zscore"):
        ArrayDataGenerator(_manifest(d), 1, hg_zscore="global")


@pytest.mark.slow
def test_raw_voltage_e2e_wer(tmp_path):
    """The full north-star front end: synthetic RAW VOLTAGE (band-noise
    carrier modulated by the word-pattern envelopes + 60 Hz line noise)
    → notch/band/Hilbert/z-score/decimate featurization →
    training reaches WER 0 — a lab can bring amplifier output to this
    framework with zero subclassing (VERDICT r4 missing #1
    done-criterion)."""
    from ecog2txt_tpu.features import synthesize_raw_from_envelope

    mp_syn = make_demo_experiment(
        str(tmp_path / "syn"), subject_ids=(1,), layer_sizes=TINY,
        grid_size=(2, 2), num_unique_sentences=6,
        num_sentences_per_block=8, num_training_blocks=2,
    )
    tr_syn = MultiSubjectTrainer(
        mp_syn, [1],
        SN_kwargs={"batch_size": 8, "max_dec_len": 10}, VERBOSE=False,
    )
    gen = tr_syn.ecog_subjects[0].data_generator
    cfg = None
    rng = np.random.default_rng(11)
    raw_dir = tmp_path / "raw"
    for block in gen._all_blocks():
        block_dir = raw_dir / f"B{block}"
        os.makedirs(block_dir, exist_ok=True)
        for i, trial in enumerate(gen._ecog_token_generator(block)):
            env = np.asarray(trial["ecog_sequence"], np.float32)
            if cfg is None:
                # 1 kHz raw -> 200 Hz features (q=5), small band bank
                gen2 = ArrayDataGenerator(
                    _manifest(str(raw_dir), high_gamma=HG,
                              raw_sampling_rate=1000.0), 1,
                )
                cfg = gen2.high_gamma_config(1000.0)
            raw = synthesize_raw_from_envelope(env, cfg, rng)
            arrays = {
                "raw": raw, "raw_rate": 1000.0,
                "text": np.asarray(trial["text_sequence"]),
                "audio_features": np.asarray(
                    trial["audio_sequence"], np.float32
                ),
            }
            if trial.get("phoneme_sequence") is not None:
                arrays["phonemes"] = np.asarray(trial["phoneme_sequence"])
            np.savez(block_dir / f"{i:04d}.npz", **arrays)

    mp_raw = make_demo_experiment(
        str(tmp_path / "rawexp"), subject_ids=(1,), layer_sizes=TINY,
        grid_size=(2, 2), num_unique_sentences=6,
        num_sentences_per_block=8, num_training_blocks=2,
        DataGenerator="ArrayDataGenerator",
        trial_dir=str(raw_dir),
        raw_sampling_rate=1000.0, high_gamma=HG,
    )
    tr_raw = MultiSubjectTrainer(
        mp_raw, [1],
        SN_kwargs={"batch_size": 8, "max_dec_len": 10,
                   "learning_rate": 3e-3},
        VERBOSE=False,
    )
    assert isinstance(tr_raw.ecog_subjects[0].data_generator,
                      ArrayDataGenerator)
    history = tr_raw.fit(num_epochs=200)
    wers = [h["training"]["word_error_rate"] for h in history.values()]
    assert wers[-1] < wers[0]
    assert min(wers) == 0.0
