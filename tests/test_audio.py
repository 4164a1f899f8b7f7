"""MFCC-chain tests: analytic invariants of the featurization formulas
plus NUMERIC parity against python_speech_features (SURVEY §4).  The
package itself is not installed in this image, so parity runs against
(a) tests/psf_oracle.py — a faithful reimplementation of its published
algorithms — and (b) committed golden fixtures generated from that
oracle (tests/fixtures/mfcc_goldens.npz), covering all four
USE_LOG_MELS × USE_MFCC_DELTAS mode combinations (reference
data_generators.py:328-380)."""

import os

import numpy as np
import pytest
from scipy.fftpack import dct

from ecog2txt_tpu import audio

from psf_oracle import reference_mfcc_chain

GOLDENS = os.path.join(os.path.dirname(__file__), "fixtures", "mfcc_goldens.npz")


def test_frame_count_ceil():
    # 1000 samples, frame 320, step 80 → 1 + ceil(680/80) = 10 frames
    frames = audio.frame_signal(np.ones(1000), 320, 80)
    assert frames.shape == (10, 320)
    # short signal → one frame, zero-padded
    frames = audio.frame_signal(np.ones(100), 320, 80)
    assert frames.shape == (1, 320)
    assert frames[0, 100:].sum() == 0


def test_mel_scale_roundtrip():
    hz = np.array([0.0, 100.0, 1000.0, 8000.0])
    np.testing.assert_allclose(audio.mel_to_hz(audio.hz_to_mel(hz)), hz, rtol=1e-9)


def test_filterbank_shape_and_coverage():
    fb = audio.mel_filterbank(26, 512, 16000)
    assert fb.shape == (26, 257)
    # every filter has nonzero mass; adjacent filters overlap
    assert (fb.sum(axis=1) > 0).all()


def test_fbank_sine_peak_in_right_filter(rng):
    rate, freq = 16000, 1000.0
    t = np.arange(rate) / rate
    sig = np.sin(2 * np.pi * freq * t)
    feat, energy = audio.fbank_features(sig, rate, nfilt=26)
    # peak filter should be the one whose center is nearest 1 kHz
    fb = audio.mel_filterbank(26, 512, rate)
    freqs = np.fft.rfftfreq(512, 1 / rate)
    centers = (fb * freqs).sum(axis=1) / fb.sum(axis=1)
    expected = int(np.argmin(np.abs(centers - freq)))
    got = int(np.argmax(feat.mean(axis=0)))
    assert abs(got - expected) <= 1
    assert (energy > 0).all()


def test_mfcc_c0_is_log_energy(rng):
    sig = rng.normal(size=4000)
    rate = 16000
    feats = audio.mfcc_chain(sig, rate, num_cepstral_coeffs=13)
    _, energy = audio.fbank_features(sig, rate)
    np.testing.assert_allclose(feats[:, 0], np.log(energy), rtol=1e-9)


def test_log_mels_mode_appends_energy(rng):
    sig = rng.normal(size=4000)
    feats = audio.mfcc_chain(
        sig, 16000, num_mel_features=26, USE_LOG_MELS=True
    )
    assert feats.shape[1] == 27
    fb_feat, energy = audio.fbank_features(sig, 16000, nfilt=26)
    np.testing.assert_allclose(feats[:, -1], np.log(energy), rtol=1e-9)
    np.testing.assert_allclose(feats[:, :26], np.log(fb_feat), rtol=1e-9)


def test_lifter_formula():
    ceps = np.ones((2, 5))
    out = audio.lifter(ceps, L=22)
    n = np.arange(5)
    np.testing.assert_allclose(out[0], 1 + 11 * np.sin(np.pi * n / 22))


def test_dct_matches_scipy_ortho(rng):
    x = rng.normal(size=(3, 26))
    ours = dct(x, type=2, axis=1, norm="ortho")
    assert ours.shape == (3, 26)


def test_deltas_constant_signal_zero():
    feat = np.tile(np.array([[1.0, 2.0, 3.0]]), (10, 1))
    deltas = audio.delta_features(feat, N=2)
    np.testing.assert_allclose(deltas, 0.0, atol=1e-12)


def test_deltas_linear_ramp_slope():
    feat = np.arange(20, dtype=float).reshape(20, 1)
    deltas = audio.delta_features(feat, N=2)
    # interior frames: slope exactly 1
    np.testing.assert_allclose(deltas[4:-4, 0], 1.0, atol=1e-12)


def test_num_feature_accounting():
    assert audio.num_mfcc_features(26, 13) == 13
    assert audio.num_mfcc_features(26, 13, USE_LOG_MELS=True) == 27
    assert audio.num_mfcc_features(26, 13, USE_MFCC_DELTAS=True) == 26
    assert (
        audio.num_mfcc_features(26, 0, USE_LOG_MELS=True, USE_MFCC_DELTAS=True)
        == 54
    )


def test_empty_audio_fallback():
    out = audio.empty_mfcc_features(13)
    assert out.shape == (0, 13)


# ---------------------------------------------------------------------------
# python_speech_features numeric parity (VERDICT #3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("USE_LOG_MELS", [False, True])
@pytest.mark.parametrize("USE_MFCC_DELTAS", [False, True])
def test_mfcc_parity_vs_psf_oracle(rng, USE_LOG_MELS, USE_MFCC_DELTAS):
    """audio.mfcc_chain matches the python_speech_features composition
    exactly, for all four reference mode combinations."""
    sig = rng.normal(size=9000) + np.sin(
        2 * np.pi * 700 * np.arange(9000) / 16000
    )
    for rate, winlen, winstep in (
        (16000.0, 0.02, 1 / 200.0),  # the reference configuration
        (12500.0, 0.025, 0.01),  # winlen·rate = 312.5: rounding edge
    ):
        ours = audio.mfcc_chain(
            sig, rate, winlen=winlen, winstep=winstep,
            USE_LOG_MELS=USE_LOG_MELS, USE_MFCC_DELTAS=USE_MFCC_DELTAS,
        )
        theirs = reference_mfcc_chain(
            sig, rate, winlen=winlen, winstep=winstep,
            USE_LOG_MELS=USE_LOG_MELS, USE_MFCC_DELTAS=USE_MFCC_DELTAS,
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-10)


def test_mfcc_parity_vs_committed_goldens():
    """Golden .npz fixtures pin the numbers independent of the oracle
    code, including a sub-frame signal and the .5-rounding edge."""
    z = np.load(GOLDENS)
    for name in ("ref16k", "edge12500", "short"):
        sig = z[f"{name}_signal"]
        rate, winlen, winstep = z[f"{name}_meta"]
        for lm in (0, 1):
            for dl in (0, 1):
                ours = audio.mfcc_chain(
                    sig, rate, winlen=winlen, winstep=winstep,
                    USE_LOG_MELS=bool(lm), USE_MFCC_DELTAS=bool(dl),
                )
                np.testing.assert_allclose(
                    ours, z[f"{name}_lm{lm}_dl{dl}"], rtol=1e-9, atol=1e-10,
                    err_msg=f"{name} lm={lm} dl={dl}",
                )
