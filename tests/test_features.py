"""Raw-voltage → high-gamma featurization (VERDICT r4 missing #1 /
north-star clause): scipy oracles for every stage, envelope recovery,
and streaming ≡ offline.

Reference seam: /root/reference/ecog2txt/data_generators.py:487-530
(trials arrive pre-featurized; the chain itself is lab-private)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecog2txt_tpu.features import (
    HighGammaConfig,
    StreamingHighGamma,
    _analytic_band_masks,
    _decimation_taps,
    _next_fast_len,
    band_envelopes,
    decimate_envelope,
    extract_high_gamma,
    synthesize_raw_from_envelope,
)

CFG = HighGammaConfig(raw_rate=1000.0, out_rate=100.0, zscore="none")


def _raw(T=4000, C=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((T, C)).astype(np.float32)


def test_next_fast_len_is_minimal_5smooth():
    """Ours targets 5-smooth sizes (XLA's friendly radices; scipy's
    next_fast_len also admits 7/11) — check minimality by brute force."""

    def smooth5(m):
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        return m == 1

    for n in [1, 7, 13, 100, 1000, 1023, 1024, 1025, 4001, 48000, 59049]:
        got = _next_fast_len(n)
        assert got >= n and smooth5(got), (n, got)
        brute = n
        while not smooth5(brute):
            brute += 1
        assert got == brute, (n, got, brute)


def test_band_envelope_matches_scipy_hilbert():
    """Per-band analytic amplitude == |scipy.signal.hilbert| of the
    identically FFT-filtered signal (the oracle uses scipy's Hilbert,
    ours is the mask algebra — same math, independent code path)."""
    from scipy.signal import hilbert

    x = _raw(T=2000, C=3)
    T = len(x)
    n_fft = _next_fast_len(T)
    masks = _analytic_band_masks(n_fft, CFG)  # (B, n_fft)

    # ours: full chain, then compare band-by-band via a 1-band config
    for b in [0, CFG.num_bands - 1]:
        one = HighGammaConfig(
            raw_rate=CFG.raw_rate, out_rate=CFG.out_rate, zscore="none",
            num_bands=1,
            band=(CFG.center_freqs[b], CFG.center_freqs[b] + 1e-9),
        )
        got = np.asarray(band_envelopes(jnp.asarray(x), one))

        # oracle: real-filter with the same magnitude response, then
        # scipy.signal.hilbert for the analytic amplitude
        one_masks = _analytic_band_masks(_next_fast_len(T), one)
        mag = np.abs(one_masks[0]).copy()
        # strip the analytic doubling to recover the REAL filter
        h = np.zeros(len(mag))
        h[0] = 1.0
        nf = len(mag)
        if nf % 2 == 0:
            h[nf // 2] = 1.0
            h[1 : nf // 2] = 2.0
        else:
            h[1 : (nf + 1) // 2] = 2.0
        real_mag = np.where(h > 0, mag / np.maximum(h, 1e-30), 0.0)
        # real filter: symmetric magnitude response applied via FFT
        X = np.fft.fft(x, n=nf, axis=0)
        sym = real_mag + np.roll(real_mag[::-1], 1)  # mirror to neg freqs
        sym[0] = real_mag[0]
        if nf % 2 == 0:
            sym[nf // 2] = real_mag[nf // 2]
        filt = np.real(np.fft.ifft(X * sym[:, None], axis=0))[:T]
        want = np.abs(hilbert(filt, N=nf, axis=0))[:T]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_notch_suppresses_line_noise():
    """60/120 Hz line noise leaks into the band envelope without the
    notch; with it, the leak is >20 dB down."""
    T = 4000
    t = np.arange(T) / CFG.raw_rate
    line = (
        np.sin(2 * np.pi * 60.0 * t) + np.sin(2 * np.pi * 120.0 * t)
    ).astype(np.float32)[:, None]
    cfg_notch = CFG
    cfg_open = HighGammaConfig(
        raw_rate=CFG.raw_rate, out_rate=CFG.out_rate, zscore="none",
        notch_freqs=(),
    )
    env_notch = np.asarray(band_envelopes(jnp.asarray(line), cfg_notch))
    env_open = np.asarray(band_envelopes(jnp.asarray(line), cfg_open))
    interior = slice(500, -500)
    ratio = env_notch[interior].mean() / env_open[interior].mean()
    assert ratio < 0.1, f"notch only attenuated to {ratio:.3f}"


def test_decimate_matches_numpy_convolve():
    q = CFG.decimation
    taps = _decimation_taps(q)
    hg = np.abs(_raw(T=3000, C=2, seed=1))
    got = np.asarray(decimate_envelope(jnp.asarray(hg), CFG))
    want = np.stack(
        [np.convolve(hg[:, c], taps, "same")[:: q] for c in range(2)],
        axis=1,
    )[: len(got)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_decimate_close_to_scipy_decimate():
    """Loose cross-check against scipy.signal.decimate (FIR mode) —
    same taps, different phase convention, so compare the interiors
    after alignment."""
    from scipy.signal import decimate

    q = CFG.decimation
    rng = np.random.default_rng(2)
    # smooth envelope-like signal: decimation should be benign
    sig = np.cumsum(rng.standard_normal(3000)).astype(np.float32)
    sig = np.abs(sig) / 100.0
    got = np.asarray(
        decimate_envelope(jnp.asarray(sig[:, None]), CFG)
    )[:, 0]
    want = decimate(sig, q, ftype="fir", zero_phase=True)[: len(got)]
    inner = slice(5, -5)
    np.testing.assert_allclose(got[inner], want[inner], rtol=0.02, atol=0.02)


def test_zscore_matches_scipy():
    from scipy import stats

    cfg = HighGammaConfig(raw_rate=1000.0, out_rate=100.0, zscore="trial")
    x = _raw(T=2000, C=3, seed=3)
    got = np.asarray(extract_high_gamma(jnp.asarray(x), cfg))
    cfg0 = HighGammaConfig(raw_rate=1000.0, out_rate=100.0, zscore="none")
    raw_feats = np.asarray(extract_high_gamma(jnp.asarray(x), cfg0))
    want = stats.zscore(raw_feats, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_recovers_known_envelope():
    """The full chain recovers a synthesized trial's envelope: high
    correlation per channel, despite line noise and background."""
    rng = np.random.default_rng(4)
    T_out, C = 200, 4
    t = np.arange(T_out)[:, None] / 50.0
    envelope = (
        1.0 + np.sin(2 * np.pi * 0.5 * t + np.arange(C)[None, :])
    ).astype(np.float32) * 0.5 + 0.2
    raw = synthesize_raw_from_envelope(envelope, CFG, rng)
    feats = np.asarray(extract_high_gamma(jnp.asarray(raw), CFG))
    assert feats.shape == (T_out, C)
    # the envelope of narrowband noise is Rayleigh-distributed around
    # the true amplitude (std/mean ≈ 0.52 per band; measured: the line
    # noise and background contribute NOTHING — the notch kills them —
    # estimation variance is the whole gap) — smooth 110 ms before
    # correlating, as labs do
    k = np.ones(11) / 11.0
    for c in range(C):
        sm = np.convolve(feats[:, c], k, "same")
        r = np.corrcoef(sm[15:-15], envelope[15:-15, c])[0, 1]
        assert r > 0.9, f"channel {c}: corr {r:.3f}"


def test_extract_accepts_int16():
    x = _raw(T=1000, C=2, seed=5)
    xi = np.clip(x * 1000, -32768, 32767).astype(np.int16)
    cfg = HighGammaConfig(
        raw_rate=1000.0, out_rate=100.0, zscore="none",
        input_scale=1.0 / 1000.0,
    )
    got = np.asarray(extract_high_gamma(jnp.asarray(xi), cfg))
    want = np.asarray(
        extract_high_gamma(jnp.asarray(xi.astype(np.float32) / 1000.0), cfg)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_extract_is_jittable():
    x = jnp.asarray(_raw(T=1000, C=2))
    f = jax.jit(extract_high_gamma, static_argnums=1)
    out = f(x, CFG)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(extract_high_gamma(x, CFG)),
        rtol=1e-5, atol=1e-6,
    )


def test_streaming_matches_offline():
    """Ragged pushes through StreamingHighGamma reproduce the offline
    chain (zscore='none') on every emitted frame."""
    rng = np.random.default_rng(6)
    T, C = 6000, 3
    raw = _raw(T=T, C=C, seed=6)
    offline = np.asarray(extract_high_gamma(jnp.asarray(raw), CFG))

    stream = StreamingHighGamma(CFG, C, window_seconds=1.0)
    outs = []
    pos = 0
    while pos < T:
        n = int(rng.integers(50, 700))
        outs.append(stream.push(raw[pos : pos + n]))
        pos += n
    outs.append(stream.flush())
    got = np.concatenate(outs)
    assert got.shape == offline.shape
    scale = np.abs(offline).mean()
    np.testing.assert_allclose(got, offline, rtol=5e-3, atol=5e-3 * scale)


def test_streaming_applies_calibration_stats():
    raw = _raw(T=2000, C=2, seed=7)
    mu = np.array([0.1, 0.2], np.float32)
    sd = np.array([0.5, 0.25], np.float32)
    plain = StreamingHighGamma(CFG, 2, window_seconds=1.0)
    calib = StreamingHighGamma(CFG, 2, window_seconds=1.0, stats=(mu, sd))
    a = np.concatenate([plain.push(raw), plain.flush()])
    b = np.concatenate([calib.push(raw), calib.flush()])
    np.testing.assert_allclose(b, (a - mu) / sd, rtol=1e-5, atol=1e-6)


def test_config_validation():
    with pytest.raises(ValueError, match="integer multiple"):
        HighGammaConfig(raw_rate=1000.0, out_rate=300.0)
    with pytest.raises(ValueError, match="raw_rate"):
        HighGammaConfig(raw_rate=200.0, out_rate=100.0)
    with pytest.raises(ValueError, match="zscore"):
        HighGammaConfig(raw_rate=1000.0, out_rate=100.0, zscore="block")
