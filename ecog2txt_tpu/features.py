"""Raw-voltage → high-gamma analytic-amplitude featurization.

The reference delegates feature extraction to lab-private
``DataGenerator`` subclasses — trials arrive with ``ecog_sequence``
already featurized (reference data_generators.py:487-530 is a 3-method
dummy seam; README.md:59-66).  This module builds the missing front
end as a fused, jittable XLA chain so raw recordings stream straight
to HBM (BASELINE.json north star):

    notch (line harmonics) → log-spaced Gaussian band-pass bank over
    the high-gamma range → Hilbert analytic amplitude (FFT method,
    exactly ``scipy.signal.hilbert``'s definition) → band average →
    z-score → anti-aliased decimation to the manifest sampling rate

Design notes (TPU-first):

* Everything after the host→device upload is ONE jitted program: the
  band loop is unrolled over ≤ ``num_bands`` FFT·mask·iFFT·abs chains
  that XLA fuses around a shared forward FFT, and decimation is a
  strided depthwise convolution (MXU-friendly, no gather).
* All masks/taps are built with numpy at trace time from static
  shapes, so they constant-fold into the executable.
* Filtering runs in the frequency domain (the notch needs ~Hz-scale
  resolution → second-scale FIR impulse responses; one FFT is far
  cheaper and is also what the Hilbert transform wants anyway).
  Trials are reflect-padded by ``pad_seconds`` so circular wraparound
  never reaches valid samples, then zero-padded to a 5-smooth FFT
  length.
* Streaming uses the same chain over overlapped windows
  (:class:`StreamingHighGamma`): margins of ``pad_seconds`` on both
  sides make emitted frames match the offline output to float
  tolerance while keeping ONE compiled window program.

Oracle: tests/test_features.py checks the per-band envelope against
``scipy.signal.hilbert`` of the identically-filtered signal, the
z-score against ``scipy.stats.zscore``, and the decimator against
``np.convolve`` + stride (plus a loose ``scipy.signal.decimate``
cross-check).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field, replace
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# configuration
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class HighGammaConfig:
    """Static featurization spec (hashable → usable as a jit static).

    ``raw_rate`` must be an integer multiple of ``out_rate`` (the
    manifest's ``sampling_rate``); the decimation factor is
    ``raw_rate // out_rate``.
    """

    raw_rate: float  # input sample rate (Hz)
    out_rate: float  # output feature rate (Hz) — manifest sampling_rate
    band: tuple[float, float] = (70.0, 150.0)  # high-gamma range
    num_bands: int = 8  # log-spaced Gaussian sub-bands
    band_sigma_scale: float = 0.10  # Gaussian σ = scale · center freq
    notch_freqs: tuple[float, ...] = (60.0, 120.0, 180.0)
    notch_sigma: float = 1.5  # Hz — Gaussian band-stop width
    pad_seconds: float = 0.5  # reflect margin (≥ notch impulse length)
    zscore: str = "trial"  # 'trial' | 'none' (block: see ArrayDataGenerator)
    input_scale: float = 1.0  # volts per int16 LSB when raw is integer

    def __post_init__(self):
        q = self.raw_rate / self.out_rate
        if abs(q - round(q)) > 1e-9 or round(q) < 1:
            raise ValueError(
                f"raw_rate {self.raw_rate} must be an integer multiple of "
                f"out_rate {self.out_rate}"
            )
        if self.band[1] >= self.raw_rate / 2:
            raise ValueError(
                f"band top {self.band[1]} Hz needs raw_rate > "
                f"{2 * self.band[1]} Hz"
            )
        if self.zscore not in ("trial", "none"):
            raise ValueError(f"zscore must be 'trial' or 'none': {self.zscore}")

    @property
    def decimation(self) -> int:
        return int(round(self.raw_rate / self.out_rate))

    @property
    def pad_samples(self) -> int:
        return int(round(self.pad_seconds * self.raw_rate))

    @property
    def center_freqs(self) -> np.ndarray:
        lo, hi = self.band
        return np.geomspace(lo, hi, self.num_bands)


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth integer ≥ n (scipy.fft.next_fast_len spirit) —
    keeps the XLA FFT on friendly radix-2/3/5 sizes."""
    if n <= 6:
        return n
    best = 1 << (n - 1).bit_length()  # pow2 fallback is always valid
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            # smallest power of two lifting f35 over n
            x = f35
            while x < n:
                x *= 2
            best = min(best, x)
            f35 *= 3
        f5 *= 5
    return best


# --------------------------------------------------------------------------
# masks (host-side numpy, constant-folded under jit)
# --------------------------------------------------------------------------


def _notch_response(freqs: np.ndarray, cfg: HighGammaConfig) -> np.ndarray:
    """Gaussian band-stop at each line harmonic: ∏ (1 − e^(−Δf²/2σ²))."""
    resp = np.ones_like(freqs)
    for f0 in cfg.notch_freqs:
        resp *= 1.0 - np.exp(-((freqs - f0) ** 2) / (2.0 * cfg.notch_sigma**2))
    return resp


def _band_responses(freqs: np.ndarray, cfg: HighGammaConfig) -> np.ndarray:
    """(num_bands, F) Gaussian magnitude responses, log-spaced centers."""
    cfs = cfg.center_freqs
    sds = cfg.band_sigma_scale * cfs
    return np.exp(
        -((freqs[None, :] - cfs[:, None]) ** 2) / (2.0 * sds[:, None] ** 2)
    )


def _analytic_band_masks(n_fft: int, cfg: HighGammaConfig) -> np.ndarray:
    """(num_bands, n_fft) complex64 masks: full-spectrum Gaussian band ×
    notch × the analytic-signal mask (2 on positive freqs, 1 at DC and
    Nyquist, 0 on negative freqs — ``scipy.signal.hilbert``'s h)."""
    freqs = np.fft.fftfreq(n_fft, d=1.0 / cfg.raw_rate)
    mag = _band_responses(np.abs(freqs), cfg) * _notch_response(
        np.abs(freqs), cfg
    )
    h = np.zeros(n_fft)
    h[0] = 1.0
    if n_fft % 2 == 0:
        h[n_fft // 2] = 1.0
        h[1 : n_fft // 2] = 2.0
    else:
        h[1 : (n_fft + 1) // 2] = 2.0
    return (mag * h[None, :]).astype(np.complex64)


def _decimation_taps(q: int) -> np.ndarray:
    """Anti-alias FIR low-pass for ↓q (scipy.signal.decimate's default
    FIR design: 20·q+1 Hamming taps, cutoff 1/q of Nyquist)."""
    if q == 1:
        return np.ones(1, np.float32)
    from scipy.signal import firwin

    return firwin(20 * q + 1, 1.0 / q, window="hamming").astype(np.float32)


# --------------------------------------------------------------------------
# the jittable chain
# --------------------------------------------------------------------------


def band_envelopes(x: jax.Array, cfg: HighGammaConfig) -> jax.Array:
    """Mean analytic amplitude over the band bank, at the raw rate.

    ``x``: (T, C) float raw voltages, already margin-padded by the
    caller if edge effects matter.  Returns (T, C) float32.
    """
    T = x.shape[0]
    n_fft = _next_fast_len(T)
    masks = _analytic_band_masks(n_fft, cfg)  # (B, n_fft) np constant
    X = jnp.fft.fft(x.astype(jnp.float32), n=n_fft, axis=0)  # (n_fft, C)
    acc = jnp.zeros((T, x.shape[1]), jnp.float32)
    for b in range(cfg.num_bands):
        z = jnp.fft.ifft(X * jnp.asarray(masks[b])[:, None], axis=0)
        acc = acc + jnp.abs(z[:T])
    return acc / cfg.num_bands


def decimate_envelope(hg: jax.Array, cfg: HighGammaConfig) -> jax.Array:
    """Anti-aliased ↓q via a strided depthwise conv.  Output frame i is
    ``np.convolve(hg[:, c], taps, 'same')[i·q]`` exactly (symmetric
    taps).  (T, C) → (T//q, C)."""
    q = cfg.decimation
    if q == 1:
        return hg
    taps = _decimation_taps(q)
    K = len(taps)  # odd
    T, C = hg.shape
    T_out = T // q
    # conv_general_dilated: channels as batch, explicit SAME-style pad
    # chosen so output i sits at input i·q with the kernel centered
    lhs = hg.T[:, None, :]  # (C, 1, T)
    rhs = jnp.asarray(taps[::-1].copy())[None, None, :]  # correlation→conv
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(q,),
        padding=[(K // 2, K // 2)],
    )  # (C, 1, ceil-ish)
    return out[:, 0, :T_out].T


def extract_high_gamma(
    raw: jax.Array, cfg: HighGammaConfig
) -> jax.Array:
    """The full chain on one trial: (T_raw, C) raw voltages (float or
    int16) → (T_raw//q, C) float32 high-gamma features.

    Jittable with static shapes; reflect-pads ``pad_samples`` on both
    sides so the circular FFT filtering never contaminates valid
    samples (the notch's effective impulse response is the longest at
    ~4/(2π·notch_sigma) s).
    """
    if jnp.issubdtype(raw.dtype, jnp.integer):
        raw = raw.astype(jnp.float32) * cfg.input_scale
    raw = raw.astype(jnp.float32)
    T = raw.shape[0]
    q = cfg.decimation
    # margin must be a whole number of decimation hops so the margin
    # envelope provides CONTEXT for the decimation FIR (20q+1 taps)
    # instead of a zero-pad transient at the trial edges
    P = min(-(-cfg.pad_samples // q) * q, ((T - 1) // q) * q)
    padded = jnp.pad(raw, ((P, P), (0, 0)), mode="reflect")
    hg = band_envelopes(padded, cfg)
    feats = decimate_envelope(hg, cfg)[P // q : P // q + T // q]
    if cfg.zscore == "trial":
        mu = jnp.mean(feats, axis=0, keepdims=True)
        sd = jnp.std(feats, axis=0, keepdims=True)
        feats = (feats - mu) / jnp.maximum(sd, 1e-6)
    return feats


@functools.lru_cache(maxsize=8)
def _chain_jit(cfg: HighGammaConfig):
    """One jitted chain per config (cfg is frozen → hashable); jax
    retraces per input shape, so ragged trial lengths share the cache
    entry but compile per unique (T, C)."""
    return jax.jit(lambda raw: extract_high_gamma(raw, cfg))


def extract_high_gamma_np(raw: np.ndarray, cfg: HighGammaConfig) -> np.ndarray:
    """Host front door for the offline chain: numpy (T_raw, C) raw
    voltages (float or integer — integer is scaled by
    ``cfg.input_scale``) → numpy (T_raw//q, C) float32 features.  Used
    by :class:`datagen.ArrayDataGenerator` for trial files carrying
    ``raw`` instead of pre-featurized ``ecog``."""
    return np.asarray(_chain_jit(cfg)(jnp.asarray(raw)))


def calibrate_high_gamma(
    raws: Sequence[np.ndarray], cfg: HighGammaConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel (mean, std) of the UN-normalized chain output over
    calibration recordings — the ``stats`` argument for
    :class:`StreamingHighGamma` (block/session z-scoring happens
    outside the device chain; per-trial stats do not exist
    mid-stream)."""
    cfg_raw = replace(cfg, zscore="none")
    n, s, ss = 0, None, None
    for raw in raws:
        f = extract_high_gamma_np(np.asarray(raw), cfg_raw)
        if s is None:
            s = f.sum(0, dtype=np.float64)
            ss = (f.astype(np.float64) ** 2).sum(0)
        else:
            s += f.sum(0, dtype=np.float64)
            ss += (f.astype(np.float64) ** 2).sum(0)
        n += len(f)
    if not n:
        raise ValueError("calibrate_high_gamma needs at least one frame")
    mu = s / n
    var = np.maximum(ss / n - mu**2, 0.0)
    return mu.astype(np.float32), np.sqrt(var).astype(np.float32)


# --------------------------------------------------------------------------
# streaming (overlap-save windows over the same chain)
# --------------------------------------------------------------------------


class StreamingHighGamma:
    """Streaming front end: push raw-sample chunks (any ragged length),
    receive feature frames that match :func:`extract_high_gamma`
    (zscore='none') on the whole signal to float tolerance.

    One window program is compiled: ``window`` raw samples plus a
    ``pad_samples`` margin on each side (past samples are real history;
    the first window reflect-pads, exactly like offline).  Emission
    lags the stream by ``pad_samples`` — the price of the notch's
    impulse response, identical to the offline margin.

    ``stats``: optional (mean, std) arrays (C,) from calibration —
    applied to emitted frames (block/session z-scoring lives outside
    the device chain, mirroring ArrayDataGenerator's block mode).
    """

    def __init__(
        self,
        cfg: HighGammaConfig,
        num_channels: int,
        window_seconds: float = 2.0,
        stats: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        if cfg.zscore != "none":
            raise ValueError(
                "streaming featurization needs zscore='none' (pass "
                "calibration stats instead — per-trial stats do not "
                "exist mid-stream)"
            )
        self.cfg = cfg
        self.C = int(num_channels)
        q = cfg.decimation
        W = int(round(window_seconds * cfg.raw_rate))
        self.window = max(q, (W // q) * q)  # multiple of q
        self.margin = -(-cfg.pad_samples // q) * q  # multiple of q
        self.stats = None
        if stats is not None:
            mu, sd = stats
            self.stats = (
                np.asarray(mu, np.float32).reshape(1, -1),
                np.maximum(np.asarray(sd, np.float32).reshape(1, -1), 1e-6),
            )
        if self.window < self.margin:
            raise ValueError(
                f"window ({self.window} samples) must be ≥ the margin "
                f"({self.margin}); raise window_seconds or lower "
                "pad_seconds"
            )
        self._jit = jax.jit(self._window_chain)
        # buffer layout: [margin history (already emitted)] + [pending];
        # before the first emission there is no history (reflection
        # stands in for it, exactly like the offline reflect pad)
        self._buf = np.zeros((0, self.C), np.float32)
        self._emitted_any = False

    def _window_chain(self, seg: jax.Array) -> jax.Array:
        """(margin + window + margin, C) raw → (window//q, C) frames.
        Decimation runs over the whole segment so the margins provide
        FIR context (exactly like the offline chain)."""
        q = self.cfg.decimation
        hg = band_envelopes(seg, self.cfg)
        feats = decimate_envelope(hg, self.cfg)
        return feats[self.margin // q : (self.margin + self.window) // q]

    def _to_float(self, chunk: np.ndarray) -> np.ndarray:
        chunk = np.asarray(chunk)
        if np.issubdtype(chunk.dtype, np.integer):
            chunk = chunk.astype(np.float32) * self.cfg.input_scale
        return chunk.astype(np.float32).reshape(-1, self.C)

    def _emit(self, seg: np.ndarray) -> np.ndarray:
        out = np.asarray(self._jit(jnp.asarray(seg)))
        if self.stats is not None:
            out = (out - self.stats[0]) / self.stats[1]
        return out

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Append raw samples; return newly available feature frames
        ((0, C) when the buffer hasn't filled a window yet)."""
        self._buf = np.concatenate([self._buf, self._to_float(chunk)])
        outs = []
        M, W = self.margin, self.window
        while True:
            if not self._emitted_any:
                # left margin is a reflection (offline parity); need
                # window + right margin of real samples
                if len(self._buf) < W + M:
                    break
                seg = np.concatenate(
                    [self._buf[1 : M + 1][::-1], self._buf[: W + M]]
                )
                outs.append(self._emit(seg))
                # retain the last M samples of the window as history
                self._buf = self._buf[W - M :]
                self._emitted_any = True
            else:
                # buffer = [M history][pending...]
                if len(self._buf) < M + W + M:
                    break
                outs.append(self._emit(self._buf[: M + W + M]))
                self._buf = self._buf[W:]
        return (
            np.concatenate(outs)
            if outs
            else np.zeros((0, self.C), np.float32)
        )

    def flush(self, reset: bool = True) -> np.ndarray:
        """Featurize the remaining tail with a reflected right margin
        (offline parity); trailing samples short of one decimation
        hop are dropped.  Resets the stream unless ``reset=False``
        (a speculative peek — serving decodes mid-utterance without
        disturbing the live stream)."""
        M, q = self.margin, self.cfg.decimation
        start = M if self._emitted_any else 0
        tail = len(self._buf) - start
        tail_q = (tail // q) * q
        if tail_q <= 0:
            if reset:
                self._buf = np.zeros((0, self.C), np.float32)
                self._emitted_any = False
            return np.zeros((0, self.C), np.float32)
        seg = self._buf
        if not self._emitted_any:
            # a short stream may not fill the margin — shrink it
            # (q-multiple), exactly like the offline P = min(...) clamp
            M = min(M, ((len(seg) - 1) // q) * q)
            seg = np.concatenate([seg[1 : M + 1][::-1], seg])
        mr = min(len(seg) - 1, self.margin)
        seg = np.concatenate([seg, seg[-2 : -mr - 2 : -1]])  # right reflect
        hg = band_envelopes(jnp.asarray(seg), self.cfg)
        feats = np.asarray(decimate_envelope(hg, self.cfg))
        out = feats[M // q : M // q + tail_q // q]
        if self.stats is not None:
            out = (out - self.stats[0]) / self.stats[1]
        if reset:
            self._buf = np.zeros((0, self.C), np.float32)
            self._emitted_any = False
        return out


# --------------------------------------------------------------------------
# synthetic raw voltage (tests / demos / bench)
# --------------------------------------------------------------------------


def synthesize_raw_from_envelope(
    envelope: np.ndarray,
    cfg: HighGammaConfig,
    rng: np.random.Generator,
    line_amp: float = 0.5,
    background: float = 0.05,
) -> np.ndarray:
    """Turn a (T_out, C) nonnegative envelope (feature-rate, e.g. a
    SyntheticDataGenerator word-pattern trial) into (T_out·q, C) raw
    voltage whose high-gamma analytic amplitude tracks it:

        raw = upsample(envelope) · bandnoise(70–150 Hz)
              + line_amp · (60 Hz + harmonics) + background · noise

    so :func:`extract_high_gamma` approximately recovers ``envelope``
    (up to the bank's gain), which is what makes the raw e2e trainable
    to the same WER as the featurized corpus.
    """
    q = cfg.decimation
    T_out, C = envelope.shape
    T = T_out * q
    t = np.arange(T) / cfg.raw_rate
    # zero-order-hold + light smoothing upsample of the envelope
    env = np.repeat(envelope, q, axis=0)
    # band-limited carrier: white noise filtered to the high-gamma band
    white = rng.standard_normal((T, C)).astype(np.float32)
    X = np.fft.rfft(white, axis=0)
    freqs = np.fft.rfftfreq(T, d=1.0 / cfg.raw_rate)
    lo, hi = cfg.band
    mask = ((freqs >= lo) & (freqs <= hi)).astype(np.float32)
    carrier = np.fft.irfft(X * mask[:, None], n=T, axis=0)
    # normalize the carrier's analytic amplitude to ~1 so the envelope
    # scale carries through the chain
    carrier /= np.maximum(np.std(carrier, axis=0, keepdims=True), 1e-9)
    carrier *= np.sqrt(2.0) / 2.0  # |analytic| of unit-σ narrowband ≈ σ·√(π/2)
    line = sum(
        np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
        for f0 in cfg.notch_freqs
        if f0 < cfg.raw_rate / 2
    )
    raw = (
        env * carrier
        + line_amp * np.asarray(line)[:, None]
        + background * rng.standard_normal((T, C))
    )
    return raw.astype(np.float32)
