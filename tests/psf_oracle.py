"""Test oracle: faithful reimplementation of the ``python_speech_features``
algorithms (James Lyons, MIT license — the package the reference calls at
data_generators.py:328-380 but which is not installed in this image).

This module exists ONLY to generate/verify golden MFCC fixtures for
tests/test_audio.py: it follows the published psf base.py/sigproc.py
algorithms step by step (round-half-up frame sizing, ceil frame count,
1/NFFT power spectrum, floor'd mel bin edges, sinusoidal lifter,
appendEnergy c0 replacement, ±N edge-padded deltas) so that
ecog2txt_tpu.audio — an independent implementation from the DSP
definitions — can be checked for NUMERIC parity with the reference
toolchain without network access.

Do not import this from library code.
"""

import decimal
import math

import numpy as np
from scipy.fftpack import dct


def round_half_up(number):
    return int(
        decimal.Decimal(number).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
        )
    )


def preemphasis(signal, coeff=0.95):
    return np.append(signal[0], signal[1:] - coeff * signal[:-1])


def framesig(sig, frame_len, frame_step, winfunc=lambda x: np.ones((x,))):
    slen = len(sig)
    frame_len = int(round_half_up(frame_len))
    frame_step = int(round_half_up(frame_step))
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = int((numframes - 1) * frame_step + frame_len)
    padsignal = np.concatenate((sig, np.zeros((padlen - slen,))))
    indices = (
        np.tile(np.arange(0, frame_len), (numframes, 1))
        + np.tile(
            np.arange(0, numframes * frame_step, frame_step), (frame_len, 1)
        ).T
    )
    frames = padsignal[indices.astype(np.int32)]
    win = np.tile(winfunc(frame_len), (numframes, 1))
    return frames * win


def magspec(frames, NFFT):
    return np.absolute(np.fft.rfft(frames, NFFT))


def powspec(frames, NFFT):
    return 1.0 / NFFT * np.square(magspec(frames, NFFT))


def hz2mel(hz):
    return 2595 * np.log10(1 + hz / 700.0)


def mel2hz(mel):
    return 700 * (10 ** (mel / 2595.0) - 1)


def get_filterbanks(
    nfilt=20, nfft=512, samplerate=16000, lowfreq=0, highfreq=None
):
    highfreq = highfreq or samplerate / 2
    melpoints = np.linspace(hz2mel(lowfreq), hz2mel(highfreq), nfilt + 2)
    bin = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate)
    fbank = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(0, nfilt):
        for i in range(int(bin[j]), int(bin[j + 1])):
            fbank[j, i] = (i - bin[j]) / (bin[j + 1] - bin[j])
        for i in range(int(bin[j + 1]), int(bin[j + 2])):
            fbank[j, i] = (bin[j + 2] - i) / (bin[j + 2] - bin[j + 1])
    return fbank


def fbank(
    signal,
    samplerate=16000,
    winlen=0.025,
    winstep=0.01,
    nfilt=26,
    nfft=512,
    lowfreq=0,
    highfreq=None,
    preemph=0.97,
    winfunc=lambda x: np.ones((x,)),
):
    highfreq = highfreq or samplerate / 2
    signal = preemphasis(signal, preemph)
    frames = framesig(
        signal, winlen * samplerate, winstep * samplerate, winfunc
    )
    pspec = powspec(frames, nfft)
    energy = np.sum(pspec, 1)
    energy = np.where(energy == 0, np.finfo(float).eps, energy)
    fb = get_filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq)
    feat = np.dot(pspec, fb.T)
    feat = np.where(feat == 0, np.finfo(float).eps, feat)
    return feat, energy


def lifter(cepstra, L=22):
    if L > 0:
        _, ncoeff = np.shape(cepstra)
        n = np.arange(ncoeff)
        lift = 1 + (L / 2.0) * np.sin(np.pi * n / L)
        return lift * cepstra
    return cepstra


def delta(feat, N):
    if N < 1:
        raise ValueError("N must be an integer >= 1")
    NUMFRAMES = len(feat)
    denominator = 2 * sum([i ** 2 for i in range(1, N + 1)])
    delta_feat = np.empty_like(feat)
    padded = np.pad(feat, ((N, N), (0, 0)), mode="edge")
    for t in range(NUMFRAMES):
        delta_feat[t] = (
            np.dot(np.arange(-N, N + 1), padded[t : t + 2 * N + 1])
            / denominator
        )
    return delta_feat


def reference_mfcc_chain(
    signal,
    samplerate,
    winlen=0.02,
    winstep=0.005,
    num_mel_features=26,
    num_cepstral_coeffs=13,
    USE_LOG_MELS=False,
    USE_MFCC_DELTAS=False,
    nfft=512,
    preemph=0.97,
    ceplifter=22,
):
    """The reference's _get_MFCC_features composition (reference
    data_generators.py:328-380) expressed through the psf oracle:
    rectangular-window fbank → log → log-mels + log-energy OR
    DCT-II(ortho) → keep numcep → lifter → c0 := log-energy; optional
    ±2-frame deltas concatenated."""
    feat, energy = fbank(
        signal,
        samplerate=samplerate,
        winlen=winlen,
        winstep=winstep,
        nfilt=num_mel_features,
        nfft=nfft,
        preemph=preemph,
        winfunc=lambda x: np.ones((x,)),  # the reference's explicit lambda
    )
    log_feat = np.log(feat)
    log_energy = np.log(energy)
    if USE_LOG_MELS:
        features = np.concatenate([log_feat, log_energy[:, None]], axis=1)
    else:
        cepstra = dct(log_feat, type=2, axis=1, norm="ortho")
        cepstra = cepstra[:, :num_cepstral_coeffs]
        cepstra = lifter(cepstra, ceplifter)
        cepstra[:, 0] = log_energy
        features = cepstra
    if USE_MFCC_DELTAS:
        features = np.concatenate([features, delta(features, 2)], axis=1)
    return features
