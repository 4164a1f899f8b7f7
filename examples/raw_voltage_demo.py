"""Raw-voltage walkthrough: 1 kHz amplifier output in, decoded text out,
with ZERO user featurization code.

The reference leaves feature extraction to lab-private DataGenerator
subclasses (reference data_generators.py:487-530) — trials must arrive
already featurized.  Here the manifest's ``high_gamma`` block runs the
fused XLA chain (notch → log-spaced band-pass bank → Hilbert analytic
amplitude → z-score → decimate, `ecog2txt_tpu/features.py`) inside
`ArrayDataGenerator`, and the same chain streams incrementally for
serving (`features.StreamingHighGamma`).

The demo synthesizes raw VOLTAGE whose high-gamma analytic amplitude
carries the word patterns (band-noise carrier × per-word envelope +
60 Hz line noise + broadband floor) — so the only decodable signal is
what the featurization chain must recover.

Usage:  python examples/raw_voltage_demo.py [workdir] [--epochs N]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

RAW_RATE = 1000.0
HG = {"num_bands": 6, "pad_seconds": 0.25}  # manifest high_gamma block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=None)
    ap.add_argument("--epochs", type=int, default=150)
    args = ap.parse_args()

    from dataclasses import replace

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.features import (
        StreamingHighGamma, extract_high_gamma_np,
        synthesize_raw_from_envelope,
    )
    from ecog2txt_tpu.train import MultiSubjectTrainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="ecog2txt_raw_")
    raw_dir = os.path.join(workdir, "raw_trials")

    # 1. a probe experiment supplies the sentence corpus + word-pattern
    #    envelopes; every trial is re-expressed as raw voltage
    probe_path = make_demo_experiment(
        os.path.join(workdir, "probe"), subject_ids=(1,)
    )
    probe = MultiSubjectTrainer(probe_path, [1], VERBOSE=False)
    gen = probe.ecog_subjects[0].data_generator
    rng = np.random.default_rng(0)
    cfg = None
    n_trials = 0
    for block in gen._all_blocks():
        block_dir = os.path.join(raw_dir, f"B{block}")
        os.makedirs(block_dir, exist_ok=True)
        for i, trial in enumerate(gen._ecog_token_generator(block)):
            env = np.asarray(trial["ecog_sequence"], np.float32)
            if cfg is None:
                from ecog2txt_tpu.features import HighGammaConfig

                cfg = HighGammaConfig(
                    raw_rate=RAW_RATE, out_rate=gen.sampling_rate, **HG
                )
            raw = synthesize_raw_from_envelope(env, cfg, rng)
            arrays = {
                "raw": raw, "raw_rate": RAW_RATE,
                "text": np.asarray(trial["text_sequence"]),
                "audio_features": np.asarray(
                    trial["audio_sequence"], np.float32
                ),
            }
            if trial.get("phoneme_sequence") is not None:
                arrays["phonemes"] = np.asarray(trial["phoneme_sequence"])
            np.savez(os.path.join(block_dir, f"{i:04d}.npz"), **arrays)
            n_trials += 1
    print(f"{n_trials} raw-voltage trials "
          f"({raw.shape[1]} ch @ {RAW_RATE:.0f} Hz, with 60 Hz line "
          f"noise) → {raw_dir}")

    # 2. train straight from the voltage files
    manifest_path = make_demo_experiment(
        os.path.join(workdir, "exp"),
        subject_ids=(1,),
        N_epochs=args.epochs,
        DataGenerator="ArrayDataGenerator",
        trial_dir=raw_dir,
        raw_sampling_rate=RAW_RATE,
        high_gamma=HG,
    )
    trainer = MultiSubjectTrainer(
        manifest_path, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "learning_rate": 3e-3},
    )
    trainer.parallel_transfer_learn()
    out = trainer.assess(["validation", "testing"])
    for part, snap in out.items():
        print(f"{part}: WER {snap['word_error_rate']:.3f} from raw voltage")

    # 3. the same chain, streamed: ragged chunks == offline, to float
    #    tolerance (this is what the serving sessions run)
    stream_cfg = replace(cfg, zscore="none")
    raw = synthesize_raw_from_envelope(
        np.asarray(
            next(iter(gen._ecog_token_generator(gen._all_blocks()[0])))[
                "ecog_sequence"
            ],
            np.float32,
        ),
        stream_cfg, rng,
    )
    offline = extract_high_gamma_np(raw, stream_cfg)
    stream = StreamingHighGamma(stream_cfg, raw.shape[1])
    chunks = []
    i = 0
    while i < len(raw):
        n = int(rng.integers(64, 512))
        chunks.append(stream.push(raw[i: i + n]))
        i += n
    chunks.append(stream.flush())
    streamed = np.concatenate(chunks)
    n = min(len(streamed), len(offline))
    err = float(np.abs(streamed[:n] - offline[:n]).max())
    print(f"streamed featurization vs offline: max |Δ| = {err:.2e} "
          f"over {n} frames")
    wer = out["validation"]["word_error_rate"]
    assert wer <= 0.25, f"raw-voltage training failed to learn: WER {wer}"
    assert err < 1e-3


if __name__ == "__main__":
    main()
