"""Stream a long continuous ECoG recording through the conformer,
chunk by chunk, at bounded memory (BASELINE configs[4]).

The script trains a small conformer seq2seq on the synthetic corpus,
then replays a CONTINUOUS recording (many sentences of raw samples
arriving in arbitrary-sized packets) through
``serve.StreamingConformerSession``:

* packets of raw samples are pushed as they "arrive";
* whenever a conv-aligned attention chunk fills, it is convolved and
  encoded incrementally (fixed window — memory does not grow with the
  recording);
* at each sentence endpoint the session decodes and is reset, exactly
  matching the offline decode of that sentence (asserted).

Usage:  python examples/stream_long_recording.py /tmp/stream \
            [--sentences 8] [--packet 57] [--ctc]

``--ctc`` adds a CTC phoneme head and prints LIVE partial hypotheses
(outside the timed region) whenever a new encoder chunk lands.
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# honor a cpu request even where a TPU plugin would win over the env var
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--sentences", type=int, default=8)
    ap.add_argument("--packet", type=int, default=57)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument(
        "--ctc", action="store_true",
        help="add a CTC phoneme head and print LIVE partial hypotheses "
             "while each sentence streams",
    )
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import greedy_decode
    from ecog2txt_tpu.serve import StreamingConformerSession
    from ecog2txt_tpu.tokenizers import target_inds_to_sequences
    from ecog2txt_tpu.train import MultiSubjectTrainer

    manifest = make_demo_experiment(
        os.path.join(args.workdir, "exp"), subject_ids=(1,),
        **({"phoneme_sequence_distribution": "CTC"} if args.ctc else {}),
    )
    trainer = MultiSubjectTrainer(
        manifest,
        [1],
        SN_kwargs={
            "batch_size": 16,
            "max_dec_len": 10,
            "learning_rate": 3e-3,
            "N_epochs": args.epochs,
            "encoder_type": "conformer",
        },
        VERBOSE=False,
    )
    print(f"training conformer for {args.epochs} epochs ...")
    history = trainer.fit()
    last = list(history.values())[-1]
    print(f"  final training WER {last['training']['word_error_rate']:.3f}")

    ds = trainer.packed_dataset("validation")
    dec_list = trainer.target_subject.data_manifests[
        "decoder_targets"
    ].feature_list
    phoneme_list = None
    if args.ctc:
        phoneme_list = trainer.target_subject.data_manifests[
            "encoder_1_targets"
        ].feature_list
    session = StreamingConformerSession(
        trainer.state.ema,
        trainer.net_config,
        dec_list,
        subject_idx=len(trainer.ecog_subjects) - 1,
        phoneme_list=phoneme_list,
    )

    n = min(args.sentences, int(ds.num_trials.sum()))
    matches = 0
    rtfs = []  # per-sentence real-time factor (first includes compiles)
    sr = float(
        trainer.target_subject.manifest.resolve("sampling_rate", default=200)
    )
    for i in range(n):
        T = int(ds.encoder_lengths[0][i])
        raw = np.asarray(ds.encoder_inputs[0][i][:T], np.float32)
        # offline decode of the same single trial
        offline = greedy_decode(
            trainer.state.ema,
            trainer.net_config,
            jnp.asarray(ds.encoder_inputs[0][i])[None],
            jnp.asarray([T], jnp.int32),
            jnp.asarray(len(trainer.ecog_subjects) - 1, jnp.int32),
            temperature=0.0,
        )[0]
        push_time = 0.0
        last_steps = 0
        for start in range(0, T, args.packet):  # ragged packet arrival
            t0 = time.perf_counter()
            session.push(raw[start : start + args.packet])
            push_time += time.perf_counter() - t0
            if args.ctc:
                p = session.partial()  # LIVE phonemes (untimed)
                if p["num_steps"] > last_steps:  # a new chunk landed
                    last_steps = p["num_steps"]
                    print(
                        f"      …{session.num_samples:4d} samples: "
                        + " ".join(p["phonemes"][0][-8:])
                    )
        t0 = time.perf_counter()
        out = session.endpoint()
        push_time += time.perf_counter() - t0
        rtfs.append((T / sr) / push_time)
        hyp = out["sequences"][0]
        ref = target_inds_to_sequences(np.asarray(offline)[None], dec_list)[0]
        ok = np.array_equal(out["tokens"][0], np.asarray(offline))
        matches += int(ok)
        print(f"  [{i}] streamed={hyp!r}  offline={ref!r}  exact={ok}")
        session.reset()

    warm = sorted(rtfs[1:] or rtfs)[len(rtfs[1:] or rtfs) // 2]
    print(
        f"{n} sentences; median warm real-time factor {warm:.1f}x "
        f"(first sentence incl. compiles: {rtfs[0]:.2f}x); "
        f"streamed == offline for {matches}/{n}"
    )
    if matches != n:
        sys.exit(1)


if __name__ == "__main__":
    main()
