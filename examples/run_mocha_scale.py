"""Reference-scale end-to-end run with the performance configuration.

Reproduces the full MOCHA-TIMIT-style experiment (SURVEY §6 /
BASELINE.md): 16×16 grid, 50 unique sentences, 9 training blocks × 50
trials, the reference architecture (conv[100]/12× → 3×400 biLSTM →
aux[225] → dec 150/800), 800-epoch schedule with EMA assessment every
10 epochs — on synthetic data, with the TPU perf settings (bf16
compute, Pallas fused kernels, B=128).

Usage:  python examples/run_mocha_scale.py /tmp/mocha [--epochs 400]

Measured (RESULTS.md): 400 epochs + 40 assessments in ~118 s wall on
one v5e chip (warm XLA cache), train+val WER 0.000 from epoch ~50.
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REFERENCE_LAYERS = {
    # mocha-1_word_sequence.yaml:56-69
    "encoder_embedding": [100],
    "encoder_rnn": [400, 400, 400],
    "encoder_1_projection": [225],
    "decoder_embedding": [150],
    "decoder_rnn": [800],
    "decoder_projection": [],
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("root", help="experiment directory")
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument(
        "--no-pallas", action="store_true",
        help="use the plain lax.scan recurrence (e.g. on CPU)",
    )
    args = parser.parse_args(argv)

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    manifest_path = make_demo_experiment(
        args.root,
        subject_ids=(1,),
        grid_size=(16, 16),
        num_unique_sentences=50,
        num_sentences_per_block=50,
        num_training_blocks=9,
        N_epochs=args.epochs,
        layer_sizes=REFERENCE_LAYERS,
    )
    trainer = MultiSubjectTrainer(
        manifest_path,
        [1],
        SN_kwargs={
            "batch_size": args.batch_size,
            "max_dec_len": 12,
            "learning_rate": 1e-3,
            "use_pallas_lstm": not args.no_pallas,
            "compute_dtype": "float32" if args.no_pallas else "bfloat16",
            "temperature": 0.0,
        },
        VERBOSE=True,
    )
    t0 = time.perf_counter()
    history = trainer.parallel_transfer_learn()
    wall = time.perf_counter() - t0
    last = list(history.values())[-1]
    print(
        f"{args.epochs} epochs + {len(history)} assessments: "
        f"{wall:.1f}s wall; final train/val WER "
        f"{last['training']['word_error_rate']:.3f}/"
        f"{last['validation']['word_error_rate']:.3f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
