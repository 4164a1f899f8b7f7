"""End-to-end demo: synthetic experiment → train → assess → analyze.

Usage:
    python examples/run_demo.py [workdir] [--epochs N] [--subjects K]
                                [--attention] [--conformer] [--ctc]
                                [--data-parallel] [--beam W]

Mirrors the reference's notebook quickstart (reference README.md:70-102):
build the trainer from the manifest, write records, train with periodic
assessment, then run the analysis hooks.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("workdir", nargs="?", default=None)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--subjects", type=int, default=1)
    parser.add_argument("--attention", action="store_true")
    parser.add_argument("--conformer", action="store_true")
    parser.add_argument("--ctc", action="store_true")
    parser.add_argument("--data-parallel", action="store_true")
    parser.add_argument("--beam", type=int, default=1)
    args = parser.parse_args()

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.plotting import ResultsPlotter
    from ecog2txt_tpu.serve import OnlinePredictor
    from ecog2txt_tpu.train import MultiSubjectTrainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="ecog2txt_demo_")
    overrides = {}
    if args.attention:
        overrides["cross_attention"] = True
    if args.conformer:
        overrides["encoder_type"] = "conformer"
    if args.ctc:
        overrides["phoneme_sequence_distribution"] = "CTC"

    subject_ids = tuple(range(1, args.subjects + 1))
    manifest = make_demo_experiment(
        os.path.join(workdir, "exp"),
        subject_ids=subject_ids,
        N_epochs=args.epochs,
        **overrides,
    )
    print(f"experiment at {workdir}")

    trainer = MultiSubjectTrainer(
        manifest,
        list(subject_ids),
        SN_kwargs={
            "batch_size": 16,
            "max_dec_len": 10,
            "learning_rate": 3e-3,
            "beam_width": args.beam,
            "data_parallel": args.data_parallel,
        },
    )
    print(trainer.subject_to_table())
    trainer.parallel_transfer_learn()

    out = trainer.assess(["validation", "testing"])
    for partition, snap in out.items():
        print(
            f"{partition}: WER {snap['word_error_rate']:.3f} "
            f"accuracy {snap['accuracy']:.3f}"
        )
    print("example decodes:")
    for ref, hyp in zip(
        out["validation"]["references"][:3],
        out["validation"]["hypotheses"][:3],
    ):
        print(f"  ref: {ref!r}\n  hyp: {hyp!r}")

    # analysis hooks
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    contribs = plotter.elec_contribs("weight_norms")
    print(f"electrode contributions (weight norms): {contribs.round(2)}")
    predictor = OnlinePredictor.from_trainer(trainer)
    ds = trainer.packed_dataset("testing")
    trial = ds.encoder_inputs[0, 0, : int(ds.encoder_lengths[0, 0])]
    print("online predict:", predictor(trial)["sequences"])


if __name__ == "__main__":
    main()
