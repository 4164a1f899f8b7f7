"""Migration walkthrough: a jgmakin/ecog2txt user switching over.

Demonstrates the three migration artifacts end to end (MIGRATION.md
TL;DR), against either the reference's own auxiliary files (pass
--text-dir /path/to/ecog2txt/auxiliary/EFC) or the packaged demo
auxiliary/:

1. the UNCHANGED experiment manifest YAML + block_breakdowns.json load
   (``!!python/name:`` tags resolve through the registry, lab paths
   overridable via DG_kwargs);
2. vocab files resolve through the same 4-level rule as the reference;
3. a pre-trained TF1 ``model.ckpt-<epoch>`` imports onto the live
   pytree — ``rebuild='auto'`` reconstructs the architecture from the
   checkpoint's tensor shapes first, so no ``layer_sizes`` are needed
   (pass --tf1-ckpt; without one, a tiny stand-in checkpoint is written
   here with TensorFlow to demonstrate the flow).

Then trains a few epochs, assesses, and exports a StableHLO serving
artifact — the full reference workflow on the TPU stack.

Usage:
    python examples/migrate_from_reference.py [workdir]
        [--text-dir DIR] [--manifest NAME] [--subject ID]
        [--tf1-ckpt PREFIX] [--epochs N]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# platform guard (CLAUDE.md): the env profile may export
# JAX_PLATFORMS=axon; honor an explicit cpu override BEFORE backend init
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("workdir", nargs="?", default=None)
    parser.add_argument("--text-dir", default=None,
                        help="reference auxiliary dir (default: packaged)")
    parser.add_argument("--manifest", default="demo_word_sequence.yaml",
                        help="manifest name, e.g. EFC/mocha-1_word_sequence.yaml")
    parser.add_argument("--subject", type=int, default=1)
    parser.add_argument("--tf1-ckpt", default=None,
                        help="TF1 model.ckpt-<epoch> prefix to import")
    parser.add_argument("--epochs", type=int, default=20)
    args = parser.parse_args()

    import tempfile

    import numpy as np

    from ecog2txt_tpu.serve import OnlinePredictor, export_predictor
    from ecog2txt_tpu.train import MultiSubjectTrainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="ecog2txt_migrate_")

    # 1+2) the reference ctor contract, unchanged: manifest name +
    # subject list (+ DG_kwargs overriding only the lab write paths).
    # The registry substitutes a generator for the lab's
    # SpeechDataGenerator; the demo synthetic generator stands in.
    trainer = MultiSubjectTrainer(
        args.manifest,
        [args.subject],
        text_dir=args.text_dir,
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "learning_rate": 3e-3,
                   "checkpoint_dir": os.path.join(workdir, "ckpt"),
                   # the manifest's tf_summaries_dir is a lab path;
                   # redirect the TensorBoard curves into the workdir
                   "tf_summaries_dir": os.path.join(workdir, "tb")},
        # the only knobs a migrating user must point somewhere sensible
        # are the lab WRITE paths (reference README.md:44-47)
        DG_kwargs={
            "tf_record_partial_path": os.path.join(
                workdir, "records", "block_{0}.tfrecord"
            ),
        },
        VERBOSE=True,
    )
    print(trainer.subject_to_table())

    # 3) TF1 checkpoint import (ckpt-only: architecture recovered from
    # tensor shapes when it differs from the constructed net)
    ckpt = args.tf1_ckpt
    if ckpt is None:
        ckpt = _write_standin_tf1_checkpoint(trainer, workdir)
    if ckpt:
        report = trainer.import_tf1_checkpoint(ckpt)
        print(
            f"TF1 import: {len(report['imported'])} variables imported, "
            f"{len(report['skipped'])} skipped"
        )

    trainer.fit(num_epochs=args.epochs)
    out = trainer.assess(["validation"])
    print(f"validation WER {out['validation']['word_error_rate']:.3f}")

    predictor = OnlinePredictor.from_trainer(trainer)
    ds = trainer.packed_dataset("validation")
    one = np.asarray(
        ds.encoder_inputs[0, 0, : int(ds.encoder_lengths[0, 0])]
    )
    print("one-utterance prediction:", predictor(one)["sequences"][0])

    artifact = export_predictor(
        predictor, os.path.join(workdir, "exported")
    )
    print(f"StableHLO serving artifact at {artifact}")


def _write_standin_tf1_checkpoint(trainer, workdir):
    """A tiny real TF1-format checkpoint (one transposed projection
    variable under the reference's scope grammar) so the import flow
    runs without lab assets; returns None when TF is unavailable."""
    try:
        import tensorflow as tf
    except Exception:
        print("TensorFlow unavailable; skipping the TF1-import leg")
        return None
    import numpy as np

    tf1 = tf.compat.v1
    cfg = trainer.net_config
    D = cfg.dec_rnn_sizes[-1]
    w = np.random.default_rng(0).normal(
        size=(cfg.vocab_size, D)
    ).astype(np.float32) * 0.05
    os.makedirs(os.path.join(workdir, "tf1"), exist_ok=True)
    graph = tf1.Graph()
    with graph.as_default():
        var = tf1.get_variable("v0", initializer=tf.constant(w))
        saver = tf1.train.Saver(
            var_list={
                f"seq2seq/decoder_projection_{D}_{cfg.vocab_size}_0/"
                "weights": var
            }
        )
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(
                sess,
                os.path.join(workdir, "tf1", "model.ckpt"),
                global_step=200,
            )


if __name__ == "__main__":
    main()
