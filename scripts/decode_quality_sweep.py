"""Measure the decode-quality orderings at a nonzero-WER operating point
(VERDICT r4 #2): the difficulty ramp, beam vs greedy vs temperature
decode, CTC-head lexicon rescoring, and the transfer-learning donor
gain — the paper's actual claims (Makin et al., reference README.md:4;
beam_width/temperature at mocha-1_word_sequence.yaml:31,82).

Runs on CPU (the corpus/model are demo-scale); prints a markdown table
and writes JSON to ``--out``.  The committed numbers live in
RESULTS.md's round-5 section; `tests/test_decode_quality.py` pins the
orderings on a fixed seed.

Usage::

    JAX_PLATFORMS=cpu python scripts/decode_quality_sweep.py \
        --root /tmp/dq_sweep --out /tmp/dq_sweep.json
"""

import argparse
import json
import os
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":  # before backend init
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ecog2txt_tpu.demo import make_demo_experiment  # noqa: E402
from ecog2txt_tpu.train import MultiSubjectTrainer  # noqa: E402

# The operating point test_decode_quality.py pins (word spatial
# patterns pulled toward one shared pattern -> confusable words).
OP_POINT = dict(
    synth_pattern_correlation=0.35,
    synth_noise_scale=0.15,
    num_unique_sentences=12,
    num_sentences_per_block=12,
    num_training_blocks=3,
)

RAMP = [  # (pattern_correlation, noise_scale), 80-epoch budget each
    (0.0, 0.05),
    (0.2, 0.10),
    (0.35, 0.15),
    (0.5, 0.30),
    (0.7, 0.60),
    (0.9, 1.50),
]


def make_trainer(root, subject_ids=(1,), **overrides):
    kw = dict(OP_POINT)
    kw.update(overrides)
    mp = make_demo_experiment(
        str(root), subject_ids=subject_ids, grid_size=(4, 4),
        phoneme_sequence_distribution="CTC", **kw,
    )
    return MultiSubjectTrainer(
        mp, list(subject_ids),
        SN_kwargs={"batch_size": 12, "max_dec_len": 10,
                   "learning_rate": 3e-3},
        VERBOSE=False,
    )


def val_wer(trainer, beam=1, temp=0.0):
    trainer.beam_width = beam
    trainer.SN_kwargs["temperature"] = temp
    out = trainer.assess(["validation"])["validation"]
    return float(out["word_error_rate"]), out


def ctc_lexicon_wer(tr, references):
    """CTC-head-only decode + lexicon-trie word rescoring (no decoder)."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.assess import wer_vector
    from ecog2txt_tpu.datagen import word_to_phonemes
    from ecog2txt_tpu.models.ctc import (
        CTCWordBeamState, LexiconTrie, collapse_alignment,
    )
    from ecog2txt_tpu.models.seq2seq import encode
    from ecog2txt_tpu.serve import _ctc_head_apply

    phoneme_list = tr.target_subject.data_manifests[
        "encoder_1_targets"
    ].feature_list
    word_list = tr.target_subject.data_manifests[
        "decoder_targets"
    ].feature_list
    id_map = {p: i for i, p in enumerate(phoneme_list)}
    lex = {
        w: [id_map[p] for p in word_to_phonemes(w.rstrip("_"))]
        for w in word_list
        if not w.startswith("<")
        and all(p in id_map for p in word_to_phonemes(w.rstrip("_")))
    }
    trie = LexiconTrie(lex)
    ds = tr.packed_dataset("validation")
    cfg, params = tr.net_config, tr.state.ema
    enc_out, _, enc_lens = encode(
        params, cfg, jnp.asarray(ds.encoder_inputs[0]),
        jnp.asarray(ds.encoder_lengths[0]), jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(0), train=False,
    )
    enc_bm = np.moveaxis(np.asarray(enc_out), 0, 1)
    hyps = []
    for i in range(enc_bm.shape[0]):
        n = int(enc_lens[i])
        _, logp = _ctc_head_apply(
            params, cfg, "encoder_1_targets",
            jnp.asarray(enc_bm[i : i + 1, :n]), want_logp=True,
        )
        st = CTCWordBeamState(trie, beam_width=8)
        st.advance(np.asarray(logp)[:, 0])
        hyps.append(" ".join(w.rstrip("_") for w in st.best()))
    return float(np.mean(wer_vector(references, hyps)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dq_sweep")
    ap.add_argument("--out", default="/tmp/dq_sweep.json")
    ap.add_argument("--ramp-epochs", type=int, default=80)
    ap.add_argument("--op-epochs", type=int, default=160)
    args = ap.parse_args()

    results = {"ramp": [], "modes": {}, "transfer": {}}
    t00 = time.time()

    # --- 1. difficulty ramp (fixed budget) -------------------------------
    for alpha, noise in RAMP:
        t0 = time.time()
        tr = make_trainer(
            os.path.join(args.root, f"ramp_a{alpha}_n{noise}"),
            synth_pattern_correlation=alpha, synth_noise_scale=noise,
        )
        tr.fit(num_epochs=args.ramp_epochs, assess=False)
        wer, _ = val_wer(tr)
        wer_tr, _ = (
            float(tr.assess(["training"])["training"]["word_error_rate"]),
            None,
        )
        results["ramp"].append(
            dict(alpha=alpha, noise=noise, val_wer=wer, train_wer=wer_tr,
                 wall_s=round(time.time() - t0, 1))
        )
        print(f"[ramp] a={alpha} n={noise}: val WER {wer:.3f} "
              f"(train {wer_tr:.3f}, {time.time()-t0:.0f}s)", flush=True)

    # --- 2. decode modes at the operating point --------------------------
    t0 = time.time()
    tr = make_trainer(os.path.join(args.root, "op"))
    tr.fit(num_epochs=args.op_epochs, assess=False)
    print(f"[op] trained {args.op_epochs} epochs in "
          f"{time.time()-t0:.0f}s", flush=True)

    wer_greedy, out_g = val_wer(tr, beam=1, temp=0.0)
    results["modes"]["greedy"] = wer_greedy
    for b in (2, 4, 8):
        results["modes"][f"beam{b}"], _ = val_wer(tr, beam=b, temp=0.0)
    # the reference manifest's sampled-decode temperature
    results["modes"]["temp0.384"], _ = val_wer(tr, beam=1, temp=0.384)
    results["modes"]["temp1.0"], _ = val_wer(tr, beam=1, temp=1.0)
    results["modes"]["ctc_lexicon"] = ctc_lexicon_wer(
        tr, out_g["references"]
    )
    for k, v in results["modes"].items():
        print(f"[modes] {k}: {v:.3f}", flush=True)

    # --- 3. transfer vs cold at the operating point ----------------------
    t0 = time.time()
    tr_tl = make_trainer(os.path.join(args.root, "tl"), subject_ids=(2, 1))
    tr_tl.sequential_transfer_learn(pretraining=40, training=80,
                                    posttraining=80)
    wer_tl, _ = val_wer(tr_tl)
    tr_cold = make_trainer(os.path.join(args.root, "cold"))
    tr_cold.fit(num_epochs=args.op_epochs, assess=False)
    wer_cold, _ = val_wer(tr_cold)
    results["transfer"] = dict(
        sequential_tl=wer_tl, cold=wer_cold,
        wall_s=round(time.time() - t0, 1),
    )
    print(f"[transfer] TL {wer_tl:.3f} vs cold {wer_cold:.3f}", flush=True)

    results["total_wall_s"] = round(time.time() - t00, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    # --- markdown table ---------------------------------------------------
    print("\n| difficulty (α, σ) | val WER @80 ep |")
    print("|---|---|")
    for r in results["ramp"]:
        print(f"| ({r['alpha']}, {r['noise']}) | {r['val_wer']:.3f} |")
    print("\n| decode mode @ op point | val WER |")
    print("|---|---|")
    for k, v in results["modes"].items():
        print(f"| {k} | {v:.3f} |")
    print(f"\nTL {wer_tl:.3f} vs cold {wer_cold:.3f}")


if __name__ == "__main__":
    main()
