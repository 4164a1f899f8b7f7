"""Drop-in contract tests (VERDICT r3 missing #1/#2).

The reference's whole UX is ``MultiSubjectTrainer(manifest_name, [ids])``
against its shipped YAML + block_breakdowns.json + vocab file
(reference trainers.py:60-82, README.md:32-57,70-102).  These tests
prove that contract end to end:

* a trainer built DIRECTLY from the reference's own
  ``auxiliary/EFC/mocha-1_word_sequence.yaml`` (unchanged), with the
  registry substituting the lab-private ``SpeechDataGenerator`` and
  DG_kwargs overriding only the lab write paths, resolves the real
  ``vocab.mocha-timit.1806``, writes records, trains, and assesses;
* the packaged ``ecog2txt_tpu/auxiliary/`` (demo manifest + vocab files
  + bad_electrodes + block_breakdowns.json) makes the default
  ``text_dir`` real, so the vocab-file resolution level and the default
  bad_electrodes path are reachable out of the box.
"""

import os

import numpy as np
import pytest

import ecog2txt_tpu
from ecog2txt_tpu.train import MultiSubjectTrainer

REF_AUX = "/root/reference/ecog2txt/auxiliary"


@pytest.mark.slow
def test_reference_yaml_drop_in_end_to_end(tmp_path):
    """MultiSubjectTrainer on the reference's own mocha-1 manifest:
    vocab.mocha-timit.1806 resolves from text_dir, block membership
    comes from the reference block_breakdowns.json, the constructed net
    is the reference architecture (conv 100 @12 → 3×400 biLSTM → dec
    150/800 over the 1806+3 vocab), and the trainer writes records,
    fits, and assesses."""
    if not os.path.isdir(REF_AUX):
        pytest.skip("reference not mounted")
    trainer = MultiSubjectTrainer(
        "EFC/mocha-1_word_sequence.yaml",
        [400],
        text_dir=REF_AUX,
        # the reference manifest hardcodes lab paths; per its README
        # these are exactly the knobs a user must point somewhere
        # sensible (README.md:44-47) — json_dir to the shipped
        # block_breakdowns.json, the record path somewhere writable
        ES_kwargs={"json_dir": os.path.join(REF_AUX, "EFC")},
        DG_kwargs={
            "tf_record_partial_path": str(
                tmp_path / "records" / "EFC400_B{0}.tfrecord"
            ),
        },
        SN_kwargs={
            "checkpoint_dir": str(tmp_path / "ckpt"),
            # like checkpoint_dir, the manifest's tf_summaries_dir is a
            # lab path — point it somewhere writable
            "tf_summaries_dir": str(tmp_path / "tb"),
        },
        VERBOSE=False,
    )
    # the real 1806-line vocab file resolved from text_dir (the file
    # already leads with <pad>/<EOS>/<OOV>, t2t style, so the specials
    # dedupe and the class count is exactly 1806)
    dec_manifest = trainer.target_subject.data_manifests["decoder_targets"]
    assert len(dec_manifest.feature_list) == 1806
    assert dec_manifest.feature_list[:3] == ["<pad>", "<EOS>", "<OOV>"]
    assert "the_" in dec_manifest.feature_list
    # the constructed net is the manifest's architecture
    cfg = trainer.net_config
    assert cfg.conv_sizes == (100,)
    assert cfg.rnn_sizes == (400, 400, 400)
    assert cfg.dec_rnn_sizes == (800,)
    assert cfg.dec_embedding_size == 150
    assert cfg.vocab_size == 1806
    # decimation_factor: null → round(200 / 16.5) = 12
    assert cfg.decimation_factor == 12
    # assessment temperature from the manifest (trainers.py:110-115)
    assert trainer.temperature == pytest.approx(0.384)
    # block membership per the reference block_breakdowns.json under
    # the mocha-1 block_types filter: 2 training + 1 validation block
    subject = trainer.target_subject
    assert len(subject.block_ids("training")) == 2
    assert len(subject.block_ids("validation")) == 1
    assert len(subject.block_ids("testing")) == 0
    # phoneme aux head: vocab.phonemes.42 is NOT shipped by the
    # reference → the induction level produced the class list
    enc1 = subject.data_manifests["encoder_1_targets"]
    assert enc1.is_categorical and len(enc1.feature_list) > 3

    # records written, a short fit runs, and assessment decodes
    trainer.write_tf_records_maybe()
    block = sorted(subject.block_ids("training"))[0]
    assert os.path.exists(subject.data_generator.tf_record_path(block))
    trainer.fit(num_epochs=2, assess=False)
    snapshot = trainer.assess()
    for partition in ("training", "validation"):
        wer = snapshot[partition]["word_error_rate"]
        assert np.isfinite(wer) and wer >= 0.0
    # the manifest's tf_summaries_dir key was consumed: the fit wrote
    # TensorBoard scalars of the training curve
    import glob

    from ecog2txt_tpu.utils.summaries import iter_events

    (events_path,) = glob.glob(str(tmp_path / "tb" / "events.out.*"))
    tags = {
        tag
        for event in iter_events(events_path)
        for tag in event.get("scalars", ())
    }
    assert "loss/total" in tags


def test_reference_manifest_dir_fallback(tmp_path):
    """block_breakdowns.json resolves from the MANIFEST's own directory
    (auxiliary/EFC/) when the manifest's hardcoded lab json_dir does
    not exist — no ES_kwargs override needed (r4: the migration example
    flow)."""
    if not os.path.isdir(REF_AUX):
        pytest.skip("reference not mounted")
    trainer = MultiSubjectTrainer(
        "EFC/mocha-1_word_sequence.yaml",
        [400],
        text_dir=REF_AUX,
        DG_kwargs={
            "tf_record_partial_path": str(
                tmp_path / "records" / "EFC400_B{0}.tfrecord"
            ),
        },
        SN_kwargs={"checkpoint_dir": str(tmp_path / "ckpt")},
        VERBOSE=False,
    )
    subject = trainer.target_subject
    assert subject.block_breakdowns  # found next to the YAML
    assert len(subject.block_ids("training")) > 0


def test_packaged_auxiliary_out_of_the_box(tmp_path):
    """The packaged auxiliary/ directory IS the default text_dir: a
    trainer built from the in-package demo manifest (no text_dir
    argument at all) resolves the packaged vocab files, the default
    bad_electrodes path, and the packaged block_breakdowns.json — only
    the write paths are supplied."""
    assert os.path.isdir(ecog2txt_tpu.text_dir)
    trainer = MultiSubjectTrainer(
        "demo_word_sequence.yaml",
        [1],
        DG_kwargs={
            "tf_record_partial_path": str(
                tmp_path / "records" / "demo1_B{0}.tfrecord"
            ),
        },
        SN_kwargs={
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "batch_size": 16,
            "learning_rate": 3e-3,
        },
        VERBOSE=False,
    )
    gen = trainer.target_subject.data_generator
    # default bad_electrodes path points INTO the package and exists
    assert gen.bad_electrodes_path == os.path.join(
        ecog2txt_tpu.text_dir, "bad_electrodes"
    )
    assert os.path.isfile(gen.bad_electrodes_path)
    assert gen.bad_electrodes == set()
    # packaged block_breakdowns.json supplied the partitions
    assert len(trainer.target_subject.block_ids("training")) == 4
    assert len(trainer.target_subject.block_ids("validation")) == 1
    # both packaged vocab files resolved (36 words / 20 phonemes + specials)
    dec = trainer.target_subject.data_manifests["decoder_targets"]
    assert len(dec.feature_list) == 36 + 3
    enc1 = trainer.target_subject.data_manifests["encoder_1_targets"]
    assert len(enc1.feature_list) == 20 + 3
    # end to end: records → fit → assess
    history = trainer.fit(num_epochs=20)
    wers = [h["training"]["word_error_rate"] for h in history.values()]
    assert np.isfinite(wers[-1])


def test_packaged_manifest_parses_reference_constructs():
    """The packaged YAML uses the reference's own constructs
    (!!python/name:, !!python/tuple, !!set, &anchor/*alias) and loads
    under the restricted loader without code execution."""
    from ecog2txt_tpu import config

    manifests = config.load_experiment_manifest("demo_word_sequence.yaml")
    assert set(manifests) == {1, 2}
    m = manifests[1]
    assert isinstance(m["RGB_color"], tuple)
    assert m["block_types"]["training"] == {"demo"}
    gen_cls = config.resolve_data_generator(m["DataGenerator"])
    assert gen_cls.__name__ == "SyntheticDataGenerator"
    # the alias (*id001) resolves to the same spec for subject 2
    assert config.resolve_data_generator(
        manifests[2]["DataGenerator"]
    ) is gen_cls
