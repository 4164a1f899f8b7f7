"""Config-system tests: the reference's own manifest files must load."""

import os

import pytest

from ecog2txt_tpu import config

REF_EFC = "/root/reference/ecog2txt/auxiliary/EFC"


@pytest.fixture(autouse=True)
def _register_dummy_generator():
    # import first: datagen sets its own fallback at import time, and
    # resolve_data_generator lazily imports it on a registry miss
    import ecog2txt_tpu.datagen  # noqa: F401

    @config.register_data_generator("DummyGen", "pkg.mod.DummyGen")
    class DummyGen:  # noqa: N801
        pass

    config.set_fallback_generator("DummyGen")
    yield
    config.set_fallback_generator("SyntheticDataGenerator")


def test_reference_manifest_loads():
    if not os.path.exists(REF_EFC):
        pytest.skip("reference not mounted")
    manifests = config.load_experiment_manifest(
        "mocha-1_word_sequence.yaml", text_dir=REF_EFC
    )
    assert set(manifests) == {400, 401, 402, 403}
    m = manifests[400]
    assert m["grid_size"] == [16, 16]
    assert m["EMA_decay"] == 0.99
    assert m["layer_sizes"]["encoder_rnn"] == [400, 400, 400]
    # !!python/tuple parsed to tuple, not executed
    assert isinstance(m["RGB_color"], tuple)
    # !!set parsed to set
    assert m["block_types"]["training"] == {"mocha-1"}
    # !!python/name deferred to registry, never executed
    gen_cls = config.resolve_data_generator(m["DataGenerator"])
    assert isinstance(gen_cls, type)
    # a truly unknown generator name falls back with a warning
    with pytest.warns(UserWarning):
        fb = config.resolve_data_generator("no.such.pkg.NoSuchGenerator")
    assert fb.__name__ == "DummyGen"


def test_resolution_order():
    m = config.Manifest({"a": 1, "b": None})
    assert m.resolve("a", explicit=5) == 5  # kwarg wins
    assert m.resolve("a") == 1  # manifest
    assert m.resolve("b", default=7) == 7  # None in manifest → default
    assert m.resolve("missing", default=9) == 9


def test_updated_does_not_mutate():
    m = config.Manifest({"a": 1})
    m2 = m.updated({"a": 2, "b": 3})
    assert m["a"] == 1 and m2["a"] == 2 and m2["b"] == 3


def test_block_breakdowns_int_keys():
    if not os.path.exists(REF_EFC):
        pytest.skip("reference not mounted")
    bb = config.load_block_breakdowns(REF_EFC)
    assert 400 in bb
    assert all(isinstance(k, int) for k in bb[400])
    block = next(iter(bb[400].values()))
    assert {"type", "default_dataset"} <= set(block)


def test_registry_short_name_resolution():
    assert config.resolve_data_generator("other.pkg.DummyGen").__name__ == "DummyGen"


@pytest.mark.parametrize(
    "name",
    [
        "mocha-1_word_sequence.yaml",
        "demo2_word_sequence.yaml",
        "mochastar_word_sequence.yaml",
    ],
)
def test_all_reference_manifests_load(name):
    if not os.path.exists(os.path.join(REF_EFC, name)):
        pytest.skip("reference not mounted")
    manifests = config.load_experiment_manifest(name, text_dir=REF_EFC)
    assert manifests
    for subject_id, m in manifests.items():
        assert isinstance(subject_id, int)
        assert "data_mapping" in m
        assert m["layer_sizes"]["decoder_rnn"]
