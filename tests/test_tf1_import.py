"""TF1 checkpoint weight import (VERDICT r3 #5).

A tiny TF1-format checkpoint is WRITTEN here (tf.compat.v1.train.Saver
— the same format the reference's ``pywrap_tensorflow.
NewCheckpointReader`` reads, trainers.py:452) under the reference's
documented variable-scope grammar (trainers.py:444-554), then imported
onto an ``init_seq2seq`` pytree: 4-matrix LSTM kernels split row-wise
into (wx, wh), conv "embedding" weights reshaped from (1, stride, in,
out), final projections un-transposed, EMA shadows landing in the ema
pytree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecog2txt_tpu.models.seq2seq import AuxHead, Seq2SeqConfig, init_seq2seq
from ecog2txt_tpu.utils.tf1_import import (
    import_tf1_checkpoint,
    read_tf1_checkpoint,
)

CONFIG = Seq2SeqConfig(
    vocab_size=30,
    num_subjects=2,
    in_channels=12,
    conv_sizes=(16,),
    decimation_factor=4,
    rnn_sizes=(20, 24),
    aux_proj_sizes=(18,),
    aux_heads=(AuxHead("encoder_1_targets", "categorical", 9),),
    dec_embedding_size=10,
    dec_rnn_sizes=(48,),
    max_dec_len=6,
)


def _tf1_variables(rng: np.random.Generator, config: Seq2SeqConfig):
    """Random checkpoint variables under the reference's grammar, plus
    the expected post-import leaf values.  The name grammar here is
    written INDEPENDENTLY of utils/tf1_import.py, straight from
    reference trainers.py:444-554 / plotters.py:692-695."""
    variables: dict[str, np.ndarray] = {}
    expected: list[tuple[tuple, np.ndarray]] = []  # (path into params, value)

    stride = config.conv_strides[0]
    C, F = config.in_channels, config.conv_sizes[0]
    for s, sid in enumerate(("1", "4")):  # subject ids as scope strings
        w4 = rng.normal(size=(1, stride, C, F)).astype(np.float32)
        b = rng.normal(size=(F,)).astype(np.float32)
        scope = f"seq2seq/subnet_{sid}/encoder_embedding_{F}_{stride}_0"
        variables[f"{scope}/weights"] = w4
        variables[f"{scope}/biases"] = b
        expected.append(
            (("subnet", "conv", 0, "w", s), w4.reshape(stride * C, F))
        )
        expected.append((("subnet", "conv", 0, "b", s), b))

    in_dim = F
    for layer, H in enumerate(config.rnn_sizes):
        for direction, tf_dir in (("fwd", "fw"), ("bwd", "bw")):
            kernel = rng.normal(size=(in_dim + H, 4 * H)).astype(np.float32)
            bias = rng.normal(size=(4 * H,)).astype(np.float32)
            scope = (
                f"seq2seq/encoder_rnn_{layer}/bidirectional_rnn/"
                f"{tf_dir}/cell_0/lstm_cell"
            )
            variables[f"{scope}/kernel"] = kernel
            variables[f"{scope}/bias"] = bias
            base = ("encoder", "rnn", layer, direction)
            expected.append((base + ("wx",), kernel[:in_dim]))
            expected.append((base + ("wh",), kernel[in_dim:]))
            expected.append((base + ("b",), bias))
        in_dim = 2 * H

    # aux head: hidden projection layer 0 + TRANSPOSED final layer 1
    hid = config.aux_proj_sizes[0]
    w0 = rng.normal(size=(in_dim, hid)).astype(np.float32)
    w1t = rng.normal(size=(9, hid)).astype(np.float32)  # (out, in)!
    variables[f"seq2seq/encoder_1_projection_{in_dim}_{hid}_0/weights"] = w0
    variables[f"seq2seq/encoder_1_projection_{in_dim}_{hid}_0/biases"] = (
        rng.normal(size=(hid,)).astype(np.float32)
    )
    variables[f"seq2seq/encoder_1_projection_{hid}_9_1/weights"] = w1t
    expected.append((("aux", "encoder_1_targets", "mlp", 0, "w"), w0))
    expected.append((("aux", "encoder_1_targets", "out", "w"), w1t.T))

    emb = rng.normal(
        size=(config.vocab_size, config.dec_embedding_size)
    ).astype(np.float32)
    variables["seq2seq/decoder_embedding_30_10_0/weights"] = emb
    expected.append((("decoder", "embedding"), emb))

    D = config.dec_rnn_sizes[0]
    kernel = rng.normal(
        size=(config.dec_embedding_size + D, 4 * D)
    ).astype(np.float32)
    variables["seq2seq/decoder_rnn/cell_0/lstm_cell/kernel"] = kernel
    expected.append(
        (("decoder", "rnn", 0, "wx"), kernel[: config.dec_embedding_size])
    )
    expected.append(
        (("decoder", "rnn", 0, "wh"), kernel[config.dec_embedding_size:])
    )

    wout_t = rng.normal(size=(config.vocab_size, D)).astype(np.float32)
    variables[f"seq2seq/decoder_projection_{D}_30_0/weights"] = wout_t
    expected.append((("decoder", "out", "w"), wout_t.T))

    # EMA shadow for the decoder projection (distinct value)
    ema_wout_t = rng.normal(size=(config.vocab_size, D)).astype(np.float32)
    variables[
        f"seq2seq/decoder_projection_{D}_30_0/weights/"
        "ExponentialMovingAverage"
    ] = ema_wout_t

    # optimizer slot + out-of-scope variables must be SKIPPED
    variables["seq2seq/decoder_projection_48_30_0/weights/Adam"] = (
        rng.normal(size=(3,)).astype(np.float32)
    )
    variables["beta1_power"] = np.float32([0.9])
    return variables, expected, ema_wout_t


def _leaf(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def test_import_maps_documented_grammar():
    rng = np.random.default_rng(0)
    variables, expected, ema_wout_t = _tf1_variables(rng, CONFIG)
    params = init_seq2seq(jax.random.PRNGKey(0), CONFIG)
    ema = jax.tree.map(jnp.copy, params)
    new_params, new_ema, report = import_tf1_checkpoint(
        variables, params, ema, subject_ids=[1, 4]
    )
    for path, value in expected:
        if path[0] == "subnet":  # stacked: (key..., subject) at the end
            got = np.asarray(_leaf(new_params, path[:-1]))[path[-1]]
        else:
            got = np.asarray(_leaf(new_params, path))
        np.testing.assert_allclose(got, value, rtol=0, atol=0, err_msg=str(path))
    # EMA shadow landed in the ema tree, not params
    np.testing.assert_array_equal(
        np.asarray(new_ema["decoder"]["out"]["w"]), ema_wout_t.T
    )
    assert not np.array_equal(
        np.asarray(new_params["decoder"]["out"]["w"]),
        np.asarray(new_ema["decoder"]["out"]["w"]),
    )
    # optimizer slots / bookkeeping skipped, everything else imported
    assert "seq2seq/decoder_projection_48_30_0/weights/Adam" in report["skipped"]
    assert "beta1_power" in report["skipped"]
    assert len(report["imported"]) == len(variables) - 2
    # the original pytrees were not mutated
    assert not np.array_equal(
        np.asarray(params["decoder"]["out"]["w"]),
        np.asarray(new_params["decoder"]["out"]["w"]),
    )


def test_recover_model_sizes_from_tf1_grammar():
    """The reference's recover_model_sizes walk (trainers.py:444-554)
    applied to a TF1 variable map: layer sizes, strides→decimation,
    vocab, bidirectionality, EMA flag."""
    from ecog2txt_tpu.utils.tf1_import import recover_model_sizes

    variables, _, _ = _tf1_variables(np.random.default_rng(3), CONFIG)
    sizes = recover_model_sizes(variables)
    ls = sizes["layer_sizes"]
    assert ls["encoder_embedding"] == [16]
    assert ls["encoder_rnn"] == [20, 24]
    assert ls["encoder_1_projection"] == [18]
    assert ls["decoder_embedding"] == [10]
    assert ls["decoder_rnn"] == [48]
    assert sizes["decimation_factor"] == 4
    assert sizes["vocab_size"] == 30
    assert sizes["in_channels"] == 12
    assert sizes["aux_heads"] == {"encoder_1_targets": 9}
    assert sizes["BIDIRECTIONAL"] is True
    assert sizes["EMA"] is True
    assert sizes["num_subjects"] == 2
    assert sizes["encoder_type"] == "lstm"


def test_trainer_rebuilds_from_tf1_shapes(tmp_path):
    """A trainer constructed with a DIFFERENT architecture rebuilds
    net_config from the TF1 checkpoint's tensor shapes before
    importing (rebuild='auto') — the ckpt-only migration flow."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [8],     # everything differs from the
            "encoder_rnn": [12],          # checkpoint below
            "encoder_1_projection": [6],
            "decoder_embedding": [6],
            "decoder_rnn": [16],
            "decoder_projection": [],
        },
    )
    tr = MultiSubjectTrainer(mp, [1], VERBOSE=False)
    cfg = tr.net_config
    rng = np.random.default_rng(5)
    # checkpoint of a 24-unit single-layer biLSTM / 32-unit decoder
    # model over the same data dims and vocab
    H, D, F = 24, 32, 16
    C = cfg.in_channels
    stride = cfg.decimation_factor
    variables = {
        f"seq2seq/subnet_1/encoder_embedding_{F}_{stride}_0/weights":
            rng.normal(size=(1, stride, C, F)).astype(np.float32),
        "seq2seq/encoder_rnn_0/bidirectional_rnn/fw/cell_0/lstm_cell/"
        "kernel": rng.normal(size=(F + H, 4 * H)).astype(np.float32),
        "seq2seq/encoder_rnn_0/bidirectional_rnn/bw/cell_0/lstm_cell/"
        "kernel": rng.normal(size=(F + H, 4 * H)).astype(np.float32),
        f"seq2seq/decoder_embedding_{cfg.vocab_size}_10_0/weights":
            rng.normal(size=(cfg.vocab_size, 10)).astype(np.float32),
        "seq2seq/decoder_rnn/cell_0/lstm_cell/kernel":
            rng.normal(size=(10 + D, 4 * D)).astype(np.float32),
        f"seq2seq/decoder_projection_{D}_{cfg.vocab_size}_0/weights":
            rng.normal(size=(cfg.vocab_size, D)).astype(np.float32),
    }
    report = tr.import_tf1_checkpoint(variables)
    assert tr.net_config.rnn_sizes == (H,)
    assert tr.net_config.conv_sizes == (F,)
    assert tr.net_config.dec_rnn_sizes == (D,)
    assert tr.net_config.dec_embedding_size == 10
    assert len(report["imported"]) == len(variables)
    np.testing.assert_allclose(
        np.asarray(tr.state.params["decoder"]["out"]["w"]),
        variables[
            f"seq2seq/decoder_projection_{D}_{cfg.vocab_size}_0/weights"
        ].T,
        rtol=1e-6,
    )
    # the rebuilt net still assesses end to end
    out = tr.assess(["validation"])
    assert np.isfinite(out["validation"]["word_error_rate"])


def test_import_shape_mismatch_raises():
    params = init_seq2seq(jax.random.PRNGKey(0), CONFIG)
    bad = {
        "seq2seq/decoder_embedding_30_10_0/weights": np.zeros(
            (7, 7), np.float32
        )
    }
    with pytest.raises(ValueError, match="shape mismatch"):
        import_tf1_checkpoint(bad, params)


def test_tf1_checkpoint_file_roundtrip(tmp_path):
    """Write a REAL TF1-format checkpoint with tf.compat.v1.train.Saver
    and read it back through the import path end to end."""
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1

    rng = np.random.default_rng(1)
    variables, expected, _ = _tf1_variables(rng, CONFIG)
    graph = tf1.Graph()
    with graph.as_default():
        tf_vars = {
            name: tf1.get_variable(
                f"v{i}", initializer=tf.constant(value)
            )
            for i, (name, value) in enumerate(variables.items())
        }
        saver = tf1.train.Saver(var_list=tf_vars)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = saver.save(
                sess, str(tmp_path / "model.ckpt"), global_step=200
            )
    assert prefix.endswith("model.ckpt-200")

    raw = read_tf1_checkpoint(prefix)
    assert set(raw) == set(variables)
    params = init_seq2seq(jax.random.PRNGKey(0), CONFIG)
    new_params, _, report = import_tf1_checkpoint(
        prefix, params, subject_ids=[1, 4]
    )
    for path, value in expected:
        if path[0] == "subnet":
            got = np.asarray(_leaf(new_params, path[:-1]))[path[-1]]
        else:
            got = np.asarray(_leaf(new_params, path))
        np.testing.assert_allclose(got, value, err_msg=str(path))
    # no ema tree passed: the EMA shadow joins the two skipped slots
    assert len(report["imported"]) == len(variables) - 3


def test_trainer_import_tf1(tmp_path):
    """Trainer-level entry point: import updates live params + EMA and
    the imported net decodes (MIGRATION.md row: TF1 checkpoints now
    import)."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [16],
            "encoder_rnn": [20],
            "encoder_1_projection": [16],
            "decoder_embedding": [12],
            "decoder_rnn": [32],
            "decoder_projection": [],
        },
    )
    tr = MultiSubjectTrainer(mp, [1], VERBOSE=False)
    cfg = tr.net_config
    D = cfg.dec_rnn_sizes[0]
    rng = np.random.default_rng(2)
    wout_t = rng.normal(size=(cfg.vocab_size, D)).astype(np.float32)
    ema_t = rng.normal(size=(cfg.vocab_size, D)).astype(np.float32)
    variables = {
        f"seq2seq/decoder_projection_{D}_{cfg.vocab_size}_0/weights": wout_t,
        f"seq2seq/decoder_projection_{D}_{cfg.vocab_size}_0/weights/"
        "ExponentialMovingAverage": ema_t,
    }
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        tf_vars = {
            name: tf1.get_variable(f"v{i}", initializer=tf.constant(v))
            for i, (name, v) in enumerate(variables.items())
        }
        saver = tf1.train.Saver(var_list=tf_vars)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = saver.save(
                sess, str(tmp_path / "ckpt" / "model.ckpt"), global_step=3
            )
    report = tr.import_tf1_checkpoint(prefix)
    assert len(report["imported"]) == 2
    np.testing.assert_allclose(
        np.asarray(tr.state.params["decoder"]["out"]["w"]), wout_t.T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tr.state.ema["decoder"]["out"]["w"]), ema_t.T,
        rtol=1e-6,
    )
    # the imported net still assesses end to end
    out = tr.assess(["validation"])
    assert np.isfinite(out["validation"]["word_error_rate"])
