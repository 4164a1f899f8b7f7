"""Serving-layer tests: online predictor + streaming session."""

import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.serve import OnlinePredictor, StreamingSession, construct_online_predictor
from ecog2txt_tpu.train import MultiSubjectTrainer

TINY = {
    "encoder_embedding": [16],
    "encoder_rnn": [24],
    "encoder_1_projection": [16],
    "decoder_embedding": [12],
    "decoder_rnn": [48],
    "decoder_projection": [],
}


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    mp = make_demo_experiment(
        str(root / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        # temperature=0: the serving path is greedy, so decode-parity
        # tests pin assessment to greedy too (the manifest's 0.384
        # sampling knob is exercised in test_train_e2e)
        SN_kwargs={"batch_size": 16, "max_dec_len": 10, "learning_rate": 3e-3,
                   "N_epochs": 20, "temperature": 0.0},
        VERBOSE=False,
    )
    tr.fit(assess=False)
    tr.save_checkpoint()
    return tr


def test_predict_shapes_and_text(trainer):
    predictor = OnlinePredictor.from_trainer(trainer)
    ds = trainer.packed_dataset("validation")
    trial = ds.encoder_inputs[0, 0, : ds.encoder_lengths[0, 0]]
    out = predictor(trial)
    assert isinstance(out["sequences"][0], str)
    assert out["tokens"].shape[0] == 1
    assert out["probabilities"].shape == out["tokens"].shape
    p = out["probabilities"]
    assert (p >= 0).all() and (p <= 1.0 + 1e-6).all()


def test_predict_rejects_channel_overflow(trainer):
    """More channels than the model was built for must raise — silently
    truncating would decode garbage (VERDICT r2 weak #8)."""
    predictor = OnlinePredictor.from_trainer(trainer)
    Cp = trainer.net_config.in_channels
    with pytest.raises(ValueError, match="channels"):
        predictor(np.zeros((40, Cp + 3), np.float32))
    # fewer channels (a smaller subject grid) still zero-pads fine
    out = predictor(np.zeros((40, Cp - 1), np.float32))
    assert isinstance(out["sequences"][0], str)


def test_predict_batch(trainer):
    predictor = OnlinePredictor.from_trainer(trainer)
    ds = trainer.packed_dataset("validation")
    out = predictor(ds.encoder_inputs[0, :4])
    assert len(out["sequences"]) == 4


def test_from_checkpoint_matches_live(trainer):
    live = OnlinePredictor.from_trainer(trainer)
    dec_list = trainer.target_subject.data_manifests[
        "decoder_targets"
    ].feature_list
    restored = OnlinePredictor.from_checkpoint(
        trainer._ckpt_path(int(trainer.state.epoch)),
        trainer.net_config,
        dec_list,
        max_samples=trainer.target_subject.data_generator.max_samples,
    )
    ds = trainer.packed_dataset("validation")
    trial = ds.encoder_inputs[0, 1]
    assert live(trial)["sequences"] == restored(trial)["sequences"]


def test_construct_online_predictor_closure(trainer):
    dec_list = trainer.target_subject.data_manifests[
        "decoder_targets"
    ].feature_list
    predict = construct_online_predictor(
        trainer._ckpt_path(int(trainer.state.epoch)),
        dec_list,
        trainer.net_config,
    )
    ds = trainer.packed_dataset("validation")
    out = predict(ds.encoder_inputs[0, 0])
    assert isinstance(out, list) and isinstance(out[0], str)


def test_streaming_session_chunks_equal_whole(trainer):
    predictor = OnlinePredictor.from_trainer(trainer)
    ds = trainer.packed_dataset("validation")
    L = int(ds.encoder_lengths[0, 2])
    trial = ds.encoder_inputs[0, 2, :L]
    whole = predictor(trial)["sequences"]

    session = StreamingSession(predictor)
    for start in range(0, L, 37):
        session.push(trial[start : start + 37])
    assert session.num_samples == L
    out = session.endpoint()
    assert out["sequences"] == whole
    assert session.num_samples == 0  # reset after endpoint


def test_streaming_caps_at_max_samples(trainer):
    predictor = OnlinePredictor.from_trainer(trainer)
    session = StreamingSession(predictor)
    C = 16
    big = np.zeros((predictor.max_samples + 500, C), np.float32)
    session.push(big)
    assert session.num_samples == predictor.max_samples


def test_streaming_conformer_matches_offline_decode():
    """Raw ECoG chunks → subnet conv → ConformerStream → endpoint decode
    equals the offline full-utterance decode exactly (BASELINE
    configs[4] streaming chunked inference; VERDICT #6)."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        Seq2SeqConfig, encode, greedy_decode, init_seq2seq,
    )
    from ecog2txt_tpu.serve import StreamingConformerSession

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]

    rng = np.random.default_rng(3)
    L = 147  # not a multiple of d·chunk (16) nor of d (4)
    T = ((L + 3) // 4) * 4  # pipeline pads time to a d multiple
    raw = rng.normal(size=(1, L, 8)).astype(np.float32)
    inputs = np.zeros((1, T, 8), np.float32)
    inputs[:, :L] = raw

    offline_tokens = np.asarray(
        greedy_decode(
            params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
            jnp.asarray(0, jnp.int32), temperature=0.0,
        )
    )
    enc_out, _, enc_lengths = encode(
        params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0), train=False,
    )

    session = StreamingConformerSession(params, cfg, targets)
    for start in range(0, L, 37):  # ragged arrival
        session.push(raw[0, start : start + 37])
    assert session.num_samples == L
    out = session.endpoint()
    np.testing.assert_array_equal(out["tokens"], offline_tokens)
    n = int(enc_lengths[0])
    np.testing.assert_allclose(
        out["encoder_outputs"][0, :n],
        np.moveaxis(np.asarray(enc_out), 0, 1)[0, :n],
        rtol=1e-4, atol=1e-5,
    )
    assert session.num_samples == 0  # reset after endpoint


def test_predictor_matches_assessment_decode(trainer):
    """The online predictor (padded to max_samples, B=1) must produce
    the same hypotheses as the batched assessment decode path."""
    out = trainer.assess(["validation"])["validation"]
    predictor = OnlinePredictor.from_trainer(trainer)
    ds = trainer.packed_dataset("validation")
    for i in range(3):
        L = int(ds.encoder_lengths[0, i])
        got = predictor(ds.encoder_inputs[0, i, :L])["sequences"][0]
        assert got == out["hypotheses"][i]


def test_streaming_conformer_decode_is_repeatable():
    """decode() mid-stream must not mutate the live stream: repeated
    decode() calls agree, push() continues afterwards, and the final
    endpoint still equals the offline decode."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        Seq2SeqConfig, greedy_decode, init_seq2seq,
    )
    from ecog2txt_tpu.serve import StreamingConformerSession

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    rng = np.random.default_rng(7)
    L = 147
    raw = rng.normal(size=(1, L, 8)).astype(np.float32)

    session = StreamingConformerSession(params, cfg, targets)
    session.push(raw[0, :22])  # 22 samples: 1 full chunk + remainder
    mid1 = session.decode()
    mid2 = session.decode()  # same partial utterance, same answer
    np.testing.assert_array_equal(mid1["tokens"], mid2["tokens"])
    # stream continues cleanly after the speculative flush
    session.push(raw[0, 22:])
    out = session.endpoint()
    T = ((L + 3) // 4) * 4
    inputs = np.zeros((1, T, 8), np.float32)
    inputs[:, :L] = raw
    offline_tokens = np.asarray(
        greedy_decode(
            params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
            jnp.asarray(0, jnp.int32), temperature=0.0,
        )
    )
    np.testing.assert_array_equal(out["tokens"], offline_tokens)


def test_streaming_partial_ctc_hypotheses():
    """partial() emits live CTC hypotheses mid-utterance without
    touching the stream; the endpoint partial equals the offline CTC
    greedy decode of the full encode."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.ctc import ctc_greedy_decode
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, encode, init_seq2seq,
    )
    from ecog2txt_tpu.serve import StreamingConformerSession

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    phonemes = [f"p{i}" for i in range(9)]  # + trailing blank = 10
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
        aux_heads=(AuxHead("encoder_1_targets", "CTC", 10),),
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=6,
        encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    session = StreamingConformerSession(
        params, cfg, targets, phoneme_list=phonemes
    )
    rng = np.random.default_rng(11)
    L = 96  # 6 full chunks (d*chunk = 16)
    raw = rng.normal(size=(L, 8)).astype(np.float32)

    assert session.partial()["num_steps"] == 0
    steps_seen = []
    for start in range(0, L, 32):
        session.push(raw[start : start + 32])
        p = session.partial()
        steps_seen.append(p["num_steps"])
        assert all(ph in phonemes for ph in p["phonemes"][0])
    assert steps_seen == [8, 16, 24]  # grows with arrival, stream intact

    # endpoint partial == offline CTC greedy over the full encode
    enc_out, _, enc_lengths = encode(
        params, cfg, jnp.asarray(raw)[None], jnp.asarray([L]),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0), train=False,
    )
    h = enc_out
    head = params["aux"]["encoder_1_targets"]
    for mlp in head["mlp"]:
        h = jax.nn.relu(jnp.dot(h, mlp["w"]) + mlp["b"])
    logits = jnp.dot(h, head["out"]["w"]) + head["out"]["b"]
    offline = ctc_greedy_decode(logits, np.asarray(enc_lengths))[0]
    streamed = session.partial()["phonemes"][0]
    assert streamed == [phonemes[i] for i in offline]
    # lexicon path: log-probs are cached LAZILY (greedy-only calls
    # skipped them) and the rescoring returns word lists
    from ecog2txt_tpu.models.ctc import LexiconTrie

    trie = LexiconTrie({"aa": [0, 0], "ab": [0, 1], "b": [1]})
    words = session.partial(lexicon=trie)["words"]
    assert isinstance(words[0], list)
    # incremental beam state consumed exactly the emitted steps, and its
    # hypothesis equals the from-scratch search over the full history
    from ecog2txt_tpu.models.ctc import ctc_word_beam_search

    entry = session._ctc_beams[(id(trie), 8)]
    assert entry["pos"] == session._enc_steps
    logp = np.concatenate(session._ctc_logps, axis=0)[: session._enc_steps]
    assert words[0] == ctc_word_beam_search(logp[:, 0], trie, beam_width=8)
    # a second call with no new steps advances nothing and agrees
    assert session.partial(lexicon=trie)["words"] == words
    assert entry["states"][0].num_steps == session._enc_steps
    # partial() never mutated the stream: full decode still works
    out = session.endpoint()
    assert isinstance(out["sequences"][0], str)


def test_streaming_session_pool_matches_sessions_and_offline():
    """Three streams with different start times, ragged pushes, a
    mid-stream join after a release, all batched through ONE pool:
    every stream's decode/endpoint must equal a dedicated
    StreamingConformerSession fed the same samples AND the offline
    greedy decode of its own utterance."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        Seq2SeqConfig, greedy_decode, init_seq2seq,
    )
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
    )

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    rng = np.random.default_rng(7)

    def offline(raw):
        L = len(raw)
        T = ((L + 3) // 4) * 4
        inputs = np.zeros((1, T, 8), np.float32)
        inputs[:, :L] = raw
        return np.asarray(
            greedy_decode(
                params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
                jnp.asarray(0, jnp.int32), temperature=0.0,
            )
        )

    pool = StreamingSessionPool(params, cfg, targets, capacity=4)
    lengths = {"a": 147, "b": 83, "c": 64}
    raws = {k: rng.normal(size=(n, 8)).astype(np.float32)
            for k, n in lengths.items()}
    sessions = {k: StreamingConformerSession(params, cfg, targets)
                for k in raws}

    # a starts alone; b joins after a has streamed a while; interleave
    slots = {"a": pool.add()}
    fed = {k: 0 for k in raws}

    def feed(k, n):
        chunk = raws[k][fed[k] : fed[k] + n]
        if len(chunk) == 0:
            return
        pool.push(slots[k], chunk)
        sessions[k].push(chunk)
        fed[k] += len(chunk)

    feed("a", 37)
    feed("a", 37)
    slots["b"] = pool.add()
    feed("b", 29)
    feed("a", 37)
    feed("b", 29)
    # mid-stream flush of b: side-effect free, equals its session
    mid_pool = pool.decode(slots["b"])
    mid_sess = sessions["b"].decode()
    np.testing.assert_array_equal(mid_pool["tokens"], mid_sess["tokens"])
    feed("b", 29)
    feed("a", 37)  # past the end → feeds the remainder
    feed("a", 37)

    out_a = pool.endpoint(slots["a"])
    sess_a = sessions["a"].endpoint()
    np.testing.assert_array_equal(out_a["tokens"], sess_a["tokens"])
    np.testing.assert_array_equal(out_a["tokens"], offline(raws["a"]))
    np.testing.assert_allclose(
        np.asarray(out_a["encoder_outputs"], np.float32),
        np.asarray(sess_a["encoder_outputs"], np.float32),
        rtol=1e-4, atol=1e-5,
    )

    # c reuses a's released slot id mid-flight; b keeps streaming
    slots["c"] = pool.add()
    assert slots["c"] == slots["a"]  # reuse is the point
    feed("c", 64)
    feed("b", 100)
    out_c = pool.endpoint(slots["c"])
    np.testing.assert_array_equal(out_c["tokens"], offline(raws["c"]))
    out_b = pool.endpoint(slots["b"])
    sess_b = sessions["b"].endpoint()
    np.testing.assert_array_equal(out_b["tokens"], sess_b["tokens"])
    np.testing.assert_array_equal(out_b["tokens"], offline(raws["b"]))

    with pytest.raises(ValueError):
        pool.push(slots["b"], raws["b"][:8])  # released slot rejects


def test_pool_partial_matches_session_partial():
    """pool.partial(slot) must equal a dedicated session's partial()
    for the same stream — greedy phoneme ids AND carried lexicon-beam
    words — with a second concurrent stream in the pool."""
    import jax

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.ctc import LexiconTrie
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, init_seq2seq,
    )
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
    )

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    phonemes = [f"p{i}" for i in range(9)]
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
        aux_heads=(AuxHead("encoder_1_targets", "CTC", 10),),
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=6,
        encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    trie = LexiconTrie({"aa": [0, 0], "ab": [0, 1], "b": [1]})

    session = StreamingConformerSession(
        params, cfg, targets, phoneme_list=phonemes
    )
    pool = StreamingSessionPool(
        params, cfg, targets, capacity=2, phoneme_list=phonemes
    )
    rng = np.random.default_rng(11)
    L = 96
    raw = rng.normal(size=(L, 8)).astype(np.float32)
    other = rng.normal(size=(L, 8)).astype(np.float32)

    a = pool.add()
    b = pool.add()
    assert pool.partial(a)["num_steps"] == 0
    for start in range(0, L, 32):
        pool.push(a, raw[start : start + 32])
        pool.push(b, other[start : start + 32])
        session.push(raw[start : start + 32])
        pp = pool.partial(a, lexicon=trie)
        sp = session.partial(lexicon=trie)
        assert pp["num_steps"] == sp["num_steps"]
        assert pp["phonemes"] == sp["phonemes"][0]
        assert pp["words"] == sp["words"][0]


def test_pool_and_session_from_trainer(tmp_path):
    """from_trainer factories wire weights, vocab, subject index and
    the CTC phoneme list automatically; pool == session == offline on a
    trained model."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
    )
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        encoder_type="conformer",
        phoneme_sequence_distribution="CTC",
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "batch_size": 8, "max_dec_len": 10, "temperature": 0.0,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 8, "left_context": 1,
                          "conv_kernel": 4},
        },
        VERBOSE=False,
    )
    tr.fit(num_epochs=4, assess=False)  # just enough to have weights
    sess = StreamingConformerSession.from_trainer(tr)
    pool = StreamingSessionPool.from_trainer(tr, capacity=2)
    assert sess.phoneme_list is not None  # auto-wired from the CTC head
    assert pool.phoneme_list == sess.phoneme_list
    ds = tr.packed_dataset("validation")
    L = int(ds.encoder_lengths[0, 0])
    raw = np.asarray(ds.encoder_inputs[0, 0, :L], np.float32)
    a = pool.add()
    for s0 in range(0, L, 37):
        pool.push(a, raw[s0 : s0 + 37])
        sess.push(raw[s0 : s0 + 37])
    p_pool = pool.partial(a)
    p_sess = sess.partial()
    assert p_pool["phonemes"] == p_sess["phonemes"][0]
    out_pool = pool.endpoint(a)
    out_sess = sess.endpoint()
    np.testing.assert_array_equal(out_pool["tokens"], out_sess["tokens"])


def test_streaming_bf16_host_upload_parity():
    """Under bf16 compute the streaming paths build HOST buffers in
    bfloat16 (halving upload bytes — the measured pooled-tick
    bottleneck, RESULTS.md r3).  convolve_sequences casts its input to
    compute_dtype as its first device op, so the host-side pre-cast
    must be BIT-IDENTICAL to uploading f32: (1) session._convolve under
    bf16 equals the f32-upload/device-cast reference exactly; (2) a
    bf16 pool decode equals a dedicated bf16 session decode exactly."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        Seq2SeqConfig, convolve_sequences, init_seq2seq,
    )
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
        _host_input_dtype,
    )

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
        compute_dtype=jnp.bfloat16,
    )
    assert _host_input_dtype(cfg) == np.dtype("bfloat16")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    rng = np.random.default_rng(11)

    sess = StreamingConformerSession(params, cfg, targets)
    raw = rng.normal(size=(1, sess.samples_per_chunk, 8)).astype(
        np.float32
    )
    feats = np.asarray(sess._convolve(raw), np.float32)

    # reference: upload f32, let the device cast (the pre-change path)
    def conv_f32(xs_bm):
        xs = jnp.moveaxis(xs_bm, 0, 1)
        out = convolve_sequences(
            params, cfg, xs, jnp.asarray(0, jnp.int32),
            jax.random.PRNGKey(0), train=False,
        )
        return jnp.moveaxis(out, 0, 1)

    ref = np.asarray(jax.jit(conv_f32)(jnp.asarray(raw)), np.float32)
    np.testing.assert_array_equal(feats, ref)

    # pool vs dedicated session, both bf16: exact token equality
    pool = StreamingSessionPool(params, cfg, targets, capacity=2)
    a = pool.add()
    sess2 = StreamingConformerSession(params, cfg, targets)
    stream = rng.normal(size=(77, 8)).astype(np.float32)
    for lo in range(0, 77, 26):
        pool.push(a, stream[lo : lo + 26])
        sess2.push(stream[lo : lo + 26])
    out_pool = pool.endpoint(a)
    out_sess = sess2.endpoint()
    np.testing.assert_array_equal(out_pool["tokens"], out_sess["tokens"])


def test_streaming_int8_host_upload_contract():
    """host_upload='int8' (opt-in, LOSSY): the exactness contract
    becomes streamed == offline decode on the SAME int8-dequantized
    inputs (quantized per spc-block with per-row-per-channel scales,
    exactly as _quantize_host_block does on each upload), and the pool
    must agree with a dedicated session chunk for chunk.  Also pins
    the closeness of the dequantized signal (<=1/254 of each channel's
    chunk amplitude) and that an unknown mode raises."""
    import jax
    import jax.numpy as jnp
    import pytest

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        Seq2SeqConfig, greedy_decode, init_seq2seq,
    )
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
        _quantize_host_block,
    )

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    rng = np.random.default_rng(7)
    L = 147  # ragged: full chunks + a partial final block
    raw = rng.normal(size=(L, 8)).astype(np.float32)

    sess = StreamingConformerSession(
        params, cfg, targets, host_upload="int8"
    )
    pool = StreamingSessionPool(
        params, cfg, targets, capacity=2, host_upload="int8"
    )
    a = pool.add()
    for lo in range(0, L, 29):
        sess.push(raw[lo : lo + 29])
        pool.push(a, raw[lo : lo + 29])

    # offline reference on the int8-dequantized inputs: quantize each
    # spc block (and the zero-padded partial tail) exactly like the
    # upload path does
    spc = sess.samples_per_chunk
    T = ((L + cfg.decimation_factor - 1) // cfg.decimation_factor
         ) * cfg.decimation_factor
    dq = np.zeros((1, T, 8), np.float32)
    for lo in range(0, L, spc):
        block = np.zeros((1, spc, 8), np.float32)
        n = min(spc, L - lo)
        block[0, :n] = raw[lo : lo + n]
        q, scales = _quantize_host_block(block)
        deq = q.astype(np.float32) * scales[:, None, :]
        # rounding half-step is amax/254; allow float slack at the tie
        bound = np.abs(block).max(axis=1, keepdims=True) / 252 + 1e-7
        assert (np.abs(deq - block) < bound).all()
        dq[0, lo : lo + n] = deq[0, :n]
    off = np.asarray(greedy_decode(
        params, cfg, jnp.asarray(dq), jnp.asarray([L]),
        jnp.asarray(0, jnp.int32), temperature=0.0,
    ))
    out_sess = sess.endpoint()
    out_pool = pool.endpoint(a)
    np.testing.assert_array_equal(np.asarray(out_sess["tokens"]), off)
    np.testing.assert_array_equal(np.asarray(out_pool["tokens"]), off)

    with pytest.raises(ValueError, match="host_upload"):
        StreamingConformerSession(
            params, cfg, targets, host_upload="fp8"
        )
    with pytest.raises(ValueError, match="host_upload"):
        StreamingSessionPool(
            params, cfg, targets, capacity=2, host_upload="fp8"
        )


def test_pool_fuzz_random_join_leave_matches_sessions():
    """Property test: a random schedule of join / ragged-push / endpoint
    / leave events over a small pool must produce, for EVERY stream,
    exactly the tokens a dedicated session produces for the same
    samples — slot reuse, straggler ticks, and partial-chunk endpoints
    included.  Seeded; two generations exercise different interleavings."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import Seq2SeqConfig, init_seq2seq
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
    )

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]

    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        pool = StreamingSessionPool(
            params, cfg, targets, capacity=3, max_pending_chunks=2
        )
        live: dict[int, list] = {}  # slot -> [stream samples so far]
        finished = 0
        for _ in range(60):
            roll = rng.random()
            if (roll < 0.25 and len(live) < 3) or not live:
                slot = pool.add()
                live[slot] = []
            elif roll < 0.85:
                slot = int(rng.choice(list(live)))
                n = int(rng.integers(1, 40))
                pkt = rng.normal(size=(n, 8)).astype(np.float32)
                live[slot].append(pkt)
                pool.push(slot, pkt)
            else:
                slot = int(rng.choice(list(live)))
                # reconstruct this stream's full sample history
                samples = np.concatenate(live[slot], axis=0) if live[slot] \
                    else np.zeros((0, 8), np.float32)
                del live[slot]
                out_pool = pool.endpoint(slot)
                pool.release(slot)
                sess = StreamingConformerSession(params, cfg, targets)
                if len(samples):
                    sess.push(samples)
                out_sess = sess.endpoint()
                if out_pool["tokens"] is None:
                    assert out_sess["tokens"] is None
                else:
                    np.testing.assert_array_equal(
                        np.asarray(out_pool["tokens"]),
                        np.asarray(out_sess["tokens"]),
                    )
                finished += 1
        # drain the rest
        for slot in list(live):
            samples = np.concatenate(live[slot], axis=0) if live[slot] \
                else np.zeros((0, 8), np.float32)
            out_pool = pool.endpoint(slot)
            pool.release(slot)
            sess = StreamingConformerSession(params, cfg, targets)
            if len(samples):
                sess.push(samples)
            out_sess = sess.endpoint()
            if out_pool["tokens"] is None:
                assert out_sess["tokens"] is None
            else:
                np.testing.assert_array_equal(
                    np.asarray(out_pool["tokens"]),
                    np.asarray(out_sess["tokens"]),
                )
            finished += 1
        assert finished >= 5  # the schedule actually exercised endpoints


def test_raw_voltage_session_matches_offline():
    """RawVoltageSession: digitizer chunks (raw voltage) → streaming
    high-gamma front end → conformer stream → endpoint decode equals
    the offline decode of the offline-featurized recording (VERDICT r4
    missing #1: raw streaming serving).  Mid-stream decode() is
    side-effect free."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.features import (
        HighGammaConfig, calibrate_high_gamma, extract_high_gamma_np,
    )
    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        Seq2SeqConfig, greedy_decode, init_seq2seq,
    )
    from ecog2txt_tpu.serve import RawVoltageSession, StreamingConformerSession

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]

    # 1 kHz raw -> 200 Hz features (q=5); small bank keeps compiles fast
    hg = HighGammaConfig(
        raw_rate=1000.0, out_rate=200.0, num_bands=4,
        pad_seconds=0.25, zscore="none",
    )
    rng = np.random.default_rng(5)
    calib = rng.normal(size=(4000, 8)).astype(np.float32)
    stats = calibrate_high_gamma([calib], hg)
    L_raw = 1510  # not a multiple of the window, q, nor d*chunk
    raw = rng.normal(size=(L_raw, 8)).astype(np.float32)

    # offline: featurize the whole recording, apply the calibration
    # stats, pad to the conv-stride multiple, decode
    feats = extract_high_gamma_np(raw, hg)
    feats = (feats - stats[0][None]) / np.maximum(stats[1][None], 1e-6)
    L = len(feats)  # 302
    T = -(-L // 4) * 4
    inputs = np.zeros((1, T, 8), np.float32)
    inputs[:, :L] = feats
    offline_tokens = np.asarray(
        greedy_decode(
            params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
            jnp.asarray(0, jnp.int32), temperature=0.0,
        )
    )

    session = RawVoltageSession(
        StreamingConformerSession(params, cfg, targets),
        hg, stats=stats, window_seconds=0.5,
    )
    # ragged pushes; decode() mid-stream must not perturb the result
    pos = 0
    mids = []
    for step in (333, 41, 700, 129, 307):
        session.push(raw[pos : pos + step])
        pos += step
        mids.append(session.decode()["tokens"])
    np.testing.assert_array_equal(
        mids[-1], session.decode()["tokens"]  # repeatable
    )
    out = session.endpoint()
    np.testing.assert_array_equal(out["tokens"], offline_tokens)
