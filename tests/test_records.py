"""Record codec tests: round-trip plus byte-level interop with TF.

The TFRecord framing + Example wire format is the reference's L2↔L5 data
contract (SURVEY §1); TensorFlow (present in the test image only) is
used as an independent oracle that our TF-free codec is
format-compatible.
"""

import numpy as np
import pytest

from ecog2txt_tpu import records


def test_crc32c_known_values():
    # Standard CRC32C test vectors (RFC 3720 appendix style).
    assert records.crc32c(b"") == 0
    assert records.crc32c(b"123456789") == 0xE3069283
    assert records.crc32c(b"a" * 32) == records._crc32c_py(b"a" * 32)


def test_native_matches_python():
    data = bytes(range(256)) * 7 + b"tail"
    assert records.crc32c(data) == records._crc32c_py(data)


def test_example_roundtrip(tmp_path, rng):
    ecog = rng.normal(size=(37, 5)).astype(np.float32)
    trial = {
        "ecog_sequence": ecog,
        "text_sequence": ["the_", "dog_", "ran_"],
        "phoneme_sequence": ["DH", "AH", "D"],
        "audio_sequence": np.zeros((0, 13), dtype=np.float32),
    }
    path = str(tmp_path / "t.tfrecord")
    with records.TFRecordWriter(path) as w:
        w.write(records.encode_example(trial))
        w.write(records.encode_example(trial))

    examples = list(records.read_examples(path))
    assert len(examples) == 2
    ex = examples[0]
    np.testing.assert_allclose(
        ex["ecog_sequence"].reshape(37, 5), ecog, rtol=1e-6
    )
    assert ex["text_sequence"] == [b"the_", b"dog_", b"ran_"]
    assert ex["audio_sequence"].size == 0

    # framing CRCs verify
    payloads = list(records.tfrecord_iterator(path, verify=True))
    assert len(payloads) == 2


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "bad.tfrecord")
    with records.TFRecordWriter(path) as w:
        w.write(b"hello world payload")
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(records.tfrecord_iterator(path, verify=True))


def test_interop_with_tensorflow(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")

    ecog = rng.normal(size=(11, 3)).astype(np.float32)
    words = ["hello_", "world_"]

    # ours → TF parses
    ours = str(tmp_path / "ours.tfrecord")
    with records.TFRecordWriter(ours) as w:
        w.write(
            records.encode_example(
                {"ecog_sequence": ecog, "text_sequence": words}
            )
        )
    ds = list(tf.data.TFRecordDataset(ours))
    assert len(ds) == 1
    parsed = tf.train.Example.FromString(ds[0].numpy())
    got = np.asarray(
        parsed.features.feature["ecog_sequence"].float_list.value
    )
    np.testing.assert_allclose(got.reshape(11, 3), ecog, rtol=1e-6)
    assert [
        v.decode() for v in parsed.features.feature["text_sequence"].bytes_list.value
    ] == words

    # TF → ours parses
    theirs = str(tmp_path / "theirs.tfrecord")
    example = tf.train.Example(
        features=tf.train.Features(
            feature={
                "ecog_sequence": tf.train.Feature(
                    float_list=tf.train.FloatList(value=ecog.flatten())
                ),
                "text_sequence": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[w.encode() for w in words]
                    )
                ),
                "counts": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[1, -2, 3])
                ),
            }
        )
    )
    with tf.io.TFRecordWriter(theirs) as w:
        w.write(example.SerializeToString())
    exs = list(records.read_examples(theirs))
    assert len(exs) == 1
    np.testing.assert_allclose(
        exs[0]["ecog_sequence"].reshape(11, 3), ecog, rtol=1e-6
    )
    assert exs[0]["text_sequence"] == [b"hello_", b"world_"]
    np.testing.assert_array_equal(exs[0]["counts"], [1, -2, 3])


def test_native_reader_matches_python_parser(tmp_path, rng):
    """The C++ batched reader (framing + CRC + protobuf decode) produces
    exactly what the pure-Python decoder produces, for float / int64 /
    bytes features across several records."""
    if records._load_native() is None:
        pytest.skip("native toolchain unavailable")
    path = str(tmp_path / "fast.tfrecord")
    payloads = []
    with records.TFRecordWriter(path) as w:
        for i in range(5):
            ex = records.encode_example({
                "ecog_sequence": rng.normal(size=(50 + i, 3)).astype(
                    np.float32).ravel().tolist(),
                "block": [i, i * 7],
                "text_sequence": [f"word{i}_".encode(), b"x_"],
                "empty": np.zeros(0, np.float32),
            })
            w.write(ex)
            payloads.append(ex)
    native = list(records.read_examples_native(path))
    python = [records.parse_example(p) for p in payloads]
    assert len(native) == len(python) == 5
    for a, b in zip(native, python):
        assert set(a) == set(b)
        np.testing.assert_array_equal(a["ecog_sequence"], b["ecog_sequence"])
        assert a["ecog_sequence"].dtype == np.float32
        np.testing.assert_array_equal(a["block"], b["block"])
        assert a["block"].dtype == np.int64
        assert a["text_sequence"] == b["text_sequence"]
        assert len(a["empty"]) == 0
    # read_examples dispatches to the native path when available
    again = list(records.read_examples(path))
    np.testing.assert_array_equal(
        again[3]["ecog_sequence"], python[3]["ecog_sequence"]
    )


def test_native_reader_detects_corruption(tmp_path):
    if records._load_native() is None:
        pytest.skip("native toolchain unavailable")
    path = str(tmp_path / "corrupt.tfrecord")
    with records.TFRecordWriter(path) as w:
        w.write(records.encode_example({"a": [1.0, 2.0]}))
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError, match="CRC"):
        list(records.read_examples_native(path))
    # verify=False skips the checksums and decodes the (corrupt) bytes
    # or raises on malformed proto — either way no CRC error
    try:
        list(records.read_examples_native(path, verify=False))
    except IOError as e:
        assert "CRC" not in str(e)


def test_native_reader_robustness_edges(tmp_path, rng):
    """Native-loader edges: a corrupt huge length field fails cleanly
    even with verify=False (overflow-safe framing bound); >256-feature
    Examples and split list fields fall back to the Python decoder with
    identical results."""
    if records._load_native() is None:
        pytest.skip("native toolchain unavailable")
    # corrupt 8-byte length -> clean IOError, not an OOB read
    path = str(tmp_path / "huge.tfrecord")
    with records.TFRecordWriter(path) as w:
        w.write(records.encode_example(
            {"a": rng.normal(size=(2048,)).astype(np.float32)}
        ))
    data = bytearray(open(path, "rb").read())
    data[0:8] = (0xFFFFFFFFFFFFFFF0).to_bytes(8, "little")
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError, match="framing"):
        list(records.read_examples_native(path, verify=False))
    # >_MAX_FEATURES features: native indexer defers to parse_example
    many = {f"f{i:03d}": [float(i)] for i in range(300)}
    many["ecog_sequence"] = rng.normal(size=(4096,)).astype(
        np.float32).tolist()
    path2 = str(tmp_path / "many.tfrecord")
    with records.TFRecordWriter(path2) as w:
        w.write(records.encode_example(many))
    out = list(records.read_examples_native(path2))[0]
    assert len(out) == 301
    assert out["f123"][0] == pytest.approx(123.0)
    # a Feature whose float_list is split across two occurrences (legal
    # protobuf merge encoding): both decoders concatenate identically
    def float_list_msg(vals):  # FloatList{ value (packed) = vals }
        return records._length_delimited(
            1, np.asarray(vals, "<f4").tobytes()
        )

    feature_msg = (  # Feature with float_list serialized TWICE
        records._length_delimited(2, float_list_msg([1.0, 2.0]))
        + records._length_delimited(2, float_list_msg([3.0]))
    )
    entry_msg = (  # map entry: key = 1, value(Feature) = 2
        records._length_delimited(1, b"split")
        + records._length_delimited(2, feature_msg)
    )
    payload = records._length_delimited(  # Example.features = 1
        1, records._length_delimited(1, entry_msg)
    )
    py = records.parse_example(payload)
    np.testing.assert_allclose(py["split"], [1.0, 2.0, 3.0])
    path3 = str(tmp_path / "split.tfrecord")
    with records.TFRecordWriter(path3) as w:
        w.write(payload)
    # pad the record size over the native-dispatch threshold by reading
    # the native generator directly
    nat = list(records.read_examples_native(path3))[0]
    np.testing.assert_allclose(nat["split"], [1.0, 2.0, 3.0])


def test_codec_property_roundtrip(tmp_path):
    """Property-based round-trip: arbitrary feature dicts survive
    encode → TFRecord framing → both decoders identically."""
    from hypothesis import given, settings, strategies as st

    if records._load_native() is None:
        pytest.skip("native toolchain unavailable")

    keys = st.text(
        st.characters(min_codepoint=33, max_codepoint=0x24F), min_size=1,
        max_size=24,
    )
    floats = st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        max_size=40,
    ).map(lambda v: np.asarray(v, np.float32))
    ints = st.lists(
        st.integers(-(2**63), 2**63 - 1), max_size=40
    ).map(lambda v: np.asarray(v, np.int64))
    blobs = st.lists(st.binary(max_size=32), max_size=8)
    features = st.dictionaries(
        keys, st.one_of(floats, ints, blobs), min_size=1, max_size=8
    )

    path = str(tmp_path / "prop.tfrecord")

    @settings(max_examples=60, deadline=None)
    @given(features)
    def check(feats):
        payload = records.encode_example(feats)
        with records.TFRecordWriter(path) as w:
            w.write(payload)
        py = records.parse_example(payload)
        nat = list(records.read_examples_native(path))[0]
        assert set(py) == set(nat) == set(feats)
        for k, v in feats.items():
            if isinstance(v, list):  # bytes features
                assert py[k] == v and nat[k] == v
            else:
                np.testing.assert_array_equal(py[k], v)
                np.testing.assert_array_equal(nat[k], v)
                assert nat[k].dtype == v.dtype

    check()
