"""Tokenizer / vocab tests (SURVEY §4: tokenizer/vocab round-trip)."""

import pytest

from ecog2txt_tpu import EOS_token, OOV_token, pad_token
from ecog2txt_tpu import tokenizers as tok


def test_word_tokenize():
    assert tok.sentence_tokenize("the dog ran") == ["the_", "dog_", "ran_"]


def test_trial_tokenize_single_token():
    assert tok.sentence_tokenize("the dog", "trial") == ["the_dog_"]


def test_phoneme_tokenize_no_suffix():
    assert tok.sentence_tokenize("DH AH D", "phoneme_sequence") == [
        "DH", "AH", "D",
    ]


def test_special_token_order():
    out = tok.with_special_tokens(["b_", "a_"])
    assert out[:3] == [pad_token, EOS_token, OOV_token]
    assert out[3:] == ["b_", "a_"]


def test_string_seq_to_index_seq_oov_and_eos():
    classes = tok.with_special_tokens(["the_", "dog_"])
    out = tok.string_seq_to_index_seq(
        ["the_", "zebra_", "dog_"], classes, APPEND_EOS=True
    )
    assert out == [3, classes.index(OOV_token), 4, classes.index(EOS_token)]


def test_oov_index_fallback():
    assert tok.oov_index(["a", "b", "c", "d"]) == 2
    assert tok.oov_index([pad_token, EOS_token, OOV_token]) == 2


def test_detokenize_strips_pad_eos():
    classes = tok.with_special_tokens(["the_", "dog_", "ran_"])
    hyp = [[3, 4, 5, 1, 0, 0], [4, 1, 3]]
    out = tok.target_inds_to_sequences(hyp, classes)
    assert out == ["the dog ran", "dog"]


def test_vocab_file_roundtrip(tmp_path):
    path = str(tmp_path / "vocab.test")
    tokens = tok.with_special_tokens(["hello_", "world_"])
    tok.write_vocab_file(path, tokens)
    assert tok.read_vocab_file(path) == tokens


def test_reference_vocab_file_loads():
    # the reference vocab format: special tokens first, then word_ tokens
    import os

    ref = "/root/reference/ecog2txt/auxiliary/vocab.mocha-timit.1806"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    vocab = tok.read_vocab_file(ref)
    assert vocab[:3] == [pad_token, EOS_token, OOV_token]
    assert len(vocab) == 1806
    assert all(v.endswith("_") for v in vocab[3:10])


def test_subword_encoder_roundtrip():
    corpus = [
        "the quick brown fox",
        "the lazy dog",
        "quick dogs run",
    ] * 5
    enc = tok.SubwordEncoder.build_from_corpus(corpus, target_vocab_size=64)
    for sentence in ["the quick dog", "lazy fox run"]:
        tokens = enc.encode(sentence)
        assert enc.decode(tokens) == sentence


def test_subword_tokenize_mode():
    enc = tok.SubwordEncoder.build_from_corpus(["abc abd"], target_vocab_size=32)
    out = tok.sentence_tokenize("abc", "word_piece_sequence", subword_encoder=enc)
    assert enc.decode(out) == "abc"
    with pytest.raises(ValueError):
        tok.sentence_tokenize("abc", "word_piece_sequence")
