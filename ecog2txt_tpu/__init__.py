"""ecog2txt_tpu — TPU-native brain-to-text (ECoG → sentence) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
jgmakin/ecog2txt (reference: /root/reference/ecog2txt) *and* of the
seq2seq core that repo outsources to the absent ``machine_learning``
package.  Compute path is jit/pjit/shard_map over a TPU device mesh;
recurrences are ``lax.scan`` with optional Pallas fused kernels; storage
is TFRecord-compatible (own codec, no TensorFlow dependency) + Orbax
checkpoints.

Package layout:
    config      — experiment manifests (YAML) + block breakdowns (JSON)
    geometry    — electrode grid layouts, channel referencing, subgrids
    audio       — mel-filterbank / MFCC featurization
    tokenizers  — word / word-piece / trial tokenization + vocab handling
    records     — TFRecord container + tf.train.Example codec (pure py/C++)
    datagen     — ECoGDataGenerator contract + synthetic generator
    subjects    — ECoGSubject, SequenceDataManifest, counters
    pipeline    — parsed examples → padded device-sharded batches
    ops         — LSTM cells/scans (+ Pallas fused kernels)
    models      — seq2seq encoder-decoder (functional, pytree params)
    parallel    — mesh construction + sharding rules
    train       — MultiSubjectTrainer, EMA, assessment, checkpoints
    assess      — WER / accuracy / confusions / statistical tests
    serve       — online (streaming) predictor
    plotting    — results plotting & analysis figures

Constants below mirror the reference package module
(``ecog2txt/__init__.py:10-82``): special tokens, token types, data
partitions, and phonetic feature tables.
"""

import os

import pandas as pd

__version__ = "0.1.0"

# Directory where vocab files and manifests live (reference:
# ecog2txt/__init__.py:10 pins this to the package's auxiliary/ dir).
text_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "auxiliary")

# Special tokens (reference: ecog2txt/__init__.py:13-15).
EOS_token = "<EOS>"
pad_token = "<pad>"
OOV_token = "<OOV>"
SPECIAL_TOKENS = (pad_token, EOS_token, OOV_token)

# Recognised token types (reference: ecog2txt/__init__.py:18-21; validated
# by the trainer before anything is built).
TOKEN_TYPES = (
    "phoneme",
    "word",
    "trial",
    "word_sequence",
    "word_piece_sequence",
    "phoneme_sequence",
)

# Dataset partitions (reference: ecog2txt/__init__.py:22).
DATA_PARTITIONS = ("training", "validation", "testing")


def _build_consonant_df() -> pd.DataFrame:
    """Phonetic-feature table for English consonants.

    Standard articulatory features (voicing / place / manner) with the
    ARPABET code for each IPA consonant; same capability as the
    reference's consonant table (ecog2txt/__init__.py:25-70), rebuilt
    from public phonetics (IPA chart for General American English).
    Index = IPA symbol.
    """
    rows = {
        # ipa: (voiced, place, manner, arpabet)
        "p": (False, "bilabial", "plosive", "P"),
        "b": (True, "bilabial", "plosive", "B"),
        "t": (False, "alveolar", "plosive", "T"),
        "d": (True, "alveolar", "plosive", "D"),
        "k": (False, "velar", "plosive", "K"),
        "g": (True, "velar", "plosive", "G"),
        "tʃ": (False, "postalveolar", "affricate", "CH"),
        "dʒ": (True, "postalveolar", "affricate", "JH"),
        "f": (False, "labiodental", "fricative", "F"),
        "v": (True, "labiodental", "fricative", "V"),
        "θ": (False, "dental", "fricative", "TH"),
        "ð": (True, "dental", "fricative", "DH"),
        "s": (False, "alveolar", "fricative", "S"),
        "z": (True, "alveolar", "fricative", "Z"),
        "ʃ": (False, "postalveolar", "fricative", "SH"),
        "ʒ": (True, "postalveolar", "fricative", "ZH"),
        "h": (False, "glottal", "fricative", "HH"),
        "m": (True, "bilabial", "nasal", "M"),
        "n": (True, "alveolar", "nasal", "N"),
        "ŋ": (True, "velar", "nasal", "NG"),
        "l": (True, "alveolar", "lateral", "L"),
        "ɹ": (True, "alveolar", "approximant", "R"),
        "w": (True, "bilabial", "approximant", "W"),
        "j": (True, "palatal", "approximant", "Y"),
    }
    return pd.DataFrame.from_dict(
        rows, orient="index", columns=["voiced", "place", "manner", "arpabet"]
    )


def _build_vowel_df() -> pd.DataFrame:
    """Formant table (F1/F2, Hz) for American English monophthongs.

    Mean adult-male formant frequencies from Hillenbrand, Getty, Clark &
    Wheeler (1995) — the same public source the reference cites
    (ecog2txt/__init__.py:72-82).  Index = IPA symbol; arpabet column
    added for tokenizer interop.
    """
    rows = {
        # ipa: (F1, F2, arpabet)  — Hillenbrand et al. 1995, men
        "i": (342, 2322, "IY"),
        "ɪ": (427, 2034, "IH"),
        "e": (476, 2089, "EY"),
        "ɛ": (580, 1799, "EH"),
        "æ": (588, 1952, "AE"),
        "ɑ": (768, 1333, "AA"),
        "ɔ": (652, 997, "AO"),
        "o": (497, 910, "OW"),
        "ʊ": (469, 1122, "UH"),
        "u": (378, 997, "UW"),
        "ʌ": (623, 1200, "AH"),
        "ɝ": (474, 1379, "ER"),
    }
    return pd.DataFrame.from_dict(
        rows, orient="index", columns=["F1", "F2", "arpabet"]
    )


consonant_df = _build_consonant_df()
vowel_df = _build_vowel_df()

# Full ARPABET phoneme inventory (consonants + vowels + silence marker),
# used by the synthetic generator and the demo phoneme vocab.
ARPABET_PHONEMES = tuple(
    sorted(set(consonant_df["arpabet"]) | set(vowel_df["arpabet"]))
)


def phoneme_features(arpabet: str) -> dict:
    """Articulatory/acoustic features for one ARPABET phoneme."""
    c = consonant_df[consonant_df["arpabet"] == arpabet]
    if len(c):
        return c.iloc[0].to_dict()
    v = vowel_df[vowel_df["arpabet"] == arpabet]
    if len(v):
        return v.iloc[0].to_dict()
    raise KeyError(f"unknown phoneme {arpabet!r}")
