"""Model cores (functional: explicit param pytrees + pure apply fns)."""

from .beam import beam_decode  # noqa: F401
from .seq2seq import (  # noqa: F401
    AuxHead,
    Seq2SeqConfig,
    init_seq2seq,
    encode,
    decoder_teacher_forcing,
    seq2seq_loss,
    greedy_decode,
)
