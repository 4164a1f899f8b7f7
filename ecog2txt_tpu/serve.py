"""Online / streaming inference.

Rebuilds ``construct_online_predictor`` (reference trainers.py:925-949):
load saved weights, return a ``predict(inputs)`` closure producing token
probabilities + detokenized text (reference feeds ``encoder_inputs:0``
into a live TF session and fetches ``decoder_probs:0`` /
``decoder_outputs:0``; here the saved model is an Orbax checkpoint and
predict is one jitted call).

Also provides :class:`StreamingSession` — the chunked-inference path for
long continuous recordings (BASELINE configs[4]): ECoG arrives in
chunks; the session re-decodes on demand.  The flagship encoder is
bidirectional over a reversed input, i.e. inherently utterance-level
(the reference is the same), so streaming here means **latency hiding**:
fixed-size padded buffers keep the jit cache warm so an end-of-utterance
decode is a single pre-compiled device call; truly incremental
carried-state encoding is the causal/Conformer variant's job
(models/, later).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np

from .models.seq2seq import Seq2SeqConfig, greedy_decode, encode, decoder_teacher_forcing
from .tokenizers import target_inds_to_sequences


class OnlinePredictor:
    """Jitted single/multi-trial predictor over fixed padded shapes."""

    def __init__(
        self,
        params,
        config: Seq2SeqConfig,
        targets_list: Sequence[str],
        max_samples: int = 1248,
        subject_idx: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        self.params = params
        self.config = config
        self.targets_list = list(targets_list)
        self.max_samples = int(max_samples)
        self._subject_idx = jnp.asarray(subject_idx, jnp.int32)

        @jax.jit
        def _predict(params, inputs, lengths):
            tokens = greedy_decode(
                params, config, inputs, lengths, self._subject_idx,
                temperature=0.0,
            )
            # per-step probabilities of the emitted tokens under teacher
            # forcing on the hypothesis (the reference fetches
            # decoder_probs alongside decoder_outputs)
            dummy = jax.random.PRNGKey(0)
            enc_out, enc_final, enc_lengths = encode(
                params, config, inputs, lengths, self._subject_idx,
                dummy, train=False,
            )
            logits = decoder_teacher_forcing(
                params, config, enc_final, tokens, dummy, train=False,
                enc_out=enc_out, enc_lengths=enc_lengths,
            )  # (L, B, V)
            probs = jax.nn.softmax(logits, axis=-1)
            tok_probs = jnp.take_along_axis(
                probs, jnp.moveaxis(tokens, 0, 1)[..., None], axis=-1
            )[..., 0]
            return tokens, jnp.moveaxis(tok_probs, 0, 1)

        self._predict = _predict

    @classmethod
    def from_trainer(cls, trainer, use_ema: bool = True, **kwargs):
        params = trainer.state.ema if use_ema else trainer.state.params
        dec_list = trainer.target_subject.data_manifests[
            "decoder_targets"
        ].feature_list
        return cls(
            params,
            trainer.net_config,
            dec_list,
            max_samples=trainer.target_subject.data_generator.max_samples,
            subject_idx=len(trainer.ecog_subjects) - 1,
            **kwargs,
        )

    @classmethod
    def from_checkpoint(
        cls,
        restore_dir: str,
        config: Seq2SeqConfig,
        targets_list: Sequence[str],
        **kwargs,
    ):
        """Load EMA weights from an Orbax checkpoint dir written by
        MultiSubjectTrainer.save_checkpoint."""
        import jax
        import numpy as _np
        import orbax.checkpoint as ocp

        from .models.seq2seq import init_seq2seq

        template = {
            "params": init_seq2seq(jax.random.PRNGKey(0), config),
            "ema": init_seq2seq(jax.random.PRNGKey(0), config),
            "epoch": _np.asarray(0, _np.int32),
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(restore_dir), template)
        return cls(restored["ema"], config, targets_list, **kwargs)

    def __call__(self, inputs: np.ndarray) -> dict:
        """``inputs``: (T, C) single trial or (B, T, C) batch.  Returns
        {'sequences': [str], 'tokens': (B, L), 'probabilities': (B, L)}.
        """
        import jax.numpy as jnp

        inputs = np.asarray(inputs, np.float32)
        if inputs.ndim == 2:
            inputs = inputs[None]
        B, T, C = inputs.shape
        Cp = self.config.in_channels
        padded = np.zeros((B, self.max_samples, Cp), np.float32)
        padded[:, : min(T, self.max_samples), :C] = inputs[
            :, : self.max_samples, :Cp
        ]
        lengths = np.full((B,), min(T, self.max_samples), np.int32)
        tokens, probs = self._predict(
            self.params, jnp.asarray(padded), jnp.asarray(lengths)
        )
        tokens = np.asarray(tokens)
        return {
            "tokens": tokens,
            "probabilities": np.asarray(probs),
            "sequences": target_inds_to_sequences(tokens, self.targets_list),
        }


def construct_online_predictor(
    restore_dir: str,
    targets_list: Sequence[str],
    config: Seq2SeqConfig,
    TARGETS_ARE_SEQUENCES: bool = True,
    **kwargs,
) -> Callable[[np.ndarray], list[str]]:
    """Reference-parity factory (trainers.py:925-949): returns a
    ``predict(inputs) -> sentences`` closure."""
    predictor = OnlinePredictor.from_checkpoint(
        restore_dir, config, targets_list, **kwargs
    )

    def predict(inputs: np.ndarray) -> list[str]:
        return predictor(inputs)["sequences"]

    return predict


class StreamingSession:
    """Chunked-arrival inference over a ring buffer of raw ECoG.

    ``push(chunk)`` appends (T_chunk, C) samples; ``decode()`` runs the
    predictor over the current utterance buffer (one pre-compiled call —
    fixed padded shape keeps the jit cache warm); ``endpoint()`` decodes
    and resets for the next utterance."""

    def __init__(self, predictor: OnlinePredictor):
        self.predictor = predictor
        self._buffer: list[np.ndarray] = []
        self._samples = 0

    @property
    def num_samples(self) -> int:
        return self._samples

    def push(self, chunk: np.ndarray) -> None:
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim != 2:
            raise ValueError("chunk must be (T, C)")
        space = self.predictor.max_samples - self._samples
        if space <= 0:
            return  # utterance cap reached (reference clips, too)
        chunk = chunk[:space]
        self._buffer.append(chunk)
        self._samples += len(chunk)

    def decode(self) -> dict:
        if not self._buffer:
            return {"sequences": [""], "tokens": None, "probabilities": None}
        utterance = np.concatenate(self._buffer, axis=0)
        return self.predictor(utterance)

    def endpoint(self) -> dict:
        out = self.decode()
        self.reset()
        return out

    def reset(self) -> None:
        self._buffer = []
        self._samples = 0
