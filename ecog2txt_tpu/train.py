"""Training orchestration: the MultiSubjectTrainer.

Rebuilds the reference's ``MultiSubjectTrainer`` (reference
trainers.py:41-922) *and* the fit/assess engine of the absent
``machine_learning`` core it delegates to — as a TPU-native design:

* whole corpus resident in HBM (pipeline.PackedDataset), minibatches
  gathered on-device by traced index;
* an **assessment interval of epochs is ONE jitted `lax.scan`** over the
  precomputed (subject, indices) schedule — the reference's per-batch
  ``session.run`` hot loop (SURVEY §3.3) collapses into a single device
  call;
* EMA shadow parameters maintained inside the scan and used for every
  assessment (reference keeps EMA vars in-checkpoint and assesses with
  them, trainers.py:466-468,693-694);
* transfer learning = optax masked updates over the ``subnet`` /
  ``shared`` pytree split (the reference's scope regexes
  ``seq2seq/subnet`` vs ``seq2seq/(?!subnet)``, trainers.py:337-338);
* Orbax checkpoints with explicit metadata (epoch discovery replaces
  the reference's ``model.ckpt-*.index`` scan, trainers.py:235-255).

API parity: ``parallel_transfer_learn`` (joint multi-subject fit,
trainers.py:303-327), ``sequential_transfer_learn`` (freeze/reuse
curriculum, :329-374), ``assess_saved_model`` (:376-381),
``set_feature_lists`` 4-level vocab resolution (:147-211),
``subject_to_table`` (:639-665), ``count_all_targets`` (:622-637),
``print_tensor_names`` (:667-675), ``tf_record_to_numpy_data``
(:861-922), ``get_saliencies`` (:703-732), ``get_encoder_embedding``
(:734-751), ``_save_results`` accuracies file (:556-620).
"""

from __future__ import annotations

import os
import pickle
import re
from functools import partial
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import DATA_PARTITIONS, EOS_token, TOKEN_TYPES, pad_token
from .assess import confusion_matrix, sequence_accuracy, wer_vector
from .config import Manifest, load_experiment_manifest
from .models.conformer import ConformerConfig
from .models.seq2seq import (
    AuxHead,
    Seq2SeqConfig,
    encode,
    greedy_decode,
    init_seq2seq,
    seq2seq_loss,
)
from .pipeline import PackedDataset, make_schedule, pack_partition
from .records import read_examples
from .subjects import ECoGSubject
from .tokenizers import (
    read_vocab_file,
    target_inds_to_sequences,
    with_special_tokens,
)


class TrainState(NamedTuple):
    params: Any
    ema: Any
    opt_state: Any
    epoch: jax.Array  # scalar int32


# --------------------------------------------------------------------------
# jitted training segment (N epochs in one device call)
# --------------------------------------------------------------------------


def make_segment_runner(
    config: Seq2SeqConfig,
    optimizer: optax.GradientTransformation,
    penalty_scales: dict[str, float],
    ema_decay: float,
    mesh=None,
    sp=None,
    pp=None,
) -> Callable:
    """Build the scanned multi-step runner.  ``data`` is the stacked
    (S, N, ...) batch dict; schedule arrays pick (subject, trials) per
    step.  With ``mesh``, every gathered batch is constrained to the
    ``data`` mesh axis on its leading dim — params stay replicated and
    XLA inserts the gradient all-reduce over ICI (SURVEY §2.9: the
    reference's NCCL towers become sharding annotations)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))
        n_data = mesh.shape["data"]

    def train_step(state: TrainState, data, subject, idx, rng):
        batch = {
            key: value[subject][idx] for key, value in data.items()
        }
        batch["subject_idx"] = subject
        if mesh is not None:
            batch = {
                key: (
                    jax.lax.with_sharding_constraint(value, batch_sharding)
                    if hasattr(value, "ndim")
                    and value.ndim >= 1
                    and value.shape
                    and value.shape[0] % n_data == 0
                    else value
                )
                for key, value in batch.items()
            }

        def loss_fn(params):
            return seq2seq_loss(
                params, config, batch, rng, train=True,
                penalty_scales=penalty_scales, sp=sp, pp=pp,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema,
            params,
        )
        return TrainState(params, ema, opt_state, state.epoch), metrics

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("epochs_in_segment",))
    def run_segment(
        state: TrainState,
        data: dict,
        subject_per_step: jax.Array,  # (K,)
        indices_per_step: jax.Array,  # (K, B)
        rng: jax.Array,
        epochs_in_segment: int,
    ):
        def body(carry, xs):
            state, rng = carry
            subject, idx = xs
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, data, subject, idx, sub)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), (subject_per_step, indices_per_step)
        )
        state = state._replace(epoch=state.epoch + epochs_in_segment)
        return state, jax.tree.map(lambda m: m.mean(), metrics)

    return run_segment


# --------------------------------------------------------------------------
# trainer
# --------------------------------------------------------------------------


class MultiSubjectTrainer:
    """Main user-facing API object (reference README.md:70-102).

    The LAST subject id is the target subject; all earlier ids are
    transfer donors trained with ``pretrain_all_blocks`` (reference
    trainers.py:72-82)."""

    def __init__(
        self,
        experiment_manifest_name: str,
        subject_ids: Sequence[int],
        text_dir: str | None = None,
        SN_kwargs: dict | None = None,
        DG_kwargs: dict | None = None,
        ES_kwargs: dict | None = None,
        RP_kwargs: dict | None = None,
        VERBOSE: bool = True,
        seed: int = 0,
        **kwargs: Any,
    ):
        # multi-host (DCN) bootstrap BEFORE any JAX computation:
        # SN_kwargs['distributed'] = {coordinator_address, num_processes,
        # process_id} wires the processes together; jax.devices() is the
        # global device list afterwards (SURVEY §2.9 multi-node row)
        if (SN_kwargs or {}).get("distributed"):
            from .parallel import initialize_distributed

            initialize_distributed(**SN_kwargs["distributed"])
        self.subject_ids = [int(s) for s in subject_ids]
        self._manifest_path = experiment_manifest_name
        self._text_dir = text_dir
        self._trial_subset: dict[int, Any] = {}
        self.manifests = load_experiment_manifest(
            experiment_manifest_name, text_dir
        )
        self.SN_kwargs = dict(SN_kwargs or {})
        self.DG_kwargs = dict(DG_kwargs or {})
        if text_dir is not None:
            # generators resolve vocab files / the default bad_electrodes
            # against text_dir; a trainer-level override must reach them
            self.DG_kwargs.setdefault("text_dir", text_dir)
        self.ES_kwargs = dict(ES_kwargs or {})
        self.RP_kwargs = dict(RP_kwargs or {})
        self.kwargs = kwargs
        self.VERBOSE = VERBOSE
        self.seed = seed
        self.vprint = print if VERBOSE else (lambda *a, **k: None)

        manifest = self.manifests[self.subject_ids[-1]]
        token_type = manifest.resolve("token_type", default="word_sequence")
        if token_type not in TOKEN_TYPES:
            raise ValueError(f"unrecognized token_type {token_type!r}")
        self.token_type = token_type
        self.TARGETS_ARE_SEQUENCES = token_type.endswith("sequence")

        # one ECoGSubject per id; all but the last pretrain on all blocks
        self.ecog_subjects = [
            ECoGSubject(
                self.manifests[sid],
                sid,
                pretrain_all_blocks=(sid != self.subject_ids[-1]),
                DG_kwargs=self.DG_kwargs,
                **self.ES_kwargs,
            )
            for sid in self.subject_ids
        ]

        # per-tensor wiring: APPEND_EOS on sequence decoder targets,
        # penalty scales from `<seq_type>_penalty_scale` manifest keys
        # (reference trainers.py:94-102)
        for subject in self.ecog_subjects:
            if self.TARGETS_ARE_SEQUENCES:
                subject.set_append_eos("decoder_targets", True)

        self.set_feature_lists()
        self._build_net()

    # -- manifest-derived properties ---------------------------------------

    @property
    def target_subject(self) -> ECoGSubject:
        return self.ecog_subjects[-1]

    @property
    def manifest(self) -> Manifest:
        return self.manifests[self.subject_ids[-1]]

    @property
    def checkpoint_dir(self) -> str:
        path = self.manifest.resolve(
            "checkpoint_dir",
            self.SN_kwargs.get("checkpoint_dir"),
            os.path.join(
                self.manifest.resolve("saved_results_dir", default="."),
                "checkpoints",
            ),
        )
        os.makedirs(path, exist_ok=True)
        return path

    @property
    def results_plotter(self):
        """Lazily-constructed per-target-subject plotter (reference
        trainers.py:259-275); assign to replace."""
        if getattr(self, "_results_plotter", None) is None:
            from .plotting import ResultsPlotter

            self._results_plotter = ResultsPlotter(
                self.target_subject, self, VERBOSE=self.VERBOSE
            )
        return self._results_plotter

    @results_plotter.setter
    def results_plotter(self, plotter) -> None:
        self._results_plotter = plotter

    # -- vocab resolution (reference trainers.py:147-211) ------------------

    def set_feature_lists(self) -> None:
        """4-level resolution per categorical sequence type:
        (1) explicit ``<seq_type>_vocab_list`` kwarg →
        (2) vocab file → (3) pickled list in checkpoint_dir →
        (4) induced training-∩ / validation-∪ across subjects."""
        mapping = self.target_subject.data_mapping
        for tensor_key, seq_type in mapping.items():
            manifest0 = self.target_subject.data_manifests[tensor_key]
            if not manifest0.is_categorical:
                continue
            class_list = self.kwargs.get(f"{seq_type}_vocab_list")
            if class_list is None:
                vocab_file = self.manifest.resolve(f"{seq_type}_vocab_file")
                if vocab_file is not None:
                    # the vocab file lives in text_dir (reference
                    # README.md:49, data_generators.py:235-245): try the
                    # trainer's text_dir (where the manifest was loaded
                    # from), then the packaged auxiliary/ default
                    from . import text_dir as default_text_dir

                    candidates = (
                        [vocab_file]
                        if os.path.isabs(vocab_file)
                        else [
                            os.path.join(d, vocab_file)
                            for d in (self._text_dir, default_text_dir)
                            if d
                        ]
                    )
                    for path in candidates:
                        if os.path.exists(path):
                            class_list = read_vocab_file(path)
                            break
            if class_list is None:
                pkl = os.path.join(
                    self.checkpoint_dir, f"{seq_type}_vocab_file.pkl"
                )
                if os.path.exists(pkl):
                    with open(pkl, "rb") as f:
                        class_list = pickle.load(f)
            if class_list is None:
                class_list = self._training_intersection_validation_union(
                    seq_type
                )
                pkl = os.path.join(
                    self.checkpoint_dir, f"{seq_type}_vocab_file.pkl"
                )
                with open(pkl, "wb") as f:
                    pickle.dump(class_list, f)
            class_list = with_special_tokens(
                class_list, self.TARGETS_ARE_SEQUENCES
            )
            for subject in self.ecog_subjects:
                subject.set_feature_list(tensor_key, class_list)

    def _training_intersection_validation_union(
        self, sequence_type: str
    ) -> list[str]:
        """Induced vocab: per-partition reduce over subjects (∩ for
        training, ∪ otherwise), then ∪ over partitions, order-preserving
        (reference trainers.py:410-442)."""
        per_partition: dict[str, list[str]] = {}
        for partition in DATA_PARTITIONS:
            lists = []
            for subject in self.ecog_subjects:
                blocks = sorted(subject.block_ids(partition))
                lists.append(
                    subject.data_generator.write_to_Protobuf_maybe(
                        sequence_type, blocks
                    )
                )
            if not lists:
                per_partition[partition] = []
                continue
            if partition == "training":
                keep = set(lists[0])
                for l in lists[1:]:
                    keep &= set(l)
                per_partition[partition] = [t for t in lists[0] if t in keep]
            else:
                merged: dict[str, None] = {}
                for l in lists:
                    for t in l:
                        merged.setdefault(t)
                per_partition[partition] = list(merged)
        out: dict[str, None] = {}
        for partition in DATA_PARTITIONS:
            for t in per_partition[partition]:
                out.setdefault(t)
        return list(out)

    # -- net construction ---------------------------------------------------

    def _build_net(self) -> None:
        manifest = self.manifest
        # SN_kwargs['layer_sizes'] overrides the manifest so grid
        # searches can sweep ARCHITECTURE cells (the reference's grid
        # archives project over layer_sizes, plotters.py:2159-2257);
        # partial dicts override per scope, other scopes fall through
        layer_sizes = dict(manifest.resolve("layer_sizes", default={}))
        layer_sizes.update(self.SN_kwargs.get("layer_sizes") or {})
        target_manifests = self.target_subject.data_manifests

        aux_heads = []
        self.penalty_scales: dict[str, float] = {}
        for tensor_key, dm in target_manifests.items():
            if tensor_key in ("encoder_inputs", "decoder_targets"):
                self.penalty_scales.setdefault(tensor_key, dm.penalty_scale)
                continue
            if dm.distribution == "CTC":
                # +1 output class: the CTC blank (models/ctc.py)
                aux_heads.append(
                    AuxHead(tensor_key, "CTC", dm.num_features + 1)
                )
            else:
                # regression heads honor the manifest's DECLARED
                # distribution (reference subjects.py:369-384 —
                # ecog_sequence defaults to 'Rayleigh'); unknown tags
                # fail fast in seq2seq_loss rather than silently MSE
                aux_heads.append(
                    AuxHead(
                        tensor_key,
                        "categorical" if dm.is_categorical
                        else dm.distribution,
                        dm.num_features,
                    )
                )
            self.penalty_scales[tensor_key] = dm.penalty_scale

        in_channels = max(
            s.data_generator.num_ECoG_channels for s in self.ecog_subjects
        )
        dec_list = target_manifests["decoder_targets"].feature_list
        TEMPORALLY_CONVOLVE = bool(
            manifest.resolve(
                "TEMPORALLY_CONVOLVE",
                self.SN_kwargs.get("TEMPORALLY_CONVOLVE"),
                True,
            )
        )
        conv_sizes = (
            tuple(layer_sizes.get("encoder_embedding", [100]))
            if TEMPORALLY_CONVOLVE
            else ()
        )
        self.net_config = Seq2SeqConfig(
            vocab_size=len(dec_list),
            num_subjects=len(self.ecog_subjects),
            in_channels=in_channels,
            conv_sizes=conv_sizes,
            decimation_factor=self.target_subject.decimation_factor,
            rnn_sizes=tuple(layer_sizes.get("encoder_rnn", [400] * 3)),
            aux_proj_sizes=tuple(
                layer_sizes.get("encoder_1_projection", [225])
            ),
            aux_heads=tuple(aux_heads),
            dec_embedding_size=layer_sizes.get("decoder_embedding", [150])[0],
            dec_rnn_sizes=tuple(layer_sizes.get("decoder_rnn", [800])),
            max_dec_len=int(
                self.SN_kwargs.get(
                    "max_dec_len",
                    manifest.resolve(
                        "max_dec_len",
                        # non-sequence token types ('word'/'trial') are
                        # one-token classification: decode one step
                        default=20 if self.TARGETS_ARE_SEQUENCES else 1,
                    ),
                )
            ),
            FF_dropout=float(manifest.resolve("FF_dropout", default=0.1)),
            RNN_dropout=float(manifest.resolve("RNN_dropout", default=0.5)),
            temperature=float(manifest.resolve("temperature", default=0.0)),
            use_attention=bool(
                manifest.resolve(
                    "cross_attention",
                    self.SN_kwargs.get("use_attention"),
                    False,
                )
            ),
            encoder_type=str(
                manifest.resolve(
                    "encoder_type", self.SN_kwargs.get("encoder_type"), "lstm"
                )
            ),
            # conformer hyperparameters: manifest key 'conformer' or
            # SN_kwargs['conformer'] as a dict of ConformerConfig
            # fields; None → the defaults in models/conformer.py
            conformer=(
                ConformerConfig(**conformer_kwargs)
                if (
                    conformer_kwargs := manifest.resolve(
                        "conformer", self.SN_kwargs.get("conformer"), None
                    )
                )
                else None
            ),
            # False | True (chunked-grid Pallas kernels)
            use_pallas_lstm=self.SN_kwargs.get("use_pallas_lstm", False),
            # 'bfloat16' for MXU-native matmuls (fp32 accumulation
            # everywhere; params stay fp32) — the TPU setting
            compute_dtype=getattr(
                jnp, str(self.SN_kwargs.get("compute_dtype", "float32"))
            ),
            pad_id=int(dec_list.index(pad_token)),
            # non-sequence vocabs omit <EOS>; -1 never matches a token
            eos_id=(
                int(dec_list.index(EOS_token))
                if EOS_token in dec_list
                else -1
            ),
        )
        self.beam_width = int(
            self.SN_kwargs.get(
                "beam_width", manifest.resolve("beam_width", default=1)
            )
        )
        self.N_epochs = int(
            self.SN_kwargs.get(
                "N_epochs", manifest.resolve("N_epochs", default=200)
            )
        )
        self.EMA_decay = float(manifest.resolve("EMA_decay", default=0.99))
        self.assessment_epoch_interval = int(
            manifest.resolve("assessment_epoch_interval", default=10)
        )
        self._summary_writer = None
        self.learning_rate = float(
            self.SN_kwargs.get(
                "learning_rate",
                manifest.resolve("learning_rate", default=1e-3),
            )
        )
        self.batch_size = int(
            self.SN_kwargs.get(
                "batch_size", manifest.resolve("batch_size", default=32)
            )
        )
        # data-parallel mesh over all visible devices (SN_kwargs:
        # data_parallel=True); params replicated, batches sharded.
        # SN_kwargs sequence_parallel=K adds a 'seq' mesh axis of K
        # devices carrying the conformer encode's time axis — the
        # TRAINING-path sequence parallelism (long recordings whose
        # step count exceeds one chip's budget); composes with dp.
        self.mesh = None
        self.sp = None
        self.pp = None
        n_seq = int(self.SN_kwargs.get("sequence_parallel") or 0)
        if n_seq > 1 and self.net_config.encoder_type != "conformer":
            raise ValueError(
                "sequence_parallel requires encoder_type='conformer' "
                "(the biLSTM recurrence cannot shard over time)"
            )
        # SN_kwargs pipeline_parallel=S trains with the conformer block
        # stack pipelined over S devices (GPipe ring,
        # parallel/pipeline.py); microbatch count via
        # pipeline_microbatches (default S; batch_size must divide it)
        n_pp = int(self.SN_kwargs.get("pipeline_parallel") or 0)
        n_tp_pp = int(self.SN_kwargs.get("tensor_parallel") or 0)
        n_tp_pp = n_tp_pp if n_tp_pp > 1 else 1
        if n_pp > 1:
            if self.net_config.encoder_type != "conformer":
                raise ValueError(
                    "pipeline_parallel requires encoder_type='conformer'"
                )
            from jax.sharding import Mesh

            # dp × pp (the standard 2-D pipeline shape): a 'data' axis
            # shards every microbatch's batch dim; stage weights stay
            # replicated over it, so shard_map AD emits the gradient
            # all-reduce on its own (parallel/pipeline.py).  With
            # expert_parallel too (ep × pp), a third 'model' axis
            # shards the MoE expert dim inside every stage.  With
            # sequence_parallel too (sp × pp), a 'seq' axis time-shards
            # the halo windows flowing through the ring
            # (parallel/sp_pp.py).  All three together (ep × sp × pp)
            # build the full (data, seq, pp, model) 4-D mesh — the
            # stacked stage weights' expert dims shard
            # P('pp', None, 'model') and the no-drop combine psums over
            # 'model' inside every stage.  tensor_parallel instead
            # shards the stage weights' wide output dims over a 'model'
            # axis left in GSPMD AUTO mode (tp × pp / tp × sp × pp —
            # parallel/pipeline.py tp_axis; mutually exclusive with
            # expert_parallel).
            n_ep_pp = int(self.SN_kwargs.get("expert_parallel") or 0)
            n_ep_pp = n_ep_pp if n_ep_pp > 1 else 1
            n_model_pp = max(n_ep_pp, n_tp_pp)  # tp×ep refused below
            n_data = (
                len(jax.devices()) // (n_pp * n_model_pp * max(n_seq, 1))
                if self.SN_kwargs.get("data_parallel")
                else 1
            )
            n_data = max(n_data, 1)
            M = int(self.SN_kwargs.get("pipeline_microbatches") or n_pp)
            tp_tail = (None, "model") if n_tp_pp > 1 else ()
            if n_seq > 1 and n_model_pp > 1:
                devs = np.array(
                    jax.devices()[: n_data * n_seq * n_pp * n_model_pp]
                )
                pp_mesh = Mesh(
                    devs.reshape(n_data, n_seq, n_pp, n_model_pp),
                    ("data", "seq", "pp", "model"),
                )
                self.pp = (pp_mesh, "pp", M, *tp_tail)
                self.sp = (
                    (pp_mesh, "seq") if n_tp_pp > 1
                    else (pp_mesh, "seq", "model")
                )
            elif n_seq > 1:
                devs = np.array(jax.devices()[: n_data * n_seq * n_pp])
                pp_mesh = Mesh(
                    devs.reshape(n_data, n_seq, n_pp),
                    ("data", "seq", "pp"),
                )
                self.pp = (pp_mesh, "pp", M)
                self.sp = (pp_mesh, "seq")
            elif n_model_pp > 1:
                devs = np.array(jax.devices()[: n_data * n_pp * n_model_pp])
                pp_mesh = Mesh(
                    devs.reshape(n_data, n_pp, n_model_pp),
                    ("data", "pp", "model"),
                )
                self.pp = (
                    (pp_mesh, "pp", M, *tp_tail) if n_tp_pp > 1
                    else (pp_mesh, "pp", M, "model")
                )
            else:
                devs = np.array(jax.devices()[: n_data * n_pp])
                pp_mesh = Mesh(
                    devs.reshape(n_data, n_pp), ("data", "pp")
                )
                self.pp = (pp_mesh, "pp", M)
            self.mesh = pp_mesh
        # SN_kwargs expert_parallel=K shards the MoE conformer's expert
        # axis over K devices (parallel/expert.py): expert weights AND
        # their Adam moments live P('model'), everything else
        # replicated; composes with data_parallel (dp × ep — the
        # standard MoE deployment shape)
        self.ep = None
        # SN_kwargs tensor_parallel=K shards the wide param matrices'
        # output axes over a K-device 'model' axis
        # (parallel/mesh.py::shard_params_tp); params, EMA, and Adam
        # moments all live sharded and XLA GSPMD propagates the
        # shardings through the jitted segment (no hand-written
        # collectives).  Composes with data_parallel (dp × tp) and —
        # because the sp/pp shard_maps are manual only over the axes
        # they communicate on, leaving 'model' in GSPMD auto mode —
        # with sequence_parallel and pipeline_parallel (tp × sp,
        # tp × pp, tp × sp × pp).  Only tp × ep is refused (both
        # claim the 'model' axis).
        self.tp = None
        n_tp = int(self.SN_kwargs.get("tensor_parallel") or 0)
        n_ep = int(self.SN_kwargs.get("expert_parallel") or 0)
        if n_tp > 1 and n_ep > 1:
            raise ValueError(
                "tensor_parallel × expert_parallel is not supported: "
                "both shard weight matrices over the 'model' axis "
                "(expert leaves on their expert dim, wide kernels on "
                "their output dim) — at this model scale a second "
                "within-expert sharding axis buys nothing"
            )
        if n_ep > 1:
            ccfg = self.net_config.conformer
            if self.net_config.encoder_type != "conformer" or not (
                ccfg and ccfg.moe_experts
            ):
                raise ValueError(
                    "expert_parallel requires a MoE conformer "
                    "(SN_kwargs conformer={'moe_experts': E, ...})"
                )
            if ccfg.moe_experts % n_ep:
                raise ValueError(
                    f"expert_parallel={n_ep} must divide evenly into "
                    f"moe_experts={ccfg.moe_experts}"
                )
            if n_pp > 1:
                # ep × pp (or ep × sp × pp): the mesh and the pp/sp
                # specs were built in the pipeline branch above (the
                # ep axis rides pp[3], or sp[2] when a 'seq' axis is
                # present); the expert leaves of the UNSTACKED resting
                # params shard over 'model' via _place_state as usual
                # both MoE paths compose: no-drop always; the capacity
                # dispatch shards its expert/dispatch/combine einsums
                # over 'model' inside the shard_maps
                # (models/moe.py::_moe_capacity_grouped ep_axis) — under
                # a 'seq' axis the sp/sp_pp modules additionally require
                # shard-aligned dispatch groups (moe_group_size | S and
                # | halo) so drops equal the offline encode's exactly
                self.ep = ("model", int(ccfg.moe_experts))
            else:
                from .parallel import make_mesh

                # ep (GSPMD expert sharding) alone, dp × ep, or the
                # ep × sp 2-D mesh (long-recording MoE training: expert
                # leaves sharded over 'model' INSIDE the time-sharded
                # encode — parallel/sequence.py manual-psum combine);
                # dp composes with either
                n_data = (
                    len(jax.devices()) // (n_ep * max(n_seq, 1))
                    if self.SN_kwargs.get("data_parallel")
                    else 1
                )
                self.mesh = make_mesh(
                    n_data=max(n_data, 1), n_model=n_ep,
                    n_seq=max(n_seq, 1),
                )
                self.ep = ("model", int(ccfg.moe_experts))
                if n_seq > 1:
                    self.sp = (self.mesh, "seq", "model")
        elif n_tp > 1:
            if n_pp > 1:
                # tp × pp (or tp × sp × pp, +dp): the mesh and the pp
                # tuple's tp_axis were built in the pipeline branch
                # above — the stacked stage weights' wide dims shard
                # over the AUTO 'model' axis inside the ring
                self.tp = "model"
            else:
                from .parallel import make_mesh

                # tp (GSPMD weight sharding) alone, dp × tp, or the
                # tp × sp (+dp) mesh: the sequence-parallel shard_map
                # is manual ONLY over 'seq' (parallel/sequence.py), so
                # the tensor-parallel 'model' shardings ride its auto
                # axes straight into the body's GEMMs — no tp-specific
                # plumbing
                n_data = (
                    len(jax.devices()) // (n_tp * max(n_seq, 1))
                    if self.SN_kwargs.get("data_parallel")
                    else 1
                )
                self.mesh = make_mesh(
                    n_data=max(n_data, 1), n_model=n_tp,
                    n_seq=max(n_seq, 1),
                )
                self.tp = "model"
                if n_seq > 1:
                    self.sp = (self.mesh, "seq")
        elif n_pp > 1:
            pass  # (data, pp) mesh already built above
        elif self.SN_kwargs.get("data_parallel") or n_seq > 1:
            from .parallel import make_mesh

            if n_seq > 1:
                n_data = (
                    len(jax.devices()) // n_seq
                    if self.SN_kwargs.get("data_parallel")
                    else 1
                )
                self.mesh = make_mesh(
                    n_data=max(n_data, 1), n_model=1, n_seq=n_seq
                )
                self.sp = (self.mesh, "seq")
            else:
                self.mesh = make_mesh(n_model=1)

        rng = jax.random.PRNGKey(self.seed)
        params = init_seq2seq(rng, self.net_config)
        self.state = TrainState(
            params=params,
            ema=jax.tree.map(jnp.copy, params),
            opt_state=None,
            epoch=jnp.asarray(0, jnp.int32),
        )
        self._datasets: dict[str, PackedDataset] = {}
        self._device_data: dict[str, dict] = {}  # partition → jnp arrays
        self.assessments: dict[str, dict] = {}

    # -- data ---------------------------------------------------------------

    def write_tf_records_maybe(self) -> None:
        for subject in self.ecog_subjects:
            subject.write_tf_records_maybe()

    def packed_dataset(self, partition: str, refresh: bool = False) -> PackedDataset:
        if refresh or partition not in self._datasets:
            self.write_tf_records_maybe()
            ds = pack_partition(
                self.ecog_subjects,
                partition,
                pad_channels_to=self.net_config.in_channels,
                pad_time_multiple=self.net_config.decimation_factor,
            )
            if partition == "training":
                from .pipeline import restrict_trials

                for s, indices in self._trial_subset.items():
                    ds = restrict_trials(ds, s, indices)
            self._datasets[partition] = ds
            self._device_data.pop(partition, None)
        return self._datasets[partition]

    def device_data(self, partition: str) -> dict:
        """Device-resident copy of a partition's stacked arrays, uploaded
        ONCE and cached — host→device transfer would otherwise dominate
        every fit segment and assessment at corpus scale.

        Under bf16 compute the ECoG corpus (``encoder_inputs`` — the
        dominant array) is stored in bf16: halves corpus HBM + the
        per-step batch-gather traffic, and is numerically identical to
        an fp32 store because the model casts the inputs to the compute
        dtype at first use anyway.  Float aux TARGETS (Gaussian/MFCC
        heads) stay fp32 — the regression loss compares predictions
        against them directly, so a bf16 store would quantize the loss
        itself, not just move a cast earlier."""
        if partition not in self._device_data:
            ds = self.packed_dataset(partition)
            cast = self.net_config.compute_dtype == jnp.bfloat16

            def put(k, v):
                if cast and k == "encoder_inputs" and v.dtype == np.float32:
                    return jnp.asarray(v, jnp.bfloat16)
                return jnp.asarray(v)

            self._device_data[partition] = {
                k: put(k, v) for k, v in ds.batch_dict().items()
            }
        return self._device_data[partition]

    def restricted_to_trials(
        self, indices, subject_index: int = -1
    ) -> "MultiSubjectTrainer":
        """Fresh trainer (re-initialized params) whose TRAINING set is
        restricted to the given trial indices of one subject — the
        retrain unit of the perf-vs-training-size sweep
        (experiments.py)."""
        clone = MultiSubjectTrainer(
            self._manifest_path,
            self.subject_ids,
            text_dir=self._text_dir,
            SN_kwargs=self.SN_kwargs,
            DG_kwargs=self.DG_kwargs,
            ES_kwargs=self.ES_kwargs,
            RP_kwargs=self.RP_kwargs,
            VERBOSE=False,
            seed=self.seed,
            **self.kwargs,  # explicit *_vocab_list kwargs survive
        )
        s = (
            subject_index
            if subject_index >= 0
            else len(self.ecog_subjects) + subject_index
        )
        clone._trial_subset = {s: list(indices)}
        return clone

    # -- optimizers / scope masks ------------------------------------------

    def _scope_mask(self, train_vars_scope: str | None):
        """Trainability mask over the param pytree from a scope regex
        against slash-joined param paths ('subnet/conv/0/w',
        'encoder/rnn/0/fwd/wx', ...).  The reference's regexes
        ``seq2seq/subnet`` and ``seq2seq/(?!subnet)`` work verbatim with
        the 'seq2seq/' prefix."""
        if train_vars_scope is None:
            return None
        pattern = re.compile(train_vars_scope)

        def path_str(path) -> str:
            parts = []
            for p in path:
                if hasattr(p, "key"):
                    parts.append(str(p.key))
                elif hasattr(p, "idx"):
                    parts.append(str(p.idx))
                elif hasattr(p, "name"):
                    parts.append(str(p.name))
                else:
                    parts.append(str(p))
            return "seq2seq/" + "/".join(parts)

        flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.state.params),
            [bool(pattern.match(path_str(path))) for path, _ in flat],
        )

    def _make_optimizer(
        self,
        train_vars_scope: str | None = None,
        total_steps: int | None = None,
    ):
        """Adam + global-norm clip; optional warmup(+cosine) schedule
        (SN_kwargs ``warmup_steps`` / ``lr_schedule='warmup_cosine'`` —
        the conformer variant wants warmup)."""
        warmup = int(self.SN_kwargs.get("warmup_steps", 0))
        if warmup and total_steps:
            if self.SN_kwargs.get("lr_schedule") == "warmup_cosine":
                lr = optax.warmup_cosine_decay_schedule(
                    0.0, self.learning_rate, warmup,
                    max(total_steps, warmup + 1),
                )
            else:
                lr = optax.linear_schedule(
                    0.0, self.learning_rate, warmup
                )
        else:
            lr = self.learning_rate
        opt = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(lr),
        )
        mask = self._scope_mask(train_vars_scope)
        if mask is not None:
            opt = optax.chain(
                opt,
                optax.masked(
                    optax.set_to_zero(),
                    jax.tree.map(lambda t: not t, mask),
                ),
            )
        return opt

    def _place_state(self, state):
        """Mesh placement for the TrainState: fully replicated, except
        under expert parallelism where the MoE expert leaves (params,
        EMA, and their Adam moments — matched by path) are sharded on
        their leading expert axis (parallel/expert.py)."""
        if self.ep is not None:
            from .parallel import shard_params_ep

            axis, n_experts = self.ep
            return shard_params_ep(state, self.mesh, n_experts, axis=axis)
        if self.tp is not None:
            from .parallel import shard_params_tp

            return shard_params_tp(state, self.mesh)
        from .parallel import replicate

        return replicate(state, self.mesh)

    # -- core fit engine ----------------------------------------------------

    @property
    def summary_writer(self):
        """TensorBoard scalars for the training curves (manifest key
        ``tf_summaries_dir``, mocha-1_word_sequence.yaml:85 — the
        reference forwards it to its TF2 trainer via ST_kwargs,
        trainers.py:110-115).  Resolution: SN_kwargs over manifest; an
        explicit ``None`` in SN_kwargs disables summaries even when the
        manifest names a directory (lab manifests hardcode lab paths).
        Lazy — the event file is created on first access; an unwritable
        directory warns once and disables rather than aborting a run."""
        if self._summary_writer is None:
            if "tf_summaries_dir" in self.SN_kwargs:
                logdir = self.SN_kwargs["tf_summaries_dir"]
            else:
                logdir = self.manifest.resolve(
                    "tf_summaries_dir", default=None
                )
            if not logdir:
                self._summary_writer = False
            else:
                from .utils.summaries import SummaryWriter

                try:
                    self._summary_writer = SummaryWriter(str(logdir))
                except OSError as err:
                    import warnings

                    warnings.warn(
                        f"tf_summaries_dir {logdir!r} unusable "
                        f"({err}); summaries disabled"
                    )
                    self._summary_writer = False
        return self._summary_writer or None

    def fit(
        self,
        subject_subset: Sequence[int] | None = None,
        num_epochs: int | None = None,
        train_vars_scope: str | None = None,
        reset_optimizer: bool = True,
        assess: bool = True,
        checkpoint_every_assessment: bool | None = None,
    ) -> dict[str, dict]:
        """Train for ``num_epochs``, assessing every
        ``assessment_epoch_interval``.  Returns assessments history.

        ``checkpoint_every_assessment`` (default: SN_kwargs key of the
        same name) writes an Orbax checkpoint at each assessment — crash
        recovery resumes from the newest via ``restore_epoch`` +
        ``parallel_transfer_learn(RESUME=True)`` (the reference's manual
        recovery loop, trainers.py:235-255, made automatic)."""
        if checkpoint_every_assessment is None:
            checkpoint_every_assessment = bool(
                self.SN_kwargs.get("checkpoint_every_assessment", False)
            )
        num_epochs = num_epochs or self.N_epochs
        self.write_tf_records_maybe()
        # lazy host pipeline (SN_kwargs max_host_trials): the corpus is
        # never fully materialized in host RAM — shards of that many
        # trials are re-read from the records' framing index on demand
        # (pipeline.LazyShardedDataset over records.RecordFile).
        # Composes with max_device_trials: the shard size is the
        # smaller of the two budgets.
        max_host = self.SN_kwargs.get("max_host_trials")
        lazy_shards = None
        if max_host:
            from .pipeline import LazyShardedDataset

            max_dev_b = self.SN_kwargs.get("max_device_trials")
            shard_trials = min(
                int(max_host), int(max_dev_b or max_host)
            )
            lazy_shards = LazyShardedDataset(
                self.ecog_subjects,
                "training",
                shard_trials,
                pad_channels_to=self.net_config.in_channels,
                pad_time_multiple=self.net_config.decimation_factor,
                trial_subset=self._trial_subset or None,
            )
            train_counts = lazy_shards.num_trials
        else:
            train_data = self.packed_dataset("training")
            train_counts = train_data.num_trials
        steps_per_epoch = int(
            sum(
                -(-int(n) // self.batch_size)
                for n in train_counts
                if n > 0
            )
        )
        total_steps = num_epochs * max(steps_per_epoch, 1)
        # cache the (optimizer, jitted runner) pair: re-tracing the
        # scanned segment costs seconds per fit() call otherwise.  The
        # key covers every hyperparameter baked into the runner, so
        # mutating learning_rate / EMA_decay / penalty_scales / mesh
        # between fit() calls takes effect instead of silently reusing
        # a stale optimizer.
        cache_key = (
            train_vars_scope,
            int(self.SN_kwargs.get("warmup_steps", 0)) and total_steps,
            self.SN_kwargs.get("lr_schedule"),
            self.learning_rate,
            self.EMA_decay,
            tuple(sorted(self.penalty_scales.items())),
            None if self.mesh is None else tuple(self.mesh.shape.items()),
            None if self.pp is None else (self.pp[1], self.pp[2]),
        )
        if not hasattr(self, "_runner_cache"):
            self._runner_cache = {}
        if cache_key not in self._runner_cache:
            optimizer = self._make_optimizer(
                train_vars_scope, total_steps=total_steps
            )
            self._runner_cache[cache_key] = (
                optimizer,
                make_segment_runner(
                    self.net_config, optimizer, self.penalty_scales,
                    self.EMA_decay, mesh=self.mesh, sp=self.sp,
                    pp=self.pp,
                ),
            )
        optimizer, runner = self._runner_cache[cache_key]
        if reset_optimizer or self.state.opt_state is None:
            self.state = self.state._replace(
                opt_state=optimizer.init(self.state.params)
            )
        # host-sharded streaming when the corpus exceeds the device
        # budget (SN_kwargs max_device_trials): shards upload one at a
        # time; within a segment each shard trains `segment` epochs in
        # turn (block-sequential sampling — documented tradeoff).  With
        # max_host_trials the shards come from the lazy record-backed
        # loader instead of slices of a resident corpus — same shapes,
        # same schedule, host memory O(shard).
        max_dev = self.SN_kwargs.get("max_device_trials")
        streaming = lazy_shards is not None or (
            bool(max_dev)
            and train_data.encoder_inputs.shape[1] > int(max_dev)
        )
        if streaming:
            if lazy_shards is not None:
                shards = lazy_shards  # re-iterable; materializes per pass
            else:
                from .pipeline import shard_dataset

                shards = shard_dataset(train_data, int(max_dev))
            if self.mesh is not None:
                # same placement contract as the resident path: params
                # replicated (expert leaves sharded under ep), per-step
                # batches constrained to the data axis inside the runner
                self.state = self._place_state(self.state)
        else:
            data = self.device_data("training")
            if self.mesh is not None:
                from .parallel import replicate

                data = replicate(data, self.mesh)
                self.state = self._place_state(self.state)
        rng_np = np.random.default_rng(self.seed + int(self.state.epoch))
        history: dict[str, dict] = {}
        done = 0
        while done < num_epochs:
            segment = min(self.assessment_epoch_interval, num_epochs - done)
            rng = jax.random.PRNGKey(
                self.seed + 1000 + int(self.state.epoch)
            )
            if streaming:
                from .pipeline import _PREFETCH_END, prefetch

                shard_iter = enumerate(shards)

                def _produce():
                    # pull + schedule + upload for ONE shard; runs in
                    # the single prefetch worker so the host
                    # reads/packs/uploads shard k+1 while the device
                    # trains shard k (the rng draws stay sequential —
                    # trajectory identical to the unprefetched loop)
                    for si, shard in shard_iter:
                        if not int(shard.num_trials.sum()):
                            continue
                        sched = make_schedule(
                            shard, self.batch_size, segment, rng_np,
                            subject_subset,
                        )
                        shard_dev = {
                            k: (
                                jnp.asarray(v, jnp.bfloat16)
                                if k == "encoder_inputs"
                                and v.dtype == np.float32
                                and self.net_config.compute_dtype
                                == jnp.bfloat16
                                else jnp.asarray(v)
                            )
                            for k, v in shard.batch_dict().items()
                        }
                        if self.mesh is not None:
                            from .parallel import replicate

                            shard_dev = replicate(shard_dev, self.mesh)
                        return si, sched, shard_dev
                    return _PREFETCH_END

                for si, (subjects_sched, idx_sched), shard_dev in (
                    prefetch(_produce)
                ):
                    self.state, metrics = runner(
                        self.state,
                        shard_dev,
                        subjects_sched,
                        idx_sched,
                        np.asarray(jax.random.fold_in(rng, si)),
                        0,  # epochs counted once, below
                    )
                self.state = self.state._replace(
                    epoch=self.state.epoch + segment
                )
            else:
                subjects_sched, idx_sched = make_schedule(
                    train_data, self.batch_size, segment, rng_np,
                    subject_subset,
                )
                # schedule/rng passed as host numpy: uncommitted
                # inputs are implicitly replicated, which also holds in
                # multi-process SPMD (multi-host dp)
                self.state, metrics = runner(
                    self.state,
                    data,
                    subjects_sched,
                    idx_sched,
                    np.asarray(rng),
                    segment,
                )
            done += segment
            epoch = int(self.state.epoch)
            tm = {k: float(v) for k, v in metrics.items()}
            # failure detection (SURVEY §5: absent in the reference):
            # a diverged segment is rolled back to the newest checkpoint
            # before surfacing, so training state is never left NaN
            if not np.isfinite(tm.get("loss_total", 0.0)):
                recovered = ""
                # an async periodic save may still be in flight — wait
                # so the newest checkpoint is visible to the rollback
                self._wait_for_checkpoint()
                if self.restore_epoch is not None:
                    self.restore()
                    recovered = (
                        f"; restored checkpoint at epoch "
                        f"{int(self.state.epoch)}"
                    )
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} "
                    f"(loss={tm['loss_total']}){recovered}. Try a lower "
                    "learning rate or warmup_steps."
                )
            writer = self.summary_writer
            if writer is not None:
                writer.scalars(
                    {
                        (
                            f"loss/{k[5:]}"
                            if k.startswith("loss_")
                            else f"train/{k}"
                        ): v
                        for k, v in tm.items()
                    },
                    epoch,
                )
            if assess:
                snapshot = self.assess()
                history[str(epoch)] = snapshot
                self.vprint(
                    f"epoch {epoch}: loss {tm['loss_total']:.4f} "
                    f"train WER {snapshot['training']['word_error_rate']:.3f} "
                    f"val WER {snapshot['validation']['word_error_rate']:.3f}"
                )
                if writer is not None:
                    writer.scalars(
                        {
                            f"{part}/{key}": snap[key]
                            for part, snap in snapshot.items()
                            for key in ("accuracy", "word_error_rate")
                        },
                        epoch,
                    )
            if writer is not None:
                writer.flush()
            if checkpoint_every_assessment:
                # async: serialization/IO overlaps the next segment
                self.save_checkpoint(epoch, wait=False)
        self._wait_for_checkpoint()
        if lazy_shards is not None:
            lazy_shards.close()
        self.assessments = history
        return history

    # -- assessment ---------------------------------------------------------

    @property
    def temperature(self) -> float:
        """Assessment-decode temperature: SN_kwargs override > manifest
        (e.g. mocha-1_word_sequence.yaml:82 temperature 0.384) > 0
        (greedy).  Consumed by ``_decode_fn`` — the knob the reference
        passes to its core via ST_kwargs (trainers.py:110-115)."""
        return float(
            self.SN_kwargs.get("temperature", self.net_config.temperature)
        )

    def _decode_fn(self):
        key = (self.beam_width, self.temperature)
        if getattr(self, "_jit_decode_key", None) != key:
            config = self.net_config
            temperature = self.temperature
            if self.beam_width > 1:
                from .models.beam import beam_decode

                beam_width = self.beam_width

                @jax.jit
                def decode(params, inputs, lengths, subject_idx, rng):
                    return beam_decode(
                        params, config, inputs, lengths, subject_idx,
                        beam_width=beam_width, temperature=temperature,
                    )

            else:

                @jax.jit
                def decode(params, inputs, lengths, subject_idx, rng):
                    return greedy_decode(
                        params, config, inputs, lengths, subject_idx,
                        rng=rng, temperature=temperature,
                    )

            self._jit_decode = decode
            self._jit_decode_key = key
        return self._jit_decode

    def assess(
        self,
        partitions: Sequence[str] = ("training", "validation"),
        use_ema: bool = True,
        params: Any = None,
    ) -> dict[str, dict]:
        """Greedy-decode each partition with the (EMA) weights; returns
        per-partition WER / accuracy / confusions (the reference's
        assessments dict, trainers.py:591-610).

        All decode calls are DISPATCHED first and transferred after: a
        synchronous per-call round trip costs ~19 ms of tunnel/dispatch
        latency on top of ~24 ms device time at reference scale
        (measured r3, RESULTS.md) — pipelining the dispatches hides it,
        so an assessment sweep runs at device speed."""
        if params is None:
            params = self.state.ema if use_ema else self.state.params
        decode = self._decode_fn()
        dec_list = self.target_subject.data_manifests[
            "decoder_targets"
        ].feature_list
        # phase 1: dispatch every (partition, subject) decode — results
        # stay on device so the host never blocks between launches
        pending: dict[str, list] = {p: [] for p in partitions}
        for partition in partitions:
            ds = self.packed_dataset(partition)
            dev = self.device_data(partition)
            for s in range(ds.num_subjects):
                n = int(ds.num_trials[s])
                if n == 0:
                    continue
                # deterministic per-(partition, subject) rng so sampled
                # assessment (temperature > 0) is reproducible
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(self.seed),
                    s * 7 + list(DATA_PARTITIONS).index(partition),
                )
                tokens_dev = decode(
                    params,
                    dev["encoder_inputs"][s],
                    dev["encoder_lengths"][s],
                    jnp.asarray(s, jnp.int32),
                    rng,
                )
                pending[partition].append((s, n, tokens_dev))
        # phase 2: transfer + score
        out: dict[str, dict] = {}
        for partition in partitions:
            ds = self.packed_dataset(partition)
            all_refs, all_hyps = [], []
            true_ids, pred_ids = [], []
            for s, n, tokens_dev in pending[partition]:
                tokens = np.asarray(tokens_dev)[:n]
                hyps = target_inds_to_sequences(tokens, dec_list)
                refs = target_inds_to_sequences(
                    ds.decoder_targets[s][:n], dec_list
                )
                all_refs += refs
                all_hyps += hyps
                L = min(tokens.shape[1], ds.decoder_targets.shape[2])
                true_ids.append(ds.decoder_targets[s][:n, :L])
                pred_ids.append(tokens[:, :L])
            wers = wer_vector(all_refs, all_hyps)
            out[partition] = {
                "word_error_rate": float(np.mean(wers)) if len(wers) else 1.0,
                "word_error_rates": wers,
                "accuracy": sequence_accuracy(all_refs, all_hyps),
                "decoder_confusions": confusion_matrix(
                    np.concatenate(true_ids) if true_ids else np.zeros((0, 1)),
                    np.concatenate(pred_ids) if pred_ids else np.zeros((0, 1)),
                    len(dec_list),
                ),
                "references": all_refs,
                "hypotheses": all_hyps,
            }
        return out

    # -- reference training entry points ------------------------------------

    def parallel_transfer_learn(
        self, RESUME: bool = False, **fit_kwargs
    ) -> dict:
        """Joint training of all subjects in one program (reference
        trainers.py:303-327).  RESUME restricts to the target subject,
        training only the shared core, from the latest checkpoint."""
        if RESUME:
            # restrict to the target subject, reusing all variables from
            # the latest checkpoint (reference trainers.py:308-315:
            # train_vars_scope='seq2seq', reuse_vars_scope='seq2seq')
            epoch = self.restore_epoch
            if epoch is not None:
                self.restore(epoch)
            history = self.fit(
                subject_subset=[len(self.ecog_subjects) - 1],
                **fit_kwargs,
            )
        else:
            history = self.fit(**fit_kwargs)
        self._save_results(history)
        self.save_checkpoint()
        return history

    def torch_learn(
        self,
        N_epochs: int | None = None,
        device: str | None = None,
        push_weights: bool = True,
        **ST_kwargs,
    ) -> dict:
        """The SECOND training engine (reference trainers.py:278-301:
        PyTorch ``SequenceTrainer.train_and_assess``): train the SAME
        architecture — and the same parameter pytree — in torch
        (``torch_engine.py``), starting from the current weights.

        Teacher-forced logits and greedy decode agree between the two
        engines to f32 tolerance (tests/test_torch_engine.py), so
        weights move freely: with ``push_weights`` (default) the
        torch-trained parameters (and the torch EMA) are written back
        into ``self.state``, and every JAX-side facility — ``assess``,
        Orbax checkpoints, serving, analysis hooks — operates on them.
        ``device`` defaults to CUDA when available, else CPU (the
        reference's pick, trainers.py:282)."""
        import torch as _torch

        from .torch_engine import SequenceTrainer, TorchSequenceNetwork

        if device is None:
            device = "cuda" if _torch.cuda.is_available() else "cpu"
        self.write_tf_records_maybe()
        net = TorchSequenceNetwork(self.net_config, self.state.params)
        dec_list = self.target_subject.data_manifests[
            "decoder_targets"
        ].feature_list
        datasets = {
            p: self.packed_dataset(p) for p in ("training", "validation")
        }
        torch_trainer = SequenceTrainer(
            self.net_config,
            datasets,
            dec_list,
            penalty_scales=self.penalty_scales,
            batch_size=self.batch_size,
            learning_rate=self.learning_rate,
            ema_decay=self.EMA_decay,
            assessment_epoch_interval=self.assessment_epoch_interval,
            temperature=self.temperature,
            seed=self.seed,
            REPORT_TRAINING_LOSS=self.VERBOSE,
            **ST_kwargs,
        )
        N_epochs = N_epochs or self.N_epochs
        history = torch_trainer.train_and_assess(N_epochs, net, device)
        if push_weights:
            self.state = self.state._replace(
                params=net.export_jax_params(),
                ema=net.export_tree(torch_trainer.ema_leaves),
                epoch=self.state.epoch + N_epochs,
            )
        self._save_results(history)
        return history

    def sequential_transfer_learn(
        self,
        pretraining: int = 60,
        training: int = 200,
        posttraining: int = 340,
    ) -> dict:
        """Per-subject curriculum (reference trainers.py:329-374): for
        each donor, first fit only its subnet against the frozen shared
        core, then everything; the target subject gets
        training+posttraining epochs."""
        history: dict = {}
        for i, subject in enumerate(self.ecog_subjects):
            is_last = i == len(self.ecog_subjects) - 1
            if i > 0:
                self.fit(
                    subject_subset=[i],
                    num_epochs=pretraining,
                    train_vars_scope=r"seq2seq/subnet",
                    assess=False,
                )
            epochs = training + (posttraining if is_last else 0)
            history = self.fit(
                subject_subset=list(range(i + 1)), num_epochs=epochs
            )
        self._save_results(history)
        self.save_checkpoint()
        return history

    # -- checkpointing (Orbax) ----------------------------------------------

    def _ckpt_path(self, epoch: int) -> str:
        return os.path.join(self.checkpoint_dir, f"ckpt-{epoch}")

    @property
    def restore_epoch(self) -> int | None:
        """Latest checkpointed epoch (reference scans model.ckpt-*.index,
        trainers.py:235-255)."""
        if not os.path.isdir(self.checkpoint_dir):
            return None
        epochs = [
            int(m.group(1))
            for name in os.listdir(self.checkpoint_dir)
            if (m := re.fullmatch(r"ckpt-(\d+)", name))
        ]
        return max(epochs) if epochs else None

    def save_checkpoint(
        self, epoch: int | None = None, wait: bool = True
    ) -> str:
        """Write an Orbax checkpoint for ``epoch`` (default: current).

        ``wait=False`` saves ASYNCHRONOUSLY: the device arrays are
        snapshotted immediately but serialization/IO overlaps the next
        training segment (the production pattern — checkpoint stalls do
        not eat step time).  Any later save/restore/assess first waits
        for the in-flight write."""
        import orbax.checkpoint as ocp

        self._wait_for_checkpoint()
        epoch = epoch if epoch is not None else int(self.state.epoch)
        path = self._ckpt_path(epoch)
        tree = {
            "params": self.state.params,
            "ema": self.state.ema,
            "epoch": np.asarray(epoch, np.int32),
        }
        if wait:
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(os.path.abspath(path), tree, force=True)
            return path
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(tree),
                   force=True)
        self._async_ckptr = ckptr  # finalized by _wait_for_checkpoint
        return path

    def _wait_for_checkpoint(self) -> None:
        """Block until any in-flight async checkpoint write completes."""
        ckptr = getattr(self, "_async_ckptr", None)
        if ckptr is not None:
            ckptr.wait_until_finished()
            ckptr.close()
            self._async_ckptr = None

    def restore(self, epoch: int | None = None) -> None:
        """Restore (params, EMA, epoch) from the Orbax checkpoint at
        ``epoch`` (default: newest).  If the checkpointed architecture
        differs from the constructed one, the net is REBUILT from the
        checkpoint's tensor shapes first — the reference's
        ``update_net_from_saved_model`` → ``recover_model_sizes`` path
        (trainers.py:383-408, 444-554), so "assess any saved model"
        works even when the trainer was constructed with different
        ``layer_sizes``.

        Checkpoints are TOPOLOGY-ELASTIC: restore rebuilds plain host
        arrays regardless of the mesh the checkpoint was written under,
        and the next ``fit`` re-places them for THIS trainer's mesh
        (``_place_state``) — so an ep/tp-sharded run resumes on a
        different mesh shape, or none (tested: resumed trajectories
        match across topologies)."""
        import orbax.checkpoint as ocp

        from .utils.introspect import _shape_tree

        self._wait_for_checkpoint()
        epoch = epoch if epoch is not None else self.restore_epoch
        if epoch is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.checkpoint_dir}"
            )
        with ocp.StandardCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(self._ckpt_path(epoch)))
        if _shape_tree(raw["params"]) != _shape_tree(self.state.params):
            self.vprint(
                "checkpoint architecture differs from the constructed "
                "net; rebuilding hyperparameters from tensor shapes"
            )
            self.update_net_from_saved_model(raw["params"])
        self.state = TrainState(
            params=jax.tree.map(jnp.asarray, raw["params"]),
            ema=jax.tree.map(jnp.asarray, raw["ema"]),
            opt_state=None,
            epoch=jnp.asarray(int(np.asarray(raw["epoch"])), jnp.int32),
        )

    def import_tf1_checkpoint(
        self, ckpt_path, rebuild="auto"
    ) -> dict[str, list[str]]:
        """Import weights (and EMA shadows) from a reference TF1
        ``model.ckpt-<epoch>`` into the live state — the migration tool
        for pre-trained reference models (reference checkpoint grammar:
        trainers.py:444-554; see utils/tf1_import.py).

        ``rebuild``: ``'auto'`` (default) rebuilds ``net_config`` from
        the checkpoint's tensor shapes first when they disagree with
        the constructed architecture — the reference's
        ``recover_model_sizes`` flow (trainers.py:444-554) applied to
        its own checkpoints, so a user with ONLY a TF1 checkpoint needs
        no ``layer_sizes``; ``True`` forces it, ``False`` imports into
        the constructed shapes (mismatches raise).  Returns the
        imported/skipped variable-name report."""
        from .utils.tf1_import import (
            import_tf1_checkpoint,
            read_tf1_checkpoint,
            recover_model_sizes,
        )

        variables = (
            read_tf1_checkpoint(ckpt_path)
            if isinstance(ckpt_path, str)
            else dict(ckpt_path)
        )
        if rebuild:
            sizes = recover_model_sizes(variables)
            ls = sizes["layer_sizes"]
            cfg = self.net_config
            # only a COMPLETE checkpoint (all three stacks present) can
            # define an architecture; partial variable maps import into
            # the constructed shapes
            complete = bool(
                ls["encoder_embedding"]
                and ls["encoder_rnn"]
                and ls["decoder_rnn"]
            )
            mismatch = complete and (
                tuple(ls["encoder_rnn"]) != cfg.rnn_sizes
                or tuple(ls["encoder_embedding"]) != cfg.conv_sizes
                or tuple(ls["decoder_rnn"]) != cfg.dec_rnn_sizes
                or sizes.get("vocab_size", cfg.vocab_size) != cfg.vocab_size
            )
            if (rebuild is True and complete) or mismatch:
                self.vprint(
                    "TF1 checkpoint architecture differs from the "
                    "constructed net; rebuilding from tensor shapes"
                )
                self._apply_recovered_sizes(sizes)
        params, ema, report = import_tf1_checkpoint(
            variables,
            self.state.params,
            self.state.ema,
            subject_ids=self.subject_ids,
        )
        self.state = self.state._replace(
            params=jax.tree.map(jnp.asarray, params),
            ema=jax.tree.map(jnp.asarray, ema),
        )
        self.vprint(
            f"TF1 import: {len(report['imported'])} variables imported, "
            f"{len(report['skipped'])} skipped"
        )
        return report

    def update_net_from_saved_model(self, source) -> None:
        """Rebuild ``net_config`` from checkpoint tensor shapes
        (reference trainers.py:383-408).  ``source`` is a params pytree
        or an Orbax checkpoint directory; every architecture field that
        ``recover_model_sizes`` can infer (conv sizes/strides, LSTM
        sizes, aux/projection dims, vocab, attention, directionality)
        replaces the constructed value, and the compiled runners/decode
        fns are invalidated."""
        from .utils.introspect import recover_model_sizes

        self._apply_recovered_sizes(
            recover_model_sizes(
                source, in_channels=self.net_config.in_channels
            )
        )

    def _apply_recovered_sizes(self, sizes: dict) -> None:
        """Apply a recovered-architecture dict (from
        ``utils.introspect.recover_model_sizes`` or
        ``utils.tf1_import.recover_model_sizes``) to ``net_config`` and
        re-template the state."""
        import dataclasses

        cfg = self.net_config
        layer_sizes = sizes["layer_sizes"]
        aux_dims = sizes.get("aux_heads", {})
        aux_heads = tuple(
            head._replace(out_dim=aux_dims.get(head.name, head.out_dim))
            for head in cfg.aux_heads
            if head.name in aux_dims
        ) or cfg.aux_heads
        new_cfg = dataclasses.replace(
            cfg,
            vocab_size=int(sizes.get("vocab_size", cfg.vocab_size)),
            in_channels=int(sizes.get("in_channels", cfg.in_channels)),
            num_subjects=int(sizes.get("num_subjects", cfg.num_subjects)),
            conv_sizes=tuple(layer_sizes["encoder_embedding"]),
            decimation_factor=int(
                sizes.get("decimation_factor", cfg.decimation_factor)
            ),
            rnn_sizes=tuple(layer_sizes["encoder_rnn"]),
            aux_proj_sizes=tuple(layer_sizes["encoder_1_projection"])
            or cfg.aux_proj_sizes,
            aux_heads=aux_heads,
            dec_embedding_size=int(
                layer_sizes["decoder_embedding"][0]
                if layer_sizes.get("decoder_embedding")
                else cfg.dec_embedding_size
            ),
            dec_rnn_sizes=tuple(layer_sizes["decoder_rnn"]),
            use_attention=bool(
                sizes.get("use_attention", cfg.use_attention)
            ),
            BIDIRECTIONAL=bool(
                sizes.get("BIDIRECTIONAL", cfg.BIDIRECTIONAL)
            ),
        )
        if sizes.get("encoder_type") == "lstm" and cfg.encoder_type != "lstm":
            new_cfg = dataclasses.replace(new_cfg, encoder_type="lstm")
        if sizes.get("encoder_type") == "conformer":
            # blocks/dims/kernel (and MoE width) come from the shapes;
            # num_heads / chunk_size / left_context are not
            # shape-recoverable and carry over from the constructed
            # config (utils/introspect.py)
            base = cfg.conformer or ConformerConfig()
            new_cfg = dataclasses.replace(
                new_cfg,
                encoder_type="conformer",
                conformer=base._replace(**sizes["conformer"]),
                # the conformer checkpoint has no encoder rnn stack;
                # keep the constructed sizes rather than () so a later
                # family switch still has sane defaults
                rnn_sizes=cfg.rnn_sizes,
            )
        if new_cfg.vocab_size != cfg.vocab_size:
            self.vprint(
                f"warning: checkpoint vocab size {new_cfg.vocab_size} != "
                f"constructed {cfg.vocab_size}; decode indices follow the "
                "checkpoint"
            )
        self.net_config = new_cfg
        # template state with the recovered architecture; the caller
        # (restore) overwrites values from the checkpoint
        params = init_seq2seq(jax.random.PRNGKey(self.seed), new_cfg)
        self.state = TrainState(
            params=params,
            ema=jax.tree.map(jnp.copy, params),
            opt_state=None,
            epoch=jnp.asarray(0, jnp.int32),
        )
        self._runner_cache = {}
        self._jit_decode_key = None
        self._device_data = {}
        self._datasets = {}

    def assess_saved_model(
        self, restore_epoch: int | None = None, partitions=("validation",)
    ) -> dict:
        """Restore EMA weights from a checkpoint — rebuilding the net
        from checkpoint shapes if the architectures differ — and assess
        (reference trainers.py:376-408)."""
        self.restore(restore_epoch)
        return self.assess(partitions=partitions, use_ema=True)

    # -- results files (reference trainers.py:556-620) -----------------------

    def _results_file_name(self) -> str:
        project = self.manifest.resolve("project", default="proj")
        ids = "_".join(str(s) for s in self.subject_ids)
        ff = self.net_config.FF_dropout
        rnn = self.net_config.RNN_dropout
        sizes = "-".join(
            str(s)
            for s in (
                list(self.net_config.conv_sizes)
                + list(self.net_config.rnn_sizes)
                + list(self.net_config.dec_rnn_sizes)
            )
        )
        return f"accuracies_{project}{ids}_{ff}_{rnn}_{sizes}"

    def _save_results(self, history: dict[str, dict]) -> str | None:
        results_dir = self.manifest.resolve("saved_results_dir")
        if results_dir is None or not history:
            return None
        os.makedirs(results_dir, exist_ok=True)
        path = os.path.join(results_dir, self._results_file_name())
        with open(path, "w") as f:
            for epoch, snap in history.items():
                tr, va = snap["training"], snap["validation"]
                f.write(
                    f"{tr['accuracy']:.6f} {tr['word_error_rate']:.6f} "
                    f"{va['accuracy']:.6f} {va['word_error_rate']:.6f} "
                    f"{epoch}\n"
                )
        return path

    # -- inspection utilities ------------------------------------------------

    def subject_to_table(self):
        """Per-subject overview table (reference trainers.py:639-665)."""
        import pandas as pd

        rows = []
        for subject in self.ecog_subjects:
            dm = subject.data_manifests
            rows.append(
                {
                    "subject": subject.subject_id,
                    "channels": subject.data_generator.num_ECoG_channels,
                    "decimation": subject.decimation_factor,
                    "training_blocks": sorted(subject.block_ids("training")),
                    "validation_blocks": sorted(
                        subject.block_ids("validation")
                    ),
                    "vocab_size": dm["decoder_targets"].num_features,
                }
            )
        return pd.DataFrame(rows).set_index("subject")

    def count_all_targets(self) -> dict[int, dict]:
        return {
            subject.subject_id: subject.count_targets()
            for subject in self.ecog_subjects
        }

    def print_tensor_names(self) -> list[str]:
        """Parameter-tree paths + shapes (reference's checkpoint
        tensor-name dump, trainers.py:667-675)."""
        flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
        names = []
        for path, leaf in flat:
            name = "seq2seq/" + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            names.append(f"{name} {tuple(leaf.shape)}")
            self.vprint(names[-1])
        return names

    def tf_record_to_numpy_data(self, subject_index: int = -1, block=None):
        """Raw-record inspection generator (reference trainers.py:861-922)."""
        subject = self.ecog_subjects[subject_index]
        blocks = (
            [block] if block is not None else sorted(subject.all_blocks)
        )
        for b in blocks:
            for example in read_examples(
                subject.data_generator.tf_record_path(b)
            ):
                yield example

    # -- analysis hooks ------------------------------------------------------

    def get_saliencies(
        self,
        tensor_key: str = "decoder_targets",
        partition: str = "validation",
        use_ema: bool = True,
    ) -> np.ndarray:
        """Input-gradient saliency for one loss head: zero every other
        penalty scale and differentiate wrt the inputs (reference
        trainers.py:703-732 — a bespoke TF graph there, one `jax.grad`
        here)."""
        scales = {k: 0.0 for k in self.penalty_scales}
        scales[tensor_key] = 1.0
        params = self.state.ema if use_ema else self.state.params
        ds = self.packed_dataset(partition)
        config = self.net_config

        @jax.jit
        def saliency(params, batch):
            def loss_of_inputs(inputs):
                b = dict(batch, encoder_inputs=inputs)
                return seq2seq_loss(
                    params, config, b, jax.random.PRNGKey(0),
                    train=False, penalty_scales=scales,
                )[0]

            return jax.grad(loss_of_inputs)(batch["encoder_inputs"])

        grads = []
        for s in range(ds.num_subjects):
            n = int(ds.num_trials[s])
            batch = {
                k: jnp.asarray(v[s]) for k, v in ds.batch_dict().items()
            }
            batch["subject_idx"] = jnp.asarray(s, jnp.int32)
            grads.append(np.asarray(saliency(params, batch))[:n])
        return np.concatenate(grads, axis=0)

    def get_weights_as_numpy_array(
        self, name: str, use_ema: bool = True
    ) -> np.ndarray:
        """Fetch one parameter by slash path (e.g.
        'decoder/embedding', 'encoder/rnn/0/fwd/wh') — the reference's
        checkpoint-weight fetcher (trainers.py:699,750)."""
        tree = self.state.ema if use_ema else self.state.params
        node: Any = tree
        for part in name.split("/"):
            if isinstance(node, (list, tuple)):
                node = node[int(part)]
            else:
                node = node[part]
        return np.asarray(node)

    def cluster_embedded_words(
        self, method: str = "pca", num_clusters: int = 8, plot: bool = True
    ):
        """Cluster the decoder word-embedding rows (reference
        trainers.py:677-679 → plotters cluster_embeddings)."""
        from .plotting.embeddings import cluster_embeddings

        embeddings = self.get_weights_as_numpy_array("decoder/embedding")
        class_list = self.target_subject.data_manifests[
            "decoder_targets"
        ].feature_list
        return cluster_embeddings(
            embeddings,
            class_list=class_list,
            method=method,
            num_clusters=num_clusters,
            plot=plot,
        )

    def get_encoder_embedding(
        self, subject_index: int = -1, use_ema: bool = True
    ) -> np.ndarray:
        """First conv layer weights for one subject — the electrode-
        contribution basis (reference trainers.py:734-751)."""
        params = self.state.ema if use_ema else self.state.params
        w = params["subnet"]["conv"][0]["w"]
        return np.asarray(w[subject_index])

    def get_internal_activations(
        self, partition: str = "validation", subject_index: int = -1
    ) -> dict[str, np.ndarray]:
        """Forward-pass intermediates for schematic figures — the FULL
        probe of the reference (trainers.py:757-833, which rebuilds a
        bespoke graph to fetch convolved inputs, the REVERSED raw
        inputs, and the reversed+decimated aux targets for
        plotters.py:1259-1405; here each is one functional call).

        Returns (batch-major, real trials only):
        ``model_order_inputs`` (N, T, C) — the raw inputs in the order
        the encoder consumes them (valid-prefix-reversed for the LSTM
        encoder, natural time for the conformer);
        ``convolved_inputs`` (N, T', F) — the subnet conv stack output;
        ``aux_targets`` {head: (N, T'[, F])} — per-head targets aligned
        to encoder steps (reversed+decimated exactly as the loss aligns
        them; CTC heads are alignment-free and excluded);
        plus ``encoder_outputs``, ``final_state_h/c``,
        ``encoder_lengths``."""
        from .models.seq2seq import _decimate_targets, convolve_sequences
        from .ops.lstm import reverse_padded

        config = self.net_config
        ds = self.packed_dataset(partition)
        s = (
            subject_index
            if subject_index >= 0
            else ds.num_subjects + subject_index
        )
        n = int(ds.num_trials[s])
        inputs = jnp.asarray(ds.encoder_inputs[s])
        lengths = jnp.asarray(ds.encoder_lengths[s])
        sidx = jnp.asarray(s, jnp.int32)
        rng = jax.random.PRNGKey(0)
        enc_out, final, enc_lengths = encode(
            self.state.ema, config, inputs, lengths, sidx, rng,
            train=False,
        )
        reverse = config.encoder_type != "conformer"
        xs = jnp.moveaxis(inputs, 0, 1)  # (T, B, C)
        model_order = reverse_padded(xs, lengths) if reverse else xs
        if config.conv_sizes:
            convolved = convolve_sequences(
                self.state.ema, config, xs, sidx, rng, train=False,
                reverse_lengths=lengths if reverse else None,
            )  # (T', B, F)
        else:
            d0 = config.decimation_factor
            convolved = model_order[: (xs.shape[0] // d0) * d0 : d0]
        T_out = convolved.shape[0]
        aux_aligned: dict[str, np.ndarray] = {}
        for head in config.aux_heads:
            if head.distribution == "CTC":
                continue  # alignment-free: no per-step aligned target
            raw = ds.aux_targets.get(head.name)
            if raw is None:
                continue
            ts = jnp.moveaxis(jnp.asarray(raw[s]), 0, 1)  # (T, B[, F])
            aligned = _decimate_targets(
                ts, lengths, config.decimation_factor, T_out,
                reverse=reverse,
            )
            aux_aligned[head.name] = np.moveaxis(
                np.asarray(aligned), 0, 1
            )[:n]
        return {
            "model_order_inputs": np.moveaxis(
                np.asarray(model_order), 0, 1
            )[:n],
            "convolved_inputs": np.moveaxis(np.asarray(convolved), 0, 1)[:n],
            "aux_targets": aux_aligned,
            "encoder_outputs": np.moveaxis(np.asarray(enc_out), 0, 1)[:n],
            "final_state_h": np.asarray(final[0])[:n],
            "final_state_c": np.asarray(final[1])[:n],
            "encoder_lengths": np.asarray(enc_lengths)[:n],
        }
