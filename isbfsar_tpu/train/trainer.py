"""Episodic trainer for the TRX-OS recognizer (data-parallel over a mesh).

Behavioral rebuild of the reference training loop (reference
modules/ar/utils/train.py:27-220):

- loss = CE(few-shot logits) + BCE(discriminator, known episodes) +
  BCE(discriminator, unknown episodes) with the reference's gating: the
  discriminator trains only on episodes the few-shot head got right
  (train.py:135-141), the unknown term uses as many samples as the known
  term (train.py:158-171 — here per-sample pairing instead of prefix
  selection: sample i's unknown episode counts iff sample i's known episode
  was correct; same counts, static shapes)
- SGD + piecewise-constant LR (MultiStepLR equivalent), gradient
  accumulation via optax.MultiSteps (optimize_every, train.py:184-193)
- every ``eval_every_n_epoch``-th epoch swaps to the validation sampler and
  skips optimization (the reference's loader-swap quirk, train.py:103-107)
- per-epoch checkpoint {epoch, params, opt_state} (train.py:213-217)
- metrics: fs/os loss + acc + P/R/F1 (train.py:199-211) to JSONL/wandb

TPU design: one jit'd train step; the episode batch is sharded over the
``dp`` mesh axis and parameters are replicated — XLA inserts the gradient
all-reduce over ICI (the reference's DataParallel scatter/gather,
model.py:360-369, disappears into SPMD). A second apply for the unknown
episode reuses the already-extracted support features (identical math,
half the extractor work).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isbfsar_tpu.configs import ARConfig
from isbfsar_tpu.models.trx import TRXOS
from isbfsar_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_sp,
    shard_params_fsdp,
    shard_params_tp,
)
from isbfsar_tpu.utils import checkpoint as ckpt
from isbfsar_tpu.utils.metrics import MetricsLogger, binary_prf

MODALITY_KEYS = {"skeleton": ("sk",), "rgb": ("rgb",), "hybrid": ("rgb", "sk")}


def _bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    return -(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


def _sp_extract(model, mesh, seq_axis, params, stats, data, has_bn, train):
    """One extractor apply with the clip TIME axis pinned to ``seq_axis``
    on BOTH sides (input leaves and the feature output). Explicit pins —
    not just sharded inputs — are required: under parameter sharding
    (fsdp) GSPMD's propagation prefers a dp-only activation layout and
    silently all-gathers L before the convs (measured: with replicated
    params only the support apply needed pins; with fsdp the query and
    unknown applies lost 'sp' too — sp_parity_check's interceptor catches
    both). Leading data dims pin P('dp', sp); trailing dims (frame dims,
    or the way-minor support layout's way axis) stay unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is not None:
        sh = NamedSharding(mesh, P("dp", seq_axis))
        data = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, sh), data
        )
    variables = {"params": params}
    if has_bn:
        variables["batch_stats"] = stats
    if has_bn and train:
        feats, mut = model.apply(
            variables, data, train=True, mutable=["batch_stats"],
            method=TRXOS.extract_features,
        )
        new_stats = mut["batch_stats"]
    else:
        feats = model.apply(
            variables, data, train=train, method=TRXOS.extract_features
        )
        new_stats = stats
    if mesh is not None:
        # pin the output side too: the transformer downstream contracts
        # over L, so GSPMD's backward propagation could otherwise pull
        # the L all-gather in front of the convs
        out_spec = P("dp", seq_axis, *([None] * (feats.ndim - 2)))
        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, out_spec)
        )
    return feats, new_stats


def _sp_forward(model, mesh, seq_axis, params, batch_stats, batch, mask,
                has_bn, train):
    """Sequence-parallel known-episode forward: extract query, then support
    on a way-minor (b, L, way, ...) layout (constrained P('dp', sp) so the
    extractor's frame flatten stays sharded over BOTH axes — see the
    representability note inline), then match via ``match_with_features``.
    Same extractor-apply ORDER as ``__call__`` (query, support), so the BN
    running-stats trajectory is identical to the default path's single
    apply."""
    q_feats, stats1 = _sp_extract(
        model, mesh, seq_axis, params, batch_stats, batch["target_set"],
        has_bn, train,
    )

    # Way-MINOR support layout: (b, way, L, ...) -> (b, L, way, ...).
    # The extractor's frame flatten merges its leading axes into the conv
    # batch dim, and a flatten preserves a multi-axis sharding only when
    # each device's element set stays CONTIGUOUS under the merge: scanning
    # from the major end, every sharded axis before the LAST sharded one
    # must have per-shard block 1, and everything after the last sharded
    # axis must be unsharded. The natural (b, way, L) puts unsharded way
    # BETWEEN the sharded axes — unrepresentable, so GSPMD silently
    # all-gathers L (measured: the support extractor ran dp-only). A
    # time-major (L, b*way) hoist has L-block L/sp > 1 before the
    # dp-sharded axis — also unrepresentable, and worse: GSPMD kept 'sp'
    # but DROPPED 'dp', convolving every support frame dp-fold redundantly
    # (measured via compiled HLO: per-device conv batch 80 of 160 global
    # on dp4xsp2, 1.56x the dp-only per-device FLOPs).
    # (b:'dp' block-1, L:'sp', way unsharded-minor) satisfies the rule:
    # the merge carries P(('dp','sp')) and each device convolves exactly
    # (L/sp)*way of its own episodes' frames
    # (tests/test_parallel.py::test_sp_cuts_per_device_flops pins the
    # per-device FLOPs cut with the compiler's own cost model).
    # Numerically this is only a batch reordering: convs are per-sample
    # and BN batch statistics are order-invariant sums
    # (reassociation-level float noise only).
    sup = jax.tree.map(
        lambda x: jnp.swapaxes(x, 1, 2), batch["support_set"]
    )
    s_swapped, stats2 = _sp_extract(
        model, mesh, seq_axis, params, stats1, sup, has_bn, train,
    )  # (b, L, way, D)
    s_feats = jnp.swapaxes(s_swapped, 1, 2)  # (b, way, L, D)

    variables = {"params": params}
    if has_bn:
        variables["batch_stats"] = stats2
    out = model.apply(
        variables, q_feats, mask, s_feats, method=TRXOS.match_with_features
    )
    return out, stats2


def make_loss_fn(model: TRXOS, cfg: ARConfig, mesh=None, seq_axis: Optional[str] = None):
    """``seq_axis`` (with its ``mesh``) turns on the sequence-parallel
    forward: support-set extraction is hoisted onto a way-minor
    (b, L, way, ...) layout so the extractor's frame flatten merges
    (dp, sp)-contiguously — the natural (b, way, L) flatten cannot
    carry an L-axis sharding past the unsharded way axis, and XLA silently
    all-gathers the support clips (measured: the support extractor ran
    dp-only; see the representability note in ``_sp_forward``). The BN
    update order of the default path (query extraction, then support) is
    preserved, so the hoisted step is numerically the SAME step
    (parallel/parity.py::sp_parity_check certifies it against the default
    1-device trainer)."""
    sp_hoist = seq_axis is not None and cfg.input_type in ("rgb", "hybrid")
    if sp_hoist and mesh is None:
        # without a mesh the _sp_extract pins silently no-op and GSPMD
        # produces exactly the degraded all-gather plan the hoist exists
        # to prevent — fail fast instead
        raise ValueError(
            "make_loss_fn(seq_axis=...) requires the dp x sp mesh the "
            "sharding pins are written against (got mesh=None)"
        )

    def loss_fn(params, batch_stats, batch, disc_on: bool, train: bool = True):
        """params/batch_stats are separate so gradients flow only through
        params; BN running stats (rgb/hybrid modes) update functionally and
        are returned as aux (the reference's torch BN updates in-place)."""
        b = batch["target_class"].shape[0]
        mask = jnp.ones((b, cfg.way), bool)

        has_bn = batch_stats is not None and len(batch_stats) > 0
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats

        def apply(query, **kw):
            if has_bn and train:
                out, mut = model.apply(
                    variables, query, mask, train=True, mutable=["batch_stats"], **kw
                )
                return out, mut["batch_stats"]
            return model.apply(variables, query, mask, **kw), batch_stats

        if sp_hoist:
            out, new_stats = _sp_forward(
                model, mesh, seq_axis, params, batch_stats, batch, mask,
                has_bn, train,
            )
        else:
            out, new_stats = apply(
                batch["target_set"], support_data=batch["support_set"]
            )
        logits = out["logits"]
        target = (batch["support_classes"] == batch["target_class"][:, None]).astype(jnp.float32)

        fs_loss = jnp.mean(
            -jnp.sum(target * jax.nn.log_softmax(logits, axis=-1), axis=-1)
        )
        fs_correct = jnp.argmax(logits, 1) == jnp.argmax(target, 1)
        metrics: Dict[str, Any] = {
            "fs_loss": fs_loss,
            "fs_correct": fs_correct,
            "batch_stats": new_stats,
        }
        total = fs_loss

        if disc_on:
            w = fs_correct.astype(jnp.float32)  # train disc only where FS was right
            n = jnp.maximum(jnp.sum(w), 1.0)

            known_pred = out["is_true"][:, 0]
            known_os = jnp.sum(_bce(known_pred, jnp.ones_like(known_pred)) * w) / n

            if sp_hoist:
                # same semantics as the default apply below (extract the
                # unknown clips with the PRE-step batch_stats, discard the
                # mutated stats, match against the cached support
                # features), but with the TIME axis pinned — under fsdp,
                # propagation alone loses 'sp' here (see _sp_extract)
                u_feats, _ = _sp_extract(
                    model, mesh, seq_axis, params, batch_stats,
                    batch["unknown_set"], has_bn, train,
                )
                variables_u = {"params": params}
                if has_bn:
                    variables_u["batch_stats"] = batch_stats
                out_u = model.apply(
                    variables_u, u_feats, mask, out["support_features"],
                    method=TRXOS.match_with_features,
                )
            else:
                out_u, _ = apply(
                    batch["unknown_set"], support_features=out["support_features"]
                )
            unk_pred = out_u["is_true"][:, 0]
            unknown_os = jnp.sum(_bce(unk_pred, jnp.zeros_like(unk_pred)) * w) / n

            any_correct = jnp.sum(w) > 0
            total = total + jnp.where(any_correct, known_os + unknown_os, 0.0)
            metrics.update(
                os_loss=jnp.where(any_correct, 0.5 * (known_os + unknown_os), 0.0),
                os_weights=w,
                os_known_pred=known_pred,
                os_unknown_pred=unk_pred,
            )
        return total, metrics

    return loss_fn


def milestone_boundaries(config, inner_per_epoch: int) -> Dict[int, float]:
    """MultiStepLR boundaries in inner-update units. torch applies gamma
    once PER listed milestone, so first == second (the ARConfig defaults)
    means a 100x drop at that epoch — a dict literal would silently
    collapse the duplicate key into a single 10x step
    (reference train.py:72-75)."""
    boundaries: Dict[int, float] = {}
    for milestone in (config.first_milestone, config.second_milestone):
        step = milestone * inner_per_epoch
        boundaries[step] = boundaries.get(step, 1.0) * 0.1
    return boundaries


class Trainer:
    def __init__(
        self,
        config: ARConfig,
        train_sampler=None,
        valid_sampler=None,
        mesh=None,
        log_dir: str = "runs/trx",
        seed: int = 0,
        use_wandb: bool = True,
        param_sharding: str = "replicated",
        seq_axis: Optional[str] = None,
    ):
        self.cfg = config
        self.model = TRXOS(config)
        self.train_sampler = train_sampler
        self.valid_sampler = valid_sampler
        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = MetricsLogger(log_dir, use_wandb=use_wandb)
        self.ckpt_dir = config.checkpoint_dir or f"{log_dir}/checkpoints"

        # param_sharding="fsdp" shards params + optimizer state over the dp
        # axis (ZeRO; parallel/mesh.py shard_params_fsdp) — per-device memory
        # drops ~n-fold while the step stays numerically equivalent
        # (parallel/parity.py fsdp_parity_check certifies it). BN stats stay
        # replicated: they are small and every device needs them per step.
        # param_sharding="tp" is Megatron-style tensor parallelism over a
        # dedicated "tp" mesh axis (shard_params_tp): weights stay sharded
        # through the compute, composing with dp on a 2D mesh
        # (tp_parity_check certifies equivalence).
        if param_sharding not in ("replicated", "fsdp", "tp"):
            raise ValueError(f"param_sharding: {param_sharding!r} not in "
                             f"('replicated', 'fsdp', 'tp')")
        if param_sharding == "tp" and "tp" not in self.mesh.axis_names:
            raise ValueError(
                f"param_sharding='tp' needs a mesh with a 'tp' axis "
                f"(got {self.mesh.axis_names}); build one with "
                f"make_mesh_2d((dp, tp), ('dp', 'tp'))"
            )
        # seq_axis="sp" additionally shards the clip TIME axis over a
        # dedicated mesh axis (sequence parallelism; shard_batch_sp):
        # per-device extractor FLOPs drop ~sp-fold for a FIXED batch, BN
        # statistics psum over dp AND sp so they stay exactly the full-batch
        # stats (sp_parity_check certifies equivalence). Composes with any
        # param_sharding (params are placed by mesh-axis NAME, batches by
        # their own specs).
        if seq_axis is not None:
            if seq_axis not in self.mesh.axis_names:
                raise ValueError(
                    f"seq_axis={seq_axis!r} not in mesh axes "
                    f"{self.mesh.axis_names}; build one with "
                    f"make_mesh_2d((dp, sp), ('dp', 'sp'))"
                )
            if config.seq_len % self.mesh.shape[seq_axis]:
                raise ValueError(
                    f"seq_len={config.seq_len} not divisible by the "
                    f"{seq_axis!r} mesh axis ({self.mesh.shape[seq_axis]})"
                )
        self.seq_axis = seq_axis
        self.param_sharding = param_sharding
        place = {
            "replicated": replicate,
            "fsdp": shard_params_fsdp,
            "tp": shard_params_tp,
        }[param_sharding]
        self._place = place

        variables = self._init_params(seed)
        self.params = place(variables["params"], self.mesh)
        self.batch_stats = replicate(variables.get("batch_stats", {}), self.mesh)

        steps_per_epoch = max(1, (config.n_task // config.batch_size))
        # The schedule sits inside optax.MultiSteps, whose inner step count
        # advances once per `optimize_every` accumulated micro-steps — so the
        # epoch milestones (reference train.py:72-75 MultiStepLR) must be
        # expressed in inner-update units, not micro-steps.
        inner_per_epoch = max(1, steps_per_epoch // max(1, config.optimize_every))
        schedule = optax.piecewise_constant_schedule(
            config.initial_lr, milestone_boundaries(config, inner_per_epoch)
        )
        self.optimizer = optax.MultiSteps(
            optax.sgd(schedule), every_k_schedule=max(1, config.optimize_every)
        )
        self.opt_state = place(self.optimizer.init(self.params), self.mesh)

        loss_fn = make_loss_fn(self.model, config, mesh=self.mesh,
                               seq_axis=seq_axis)

        def train_step(params, batch_stats, opt_state, batch, disc_on):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, disc_on
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_stats = metrics.pop("batch_stats")
            return params, new_stats, opt_state, metrics

        def eval_step(params, batch_stats, batch, disc_on):
            _, metrics = loss_fn(params, batch_stats, batch, disc_on, train=False)
            metrics.pop("batch_stats")
            return metrics

        self._train_step = jax.jit(
            train_step, static_argnames="disc_on", donate_argnums=(0, 1, 2)
        )
        self._eval_step = jax.jit(eval_step, static_argnames="disc_on")

    def _init_params(self, seed: int):
        cfg = self.cfg
        shapes = {"sk": (cfg.n_joints * 3,), "rgb": (cfg.rgb_size, cfg.rgb_size, 3)}
        keys = MODALITY_KEYS[cfg.input_type]
        q = {m: jnp.zeros((1, cfg.seq_len) + shapes[m]) for m in keys}
        s = {m: jnp.zeros((1, cfg.way, cfg.seq_len) + shapes[m]) for m in keys}

        @jax.jit
        def init(key):
            return self.model.init(key, q, jnp.ones((1, cfg.way), bool), support_data=s)

        return init(jax.random.key(seed))

    # ----------------------------------------------------------------- loop

    def run_epoch(self, epoch: int, batches: Iterable[Dict], train: bool) -> Dict[str, float]:
        disc_on = epoch > self.cfg.start_discriminator_after_epoch - 1
        fs_losses: List[float] = []
        fs_correct: List[np.ndarray] = []
        os_losses: List[float] = []
        os_true: List[np.ndarray] = []
        os_pred: List[np.ndarray] = []

        for batch in batches:
            batch = self._prepare(batch)
            if train:
                self.params, self.batch_stats, self.opt_state, metrics = self._train_step(
                    self.params, self.batch_stats, self.opt_state, batch, disc_on
                )
            else:
                metrics = self._eval_step(self.params, self.batch_stats, batch, disc_on)

            fs_losses.append(float(metrics["fs_loss"]))
            fs_correct.append(np.asarray(metrics["fs_correct"]))
            if disc_on:
                os_losses.append(float(metrics["os_loss"]))
                w = np.asarray(metrics["os_weights"]) > 0
                os_true.append(np.ones(int(w.sum())))
                os_pred.append((np.asarray(metrics["os_known_pred"])[w] > 0.5).astype(float))
                os_true.append(np.zeros(int(w.sum())))
                os_pred.append((np.asarray(metrics["os_unknown_pred"])[w] > 0.5).astype(float))

        os_true_all = np.concatenate(os_true) if os_true else np.zeros(1)
        os_pred_all = np.concatenate(os_pred) if os_pred else np.zeros(1)
        prf = binary_prf(os_true_all, os_pred_all)
        label = "train" if train else "valid"
        summary = {
            f"{label}/fs_loss": float(np.mean(fs_losses)) if fs_losses else 0.0,
            f"{label}/fs_accuracy": float(np.concatenate(fs_correct).mean()) if fs_correct else 0.0,
            f"{label}/os_loss": float(np.mean(os_losses)) if os_losses else 0.0,
            f"{label}/os_accuracy": prf["accuracy"],
            f"{label}/os_precision": prf["precision"],
            f"{label}/os_recall": prf["recall"],
            f"{label}/os_f1": prf["f1"],
        }
        self.logger.log(summary, step=epoch)
        return summary

    def _prepare(self, batch: Dict) -> Dict:
        keep = {
            "support_set": batch["support_set"],
            "target_set": batch["target_set"],
            "unknown_set": batch.get("unknown_set", batch["target_set"]),
            "support_classes": np.asarray(batch["support_classes"], np.int32),
            "target_class": np.asarray(batch["target_class"], np.int32),
        }
        if self.seq_axis is not None:
            return shard_batch_sp(keep, self.mesh, seq_axis=self.seq_axis)
        return shard_batch(keep, self.mesh)

    def load_state(self, state: Dict) -> None:
        """Adopt a restored checkpoint ({params, batch_stats, opt_state}),
        re-placing every tree under THIS trainer's sharding rule. A raw
        assignment of the restored host-numpy trees would re-upload them on
        every step (the committed-params pathology, docs/PERF.md) and an
        fsdp trainer would silently lose its parameter sharding."""
        self.params = self._place(state["params"], self.mesh)
        self.batch_stats = replicate(state.get("batch_stats", {}), self.mesh)
        self.opt_state = self._place(state["opt_state"], self.mesh)

    def fit(self, n_epochs: Optional[int] = None, batches_fn=None) -> Dict[str, float]:
        """batches_fn(sampler, epoch) -> iterable of batches (injectable for tests)."""
        from isbfsar_tpu.train.dataloader import batch_iterator

        cfg = self.cfg
        n_epochs = n_epochs or cfg.n_epochs
        batches_fn = batches_fn or (
            lambda sampler, epoch: batch_iterator(sampler, cfg.batch_size, seed=epoch)
        )
        last = {}
        for epoch in range(n_epochs):
            do_eval = epoch % cfg.eval_every_n_epoch == 0 and self.valid_sampler is not None
            sampler = self.valid_sampler if do_eval else self.train_sampler
            last = self.run_epoch(epoch, batches_fn(sampler, epoch), train=not do_eval)
            if not do_eval:
                ckpt.save_checkpoint(
                    self.ckpt_dir,
                    epoch,
                    {
                        "params": self.params,
                        "batch_stats": self.batch_stats,
                        "opt_state": self.opt_state,
                    },
                    meta={"epoch": epoch},
                    backend=cfg.ckpt_backend,
                )
        return last
