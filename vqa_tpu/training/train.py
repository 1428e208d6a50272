"""Training loop: optax AdamW + warmup-cosine, jitted steps over the mesh.

Re-design of the reference trainer (reference: training/train.py:52-571)
with the same semantics — CE loss over 1000 answers, AdamW lr=1e-4 wd=0.01,
cosine decay to 1e-6, global-norm clip 1.0, per-epoch validation, best-model
tracking, early stop patience 10, checkpoint every 5 epochs, resume,
KeyboardInterrupt checkpoint — and TPU-first mechanics:

- ONE jitted XLA program per step (forward+loss+backward+update), donated
  state buffers; bf16 compute / f32 params replaces CUDA AMP+GradScaler
  (reference: training/train.py:146,179-195 — no loss scaler needed on TPU)
- warmup is actually implemented (the reference declares warmup_epochs=2
  but never uses it, utils/config.py:190 vs training/train.py:139-143)
- batches stream through a prefetching pipeline pre-sharded over the
  ``data`` mesh axis; metrics stay on device until epoch end (the reference
  syncs host↔device every batch via .item()/.cpu(),
  training/train.py:211 + utils/metrics.py:81-82)
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from vqa_tpu.data.dataset import create_demo_loaders, create_train_val_loaders
from vqa_tpu.data.pipeline import prefetch_to_device
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.parallel.mesh import data_sharding, shard_variables
from vqa_tpu.training import checkpoint as ckpt_lib
from vqa_tpu.utils.config import ModelConfig, TrainingConfig
from vqa_tpu.utils.metrics import MetricsLogger, topk_correct, topk_flags
from vqa_tpu.utils.profiling import StepTimer, maybe_trace, step_annotation


class TrainState(train_state.TrainState):
    """Flax TrainState + BatchNorm running statistics."""

    batch_stats: Any = None


def make_optimizer(
    cfg: TrainingConfig, steps_per_epoch: int
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + warmup-cosine + global-norm clip
    (reference: training/train.py:120-143, warmup fixed)."""
    warmup_steps = cfg.warmup_epochs * steps_per_epoch
    total_steps = max(cfg.num_epochs * steps_per_epoch, warmup_steps + 1)
    granularity = getattr(cfg, "lr_schedule_granularity", "step")
    if granularity == "epoch":
        # the reference's exact semantics: CosineAnnealingLR(T_max=epochs)
        # stepped once per epoch, so the LR is piecewise-constant within an
        # epoch at eta_min + (lr-eta_min)(1+cos(pi*e/T_max))/2 (reference:
        # training/train.py:139-143,352). Warmup (when enabled) is likewise
        # per-epoch: the already-cosine-decayed LR is scaled by
        # min((e+1)/warmup_epochs, 1) for the first warmup_epochs.
        base = optax.cosine_decay_schedule(
            init_value=cfg.learning_rate - cfg.min_lr,
            decay_steps=max(cfg.num_epochs, 1),
        )
        spe = max(steps_per_epoch, 1)  # drop_last can make it 0

        def schedule(step):
            epoch = jnp.minimum(step // spe, cfg.num_epochs)
            lr = cfg.min_lr + base(epoch)
            if cfg.warmup_epochs:
                scale = jnp.minimum((epoch + 1.0) / cfg.warmup_epochs, 1.0)
                lr = lr * scale
            return lr
    elif granularity == "step":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else cfg.learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=cfg.min_lr,
        )
    else:
        raise ValueError(
            f"lr_schedule_granularity must be 'step' or 'epoch', "
            f"got {granularity!r}"
        )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            weight_decay=cfg.weight_decay,
        ),
    )
    return tx, schedule


def make_train_step(model, grad_accum: int = 1, label_smoothing: float = 0.0,
                    remat: str = "none"):
    """Build the jitted train step: forward+CE+backward+update+BN-EMA in one
    XLA program. Metrics (loss, top1/top5 counts) stay on device.

    ``grad_accum > 1`` splits the batch into that many microbatches and
    ``lax.scan``s forward+backward over them inside the same program — one
    optimizer update on the averaged gradients. Peak activation memory drops
    by ~grad_accum× (only one microbatch's activations are ever live) at the
    cost of smaller matmuls per microbatch. BatchNorm normalizes each
    microbatch with its own statistics (train-mode semantics) and chains the
    EMA update through the scan carry, which matches running the microbatches
    as separate steps stats-wise. ``label_smoothing`` > 0 smooths the CE
    targets uniformly over the answer classes.

    ``remat`` rematerializes activations in the backward instead of saving
    them (``jax.checkpoint``): "full" saves nothing (max memory saving,
    recomputes the whole forward), "stages" keeps only the CNN stem/stage
    boundary activations (``checkpoint_name`` tags in models/cnn_backbone.py)
    and recomputes stage interiors. Both are memory levers for activation-
    bound configs; on-chip speed measurements are in docs/PERF.md
    (scripts/exp_bwd_remat.py)."""

    def _ce(logits, labels):
        if label_smoothing:
            n = logits.shape[-1]
            targets = optax.smooth_labels(
                jax.nn.one_hot(labels, n), label_smoothing
            )
            return optax.softmax_cross_entropy(logits, targets)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels)

    def _maybe_remat(loss_fn):
        if remat == "none":
            return loss_fn
        cp = jax.checkpoint_policies
        if remat == "full":
            policy = cp.nothing_saveable
        elif remat == "stages":
            policy = cp.save_only_these_names(
                "resnet_stem", "resnet_stage1", "resnet_stage2",
                "resnet_stage3", "resnet_stage4")
        else:
            raise ValueError(
                f"remat={remat!r}: expected 'none', 'full' or 'stages'")
        return jax.checkpoint(loss_fn, policy=policy)

    if grad_accum == 1:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, images, token_ids, mask, labels, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                (logits, _), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    token_ids,
                    mask,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": step_rng},
                )
                loss = _ce(logits, labels).mean()
                return loss, (logits, mutated["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                _maybe_remat(loss_fn), has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads=grads)
            new_state = new_state.replace(batch_stats=new_stats)

            correct1, correct5 = topk_correct(logits, labels, k=5)
            return new_state, {
                "loss": loss,
                "correct1": correct1,
                "correct5": correct5,
            }

        return train_step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, token_ids, mask, labels, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if images.shape[0] % grad_accum:
            raise ValueError(
                f"batch size {images.shape[0]} not divisible by "
                f"grad_accum={grad_accum}"
            )

        def split(x):
            return x.reshape((grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

        microbatches = jax.tree_util.tree_map(
            split, (images, token_ids, mask, labels)
        )

        def loss_fn(params, batch_stats, mb, mb_rng):
            mb_images, mb_ids, mb_mask, mb_labels = mb
            (logits, _), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                mb_images,
                mb_ids,
                mb_mask,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": mb_rng},
            )
            loss = _ce(logits, mb_labels).mean()
            return loss, (logits, mutated["batch_stats"])

        def body(carry, xs):
            stats, grad_sum, loss_sum, c1, c5, i = carry
            mb = xs
            (loss, (logits, stats)), grads = jax.value_and_grad(
                _maybe_remat(loss_fn), has_aux=True
            )(state.params, stats, mb, jax.random.fold_in(step_rng, i))
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            f1, f5 = topk_correct(logits, mb[3], k=5)
            return (stats, grad_sum, loss_sum + loss, c1 + f1, c5 + f5,
                    i + 1), None

        carry0 = (
            state.batch_stats,
            jax.tree_util.tree_map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )
        (new_stats, grad_sum, loss_sum, c1, c5, _), _ = jax.lax.scan(
            body, carry0, microbatches
        )
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grad_sum)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        return new_state, {
            "loss": loss_sum / grad_accum,
            "correct1": c1,
            "correct5": c5,
        }

    return train_step


def make_val_step(model, num_types: int = 0):
    """Jitted validation step reducing to scalar sums ON DEVICE (pad rows
    masked by ``valid_mask``). Replicated scalars are readable on every
    host, so this path works unchanged on multi-host pods — unlike host-side
    ``[:valid]`` slicing, which cannot touch a non-addressable global array.

    ``num_types > 0`` adds per-question-type (correct, total) sums via an
    on-device scatter-add over integer ``type_ids`` — the reference's
    VQAAccuracy per-type plumbing, actually fed during training validation
    (reference: utils/metrics.py:97-105, never called there)."""

    @jax.jit
    def val_step(params, batch_stats, images, token_ids, mask, labels,
                 valid_mask, type_ids=None):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            token_ids,
            mask,
            train=False,
        )
        w = valid_mask.astype(jnp.float32)
        loss_vec = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        )
        flags1, flags5 = topk_flags(logits, labels, k=5)
        out = {
            "loss_sum": jnp.sum(loss_vec * w),
            "correct1": jnp.sum(flags1 * w),
            "correct5": jnp.sum(flags5 * w),
            "n": jnp.sum(w),
        }
        if num_types and type_ids is not None:
            # num_types + 1 rows: the last is the loader's explicit
            # unknown-type overflow bucket, sliced off so stray types
            # never corrupt a real type's counts
            out["type_correct"] = (
                jnp.zeros(num_types + 1, jnp.float32)
                .at[type_ids].add(flags1 * w)[:num_types]
            )
            out["type_total"] = (
                jnp.zeros(num_types + 1, jnp.float32)
                .at[type_ids].add(w)[:num_types]
            )
        return out

    return val_step


def make_eval_step(model):
    """Jitted eval step returning per-sample correctness flags (host slices
    off any padding in the final batch) plus logits for analysis."""

    @jax.jit
    def eval_step(params, batch_stats, images, token_ids, mask, labels):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            token_ids,
            mask,
            train=False,
        )
        loss_vec = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        )
        flags1, flags5 = topk_flags(logits, labels, k=5)
        return {
            "loss_vec": loss_vec,
            "pred": jnp.argmax(logits, -1),
            "correct1": flags1,
            "correct5": flags5,
            "logits": logits,
        }

    return eval_step


class Trainer:
    """Owns model/state/steps; mirrors the reference Trainer contract
    (reference: training/train.py:52-398)."""

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        train_loader,
        val_loader,
        config: Optional[TrainingConfig] = None,
        mesh=None,
        mesh_config=None,
        checkpoint_dir: Optional[str] = None,
        save_checkpoints: bool = True,
        seed: int = 42,
        profile_dir: Optional[str] = None,
        run_meta: Optional[Dict[str, Any]] = None,
        log_dir: Optional[str] = None,
    ):
        self.model = model
        self.cfg = config or TrainingConfig()
        self.train_loader = train_loader
        self.val_loader = val_loader
        if mesh is None:
            # Build from MeshConfig (global MESH unless one is passed) so
            # dp/tp degree is a config/flag change. In auto mode (-1) the
            # data-parallel degree is clamped to divide the GLOBAL batch
            # size — on multi-host pods the loaders hold per-process
            # slices, and clamping by the local size would build a mesh
            # restricted to one host's devices (other hosts would then
            # address shardings containing none of their devices).
            import math

            from vqa_tpu.parallel.mesh import mesh_from_config

            n_dev = len(jax.devices())
            local_bs = math.gcd(
                getattr(train_loader, "batch_size", n_dev),
                getattr(val_loader, "batch_size", n_dev),
            )
            global_bs = local_bs * jax.process_count()
            mesh = mesh_from_config(mesh_config, batch_divisor=global_bs)
        self.mesh = mesh
        self.checkpoint_dir = checkpoint_dir
        self.save_checkpoints = save_checkpoints and checkpoint_dir is not None
        self.rng = jax.random.PRNGKey(seed)

        steps_per_epoch = max(len(train_loader), 1)
        self.tx, self.schedule = make_optimizer(self.cfg, steps_per_epoch)

        variables = shard_variables(variables, self.mesh)
        self.state = TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=self.tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        self.train_step = make_train_step(
            model,
            grad_accum=self.cfg.grad_accum,
            label_smoothing=self.cfg.label_smoothing,
            remat=self.cfg.remat,
        )
        # per-question-type val accuracy when the val loader carries a type
        # vocabulary (integer type_ids reduce on device — multi-host safe)
        self.val_type_vocab = getattr(val_loader, "type_vocab", None)
        self.val_step = make_val_step(
            model,
            num_types=len(self.val_type_vocab) if self.val_type_vocab else 0,
        )
        self.batch_sharding = data_sharding(self.mesh)
        # on-device augmentation program for uint8 train batches
        # (data.preprocess.device_augment; loaders opt in via device_augment)
        from vqa_tpu.data.preprocess import device_augment

        self._augment = jax.jit(
            functools.partial(
                device_augment, image_size=model.config.image_size
            )
        )
        self._aug_rng = jax.random.fold_in(self.rng, 0x5EED)

        self.logger = MetricsLogger()
        self.start_epoch = 0
        self.best_val_accuracy = 0.0
        # observability (SURVEY.md §5 — the reference has none): a trace of
        # the first trained epoch is dumped to profile_dir when set; the
        # fenced StepTimer only runs under profiling so the default path
        # keeps its no-per-step-sync pipelining.
        self.profile_dir = profile_dir
        self.step_timer = StepTimer()
        # run provenance persisted into every checkpoint sidecar (e.g. the
        # --synthetic dataset spec, so evaluation rebuilds the exact split)
        self.run_meta = dict(run_meta or {})
        # TensorBoard scalars (utils/tb.py) — primary process only on pods
        from vqa_tpu.parallel import distributed
        from vqa_tpu.utils.tb import maybe_scalar_writer

        self.scalar_writer = maybe_scalar_writer(
            log_dir if distributed.is_primary() else None
        )

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        loss_sum, c1, c5, n = 0.0, 0, 0, 0
        device_metrics = []
        # fenced per-step timing only while a trace is active — the default
        # path must not block per step or the dispatch pipeline stalls
        profiling = bool(self.profile_dir) and epoch == self.start_epoch
        step_no = 0
        for batch in prefetch_to_device(
            self.train_loader, sharding=self.batch_sharding
        ):
            bs = int(np.shape(batch["answer"])[0])

            def dispatch(batch=batch, step_no=step_no):
                images = batch["image"]
                if images.dtype == jnp.uint8:  # device-side augmentation
                    images = self._augment(
                        images,
                        jax.random.fold_in(
                            self._aug_rng, epoch * 1_000_000 + step_no
                        ),
                    )
                with step_annotation("train", step_no):
                    self.state, m = self.train_step(
                        self.state,
                        images,
                        batch["token_ids"],
                        batch["attention_mask"],
                        batch["answer"],
                        self.rng,
                    )
                return m

            if profiling:
                # the timed region covers augmentation + dispatch + the
                # fence, so host dispatch cost is visible in the profile
                with self.step_timer.step(items=bs) as s:
                    s.result = m = dispatch()
            else:
                m = dispatch()
            device_metrics.append(m)
            # bound the dispatch pipeline: without a periodic sync the host
            # dispatches the WHOLE epoch asynchronously (the loop never
            # fetches), queueing hundreds of MB of batch transfers in
            # flight — on the tunneled TPU backend that reliably wedges the
            # stream past ~50 in-flight steps. Fetch the HOST VALUE of the
            # loss from `depth` steps ago: a true device round-trip (on
            # this backend block_until_ready returns without fencing), so
            # at most `depth` steps (~depth×12.5 MB of batches) are ever in
            # flight while the device still overlaps `depth` steps deep.
            depth = 4
            if len(device_metrics) >= depth:
                float(device_metrics[-depth]["loss"])
            n += bs
            step_no += 1
        # single host sync at epoch end
        for m in device_metrics:
            loss_sum += float(m["loss"])
            c1 += int(m["correct1"])
            c5 += int(m["correct5"])
        steps = max(len(device_metrics), 1)
        return {
            "train_loss": loss_sum / steps,
            "train_top1": c1 / max(n, 1),
            "train_top5": c5 / max(n, 1),
        }

    def validate(self) -> Dict[str, float]:
        # scalar sums reduced on device per batch (multi-host safe), with
        # lag-1 pipelining: the next batch dispatches before the previous
        # batch's scalars are fetched, hiding the device→host round-trip
        loss_sum, c1, c5, n = 0.0, 0.0, 0.0, 0.0
        use_types = bool(self.val_type_vocab)
        t_correct = t_total = 0.0
        pending = None

        def consume(out):
            nonlocal loss_sum, c1, c5, n, t_correct, t_total
            loss_sum += float(out["loss_sum"])
            c1 += float(out["correct1"])
            c5 += float(out["correct5"])
            n += float(out["n"])
            if "type_correct" in out:
                t_correct = t_correct + np.asarray(out["type_correct"])
                t_total = t_total + np.asarray(out["type_total"])

        for batch in prefetch_to_device(
            self.val_loader, sharding=self.batch_sharding
        ):
            args = [
                self.state.params,
                self.state.batch_stats,
                batch["image"],
                batch["token_ids"],
                batch["attention_mask"],
                batch["answer"],
                batch["valid_mask"],
            ]
            if use_types and "type_ids" in batch:
                args.append(batch["type_ids"])
            out = self.val_step(*args)
            if pending is not None:
                consume(pending)
            pending = out
        if pending is not None:
            consume(pending)
        n = max(n, 1)
        metrics = {
            "val_loss": loss_sum / n,
            "val_top1": c1 / n,
            "val_top5": c5 / n,
        }
        if use_types and np.ndim(t_total):
            metrics["val_per_type"] = {
                qt: float(c) / float(t)
                for qt, c, t in zip(self.val_type_vocab, t_correct, t_total)
                if t > 0
            }
        return metrics

    # ------------------------------------------------------------------
    def _state_tree(self) -> Dict[str, Any]:
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }

    def save(self, name: str, epoch: int) -> None:
        if not self.save_checkpoints:
            return
        ckpt_lib.save_checkpoint(
            self.checkpoint_dir,
            name,
            self._state_tree(),
            self.model.config,
            {
                "epoch": epoch,
                "best_val_accuracy": self.best_val_accuracy,
                "metrics_history": self.logger.to_dict(),
                **self.run_meta,
            },
        )

    def resume(self, name: str = "latest") -> None:
        """Restore params/opt_state/step/epoch/history
        (reference: training/train.py:302-320).

        Checkpoints converted from a reference ``.pth``
        (``python -m vqa_tpu.compat.torch_import``) carry no optimizer
        state — their sidecar is flagged ``model_only``; restore weights and
        BN stats, keep the freshly initialized optimizer."""
        model_only = bool(
            ckpt_lib.load_checkpoint_meta(self.checkpoint_dir, name).get(
                "model_only", False
            )
        )
        if model_only:
            target = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
            tree, _, meta = ckpt_lib.load_checkpoint(
                self.checkpoint_dir, name, target
            )
            self.state = self.state.replace(
                params=tree["params"], batch_stats=tree["batch_stats"]
            )
            print("[Trainer] model-only checkpoint (imported .pth): "
                  "optimizer starts fresh")
        else:
            tree, _, meta = ckpt_lib.load_checkpoint(
                self.checkpoint_dir, name, self._state_tree()
            )
            self.state = self.state.replace(
                params=tree["params"],
                batch_stats=tree["batch_stats"],
                opt_state=tree["opt_state"],
                step=tree["step"],
            )
        self.start_epoch = int(meta["epoch"]) + 1
        self.best_val_accuracy = float(meta["best_val_accuracy"])
        self.logger = MetricsLogger.from_dict(meta["metrics_history"])
        print(f"[Trainer] Resumed from epoch {meta['epoch']}")

    # ------------------------------------------------------------------
    def train(self, patience: Optional[int] = None) -> MetricsLogger:
        patience = patience if patience is not None else self.cfg.early_stop_patience
        epochs_no_improve = 0
        # checkpoint-on-signal (SURVEY.md §5): the reference only catches
        # Ctrl-C (KeyboardInterrupt, training/train.py:564-567); production
        # schedulers send SIGTERM — route it through the same save path.
        # Only the main thread may set signal handlers; tests drive train()
        # from worker threads, so skip silently there.
        import signal
        import threading as _threading

        prev_handler = None
        if _threading.current_thread() is _threading.main_thread():
            def _on_sigterm(signum, frame):
                raise KeyboardInterrupt("SIGTERM")

            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        try:
            for epoch in range(self.start_epoch, self.cfg.num_epochs):
                t0 = time.time()
                # (seed, epoch)-pinned shuffle: epoch N's data order is the
                # same whether the run got here uninterrupted or resumed
                if hasattr(self.train_loader, "set_epoch"):
                    self.train_loader.set_epoch(epoch)
                trace_dir = (
                    self.profile_dir if epoch == self.start_epoch else None
                )
                with maybe_trace(trace_dir):
                    train_metrics = self.train_epoch(epoch)
                if trace_dir:
                    print(
                        f"[Trainer] trace → {trace_dir}; "
                        f"step time {self.step_timer.summary()}"
                    )
                val_metrics = self.validate()
                lr = float(self.schedule(int(self.state.step)))
                metrics = {**train_metrics, **val_metrics, "lr": lr}
                # per-type accuracy is a nested dict: history/TB get it as
                # namespaced scalars ("val_per_type/<type>"), the epoch
                # line stays scalars-only (history JSON remains the
                # reference's flat float-list format)
                scalars = {
                    k: v for k, v in metrics.items()
                    if isinstance(v, (int, float))
                }
                flat = dict(scalars)
                for k, v in metrics.items():
                    if isinstance(v, dict):
                        flat.update(
                            {f"{k}/{qt}": acc for qt, acc in v.items()}
                        )
                self.logger.log(epoch, flat)
                if self.scalar_writer is not None:
                    self.scalar_writer.log_scalars(epoch, flat)
                dt = time.time() - t0
                print(
                    f"[Trainer] epoch {epoch}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in scalars.items())
                    + f" ({dt:.1f}s)"
                )

                improved = val_metrics["val_top1"] > self.best_val_accuracy
                if improved:
                    self.best_val_accuracy = val_metrics["val_top1"]
                    epochs_no_improve = 0
                    self.save("latest", epoch)
                    if self.save_checkpoints:
                        ckpt_lib.save_best_copy(self.checkpoint_dir)
                else:
                    epochs_no_improve += 1

                if (epoch + 1) % self.cfg.checkpoint_every == 0 and not improved:
                    self.save("latest", epoch)

                if epochs_no_improve >= patience:
                    print(f"[Trainer] early stop after {patience} stale epochs")
                    break
            # always leave a resumable checkpoint on completion — a short
            # run whose validation accuracy never improves would otherwise
            # write nothing (improvement-only + every-5-epochs saves)
            if self.cfg.num_epochs > self.start_epoch:
                self.save("latest", epoch)
        except KeyboardInterrupt:
            print("[Trainer] interrupted — saving checkpoint")
            self.save("interrupted", epoch)
            raise
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            if self.scalar_writer is not None:
                self.scalar_writer.close()
        return self.logger


# ---------------------------------------------------------------------------
# CLI (reference: training/train.py:401-571)
# ---------------------------------------------------------------------------

def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the TPU-native VQA model")
    p.add_argument("--questions", default=None)
    p.add_argument("--annotations", default=None)
    p.add_argument("--images-dir", default=None)
    p.add_argument("--subset-size", type=int, default=25000)
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--num-answers", type=int, default=1000)
    p.add_argument("--no-spatial", action="store_true",
                   help="ablation: disable spatial attention only (the "
                        "reference README's middle ablation row, "
                        "reference: README.md:349-353)")
    p.add_argument("--no-attention", action="store_true",
                   help="ablation: disable SE+spatial attention")
    p.add_argument("--stem-s2d", action="store_true",
                   help="space-to-depth stem execution plan (same "
                        "parameters, same math — see models.StemConv). "
                        "Batch-dependent on v5e: +2.3%% train step at "
                        "per-chip b=256 (the C_in=3 stem wgrad underfills "
                        "the MXU; docs/PERF.md backward localization), "
                        "-1.4%% at b=1024, ~4%% slower inference — opt in "
                        "only at moderate per-chip batch")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--warmup-epochs", type=int, default=None,
                   help="linear-warmup epochs before the cosine decay "
                        "(default: TrainingConfig.warmup_epochs=2). The "
                        "reference DECLARES warmup_epochs=2 but never "
                        "implements warmup (reference: utils/config.py:190 "
                        "vs training/train.py:139-143) — pass 0 to "
                        "reproduce the reference's actual cosine-only "
                        "schedule exactly")
    p.add_argument("--lr-schedule", choices=("step", "epoch"), default=None,
                   help="cosine granularity: 'step' decays every optimizer "
                        "step (default); 'epoch' reproduces the reference's "
                        "per-epoch CosineAnnealingLR stepping exactly "
                        "(reference: training/train.py:139-143,352)")
    p.add_argument("--min-lr", type=float, default=None,
                   help="cosine floor eta_min (default: "
                        "TrainingConfig.min_lr=1e-6; reference: "
                        "training/train.py:139-143)")
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--num-workers", type=int, default=0,
                   help="threads decoding/augmenting samples per batch "
                        "(JPEG decode + the native resampler release the "
                        "GIL; the reference's DataLoader num_workers "
                        "analog, reference: utils/config.py:163). 0 = "
                        "inline (right for this 1-core host)")
    p.add_argument("--label-smoothing", type=float, default=0.0,
                   help="uniform label smoothing on the CE loss "
                        "(0 = the reference's plain CE)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="microbatches per optimizer step (lax.scan inside "
                        "one XLA program): ~N× lower activation memory for "
                        "large-batch runs; gradients averaged across "
                        "microbatches")
    p.add_argument("--remat", choices=("none", "full", "stages"),
                   default="none",
                   help="activation rematerialization in the backward "
                        "(jax.checkpoint): 'stages' keeps only CNN "
                        "stage-boundary activations, 'full' recomputes the "
                        "whole forward — memory levers for activation-bound "
                        "configs (speed on-chip: docs/PERF.md)")
    p.add_argument("--resume", default=None)
    p.add_argument("--demo", action="store_true", help="random demo data")
    p.add_argument("--synthetic", action="store_true",
                   help="learnable colored-shapes data (data/synthetic.py) "
                        "— real convergence without downloading VQA-v2")
    p.add_argument("--spatial", action="store_true",
                   help="with --synthetic: mix in grid-localized questions "
                        "('what color is the shape in the top left') — the "
                        "variant where spatial attention matters (recorded "
                        "in the checkpoint sidecar so evaluate --synthetic "
                        "rebuilds the same split)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + data for smoke runs")
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--profile-dir", default=None,
                   help="dump a TensorBoard device trace of the first "
                        "trained epoch to this directory")
    p.add_argument("--log-dir", default=None,
                   help="write per-epoch TensorBoard scalars (train/val "
                        "loss, top-1/top-5, lr) to this directory "
                        "(tensorboardX / torch.utils.tensorboard, JSONL "
                        "fallback — utils/tb.py)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans — the numeric sanitizer for "
                        "debug runs (SURVEY §5; fails fast at the op that "
                        "produced the first NaN)")
    p.add_argument("--device-aug", action="store_true",
                   help="run train-time augmentation on-device (uint8 "
                        "batches from the loader, crop/flip/jitter in XLA)")
    # parallelism (MeshConfig; SURVEY.md §2.6 — the reference has none)
    p.add_argument("--data-parallel", type=int, default=None,
                   help="devices on the data mesh axis (-1 = all remaining; "
                        "default: MeshConfig)")
    p.add_argument("--model-parallel", type=int, default=None,
                   help="devices on the model (tensor-parallel) mesh axis")
    # multi-host: one process per pod host (jax.distributed.initialize)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for multi-host runs "
                        "(TPU pods auto-detect; also honors "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    from vqa_tpu.utils.platform import add_platform_args

    add_platform_args(p)
    return p.parse_args(argv)


def main(argv=None):
    from vqa_tpu.parallel import distributed
    from vqa_tpu.utils.cache import enable_compilation_cache
    from vqa_tpu.utils.config import MeshConfig, PATHS

    from vqa_tpu.utils.platform import apply_platform_args

    args = parse_args(argv)
    # platform forcing MUST precede the first backend touch
    apply_platform_args(args)
    # multi-host init MUST precede the first backend touch
    distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    enable_compilation_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # a per-run MeshConfig (NOT a mutation of the global MESH singleton —
    # that would leak parallelism settings into later in-process runs)
    mesh_config = None
    if args.data_parallel is not None or args.model_parallel is not None:
        mesh_config = MeshConfig(
            data_parallel=args.data_parallel
            if args.data_parallel is not None
            else -1,
            model_parallel=args.model_parallel
            if args.model_parallel is not None
            else 1,
        )
    # each host's loader yields its per-process slice of the global batch
    # (data.pipeline assembles the global array from the local shards)
    per_process_bs = distributed.local_batch_size(args.batch_size)

    sched_overrides = {}
    if args.warmup_epochs is not None:
        sched_overrides["warmup_epochs"] = args.warmup_epochs
    if args.min_lr is not None:
        sched_overrides["min_lr"] = args.min_lr
    if args.lr_schedule is not None:
        sched_overrides["lr_schedule_granularity"] = args.lr_schedule
    tcfg = TrainingConfig(
        num_samples=args.subset_size,
        batch_size=per_process_bs,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        num_epochs=args.epochs,
        early_stop_patience=args.patience,
        grad_accum=args.grad_accum,
        remat=args.remat,
        label_smoothing=args.label_smoothing,
        use_bf16=not args.no_bf16,
        seed=args.seed,
        **sched_overrides,
    )
    if per_process_bs % tcfg.grad_accum:
        raise SystemExit(
            f"--batch-size per process ({per_process_bs}) must be divisible "
            f"by --grad-accum ({tcfg.grad_accum})"
        )

    if args.tiny:
        from vqa_tpu.utils.config import tiny_model_config

        mcfg = tiny_model_config()
    else:
        mcfg = ModelConfig(
            embed_dim=args.embed_dim, num_answers=args.num_answers
        )

    tokenizer = answer_vocab = None
    run_meta: Dict[str, Any] = {}
    if args.synthetic:
        import dataclasses

        from vqa_tpu.data.synthetic import create_synthetic_loaders

        syn_samples = min(tcfg.num_samples, 20000)
        # persisted so `evaluate --synthetic` reconstructs the EXACT val
        # split — scenes are deterministic per (seed, index), and a split
        # rebuilt with different num_samples would overlap the train range
        run_meta["synthetic"] = {
            "num_samples": syn_samples,
            "seed": tcfg.seed,
            "spatial": bool(args.spatial),
        }
        train_loader, val_loader, tokenizer, answer_vocab = (
            create_synthetic_loaders(
                num_samples=syn_samples,
                batch_size=tcfg.batch_size,
                eval_batch_size=tcfg.eval_batch_size,
                image_size=mcfg.image_size,
                max_question_length=mcfg.max_question_length,
                device_augment=args.device_aug,
                seed=tcfg.seed,
                num_workers=args.num_workers,
                spatial=args.spatial,
            )
        )
        mcfg = dataclasses.replace(
            mcfg,
            vocab_size=tokenizer.vocab_size,
            num_answers=answer_vocab.num_answers,
        )
    use_demo = args.demo and not args.synthetic
    if not use_demo and not args.synthetic:
        try:
            questions = args.questions or PATHS.questions_path
            annotations = args.annotations or PATHS.annotations_path
            images_dir = args.images_dir or PATHS.images_path
            train_loader, val_loader, tokenizer, answer_vocab = (
                create_train_val_loaders(
                    questions, annotations, images_dir,
                    batch_size=tcfg.batch_size,
                    eval_batch_size=tcfg.eval_batch_size,
                    max_samples=tcfg.num_samples,
                    max_question_length=mcfg.max_question_length,
                    vocab_size=mcfg.vocab_size,
                    num_answers=mcfg.num_answers,
                    image_size=mcfg.image_size,
                    seed=tcfg.seed,
                    device_augment=args.device_aug,
                    num_workers=args.num_workers,
                )
            )
            import dataclasses

            mcfg = dataclasses.replace(mcfg, vocab_size=tokenizer.vocab_size)
        except FileNotFoundError as e:
            # automatic demo fallback (reference: training/train.py:495-504)
            print(f"[Trainer] data not found ({e}); falling back to demo data")
            use_demo = True
    if use_demo:
        train_loader, val_loader = create_demo_loaders(
            batch_size=tcfg.batch_size,
            eval_batch_size=tcfg.eval_batch_size,
            num_samples=min(tcfg.num_samples, 256),
            image_size=mcfg.image_size,
            max_question_length=mcfg.max_question_length,
            vocab_size=mcfg.vocab_size,
            num_answers=mcfg.num_answers,
            seed=tcfg.seed,
            num_workers=args.num_workers,
        )

    if distributed.process_count() > 1:
        # disjoint per-host sample shards (equal length for lockstep steps)
        from vqa_tpu.data.dataset import shard_for_process

        train_loader = shard_for_process(train_loader)
        val_loader = shard_for_process(val_loader)

    dtype = jnp.bfloat16 if (tcfg.use_bf16 and jax.default_backend() == "tpu") else jnp.float32
    ablation = {}
    if args.no_spatial:
        ablation["use_spatial_attention"] = False
    model = create_vqa_model(
        config=mcfg,
        use_attention=False if args.no_attention else None,
        dtype=dtype,
        stem_s2d=args.stem_s2d,
        **ablation,
    )
    variables = init_vqa_model(model, jax.random.PRNGKey(tcfg.seed))

    ckpt_dir = args.checkpoint_dir or PATHS.checkpoint_dir
    # JSON artifacts are primary-host-only (every pod host runs this script;
    # Orbax checkpoint saves stay all-process — they coordinate internally)
    if not args.no_save and distributed.is_primary():
        if tokenizer is not None:
            tokenizer.save(os.path.join(ckpt_dir, "tokenizer.json"))
        if answer_vocab is not None:
            answer_vocab.save(os.path.join(ckpt_dir, "answer_vocab.json"))

    trainer = Trainer(
        model, variables, train_loader, val_loader,
        config=tcfg,
        mesh_config=mesh_config,
        checkpoint_dir=ckpt_dir,
        save_checkpoints=not args.no_save,
        seed=tcfg.seed,
        profile_dir=args.profile_dir,
        run_meta=run_meta,
        log_dir=args.log_dir,
    )
    if args.resume:
        trainer.resume(args.resume)

    logger = trainer.train(patience=args.patience)

    # history honors --no-save like the reference (training/train.py:558-559)
    if distributed.is_primary() and not args.no_save:
        hist_path = os.path.join(ckpt_dir, "training_history.json")
        logger.save(hist_path)
        print(f"[Trainer] history → {hist_path}")
    return logger


if __name__ == "__main__":
    main()
