"""Functional TPU trainer with a host-side hook bus.

Contract parity with the reference runtime (cpu/trainer.py): epoch- or
iter-based single-optimizer loop, subclass extension point for the loss,
default hooks [LRUpdate, Checkpoint (proc 0), Logger (proc 0)], metric
storage with window smoothing, NaN/Inf loss -> FloatingPointError,
``epoch_{e}.ckpt`` + ``latest.ckpt`` checkpoints with strict=False partial
model load and world-size assert on resume.

TPU-native redesign:
- the train step is ONE jitted function: on-device gather of the batch rows
  by index (datasets live in HBM, replicated), forward+backward, optimizer
  update, BN stat update.  Params/opt state are donated -- zero realloc.
- nothing syncs per iteration: losses come back as device scalars and are
  fetched in bulk every ``log_period`` (or at epoch end) by
  ``flush_metrics``; NaN checks happen at flush, matching the reference's
  FloatingPointError contract (cpu/trainer.py:281-284) with deferred timing.
- the learning rate is a host scalar produced by the warmup schedule state
  machine and fed to the step as an argument (never triggers a retrace).
- under a multi-device mesh, batch indices are sharded over the 'data' axis
  (=> batch sharded, grads all-reduced by XLA over ICI); single device works
  identically with mesh=None.

Subclasses implement ``train_cal_loss(params, batch_stats, batch) ->
(loss, loss_dict, new_batch_stats)`` as a pure function of its inputs; the
batch dict contains the gathered dataset rows plus a ``mask`` for the padded
final batch of an epoch.
"""

from __future__ import annotations

import logging
import math
import os
import os.path as osp
import time
import weakref
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from ..parallel.dist import get_world_size, is_main_process
from ..parallel.mesh import (
    batch_sharding,
    put_global,
    replicated_sharding,
    shard_batch_size,
)
from .checkpoint import (
    CheckpointManager,
    load_checkpoint_file,
    merge_pytree_strict_false,
)
from .history import MetricStorage
from .hooks import CheckpointHook, HookBase, LoggerHook, LRUpdateHook
from .logger import setup_logger
from .misc import collect_env
from .optim import scale_updates_by_lr

__all__ = ["Trainer", "TrainState", "masked_mse"]

logger = logging.getLogger("tactilesr_tpu")


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def masked_mse(pred, target, mask):
    """MSE over valid rows only (padded final-batch rows carry mask 0).
    Equals torch nn.MSELoss() on the unpadded batch.  An all-padded batch
    (possible for a grad_accum micro-batch inside the final epoch step)
    yields loss 0 with zero gradients instead of 0/0."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    m = mask.reshape((-1,) + (1,) * (pred.ndim - 1))
    per_elem = math.prod(pred.shape[1:])
    se = jnp.sum(jnp.square(pred - target) * m)
    return se / jnp.maximum(jnp.sum(mask) * per_elem, 1.0)


class Trainer:
    """Epoch/iteration-based trainer over HBM-resident datasets."""

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        tx: optax.GradientTransformation,
        lr_schedule,
        train_arrays: Dict[str, np.ndarray],
        batch_size: int,
        max_epochs: int = 0,
        max_iters: int = 0,
        work_dir: str = "work_dir",
        max_num_checkpoints: Optional[int] = None,
        checkpoint_period: int = 1,
        log_period: int = 50,
        mesh=None,
        seed: int = 42,
        scan_epochs: bool = False,
        remat: bool = False,
        grad_accum: int = 1,
    ):
        assert (max_epochs > 0) ^ (max_iters > 0), (
            "specify either max_epochs or max_iters"
        )
        assert not (scan_epochs and max_iters > 0), (
            "scan_epochs requires epoch-based training"
        )
        assert grad_accum >= 1, "grad_accum must be >= 1"
        assert batch_size % grad_accum == 0, (
            f"batch_size ({batch_size}) must divide into grad_accum "
            f"({grad_accum}) micro-batches"
        )
        self.model = model
        self.tx = tx
        self.lr_schedule = lr_schedule
        self.work_dir = work_dir
        self.mesh = mesh
        self.batch_size = batch_size
        self.metric_storage = MetricStorage()
        self._rng = np.random.default_rng(seed)

        self.train_by_epoch = max_epochs > 0
        self.n_train = next(iter(train_arrays.values())).shape[0]
        self.epoch_len = math.ceil(self.n_train / batch_size)
        if self.train_by_epoch:
            self.max_epochs = max_epochs
            self.max_iters = max_epochs * self.epoch_len
        else:
            self.max_epochs = 0
            self.max_iters = max_iters

        self.cur_iter = 0
        self.start_iter = 0

        # --- device placement: data replicated, state replicated
        # (put_global builds proper global arrays when the mesh spans
        # processes; plain device_put otherwise)
        if mesh is not None:
            # fail here with a clear message instead of inside XLA's
            # sharding propagation (every epoch batch is padded to the full
            # batch_size, so this is the only divisibility that matters);
            # under accumulation, the micro-batch is what lands on devices
            shard_batch_size(batch_size // grad_accum, mesh)
            self._repl = replicated_sharding(mesh)
            self._bshard = batch_sharding(mesh)
        else:
            self._repl = None
            self._bshard = None
        put = lambda x: put_global(x, self._repl)
        self.device_arrays = {k: put(np.asarray(v)) for k, v in train_arrays.items()}
        self.state = TrainState(
            params=put(variables["params"]),
            batch_stats=put(variables.get("batch_stats", {})),
            opt_state=put(tx.init(variables["params"])),
            step=put(jnp.zeros((), jnp.int32)),
        )

        self._hooks: List[HookBase] = []
        self._pending: List[Tuple[int, Dict[str, Any], float, float, float]] = []
        self._train_step = None
        self._epoch_scan = None
        self.scan_epochs = scan_epochs
        self.remat = remat
        self.grad_accum = int(grad_accum)
        self._max_num_checkpoints = max_num_checkpoints
        self._checkpoint_period = checkpoint_period
        self._log_period = log_period
        self.ckpt_manager = CheckpointManager(self.ckpt_dir, max_num_checkpoints)
        self._default_setup()

    # ------------------------------------------------------------------ api
    @property
    def lr(self) -> float:
        return self.lr_schedule.get_lr()

    @property
    def inner_iter(self) -> int:
        assert self.train_by_epoch
        return self.cur_iter % self.epoch_len

    @property
    def cur_epoch(self) -> int:
        assert self.train_by_epoch
        return self.cur_iter // self.epoch_len

    @property
    def ckpt_dir(self) -> str:
        return osp.join(self.work_dir, "checkpoints")

    @property
    def tb_log_dir(self) -> str:
        return osp.join(self.work_dir, "tb_logs")

    @property
    def hook_info(self) -> List[str]:
        return [f"{h.class_name} (priority {h.priority})" for h in self._hooks]

    def log(self, *args, **kwargs) -> None:
        self.metric_storage.update(*args, **kwargs)

    # ------------------------------------------------------------ internals
    def _default_setup(self) -> None:
        setup_logger(
            "tactilesr_tpu", output_dir=self.work_dir, process_index=jax.process_index()
        )
        logger.info("Environment info:\n%s", collect_env())
        default_hooks: List[HookBase] = [LRUpdateHook()]
        if is_main_process():
            default_hooks += [
                CheckpointHook(self._checkpoint_period, self._max_num_checkpoints),
                LoggerHook(self._log_period, tb_log_dir=self.tb_log_dir),
            ]
        self.register_hooks(default_hooks)
        logger.info("Registered default hooks: %s", self.hook_info)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        logger.info(
            "Work dir: %s | ckpt dir: %s | tb dir: %s",
            self.work_dir,
            self.ckpt_dir,
            self.tb_log_dir,
        )

    def register_hooks(self, hooks: List[HookBase]) -> None:
        for h in hooks:
            self.register_hook(h)

    def register_hook(self, hook: HookBase) -> None:
        assert isinstance(hook, HookBase)
        assert 1 <= hook.priority <= 10
        hook.trainer = weakref.proxy(self)
        inserted = False
        for i in range(len(self._hooks) - 1, -1, -1):
            if hook.priority >= self._hooks[i].priority:
                self._hooks.insert(i + 1, hook)
                inserted = True
                break
        if not inserted:
            self._hooks.insert(0, hook)

    def _call_hooks(self, stage: str) -> None:
        for h in self._hooks:
            getattr(h, stage)()

    # ------------------------------------------------------- the train step
    def train_cal_loss(self, params, batch_stats, batch):
        """Subclass extension point (pure).  Returns
        (loss, loss_dict, new_batch_stats)."""
        raise NotImplementedError(
            "subclass the Trainer and implement train_cal_loss"
        )

    def _step_core(self, state: TrainState, data, lr, idx, mask):
        """One optimizer step (traced).  ``idx``/``mask`` are (B,) when
        ``grad_accum == 1``, else (K, B/K): K micro-batches consumed by an
        inner ``lax.scan`` that accumulates gradients and steps ONCE.

        Accumulation semantics: micro-gradients are weighted by their
        valid-row count, so for any mean-over-valid-rows loss (both recipe
        losses are MSE) the accumulated gradient EQUALS the full-batch
        gradient -- padded final batches included.  BatchNorm is the one
        deliberate difference: train-mode BN normalizes each micro-batch by
        its own statistics (exactly like torch grad accumulation), and
        running stats see K momentum updates per step; docs/PERF.md
        "Gradient accumulation" quantifies the effect."""
        tx = self.tx

        def loss_and_grads(batch_stats, idx_m, mask_m):
            batch = {k: jnp.take(v, idx_m, axis=0) for k, v in data.items()}
            batch["mask"] = mask_m

            def loss_wrap(params, bs):
                loss, loss_dict, new_bs = self.train_cal_loss(params, bs, batch)
                return loss, (loss_dict, new_bs)

            if self.remat:
                # rematerialize the forward in the backward pass: activations
                # are not stored across fwd->bwd, trading ~1/3 more forward
                # FLOPs for peak-HBM headroom (enables batches whose f32 BN
                # buffers otherwise OOM -- docs/PERF.md "Training step")
                loss_wrap = jax.checkpoint(loss_wrap)
            (loss, (loss_dict, new_bs)), grads = jax.value_and_grad(
                loss_wrap, has_aux=True
            )(state.params, batch_stats)
            return grads, loss_dict, new_bs

        if self.grad_accum == 1:
            grads, loss_dict, new_bs = loss_and_grads(
                state.batch_stats, idx, mask
            )
        else:
            def micro(carry, inp):
                gsum, bs = carry
                idx_m, mask_m = inp
                grads, loss_dict, new_bs = loss_and_grads(bs, idx_m, mask_m)
                w = jnp.sum(mask_m).astype(jnp.float32)
                # an all-padded micro-batch contributes nothing -- and a
                # subclass loss may be NaN there, so select, don't just
                # scale by w=0 (NaN*0 stays NaN)
                gsum = jax.tree_util.tree_map(
                    lambda a, g: a
                    + jnp.where(w > 0, w * g.astype(jnp.float32), 0.0),
                    gsum,
                    grads,
                )
                # ...and neither do its BN statistics: the padded rows are
                # B/K duplicates of row 0, and a momentum update from that
                # degenerate batch would perturb the running stats on the
                # final step of every non-divisible epoch
                bs_next = jax.tree_util.tree_map(
                    lambda old, new: jnp.where(w > 0, new, old), bs, new_bs
                )
                return (gsum, bs_next), (loss_dict, w)

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (gsum, new_bs), (loss_stack, ws) = jax.lax.scan(
                micro, (zeros, state.batch_stats), (idx, mask)
            )
            wtot = jnp.sum(ws)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / wtot).astype(p.dtype), gsum, state.params
            )
            loss_dict = jax.tree_util.tree_map(
                lambda v: jnp.sum(jnp.where(ws > 0, v * ws, 0.0)) / wtot,
                loss_stack,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = scale_updates_by_lr(updates, lr)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss_dict

    def _build_train_step(self):
        def step_fn(state: TrainState, data, lr, idx, mask):
            return self._step_core(state, data, lr, idx, mask)

        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_epoch_scan(self):
        """Whole-epoch training as ONE device dispatch: lax.scan over the
        epoch's (idx, mask, lr) triples.  Removes per-step dispatch latency
        entirely -- the TPU-native shape for models this small.  Per-iter
        hooks do not fire inside the scan (metrics for every step are still
        recorded); the recipes' hooks are all epoch-cadenced."""

        def epoch_fn(state, data, idxs, masks, lrs):
            return jax.lax.scan(
                lambda s, x: self._step_core(s, data, x[2], x[0], x[1]),
                state,
                (idxs, masks, lrs),
            )

        return jax.jit(epoch_fn, donate_argnums=(0,))

    def _micro_shape(self, idx: np.ndarray, mask: np.ndarray):
        """Host-side reshape (B,) -> (K, B/K) for accumulation.  Done here
        (not traced) so the device arrays arrive pre-shaped with the
        micro-batch axis minor and the sharding annotation on the rows."""
        K = self.grad_accum
        return (
            idx.reshape(idx.shape[:-1] + (K, -1)),
            mask.reshape(mask.shape[:-1] + (K, -1)),
        )

    def _epoch_lrs(self, steps: int) -> np.ndarray:
        """Per-step LRs for the upcoming epoch, advancing the real schedule
        exactly as per-iter training would (iter_update per step)."""
        lrs = np.empty(steps, np.float32)
        for k in range(steps):
            lrs[k] = self.lr_schedule.get_lr()
            self.lr_schedule.iter_update()
        return lrs

    def train_one_epoch_scan(self) -> None:
        from ..data.loader import epoch_batches

        epoch_start = time.perf_counter()
        pairs = list(
            epoch_batches(self.n_train, self.batch_size, shuffle=True, rng=self._rng)
        )
        idxs = np.stack([p[0] for p in pairs])
        masks = np.stack([p[1] for p in pairs])
        steps = idxs.shape[0]
        base_iter = self.cur_iter
        lrs = self._epoch_lrs(steps)
        if self.grad_accum > 1:
            idxs, masks = self._micro_shape(idxs, masks)

        if self._bshard is not None:
            # shard the per-step batch axis (the minor axis: rows of each
            # (micro-)batch) over the data axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(*([None] * (idxs.ndim - 1) + ["data"]))
            step_shard = NamedSharding(self.mesh, spec)
            idxs_j = put_global(idxs, step_shard)
            masks_j = put_global(masks, step_shard)
        else:
            idxs_j = jnp.asarray(idxs)
            masks_j = jnp.asarray(masks)

        self.state, loss_stack = self._epoch_scan(
            # lrs stays a host numpy array: jit replicates uncommitted inputs
            # over the (possibly multi-process) mesh itself
            self.state, self.device_arrays, idxs_j, masks_j, lrs
        )
        fetched = jax.device_get(loss_stack)  # blocks until the scan finishes
        per_step = (time.perf_counter() - epoch_start) / steps
        for k in range(steps):
            it = base_iter + k
            metrics = {name: float(vals[k]) for name, vals in fetched.items()}
            total = sum(metrics.values())
            if not np.isfinite(total):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={it}! "
                    f"loss_dict={metrics}."
                )
            if is_main_process():
                self.log(it, lr=float(lrs[k]), smooth=False)
                self.log(it, data_time=0.0)
                self.log(it, iter_time=per_step)
                self.log(it, total_loss=total)
                if len(metrics) > 1:
                    self.log(it, **metrics)

    def train_one_iter(self, idx: np.ndarray, mask: np.ndarray) -> None:
        iter_start = time.perf_counter()
        start = time.perf_counter()
        if self.grad_accum > 1:
            idx, mask = self._micro_shape(idx, mask)
        if self._bshard is not None:
            if self.grad_accum > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(self.mesh, P(None, "data"))
            else:
                shard = self._bshard
            idx = put_global(idx, shard)
            mask = put_global(mask, shard)
        else:
            idx = jnp.asarray(idx)
            mask = jnp.asarray(mask)
        data_time = time.perf_counter() - start

        lr = float(self.lr)
        self.state, loss_dict = self._train_step(
            self.state, self.device_arrays, np.float32(lr), idx, mask
        )
        iter_time = time.perf_counter() - iter_start
        self._pending.append((self.cur_iter, loss_dict, data_time, iter_time, lr))

    def flush_metrics(self) -> None:
        """Fetch all pending device metrics in one transfer; NaN-check."""
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        fetched = jax.device_get([p[1] for p in pending])
        for (it, _ld, data_time, iter_time, lr), loss_dict in zip(pending, fetched):
            metrics = {k: float(v) for k, v in loss_dict.items()}
            total = sum(metrics.values())
            if not np.isfinite(total):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={it}! "
                    f"loss_dict={metrics}."
                )
            if is_main_process():
                self.log(it, lr=lr, smooth=False)
                self.log(it, data_time=data_time)
                self.log(it, iter_time=iter_time)
                self.log(it, total_loss=total)
                if len(metrics) > 1:
                    self.log(it, **metrics)

    # --------------------------------------------------------------- loop
    def train(
        self,
        resume_from_checkpoint: Optional[str] = None,
        auto_resume: bool = True,
    ) -> None:
        if resume_from_checkpoint is not None:
            self.load_checkpoint(path=resume_from_checkpoint)
        else:
            self.load_checkpoint(auto_resume=auto_resume)

        if self.scan_epochs:
            if self._epoch_scan is None:
                self._epoch_scan = self._build_epoch_scan()
            logger.info(
                "Start training (epoch-scan mode) from iteration %d", self.start_iter
            )
            assert self.start_iter % self.epoch_len == 0, (
                "epoch-scan resume must land on an epoch boundary"
            )
            self._call_hooks("before_train")
            for epoch in range(self.start_iter // self.epoch_len, self.max_epochs):
                self.cur_iter = epoch * self.epoch_len
                self._call_hooks("before_epoch")
                self.train_one_epoch_scan()
                self.cur_iter = (epoch + 1) * self.epoch_len - 1
                self._call_hooks("after_epoch")
            self._call_hooks("after_train")
            return

        if self._train_step is None:
            self._train_step = self._build_train_step()

        logger.info("Start training from iteration %d", self.start_iter)
        self._call_hooks("before_train")

        epoch_iter = None
        for self.cur_iter in range(self.start_iter, self.max_iters):
            if self.train_by_epoch and self.cur_iter % self.epoch_len == 0:
                self._call_hooks("before_epoch")
                epoch_iter = self._epoch_batches()
            if epoch_iter is None:  # iter-based training
                epoch_iter = self._epoch_batches()
            self._call_hooks("before_iter")
            try:
                idx, mask = next(epoch_iter)
            except StopIteration:
                epoch_iter = self._epoch_batches()
                idx, mask = next(epoch_iter)
            self.train_one_iter(idx, mask)
            self._call_hooks("after_iter")
            if self.train_by_epoch and (self.cur_iter + 1) % self.epoch_len == 0:
                self.flush_metrics()
                self._call_hooks("after_epoch")
        self.flush_metrics()
        self._call_hooks("after_train")

    def _epoch_batches(self):
        from ..data.loader import epoch_batches

        return epoch_batches(
            self.n_train, self.batch_size, shuffle=True, rng=self._rng
        )

    # --------------------------------------------------------- checkpoints
    def _model_state_dict(self) -> dict:
        return {
            "params": serialization.to_state_dict(self.state.params),
            "batch_stats": serialization.to_state_dict(self.state.batch_stats),
        }

    def save_checkpoint(self, file_name: str) -> None:
        self.flush_metrics()
        bundle = {
            "num_devices": jax.device_count(),
            "num_processes": get_world_size(),
            "model": self._model_state_dict(),
            "optimizer": serialization.to_state_dict(self.state.opt_state),
            "lr_scheduler": self.lr_schedule.state_dict(),
            "metric_storage": self.metric_storage.state_dict(),
            "step": int(jax.device_get(self.state.step)),
        }
        bundle.update(
            {"epoch": self.cur_epoch} if self.train_by_epoch else {"iter": self.cur_iter}
        )
        hook_states = {
            h.class_name: h.state_dict() for h in self._hooks if h.checkpointable
        }
        if hook_states:
            bundle["hooks"] = hook_states
        self.ckpt_manager.save(file_name, bundle)

    def load_checkpoint(
        self, path: Optional[str] = None, auto_resume: bool = False
    ) -> None:
        if path is None and auto_resume:
            latest = self.ckpt_manager.latest_path()
            if latest is None:
                logger.warning(
                    "auto_resume=True but no latest checkpoint found in %s",
                    self.ckpt_dir,
                )
            else:
                logger.info("Auto-resuming from %s", latest)
                path = latest
        if not path:
            logger.info("Skip loading checkpoint.")
            return
        logger.info("Loading checkpoint from %s ...", path)
        bundle = load_checkpoint_file(path)

        n_dev = jax.device_count()
        ckpt_dev = bundle["num_devices"]
        assert n_dev == ckpt_dev, (
            f"checkpoint was trained with {ckpt_dev} devices, "
            f"but {n_dev} are present"
        )

        if self.train_by_epoch:
            self.start_iter = (bundle["epoch"] + 1) * self.epoch_len
        else:
            self.start_iter = bundle["iter"] + 1

        # strict=False model load with missing/unexpected warnings
        merged, missing, unexpected = merge_pytree_strict_false(
            self._model_state_dict(), bundle["model"]
        )
        if missing:
            logger.warning("Missing keys when loading model weights:\n%s", missing)
        if unexpected:
            logger.warning("Unexpected keys when loading model weights:\n%s", unexpected)
        params = serialization.from_state_dict(self.state.params, merged["params"])
        batch_stats = serialization.from_state_dict(
            self.state.batch_stats, merged["batch_stats"]
        )
        opt_state = serialization.from_state_dict(
            self.state.opt_state, bundle["optimizer"]
        )
        put = lambda x: put_global(x, self._repl)
        self.state = TrainState(
            params=put(params),
            batch_stats=put(batch_stats),
            opt_state=put(opt_state),
            step=put(jnp.asarray(bundle.get("step", self.start_iter), jnp.int32)),
        )

        self.metric_storage.load_state_dict(bundle["metric_storage"])
        self.lr_schedule.load_state_dict(bundle["lr_scheduler"])

        hook_states = bundle.get("hooks", {})
        hook_names = [h.class_name for h in self._hooks if h.checkpointable]
        for name in hook_names:
            if name not in hook_states:
                logger.warning("Missing hook state: %s", name)
        for key, value in hook_states.items():
            if key not in hook_names:
                logger.warning("Unexpected hook state: %s", key)
                continue
            for h in self._hooks:
                if h.class_name == key and h.checkpointable:
                    h.load_state_dict(value)
                    break

    # ----------------------------------------------------------- inference
    def model_apply(self, batch_input, train: bool = False, **kwargs):
        """Eval-mode forward with the current variables (host convenience).

        Under a multi-process mesh the state lives on non-addressable
        devices, where eager (non-jit) ops are not allowed; the replicated
        state is fetched to host first (a local copy, no collective) and the
        forward runs on the process's default device."""
        from ..parallel.mesh import host_local_copy

        variables = {"params": self.state.params}
        bs = self.state.batch_stats
        if bs:
            variables["batch_stats"] = bs
        return self.model.apply(
            host_local_copy(variables), batch_input, train=train, **kwargs
        )
