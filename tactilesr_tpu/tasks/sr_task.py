"""TactileSR training recipe (STSR / MTSR).

Workload parity with the reference entry script (train/tactileSR_train.py):
labels are HR/HR_scale_num bilinearly resized 100->40 (:44-45), inputs are
the first seqsCnt*axisCnt channels (:46), loss is MSE (:49); eval computes
per-sample PSNR (maxValue=sensorMaxVaule_factor) and global-stat SSIM,
averaged per batch then over batches (:66-101); an inference hook renders an
LR/HR/SR PNG per epoch (:104-196); the seqs variant warm-starts its trunk
from the single-frame checkpoint (train/tactileSRSeqs_train.py:43-59).

TPU shape of the recipe: the dataset lives in HBM; the label resize is part
of the jitted step (two matmuls); evaluation is ONE jitted lax.map over the
padded (n_batches, batch) test set -- no host loop.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.default import tactileSR_config
from ..data.datasets import TactileSRDataset, TactileSRDatasetSeq
from ..metrics import psnr as psnr_fn
from ..metrics import ssim as ssim_fn
from ..models.tactile_sr import TactileSR
from ..runtime.checkpoint import load_checkpoint_file
from ..runtime.hooks import EvalHook, HookBase
from ..runtime.misc import set_random_seed
from ..runtime.optim import adam_l2
from ..runtime.schedule import LRWarmupSchedule, StepLR
from ..runtime.trainer import Trainer, masked_mse

__all__ = [
    "SRTrainer",
    "build_model",
    "build_eval_fn",
    "InferenceHookSR",
    "transfer_trunk_params",
    "main",
]

logger = logging.getLogger("tactilesr_tpu")


def _dtype_of(config) -> jnp.dtype:
    return jnp.dtype(config.get("compute_dtype", "float32"))


def build_model(config):
    """The SR network for a config; ``model_arch`` selects the ToH-2024
    TactileSR (default) or the IROS-2022 TactileSRCNN baseline."""
    arch = config.get("model_arch", "TactileSR")
    if arch == "TactileSRCNN":
        from ..models.tactile_sr import TactileSRCNN

        if config["seqsCnt"] != 1:  # ValueError (not assert): survives -O
            raise ValueError(
                f"TactileSRCNN is single-frame; got seqsCnt={config['seqsCnt']}"
            )
        return TactileSRCNN(
            scale_factor=config["scale_factor"],
            dtype=_dtype_of(config),
            head_init=config.get("head_init", "reference"),
        )
    return TactileSR(
        scale_factor=config["scale_factor"],
        seqs_cnt=config["seqsCnt"],
        axis_cnt=config["axisCnt"],
        pattern_feature_extra_layer_cnt=config["patternFeatureExtraLayerCnt"],
        force_feature_extra_layer_cnt=config["forceFeatureExtraLayerCnt"],
        dtype=_dtype_of(config),
        head_init=config.get("head_init", "reference"),
    )


def prepare_sr_labels(hr_raw: np.ndarray, config) -> np.ndarray:
    """HR labels exactly as the loss consumes them: HR/HR_scale_num,
    torch-bilinear resized to (4*scale)^2.  Precomputed ONCE at dataset
    build instead of per training iteration (identical math -- gather then
    resize == resize then gather -- and 6x less HBM read per step)."""
    from ..ops.resize import bilinear_resize_matrix

    hw = 4 * config["scale_factor"]
    hr = hr_raw.astype(np.float32) / config["HR_scale_num"]
    if hr.shape[-2:] == (hw, hw):
        return hr
    wh = bilinear_resize_matrix(hr.shape[-2], hw)
    ww = bilinear_resize_matrix(hr.shape[-1], hw)
    return np.einsum("oh,nchw,pw->ncop", wh, hr, ww).astype(np.float32)


class SRTrainer(Trainer):
    """Trainer with the tactileSR loss: MSE(model(LR), resize(HR/scale))."""

    def __init__(self, config, model, **kwargs):
        self.config = config
        self.seqs_cnt = config["seqsCnt"]
        self.axis_cnt = config["axisCnt"]
        self.hr_scale_num = config["HR_scale_num"]
        self.scale_factor = config["scale_factor"]
        arrays = dict(kwargs.pop("train_arrays"))
        arrays["HR"] = prepare_sr_labels(arrays["HR"], config)
        super().__init__(model=model, train_arrays=arrays, **kwargs)

    def train_cal_loss(self, params, batch_stats, batch):
        lr_in = batch["LR"][:, : self.seqs_cnt * self.axis_cnt]
        hr = batch["HR"]  # already scaled+resized by prepare_sr_labels
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            lr_in,
            train=True,
            mutable=["batch_stats"],
        )
        loss = masked_mse(out, hr, batch["mask"])
        return loss, {"total_loss": loss}, mutated["batch_stats"]


def build_eval_fn(trainer: SRTrainer, test_arrays: Dict[str, np.ndarray]):
    """One-jit whole-test-set evaluation reproducing the reference's
    batch-then-set averaging (per-sample PSNR/SSIM averaged within each test
    batch, batch means averaged over batches; MSE per batch over all rows)."""
    config = trainer.config
    model = trainer.model
    bs = config["test_batch_size"]
    seqs_axis = config["seqsCnt"] * config["axisCnt"]
    hr_scale = config["HR_scale_num"]
    max_value = float(config["sensorMaxVaule_factor"])

    lr_all = test_arrays["LR"]
    hr_all = prepare_sr_labels(test_arrays["HR"], config)
    n = lr_all.shape[0]
    nb = -(-n // bs)
    pad = nb * bs - n
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    lr_pad = np.concatenate([lr_all, np.zeros((pad,) + lr_all.shape[1:], lr_all.dtype)])
    hr_pad = np.concatenate([hr_all, np.zeros((pad,) + hr_all.shape[1:], hr_all.dtype)])
    lr_b = lr_pad.reshape(nb, bs, *lr_all.shape[1:])
    hr_b = hr_pad.reshape(nb, bs, *hr_all.shape[1:])
    mask_b = mask.reshape(nb, bs)
    mesh = trainer.mesh
    if mesh is not None:
        # shard each lax.map step's batch axis (axis 1) over the data axis so
        # evaluation uses the whole mesh, not one device (put_global handles
        # meshes spanning processes)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import put_global

        ndata = mesh.shape["data"]
        if bs % ndata == 0:
            eval_shard = NamedSharding(mesh, P(None, "data"))
            lr_b = put_global(lr_b, eval_shard)
            hr_b = put_global(hr_b, eval_shard)
            mask_b = put_global(mask_b, eval_shard)
        else:
            logger.warning(
                "test_batch_size %d not divisible by the %d-device data axis; "
                "evaluation runs unsharded (replicated over the mesh)",
                bs,
                ndata,
            )
            # replicate THROUGH put_global: plain jnp.asarray would build
            # process-local arrays that jit rejects next to the global
            # (possibly non-addressable) params under a multi-process mesh.
            # The full-mesh replica copies are deliberate even single-process
            # (the padded test set is a few MB; a single-device-committed
            # array next to mesh-placed params trips jit's device check)
            rep = NamedSharding(mesh, P())
            lr_b = put_global(lr_b, rep)
            hr_b = put_global(hr_b, rep)
            mask_b = put_global(mask_b, rep)
    else:
        # device-commit once; as plain numpy these would re-upload the whole
        # padded test set on every eval call (they are jit ARGUMENTS now)
        lr_b, hr_b, mask_b = map(jnp.asarray, (lr_b, hr_b, mask_b))

    # global (possibly multi-process) arrays must be jit ARGUMENTS, not
    # closure captures -- XLA cannot constant-fold non-addressable data
    @jax.jit
    def eval_all(params, batch_stats, lr_b, hr_b, mask_b):
        def per_batch(args):
            lrb, hr, mb = args
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                lrb[:, :seqs_axis],
                train=False,
            )
            mse_b = masked_mse(out, hr, mb)
            psnr_s = jax.vmap(lambda a, b: psnr_fn(a[0], b[0], max_value))(out, hr)
            ssim_s = jax.vmap(lambda a, b: ssim_fn(a[0], b[0]))(out, hr)
            # padded rows can produce inf/nan metrics (identical zero maps);
            # zero them out before the mask-weighted mean
            psnr_s = jnp.where(mb > 0, psnr_s, 0.0)
            ssim_s = jnp.where(mb > 0, ssim_s, 0.0)
            denom = jnp.sum(mb)
            return (
                mse_b,
                jnp.sum(psnr_s * mb) / denom,
                jnp.sum(ssim_s * mb) / denom,
            )

        mse, psnr_b, ssim_b = jax.lax.map(per_batch, (lr_b, hr_b, mask_b))
        return mse.mean(), psnr_b.mean(), ssim_b.mean()

    def eval_func() -> Dict[str, float]:
        mse, psnr_v, ssim_v = jax.device_get(
            eval_all(
                trainer.state.params, trainer.state.batch_stats, lr_b, hr_b, mask_b
            )
        )
        logger.info(
            "==> [test] loss: %.4f, SSIM: %.4f, PSNR: %.4f",
            float(mse),
            float(ssim_v),
            float(psnr_v),
        )
        return {
            "test_loss": float(mse),
            "test_SSIM": float(ssim_v),
            "test_PSNR": float(psnr_v),
        }

    return eval_func


class InferenceHookSR(HookBase):
    """Per-epoch PNG of (LR_z, HR surface, SR surface) for test sample 0,
    titled with its PSNR/SSIM -- the reference's visual-regression artifact."""

    priority = 5

    def __init__(self, test_arrays: Dict[str, np.ndarray], config):
        self._arrays = test_arrays
        self._config = config

    def after_epoch(self) -> None:
        t = self.trainer
        out_dir = os.path.join(t.work_dir, "inference_result")
        os.makedirs(out_dir, exist_ok=True)
        self.render(os.path.join(out_dir, f"epoch_{t.cur_epoch}.png"))

    def render(self, save_name: str) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = self.trainer
        cfg = self._config
        hw = 4 * cfg["scale_factor"]
        lr = jnp.asarray(self._arrays["LR"][:1, : cfg["seqsCnt"] * cfg["axisCnt"]])
        hr = jnp.asarray(prepare_sr_labels(self._arrays["HR"][:1], cfg))
        out = t.model_apply(lr, train=False)
        sr_img = np.asarray(out[0, 0])
        hr_img = np.asarray(hr[0, 0])
        lr_z = np.asarray(lr[0, 2])
        p = float(psnr_fn(out[0, 0], hr[0, 0], float(cfg["sensorMaxVaule_factor"])))
        s = float(ssim_fn(out[0, 0], hr[0, 0]))

        fig = plt.figure(tight_layout=True)
        ax1 = fig.add_subplot(131)
        ax2 = fig.add_subplot(132, projection="3d")
        ax3 = fig.add_subplot(133, projection="3d")
        grid = np.arange(hw)
        xg, yg = np.meshgrid(grid, grid)
        ax1.imshow(lr_z, vmin=0, vmax=8)
        ax2.plot_surface(xg, yg, hr_img, vmin=0, vmax=25, cmap="rainbow")
        ax3.plot_surface(xg, yg, sr_img, vmin=0, vmax=25, cmap="rainbow")
        for ax in (ax2, ax3):
            ax.set_zlim([0, 50])
            ax.view_init(elev=60, azim=-90)
        for ax in (ax1, ax2, ax3):
            ax.axis("off")
        ax1.set_title("LR_z")
        ax2.set_title("HR_img")
        ax3.set_title(f"SR_img {p:.2f}dB {s:.3f}")
        plt.savefig(save_name)
        plt.close(fig)


class DeadHeadHook(HookBase):
    """Runtime detector (and optional in-run cure) for the born-dead head.

    The pathology (reference's own init + no-warmup recipe,
    /root/reference/model/tactileSR_model.py:92-98 +
    tactileSRSeqs_train.py): a bad head draw leaves every output pixel in
    the dead half of the activation, the model emits a constant map
    forever, and training silently burns epochs with the loss pinned at
    mean(HR^2) and SSIM 0 (RESULTS.md "The head-init study" measured
    2x51 such epochs before diagnosis).  The signature is unambiguous:
    train loss within ``rel_tol`` of mean(HR^2) AND eval-mode output
    variance ~0 on a probe batch.

    ``action`` decides what happens after ``patience`` consecutive such
    epochs:

    - ``"warn"`` (default): ONE actionable WARNING naming the cure
      (``head_init: non_negative``, scale-compensated; +4-7 dB in the
      study).  Never aborts the run.
    - ``"reinit"``: cure it in place -- re-draw ONLY the final head
      kernel with the scale-compensated non-negative init (same param
      tree: the head is a bias-free conv, models/tactile_sr.py:116-124),
      zero that kernel's Adam moments, and keep training.  The epochs
      already spent on the trunk are preserved (its weights only moved by
      weight decay while the head was dead, so they are a valid warm
      start).  One reinit per run; if the signature ever returns, the
      hook falls back to the warning.  Under a multi-PROCESS mesh the
      hook also falls back to warn: it only runs on process 0, and a
      single-process in-place edit would desynchronize the replicated
      state (single-process multi-device meshes are fine -- the swapped
      tree is re-placed with the trainer's replicated sharding).

    ``probe_lr`` must already be sliced to the model's input channels
    (``seqsCnt * axisCnt``); the probe forward is additionally guarded so
    a probe failure can never kill the run it is meant to protect."""

    priority = 4

    _ACTIONS = ("warn", "reinit")

    def __init__(self, probe_lr: np.ndarray, patience: int = 3,
                 rel_tol: float = 0.05, n_probe: int = 8,
                 action: str = "warn", head_module: str = "output_conv1",
                 reinit_seed: int = 0):
        if action not in self._ACTIONS:
            raise ValueError(
                f"dead_head_action must be one of {self._ACTIONS}, got {action!r}"
            )
        self._probe = np.asarray(probe_lr[:n_probe], np.float32)
        self._patience = patience
        self._rel_tol = rel_tol
        self._action = action
        self._head = head_module
        self._reinit_seed = reinit_seed
        self._streak = 0
        self._warned = False
        self._reinited = False
        self._disabled = False

    def before_train(self) -> None:
        # the level the loss pins at: mean over the PREPARED labels the
        # loss actually sees (scaled + resized), fetched once
        hr = self.trainer.device_arrays["HR"]
        self._hr_power = float(jax.device_get(jnp.mean(jnp.square(hr))))
        self._hr_var = float(jax.device_get(jnp.var(hr)))

    def after_epoch(self) -> None:
        if self._warned or self._disabled:
            return
        t = self.trainer
        storage = t.metric_storage
        if "total_loss" not in storage:
            return
        loss = storage["total_loss"].avg
        pinned = (
            self._hr_power > 0
            and abs(loss - self._hr_power) / self._hr_power < self._rel_tol
        )
        if not pinned:
            self._streak = 0
            return
        try:
            out = np.asarray(t.model_apply(jnp.asarray(self._probe), train=False))
        except Exception:
            # a detector must never kill the run it protects (e.g. a probe
            # whose channels were not sliced to the model's input)
            self._disabled = True
            logger.warning(
                "DeadHeadHook probe forward failed; disabling the detector "
                "for this run", exc_info=True,
            )
            return
        flat = np.var(out) < 1e-4 * max(self._hr_var, 1e-12)
        self._streak = self._streak + 1 if flat else 0
        if self._streak < self._patience:
            return
        if self._action == "reinit" and not self._reinited and self._can_reinit():
            self._reinit_head(loss)
            self._streak = 0  # keep monitoring the revived head
            return
        self._warned = True
        logger.warning(
            "Dead head detected: for %d consecutive epochs the train "
            "loss has sat at mean(HR^2)=%.4g (loss=%.4g) with ~zero "
            "output variance (%.3g) on an eval probe -- the model is "
            "emitting a constant map and will not recover.  This is "
            "the known born-dead-head init failure (see RESULTS.md "
            "'The head-init study').  %s",
            self._patience, self._hr_power, loss, float(np.var(out)),
            "An in-run reinit was already applied and the head died "
            "again; restart with `head_init: non_negative`."
            if self._reinited
            else "Set `dead_head_action: reinit` to revive it in place, "
            "or restart with `head_init: non_negative` (config key; "
            "scale-compensated all-positive final kernel, +4-7 dB in "
            "the study), e.g. `--head_init non_negative`.",
        )

    def _can_reinit(self) -> bool:
        from ..parallel.dist import get_world_size

        if get_world_size() > 1:
            logger.warning(
                "DeadHeadHook: action=reinit is not supported under a "
                "multi-process mesh (the hook runs on process 0 only); "
                "falling back to the warning"
            )
            return False
        return True

    def _reinit_head(self, pinned_loss: float) -> None:
        """Swap the dead head kernel for a fresh scale-compensated
        non-negative draw and zero its optimizer moments, in place."""
        from ..models.layers import non_negative_kaiming_fan_out
        from ..parallel.mesh import put_global

        t = self.trainer
        head = self._head

        def path_keys(path):
            return [getattr(p, "key", getattr(p, "name", None)) for p in path]

        kernel_box = {}

        def swap(path, leaf):
            keys = path_keys(path)
            if head in keys and keys[-1] == "kernel":
                key = jax.random.fold_in(
                    jax.random.key(self._reinit_seed), t.cur_iter
                )
                fresh = non_negative_kaiming_fan_out(
                    key, np.shape(leaf), jnp.float32
                ).astype(leaf.dtype)
                kernel_box["shape"] = tuple(np.shape(leaf))
                return fresh
            return leaf

        new_params = jax.tree_util.tree_map_with_path(swap, t.state.params)
        if "shape" not in kernel_box:
            self._disabled = True
            logger.warning(
                "DeadHeadHook: no %r kernel found in the param tree; "
                "cannot reinit -- disabling the detector", head,
            )
            return

        def zero_moments(path, leaf):
            # Adam's mu/nu mirror the param tree, so the head's moment
            # leaves carry its module name in their path; count and any
            # other global leaves are left alone
            return jnp.zeros_like(leaf) if head in path_keys(path) else leaf

        new_opt = jax.tree_util.tree_map_with_path(
            zero_moments, t.state.opt_state
        )
        put = lambda x: put_global(x, getattr(t, "_repl", None))
        t.state = t.state.replace(params=put(new_params), opt_state=put(new_opt))
        self._reinited = True
        logger.warning(
            "Dead head detected at epoch %d (loss pinned at mean(HR^2)=%.4g "
            "for %d epochs, ~zero probe variance) -- dead_head_action="
            "reinit: re-drew the %r kernel %s with the scale-compensated "
            "non-negative init and zeroed its Adam moments; training "
            "continues on the surviving trunk (RESULTS.md 'in-run head "
            "revival').",
            t.cur_epoch, pinned_loss, self._patience, self._head,
            kernel_box["shape"],
        )

    def state_dict(self) -> dict:
        return {
            "streak": self._streak,
            "warned": self._warned,
            "reinited": self._reinited,
        }

    def load_state_dict(self, state: dict) -> None:
        self._streak = int(state.get("streak", 0))
        self._warned = bool(state.get("warned", False))
        self._reinited = bool(state.get("reinited", False))


def transfer_trunk_params(seqs_variables: dict, single_bundle: dict) -> dict:
    """Warm-start the MTSR trunk from an STSR checkpoint bundle: graft the
    ``patternFeatureExtra_layer_*`` and ``forceFeatureExtra_layer_*`` subtrees
    (params AND batch_stats) into the seqs model's variables."""
    src = single_bundle["model"]
    out = jax.tree_util.tree_map(lambda x: x, seqs_variables)  # shallow copy
    for coll in ("params", "batch_stats"):
        dst_coll = dict(out.get(coll, {}))
        src_coll = src.get(coll, {})
        n = 0
        for name, sub in src_coll.items():
            if name.startswith(("patternFeatureExtra_layer", "forceFeatureExtra_layer")):
                dst_coll[name] = jax.tree_util.tree_map(jnp.asarray, sub)
                n += 1
        out[coll] = dst_coll
        logger.info("Transferred %d trunk modules into '%s'", n, coll)
    return out


def main(
    config=None,
    seqs: bool = False,
    mesh=None,
    max_epochs: Optional[int] = None,
    auto_resume: bool = False,
):
    """Train tactileSR end to end from a config dict (STSR by default;
    ``seqs=True`` uses the SeqsDataset + trunk transfer -- the
    tactileSRSeqs_train entry).  ``auto_resume=True`` continues from
    ``latest.ckpt`` in the work dir when one exists."""
    config = dict(config or tactileSR_config)
    from ..runtime.logger import setup_logger

    setup_logger("tactilesr_tpu")  # console from the first line; file handler
    # attaches when the trainer knows the work dir
    set_random_seed(config["random_seed"], config["deterministic"])
    from ..runtime.misc import apply_matmul_precision

    apply_matmul_precision(config)

    if mesh is None:
        from ..parallel.mesh import resolve_mesh_from_config

        mesh = resolve_mesh_from_config(config)

    ds_cls = TactileSRDatasetSeq if seqs else TactileSRDataset
    train_ds = ds_cls(config["train_dataset_dir"])
    test_ds = ds_cls(config["test_dataset_dir"])
    lr_train, hr_train = train_ds.stacked()
    lr_test, hr_test = test_ds.stacked()
    logger.info("train dataset size: %d", len(train_ds))
    logger.info("test dataset size: %d", len(test_ds))

    model = build_model(config)
    rng = jax.random.key(config["random_seed"])
    sample = jnp.zeros(
        (1, config["seqsCnt"] * config["axisCnt"], 4, 4), jnp.float32
    )
    variables = jax.device_get(model.init(rng, sample, train=False))
    variables = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }

    if seqs and config.get("load_checkpoint_dir") and os.path.exists(
        config["load_checkpoint_dir"]
    ):
        bundle = load_checkpoint_file(config["load_checkpoint_dir"])
        variables = transfer_trunk_params(variables, bundle)
    elif seqs:
        logger.warning(
            "seqs transfer checkpoint not found at %s; training from scratch",
            config.get("load_checkpoint_dir"),
        )

    epochs = max_epochs or config["epochs"]
    n_train = lr_train.shape[0]
    epoch_len = -(-n_train // config["train_batch_size"])
    # parity: the reference's seqs entry never wires warmup (its fresh output
    # head can ReLU-die against the transferred trunk's large activations);
    # set seqs_use_warmup=true to opt in
    warmup_t = (
        config.get("warmup_t", 0)
        if (not seqs or config.get("seqs_use_warmup", False))
        else 0
    )
    lr_schedule = LRWarmupSchedule(
        StepLR(
            config["lr"],
            config["lr_scheduler_step_size"],
            config["lr_scheduler_gamma"],
        ),
        by_epoch=True,
        epoch_len=epoch_len,
        warmup_t=warmup_t,
        warmup_mode=config.get("warmup_mode", "fix"),
        warmup_init_lr=config.get("warmup_init_lr"),
        warmup_factor=config.get("warmup_factor"),
    )

    trainer = SRTrainer(
        config=config,
        model=model,
        variables=variables,
        tx=adam_l2(
            weight_decay=config["weight_decay"],
            clip_grad_norm=config.get("clip_grad_norm", 0.0),
        ),
        lr_schedule=lr_schedule,
        train_arrays={"LR": lr_train, "HR": hr_train},
        batch_size=config["train_batch_size"],
        max_epochs=epochs,
        work_dir=config["save_dir"],
        checkpoint_period=config["checkpoint_period"],
        mesh=mesh,
        seed=config["random_seed"],
        scan_epochs=bool(config.get("scan_epochs", False)),
        remat=bool(config.get("remat", False)),
        grad_accum=int(config.get("grad_accum", 1)),
    )

    test_arrays = {"LR": lr_test, "HR": hr_test}
    from ..parallel.dist import is_main_process

    trainer.register_hooks([EvalHook(1, build_eval_fn(trainer, test_arrays))])
    if config.get("dead_head_check", True) and is_main_process():
        # slice the probe to the model's input channels (a seqs dataset LR
        # carries 21 channels even when seqsCnt < 7)
        probe = test_arrays["LR"][:, : config["seqsCnt"] * config["axisCnt"]]
        trainer.register_hooks([
            DeadHeadHook(
                probe,
                action=config.get("dead_head_action", "warn"),
                head_module=(
                    "output_conv"
                    if config.get("model_arch", "TactileSR") == "TactileSRCNN"
                    else "output_conv1"
                ),
                reinit_seed=config["random_seed"],
            )
        ])
    if config.get("inference_test"):
        from ..parallel.dist import is_main_process

        if is_main_process():  # PNG artifacts write once, like ckpts/logs
            trainer.register_hooks([InferenceHookSR(test_arrays, config)])

    trainer.train(auto_resume=auto_resume)
    return trainer
