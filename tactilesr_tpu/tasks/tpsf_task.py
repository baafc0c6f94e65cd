"""tPSFNet training recipe (stage 1: learn the PSF physics).

Workload parity with the reference entry (train/tPSFNet_train.py): inputs
are LR/scale_num and the raw depth map (:183-184); the loss is
self-supervised MSE between the degraded prediction and the real z-channel
reading (:187); eval reports MSE+SSIM of the first sample of each test batch
(:51-72); an inference hook plots alpha/beta vs force over two single-tap
press sequences (:75-170).

On TPU the whole batch's physics is a stack of small matmuls (see
ops/psf.py) -- the reference's per-sample python loop over a 99x99 conv
becomes one fused XLA computation.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.default import tPSFNet_config
from ..data.datasets import SingleTapSeqsDataset, TPSFNetDataset
from ..metrics import ssim as ssim_fn
from ..models.tpsf_net import TPSFNet
from ..ops.psf import resolve_pallas_physics, resolve_physics_precision
from ..runtime.hooks import EvalHook, HookBase
from ..runtime.misc import set_random_seed
from ..runtime.optim import adam_l2
from ..runtime.schedule import LRWarmupSchedule, StepLR
from ..runtime.trainer import Trainer, masked_mse

__all__ = ["TPSFTrainer", "build_model", "build_eval_fn", "InferenceHookTPSF", "main"]

logger = logging.getLogger("tactilesr_tpu")


def build_model(config, mesh=None) -> TPSFNet:
    return TPSFNet(
        gama=config["gama"],
        perception_scale=config["perception_scale"],
        dtype=jnp.dtype(config.get("compute_dtype", "float32")),
        use_pallas=resolve_pallas_physics(config),
        physics_precision=resolve_physics_precision(
            config.get("physics_precision")
        ),
        mesh=mesh,
    )


class TPSFTrainer(Trainer):
    def __init__(self, config, model, **kwargs):
        self.config = config
        self.scale_num = config["scale_num"]
        super().__init__(model=model, **kwargs)

    def train_cal_loss(self, params, batch_stats, batch):
        lr_in = batch["LR"].astype(jnp.float32) / self.scale_num
        depth = batch["depth"][:, None]  # (B, 1, 100, 100)
        _hr, lr_degrade, _psf, _ab = self.model.apply(
            {"params": params},
            lr_in,
            depth,
            return_psf=False,
        )
        loss = masked_mse(lr_in[:, 2:3], lr_degrade, batch["mask"])
        return loss, {"total_loss": loss}, batch_stats


def build_eval_fn(trainer: TPSFTrainer, test_arrays: Dict[str, np.ndarray]):
    """First-sample-per-batch MSE+SSIM between the degraded 4x4 prediction
    and the real z-channel, averaged over test batches (the reference's eval
    semantics), evaluated in one jitted lax.map."""
    config = trainer.config
    model = trainer.model
    bs = config["test_batch_size"]
    scale_num = config["scale_num"]

    lr_all, depth_all = test_arrays["LR"], test_arrays["depth"]
    n = lr_all.shape[0]
    # only the first sample of each test batch is scored (incl. the final
    # partial batch), matching the reference's eval loop
    firsts = np.arange(0, n, bs)
    # host numpy (uncommitted): jit replicates them over whatever mesh the
    # params live on, including multi-process meshes
    lr_f = np.asarray(lr_all[firsts])
    depth_f = np.asarray(depth_all[firsts])

    @jax.jit
    def eval_all(params):
        def per_first(args):
            lr1, d1 = args
            lr1 = lr1[None].astype(jnp.float32) / scale_num
            _hr, deg, _psf, _ab = model.apply(
                {"params": params}, lr1, d1[None, None], return_psf=False
            )
            lr_z = lr1[0, 2]
            deg0 = deg[0, 0]
            mse = jnp.mean((deg0 - lr_z) ** 2)
            return mse, ssim_fn(deg0, lr_z)

        mse, ssim_v = jax.lax.map(per_first, (lr_f, depth_f))
        return mse.mean(), ssim_v.mean()

    def eval_func() -> Dict[str, float]:
        mse, ssim_v = jax.device_get(eval_all(trainer.state.params))
        # fixed precision, not repr(float): a 17-significant-digit float in
        # this line is what a fixed-size log-tail window cuts mid-number,
        # leaving a bare digit-run that reads like stray output
        logger.info("mse_loss_ave:%.6g, ssim_ave:%.6g", float(mse), float(ssim_v))
        return {"Eval Metric": float(mse), "eval_ssim": float(ssim_v)}

    return eval_func


class InferenceHookTPSF(HookBase):
    """Per-epoch alpha/beta-vs-force curves over two press sequences, plus
    their depth patterns -- the reference's physics-sanity PNG."""

    priority = 5

    def __init__(self, seq_arrays_1, seq_arrays_2, scale_num: int = 100):
        self._seqs = (seq_arrays_1, seq_arrays_2)
        self._scale = scale_num

    def _curves(self, arrays, model, params):
        lr = jnp.asarray(arrays["LR"], jnp.float32) / self._scale
        depth = jnp.asarray(arrays["depth"])[:, None]
        _hr, _deg, _psf, ab = model.apply(
            {"params": params}, lr, depth, return_psf=False
        )
        ab = np.asarray(ab[:, 0])
        force = np.asarray(lr[:, 2].sum(axis=(1, 2)))
        return force, ab[:, 0], ab[:, 1]

    def after_epoch(self) -> None:
        t = self.trainer
        out_dir = os.path.join(t.work_dir, "inference_result")
        os.makedirs(out_dir, exist_ok=True)
        self.render(os.path.join(out_dir, f"epoch_{t.cur_epoch}.png"))

    def render(self, save_name: str, model=None, params=None) -> None:
        """Render the curves PNG.  Inside training the hook reads the live
        trainer; standalone callers (``inspect_checkpoint``) pass an explicit
        (model, params) pair instead -- no trainer required."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.gridspec as gridspec
        import matplotlib.pyplot as plt

        if model is None:
            t = self.trainer
            model, params = t.model, t.state.params
        from ..parallel.mesh import host_local_copy

        params = host_local_copy(params)  # eager apply under a mp mesh
        if getattr(model, "mesh", None) is not None:
            # drop the training mesh for the render: the PNG is a tiny
            # host-side path, and a process-spanning mesh cannot be
            # shard_mapped eagerly from a single process (the Pallas
            # physics branch would see non-addressable devices)
            model = model.clone(mesh=None)

        fig = plt.figure(figsize=(10, 6), tight_layout=True)
        gs = gridspec.GridSpec(2, 4)
        ax1 = fig.add_subplot(gs[0:2, 1:4])
        ax2 = ax1.twinx()
        ax3 = fig.add_subplot(gs[0, 0])
        ax4 = fig.add_subplot(gs[1, 0])

        for k, (arrays, color, axd) in enumerate(
            zip(self._seqs, ("red", "blue"), (ax3, ax4))
        ):
            force, alpha, beta = self._curves(arrays, model, params)
            ax1.plot(force, alpha, color=color, label=rf"pattern{k+1}_$\alpha$")
            ax2.plot(force, beta, "--", color=color, label=rf"pattern{k+1}_$\beta$")
            axd.imshow(np.asarray(arrays["depth"][-1]))
            axd.set_title(f"pattern{k+1}")
        ax1.set_ylabel(r"$\alpha$")
        ax2.set_ylabel(r"$\beta$")
        ax1.legend(loc="upper left")
        ax2.legend(loc="upper right")
        plt.savefig(save_name)
        plt.close(fig)


def main(config=None, mesh=None, max_epochs: Optional[int] = None):
    config = dict(config or tPSFNet_config)
    from ..runtime.logger import setup_logger

    setup_logger("tactilesr_tpu")
    set_random_seed(config["random_seed"], config["deterministic"])
    from ..runtime.misc import apply_matmul_precision

    apply_matmul_precision(config)

    if mesh is None:
        from ..parallel.mesh import resolve_mesh_from_config

        mesh = resolve_mesh_from_config(config)

    train_ds = TPSFNetDataset(
        config["dataset_dir"],
        sample_cnt=config["sample_cnt"],
        is_sample_idx=list(range(5, 81)),
        is_aug_data=config["is_aug_data"],
    )
    test_ds = TPSFNetDataset(
        config["dataset_dir"],
        sample_cnt=config["sample_cnt"],
        is_sample_idx=list(range(0, 5)),
        is_aug_data=config["is_aug_data"],
    )
    logger.info("train dataset size: %d", len(train_ds))
    logger.info("test dataset size: %d", len(test_ds))
    lr_train, depth_train = train_ds.stacked()
    lr_test, depth_test = test_ds.stacked()

    model = build_model(config, mesh)
    rng = jax.random.key(config["random_seed"])
    variables = jax.device_get(
        model.init(
            rng,
            jnp.zeros((1, 3, 4, 4), jnp.float32),
            jnp.zeros((1, 1, 100, 100), jnp.float32),
            return_psf=False,
        )
    )
    variables = {"params": variables["params"], "batch_stats": {}}

    epochs = max_epochs or config["epochs"]
    lr_schedule = LRWarmupSchedule(
        StepLR(
            config["lr"],
            config["lr_scheduler_step_size"],
            config["lr_scheduler_gamma"],
        ),
        by_epoch=True,
        epoch_len=-(-lr_train.shape[0] // config["train_batch_size"]),
    )

    trainer = TPSFTrainer(
        config=config,
        model=model,
        variables=variables,
        tx=adam_l2(
            weight_decay=config["weight_decay"],
            clip_grad_norm=config.get("clip_grad_norm", 0.0),
        ),
        lr_schedule=lr_schedule,
        train_arrays={"LR": lr_train, "depth": depth_train},
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

    trainer.register_hooks(
        [EvalHook(1, build_eval_fn(trainer, {"LR": lr_test, "depth": depth_test}))]
    )

    if config.get("inference_test"):
        seq_arrays = []
        for key in ("test_dataset_dir_1", "test_dataset_dir_2"):
            path = config[key]
            if not os.path.exists(path):
                logger.warning("inference dataset %s missing; hook disabled", path)
                seq_arrays = None
                break
            ds = SingleTapSeqsDataset(
                path, [config["inference_index"]], config["inference_seqs_length"]
            )
            lr_s, depth_s = ds.stacked()
            seq_arrays.append({"LR": lr_s, "depth": depth_s})
        if seq_arrays:
            from ..parallel.dist import is_main_process

            if is_main_process():  # PNG artifacts write once, like ckpts
                trainer.register_hooks(
                    [InferenceHookTPSF(*seq_arrays, scale_num=config["scale_num"])]
                )

    trainer.train(auto_resume=False)
    return trainer


def inspect_checkpoint(config, checkpoint_path: str, save_name: str = "out.png"):
    """Standalone tPSF inspection (capability parity with the reference's
    test_tPSF entry, train/tPSFNet_train.py:306-332): load a trained
    checkpoint and render the alpha/beta-vs-force curves over the two
    configured press sequences without training."""
    from ..runtime.checkpoint import load_checkpoint_file
    from ..runtime.logger import setup_logger

    setup_logger("tactilesr_tpu")
    config = dict(config or tPSFNet_config)
    model = build_model(config)
    bundle = load_checkpoint_file(checkpoint_path)
    params = bundle["model"]["params"]

    seq_arrays = []
    for key in ("test_dataset_dir_1", "test_dataset_dir_2"):
        ds = SingleTapSeqsDataset(
            config[key], [config["inference_index"]], config["inference_seqs_length"]
        )
        lr_s, depth_s = ds.stacked()
        seq_arrays.append({"LR": lr_s, "depth": depth_s})

    hook = InferenceHookTPSF(*seq_arrays, scale_num=config["scale_num"])
    hook.render(save_name, model=model, params=params)
    logger.info("wrote %s", save_name)
    return save_name
