"""Default configs: plain dicts merged over a common block.

Schema parity with the reference's config surface (config/default.py): the
same keys drive the same knobs -- batch sizes, lr/scheduler/warmup blocks,
model hyperparameters, dataset paths, checkpoint/eval cadence.  Differences:
- ``root_path`` comes from ``$TACTILESR_ROOT`` (default: CWD) instead of a
  hard-coded '/code';
- ``compute_dtype`` selects the TPU compute precision (bf16 by default;
  'float32' for strict-parity evals);
- device selection is trivial on TPU (jax picks the chip); the reference's
  import-time nvidia-smi GPU scan maps to :func:`device`.
"""

from __future__ import annotations

import os

__all__ = [
    "common_config",
    "tPSFNet_config",
    "tactileSR_config",
    "tactileSeqs_config",
    "root_path",
    "device",
]

root_path = os.environ.get("TACTILESR_ROOT", os.getcwd())

common_config = {
    "root_path": root_path,
    "random_seed": 42,
    "deterministic": False,
    "scale_num": 100,  # raw taxel readings are divided by this
    "compute_dtype": "bfloat16",
    # whole-epoch lax.scan training (one device dispatch per epoch; same
    # trajectory as per-iter mode, minus per-iteration hook callbacks).
    # TPU-targeted: compiles in ~40s there; the CPU backend can take minutes
    # to compile the scanned conv graph at batch>=32.
    "scan_epochs": False,
    # rematerialize the forward pass in the backward (jax.checkpoint on the
    # loss): activations are recomputed instead of stored, cutting peak HBM
    # ~in half for ~1/3 more forward FLOPs.  Off for the recipes (B<=256
    # fits comfortably); enables train batches whose f32 BN buffers
    # otherwise OOM on one chip (B=2048 -- measured in docs/PERF.md).
    "remat": False,
    # gradient accumulation: split each optimizer step's batch into K
    # micro-batches of train_batch_size/K rows, accumulate valid-row-
    # weighted gradients, step once.  The cure for the single-chip B>256
    # layout cliff (docs/PERF.md): a large EFFECTIVE batch at the healthy
    # per-dispatch shape.  1 = off.
    "grad_accum": 1,
    # data parallelism over the local device mesh: "auto" uses every device
    # the batch size divides over (single device -> no mesh), "off" disables,
    # an integer requests exactly N devices.  See parallel/mesh.py.
    "data_parallel": "auto",
    # jax matmul/conv precision for f32 operands.  On TPU the "default"
    # lowers f32 contractions to ONE bf16 MXU pass -- fast, and fine for
    # the recipes (which train bf16 anyway via compute_dtype).  Set
    # "highest" (6-pass) or "high" (3-pass) when float32 parity with a
    # CPU/GPU reference matters, e.g. scripts/head_to_head.py.
    "matmul_precision": "default",
}

# ---------------------------------------------------------------- tPSFNet
tPSFNet_config = {
    **common_config,
    "train_batch_size": 256,
    "test_batch_size": 8,
    "gama": 1.4,
    "perception_scale": None,
    "loss_scale": 1e-1,
    "lr": 1e-4,
    "lr_scheduler_step_size": 1,
    "lr_scheduler_gamma": 0.8,
    "checkpoint_period": 1,
    "weight_decay": 1e-5,
    "epochs": 51,
    "sample_cnt": 32,
    "dataset_dir": os.path.join(root_path, "data/rotateDataset"),
    "save_dir": os.path.join(root_path, "pth/tPSFNet_no_aug"),
    "is_aug_data": False,
    # fused Pallas physics kernel (VMEM-resident band matrices); numerically
    # equivalent to the XLA path and ~1.2x faster on TPU (batch-tiled, see
    # ops/pallas/tpsf_kernel.py).  "auto" = on for TPU backends, off
    # elsewhere (interpret mode is for tests, not training speed)
    "use_pallas_physics": "auto",
    # in-kernel matmul precision for the Pallas physics: "highest" is the
    # f32 parity default (the XLA path and the torch reference are f32);
    # "default" lowers the kernel's matmuls to one bf16 MXU pass -- measured
    # ~1.33x physics throughput at generation-scale batches at 2e-3 relative
    # LR deviation (docs/PERF.md).  Pallas-only: the XLA physics path stays
    # pinned to explicit f32-HIGHEST (it is the parity/golden reference and
    # the custom_vjp backward).
    "physics_precision": "highest",
    # inference-test params (alpha/beta-vs-force curves)
    "inference_test": True,
    "inference_index": 36,
    "inference_seqs_length": 64,
    "test_dataset_dir_1": os.path.join(root_path, "data/rotateDataset/I.npy"),
    "test_dataset_dir_2": os.path.join(root_path, "data/rotateDataset/P.npy"),
}

# --------------------------------------------------------------- tactileSR
tactileSR_config = {
    **common_config,
    "train_batch_size": 32,
    "test_batch_size": 8,
    "lr": 1e-3,
    "weight_decay": 1e-2,
    "lr_scheduler_step_size": 2,
    "lr_scheduler_gamma": 0.8,
    "checkpoint_period": 1,
    "HR_scale_num": 10,
    # PSNR max value; the code passes this value itself (not /HR_scale_num)
    "sensorMaxVaule_factor": 250,
    "epochs": 51,
    "warmup_t": 2000,
    # NB: the reference entry script never forwards warmup_by_epoch, so the
    # effective value is False; we keep the key for schema parity.
    "warmup_by_epoch": True,
    "warmup_mode": "auto",
    "warmup_init_lr": 1e-5,
    "warmup_factor": 1e-4,
    "scale_factor": 10,
    "seqsCnt": 1,
    "axisCnt": 3,
    "patternFeatureExtraLayerCnt": 6,
    "forceFeatureExtraLayerCnt": 1,
    # "TactileSR" (ToH-2024, default) or "TactileSRCNN" (IROS-2022 baseline,
    # single-frame); additive over the reference, which keeps the CNN class
    # in its model file with no recipe wiring (model/tactileSR_model.py:101)
    "model_arch": "TactileSR",
    # "reference" keeps the reference's Kaiming fan_out on the final
    # conv->ReLU head (which can be born dead on an unlucky draw -- the
    # eval then freezes at mean(HR^2); see RESULTS.md); "non_negative"
    # folds that one kernel to |Kaiming|/sqrt(fan_in) so the head is alive
    # for every seed AND scale-matched (measured: +4 dB over the trained
    # torch reference, RESULTS.md "head-init study").  Same param tree
    # either way (checkpoint-compatible); additive over the reference.
    "head_init": "reference",
    # runtime detector for the born-dead-head signature (loss pinned at
    # mean(HR^2), ~zero output variance): logs a WARNING naming the
    # head_init cure after 3 such epochs.  See tasks/sr_task.py::DeadHeadHook.
    "dead_head_check": True,
    # what the detector does on detection: "warn" (log once, default) or
    # "reinit" (re-draw ONLY the final head kernel with the scale-
    # compensated non-negative init, zero its Adam moments, keep training
    # -- the diagnosed run recovers in place instead of being restarted)
    "dead_head_action": "warn",
    "inference_test": True,
    "save_dir": os.path.join(root_path, "pth/tactileSR_single"),
    "train_dataset_dir": os.path.join(root_path, "data/SRdataset/SRdataset_train.npz"),
    "test_dataset_dir": os.path.join(root_path, "data/SRdataset/SRdataset_test.npz"),
    "val_dataset_dir": os.path.join(
        root_path, "data/SRdataset/SRdataset_validation.npz"
    ),
}

# ------------------------------------------------------------- tactileSeqs
tactileSeqs_config = {
    **tactileSR_config,
    "seqsCnt": 7,  # seqs length <= 7
    "axisCnt": 3,
    "lr": 1e-4,
    "weight_decay": 1e-2,
    "epochs": 51,
    "load_checkpoint_dir": os.path.join(
        root_path, "pth/tactileSR_single/checkpoints/epoch_50.ckpt"
    ),
    # opt-in LR warmup for the seqs stage (the reference entry wires none,
    # which can dead-ReLU the fresh output head; see tasks/sr_task.py)
    "seqs_use_warmup": False,
    "save_dir": os.path.join(root_path, "pth/tactileSeqs_seq_7"),
    "train_dataset_dir": os.path.join(
        root_path, "data/SeqsDataset/SRdataset_train_32.npz"
    ),
    "test_dataset_dir": os.path.join(
        root_path, "data/SeqsDataset/SRdataset_test_32.npz"
    ),
    "val_dataset_dir": os.path.join(
        root_path, "data/SeqsDataset/SRdataset_validation_32.npz"
    ),
}


def device():
    """The accelerator the recipes run on (TPU equivalent of the reference's
    import-time GPU pick: jax already orders devices sensibly)."""
    import jax

    return jax.devices()[0]
