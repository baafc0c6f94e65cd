"""Subprocess body for the multi-host TRAINING test.

Each worker joins a ``jax.distributed`` cluster (CPU backend, 4 virtual
devices per process via ``xla_force_host_platform_device_count``) and runs
the REAL product path -- ``tasks.sr_task.main`` with ``data_parallel=auto``
-- over a mesh spanning both processes.  The same script also serves as the
single-process baseline (no TACTILESR_* env): identical recipe over the
identical global 8-device mesh, so the parent test can assert the loss
trajectories match.

Prints one ``RESULT`` JSON line with the loss trajectory, eval metrics, and
which artifacts (checkpoints / TB logs) this process wrote.
"""

import glob
import json
import os
import sys

import jax

# the launch environment may pin another platform via sitecustomize; the env
# var alone is not honored once that happened, so force via the config API
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tactilesr_tpu.parallel import init_distributed  # noqa: E402


def main() -> None:
    rank = init_distributed()  # derives from TACTILESR_* env; no-op if absent
    data_dir = os.environ["TT_DATA_DIR"]
    work_dir = os.environ["TT_WORK_DIR"]  # per-process (simulates host-local disk)
    expect_devices = int(os.environ.get("TT_EXPECT_DEVICES", "8"))
    assert jax.device_count() == expect_devices, (
        jax.device_count(),
        expect_devices,
    )

    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.tasks.sr_task import main as sr_main

    cfg = dict(tactileSR_config)
    cfg.update(
        train_dataset_dir=os.path.join(data_dir, "SRdataset_train.npz"),
        test_dataset_dir=os.path.join(data_dir, "SRdataset_test.npz"),
        save_dir=work_dir,
        train_batch_size=8,
        test_batch_size=8,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        compute_dtype="float32",
        warmup_t=0,
        lr=1e-3,
        inference_test=False,
        data_parallel="auto",  # -> the full 8-device mesh, both topologies
        scan_epochs=os.environ.get("TT_SCAN", "0") == "1",
    )
    trainer = sr_main(cfg, max_epochs=2)

    # The tPSF curves render in the hairiest multi-host configuration: the
    # hook is registered only on the MAIN process (as in production), so
    # rank 0 renders ALONE while a TPSFNet carries the process-spanning
    # mesh with the Pallas physics path on and a sequence length divisible
    # by the data axis.  render() drops the mesh and applies purely
    # locally; this pins that the per-epoch PNG (and inspect_checkpoint)
    # stays single-sided-safe -- a spanning shard_map entered from one
    # process is at the mercy of jax version behavior the moment any
    # output is materialized.  Rank > 0 skips, exactly like the hook.
    tpsf_png = None  # None = skipped (non-main rank)
    tpsf_err = ""
    if rank == 0:
        tpsf_png = False
        try:
            import numpy as np

            from tactilesr_tpu.models.tpsf_net import TPSFNet
            from tactilesr_tpu.tasks.tpsf_task import InferenceHookTPSF

            rng = np.random.default_rng(0)
            seq = {
                "LR": rng.uniform(0, 100, (8, 3, 4, 4)).astype(np.float32),
                "depth": rng.uniform(0, 1, (8, 100, 100)).astype(np.float32),
            }
            model = TPSFNet(use_pallas=True, mesh=trainer.mesh)
            params = model.init(
                jax.random.PRNGKey(0),
                jax.numpy.asarray(seq["LR"][:1]),
                jax.numpy.asarray(seq["depth"][:1, None]),
                return_psf=False,
            )["params"]
            hook = InferenceHookTPSF(seq, seq)
            png = os.path.join(work_dir, "curves_rank0.png")
            hook.render(png, model=model, params=params)
            tpsf_png = os.path.exists(png)
        except Exception as e:  # surfaced through the RESULT line
            tpsf_err = f"{type(e).__name__}: {e}"

    storage = trainer.metric_storage
    losses = (
        storage["total_loss"].state_dict()["values"]
        if "total_loss" in storage
        else []
    )
    evals = {
        k: storage[k].state_dict()["values"]
        for k in ("test_loss", "test_PSNR", "test_SSIM")
        if k in storage
    }
    print(
        "RESULT "
        + json.dumps(
            {
                "rank": rank,
                "world": jax.process_count(),
                "local_devices": jax.local_device_count(),
                "mesh_devices": int(trainer.mesh.devices.size)
                if trainer.mesh is not None
                else 1,
                "losses": losses,
                "evals": evals,
                "tpsf_png": tpsf_png,
                "tpsf_err": tpsf_err,
                "ckpts": sorted(
                    os.path.basename(p)
                    for p in glob.glob(os.path.join(trainer.ckpt_dir, "*"))
                ),
                "tb_files": len(
                    glob.glob(
                        os.path.join(trainer.tb_log_dir, "**", "*"),
                        recursive=True,
                    )
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
