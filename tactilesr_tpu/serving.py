"""Serving: compiled batched SR inference from a checkpoint.

The deployment-facing counterpart of the training recipes: load a
``.ckpt`` (ours) or a converted reference ``.pth``, compile the forward once
per batch bucket, and stream (N, C, 4, 4) readings to (N, 1, 40, 40)
contact-pressure maps.

TPU serving shape discipline: inputs are padded up to a fixed set of batch
buckets so XLA never sees a new shape after warmup; params are device-
resident; compute runs in bf16 by default (f32 upcast happens only at the
output).
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.inference import (
    fold_inference_params,
    fold_inference_params_cnn,
    resolve_branch_mode,
    tactile_sr_cnn_infer,
    tactile_sr_infer,
)
from .models.tactile_sr import TactileSR, TactileSRCNN
from .parallel.mesh import put_global, resolve_mesh
from .runtime.checkpoint import load_checkpoint_file

__all__ = ["SRPredictor"]

logger = logging.getLogger("tactilesr_tpu")

DEFAULT_BUCKETS = (1, 8, 64, 256, 1024)

# bucket-aware "auto" branch-mode crossover for MTSR serving: measured
# device latencies (docs/PERF.md round-5) have per_seq faster below this
# bucket (B=1: 0.192 vs 0.339 ms; B=64: 7.35 vs 8.73) and grouped faster
# at and above it (B=4096: 410.4 vs 416.7 ms/iter)
BRANCH_GROUPED_MIN_BUCKET = 256


def _tree_spec(tree):
    """{leaf: (shape, dtype)} fingerprint used to validate hot-swapped
    checkpoints against the serving executables (both load paths)."""
    import jax.tree_util as jtu

    return jtu.tree_map(
        lambda a: (tuple(np.shape(a)), str(np.result_type(a))), tree
    )


class SRPredictor:
    """Compiled SR inference with batch bucketing.

    ``model_arch`` mirrors the training config knob (tasks/sr_task.py
    ``build_model``): "TactileSR" (default, STSR/MTSR) or "TactileSRCNN"
    (the IROS-2022 single-frame baseline).
    """

    def __init__(
        self,
        checkpoint_path: str,
        scale_factor: int = 10,
        seqs_cnt: int = 1,
        axis_cnt: int = 3,
        pattern_layers: int = 6,
        force_layers: int = 1,
        compute_dtype: str = "bfloat16",
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        fused: bool = True,
        model_arch: str = "TactileSR",
        mesh=None,
        branch_mode: str = "auto",
    ):
        if model_arch not in ("TactileSR", "TactileSRCNN"):
            raise ValueError(f"unknown model_arch {model_arch!r}")
        self.model_arch = model_arch
        if model_arch == "TactileSRCNN":
            if seqs_cnt != 1:
                # ValueError (not assert): survives python -O and maps to a
                # 4xx in server.py's handlers instead of an opaque 500
                raise ValueError(
                    f"TactileSRCNN is single-frame; got seqs_cnt={seqs_cnt}"
                )
            self.model = TactileSRCNN(
                scale_factor=scale_factor, dtype=jnp.dtype(compute_dtype)
            )
        else:
            self.model = TactileSR(
                scale_factor=scale_factor,
                seqs_cnt=seqs_cnt,
                axis_cnt=axis_cnt,
                pattern_feature_extra_layer_cnt=pattern_layers,
                force_feature_extra_layer_cnt=force_layers,
                dtype=jnp.dtype(compute_dtype),
            )
        self.in_channels = seqs_cnt * axis_cnt
        self._seqs_cnt = seqs_cnt
        self._pattern_layers = pattern_layers
        self._force_layers = force_layers
        self._compute_dtype = compute_dtype
        # MTSR branch formulation (models/inference.py rewrite 4).  Unlike
        # the bare fold/infer API (whose "auto" is one mode), the predictor
        # compiles per-bucket executables, so "auto" here chooses PER
        # BUCKET from the measured crossover (docs/PERF.md round-5 device
        # latencies: per_seq wins small dispatches -- B=1 0.192 vs
        # 0.339 ms, B=64 7.35 vs 8.73 -- grouped wins B>=256): small
        # buckets serve per_seq, large ones grouped.  An explicit
        # branch_mode pins every bucket to that mode.
        if branch_mode == "auto" and seqs_cnt > 1 and fused \
                and model_arch == "TactileSR":
            self._fold_modes = ("per_seq", "grouped")
            self._mode_for = lambda b: (
                "per_seq" if b < BRANCH_GROUPED_MIN_BUCKET else "grouped"
            )
            self.branch_mode = (
                f"auto (per_seq < {BRANCH_GROUPED_MIN_BUCKET} <= grouped)"
            )
        else:
            mode = resolve_branch_mode(branch_mode, seqs_cnt)
            self._fold_modes = (mode,)
            self._mode_for = lambda b, _m=mode: _m
            self.branch_mode = mode
        # data-parallel serving: batches shard over the mesh's data axis,
        # weights replicate; XLA compiles the per-device program, results
        # gather on fetch.  Buckets round up to data-axis multiples so every
        # device gets an equal shard (predict() already pads to the bucket).
        self.mesh = mesh
        self._in_sharding = None
        rep = None
        if mesh is not None:
            from .parallel.mesh import DATA_AXIS, batch_sharding, replicated_sharding

            ndata = mesh.shape[DATA_AXIS]
            adj = tuple(sorted({-(-b // ndata) * ndata for b in buckets}))
            if adj != tuple(sorted(buckets)):
                logger.info(
                    "buckets %s rounded to data-axis multiples: %s",
                    tuple(sorted(buckets)),
                    adj,
                )
            buckets = adj
            self._in_sharding = batch_sharding(mesh)
            rep = replicated_sharding(mesh)
        self.buckets = tuple(sorted(buckets))
        self.fused = fused
        self._rep = rep
        if fused:
            if model_arch == "TactileSRCNN":
                self._forward = lambda w, x: tactile_sr_cnn_infer(
                    w["cnn"], x, scale_factor=scale_factor
                )
            else:
                infer_kw = dict(
                    scale_factor=scale_factor,
                    seqs_cnt=seqs_cnt,
                    axis_cnt=axis_cnt,
                    pattern_layers=pattern_layers,
                    force_layers=force_layers,
                )

                def _fwd(w, x):
                    # x is always padded to a bucket, so its leading dim
                    # selects the bucket's formulation (one executable per
                    # (bucket, mode); modes agree to f32 roundoff)
                    mode = self._mode_for(x.shape[0])
                    return tactile_sr_infer(
                        w[mode], x, branch_mode=mode, **infer_kw
                    )

                self._forward = _fwd
        else:
            self._forward = jax.jit(
                lambda v, x: self.model.apply(v, x, train=False)
            )
        self._load_weights(checkpoint_path)
        logger.info(
            "SRPredictor ready: %s (%s, buckets %s, fused=%s)",
            checkpoint_path,
            model_arch,
            self.buckets,
            fused,
        )

    def _load_weights(self, checkpoint_path: str) -> None:
        """Load (or hot-swap) checkpoint weights into the serving state.

        All work happens on locals; ``self.variables``/``self._folded`` are
        assigned only after every validation passed, so an error (or an
        interrupt) anywhere leaves the previous weights serving intact."""
        bundle = load_checkpoint_file(checkpoint_path)
        model_state = bundle["model"]
        # host-side view of the training-graph weights; the fused path only
        # reads them once during folding, so they go device-resident only
        # when serving the literal training graph (fused=False)
        variables = {
            "params": model_state["params"],
            "batch_stats": model_state.get("batch_stats", {}),
        }
        if not self.fused:
            old = getattr(self, "variables", None)
            if old is not None:  # reload: the new tree must match exactly
                if _tree_spec(old) != _tree_spec(variables):
                    raise ValueError(
                        f"checkpoint {checkpoint_path!r} does not match the "
                        "serving architecture (different parameter tree or "
                        "shapes); previous weights keep serving"
                    )
            # put_global: the multihost-correct construction when the mesh
            # spans processes (plain device_put otherwise)
            self.variables = (
                put_global(variables, self._rep)
                if self._rep is not None
                else jax.device_put(variables)
            )
            return
        # one-time host-side graph rewrite: BN fold + conv merge/split
        # (models/inference.py); exact in f32, rounding-only in bf16.
        # self._folded maps mode -> folded layout (bucket-aware "auto"
        # folds both; the weights are the same numbers rearranged)
        try:
            if self.model_arch == "TactileSRCNN":
                folded = {
                    "cnn": fold_inference_params_cnn(
                        variables, dtype=jnp.dtype(self._compute_dtype)
                    )
                }
            else:
                folded = {
                    mode: fold_inference_params(
                        variables,
                        seqs_cnt=self._seqs_cnt,
                        pattern_layers=self._pattern_layers,
                        force_layers=self._force_layers,
                        dtype=jnp.dtype(self._compute_dtype),
                        branch_mode=mode,
                    )
                    for mode in self._fold_modes
                }
        except KeyError as e:
            if not variables.get("batch_stats"):
                raise KeyError(
                    f"checkpoint {checkpoint_path!r} has no batch_stats "
                    "(required to fold eval-mode BatchNorm); was it "
                    "saved before any training step?"
                ) from e
            knobs = (
                f"model_arch={self.model_arch!r}"
                if self.model_arch == "TactileSRCNN"
                else (
                    f"model_arch={self.model_arch!r}, "
                    f"seqs_cnt={self._seqs_cnt}, "
                    f"pattern_layers={self._pattern_layers}, "
                    f"force_layers={self._force_layers}"
                )
            )
            raise KeyError(
                f"checkpoint {checkpoint_path!r} has no parameter {e} -- "
                f"do {knobs} match the trained architecture?"
            ) from e
        old_folded = getattr(self, "_folded", None)
        if old_folded is not None:
            # reload: the folded tree must match the serving executables'
            # shapes/dtypes exactly, or the no-recompile hot-swap contract
            # breaks (and a trace error would strand us weightless) -- same
            # guarantee the unfused path enforces above
            if _tree_spec(old_folded) != _tree_spec(folded):
                raise ValueError(
                    f"checkpoint {checkpoint_path!r} does not match the "
                    "serving architecture (different folded-parameter "
                    "shapes); previous weights keep serving"
                )
        folded = (
            put_global(folded, self._rep)
            if self._rep is not None
            else jax.device_put(folded)
        )
        # commit: plain attribute rebinds are atomic under the GIL, and
        # predict() snapshots the weights once per call, so an in-flight
        # batch finishes entirely on whichever checkpoint it started with
        self._folded = folded
        self.variables = variables

    def reload_checkpoint(self, checkpoint_path: str) -> None:
        """Hot-swap weights on a live predictor without recompilation.

        The compiled forwards are keyed on shapes/dtypes, which a same-
        architecture checkpoint preserves, so the next ``predict`` call
        reuses the existing executables with the new weights.  A mismatched
        checkpoint raises (see ``_load_weights``) and leaves the previous
        weights serving; an in-flight ``predict`` finishes entirely on the
        weights it started with (per-call snapshot)."""
        self._load_weights(checkpoint_path)
        logger.info("SRPredictor weights hot-swapped from %s", checkpoint_path)

    def _place(self, x: jnp.ndarray) -> jnp.ndarray:
        """Shard the batch over the mesh's data axis (no-op single-device)."""
        if self._in_sharding is None:
            return x
        return put_global(x, self._in_sharding)

    def _current_weights(self):
        """Snapshot of the serving weights; predict() reads this ONCE so a
        concurrent reload_checkpoint never mixes checkpoints mid-batch."""
        return self._folded if self.fused else self.variables

    def warmup(self) -> None:
        """Compile every bucket up front (first query stays fast)."""
        w = self._current_weights()
        for b in self.buckets:
            x = self._place(jnp.zeros((b, self.in_channels, 4, 4), jnp.float32))
            out = self._forward(w, x)
        float(jnp.asarray(out.ravel()[0]))  # reliable sync on tunneled TPUs

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, lr: np.ndarray) -> np.ndarray:
        """(N, C, 4, 4) raw-scaled readings -> (N, 1, 4s, 4s) SR maps."""
        lr = np.asarray(lr, np.float32)
        if lr.ndim != 4 or lr.shape[1] != self.in_channels:
            # ValueError (not assert) so request validation survives -O;
            # the server maps it to a 400
            raise ValueError(
                f"expected (N, {self.in_channels}, 4, 4), got {lr.shape}"
            )
        n = lr.shape[0]
        outs = []
        i = 0
        w = self._current_weights()  # one snapshot for the whole request
        while i < n:
            b = self._bucket(n - i)
            chunk = lr[i : i + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
                )
            out = self._forward(w, self._place(jnp.asarray(chunk)))
            outs.append(np.asarray(out)[: b - pad])
            i += b - pad
        return np.concatenate(outs)


def export_stablehlo(
    checkpoint_path: str,
    out_path: str,
    batch: int = 256,
    scale_factor: int = 10,
    seqs_cnt: int = 1,
    pattern_layers: int = 6,
    force_layers: int = 1,
    compute_dtype: str = "bfloat16",
    fused: bool = True,
    model_arch: str = "TactileSR",
    branch_mode: str = "auto",
) -> str:
    """Serialize the SR forward (weights baked in) as a portable StableHLO
    artifact via ``jax.export`` -- loadable by any jax process
    (``jax.export.deserialize(...).call(x)``) or downstream StableHLO
    consumers, with no dependency on this package at serving time.

    ``fused``/``model_arch`` select the same graph the predictor would
    serve (fused rewrite by default; ``fused=False`` exports the literal
    training graph for parity-sensitive consumers)."""
    import jax
    from jax import export as jexport

    pred = SRPredictor(
        checkpoint_path,
        scale_factor=scale_factor,
        seqs_cnt=seqs_cnt,
        pattern_layers=pattern_layers,
        force_layers=force_layers,
        compute_dtype=compute_dtype,
        buckets=(batch,),
        fused=fused,
        model_arch=model_arch,
        branch_mode=branch_mode,
    )
    weights = pred._current_weights()

    def fwd(x):
        return pred._forward(weights, x)

    spec = jax.ShapeDtypeStruct((batch, pred.in_channels, 4, 4), jnp.float32)
    exported = jexport.export(jax.jit(fwd))(spec)
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    logger.info("exported StableHLO (%d bytes) -> %s", len(data), out_path)
    return out_path


def _cli():
    import argparse
    import json
    import time

    from . import maybe_force_platform
    from .runtime.logger import setup_logger

    maybe_force_platform()
    setup_logger("tactilesr_tpu")
    p = argparse.ArgumentParser(
        prog="python -m tactilesr_tpu.serving",
        description="Batched SR inference from a checkpoint",
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input", required=True, help=".npz with an 'LR' array")
    p.add_argument("--output", default=None, help=".npz to write 'SR' maps to")
    p.add_argument("--seqs-cnt", type=int, default=1)
    p.add_argument("--scale-factor", type=int, default=10)
    p.add_argument("--pattern-layers", type=int, default=6)
    p.add_argument("--force-layers", type=int, default=1)
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument(
        "--model-arch",
        default="TactileSR",
        choices=("TactileSR", "TactileSRCNN"),
        help="same knob as the training config's model_arch",
    )
    p.add_argument(
        "--no-fused",
        action="store_true",
        help="serve through the training graph instead of the fused rewrite",
    )
    p.add_argument(
        "--branch-mode",
        default="auto",
        choices=("auto", "per_seq", "dense", "grouped", "mixed"),
        help="MTSR input-branch formulation (models/inference.py rewrite 4)",
    )
    p.add_argument(
        "--data-parallel",
        default="off",
        help="shard serving batches over local devices: off|auto|N "
        "(same knob as the training configs)",
    )
    p.add_argument(
        "--evaluate",
        action="store_true",
        help="if the input .npz has an 'HR' array, report PSNR/SSIM vs it",
    )
    p.add_argument("--hr-scale-num", type=float, default=10.0)
    p.add_argument("--max-value", type=float, default=250.0)
    args = p.parse_args()

    with np.load(args.input) as z:
        lr = z["LR"]
        hr = z["HR"] if args.evaluate and "HR" in z else None
    pred = SRPredictor(
        args.checkpoint,
        scale_factor=args.scale_factor,
        seqs_cnt=args.seqs_cnt,
        pattern_layers=args.pattern_layers,
        force_layers=args.force_layers,
        compute_dtype=args.compute_dtype,
        fused=not args.no_fused,
        model_arch=args.model_arch,
        mesh=resolve_mesh(args.data_parallel),
        branch_mode=args.branch_mode,
    )
    pred.warmup()
    t0 = time.perf_counter()
    sr = pred.predict(lr)
    dt = time.perf_counter() - t0
    report = {
        "frames": int(lr.shape[0]),
        "seconds": round(dt, 4),
        "frames_per_sec": round(lr.shape[0] / dt, 1),
        "output_shape": list(sr.shape),
    }
    if hr is not None:
        import jax.numpy as jnp2

        from .metrics import batched_psnr, batched_ssim
        from .tasks.sr_task import prepare_sr_labels

        cfg = {"scale_factor": args.scale_factor, "HR_scale_num": args.hr_scale_num}
        hr_lab = prepare_sr_labels(hr, cfg)
        ps = np.asarray(
            batched_psnr(jnp2.asarray(sr[:, 0]), jnp2.asarray(hr_lab[:, 0]), args.max_value)
        )
        ss = np.asarray(batched_ssim(jnp2.asarray(sr[:, 0]), jnp2.asarray(hr_lab[:, 0])))
        report["psnr_db"] = round(float(ps.mean()), 4)
        report["ssim"] = round(float(ss.mean()), 4)
    print(json.dumps(report))
    if args.output:
        np.savez(args.output, SR=sr)
        logger.info("wrote %s", args.output)


if __name__ == "__main__":
    _cli()
