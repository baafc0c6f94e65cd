"""Reverse checkpoint migration: our variables / ``.ckpt`` bundles ->
reference torch ``.pth`` state dicts.

The inverse of :mod:`tactilesr_tpu.compat.torch_convert` — a model trained
in this framework can be handed back to someone still running the torch
reference (``load_state_dict(..., strict=True)`` on the reference's own
model classes; key layout documented in torch_convert's module docstring,
reference definitions at /root/reference/model/tactileSR_model.py:18-153
and /root/reference/model/tPSFNet.py:26-36).

Architecture hyper-parameters (seqs_cnt, pattern/force layer counts,
msrb_cnt) are *inferred from the parameter tree*, so the CLI needs no
flags beyond the architecture name.

Tensor layout conversions (the converter's, inverted): conv kernels flax
(kh,kw,I,O) -> torch (O,I,kh,kw); linear kernels (I,O) -> (O,I); BN
scale/bias -> weight/bias, batch_stats mean/var -> running_mean/var plus
the ``num_batches_tracked`` buffer torch's strict loader requires (we
don't track it; exported as 0, which torch only consults for its own
momentum=None averaging mode the reference never uses).

Requires torch (CPU build is fine); export is a host-side one-shot.
"""

from __future__ import annotations

import logging
import re
from typing import Dict

import numpy as np

__all__ = [
    "export_tactile_sr",
    "export_tactile_srcnn",
    "export_tpsf_net",
    "export_checkpoint_file",
]

logger = logging.getLogger("tactilesr_tpu")


def _t(a):
    import torch

    # copy=True: jax arrays export as read-only numpy views, and torch
    # refuses (warns on) non-writable storage
    return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))


def _put_conv(sd: dict, prefix: str, entry: dict) -> None:
    kernel = np.asarray(entry["conv"]["kernel"])
    sd[f"{prefix}.weight"] = _t(kernel.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    if "bias" in entry["conv"]:
        sd[f"{prefix}.bias"] = _t(entry["conv"]["bias"])


def _put_bn(sd: dict, prefix: str, bn_params: dict, bn_stats: dict) -> None:
    import torch

    sd[f"{prefix}.weight"] = _t(bn_params["scale"])
    sd[f"{prefix}.bias"] = _t(bn_params["bias"])
    sd[f"{prefix}.running_mean"] = _t(bn_stats["mean"])
    sd[f"{prefix}.running_var"] = _t(bn_stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _put_msrb(sd: dict, prefix: str, params: dict, stats: dict) -> None:
    for name in ("conv_3_1", "conv_5_1", "conv_3_2", "conv_5_2"):
        _put_conv(sd, f"{prefix}.{name}.0", params[name])
        _put_bn(sd, f"{prefix}.{name}.1", params[f"{name}_bn"], stats[f"{name}_bn"])
    _put_conv(sd, f"{prefix}.confusion", params["confusion"])


def _put_res_block(sd: dict, prefix: str, params: dict) -> None:
    _put_conv(sd, f"{prefix}.conv1", params["conv1"])
    _put_conv(sd, f"{prefix}.conv2", params["conv2"])


def _count(params: dict, pattern: str) -> int:
    rx = re.compile(pattern)
    return len({m.group(1) for k in params if (m := rx.match(k))})


def export_tactile_sr(variables: Dict[str, dict]) -> dict:
    """Our TactileSR {'params','batch_stats'} -> reference state_dict."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}

    seqs_cnt = _count(params, r"inputLayer_pattern_(\d+)_conv0$")
    for s in range(seqs_cnt):
        base = f"inputLayer_pattern_list.{s}"
        for our_idx, (conv_i, bn_i) in enumerate([(1, 2), (4, 5)]):
            name = f"inputLayer_pattern_{s}_conv{our_idx}"
            _put_conv(sd, f"{base}.{conv_i}", params[name])
            _put_bn(sd, f"{base}.{bn_i}", params[f"{name}_bn"], stats[f"{name}_bn"])

    _put_conv(sd, "inputContact_layer.0", params["inputContact_layer"])
    _put_bn(
        sd,
        "inputContact_layer.1",
        params["inputContact_layer_bn"],
        stats["inputContact_layer_bn"],
    )

    for i in range(_count(params, r"patternFeatureExtra_layer_(\d+)$")):
        _put_msrb(
            sd,
            f"patternFeatureExtra_layer.{i}",
            params[f"patternFeatureExtra_layer_{i}"],
            stats[f"patternFeatureExtra_layer_{i}"],
        )

    _put_conv(sd, "input_layer_force.1", params["input_layer_force"])
    for i in range(_count(params, r"forceFeatureExtra_layer_(\d+)$")):
        _put_res_block(
            sd, f"forceFeatureExtra_layer.{i}", params[f"forceFeatureExtra_layer_{i}"]
        )

    _put_conv(sd, "output_layer.0", params["output_conv0"])
    _put_conv(sd, "output_layer.2", params["output_conv1"])
    return sd


def export_tactile_srcnn(variables: Dict[str, dict]) -> dict:
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    for our_idx, (conv_i, bn_i) in enumerate([(0, 1), (3, 4), (6, 7)]):
        name = f"input_zyx_conv{our_idx}"
        _put_conv(sd, f"input_zyx.{conv_i}", params[name])
        _put_bn(
            sd,
            f"input_zyx.{bn_i}",
            params[f"input_zyx_bn{our_idx}"],
            stats[f"input_zyx_bn{our_idx}"],
        )
    for i in range(_count(params, r"msrb_layer_(\d+)$")):
        _put_msrb(sd, f"msrb_layer.{i}", params[f"msrb_layer_{i}"], stats[f"msrb_layer_{i}"])
    _put_conv(sd, "output.0", params["output_conv"])
    return sd


def export_tpsf_net(variables: Dict[str, dict]) -> dict:
    params = variables["params"]
    sd: dict = {}
    for our_idx, torch_idx in enumerate([1, 3, 5, 7]):
        linear = params[f"mlp_{our_idx}"]["linear"]
        sd[f"MLP_layer.{torch_idx}.weight"] = _t(np.asarray(linear["kernel"]).T)
        sd[f"MLP_layer.{torch_idx}.bias"] = _t(linear["bias"])
    return sd


_EXPORTERS = {
    "tactileSR": export_tactile_sr,
    "tactileSRCNN": export_tactile_srcnn,
    "tPSFNet": export_tpsf_net,
}


def export_checkpoint_file(
    ckpt_path: str, pth_path: str, arch: str = "tactileSR"
) -> str:
    """One-shot reverse migration: our msgpack ``.ckpt`` bundle -> a torch
    ``.pth`` holding a ``model`` state_dict entry — the shape the
    reference's *model-loading* paths read (``model_param_init`` trunk
    transfer, tactileSRSeqs_train.py:43-59, and the strict=False model load
    inside ``Trainer.load_checkpoint``).  Full *resume* state (optimizer,
    scheduler, metric storage — torch-object pickles the reference
    unpickles by its own class paths) is framework-specific and is NOT
    exported; ``num_gpus``/``epoch`` are included for completeness but a
    reference resume also needs the missing keys."""
    import torch

    from ..runtime.checkpoint import load_checkpoint_file

    bundle = load_checkpoint_file(ckpt_path)
    sd = _EXPORTERS[arch](bundle["model"])
    torch.save(
        {
            "model": sd,
            "num_gpus": int(bundle.get("num_devices", 1)),
            "epoch": int(bundle.get("epoch", 0)),
            "exported_from": ckpt_path,
        },
        pth_path,
    )
    logger.info("exported %s (%s) -> %s", ckpt_path, arch, pth_path)
    return pth_path


def _cli():
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m tactilesr_tpu.compat.export_torch",
        description="Export a .ckpt bundle to a reference-loadable torch .pth",
    )
    p.add_argument("ckpt")
    p.add_argument("pth")
    p.add_argument("--arch", choices=sorted(_EXPORTERS), default="tactileSR")
    args = p.parse_args()
    export_checkpoint_file(args.ckpt, args.pth, arch=args.arch)


if __name__ == "__main__":
    _cli()
