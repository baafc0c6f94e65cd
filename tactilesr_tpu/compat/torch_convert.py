"""Reference-checkpoint migration: torch ``.pth`` state dicts -> our
variables / ``.ckpt`` bundles.

Lets a user of the reference framework bring their trained weights along.
Key layout being mapped (reference model definitions):
- TactileSR (model/tactileSR_model.py:18-98): Sequential indices
  ``inputLayer_pattern_list.{s}.{1,2,4,5}``, ``inputContact_layer.{0,1}``,
  ``patternFeatureExtra_layer.{i}.conv_*``, ``forceFeatureExtra_layer.{i}``,
  ``output_layer.{0,2}``, ``input_layer_force.1``.
- TactileSRCNN (:101-153): ``input_zyx.{0,1,3,4,6,7}``, ``msrb_layer.{i}``,
  ``output.0``.
- tPSFNet (tPSFNet.py:26-36): ``MLP_layer.{1,3,5,7}``.

Tensor layout conversions: conv weights torch (O,I,kh,kw) -> flax
(kh,kw,I,O); linear weights torch (O,I) -> flax (I,O); BatchNorm
weight/bias -> scale/bias params, running_mean/var -> batch_stats.

Loading ``.pth`` files requires torch (CPU build is fine); conversion is a
host-side one-shot, nothing here touches the TPU path.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

__all__ = [
    "convert_tactile_sr",
    "convert_tactile_srcnn",
    "convert_tpsf_net",
    "load_torch_state_dict",
    "convert_checkpoint_file",
]

logger = logging.getLogger("tactilesr_tpu")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # ALWAYS copy: torch state_dicts hold views of live parameters, and a
    # zero-copy numpy->jax alias would let subsequent in-place optimizer
    # steps mutate the converted weights under us.
    return np.array(t, copy=True)


def _conv_kernel(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear_kernel(t) -> np.ndarray:
    return _np(t).T


def _take_conv(sd: dict, prefix: str, bias: bool):
    out = {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return {"conv": out}


def _take_bn(sd: dict, prefix: str) -> Tuple[dict, dict]:
    params = {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _msrb(sd: dict, prefix: str) -> Tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    for name in ("conv_3_1", "conv_5_1", "conv_3_2", "conv_5_2"):
        params[name] = _take_conv(sd, f"{prefix}.{name}.0", bias=True)
        bn_p, bn_s = _take_bn(sd, f"{prefix}.{name}.1")
        params[f"{name}_bn"] = bn_p
        stats[f"{name}_bn"] = bn_s
    params["confusion"] = _take_conv(sd, f"{prefix}.confusion", bias=True)
    return params, stats


def _res_block(sd: dict, prefix: str) -> dict:
    return {
        "conv1": _take_conv(sd, f"{prefix}.conv1", bias=True),
        "conv2": _take_conv(sd, f"{prefix}.conv2", bias=True),
    }


def convert_tactile_sr(
    sd: dict, seqs_cnt: int = 1, pattern_layers: int = 6, force_layers: int = 1
) -> Dict[str, dict]:
    """Reference TactileSR state_dict -> {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}

    for s in range(seqs_cnt):
        base = f"inputLayer_pattern_list.{s}"
        for our_idx, (conv_i, bn_i) in enumerate([(1, 2), (4, 5)]):
            name = f"inputLayer_pattern_{s}_conv{our_idx}"
            params[name] = _take_conv(sd, f"{base}.{conv_i}", bias=False)
            bn_p, bn_s = _take_bn(sd, f"{base}.{bn_i}")
            params[f"{name}_bn"] = bn_p
            stats[f"{name}_bn"] = bn_s

    params["inputContact_layer"] = _take_conv(sd, "inputContact_layer.0", bias=False)
    bn_p, bn_s = _take_bn(sd, "inputContact_layer.1")
    params["inputContact_layer_bn"] = bn_p
    stats["inputContact_layer_bn"] = bn_s

    for i in range(pattern_layers):
        p, st = _msrb(sd, f"patternFeatureExtra_layer.{i}")
        params[f"patternFeatureExtra_layer_{i}"] = p
        stats[f"patternFeatureExtra_layer_{i}"] = st

    params["input_layer_force"] = _take_conv(sd, "input_layer_force.1", bias=False)
    for i in range(force_layers):
        params[f"forceFeatureExtra_layer_{i}"] = _res_block(
            sd, f"forceFeatureExtra_layer.{i}"
        )

    params["output_conv0"] = _take_conv(sd, "output_layer.0", bias=False)
    params["output_conv1"] = _take_conv(sd, "output_layer.2", bias=False)
    return {"params": params, "batch_stats": stats}


def convert_tactile_srcnn(sd: dict, msrb_cnt: int = 6) -> Dict[str, dict]:
    params: dict = {}
    stats: dict = {}
    for our_idx, (conv_i, bn_i) in enumerate([(0, 1), (3, 4), (6, 7)]):
        name = f"input_zyx_conv{our_idx}"
        params[name] = _take_conv(sd, f"input_zyx.{conv_i}", bias=False)
        bn_p, bn_s = _take_bn(sd, f"input_zyx.{bn_i}")
        params[f"input_zyx_bn{our_idx}"] = bn_p
        stats[f"input_zyx_bn{our_idx}"] = bn_s
    for i in range(msrb_cnt):
        p, st = _msrb(sd, f"msrb_layer.{i}")
        params[f"msrb_layer_{i}"] = p
        stats[f"msrb_layer_{i}"] = st
    params["output_conv"] = _take_conv(sd, "output.0", bias=False)
    return {"params": params, "batch_stats": stats}


def convert_tpsf_net(sd: dict) -> Dict[str, dict]:
    params: dict = {}
    for our_idx, torch_idx in enumerate([1, 3, 5, 7]):
        params[f"mlp_{our_idx}"] = {
            "linear": {
                "kernel": _linear_kernel(sd[f"MLP_layer.{torch_idx}.weight"]),
                "bias": _np(sd[f"MLP_layer.{torch_idx}.bias"]),
            }
        }
    return {"params": params, "batch_stats": {}}


def load_torch_state_dict(path: str) -> dict:
    """Load a reference ``.pth`` (a bare state_dict, or the trainer bundle
    with a 'model' entry holding either a state_dict or a whole pickled
    ``nn.Module`` -- ``torch.save({'model': model, ...})`` is a common
    trainer pattern)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        model = obj["model"]
        if not isinstance(model, dict) and hasattr(model, "state_dict"):
            return model.state_dict()
        if isinstance(model, dict) and all(
            hasattr(v, "shape") or isinstance(v, dict) for v in model.values()
        ):
            return model
    if not isinstance(obj, dict) and hasattr(obj, "state_dict"):
        # bare torch.save(model, path) -- the unwrapped twin of the
        # {'model': model} bundle handled above
        return obj.state_dict()
    return obj


class _TrackedStateDict(dict):
    """State_dict wrapper recording which keys a converter consumed, so an
    architecture mismatch (converter silently skipping trained modules)
    fails loud instead of writing a truncated-but-valid-looking bundle."""

    def __init__(self, sd: dict):
        super().__init__(sd)
        self.used: set = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)


def _check_all_keys_consumed(tracked: "_TrackedStateDict", arch: str) -> None:
    # BN's num_batches_tracked has no equivalent here (we keep torch's
    # momentum-form running stats) -- expected leftover, not a mismatch
    leftover = sorted(
        k
        for k in tracked
        if k not in tracked.used and not k.endswith("num_batches_tracked")
    )
    if leftover:
        raise ValueError(
            f"{len(leftover)} checkpoint parameter(s) were not consumed by "
            f"the declared architecture ({arch}): {leftover[:8]}"
            f"{' ...' if len(leftover) > 8 else ''} -- do seqs_cnt/"
            "pattern_layers/force_layers match the trained model?"
        )


_CONVERTERS = {
    "tactileSR": convert_tactile_sr,
    "tactileSRCNN": convert_tactile_srcnn,
    "tPSFNet": convert_tpsf_net,
}


def convert_checkpoint_file(
    pth_path: str, ckpt_path: str, arch: str = "tactileSR", **arch_kwargs
) -> str:
    """One-shot migration: reference .pth -> our msgpack .ckpt bundle."""
    from ..runtime.checkpoint import save_checkpoint_file

    sd = _TrackedStateDict(load_torch_state_dict(pth_path))
    model = _CONVERTERS[arch](sd, **arch_kwargs)
    _check_all_keys_consumed(sd, arch)
    bundle = {
        "num_devices": 1,
        "num_processes": 1,
        "model": model,
        "metric_storage": {"window_size": 20, "smooth": {}, "latest_iter": {}, "history": {}},
        "converted_from": pth_path,
        "epoch": -1,
    }
    save_checkpoint_file(ckpt_path, bundle)
    logger.info("converted %s (%s) -> %s", pth_path, arch, ckpt_path)
    return ckpt_path


def _cli():
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m tactilesr_tpu.compat.torch_convert",
        description="Convert a reference torch .pth checkpoint to a .ckpt bundle",
    )
    p.add_argument("pth")
    p.add_argument("ckpt")
    p.add_argument("--arch", choices=sorted(_CONVERTERS), default="tactileSR")
    p.add_argument("--seqs-cnt", type=int, default=1)
    p.add_argument("--pattern-layers", type=int, default=6)
    p.add_argument("--force-layers", type=int, default=1)
    args = p.parse_args()
    kwargs = {}
    if args.arch == "tactileSR":
        kwargs = dict(
            seqs_cnt=args.seqs_cnt,
            pattern_layers=args.pattern_layers,
            force_layers=args.force_layers,
        )
    convert_checkpoint_file(args.pth, args.ckpt, arch=args.arch, **kwargs)


if __name__ == "__main__":
    _cli()
