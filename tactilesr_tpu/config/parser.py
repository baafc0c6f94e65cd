"""YAML-over-argparse config parsing.

Capability parity with the reference's ConfigArgumentParser + save_args
(cpu/config_parser.py:11-65): an argparse.ArgumentParser whose defaults can
be overridden by a ``-c/--config`` YAML file (CLI flags still win), plus a
rank-0 YAML dump of the final namespace.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

__all__ = ["ConfigArgumentParser", "save_args", "add_config_args", "apply_overrides"]

logger = logging.getLogger("tactilesr_tpu")


class ConfigArgumentParser(argparse.ArgumentParser):
    """argparse with YAML-file defaults injection via ``-c/--config``."""

    def __init__(self, *args, **kwargs):
        self.config_parser = argparse.ArgumentParser(add_help=False)
        self.config_parser.add_argument(
            "-c",
            "--config",
            default=None,
            metavar="FILE",
            help="where to load YAML configuration",
        )
        self.option_names = []
        super().__init__(*args, parents=[self.config_parser], **kwargs)

    def add_argument(self, *args, **kwargs):
        arg = super().add_argument(*args, **kwargs)
        self.option_names.append(arg.dest)
        return arg

    def parse_args(self, args=None):
        res, remaining = self.config_parser.parse_known_args(args)
        if res.config is not None:
            import yaml

            with open(res.config) as f:
                config_vars = yaml.safe_load(f) or {}
            unknown = set(config_vars) - set(self.option_names)
            if unknown:
                self.error(f"unknown keys in config file: {sorted(unknown)}")
            self.set_defaults(**config_vars)
        return super().parse_args(remaining)


def add_config_args(parser: argparse.ArgumentParser, config: dict) -> None:
    """Declare one CLI flag per scalar config key (so both ``--key value``
    and ``-c overrides.yaml`` can override the defaults)."""
    for key, val in config.items():
        if isinstance(val, bool):
            parser.add_argument(f"--{key}", type=lambda s: s.lower() in ("1", "true", "yes"), default=None)
        elif isinstance(val, (int, float, str)):
            parser.add_argument(f"--{key}", type=type(val), default=None)


def apply_overrides(config: dict, args: argparse.Namespace) -> dict:
    """Overlay non-None parsed flags onto a config dict copy."""
    out = dict(config)
    for key in out:
        override = getattr(args, key, None)
        if override is not None:
            out[key] = override
    return out


def save_args(
    args: argparse.Namespace,
    filepath: str,
    excluded_fields: Optional[list] = None,
    process_index: int = 0,
) -> None:
    """Dump the parsed namespace to YAML on process 0."""
    if process_index != 0:
        return
    assert filepath.endswith(".yaml")
    import yaml

    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    save_dict = {
        k: v for k, v in vars(args).items() if k not in set(excluded_fields or ["config"])
    }
    with open(filepath, "w") as f:
        yaml.dump(save_dict, f)
    logger.info("Args are saved to %s", filepath)
