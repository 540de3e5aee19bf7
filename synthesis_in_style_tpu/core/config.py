"""Config system: YAML/JSON configs + argparse merge + checkpoint-relative
discovery. Mirrors reference utils/config.py semantics:

* `merge_config_and_args` — argparse values override config keys when set
  (utils/config.py:66-70).
* checkpoint-relative recovery: the run layout is
  `<run_dir>/{config/{config.json,args.json}, checkpoints/...}` so a config is
  rediscoverable from a checkpoint path as `<ckpt>/../../config/`
  (utils/config.py:26-45).
* module-global `debug` flag (reference global_config.py:1).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import yaml


class GlobalConfig:
    debug: bool = False


global_config = GlobalConfig()


def load_yaml_config(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def load_json_config(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def load_config_file(path: Union[str, Path]) -> Dict[str, Any]:
    path = Path(path)
    if path.suffix in (".yaml", ".yml"):
        return load_yaml_config(path)
    return load_json_config(path)


def merge_config_and_args(
    config: Dict[str, Any], args: argparse.Namespace
) -> Dict[str, Any]:
    """Args win over config keys when the arg value is not None
    (reference utils/config.py:66-70)."""
    merged = dict(config)
    for key, value in vars(args).items():
        if value is not None:
            merged[key] = value
    return merged


def get_config_dir_from_checkpoint(checkpoint_path: Union[str, Path]) -> Path:
    """`<run_dir>/checkpoints/ckpt-X` -> `<run_dir>/config`
    (reference utils/config.py:26-45)."""
    return Path(checkpoint_path).resolve().parent.parent / "config"


def load_config_from_checkpoint(
    checkpoint_path: Union[str, Path],
    original_config_path: Optional[Union[str, Path]] = None,
) -> Dict[str, Any]:
    """Recover the training config for a checkpoint; fall back to an explicit
    `-op/--original-config-path` (reference train.py:155-159)."""
    config_dir = get_config_dir_from_checkpoint(checkpoint_path)
    candidates = [config_dir / "config.json", config_dir / "config.yaml"]
    for cand in candidates:
        if cand.exists():
            config = load_config_file(cand)
            args_file = config_dir / "args.json"
            if args_file.exists():
                stored_args = load_json_config(args_file)
                config = {**stored_args, **config}
            return config
    if original_config_path is not None:
        return load_config_file(original_config_path)
    raise FileNotFoundError(
        f"no config found at {config_dir} and no --original-config-path given"
    )


def save_run_config(
    log_dir: Union[str, Path],
    config: Dict[str, Any],
    args: Optional[argparse.Namespace] = None,
):
    """Co-persist config next to checkpoints for later rediscovery."""
    config_dir = Path(log_dir) / "config"
    config_dir.mkdir(parents=True, exist_ok=True)
    with open(config_dir / "config.json", "w") as f:
        json.dump(config, f, indent=2, default=str)
    if args is not None:
        with open(config_dir / "args.json", "w") as f:
            json.dump(vars(args), f, indent=2, default=str)
