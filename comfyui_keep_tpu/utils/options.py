"""YAML experiment config system (reference wm_basicsr/utils/options.py:13-218):
ordered YAML load, `--force_yml a:b=v` deep overrides with typed parsing,
debug-mode frequency rewrites, is_train path layout.
"""
import argparse
import os
import random
from collections import OrderedDict
from typing import Any, Dict, Optional

import yaml


def ordered_yaml():
    try:
        from yaml import CDumper as Dumper, CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(
        yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, dict_constructor)
    return Loader, Dumper


def yaml_load(f: str):
    if os.path.isfile(f):
        with open(f) as fh:
            return yaml.load(fh, Loader=ordered_yaml()[0])
    return yaml.load(f, Loader=ordered_yaml()[0])


def _postprocess_yml_value(value: str) -> Any:
    """Typed parsing of CLI override values (options.py:74-95)."""
    if value == "~" or value.lower() == "none":
        return None
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    if value.startswith("[") or value.startswith("{"):
        import ast
        return ast.literal_eval(value)
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    return value


def apply_force_yml(opt: Dict, overrides):
    """`train:ema_decay=0.999`-style deep overrides."""
    for entry in overrides or ():
        keys, value = entry.split("=", 1)
        value = _postprocess_yml_value(value)
        node = opt
        parts = keys.split(":")
        for k in parts[:-1]:
            node = node[k]
        node[parts[-1]] = value
    return opt


def set_debug(opt: Dict):
    """debug mode rewrites frequencies (options.py: debug handling)."""
    if "train" in opt:
        opt["train"]["total_iter"] = min(opt["train"].get("total_iter", 8), 8)
    if "logger" in opt:
        opt["logger"]["print_freq"] = 1
        opt["logger"]["save_checkpoint_freq"] = 8
    if "val" in opt:
        opt["val"]["val_freq"] = 8
    return opt


def pin_platform_from_env():
    """Make `JAX_PLATFORMS=cpu python tools/train.py ...` effective even on
    images whose sitecustomize force-registers an accelerator plugin at
    interpreter start (where the env var alone is applied too late and the
    first backend init pays the accelerator handshake anyway). Re-asserting
    the env value through jax.config before any backend init restores the
    documented env-var semantics; a no-op everywhere else."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def parse_options(root_path: str = ".", is_train: bool = True, args=None):
    pin_platform_from_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="config YAML path")
    parser.add_argument("--launcher", choices=["none", "jax"], default="none")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--force_yml", nargs="+", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parsed = parser.parse_args(args)

    opt = yaml_load(parsed.opt)
    apply_force_yml(opt, parsed.force_yml)
    opt["auto_resume"] = parsed.auto_resume
    opt["is_train"] = is_train
    if parsed.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]
        set_debug(opt)

    seed = parsed.seed if parsed.seed is not None else opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed

    if parsed.launcher == "jax":
        import jax
        jax.distributed.initialize()

    # path layout
    name = opt["name"]
    exp_root = os.path.join(root_path, "experiments" if is_train else "results", name)
    opt.setdefault("path", {})
    opt["path"].update({
        "experiments_root": exp_root,
        "models": os.path.join(exp_root, "models"),
        "training_states": os.path.join(exp_root, "training_states"),
        "log": exp_root,
        "visualization": os.path.join(exp_root, "visualization"),
    })
    return opt, parsed
