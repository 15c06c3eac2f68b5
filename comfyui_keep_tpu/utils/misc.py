"""Misc utilities (reference wm_basicsr/utils/misc.py:11-133)."""
import os
import random
import time
from typing import Optional

import numpy as np


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def get_time_str():
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str):
    """Rename an existing dir with a timestamp then mkdir (misc.py)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_time_str()
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt):
    path_opt = dict(opt["path"])
    if opt.get("is_train"):
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root", path_opt.get("log", ".")))
    for key, path in path_opt.items():
        if "pretrain" in key or "resume" in key or path is None:
            continue
        os.makedirs(path, exist_ok=True)


def check_resume(opt, resume_iter: int):
    """Pair resume state with network checkpoints (misc.py:94-125)."""
    if opt["path"].get("resume_state"):
        net_path = os.path.join(opt["path"]["models"], f"net_g_{resume_iter}.npz")
        if os.path.exists(net_path):
            opt["path"]["pretrain_network_g"] = net_path


def sizeof_fmt(size: float, suffix="B") -> str:
    for unit in ("", "K", "M", "G", "T", "P", "E", "Z"):
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"
