"""LR schedules (reference models/lr_scheduler.py:6-96) as optax-compatible
schedule functions (iteration -> multiplier), plus warmup
(base_model.py:181-202)."""
import math
from bisect import bisect_right
from typing import Sequence


def multi_step_restart_lr(milestones: Sequence[int], gamma: float = 0.1,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1,)):
    milestones = sorted(milestones)
    restarts = list(restarts)
    assert len(restarts) == len(restart_weights)

    def schedule(step):
        step = int(step)
        if step in restarts:
            return restart_weights[restarts.index(step)]
        return gamma ** bisect_right(milestones, step)

    def multiplier(step):
        # cumulative: torch applies gamma at each milestone to the running lr;
        # equivalent closed form with restart reset
        step = int(step)
        last_restart = 0
        weight = 1.0
        for r, w in zip(restarts, restart_weights):
            if step >= r:
                last_restart, weight = r, w
        n = bisect_right(milestones, step) - bisect_right(milestones, last_restart)
        return weight * gamma ** n

    return multiplier


def cosine_annealing_restart_lr(periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0.0, base_lr: float = 1.0):
    """Multiplier version of CosineAnnealingRestartLR (lr_scheduler.py:47-96)."""
    assert len(periods) == len(restart_weights)
    cum = [sum(periods[:i + 1]) for i in range(len(periods))]

    def multiplier(step):
        step = int(step)
        # boundary step belongs to the ending period (lr_scheduler.py:84-88)
        idx = next((i for i, c in enumerate(cum) if step <= c), len(cum) - 1)
        nearest_restart = 0 if idx == 0 else cum[idx - 1]
        period = periods[idx]
        w = restart_weights[idx]
        return eta_min / base_lr + w * 0.5 * (1 - eta_min / base_lr) * (
            1 + math.cos(math.pi * ((step - nearest_restart) / period)))

    return multiplier


def with_warmup(multiplier, warmup_iter: int = -1):
    """Linear LR warmup over warmup_iter steps (base_model.py:181-202)."""
    if warmup_iter <= 0:
        return multiplier

    def sched(step):
        if step < warmup_iter:
            return multiplier(step) * (step + 1) / warmup_iter
        return multiplier(step)

    return sched


def build_scheduler(opt: dict):
    opt = dict(opt)
    t = opt.pop("type")
    if t == "MultiStepLR" or t == "MultiStepRestartLR":
        return multi_step_restart_lr(**opt)
    if t == "CosineAnnealingRestartLR":
        return cosine_annealing_restart_lr(**opt)
    raise NotImplementedError(f"scheduler {t}")
