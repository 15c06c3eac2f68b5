"""LR schedules (reference models/lr_scheduler.py:6-96) as optax-compatible
schedule functions (iteration -> multiplier), plus warmup
(base_model.py:181-202).

Each multiplier is dual-path: exact float64 Python math for concrete steps
(the golden tests compare against torch at 1e-6), and a jnp closed form when
the step is a tracer — optax passes the traced opt-state count inside the
jitted train step, where `int(step)`/`bisect` would raise
ConcretizationTypeError."""
import math
from bisect import bisect_right
from typing import Sequence

import numpy as np


def _is_tracer(step):
    import jax
    return isinstance(step, jax.core.Tracer)


def multi_step_restart_lr(milestones: Sequence[int], gamma: float = 0.1,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1,)):
    milestones = sorted(milestones)
    restarts = list(restarts)
    assert len(restarts) == len(restart_weights)
    ms_a = np.asarray(milestones, np.int32)
    order = np.argsort(np.asarray(restarts))
    rs_a = np.asarray(restarts, np.int32)[order]
    ws_a = np.asarray(restart_weights, np.float32)[order]

    def multiplier(step):
        if _is_tracer(step):
            import jax.numpy as jnp
            hit = step >= rs_a
            idx = jnp.maximum(jnp.sum(hit) - 1, 0)
            weight = jnp.where(jnp.any(hit), jnp.asarray(ws_a)[idx], 1.0)
            last_restart = jnp.where(jnp.any(hit), jnp.asarray(rs_a)[idx], 0)
            n = (jnp.sum(ms_a <= step) - jnp.sum(ms_a <= last_restart)
                 ).astype(jnp.float32)
            return weight * gamma ** n
        # cumulative: torch applies gamma at each milestone to the running lr;
        # equivalent closed form with restart reset. Iterate in sorted-restart
        # order (rs_a/ws_a) so the MOST RECENT restart <= step wins even for
        # unsorted input — the tracer path above uses the same sorted arrays,
        # and the two paths must agree (the in-jit schedule is the applied LR,
        # the concrete path is the logged one).
        step = int(step)
        last_restart = 0
        weight = 1.0
        for r, w in zip(rs_a.tolist(), ws_a.tolist()):
            if step >= r:
                last_restart, weight = r, float(w)
        n = bisect_right(milestones, step) - bisect_right(milestones, last_restart)
        return weight * gamma ** n

    return multiplier


def cosine_annealing_restart_lr(periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0.0, base_lr: float = 1.0):
    """Multiplier version of CosineAnnealingRestartLR (lr_scheduler.py:47-96)."""
    assert len(periods) == len(restart_weights)
    cum = [sum(periods[:i + 1]) for i in range(len(periods))]
    cum_a = np.asarray(cum, np.int32)
    periods_a = np.asarray(periods, np.float32)
    ws_a = np.asarray(restart_weights, np.float32)
    floor = eta_min / base_lr

    def multiplier(step):
        if _is_tracer(step):
            import jax.numpy as jnp
            le = step <= cum_a
            idx = jnp.where(jnp.any(le), jnp.argmax(le), len(cum) - 1)
            nearest = jnp.where(idx == 0, 0,
                                jnp.asarray(cum_a)[jnp.maximum(idx - 1, 0)])
            period = jnp.asarray(periods_a)[idx]
            w = jnp.asarray(ws_a)[idx]
            return floor + w * 0.5 * (1 - floor) * (
                1 + jnp.cos(jnp.pi * ((step - nearest) / period)))
        step = int(step)
        # boundary step belongs to the ending period (lr_scheduler.py:84-88)
        idx = next((i for i, c in enumerate(cum) if step <= c), len(cum) - 1)
        nearest_restart = 0 if idx == 0 else cum[idx - 1]
        period = periods[idx]
        w = restart_weights[idx]
        return floor + w * 0.5 * (1 - floor) * (
            1 + math.cos(math.pi * ((step - nearest_restart) / period)))

    return multiplier


def with_warmup(multiplier, warmup_iter: int = -1):
    """Linear LR warmup over warmup_iter steps (base_model.py:181-202)."""
    if warmup_iter <= 0:
        return multiplier

    def sched(step):
        if _is_tracer(step):
            import jax.numpy as jnp
            return jnp.where(step < warmup_iter,
                             multiplier(step) * (step + 1) / warmup_iter,
                             multiplier(step))
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
