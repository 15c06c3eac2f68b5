"""GMFlow training harness pieces (reference archs/gmflow/loss.py +
evaluate.py metrics): multi-scale EPE flow loss with validity masking and the
standard EPE / out-of-X error metrics."""
from typing import Optional, Sequence

import jax.numpy as jnp


def flow_loss_func(flow_preds: Sequence, flow_gt, valid=None,
                   gamma: float = 0.9, max_flow: float = 400.0):
    """Sequence-weighted multi-scale EPE (gmflow loss.py): later predictions
    weighted by gamma^(n-1-i); pixels with |gt| > max_flow excluded.

    flow_preds: list of (B, H, W, 2); flow_gt: (B, H, W, 2);
    valid: (B, H, W) or None.
    """
    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    if valid is None:
        valid = jnp.ones_like(mag)
    valid = (valid >= 0.5) & (mag < max_flow)
    n = len(flow_preds)
    total = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - 1 - i)
        err = jnp.abs(pred - flow_gt).sum(axis=-1)
        total = total + w * jnp.sum(valid * err) / jnp.maximum(
            jnp.sum(valid), 1.0)

    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    epe_v = jnp.where(valid, epe, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    metrics = {
        "epe": jnp.sum(epe_v) / denom,
        "1px": jnp.sum(valid * (epe > 1.0)) / denom,
        "3px": jnp.sum(valid * (epe > 3.0)) / denom,
        "5px": jnp.sum(valid * (epe > 5.0)) / denom,
    }
    return total, metrics


def end_point_error(flow_pred, flow_gt, valid=None):
    """Plain EPE metric (evaluate.py convention)."""
    epe = jnp.sqrt(jnp.sum((flow_pred - flow_gt) ** 2, axis=-1))
    if valid is not None:
        return jnp.sum(jnp.where(valid >= 0.5, epe, 0.0)) / jnp.maximum(
            jnp.sum(valid >= 0.5), 1.0)
    return epe.mean()
