"""Tensor-parallel parameter shardings over a mesh 'model' axis.

The reference has no tensor parallelism (SURVEY.md §2.10: DDP only); this is
the TPU-native extension: Megatron-style column/row splits of the
matmul-heavy leaves (token-transformer q/k/v + MLP up projections sharded on
the output dim, out/down projections on the input dim), expressed purely as
GSPMD param shardings — XLA inserts the all-reduces on the activation path.
Conv/norm leaves stay replicated (KEEP's convs are memory-bound; sharding
them buys nothing at these sizes and splits GroupNorm groups).

Works with any pytree: rules are regex → PartitionSpec templates applied to
path strings like 'ft_layers/0/self_attn/q_w'. A rule only applies when the
sharded dimension divides evenly by the mesh axis size; otherwise the leaf
falls back to replicated (never a crash on odd head counts).
"""
import re
from typing import Dict, Sequence, Tuple

import numpy as np

__all__ = ["DEFAULT_TP_RULES", "leaf_path", "tp_param_specs",
           "tp_param_shardings", "shard_params"]


# (path regex, PartitionSpec template) — template entries are None or the
# mesh axis name; the axis lands on that dimension of the leaf.
# Column-parallel (shard the OUTPUT dim, axis 1 of a (in, out) kernel):
#   q/k/v projections, MLP up projection, attention to_q/to_k/to_v.
# Row-parallel (shard the INPUT dim, axis 0): out projections, MLP down.
# Biases of column-parallel layers shard on their only dim; row-parallel
# biases replicate (they add after the implicit all-reduce).
DEFAULT_TP_RULES: Sequence[Tuple[str, Tuple]] = (
    # 9-layer token transformer (TransformerSALayer, keep_arch.py:385-439)
    (r"ft_layers/\d+/self_attn/[qkv]_w$", (None, "model")),
    (r"ft_layers/\d+/self_attn/[qkv]_b$", ("model",)),
    (r"ft_layers/\d+/self_attn/out_w$", ("model", None)),
    (r"ft_layers/\d+/linear1/w$", (None, "model")),
    (r"ft_layers/\d+/linear1/b$", ("model",)),
    (r"ft_layers/\d+/linear2/w$", ("model", None)),
    # Kalman gain estimator's BasicTransformerBlocks + CFA cross-frame
    # attention (diffusers-style to_q/to_k/to_v/to_out naming)
    (r"(kalman_filter|cfa)/.*/to_[qkv]/w$", (None, "model")),
    (r"(kalman_filter|cfa)/.*/to_out/\[?0\]?/w$", ("model", None)),
    (r"(kalman_filter|cfa)/.*/ff/net/\[?0\]?/proj/w$", (None, "model")),
    (r"(kalman_filter|cfa)/.*/ff/net/\[?0\]?/proj/b$", ("model",)),
    (r"(kalman_filter|cfa)/.*/ff/net/\[?2\]?/w$", ("model", None)),
)


def leaf_path(key_path) -> str:
    """'ft_layers/0/self_attn/q_w' from a tree_flatten_with_path key."""
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tp_param_specs(params, axis_size: int, axis_name: str = "model",
                   rules: Sequence[Tuple[str, Tuple]] = DEFAULT_TP_RULES):
    """Pytree of PartitionSpec matching ``params``. Leaves whose rule
    dimension is not divisible by ``axis_size`` replicate."""
    import jax
    from jax.sharding import PartitionSpec as P

    compiled = [(re.compile(pat), tpl) for pat, tpl in rules]

    def spec_for(key_path, leaf):
        path = leaf_path(key_path)
        shape = np.shape(leaf)
        for pat, tpl in compiled:
            if pat.search(path):
                spec = [None] * len(shape)
                ok = True
                for dim, ax in enumerate(tpl):
                    if ax is None:
                        continue
                    if dim >= len(shape) or shape[dim] % axis_size:
                        ok = False
                        break
                    spec[dim] = axis_name if ax == "model" else ax
                if ok:
                    return P(*spec)
                return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_param_shardings(params, mesh, axis_name: str = "model",
                       rules=DEFAULT_TP_RULES):
    """Pytree of NamedSharding for ``params`` on ``mesh``."""
    import jax
    from jax.sharding import NamedSharding
    specs = tp_param_specs(params, int(mesh.shape[axis_name]),
                           axis_name, rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)


def shard_params(params, mesh, axis_name: str = "model",
                 rules=DEFAULT_TP_RULES):
    """device_put the param tree with tensor-parallel shardings."""
    import jax
    return jax.device_put(params, tp_param_shardings(params, mesh,
                                                     axis_name, rules))
