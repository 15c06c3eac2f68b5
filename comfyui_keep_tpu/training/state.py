"""Training state: params / optimizer / EMA / bookkeeping, with
checkpoint-save-resume (reference base_model.py:75-82, 207-365).

Serialization: orbax when available, .npz flat fallback — both formats carry
`params` and `params_ema` keys like the reference .pth convention.
"""
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np

from comfyui_keep_tpu.utils.checkpoint import save_npz, load_npz


def ema_update(ema_params, params, decay: float):
    """model_ema (base_model.py:75-82): ema = ema*decay + p*(1-decay)."""
    import jax
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay),
                        ema_params, params)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any = None
    epoch: int = 0
    iter: int = 0
    resume_extra: Any = None  # set by resume(): trainer extra state (GAN d)

    def save(self, net_dir: str, state_dir: str, current_iter: int,
             retry: int = 3, extra=None):
        """Networks + training state, with IO retry (base_model.py:237-252).

        `extra` is a trainer-owned pytree stored alongside the optimizer
        state — the GAN trainers pass {d_params, d_opt_state} so a resumed
        adversarial run keeps its trained discriminator (the reference saves
        net_d_<iter>.pth + its optimizer in the .state file,
        base_model.py:207-252)."""
        import jax
        os.makedirs(net_dir, exist_ok=True)
        os.makedirs(state_dir, exist_ok=True)
        host = jax.tree.map(np.asarray, {"params": self.params})
        if self.ema_params is not None:
            host["params_ema"] = jax.tree.map(np.asarray, self.ema_params)
        net_path = os.path.join(net_dir, f"net_g_{current_iter}.npz")
        state_path = os.path.join(state_dir, f"{current_iter}.state.npz")
        state_tree = {
            "opt_state": jax.tree.map(np.asarray, _fil(self.opt_state)),
            "meta": {"epoch": np.asarray(self.epoch),
                     "iter": np.asarray(current_iter)},
        }
        if extra is not None:
            state_tree["extra"] = jax.tree.map(np.asarray, extra)
        for attempt in range(retry):
            try:
                save_npz(net_path, host)
                save_npz(state_path, state_tree)
                return net_path, state_path
            except IOError:  # pragma: no cover
                if attempt == retry - 1:
                    raise
                time.sleep(1)

    @staticmethod
    def latest_state(state_dir: str) -> Optional[str]:
        """auto_resume scan (train.py:68-88)."""
        if not os.path.isdir(state_dir):
            return None
        states = [f for f in os.listdir(state_dir) if f.endswith(".state.npz")]
        if not states:
            return None
        iters = [int(f.split(".")[0]) for f in states]
        return os.path.join(state_dir, f"{max(iters)}.state.npz")

    def resume(self, state_path: str):
        data = load_npz(state_path)
        self.epoch = int(np.asarray(data["meta"]["epoch"]))
        self.iter = int(np.asarray(data["meta"]["iter"]))
        # trainer-owned extra state (GAN discriminator + its optimizer);
        # train_pipeline hands it to trainer.load_extra_state after resume
        self.resume_extra = data.get("extra")
        return data.get("opt_state")

    def resume_optimizer(self, opt_state_data):
        """Graft saved optimizer moments back onto the live optax state
        (the reference's resume_training restores optimizers + schedulers,
        wm_basicsr/models/base_model.py resume_training; without this a
        resumed Adam restarts its moments from zero)."""
        if opt_state_data is not None and self.opt_state is not None:
            self.opt_state = graft_tree(self.opt_state, opt_state_data)


def graft_tree(node, data, stats=None):
    """Recursively graft `data` (nested dicts/lists from load_npz, where
    tuples/NamedTuples were serialized positionally) onto the structure of
    `node`. Missing/None entries keep the live value; leaf dtypes follow
    the live leaf so optax count scalars stay exact.

    `stats` (optional dict) accumulates {"loaded": n, "kept": n} so callers
    can detect a partial graft — a resume where any array leaf silently kept
    its random init (missing key / shape mismatch) must be surfaced, not
    logged as a clean restore (base_model.py:254-287 warns per key)."""
    import jax.numpy as jnp

    def _keep(n):
        if stats is not None and hasattr(n, "dtype") and np.ndim(n) > 0:
            stats["kept"] = stats.get("kept", 0) + 1
        return n

    if isinstance(node, dict):
        return {k: graft_tree(v, data.get(k) if isinstance(data, dict)
                              else None, stats) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        if isinstance(data, dict):  # _listify keeps sparse indices as dicts
            data = [data.get(str(i)) for i in range(len(node))]
        if not isinstance(data, (list, tuple)):
            data = [None] * len(node)
        data = list(data) + [None] * (len(node) - len(data))
        kids = [graft_tree(v, data[i], stats) for i, v in enumerate(node)]
        if isinstance(node, list):
            return kids
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*kids)
        return tuple(kids)
    if node is None or data is None or isinstance(data, (dict, list)):
        return _keep(node)
    arr = np.asarray(data)
    if not hasattr(node, "dtype") or np.shape(arr) != np.shape(node):
        return _keep(node)
    if stats is not None:
        stats["loaded"] = stats.get("loaded", 0) + 1
    out = jnp.asarray(arr).astype(node.dtype)
    if hasattr(node, "sharding"):  # keep committed (e.g. tp) shardings
        import jax
        out = jax.device_put(out, node.sharding)
    return out


def _fil(tree):
    """Replace non-array leaves (e.g. optax count scalars are arrays already)."""
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_orbax(path: str, tree):
    """Sharded orbax checkpoint (SURVEY §5.4 TPU equivalent of .pth saves)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_orbax(path: str, like=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), like)
    return ckptr.restore(os.path.abspath(path))


def load_network_npz(path: str, prefer_ema: bool = True):
    data = load_npz(path)
    if prefer_ema and "params_ema" in data:
        return data["params_ema"]
    return data.get("params", data)


def build_optimizer(opt: Dict, schedule: Optional[Callable] = None):
    """Optimizer factory (base_model.py:103-120 — Adam/AdamW/Adamax/SGD/
    ASGD/RMSprop/Rprop) on optax."""
    import optax
    opt = dict(opt)
    t = opt.pop("type", "Adam")
    base_lr = opt.pop("lr", 1e-4)
    lr_fn = (lambda step: base_lr * schedule(step)) if schedule else base_lr
    betas = opt.pop("betas", (0.9, 0.999))
    wd = opt.pop("weight_decay", 0.0)
    if t == "Adam":
        tx = optax.adam(lr_fn, b1=betas[0], b2=betas[1])
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif t == "AdamW":
        tx = optax.adamw(lr_fn, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif t == "Adamax":
        tx = optax.adamax(lr_fn, b1=betas[0], b2=betas[1])
    elif t == "SGD":
        tx = optax.sgd(lr_fn, momentum=opt.pop("momentum", 0.0))
    elif t == "ASGD":
        tx = optax.sgd(lr_fn)
    elif t == "RMSprop":
        tx = optax.rmsprop(lr_fn, momentum=opt.pop("momentum", 0.0))
    elif t == "Rprop":
        tx = optax.rprop(base_lr)
    else:
        raise NotImplementedError(f"optimizer {t}")
    return tx


def freeze_mask(params, frozen_prefixes):
    """optax mask marking frozen subtrees (fix_modules semantics,
    keep_arch.py:970-973 / keep_model.py:100-121)."""
    import jax

    def mark(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "frozen" if top in frozen_prefixes else "trainable"

    return jax.tree_util.tree_map_with_path(mark, params)


def masked_optimizer(tx, params, frozen_prefixes):
    import optax
    mask = freeze_mask(params, frozen_prefixes)
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, mask)


def merge_network_params(params, loaded, strict: bool = True):
    """Non-strict network load (base_model.py:254-287): copy leaves from
    `loaded` into the structure of `params`; with strict=False, missing keys
    and size-mismatched tensors are dropped with a warning instead of
    raising. Returns the merged tree."""
    import jax
    from comfyui_keep_tpu.utils.logger import get_root_logger
    logger = get_root_logger()

    flat_p = {jax.tree_util.keystr(kp): (kp, v) for kp, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_l = {jax.tree_util.keystr(kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}

    merged = {}
    for key, (kp, cur) in flat_p.items():
        if key not in flat_l:
            if strict:
                raise KeyError(f"missing key in checkpoint: {key}")
            logger.warning(f"missing key in checkpoint (kept init): {key}")
            merged[key] = cur
            continue
        new = flat_l[key]
        if tuple(np.shape(new)) != tuple(np.shape(cur)):
            if strict:
                raise ValueError(f"size mismatch for {key}: "
                                 f"{np.shape(new)} vs {np.shape(cur)}")
            logger.warning(f"size mismatch for {key} "
                           f"({np.shape(new)} vs {np.shape(cur)}); dropped")
            merged[key] = cur
        else:
            merged[key] = new
    extra = set(flat_l) - set(flat_p)
    if extra:
        if strict:
            raise KeyError(f"unexpected keys in checkpoint: {sorted(extra)[:5]}")
        logger.warning(f"{len(extra)} unexpected checkpoint keys ignored")
    leaves = [merged[jax.tree_util.keystr(kp)] for kp, _ in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)
