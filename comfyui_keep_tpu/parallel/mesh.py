"""Device mesh / collectives — the TPU-native replacement for the reference's
NCCL/DDP layer (wm_basicsr/utils/dist_util.py:10-82, base_model.py:87-101,
367-392; SURVEY.md §2.10).

Mapping:
  torch.distributed.init_process_group(NCCL)  -> jax.distributed.initialize
  DDP gradient allreduce                      -> implicit psum from GSPMD
                                                 data sharding (trainers.py)
  dist.reduce(loss) to rank 0                 -> reduce_loss_dict (jnp.mean
                                                 over the data axis — values
                                                 identical on all hosts)
  master_only                                 -> utils/logger.master_only
  EnlargedSampler rank sharding               -> data/samplers.py via
                                                 jax.process_index()
Mesh axes: 'data' (dp over clips/faces — ICI ring), 'model' reserved for
tensor-parallel serving (channel-sharded convs), laid out so 'data' maps to
the fastest ICI dimension.
"""
import os
from typing import Dict, Optional, Tuple

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host init (launcher='jax'). Single-process if no env present
    (reference launcher='none' path, dist_util.py:10-25)."""
    import jax
    if num_processes is not None or os.environ.get("JAX_COORDINATOR_ADDRESS") \
            or coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return get_dist_info()


def get_dist_info() -> Tuple[int, int]:
    """(rank, world_size) — reference dist_util.get_dist_info."""
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover
        return 0, 1


def make_mesh(n_devices: Optional[int] = None, axes=("data",),
              shape: Optional[Tuple[int, ...]] = None):
    """Build a Mesh over the fastest interconnect. axes=('data',) reproduces
    DDP; ('data', 'model') leaves a tensor-parallel axis."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh, ndim: int = 1):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def reduce_loss_dict(loss_dict: Dict):
    """Average scalar losses across processes (base_model.py:367-392). Under
    GSPMD single-controller the jitted loss is already global; this is the
    multi-process (DCN) reduction for logging parity."""
    import jax
    if jax.process_count() == 1:
        return {k: float(v) for k, v in loss_dict.items()}
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    keys = sorted(loss_dict)
    vals = jnp.asarray([float(loss_dict[k]) for k in keys])
    vals = multihost_utils.process_allgather(vals).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, vals)}
