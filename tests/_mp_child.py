"""Child process for tests/test_multiprocess.py: one of two CPU processes
forming a jax.distributed fleet (the multi-controller/DCN analogue of the
reference's torchrun launcher, wm_basicsr/utils/dist_util.py:10-57).

argv: <coordinator> <num_processes> <process_id>
Prints one JSON line with everything the parent asserts on.
"""
import json
import os
import sys

# one local CPU device per process -> global fleet of <num_processes>
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from comfyui_keep_tpu.parallel import (init_distributed, get_dist_info,
                                           make_mesh, reduce_loss_dict)

    rank, world = init_distributed(coordinator=coordinator,
                                   num_processes=nproc, process_id=pid)
    assert (rank, world) == (pid, nproc), (rank, world)
    assert len(jax.devices()) == nproc, jax.devices()
    assert len(jax.local_devices()) == 1

    # reduce_loss_dict: per-process scalars -> global mean on every process
    reduced = reduce_loss_dict({"l_pix": float(rank + 1)})
    expect = float(np.mean([i + 1 for i in range(world)]))
    assert abs(reduced["l_pix"] - expect) < 1e-6, reduced

    # one DP train step with per-process data through the repo trainer
    from jax.sharding import NamedSharding, PartitionSpec as P
    from comfyui_keep_tpu.training.trainers import SRTrainer

    mesh = make_mesh()  # ('data',) over the global fleet
    opt = {"model_type": "SRModel",
           "network_g": {"type": "SRVGGNetCompact", "num_feat": 8,
                         "num_conv": 2, "upscale": 1},
           "train": {"pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                     "optim_g": {"type": "Adam", "lr": 1e-3}}}
    tr = SRTrainer(opt, mesh=mesh)
    state = tr.make_state(jax.random.PRNGKey(0))

    # per-process batch shard -> one global (world, 8, 8, 3) array
    rng = np.random.default_rng(100 + rank)
    lq_local = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    gt_local = lq_local * 0.5
    dp = NamedSharding(mesh, P("data"))
    batch = {"lq": jax.make_array_from_process_local_data(dp, lq_local),
             "gt": jax.make_array_from_process_local_data(dp, gt_local)}
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(logs["l_pix"]), logs

    # updated params must be identical on every process (the DP allreduce):
    # allgather the first leaf and compare
    from jax.experimental import multihost_utils
    leaf = np.asarray(jax.tree.leaves(state.params)[0]).ravel()[:16]
    gathered = np.asarray(multihost_utils.process_allgather(leaf))
    same = bool(np.all(gathered == gathered[0:1]))

    print(json.dumps({"rank": rank, "world": world,
                      "reduced": reduced["l_pix"],
                      "l_pix": logs["l_pix"],
                      "params_identical_across_processes": same}))


if __name__ == "__main__":
    main()
