"""Two-process jax.distributed smoke test (VERDICT r2 item 6).

Spawns 2 local CPU processes with a localhost coordinator — the
multi-controller (DCN) path of parallel/mesh.py that single-controller mesh
tests cannot reach: jax.distributed.initialize, get_dist_info,
reduce_loss_dict's process_allgather branch, and one data-parallel train
step with per-process batch shards whose updated params must agree across
processes. Mirrors the reference's launcher layer
(wm_basicsr/utils/dist_util.py:10-57, gmflow/utils/dist_utils.py:12-75).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_mp_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step():
    nproc = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child pins its own 1-device CPU fleet
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, CHILD, coordinator, str(nproc), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for i in range(nproc)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {i} failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    ranks = sorted(o["rank"] for o in outs)
    assert ranks == [0, 1]
    for o in outs:
        assert o["world"] == nproc
        assert abs(o["reduced"] - 1.5) < 1e-6  # mean(1, 2)
        assert o["params_identical_across_processes"] is True
    # the jitted global loss is identical on both controllers
    assert outs[0]["l_pix"] == outs[1]["l_pix"]
