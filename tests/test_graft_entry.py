"""dryrun_multichip must be un-hangable: the parent process may never
initialize a jax backend (the sitecustomize-registered tunnel accelerator
hangs the FIRST backend init — any backend, even jax.devices('cpu') — when
its tunnel is down; root cause of MULTICHIP_r01..r03 being red).

Replaces the reference's launcher-robustness surface
(wm_basicsr/utils/dist_util.py:10-57): the torch launcher assumes a healthy
NCCL env; ours must run even with a dead accelerator plugin registered.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_parent_never_touches_jax_backends():
    """Run dryrun_multichip(8) in a parent whose jax backend layer is
    poisoned: jax is pre-imported and every backend-init entry point is
    replaced with an immediate hang-simulant (raises if called). If the
    parent ever probes devices/backends, this fails fast instead of
    hanging 20 minutes like the real broken-tunnel plugin does."""
    code = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax
import jax._src.xla_bridge as xb

def _poisoned(*a, **k):
    raise SystemExit("POISONED: parent initialized a jax backend")

# every route to backend init funnels through these
xb.backends = _poisoned
xb.get_backend = _poisoned
jax.devices = _poisoned
jax.local_devices = _poisoned

import __graft_entry__ as g
g.dryrun_multichip(8)
print("PARENT-CLEAN")
"""
    env = dict(os.environ)
    # the child strips these anyway; the parent must not need them stripped
    proc = subprocess.run(
        [sys.executable, "-c", code % {"repo": REPO}],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert "POISONED" not in proc.stdout + proc.stderr, proc.stderr[-2000:]
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "PARENT-CLEAN" in proc.stdout
    assert "dryrun_multichip(8): " in proc.stdout
