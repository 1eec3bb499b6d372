"""Multi-host execution: 4 OS processes under jax.distributed.

Proves setup_distributed + place_train_inputs work across real process
boundaries (SURVEY.md section 2 #21), not just on a single-process virtual
mesh: four workers each expose 2 virtual CPU devices, join one global
8-device data mesh, and run a full sharded LowLevelPPO.train_iter whose
gradient pmean crosses every boundary.  SPMD correctness is asserted by
the workers reporting bit-identical pmean'd metrics AND a bit-identical
md5 of the replicated post-update params.
"""

import json
import os
import subprocess
import sys

import pytest

# heavy suite: excluded from the default fast gate (pyproject addopts)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_four_process_distributed_train_iter():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py"),
         "--launch", "4"],
        capture_output=True, text=True, timeout=580, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST LAUNCH OK" in out.stdout
    with open(os.path.join(REPO, "artifacts", "MULTIHOST.json")) as f:
        art = json.load(f)
    assert art["processes"] == 4
    assert art["global_mesh_devices"] == 8
    assert art["metrics_identical_across_processes"] is True
    assert art["post_update_params_bit_identical"] is True
    assert len(art["params_md5"]) == 32
    for k in ("kl_1", "kl_2", "vf_loss_1", "vf_loss_2", "reward_mean"):
        assert k in art["metrics"]
