"""Multi-process jax.distributed smoke: the multi-host execution path.

Replaces-and-proves the reference's multi-process distribution layer (Ray
rollout workers, /root/reference/train_hetero.py:212) on the JAX side:
each process is one "host" with 2 virtual CPU devices; all call
``setup_distributed`` (parallel/mesh.py), build ONE global data mesh over
every device of every process, shard the env batch globally, and run a
full sharded ``LowLevelPPO.train_iter`` to completion -- gradient pmean
crossing every process boundary.  Each worker reports the pmean'd metrics
AND an md5 over the raw bytes of its post-update replicated params; the
launcher asserts both are identical across all processes (bit-identical
replicated learner state).

Worker:   python scripts/multihost_smoke.py <proc_id> <nproc> <port>
Launcher: python scripts/multihost_smoke.py --launch [nproc]  (default 4
          workers; validates outputs agree, writes artifacts/MULTIHOST.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def worker(proc_id: int, nproc: int, port: int):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # one process per "host" (parallel/mesh.py:setup_distributed)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)

    from hhmarl_2d_tpu.parallel import mesh as M
    M.setup_distributed()

    import jax
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
    from hhmarl_2d_tpu.env import config as ECfg

    cfg = ECfg.make_lowlevel_config(level=1)
    ppo = PPOConfig(num_envs=8, rollout_len=16, seq_len=8, sgd_iters=2,
                    num_minibatches=2)
    mesh = M.make_mesh()          # global mesh over all 4 devices
    assert mesh.devices.size == 2 * nproc
    trainer = LowLevelPPO(cfg, ppo, mesh=mesh)

    # identical seeds -> identical global arrays on every process; the
    # device_put in place_train_inputs keeps only this host's shards
    ts, env_state, obs = trainer.init(jax.random.PRNGKey(0))
    ts, env_state, obs = M.place_train_inputs(mesh, ts, env_state, obs)
    ts, env_state, obs, metrics = trainer.train_iter(
        ts, env_state, obs, jax.random.PRNGKey(1))
    out = {k: round(float(v), 6) for k, v in sorted(metrics.items())}
    # bit-exact replication proof: md5 over this host's copy of the
    # replicated post-update params
    import hashlib
    import numpy as np
    h = hashlib.md5()
    for leaf in jax.tree_util.tree_leaves(ts.params):
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    out["params_md5"] = h.hexdigest()
    print("MULTIHOST_OK", proc_id, json.dumps(out), flush=True)
    jax.distributed.shutdown()


def launch():
    import socket
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # strip the TPU-tunnel site hook's trigger (PALLAS_AXON_POOL_IPS) so
    # workers boot plain CPU JAX and jax.distributed owns backend init
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
           and not k.startswith("PALLAS_AXON")}
    env["HHMARL_NO_COMPILE_CACHE"] = "1"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(i), str(nproc),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    results = {}
    for i, out in enumerate(outs):
        ok_lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        if procs[i].returncode != 0 or not ok_lines:
            raise SystemExit(
                f"process {i} failed (rc={procs[i].returncode}):\n{out}")
        results[i] = json.loads(ok_lines[0].split(" ", 2)[2])
    # SPMD: every process must report identical pmean'd metrics and a
    # bit-identical post-update params hash
    for i in range(1, nproc):
        assert results[i] == results[0], (i, results[i], results[0])
    artifact = {
        "processes": nproc, "devices_per_process": 2,
        "global_mesh_devices": 2 * nproc,
        "program": "LowLevelPPO.train_iter (sharded SGD, gradient pmean "
                   "across every process boundary)",
        "metrics_identical_across_processes": True,
        "post_update_params_bit_identical": True,
        "params_md5": results[0]["params_md5"],
        "metrics": {k: v for k, v in results[0].items()
                    if k != "params_md5"},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "MULTIHOST.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    print("MULTIHOST LAUNCH OK ->", path)


if __name__ == "__main__":
    if sys.argv[1:2] == ["--launch"]:
        launch()
    else:
        worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
