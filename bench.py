#!/usr/bin/env python
"""Throughput benchmark.

Prints ONE JSON line. The headline metric is aggregate simulated
env-steps/s on this chip for the full level-1 fight environment (obs build
+ actions + tick + rewards + auto-reset) with policy networks in the loop
at 4096 vectorized envs -- the BASELINE.json configuration; vs_baseline
compares against the per-chip share of the >=1M env-steps/s @ v5p-16
(8 chips) north star.  The same line carries the full-training figures
(BASELINE.json metric "PPO updates/s"): train_iter_per_s and
ppo_updates_per_s measure the complete fused train iteration (rollout +
GAE + minibatched SGD) at the driver's production configuration.

Modes:
  python bench.py                 rollout + train benchmarks (one line)
  python bench.py --mode rollout  rollout benchmark only
  python bench.py --mode train    train-iteration benchmark only
  python bench.py --mode scaling  8-virtual-device CPU weak-scaling check
                                  (re-execs itself under a CPU mesh)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

NUM_ENVS = 4096
ROLLOUT = 256
BASELINE_PER_CHIP = 125_000.0  # 1M / 8 chips (v5p-16)

# training shapes at bench scale.  Round 2 benched (sgd_iters=4, mb=8);
# the production defaults were since raised to (8, 32) to match the
# reference's per-sample update intensity (cli/args.py) -- the train bench
# reports BOTH operating points so cross-round numbers stay comparable.
TRAIN_ENVS = 4096
TRAIN_ROLLOUT = 128
SGD_ITERS = 4          # round-2-comparable point
NUM_MB = 8
SGD_ITERS_PROD = 8     # production point (cli/args.py defaults)
NUM_MB_PROD = 32


def bench_rollout():
    import jax
    import jax.numpy as jnp
    from hhmarl_2d_tpu.env import config as ECfg
    from hhmarl_2d_tpu.env import lowlevel
    from hhmarl_2d_tpu.models import policy as P

    cfg = ECfg.make_lowlevel_config(level=1)
    team = P.LowLevelTeam("fight")
    key = jax.random.PRNGKey(0)
    params = team.init(key)

    v_reset = jax.vmap(lambda k: lowlevel.reset(cfg, k))
    env_state, obs = v_reset(jax.random.split(key, NUM_ENVS))

    def rollout(params, env_state, obs, key):
        def step_fn(carry, k):
            env_state, obs = carry
            k_act, k_env = jax.random.split(k)
            actions, _, _, _ = team.act(params, obs, k_act)
            env_state, obs, rew, done, _ = jax.vmap(
                lambda s, a, kk: lowlevel.step(cfg, s, a, kk))(
                env_state, actions, jax.random.split(k_env, NUM_ENVS))
            return (env_state, obs), rew[:, 0]
        (env_state, obs), rews = jax.lax.scan(
            step_fn, (env_state, obs), jax.random.split(key, ROLLOUT))
        return env_state, obs, jnp.sum(rews)

    run = jax.jit(rollout, donate_argnums=(1, 2))
    env_state, obs, s = run(params, env_state, obs, jax.random.PRNGKey(1))
    float(s)  # full sync: the scalar transitively depends on every step

    t0 = time.time()
    n_iters = 8
    for i in range(n_iters):
        env_state, obs, s = run(params, env_state, obs,
                                jax.random.PRNGKey(2 + i))
    # fetch the value (block_until_ready alone has been observed to return
    # early on the experimental axon platform; a host transfer cannot)
    float(s)
    dt = time.time() - t0
    return NUM_ENVS * ROLLOUT * n_iters / dt


def bench_train(num_envs=TRAIN_ENVS, n_iters=4, num_devices=None,
                sgd_iters=SGD_ITERS, num_mb=NUM_MB):
    """Full train_iter (rollout + GAE + SGD) iterations per second."""
    import jax
    from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
    from hhmarl_2d_tpu.env import config as ECfg
    from hhmarl_2d_tpu.parallel import mesh as M

    cfg = ECfg.make_lowlevel_config(level=1)
    ppo = PPOConfig(num_envs=num_envs, rollout_len=TRAIN_ROLLOUT,
                    seq_len=16, sgd_iters=sgd_iters, num_minibatches=num_mb)
    mesh = M.make_mesh(num_devices)
    tr = LowLevelPPO(cfg, ppo, mesh=mesh)
    ts, env_state, obs = tr.init(jax.random.PRNGKey(0))
    with mesh:
        ts, env_state, obs = M.place_train_inputs(mesh, ts, env_state, obs)
        ts, env_state, obs, m = tr.train_iter(ts, env_state, obs,
                                              jax.random.PRNGKey(1))
        jax.block_until_ready(m["reward_mean"])
        t0 = time.time()
        for i in range(n_iters):
            ts, env_state, obs, m = tr.train_iter(
                ts, env_state, obs, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m["reward_mean"])
        dt = time.time() - t0
    return n_iters / dt


def bench_scaling():
    """Sharding-overhead check on the 8-virtual-device CPU mesh.

    Virtual devices timeshare the same physical cores, so a weak-scaling
    curve cannot look linear here by construction; what CAN be measured
    without a pod is the cost the data-mesh partitioning itself adds:
    run the SAME total batch (512 envs) unsharded on 1 device and sharded
    over 8, in fresh CPU-pinned interpreters.  Total compute is constant,
    so efficiency = t1/t8 -> 1.0 means the sharded program (with its
    gradient psum and resharding) costs the same as the unsharded one --
    the ICI-collective analog of linear host scaling (BASELINE.md)."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    results = {}
    for n_dev in (1, 8):
        code = (
            "import sys; sys.path.insert(0, %r); import bench, json\n"
            "from hhmarl_2d_tpu.utils.platform import ensure_platform\n"
            "ensure_platform()  # the site hook pins the TPU tunnel otherwise\n"
            "r = bench.bench_train(num_envs=512, n_iters=2, num_devices=%d)\n"
            "print(json.dumps({'iters_per_s': r}))"
            % (os.path.dirname(os.path.abspath(__file__)), n_dev))
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=1500)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"scaling subprocess ({n_dev} dev) failed:\n"
                               f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
        results[n_dev] = json.loads(lines[-1])["iters_per_s"]
    eff = results[8] / results[1]
    return {
        "metric": "sharding_overhead_8dev_cpu",
        "value": round(eff, 3),
        "unit": "x (1.0 = sharded == unsharded at equal total work)",
        "vs_baseline": round(eff, 3),
        "iters_per_s_1dev_512env": round(results[1], 3),
        "iters_per_s_8dev_512env": round(results[8], 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("all", "rollout", "train", "scaling"),
                    default="all")
    args = ap.parse_args()

    if args.mode == "scaling":
        print(json.dumps(bench_scaling()))
        return

    out = {}
    if args.mode in ("all", "rollout"):
        steps_per_s = bench_rollout()
        out.update({
            "metric": "env_steps_per_sec_per_chip",
            "value": round(steps_per_s),
            "unit": "env-steps/s",
            "vs_baseline": round(steps_per_s / BASELINE_PER_CHIP, 3),
        })
    if args.mode in ("all", "train"):
        iters_per_s = bench_train()
        train_steps = iters_per_s * TRAIN_ENVS * TRAIN_ROLLOUT
        prod_iters = bench_train(sgd_iters=SGD_ITERS_PROD,
                                 num_mb=NUM_MB_PROD)
        extra = {
            "train_iter_per_s": round(iters_per_s, 3),
            "ppo_updates_per_s": round(iters_per_s * SGD_ITERS * NUM_MB, 2),
            "train_env_steps_per_s": round(train_steps),
            "train_batch": TRAIN_ENVS * TRAIN_ROLLOUT,
            # production update intensity (sgd 8 x 32 minibatches)
            "train_iter_per_s_prod": round(prod_iters, 3),
            "ppo_updates_per_s_prod": round(
                prod_iters * SGD_ITERS_PROD * NUM_MB_PROD, 2),
            "train_env_steps_per_s_prod": round(
                prod_iters * TRAIN_ENVS * TRAIN_ROLLOUT),
        }
        if args.mode == "train":
            out.update({
                "metric": "train_env_steps_per_sec_per_chip",
                "value": round(train_steps),
                "unit": "env-steps/s (through full PPO train_iter)",
                "vs_baseline": round(train_steps / BASELINE_PER_CHIP, 3),
            })
        out.update(extra)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
