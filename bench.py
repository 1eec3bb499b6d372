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
                sgd_iters=SGD_ITERS, num_mb=NUM_MB, dtype="bf16"):
    """Full train_iter (rollout + GAE + SGD) iterations per second.

    ``dtype``: model computation dtype -- "bf16" is the production CLI
    default (cli/args.py --compute_dtype; params/optimizer fp32)."""
    import jax
    from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
    from hhmarl_2d_tpu.env import config as ECfg
    from hhmarl_2d_tpu.parallel import mesh as M

    cfg = ECfg.make_lowlevel_config(level=1)
    ppo = PPOConfig(num_envs=num_envs, rollout_len=TRAIN_ROLLOUT,
                    seq_len=16, sgd_iters=sgd_iters, num_minibatches=num_mb,
                    compute_dtype=dtype)
    mesh = M.make_mesh(num_devices)
    tr = LowLevelPPO(cfg, ppo, mesh=mesh)
    ts, env_state, obs = tr.init(jax.random.PRNGKey(0))
    with mesh:
        ts, env_state, obs = M.place_train_inputs(mesh, ts, env_state, obs)
        ts, env_state, obs, m = tr.train_iter(ts, env_state, obs,
                                              jax.random.PRNGKey(1))
        float(m["reward_mean"])  # host transfer: the only reliable sync
        # on the axon tunnel (block_until_ready on mesh-placed arrays has
        # been observed to return early -> 10x-inflated rates)
        t0 = time.time()
        for i in range(n_iters):
            ts, env_state, obs, m = tr.train_iter(
                ts, env_state, obs, jax.random.PRNGKey(2 + i))
        float(m["reward_mean"])
        dt = time.time() - t0
    # analytic model FLOPs per iteration: fwd (2/param) on every rollout
    # row, fwd+bwd (6/param) on every SGD row
    p_team = _n_params(ts.params)
    rows = num_envs * TRAIN_ROLLOUT
    flops = rows * 2 * p_team + sgd_iters * rows * 6 * p_team
    return n_iters / dt, flops


def _n_params(tree):
    import jax
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def _chip_peak_flops():
    """Peak dense-matmul FLOP/s of this chip (bf16 MXU peak, the standard
    MFU denominator).  Override with BENCH_PEAK_FLOPS."""
    import jax
    if os.environ.get("BENCH_PEAK_FLOPS"):
        return float(os.environ["BENCH_PEAK_FLOPS"])
    kind = jax.devices()[0].device_kind.lower()
    for k, v in (("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
                 ("v6", 918e12), ("v4", 275e12)):
        if k in kind:
            return v
    return 197e12


def bench_train_l5(num_envs=1024, n_iters=3):
    """L5 train_iter: the frozen-bank program (4 extra in-graph model
    evaluations per env step -- fight bank + escape opponents,
    models/policy.py make_frozen_opp_actor).  Untrained template params;
    FLOPs and program shape are identical to the real run.
    Returns (iters_per_s, analytic model FLOPs per iter)."""
    import jax
    from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
    from hhmarl_2d_tpu.env import config as ECfg
    from hhmarl_2d_tpu.models import policy as P
    from hhmarl_2d_tpu.utils import checkpoint as CKPT

    import jax.numpy as jnp
    cfg = ECfg.make_lowlevel_config(level=5)
    ppo = PPOConfig(num_envs=num_envs, rollout_len=TRAIN_ROLLOUT, seq_len=16,
                    sgd_iters=SGD_ITERS_PROD, num_minibatches=NUM_MB_PROD,
                    compute_dtype="bf16")
    team_f = P.LowLevelTeam("fight", dtype=jnp.bfloat16)
    team_e = P.LowLevelTeam("escape", dtype=jnp.bfloat16)
    f = team_f.init(jax.random.PRNGKey(0))
    e = team_e.init(jax.random.PRNGKey(1))
    bank = {"fight": CKPT.stack_fight_bank([f, f, f]), "escape": e}
    opp_actor = P.make_frozen_opp_actor(team_f, team_e, bank)
    tr = LowLevelPPO(cfg, ppo, team=team_f, opp_actor=opp_actor)
    ts, env_state, obs = tr.init(jax.random.PRNGKey(2))
    ts, env_state, obs, m = tr.train_iter(ts, env_state, obs,
                                          jax.random.PRNGKey(3))
    float(m["reward_mean"])  # host transfer = reliable sync (see bench_train)
    t0 = time.time()
    for i in range(n_iters):
        ts, env_state, obs, m = tr.train_iter(ts, env_state, obs,
                                              jax.random.PRNGKey(4 + i))
    float(m["reward_mean"])
    iters_per_s = n_iters / (time.time() - t0)

    rows = num_envs * TRAIN_ROLLOUT
    p_team = _n_params(f)
    # per env step: agent team fwd + one fight-bank level fwd + escape fwd
    flops_roll = rows * 2 * (p_team + p_team + _n_params(e))
    flops_sgd = SGD_ITERS_PROD * rows * 6 * p_team
    return iters_per_s, flops_roll + flops_sgd, rows


def bench_train_hl(num_envs=256, rollout_len=64, n_iters=3):
    """Commander train_iter at the production configuration: the most
    inference-heavy program (16 embedded sim sub-steps with 6 frozen
    policy forwards per macro action, SURVEY.md section 3.2).
    Returns (iters_per_s, SGD-phase model FLOPs per iter, macro rows)."""
    import jax
    from hhmarl_2d_tpu.algo.ppo_hier import CommanderPPO, HierPPOConfig
    from hhmarl_2d_tpu.env import config as ECfg
    from hhmarl_2d_tpu.env import highlevel
    from hhmarl_2d_tpu.models import policy as P

    import jax.numpy as jnp
    cfg = ECfg.make_highlevel_config()
    team_f = P.LowLevelTeam("fight", dtype=jnp.bfloat16)
    team_e = P.LowLevelTeam("escape", dtype=jnp.bfloat16)
    bank = highlevel.make_hl_bank(
        team_f, team_e, team_f.init(jax.random.PRNGKey(0)),
        team_e.init(jax.random.PRNGKey(1)))
    ppo = HierPPOConfig(num_envs=num_envs, rollout_len=rollout_len,
                        seq_len=8, sgd_iters=SGD_ITERS_PROD,
                        num_minibatches=NUM_MB_PROD, compute_dtype="bf16")
    tr = CommanderPPO(cfg, ppo, bank)
    ts, env_state, obs, h = tr.init(jax.random.PRNGKey(2))
    ts, env_state, obs, h, m = tr.train_iter(ts, env_state, obs, h,
                                             jax.random.PRNGKey(3))
    float(m["reward_mean"])  # host transfer = reliable sync (see bench_train)
    t0 = time.time()
    for i in range(n_iters):
        ts, env_state, obs, h, m = tr.train_iter(ts, env_state, obs, h,
                                                 jax.random.PRNGKey(4 + i))
    float(m["reward_mean"])
    iters_per_s = n_iters / (time.time() - t0)

    macro_rows = num_envs * rollout_len
    # SGD phase (the model-dominated phase): fwd+bwd over the whole batch
    # per pass, one commander application per agent row
    flops_sgd = (SGD_ITERS_PROD * macro_rows * cfg.num_agents * 6
                 * _n_params(ts.params))
    return iters_per_s, flops_sgd, macro_rows


def bench_phase_split(num_envs=TRAIN_ENVS, n_iters=3):
    """Rollout-vs-SGD wall split of the production train_iter, measured
    by compiling the rollout phase standalone and comparing to the full
    fused iteration (same shapes, same params)."""
    import jax
    from functools import partial
    from hhmarl_2d_tpu.algo.ppo import LowLevelPPO, PPOConfig
    from hhmarl_2d_tpu.env import config as ECfg

    cfg = ECfg.make_lowlevel_config(level=1)
    ppo = PPOConfig(num_envs=num_envs, rollout_len=TRAIN_ROLLOUT, seq_len=16,
                    sgd_iters=SGD_ITERS_PROD, num_minibatches=NUM_MB_PROD,
                    compute_dtype="bf16")
    tr = LowLevelPPO(cfg, ppo)
    ts, env_state, obs = tr.init(jax.random.PRNGKey(0))

    roll = jax.jit(lambda ts, s, o, k: tr._rollout(ts, s, o, k)[2]["rew"])

    def timed(fn, *args):
        import jax.numpy as _jnp

        def sync(o):  # host transfer = reliable sync (see bench_train)
            float(_jnp.sum(jax.tree_util.tree_leaves(o)[0]))

        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(n_iters):
            out = fn(*args)
        sync(out)
        return (time.time() - t0) / n_iters

    t_roll = timed(roll, ts, env_state, obs, jax.random.PRNGKey(1))
    t_full = timed(lambda *a: tr.train_iter(*a)[3]["reward_mean"],
                   ts, env_state, obs, jax.random.PRNGKey(1))
    frac = min(t_roll / t_full, 1.0)
    return {"rollout_frac": round(frac, 3),
            "sgd_frac": round(1.0 - frac, 3),
            "train_iter_ms": round(t_full * 1e3, 1)}


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
            "r, _ = bench.bench_train(num_envs=512, n_iters=2, num_devices=%d)\n"
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
    # persistent compiled-program cache (utils/platform.py): without it a
    # bench run spends ~25 min re-compiling its ~8 programs through the
    # TPU tunnel (measured 28 min cold vs ~3 min warm end-to-end)
    from hhmarl_2d_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("all", "rollout", "train", "hl", "l5",
                                       "split", "scaling"),
                    default="all")
    args = ap.parse_args()

    if args.mode == "scaling":
        print(json.dumps(bench_scaling()))
        return

    peak = _chip_peak_flops()
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
        # round-2-comparable point stays fp32 (it was benched fp32 then)
        iters_per_s, _ = bench_train(dtype="fp32")
        train_steps = iters_per_s * TRAIN_ENVS * TRAIN_ROLLOUT
        prod_iters, prod_flops = bench_train(sgd_iters=SGD_ITERS_PROD,
                                             num_mb=NUM_MB_PROD)
        prod_iters_fp32, _ = bench_train(sgd_iters=SGD_ITERS_PROD,
                                         num_mb=NUM_MB_PROD, dtype="fp32")
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
            # analytic-FLOP model MFU of the production train_iter
            # (model matmuls only; the simulator/env FLOPs ride along
            # free, so this is a lower bound on chip utilization).
            # Production runs bf16 compute (fp32 params/optimizer, the
            # cli/args.py default); the _fp32 point is the same program
            # with fp32 matmuls for comparison.
            "mfu": round(prod_iters * prod_flops / peak, 4),
            "mfu_fp32": round(prod_iters_fp32 * prod_flops / peak, 4),
            "train_iter_per_s_prod_fp32": round(prod_iters_fp32, 3),
            "model_tflops": round(prod_iters * prod_flops / 1e12, 2),
            "chip_peak_tflops": round(peak / 1e12),
        }
        if args.mode == "train":
            out.update({
                "metric": "train_env_steps_per_sec_per_chip",
                "value": round(train_steps),
                "unit": "env-steps/s (through full PPO train_iter)",
                "vs_baseline": round(train_steps / BASELINE_PER_CHIP, 3),
            })
        out.update(extra)
    if args.mode in ("all", "l5"):
        l5_iters, l5_flops, l5_rows = bench_train_l5()
        out.update({
            "l5_train_iter_per_s": round(l5_iters, 3),
            "l5_train_env_steps_per_s": round(l5_iters * l5_rows),
            "mfu_l5": round(l5_iters * l5_flops / peak, 4),
        })
        if args.mode == "l5":
            out.update({"metric": "l5_train_env_steps_per_s",
                        "value": round(l5_iters * l5_rows),
                        "unit": "env-steps/s (L5 frozen-bank train_iter)",
                        "vs_baseline": round(l5_iters * l5_rows
                                             / BASELINE_PER_CHIP, 3)})
    if args.mode in ("all", "hl"):
        hl_iters, hl_flops, hl_rows = bench_train_hl()
        out.update({
            "hl_train_iter_per_s": round(hl_iters, 3),
            "hl_macro_steps_per_s": round(hl_iters * hl_rows),
            "mfu_hl_sgd": round(hl_iters * hl_flops / peak, 4),
        })
        if args.mode == "hl":
            out.update({"metric": "hl_macro_steps_per_s",
                        "value": round(hl_iters * hl_rows),
                        "unit": "commander macro-steps/s (train_iter)",
                        "vs_baseline": round(hl_iters * hl_rows
                                             / BASELINE_PER_CHIP, 3)})
    if args.mode in ("all", "split"):
        out.update(bench_phase_split())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
