#!/usr/bin/env python
"""Throughput benchmark: vectorized 2-vs-2 low-level env stepping.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aggregate simulated env-steps/s on this chip while running the
full level-1 fight environment (obs build + actions + tick + rewards +
auto-reset) with policy networks in the loop, at 4096 vectorized envs --
the BASELINE.json configuration.  vs_baseline compares against the
per-chip share of the >=1M env-steps/s @ v5p-16 (8 chips) north star,
i.e. 125k env-steps/s/chip.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from hhmarl_2d_tpu.env import config as ECfg
from hhmarl_2d_tpu.env import lowlevel
from hhmarl_2d_tpu.models import policy as P

NUM_ENVS = 4096
ROLLOUT = 256
BASELINE_PER_CHIP = 125_000.0  # 1M / 8 chips (v5p-16)


def main():
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

    # warmup / compile
    env_state, obs, _ = run(params, env_state, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(obs)

    t0 = time.time()
    n_iters = 4
    for i in range(n_iters):
        env_state, obs, s = run(params, env_state, obs, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(obs)
    dt = time.time() - t0

    steps_per_s = NUM_ENVS * ROLLOUT * n_iters / dt
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
