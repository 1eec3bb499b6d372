"""Golden-trajectory regression tests.

Seeded 25-step rollouts with fixed maneuvering actions; exact float32
values recorded from the validated implementation.  Any change to the
kinematics, geodesy, scripted-opponent logic or RNG threading shows up
here immediately (the framework's substitute for the reference's
seeded-trajectory parity, which cannot be replayed bit-for-bit because the
reference uses Python's Mersenne-Twister streams).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hhmarl_2d_tpu.env import config as ECfg, lowlevel

GOLD_LAT = [0.04956245, 0.20604865, 0.08180033, 0.20436518]
GOLD_LON = [0.1859658, 0.15223786, 0.15133649, 0.11700548]
GOLD_HEADING = [220.0, 322.5, 124.93653, 94.0]
GOLD_SPEED = [700.0, 475.0, 632.0, 579.0]
GOLD_OBS0 = [0.16520816, 0.6198860, 0.7777778, 0.61281335,
             0.51639867, 0.95547098, 0.52813041, 0.11151657]


def test_seeded_level3_trajectory():
    cfg = ECfg.make_lowlevel_config(level=3)
    st, obs = lowlevel.reset(cfg, jax.random.PRNGKey(42))
    acts = jnp.tile(jnp.array([8, 6, 0, 0], jnp.int32), (2, 1))
    for i in range(25):
        st, obs, rew, done, info = lowlevel.step(
            cfg, st, acts, jax.random.PRNGKey(1000 + i))
    np.testing.assert_allclose(np.asarray(st.sim.lat), GOLD_LAT, atol=2e-6)
    np.testing.assert_allclose(np.asarray(st.sim.lon), GOLD_LON, atol=2e-6)
    np.testing.assert_allclose(np.asarray(st.sim.heading), GOLD_HEADING,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(st.sim.speed), GOLD_SPEED, atol=1e-3)
    assert bool(jnp.all(st.sim.alive))
    np.testing.assert_allclose(np.asarray(obs[0][:8]), GOLD_OBS0, atol=2e-6)
