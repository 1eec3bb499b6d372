"""Physical and gameplay constants for the HHMARL 2D air-combat framework.

Single source of truth for every dimension and performance figure (the
reference duplicates these across six files, e.g. N_OPP_HL in
envs/env_hier.py:20, train_hier.py:24, models/ac_models_hier.py:10).

Aircraft performance figures follow the reference simulator:
  - AC1 "Rafale"      -> /root/reference/warsim/simulator/ac1.py:24-36
  - AC2 "RafaleLong"  -> /root/reference/warsim/simulator/ac2.py:23-32
  - Rocket            -> /root/reference/warsim/simulator/rocket_unit.py:15-21
"""

from __future__ import annotations

import numpy as np

# --- Unit conversion (cmano_simulator.py:21)
KNOTS_TO_MS = 0.514444

# --- Aircraft types. Arrays are indexed by (ac_type - 1): [AC1, AC2].
NUM_AC_TYPES = 2
TURN_RATE_DEG_S = np.array([5.0, 3.5], dtype=np.float32)
MIN_SPEED_KNOTS = np.array([0.0, 0.0], dtype=np.float32)
MAX_SPEED_KNOTS = np.array([900.0, 600.0], dtype=np.float32)
ACCEL_KNOTS_S = np.array([35.0, 28.0], dtype=np.float32)
CANNON_RANGE_KM = np.array([2.0, 4.5], dtype=np.float32)
CANNON_WIDTH_DEG = np.array([10.0, 7.0], dtype=np.float32)
CANNON_BURST_SECS = np.array([5.0, 3.0], dtype=np.float32)
CANNON_HIT_PROB = np.array([0.75, 0.9], dtype=np.float32)
CANNON_MAX_SECS = np.array([200.0, 200.0], dtype=np.float32)
MAX_MISSILES = np.array([5, 0], dtype=np.int32)

# Missile launcher envelope (ac1.py:34-35). NOTE the reference radar-cone
# check is one-sided: bearing must lie within [heading, heading+120] mod 360
# rather than +-60 degrees (ac1.py:144-146) -- preserved in sim/engine.py.
MISSILE_RANGE_KM = 111.0
MISSILE_WIDTH_DEG = 120.0

# --- Rocket (missile unit)
ROCKET_TURN_RATE_DEG_S = 10.0
ROCKET_PROXIMITY_KM = 1.0
ROCKET_EOL_SECS = 10  # life_time > speed_profile_time[1] removes it (rocket_unit.py:55-58)
# Quadratic scipy interp1d through (0,500),(10,2000),(20,1400),(30,600)
# evaluated at the only reachable integer life times 0..10
# (tick = 1 s, EOL at life > 10) -- rocket_unit.py:16-21,70.
ROCKET_SPEED_TABLE = np.array(
    [500.0, 758.75, 993.3333333333335, 1203.75, 1390.0, 1552.083333333333,
     1690.0, 1803.75, 1893.3333333333335, 1958.75, 2000.0],
    dtype=np.float32,
)

# --- Observation / action dims (envs/env_base.py:27-32)
ACTION_DIM_AC1 = 4
ACTION_DIM_AC2 = 3
OBS_AC1 = 26
OBS_AC2 = 24
OBS_ESC_AC1 = 30
OBS_ESC_AC2 = 29
# Actor input-branch split points (models/ac_models_hetero.py:19-20)
SS_AGENT_AC1 = 12
SS_AGENT_AC2 = 10

# Action space: MultiDiscrete([13, 9, 2, 2]) for AC1, [13, 9, 2] for AC2
# (envs/env_hetero.py:37-43). Padded to 4 components for AC2 in this
# framework; the 4th component is ignored.
ACTION_NVEC = np.array([13, 9, 2, 2], dtype=np.int32)

# --- High-level (commander) dims (envs/env_hier.py:20-25)
N_OPP_HL = 2
OBS_OPP_HL = 10
OPP_SIZE_HL = N_OPP_HL * OBS_OPP_HL
OBS_FRI_HL = 5
FRI_SIZE_HL = 2 * OBS_FRI_HL
OBS_HL = 14 + N_OPP_HL * OBS_OPP_HL
ACT_DIM_HL = N_OPP_HL + 1

# Macro-action sub-step loop (envs/env_hier.py:33-34)
HL_N_SUB_STEPS = 15
HL_MIN_SUB_STEPS = 10

# --- Map (config.py:38, env_base.py:43): lower-left corner (lon=7, lat=5)
MAP_LEFT_LON = 7.0
MAP_BOTTOM_LAT = 5.0
DEFAULT_MAP_SIZE_LL = 0.3
DEFAULT_MAP_SIZE_HL = 0.5

# --- Episode horizons per curriculum level (config.py:94-98)
HORIZON_LEVEL = {1: 150, 2: 200, 3: 300, 4: 350, 5: 400}
HORIZON_HL = 500

# --- Missile cooldown ranges (env_base.py:230)
MISSILE_WAIT_LL = (7, 17)
MISSILE_WAIT_HL = (8, 12)
