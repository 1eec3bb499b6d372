"""Environment configuration.

One frozen dataclass replaces the reference's argparse ``Config`` object
smuggled into envs via ``env_config={"args": args}`` (config.py:5-111).
All fields are static: jitted env functions specialize on them.
"""

from __future__ import annotations

import dataclasses

from hhmarl_2d_tpu import constants as C


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    # scenario shape
    num_agents: int = 2
    num_opps: int = 2
    map_size: float = C.DEFAULT_MAP_SIZE_LL

    # curriculum / behavior
    level: int = 1                      # 1..5 (config.py:17)
    agent_mode: str = "fight"           # "fight" | "escape"
    horizon: int = 150                  # set from HORIZON_LEVEL by make_*

    # rewards (config.py:41-46)
    glob_frac: float = 0.0
    rew_scale: float = 1.0
    esc_dist_rew: bool = False
    friendly_kill: bool = True          # friendly_check in the simulator
    friendly_punish: bool = False

    # high-level (config.py:23,44)
    hier_opp_fight_ratio: int = 75
    hier_action_assess: bool = True
    # opponents in the commander obs / action space (the reference bakes
    # N_OPP_HL=2 into three files, envs/env_hier.py:20; here it is config)
    n_opp_hl: int = 2

    @property
    def total_num(self) -> int:
        return self.num_agents + self.num_opps

    @property
    def obs_hl(self) -> int:
        """Commander obs width: own 4 + 10 per listed opp + 2x5 friendly."""
        return 14 + 10 * self.n_opp_hl

    @property
    def act_dim_hl(self) -> int:
        """Commander action space: escape + n_opp_hl targets."""
        return self.n_opp_hl + 1

    @property
    def n_slots(self) -> int:
        return self.total_num


def make_lowlevel_config(level: int = 1, agent_mode: str = "fight",
                         **kw) -> EnvConfig:
    """Defaults of Config(0) (config.py:20-22,38,94-98)."""
    kw.setdefault("horizon", C.HORIZON_LEVEL[level])
    kw.setdefault("map_size", C.DEFAULT_MAP_SIZE_LL)
    kw.setdefault("num_agents", 2)
    kw.setdefault("num_opps", 2)
    return EnvConfig(level=level, agent_mode=agent_mode, **kw)


def make_highlevel_config(**kw) -> EnvConfig:
    """Defaults of Config(1): 3-vs-3, 0.5 deg map, horizon 500
    (config.py:20-22,38,98)."""
    kw.setdefault("horizon", C.HORIZON_HL)
    kw.setdefault("map_size", C.DEFAULT_MAP_SIZE_HL)
    kw.setdefault("num_agents", 3)
    kw.setdefault("num_opps", 3)
    return EnvConfig(level=5, agent_mode="fight", **kw)
