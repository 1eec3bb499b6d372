"""CLI config surface (cli/args.py) vs reference config.py semantics."""

import os

from hhmarl_2d_tpu.algo.ppo import PPOConfig
from hhmarl_2d_tpu.algo.ppo_hier import HierPPOConfig
from hhmarl_2d_tpu.cli import args as ARGS


def test_mode_defaults_match_reference():
    # low-level (config.py:20-22, train_hetero.py:216-236)
    a0 = ARGS.parse(0, ["--log_base", "/tmp/none"])
    assert a0.num_agents == 2 and a0.num_opps == 2
    assert a0.kl_target == 0.025 and a0.gae_lambda == 0.95
    assert a0.gamma == 0.99 and a0.clip == 0.25 and a0.lr == 1e-4
    assert a0.horizon == 150  # level 1 (config.py:94-98)
    # commander (train_hier.py:182-189: kl 0.05, no lambda override)
    a1 = ARGS.parse(1, ["--log_base", "/tmp/none"])
    assert a1.num_agents == 3 and a1.num_opps == 3
    assert a1.kl_target == 0.05 and a1.gae_lambda == 1.0
    assert a1.log_name == "Commander_3_vs_3" and a1.horizon == 500


def test_ppo_kwargs_thread_into_both_trainer_configs():
    argv = ["--log_base", "/tmp/none", "--kl_target", "0.01",
            "--entropy_coeff", "0.003", "--clip", "0.3", "--vf_clip", "5",
            "--kl_coeff", "0.4", "--num_envs", "64", "--gamma", "0.9"]
    a = ARGS.parse(0, argv)
    ppo = PPOConfig(**ARGS.ppo_kwargs(a))
    assert ppo.kl_target == 0.01 and ppo.entropy_coeff == 0.003
    assert ppo.clip == 0.3 and ppo.vf_clip == 5.0 and ppo.gamma == 0.9
    assert ppo.kl_coeff_init == 0.4 and ppo.num_envs == 64
    hp = HierPPOConfig(**ARGS.ppo_kwargs(ARGS.parse(1, argv)))
    assert hp.kl_target == 0.01 and hp.lam == 1.0


def test_restore_chaining_and_escape_promotion(tmp_path):
    base = str(tmp_path)
    # L2 fight restores from an existing L1 run (config.py:65-84)
    os.makedirs(os.path.join(base, "L1_fight_2-vs-2"))
    a = ARGS.parse(0, ["--log_base", base, "--level", "2"])
    assert a.restore and a.restore_path == os.path.join(
        base, "L1_fight_2-vs-2", "checkpoint")
    # escape starts at level 3, promotes to 5 once L3 escape exists
    # (config.py:86-92)
    e = ARGS.parse(0, ["--log_base", base, "--agent_mode", "escape"])
    assert e.level == 3 and not e.restore
    os.makedirs(os.path.join(base, "L3_escape_2-vs-2"))
    e5 = ARGS.parse(0, ["--log_base", base, "--agent_mode", "escape"])
    assert e5.level == 5 and e5.restore
    assert e5.horizon == 400  # level-5 horizon table


def test_find_free_port_skips_bound_port():
    """The reference's incrementing TensorBoard port scan
    (train_hetero.py:264-272) equivalent."""
    import socket

    from hhmarl_2d_tpu.utils.metrics import find_free_port

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        taken = s.getsockname()[1]
        port = find_free_port(taken)
        assert port != taken and port > taken


def test_tensorboard_flag_parses():
    a = ARGS.parse(0, ["--tensorboard", "--epochs", "1"])
    assert a.tensorboard
    a = ARGS.parse(0, ["--epochs", "1"])
    assert not a.tensorboard
