"""hhmarl_2d_tpu: a TPU-native framework for Heterogeneous Hierarchical
Multi-Agent Reinforcement Learning in 2D air combat.

A from-scratch JAX/XLA re-design of the capabilities of IDSIA/hhmarl_2D
(arXiv:2309.11247): a vectorized air-combat simulator, low-level fight /
escape environments with a 5-level curriculum and fictitious self-play, a
hierarchical commander environment, flax actor-critic models with
centralized critics, and an on-device PPO learner sharded over TPU meshes.
"""

__version__ = "0.1.0"
