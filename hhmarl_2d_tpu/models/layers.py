"""Shared building blocks for the actor-critic models.

The reference builds everything from RLlib ``SlimFC`` (orthogonal init +
Tanh) plus torch ``MultiheadAttention``/``GRU`` residuals with row-wise L2
normalization (models/ac_models_hetero.py:22-27,268-284).

Mixed precision: every block takes a ``dtype`` (the *computation* dtype;
``None`` = float32).  Parameters and the optimizer always stay float32 --
passing ``jnp.bfloat16`` runs the matmuls on the MXU's native bf16 path
(~2x fp32 on v5e) while the loss, GAE and distribution math remain fp32
(the models cast their outputs back).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class SlimFC(nn.Module):
    """Dense + optional tanh with orthogonal kernel init (RLlib SlimFC)."""

    features: int
    activate: bool = True
    dtype: Optional[Any] = None  # computation dtype; params stay fp32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype,
                     kernel_init=nn.initializers.orthogonal(),
                     bias_init=nn.initializers.zeros)(x)
        return nn.tanh(x) if self.activate else x


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize(p=2) with a smooth norm.

    ``sqrt(sum(x^2) + eps)`` instead of ``max(||x||, eps)``: identical to
    within 1e-6 for any non-degenerate row, but with a finite gradient at
    x == 0.  Dead agents produce all-zero observation rows, and at
    initialization (zero biases) those rows reach this residual normalize
    as exactly zero -- jnp.linalg.norm's 0/0 gradient would poison the
    whole batch with NaNs there.

    The squared-sum accumulates in fp32 regardless of ``x.dtype`` (a bf16
    sum of ~100 squares loses mantissa); the result is cast back.
    """
    xf = x.astype(jnp.float32)
    sq = jnp.sum(xf * xf, axis=axis, keepdims=True)
    return (xf / jnp.sqrt(sq + eps)).astype(x.dtype)


class TimeAttention(nn.Module):
    """Bidirectional self-attention over the episode time axis.

    Equivalent to the reference's ``nn.MultiheadAttention(d, 2,
    batch_first=True)`` applied to ``add_time_dimension`` sequences with no
    mask (ac_models_hetero.py:268-270): full unmasked attention over the
    whole sampled sequence.  Input/output [B, T, d].
    """

    features: int
    num_heads: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x_bt, seg=None):
        """``seg`` [B, T] (optional): episode segment ids; attention is
        masked to same-segment positions so training chunks that span an
        auto-reset boundary do not leak across episodes (RLlib sequences
        never cross episodes either)."""
        mask = None
        if seg is not None:
            same = seg[:, None, :, None] == seg[:, None, None, :]
            mask = same  # [B, 1, T, T] broadcast over heads
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.features,
            out_features=self.features,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x_bt, x_bt, mask=mask)
