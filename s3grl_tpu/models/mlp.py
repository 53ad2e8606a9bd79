"""MLP building blocks with PyG-MLP-parity layer semantics.

The reference's SIGNNet is built from ``torch_geometric.nn.MLP`` with
``batch_norm=True, act_first=True`` (models.py:320-337). Per-layer order with
act_first: Linear -> activation -> BatchNorm -> Dropout; ``plain_last=True``
leaves the final Linear bare. Weight init follows torch.nn.Linear
(kaiming-uniform with a=sqrt(5), i.e. U(±1/sqrt(fan_in)) for both W and b) so
training dynamics track the reference closely.

Masked rows: padded CCN slots must not contaminate BatchNorm statistics, so
all norm layers here are mask-aware (stats over valid rows only) — the
reference has no padding and therefore no such concept.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    flax kernels are [in, out]; torch weights are [out, in] with
    fan_in = in_features, so bound = 1/sqrt(shape[0])."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Dense(nn.Module):
    """Linear layer with torch-default initialization."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over flattened valid rows.

    torch semantics: momentum 0.1 (torch convention: new = (1-m)*old + m*batch),
    eps 1e-5, biased variance for normalization. Statistics are computed over
    rows where ``mask`` is True; running stats update only in training.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        # x: [..., C]; mask: broadcastable to x[..., 0]
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(C, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(C, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            if mask is None:
                mean = x.reshape(-1, C).mean(axis=0)
                var = x.reshape(-1, C).var(axis=0)
                n = x.reshape(-1, C).shape[0]
            else:
                m = mask.reshape(-1).astype(jnp.float32)
                xf = x.reshape(-1, C)
                n = jnp.maximum(m.sum(), 1.0)
                mean = (xf * m[:, None]).sum(axis=0) / n
                var = (((xf - mean) ** 2) * m[:, None]).sum(axis=0) / n
            # torch running stats use the unbiased variance
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            if not self.is_initializing():
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y


class MLP(nn.Module):
    """PyG-style MLP (act_first, batch_norm, configurable plain_last)."""

    channel_list: Sequence[int]
    dropout: float = 0.0
    act: str = "relu"
    act_first: bool = True
    batch_norm: bool = True
    plain_last: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        act_fn = {"relu": nn.relu, "elu": nn.elu, "tanh": jnp.tanh}[self.act]
        n_layers = len(self.channel_list)
        for i, ch in enumerate(self.channel_list):
            x = Dense(ch)(x)
            is_last = i == n_layers - 1
            if is_last and self.plain_last:
                break
            if self.act_first:
                x = act_fn(x)
                if self.batch_norm:
                    x = MaskedBatchNorm()(x, mask=mask, train=train)
            else:
                if self.batch_norm:
                    x = MaskedBatchNorm()(x, mask=mask, train=train)
                x = act_fn(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
