"""Shared building blocks for the model zoo.

Keras-parity choices (so architectures train like the reference's):
- glorot_uniform kernel init, zero bias (Keras Dense/Conv defaults),
- LeakyReLU alpha 0.3 (Keras default, used via ``activation_fn('leakyrelu')``
  — reference ``gan/models/utils.py:6-8``),
- LayerNorm/BatchNorm epsilon 1e-3 (Keras defaults),
- generator/discriminator outputs forced float32 under mixed precision
  (reference ``calciumgan.py:99-101,190``).

TPU-native departures:
- a real 1-D ``nn.ConvTranspose`` instead of the reference's
  expand-dims/Conv2DTranspose/squeeze emulation (``models/utils.py:65-94``,
  needed because TF 2.3 lacked Conv1DTranspose),
- phase shuffle consumes an explicit linen RNG collection ``'phase'``
  (see :mod:`calciumgan_tpu.ops.phase_shuffle`).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

glorot = nn.initializers.glorot_uniform


def activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.3)
    if name == "linear":
        return lambda x: x
    return getattr(nn, name)


def count_params(params) -> int:
    import jax
    return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(params))


class Norm(nn.Module):
    """Optional BatchNorm and/or LayerNorm, applied in the reference's order
    (batch_norm then layer_norm — ``calciumgan.py:42-45``).

    Deliberate deviation: LayerNorm is SKIPPED when the feature axis has
    size 1. Normalising a single element yields exactly its (zero-init)
    bias, independent of the input — in the reference this makes the
    ``calciumgan2d`` generator's final layer (filters=num_channels=1 for
    non-fft data, ``calciumgan2d.py:93-103``) emit a trainable constant and
    cuts all gradient flow to the conv stack below, so conv2d + layer_norm
    silently cannot train there. Skipping the no-op norm keeps the model
    trainable; layers with >1 channel are normalised as usual."""

    batch_norm: bool = False
    layer_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = True):
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.99, epsilon=1e-3, dtype=self.dtype)(x)
        if self.layer_norm and x.shape[-1] > 1:
            x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(x)
        return x


def noise_width(sequence_length: int, strides: int,
                num_convolutions: int = 5) -> int:
    """Validated initial temporal width for the transpose-conv stack
    (reference ``calculate_noise_shape`` — ``calciumgan.py:15-19``)."""
    w = sequence_length / (strides ** num_convolutions)
    if not float(w).is_integer():
        raise ValueError(
            f"sequence_length {sequence_length} not divisible by "
            f"strides**{num_convolutions} ({strides ** num_convolutions}); "
            f"w={w} is not an integer")
    return int(w)


def dense(features: int, dtype: Dtype, name: str | None = None) -> nn.Dense:
    return nn.Dense(features, kernel_init=glorot(), dtype=dtype, name=name)


def conv(features: int, kernel: Sequence[int], strides: Sequence[int],
         dtype: Dtype, name: str | None = None) -> nn.Conv:
    return nn.Conv(features, kernel_size=tuple(kernel),
                   strides=tuple(strides), padding="SAME",
                   kernel_init=glorot(), dtype=dtype, name=name)


def conv_transpose(features: int, kernel: Sequence[int],
                   strides: Sequence[int], dtype: Dtype,
                   name: str | None = None) -> nn.ConvTranspose:
    return nn.ConvTranspose(features, kernel_size=tuple(kernel),
                            strides=tuple(strides), padding="SAME",
                            kernel_init=glorot(), dtype=dtype, name=name)
