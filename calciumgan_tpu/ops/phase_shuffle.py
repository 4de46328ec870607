"""WaveGAN phase shuffle as a pure function of a PRNG key.

The reference samples the shift with hidden TF global-RNG state inside a
Keras layer ``call`` (``gan/models/calciumgan.py:106-138``,
``calciumgan2d.py:113-153``): ONE shift per call, shared across the batch,
reflect-padded then cropped back. Here the shift comes from an explicit key,
making training steps replayable and shard-deterministic (per-batch shift,
replica-identical when the key is replicated — SURVEY.md §7 "PhaseShuffle
randomness").

Traced-shift implementation: pad statically by ``m`` (``n``) with reflect
mode, then ``dynamic_slice`` at offset ``m + shift`` — identical to the
reference's shift>0 / shift<0 two-case padding, but jit-friendly (no
data-dependent shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def phase_shuffle(x: jnp.ndarray, key: jax.Array, m: int,
                  axis: int = 1) -> jnp.ndarray:
    """Shift ``x`` along ``axis`` by u ~ U{-m..m}, reflect-padding the edges.

    x: (batch, width, channels)-style array; one shift for the whole batch.
    """
    if m == 0:
        return x
    shift = jax.random.randint(key, (), -m, m + 1)
    return _shift_axis(x, shift, m, axis)


def phase_shuffle_2d(x: jnp.ndarray, key: jax.Array, m: int, n: int,
                     w_axis: int = 1, c_axis: int = 2) -> jnp.ndarray:
    """2-D variant: independent temporal (m) and neuron (n) shifts
    (reference calciumgan2d.py:113-153)."""
    kw, kc = jax.random.split(key)
    if m > 0:
        x = _shift_axis(x, jax.random.randint(kw, (), -m, m + 1), m, w_axis)
    if n > 0:
        x = _shift_axis(x, jax.random.randint(kc, (), -n, n + 1), n, c_axis)
    return x


def _shift_axis(x: jnp.ndarray, shift: jnp.ndarray, m: int,
                axis: int) -> jnp.ndarray:
    width = x.shape[axis]
    if width <= 1:
        return x
    # reflect padding needs pad <= width-1; clamp both pad and shift so tiny
    # feature maps (test configs) saturate instead of erroring (the reference
    # would raise inside tf.pad there)
    m = min(m, width - 1)
    shift = jnp.clip(shift, -m, m)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (m, m)
    padded = jnp.pad(x, pad, mode="reflect")
    starts = [jnp.zeros((), jnp.int32)] * x.ndim
    starts[axis] = (m + shift).astype(jnp.int32)
    return lax.dynamic_slice(padded, starts, x.shape)
