"""Mesh construction, sharding rules, and jitted step factories."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data_parallelism: int = -1, model_parallelism: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D (data, model) mesh; model axis is 1 unless model sharding is on.

    ``data_parallelism=-1`` uses every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data_parallelism == -1:
        if len(devices) % model_parallelism:
            raise ValueError(
                f"{len(devices)} devices not divisible by model_parallelism "
                f"{model_parallelism}")
        data_parallelism = len(devices) // model_parallelism
    n = data_parallelism * model_parallelism
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    mesh_devices = mesh_utils.create_device_mesh(
        (data_parallelism, model_parallelism), devices=devices[:n])
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; on a long-context mesh the
    sequence dim (axis 1 of NWC signals) additionally shards over 'time'."""
    rest = [None] * (ndim - 1)
    if "time" in mesh.axis_names and ndim >= 3:
        rest[0] = "time"
    return NamedSharding(mesh, P(DATA_AXIS, *rest))


# ---------------------------------------------------------------------------
# Parameter sharding rules (model parallelism).
#
# Everything is replicated except the two parameter matrices whose size grows
# with sequence length (SURVEY.md §5.7: the discriminator's flatten->Dense(1)
# head is O(seq)):
#   * generator input projection kernel  (noise_dim, w0*noise_dim): shard the
#     output features,
#   * discriminator head kernel (seq/strides^5 * 5u, 1): shard the input
#     features (a psum over 'model' joins the partial dot products).
# ---------------------------------------------------------------------------

def _param_spec(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if "kernel" not in names or getattr(leaf, "ndim", 0) != 2:
        return P()
    if any(n.startswith("Dense_") for n in names):
        din, dout = leaf.shape
        if dout == 1:            # discriminator head: shard input features
            return P(MODEL_AXIS, None)
        if dout >= 8 * din:      # generator/mlp input projection
            return P(None, MODEL_AXIS)
    return P()


def state_shardings(mesh: Mesh, state: Any) -> Any:
    """Sharding pytree for a GANState: params per rules, rest replicated."""
    def to_sharding(path, leaf):
        if mesh.shape[MODEL_AXIS] == 1:
            return NamedSharding(mesh, P())
        spec = _param_spec(path, leaf)
        # only shard if the dimension divides evenly
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[MODEL_AXIS]:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, state)


# ---------------------------------------------------------------------------
# Jitted step factories
# ---------------------------------------------------------------------------

def make_step_fns(algo, mesh: Mesh, state: Any):
    """Build jit-compiled (train_step, eval_step, generate) over the mesh.

    The batch is sharded over the data axis; the state keeps its sharding
    (replicated params or model-sharded per the rules); RNG keys are
    replicated so phase-shuffle shifts are replica-identical, matching the
    reference's one-shift-per-batch semantics (SURVEY.md §7).
    """
    if mesh.shape[MODEL_AXIS] > 1:
        # Shardy (the default partitioner in jax 0.9) miscompiles the
        # WGAN-GP step under model parallelism: with a model-sharded
        # discriminator carried through the lax.scan critic loop, the
        # combination of second-order autodiff (gradient penalty) and the
        # optimizer update inside the scan body makes every batch reduction
        # in the discriminator's forward come out exactly data_axis_size
        # times too large (an extra all-reduce over 'data' on an
        # already-replicated sum). Classic GSPMD partitions the identical
        # program correctly, so fall back to it whenever the model axis is
        # real. Regression: tests/test_algorithms.py
        # test_model_parallel_mesh_runs.
        jax.config.update("jax_use_shardy_partitioner", False)

    ss = state_shardings(mesh, state)
    rep = replicated(mesh)
    ndim = len(algo.signal_shape) + 1
    data_in = batch_sharding(mesh, ndim)

    train = jax.jit(
        algo.train_step,
        in_shardings=(ss, data_in, rep),
        out_shardings=(ss, rep),
        donate_argnums=(0,))

    evaluate = jax.jit(
        algo.eval_step,
        in_shardings=(ss, data_in, rep),
        out_shardings=(data_in, rep))

    generate = jax.jit(
        lambda state, noise, key: algo.generate(state, noise, key,
                                                denorm=False),
        in_shardings=(ss, batch_sharding(mesh, 2), rep),
        out_shardings=data_in)

    return train, evaluate, generate


def local_batch_size(global_batch: int) -> int:
    """Per-process batch rows for a global batch (multi-host: each process
    feeds its share; single host: the full batch)."""
    count = jax.process_count()
    if global_batch % count:
        raise ValueError(
            f"batch_size {global_batch} not divisible by process count "
            f"{count}")
    return global_batch // count


def put_batch(mesh: Mesh, a: np.ndarray):
    """Assemble a globally-sharded batch from this process's local rows.

    Single host: a plain ``device_put`` with batch sharding. Multi-host:
    ``jax.make_array_from_process_local_data`` so each process contributes
    its own rows instead of every process shipping (and mostly discarding) a
    full global batch."""
    a = np.asarray(a)
    sharding = batch_sharding(mesh, a.ndim)
    if jax.process_count() == 1:
        return jax.device_put(a, sharding)
    global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
    return jax.make_array_from_process_local_data(sharding, a, global_shape)


def local_rows(array) -> np.ndarray:
    """This process's rows of a batch-sharded global array (row order
    preserved, model-axis replicas dropped). Single host: the whole array."""
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(array))
    # keep one copy per distinct row range: devices along the model axis
    # hold identical data (replica_id > 0)
    shards = [s for s in array.addressable_shards if s.replica_id == 0]
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(jax.device_get(s.data))
                           for s in shards], axis=0)


def shard_batch(mesh: Mesh, *arrays):
    """Stage host arrays as globally-sharded batches (see :func:`put_batch`;
    callers provide per-process rows divisible by the local device count)."""
    out = [put_batch(mesh, a) for a in arrays]
    return out[0] if len(out) == 1 else tuple(out)


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad dim 0 up to a multiple (repeating the last row); returns
    (padded, real_count)."""
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    filler = np.repeat(batch[-1:], pad, axis=0)
    return np.concatenate([batch, filler], axis=0), n
