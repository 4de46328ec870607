"""Benchmark: WGAN-GP train-step throughput on the paper recipe.

Measures steps/sec of the full jitted WGAN-GP train step (n_critic=5
discriminator updates incl. gradient penalty + 1 generator update per step)
at the reference's headline configuration (``/root/reference/README.md:88-93``):
sl2048, batch 128, num_units 64, kernel 24, strides 2, m=10, layer_norm,
mixed precision (bf16 here) — on whatever devices are visible (one mesh over
all of them; steps/sec/chip is also reported inside the JSON's metadata).

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is the ratio against 1.0 steps/sec — an optimistic estimate
of the reference TF2 graph on its single CUDA-10.1-era GPU for this recipe
(5 critic iterations x 4 forward/backward passes over ~10^9-FLOP conv
stacks per step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import numpy as np

ESTIMATED_REFERENCE_STEPS_PER_SEC = 1.0


def main():
    from calciumgan_tpu.algorithms.registry import get_algorithm
    from calciumgan_tpu.models.registry import get_models
    from calciumgan_tpu.parallel import mesh as mesh_lib
    from calciumgan_tpu.train import enable_compilation_cache
    from __graft_entry__ import _flagship_config

    enable_compilation_cache()

    n_dev = len(jax.devices())
    batch_size = 128
    cfg = _flagship_config(batch_size=batch_size, data_parallelism=n_dev,
                           model_parallelism=1)

    generator, discriminator = get_models(cfg)
    algo = get_algorithm(cfg, generator, discriminator)
    mesh = mesh_lib.create_mesh(n_dev, 1)
    state = algo.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state, mesh_lib.state_shardings(mesh, state))
    train_fn, _, _ = mesh_lib.make_step_fns(algo, mesh, state)

    batch = np.random.default_rng(0).random(
        (batch_size,) + tuple(cfg.signal_shape)).astype(np.float32)
    batch = mesh_lib.shard_batch(mesh, batch)
    key = jax.random.PRNGKey(1)

    def sync(logs):
        # On the hosted tunnel device, block_until_ready on a donated output
        # can return before execution finishes; a device_get of a fresh
        # scalar output is the only reliable synchronisation point.
        return float(np.asarray(jax.device_get(logs["loss/generator"])))

    # compile + warmup
    for i in range(3):
        state, logs = train_fn(state, batch, jax.random.fold_in(key, i))
        sync(logs)

    # pipelined throughput: chain `steps` dispatches and sync once on the
    # final step's logs (whose value depends on the whole state chain) —
    # this is how the training loop actually runs; per-step sync would add
    # ~30 ms of host/tunnel RPC per step. Median of 3 repetitions for
    # robustness to transient contention on a shared chip.
    steps = 20
    times = []
    for r in range(3):
        start = time.perf_counter()
        for i in range(steps):
            state, logs = train_fn(
                state, batch, jax.random.fold_in(key, 100 + steps * r + i))
        sync(logs)
        times.append((time.perf_counter() - start) / steps)

    steps_per_sec = 1.0 / float(np.median(times))
    print(json.dumps({
        "metric": "wgan_gp_train_steps_per_sec_sl2048_bs128",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(
            steps_per_sec / ESTIMATED_REFERENCE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
