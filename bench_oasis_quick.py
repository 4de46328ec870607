"""Quick OASIS kernel microbenchmark on the attached TPU (methodology per
BASELINE.md / tunnel-tpu rules: device-resident input, per-rep perturbation,
whole-output scalar sync, median of >=7)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from calciumgan_tpu.ops.oasis import ar1_filter, deconvolve_signals


def bench(n_traces, T=2048, reps=7):
    rng = np.random.default_rng(1)
    spikes = (rng.random((n_traces, T)) < 0.02).astype(np.float32)
    traces = np.asarray(ar1_filter(spikes, g=(0.95,)))
    traces = traces + 0.3 * rng.standard_normal(
        traces.shape).astype(np.float32)

    @jax.jit
    def run(y, eps):
        return deconvolve_signals(y + eps).sum()

    dev = jax.device_put(traces)
    t0 = time.perf_counter()
    float(run(dev, jnp.float32(0)))  # compile
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(reps):
        start = time.perf_counter()
        float(run(dev, jnp.float32(1e-6 * (i + 1))))
        times.append(time.perf_counter() - start)
    med = float(np.median(times))
    print(f"n={n_traces:6d} T={T}: median {med*1e3:8.2f} ms "
          f"({n_traces/med:9.1f} traces/s)  compile {compile_s:.1f}s  "
          f"all={[round(t*1e3,1) for t in sorted(times)]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for n in [int(x) for x in (sys.argv[1:] or ["1024", "4096", "16384"])]:
        bench(n)
