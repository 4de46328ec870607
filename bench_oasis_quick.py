"""Quick OASIS kernel microbenchmark on the attached TPU (methodology per
BASELINE.md / tunnel-tpu rules: device-resident input, per-rep perturbation,
whole-output scalar sync, median of >=5). Uses the persistent compile cache
so retries after tunnel stalls skip recompiles.

    python bench_oasis_quick.py [n_traces ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from calciumgan_tpu.train import enable_compilation_cache
from calciumgan_tpu.ops.oasis import deconvolve_signals


def bench(n_traces, T=2048, reps=5):
    from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces
    # host-side (numpy) synthesis so data prep never waits on the tunnel
    traces = synth_ar1_traces(np.random.default_rng(1), n_traces, T)

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
        print(f"  n={n_traces} rep {i}: {times[-1]*1e3:.1f} ms", flush=True)
    med = float(np.median(times))
    print(f"n={n_traces:6d} T={T}: median {med*1e3:8.2f} ms "
          f"({n_traces/med:9.1f} traces/s)  compile {compile_s:.1f}s",
          flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    for n in [int(x) for x in (sys.argv[1:] or ["1024", "4096", "16384"])]:
        bench(n)
