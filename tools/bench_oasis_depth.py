"""A/B the OASIS Pallas stack depth on the chip: roll traffic scales with
the depth cap D, so D=64 should cut kernel compute ~2x vs the default 128
if the measured worst-case stack (~54 pools on DG-like calcium at the
production s_min=0.55) holds. Reports redo-flag counts so a depth that
starts flagging shows up immediately.

    python tools/bench_oasis_depth.py [n_traces]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from calciumgan_tpu.train import enable_compilation_cache  # noqa: E402
from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas  # noqa: E402


def main(n_traces=16384, T=2048, reps=5):
    enable_compilation_cache()
    from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces
    traces = synth_ar1_traces(np.random.default_rng(1), n_traces, T)
    dev = jax.device_put(traces)

    for depth in (128, 96, 64):
        @jax.jit
        def run(y, eps, depth=depth):
            _, s, redo = oasis_ar1_pallas(y + eps, g=0.95, lam=0.0,
                                          s_min=0.55, depth=depth)
            # redo is a cause bitmask: count flagged LANES, not bit values
            return (s > 0.5).astype(jnp.int8).sum(), (redo != 0).sum()

        t0 = time.perf_counter()
        _, flags = run(dev, jnp.float32(0))
        flags = int(flags)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(run(dev, jnp.float32(1e-6 * (i + 1)))[0])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"depth={depth:3d}: median {med*1e3:7.2f} ms "
              f"({n_traces/med:9.1f} traces/s)  flags={flags}  "
              f"compile {compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
