"""A/B the short (whole-trace) OASIS kernel: classic vs precise machine.

The precise machine earns a ~7x tighter borderline band (fewer host
redos: classic flags ~2.4% of sl2048 lanes at tol 1e-5) but swaps the w
stack's accumulation for per-eval closed-form exp/expm1 work. At depth 64
the roll traffic is small, so the extra transcendentals are a larger
relative cost than in the long kernel — this measures whether the
end-to-end trade (kernel time + host redo of flagged lanes) favours
adopting precise mode for the eval path's short dispatches too.

Methodology per BASELINE.md: device-resident input, per-rep perturbation,
whole-output scalar sync, median of >=5.

    python tools/ab_short_precise.py [n_traces] [T]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from calciumgan_tpu.train import enable_compilation_cache
from calciumgan_tpu.ops.oasis import _DEPTH_LADDER, _MERGE_BUDGET, _flag_tol
from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas
from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces


def main(n: int = 16384, T: int = 2048) -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    enable_compilation_cache()
    traces = synth_ar1_traces(np.random.default_rng(1), n, T)

    @functools.partial(jax.jit, static_argnames=("precise",))
    def run(y, eps, precise):
        _, s, redo = oasis_ar1_pallas(
            y + eps, g=0.95, lam=0.0, s_min=0.55, depth=_DEPTH_LADDER[0],
            merge_attempts=_MERGE_BUDGET, precise=precise,
            flag_tol=_flag_tol(0.55, 0.5, precise=precise))
        return (s > 0.5).astype(jnp.int8).sum() + redo.sum(), redo

    dev = jax.device_put(traces)
    for precise in (False, True):
        out, redo = run(dev, jnp.float32(0), precise)
        float(out)  # compile + sync
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            out, redo = run(dev, jnp.float32(1e-6 * (i + 1)), precise)
            float(out)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        r = np.asarray(jax.device_get(redo))
        flagged = int((r != 0).sum())
        # host-redo cost estimate at the measured C++ rate (~13.6k
        # traces/s/core at sl2048): what the flags add end-to-end
        redo_s = flagged / 13600.0
        print(f"precise={precise}: kernel {med * 1e3:7.2f} ms "
              f"({n / med:9.1f} traces/s); flagged {flagged}/{n} "
              f"({100 * flagged / n:.2f}%: depth "
              f"{int(((r & 1) != 0).sum())}, merge "
              f"{int(((r & 2) != 0).sum())}, borderline "
              f"{int(((r & 4) != 0).sum())}) -> est host redo "
              f"{redo_s * 1e3:.0f} ms, end-to-end "
              f"{n / (med + redo_s):9.1f} traces/s", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
