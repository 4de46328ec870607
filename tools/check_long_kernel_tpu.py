"""TPU-path parity + warm throughput of the time-chunked long OASIS kernel
on whole-recording traces (the `dataset/spike_train_inference.py` scale;
reference hot loop: /root/reference/dataset/spike_train_inference.py:24-32).

    python tools/check_long_kernel_tpu.py

Asserts bit-exact spike parity with the exact host kernel on 20k-frame
traces through the full `deconvolve_signals_host` ladder dispatch, then
times a warm repeat call (the ladder compiles one program per (batch,
rung) shape; the first call pays the tunnel compile).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from calciumgan_tpu.ops.oasis import deconvolve_signals_host, _exact_spikes_host
from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces


def main(n: int = 2048, T: int = 20000) -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(11)
    y = synth_ar1_traces(rng, n, T)
    t0 = time.perf_counter()
    s_tpu = deconvolve_signals_host(y)
    t1 = time.perf_counter()
    print(f"cold (incl compile): {n / (t1 - t0):.1f} traces/s ({t1 - t0:.1f}s)")
    times = []
    for i in range(3):
        y2 = y + np.float32(1e-6 * (i + 1))  # fresh input, same shape
        t0 = time.perf_counter()
        s2 = deconvolve_signals_host(y2)
        times.append(time.perf_counter() - t0)
    warm = n / float(np.median(times))
    print(f"warm host-to-host: {warm:.1f} traces/s (median of 3; "
          f"{np.median(times):.2f}s — on the tunnel this is dominated by "
          f"the ~{n * T * 4 >> 20} MB upload at ~400 ms/8 MB)")

    # device-resident dispatch: the kernel cost users pay when traces are
    # already on the mesh (and what a production PCIe host approaches).
    # A/B: classic machine (v, w accumulated f32; band 1e-5) vs the
    # production PRECISE machine (compensated v, closed-form w; ~7x
    # tighter band) — same roll traffic, so throughput should be close
    # while the borderline-flag tax drops ~10x.
    import functools
    import jax.numpy as jnp
    from calciumgan_tpu.ops.oasis import (_MERGE_BUDGET, _LONG_CHUNK,
                                          _flag_tol, _long_ladder)
    from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas_long

    @functools.partial(jax.jit, static_argnames=("precise",))
    def run(yd, eps, precise):
        _, s, redo = oasis_ar1_pallas_long(
            yd + eps, g=0.95, lam=0.0, s_min=0.55, depth=_long_ladder(T)[0],
            chunk=_LONG_CHUNK, merge_attempts=_MERGE_BUDGET, precise=precise,
            flag_tol=_flag_tol(0.55, 0.5, precise=precise))
        return (s > 0.5).astype(jnp.int8).sum() + redo.sum(), redo

    yd = jax.device_put(y)
    for precise in (False, True):
        out, redo = run(yd, jnp.float32(0), precise)
        float(out)  # compile + sync
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out, redo = run(yd, jnp.float32(1e-6 * (i + 1)), precise)
            float(out)
            times.append(time.perf_counter() - t0)
        dev = n / float(np.median(times))
        r = np.asarray(jax.device_get(redo))
        print(f"device-resident first rung (depth {_long_ladder(T)[0]}, "
              f"precise={precise}): {dev:.1f} traces/s "
              f"({np.median(times):.3f}s); flagged {100 * (r != 0).mean():.1f}% "
              f"of lanes (depth {int(((r & 1) != 0).sum())}, "
              f"merge {int(((r & 2) != 0).sum())}, "
              f"borderline {int(((r & 4) != 0).sum())})")
    s_ref = _exact_spikes_host(y, 0.95, 0.55, 0.5)
    mism = int((s_tpu != s_ref).sum())
    print(f"mismatched spikes: {mism} of {s_ref.size} ({int(s_ref.sum())} spikes)")
    assert mism == 0, mism
    print("LONG_OK")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
