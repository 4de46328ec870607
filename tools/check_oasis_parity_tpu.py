"""Hardware parity sweep: the full OASIS eval dispatch vs the f64 golden.

The Pallas kernels compute in f32; a merge decision whose margin falls
inside the kernel's error band can flip against the f64 exact host kernel
(one observed flip per ~4e7 decisions, tools/debug_long_mismatch.py).
Those decisions are borderline-flagged in-kernel (redo bit 2) and
host-redone, so the DISPATCH (`deconvolve_signals_host`) must be exactly
f64-parity on hardware. This sweep validates that across seeds and both
kernel variants (whole-trace at sl2048, time-chunked at 20k frames):

    python tools/check_oasis_parity_tpu.py [seeds]

Prints per-seed mismatch counts and flag rates; exits nonzero on any
mismatch. Run on the real chip (asserts backend == tpu).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from calciumgan_tpu.ops.oasis import deconvolve_signals_host, _exact_spikes_host
from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces


def check(seed: int, n: int, T: int) -> int:
    y = synth_ar1_traces(np.random.default_rng(seed), n, T)
    s = deconvolve_signals_host(y)
    s_ref = _exact_spikes_host(y, 0.95, 0.55, 0.5)
    mism = int((s != s_ref).sum())
    print(f"seed {seed} ({n}x{T}): {mism} mismatched spikes of {s_ref.size} "
          f"({int(s_ref.sum())} spikes)")
    return mism


def main(seeds: int = 4) -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    bad = 0
    for seed in range(1, 1 + seeds):
        bad += check(seed, 16384, 2048)   # short kernel, eval chunk size
    bad += check(101, 2048, 20000)        # long kernel, whole recordings
    if bad:
        raise SystemExit(f"FAIL: {bad} mismatched spikes")
    print("PARITY_OK")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
