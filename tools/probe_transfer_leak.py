"""Measure host-memory retention of host->device transfers.

The hosted tunnel TPU client was observed to retain ~1.2x the bytes of
EVERY host->device transfer in host RSS, permanently: `Array.delete()`,
`jax.clear_caches()` and gc reclaim nothing, and `client.live_buffers()`
is empty while RSS keeps growing. Streaming ~50 MB training batches
therefore leaks ~1.5 GB per epoch — a 150-epoch single-process run was
OOM-killed at 112 GB RSS. This probe quantifies the effect; the framework
mitigation is `--device_store` (data/pipeline.py:DeviceStore), which
stages the dataset once and gathers batches in-graph, plus
`--checkpoint_every` chunked runs for datasets too large to stage.

    python tools/probe_transfer_leak.py [n_uploads] [mb_per_upload]
"""

import gc
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return float("nan")


def main(n_uploads: int = 20, mb: int = 50):
    @jax.jit
    def f(x):
        return (x * 2.0).sum()

    rng = np.random.default_rng(0)
    rows = max(1, mb * 2**20 // (2048 * 4))
    base = rng.random((rows, 2048)).astype(np.float32)
    float(f(jax.device_put(base)))  # warm compile + first transfer
    gc.collect()
    r0 = rss_mb()
    print(f"backend={jax.default_backend()} warm rss {r0:.0f} MB; "
          f"uploading {n_uploads} x {base.nbytes / 2**20:.1f} MB ...")
    for i in range(n_uploads):
        a = jax.device_put(base + np.float32(i))  # fresh bytes each time
        float(f(a))
        a.delete()
    gc.collect()
    r1 = rss_mb()
    leaked = r1 - r0
    print(f"rss {r1:.0f} MB: leaked {leaked:.0f} MB "
          f"({leaked / n_uploads:.1f} MB/upload, "
          f"{leaked / (n_uploads * base.nbytes / 2**20):.2f}x bytes shipped)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
