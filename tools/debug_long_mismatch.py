"""Locate the 1-spike TPU parity mismatch of the long OASIS kernel
(tools/check_long_kernel_tpu.py regression hunt)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from calciumgan_tpu.ops.oasis import _exact_spikes_host, _pallas_spikes_long, _LONG_CHUNK
from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces


def main(n: int = 2048, T: int = 20000) -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(11)
    y = synth_ar1_traces(rng, n, T)
    s_ref = _exact_spikes_host(y, 0.95, 0.55, 0.5)

    for depth in (512,):
        s, redo = _pallas_spikes_long(jax.device_put(y), 0.95, 0.55, 0.5,
                                      depth, _LONG_CHUNK, False)
        s = np.asarray(jax.device_get(s))
        redo = np.asarray(jax.device_get(redo))
        mism = np.nonzero((s != s_ref).any(axis=1))[0]
        print(f"depth={depth}: mismatching lanes {mism.tolist()}, "
              f"flags there {redo[mism].tolist()}, "
              f"total flagged {int((redo != 0).sum())} "
              f"(bits: depth={int(((redo & 1) != 0).sum())}, "
              f"merge={int(((redo & 2) != 0).sum())}, "
              f"borderline={int(((redo & 4) != 0).sum())})")
        for lane in mism[:4]:
            tm = np.nonzero(s[lane] != s_ref[lane])[0]
            print(f"  lane {lane} (flag {redo[lane]}): mismatch at t={tm.tolist()}"
                  f" kernel={s[lane][tm].tolist()} ref={s_ref[lane][tm].tolist()}")
            np.save(f"/tmp/mism_lane_{lane}.npy", y[lane])


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
