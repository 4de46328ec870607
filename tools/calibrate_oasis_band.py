"""Calibrate the OASIS borderline-flag band (classic and precise kernels).

Replays the f64 golden decision path (the pool merges the exact kernel
would take) through lane-parallel numpy emulations of BOTH Pallas stack
machines — the classic f32 one (v, w accumulated in f32) and the precise
one (compensated v, closed-form w, split-argument g^l;
``oasis_pallas._stack_machine_precise``) — and records, at every merge
decision, the emulated kernel margin next to the f64 margin. Because both
states follow the SAME decision path (replay), the difference is pure
arithmetic error: its maximum over a large corpus, times a safety factor,
IS the borderline band (``ops.oasis._BORDERLINE_TOL`` /
``_BORDERLINE_TOL_PRECISE``).

Also predicts the lane flag rate at candidate band widths (a lane flags
when any of its decisions falls inside the band), which is the host-redo
tax the band costs (round-4 VERDICT: 23% of lanes at 20k frames for the
classic kernel's 1e-5 band).

The emulation mirrors the kernel's event structure (one push per timestep,
``K`` lane-masked merge attempts, final violation check) so decision COUNTS
match, but margins are recorded only when the decision is ACTIVE (n >= 2).
numpy's f32 exp/expm1/div differ from the TPU VPU's by O(ulp); the safety
factor and the on-hardware parity sweep (tools/check_oasis_parity_tpu.py,
tools/check_long_kernel_tpu.py) cover that gap.

Usage: python tools/calibrate_oasis_band.py [n_traces] [T] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ml_dtypes
import numpy as np

from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces

F32 = np.float32
BF16 = ml_dtypes.bfloat16


def _bf16(x):
    """Round-trip through bf16 — the kernel stores the v compensation
    stack in bf16 (half the roll bytes; |ve| <= ulp(v)/2 so the loss is
    O(2^-9) OF the compensation term)."""
    return x.astype(BF16).astype(F32)
G = 0.95
S_MIN = 0.55
K = 2  # ops.oasis._MERGE_BUDGET


def _split12(x: float):
    x32 = F32(x)
    c = F32(x32 * F32(2 ** 12 + 1))
    hi = F32(c - F32(c - x32))
    return hi, F32(float(x) - float(hi))


class Emu:
    """Lane-parallel stack emulation: one column per trace, stacks grow
    downward from row 0 like the kernel (roll on push / masked roll on
    merge). Carries the f64 state (ground truth) plus both f32 kernel
    states; every decision is taken from the f64 margin sign (replay)."""

    def __init__(self, y: np.ndarray, depth: int):
        N, self.T = y.shape
        D = depth
        self.N, self.D = N, D
        self.y64 = y.astype(np.float64)
        self.y32 = y.astype(F32)
        # f64 state
        self.v64 = np.zeros((D, N))
        self.w64 = np.ones((D, N))
        self.l64 = np.ones((D, N))
        # classic f32 state
        self.vc = np.zeros((D, N), F32)
        self.wc = np.ones((D, N), F32)
        # precise f32 state
        self.vh = np.zeros((D, N), F32)
        self.ve = np.zeros((D, N), F32)
        self.lf = np.ones((D, N), F32)  # f32 lengths (shared by both)
        self.n = np.zeros(N, np.int64)
        self.lng64 = np.log(np.float64(G))
        self.lng32 = F32(self.lng64)
        self.hi12, self.lo12 = _split12(self.lng64)
        self.inv_1mg2 = F32(1.0 / (1.0 - float(G) ** 2))
        # recorded |margin_emu - margin_f64| / (1 + |rhs_f64|), and the f64
        # normalised margins (for flag-rate prediction), per lane
        self.err_c, self.err_p = [], []
        self.m64n = []          # |margin_f64| / (1+|rhs_f64|)
        self.lane = []          # lane index per recorded decision
        self.mc_n, self.mp_n = [], []  # emulated normalised |margins|

    # ---- f32 helper arithmetic (mirrors the kernel ops) ----
    def _gl_classic(self, l):
        return np.exp(l * self.lng32, dtype=F32)

    def _gl_precise(self, l):
        u = F32(l * self.lo12)
        poly = F32(1) + u * (F32(1) + u * (F32(0.5) + u * F32(1 / 6)))
        return F32(np.exp(l * self.hi12, dtype=F32) * poly)

    def _w_precise(self, l):
        # mirrors oasis_pallas._expm1_neg (lax.expm1 is unimplemented in
        # the Pallas TPU lowering): Taylor for |x| < 0.5, exp(x)-1 below
        x_hi = F32(F32(2 * l) * self.hi12)
        x_lo = F32(F32(2 * l) * self.lo12)
        x = F32(x_hi + x_lo)
        t = x.astype(F32)
        acc = F32(x * F32(1 / 362880))
        for inv in (1 / 40320, 1 / 5040, 1 / 720, 1 / 120, 1 / 24, 1 / 6,
                    1 / 2, 1.0):
            acc = F32(x * F32(F32(inv) + acc))
        t = acc
        u = x_lo
        p1 = F32(u * (F32(1) + u * (F32(0.5) + u * F32(1 / 6))))
        e = F32(np.exp(x_hi, dtype=F32) * F32(F32(1) + p1))
        m = np.where(x > F32(-0.5), t, F32(e - F32(1)))
        w = F32(-m * self.inv_1mg2)
        return np.where(l == 1, F32(1), w)

    def _margins(self):
        """(m64, rhs64, m_classic, rhs_c, m_precise, rhs_p) at the top."""
        v064, w064, v164, w164 = (self.v64[0], self.w64[0], self.v64[1],
                                  self.w64[1])
        l1_64 = self.l64[1]
        gl64 = np.exp(l1_64 * self.lng64)
        rhs64 = gl64 * (v164 / w164) + S_MIN
        m64 = v064 / w064 - rhs64

        l1 = self.lf[1]
        glc = self._gl_classic(l1)
        rhs_c = F32(glc * F32(self.vc[1] / self.wc[1]) + F32(S_MIN))
        m_c = F32(F32(self.vc[0] / self.wc[0]) - rhs_c)

        # precise kernel: division-free cross-multiplied decision
        #   F = v0*w1 - w0*R, R = gl*v1 + s_min*w1; band |F| < tol*scale,
        #   scale = w0*(w1 + |R|)  (oasis_pallas._stack_machine_precise)
        glp = self._gl_precise(l1)
        w1 = self._w_precise(l1)
        R = F32(F32(glp * self.vh[1]) + F32(glp * self.ve[1])
                + F32(F32(S_MIN) * w1))
        v0w1 = F32(F32(self.vh[0] * w1) + F32(self.ve[0] * w1))
        w0 = self._w_precise(self.lf[0])
        F = F32(v0w1 - F32(w0 * R))
        scale_p = F32(w0 * F32(w1 + np.abs(R)))
        # normalised to the (lhs - rhs) convention for comparison with f64:
        # F / (w0*w1) == lhs - rhs (evaluated in f64 so the division adds
        # no f32 noise of its own — it is measurement, not kernel work)
        m_p = F.astype(np.float64) / (w0.astype(np.float64)
                                      * w1.astype(np.float64))
        # the kernel's own flag check |F| < tol*scale, normalised the same
        # way so report() can sweep tol directly
        self._mp_scale = np.abs(F.astype(np.float64)) / scale_p
        return m64, rhs64, m_c, m_p, glp, glp

    def _record(self, active, m64, rhs64, m_c, m_p):
        if not active.any():
            return
        idx = np.nonzero(active)[0]
        norm = 1.0 + np.abs(rhs64[idx])
        self.err_c.append(np.abs(m_c[idx].astype(np.float64) - m64[idx])
                          / norm)
        self.err_p.append(np.abs(m_p[idx].astype(np.float64) - m64[idx])
                          / norm)
        self.m64n.append(np.abs(m64[idx]) / norm)
        self.mc_n.append(np.abs(m_c[idx].astype(np.float64)) / norm)
        # the precise kernel's own band check, pre-normalised by its scale
        self.mp_n.append(self._mp_scale[idx])
        self.lane.append(idx)

    def _merge_masked(self, viol):
        """Roll the stacks up on violating lanes; row 0 <- merged pool —
        all three states take the SAME (f64-decided) mask."""
        l1_64 = self.l64[1]
        gl64 = np.exp(l1_64 * self.lng64)
        mv64 = self.v64[1] + gl64 * self.v64[0]
        mw64 = self.w64[1] + gl64 * gl64 * self.w64[0]
        ml64 = self.l64[1] + self.l64[0]

        glc = self._gl_classic(self.lf[1])
        mvc = F32(self.vc[1] + F32(glc * self.vc[0]))
        mwc = F32(self.wc[1] + F32(F32(glc * glc) * self.wc[0]))

        glp = self._gl_precise(self.lf[1])
        # two_product + two_sum in f32, as the kernel does
        p = F32(glp * self.vh[0])
        c = F32(glp * F32(2 ** 12 + 1))
        ah = F32(c - F32(c - glp)); al = F32(glp - ah)
        c2 = F32(self.vh[0] * F32(2 ** 12 + 1))
        bh = F32(c2 - F32(c2 - self.vh[0])); bl = F32(self.vh[0] - bh)
        pe = F32(F32(F32(F32(ah * bh) - p) + F32(ah * bl) + F32(al * bh))
                 + F32(al * bl))
        s = F32(self.vh[1] + p)
        bb = F32(s - self.vh[1])
        se = F32(F32(self.vh[1] - F32(s - bb)) + F32(p - bb))
        mve = F32(F32(F32(se + pe) + F32(glp * self.ve[0])) + self.ve[1])
        mvh = F32(s + mve)
        mve = _bf16(F32(mve - F32(mvh - s)))  # stored bf16 in the kernel
        mlf = F32(self.lf[1] + self.lf[0])

        for arr, top in ((self.v64, mv64), (self.w64, mw64),
                         (self.l64, ml64), (self.vc, mvc), (self.wc, mwc),
                         (self.vh, mvh), (self.ve, mve), (self.lf, mlf)):
            rolled = np.roll(arr, -1, axis=0)
            np.copyto(arr, np.where(viol, rolled, arr))
            arr[0] = np.where(viol, top, arr[0])
        self.n -= viol.astype(np.int64)

    def run(self):
        for t in range(self.T):
            # push
            for arr, top in ((self.v64, self.y64[:, t]),
                             (self.w64, 1.0), (self.l64, 1.0),
                             (self.vc, self.y32[:, t]), (self.wc, F32(1)),
                             (self.vh, self.y32[:, t]), (self.ve, F32(0)),
                             (self.lf, F32(1))):
                np.copyto(arr, np.roll(arr, 1, axis=0))
                arr[0] = top
            self.n += 1
            for attempt in range(K + 1):  # K attempts + final (record-only)
                m64, rhs64, m_c, m_p, _gc, _gp = self._margins()
                active = self.n >= 2
                self._record(active, m64, rhs64, m_c, m_p)
                viol = active & (m64 < 0)
                if attempt == K or not viol.any():
                    break
                self._merge_masked(viol)
        return self

    def report(self):
        err_c = np.concatenate(self.err_c)
        err_p = np.concatenate(self.err_p)
        m64n = np.concatenate(self.m64n)
        mc_n = np.concatenate(self.mc_n)
        mp_n = np.concatenate(self.mp_n)
        lane = np.concatenate(self.lane)
        print(f"decisions recorded: {len(err_c):,} over {self.N} lanes x "
              f"{self.T} frames")
        for name, e in (("classic", err_c), ("precise", err_p)):
            q = np.quantile(e, [0.5, 0.99, 0.9999])
            print(f"{name}: margin err max={e.max():.3e}  "
                  f"p50={q[0]:.1e} p99={q[1]:.1e} p99.99={q[2]:.1e}")
        print("\nlane flag rate at candidate bands (emulated kernel margin "
              "inside tol*(1+|rhs|)):")
        for name, mn in (("classic", mc_n), ("precise", mp_n)):
            for tol in (1e-5, 3e-6, 1e-6, 3e-7):
                flagged = np.unique(lane[mn < tol]).size / self.N
                print(f"  {name} tol={tol:.0e}: {100 * flagged:.1f}% lanes")
        # sanity: how close can a TRUE margin be (exact ties excluded)?
        nz = m64n[m64n > 0]
        print(f"\nsmallest nonzero |f64 margin|/(1+|rhs|): {nz.min():.3e}; "
              f"exact ties: {(m64n == 0).sum()}")


def main(n: int = 256, T: int = 20000, seed: int = 11):
    rng = np.random.default_rng(seed)
    y = synth_ar1_traces(rng, n, T)
    # depth: generous bound on pool count for this data (f64 max ~439 at
    # 20k frames; emulation has no redo path, so just take headroom)
    Emu(y, depth=min(T, 640)).run().report()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
