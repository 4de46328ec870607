"""Pallas TPU kernel for OASIS AR(1) spike deconvolution.

Replaces the external Cython ``oasisAR1`` the reference fans out over a host
``multiprocessing.Pool`` (``/root/reference/gan/utils/spike_helper.py:23-54``,
``compute_metrics.py:45-49``) with a VMEM-resident pool-adjacency machine:

- **Layout**: traces ride the 128-lane axis; each grid step owns a
  ``(T, 128)`` block of fluorescence and a ``(depth, 128)`` pool stack, all in
  VMEM. The ``lax.while_loop`` formulation in :mod:`calciumgan_tpu.ops.oasis`
  keeps the same state in HBM and pays a full round-trip per merge event
  (~444 traces/s at sl2048); here every event is a VPU op on on-chip tiles.
- **Stack discipline**: the top pool always lives at row 0. A *push* (one per
  timestep, lockstep across lanes) is a uniform roll-down plus a row write; a
  *merge* is a lane-masked roll-up whose row 0 receives the merged pool.
- **No data-dependent control flow**: a first version resolved violations
  with a nested ``while_loop``; its per-iteration scalar sync (``any`` across
  lanes feeding the loop condition) cost ~16 us and capped throughput at
  ~1.3k traces/s. Instead each timestep runs a *fixed* ``merge_attempts``
  (default 4) lane-masked merges — a no-op on lanes without a violation —
  and ORs any still-standing violation into a ``pending`` flag. Measured
  merge demand per timestep: never >2 at the production ``s_min=0.55``
  (0 of 131k steps, spiky + uniform-noise data), >4 in <3e-4 of steps even
  at ``s_min=0``. Flagged lanes are recomputed by the exact
  ``lax.while_loop`` path in the caller.
- **Bounded depth**: the stack height is capped at ``depth`` (default
  ``min(T, 128)``; measured worst cases at the production ``s_min=0.55``:
  DG-like calcium ~54, dense spiking ~419, monotone ramps ~558). Lanes that
  exceed it are flagged in the same redo output.

- **Fused reconstruction**: the stack -> (c, s) pass runs INSIDE the same
  kernel as a backward time replay (current pool pinned at stack row 0,
  lane-masked pops), so one dispatch emits spikes directly. Round 2 did this
  step in XLA outside the kernel (splat-scan + reset affine
  ``associative_scan``) at 15-20 ms per 4096 sl2048 traces — now 2 extra
  VMEM rolls per timestep (the v-stack is converted to pool heights in one
  pass after the forward sweep, so the w-stack never rides the replay).

Parity: same pool-adjacency algorithm as the numpy golden model
(:mod:`calciumgan_tpu.ops.oasis_ref`, from Friedrich et al. 2017 Algorithm 1)
with the reference recipe g=0.95, s_min=0.55, binarise at 0.5
(``spike_helper.py:28-29``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["oasis_ar1_pallas", "oasis_ar1_pallas_long", "default_depth"]

_LANES = 128


# ---------------------------------------------------------------------------
# Precise-mode helpers: double-single (compensated) f32 arithmetic.
#
# The long kernel's borderline-flag tax (round-4 VERDICT: ~23% of lanes at
# 20k frames, each an exact host redo) is set by the width of the f32 error
# band around each merge decision. The dominant error was the f32
# ACCUMULATION of the pool statistics: v picks up ~0.2*l*eps relative error
# over a length-l pool's merges, and w the same. Precise mode removes both:
#   * w is never accumulated — for AR(1) pools it is a closed form of the
#     (exactly carried) pool length, w(l) = (1 - g^(2l)) / (1 - g^2),
#     evaluated via expm1 so small-l cancellation costs no bits;
#   * v is carried as a double-single pair (value + compensation): merges
#     track the exact product/sum rounding via Veltkamp/TwoSum, so v's error
#     stays O(eps^2 * l) instead of O(eps * l);
#   * g^l is evaluated with a 12-bit-split log so the exp ARGUMENT is exact
#     for integer l <= 4096 (the f32 product l*log(g) alone costs up to
#     ~3e-6 relative at l ~ 2000).
# The remaining error is the intrinsic ~1-ulp of the hardware exp/expm1 and
# division, so the borderline band shrinks ~10x (empirically calibrated —
# tools/calibrate_oasis_band.py) and with it the host-redo tax.
# ---------------------------------------------------------------------------

def _split12(x: float):
    """(hi, lo): hi carries the top 12 significand bits of f32(x) — so an
    integer-valued multiplier up to 2^12 times hi is EXACT in f32 — and lo
    (f32) holds the residual of the full f64 value; (hi + lo) represents x
    to ~36 bits."""
    x32 = np.float32(x)
    c = np.float32(x32 * np.float32(2 ** 12 + 1))
    hi = np.float32(c - np.float32(c - x32))
    return float(hi), float(np.float32(float(x) - float(hi)))


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (s = fl(a+b))."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _fast_two_sum(a, b):
    """Dekker: requires |a| >= |b| (here: b is a compensation term)."""
    s = a + b
    return s, b - (s - a)


def _veltkamp_split(a):
    c = a * jnp.float32(2 ** 12 + 1)
    hi = c - (c - a)
    return hi, a - hi


def _two_product(a, b):
    """p + e == a * b exactly (no fma on the VPU, so Veltkamp splits)."""
    p = a * b
    ah, al = _veltkamp_split(a)
    bh, bl = _veltkamp_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _poly_expm1_small(u):
    """expm1(u) for |u| <= ~0.06 (the residual of the 12-bit log split
    times l <= 4096): cubic Horner, residual u^4/24 <= 2e-8 relative."""
    return u * (1.0 + u * (0.5 + u * jnp.float32(1.0 / 6.0)))


def _expm1_neg(x_hi, x_lo):
    """expm1(x_hi + x_lo) for x <= 0 without lax.expm1 (unimplemented in
    the Pallas TPU lowering). |x| < 0.5: a degree-10 Taylor (truncation
    <= 7e-10 relative). x <= -0.5: exp(x) - 1, where the subtraction is
    exact for exp(x) in [0.5, 0.607] (Sterbenz) and loses no relative
    accuracy below that, so exp's own ~1 ulp is amplified by at most
    exp/|expm1| <= 1.55."""
    x = x_hi + x_lo
    t = x * (1.0 + x * (1 / 2 + x * (1 / 6 + x * (1 / 24 + x * (
        1 / 120 + x * (1 / 720 + x * (1 / 5040 + x * (
            1 / 40320 + x * jnp.float32(1 / 362880)))))))))
    e = jnp.exp(x_hi) * (1.0 + _poly_expm1_small(x_lo))
    return jnp.where(x > -0.5, t, e - 1.0)


def default_depth(T: int) -> int:
    """Covers every measured spiky-calcium workload; deeper stacks are rare
    and handled by the redo flag."""
    return min(T, 128)


def _stack_machine(yy_ref, c_ref, vs_ref, ws_ref, ls_ref, D: int, g: float,
                   s_min: float, K: int, flag_tol: float = 0.0):
    """Shared pool-stack machinery for both kernel variants.

    The whole-trace and time-chunked kernels run the SAME numerics-critical
    event bodies over the same scratch refs; building them once here keeps
    merge semantics, the ``n >= 2`` guard, and the redo-flag logic from
    drifting between the two. Returns ``(init_stacks, push, recon_step)``:

    - ``init_stacks()``: stacks start empty; w=1 keeps v/w finite on
      never-written rows.
    - ``push(t, (n, redo))``: one timestep — lockstep roll-down push of
      ``yy_ref[t]``, a *fixed* ``K`` lane-masked merge attempts (pure
      vector work, no scalar syncs), failure flags ORed into the ``redo``
      BITMASK: bit 0 = pool-stack overflow (``n > D`` — a deeper re-dispatch
      can fix it), bit 1 = merge budget exhausted (a violation survived the
      ``K`` attempts — only an exact recompute fixes it), bit 2 = a merge
      decision was numerically borderline (within the kernel's f32 error
      band — the f64 host kernel may decide it the other way). The driver
      escalates the depth ladder on bit 0 alone and host-redoes any nonzero
      lane (``ops.oasis.deconvolve_signals_host``).
    - ``finalize_pools()``: one (D, 128) pass converting the v-stack to
      pool heights ``h = max(v/w, 0)`` IN PLACE once the forward sweep is
      done. The backward replay then needs only two stacks (h, lengths), so
      each ``recon_step`` rolls 2 refs instead of 3 — the w rolls were ~1/3
      of the replay's VMEM traffic and h is constant within a pool anyway.
    - ``recon_step(t, rem)``: one backward-replay step of the fused
      reconstruction — writes ``c_ref[t] = h0 * g^(rem-1)`` from the pool
      pinned at stack row 0 (``vs_ref`` holds heights after
      ``finalize_pools``) and pops exhausted lanes via the same lane-masked
      roll as the merge step.
    """
    log_g = math.log(g)

    def violation(n):
        # top pool (row 0) vs its left neighbour (row 1); int32 masks —
        # Mosaic mishandles (1, 128) i1 vectors in loop carries
        v0, w0 = vs_ref[0:1, :], ws_ref[0:1, :]
        v1, w1 = vs_ref[1:2, :], ws_ref[1:2, :]
        l1 = ls_ref[1:2, :]
        gl = jnp.exp(l1 * log_g)
        lhs = v0 / w0
        rhs = gl * (v1 / w1) + s_min
        active = n >= 2
        viol = active & (lhs < rhs)
        if flag_tol > 0.0:
            # borderline: the margin sits inside the kernel's f32 error
            # band, so the f64 exact host kernel can decide the merge the
            # OTHER way — measured: one flip per ~4e7 decisions at margin
            # 6e-7 (tools/debug_long_mismatch.py). Flag the lane for the
            # exact host redo instead of claiming a parity the arithmetic
            # can't give. Band calibration (f32-replay vs f64 over 257k
            # decisions on bench-style data): max margin error 2.8e-6 at
            # pool length 121, i.e. ≤0.095x this band — 10x safety. A
            # pool-length-scaled band was tried and rejected: decisions
            # happen at mean pool length ~72, so it is no tighter in
            # practice and its extra ls_ref read cost 12% kernel time
            # (flat band: 0.4%). Off (tol 0) only at s_min == 0, where a
            # flipped decision provably reconstructs the identical trace
            # and clean-data exact-equality splits would mass-flag; any
            # s_min > 0 shifts pool heights by O(s_min) on a flip, which
            # can move a boundary spike across the binarisation threshold
            # (gate: ops.oasis._flag_tol).
            bord = active & (jnp.abs(lhs - rhs)
                             < flag_tol * (1.0 + jnp.abs(rhs)))
        else:
            bord = jnp.zeros_like(viol)
        return viol.astype(jnp.int32), bord.astype(jnp.int32), gl

    def masked_merge(n):
        # reuse violation's exp(l1*log g): transcendentals are the
        # depth-independent share of the per-timestep cost (the kernel
        # runs 3 of them per step, not 5)
        violi, bord, gl = violation(n)
        viol = violi > 0
        v0, w0, l0 = vs_ref[0:1, :], ws_ref[0:1, :], ls_ref[0:1, :]
        v1, w1, l1 = vs_ref[1:2, :], ws_ref[1:2, :], ls_ref[1:2, :]
        mv = v1 + gl * v0
        mw = w1 + gl * gl * w0
        ml = l1 + l0
        # lane-masked pop: violating lanes shift up, row 0 <- merged pool
        vs_ref[:] = jnp.where(viol, jnp.roll(vs_ref[:], -1, axis=0),
                              vs_ref[:])
        ws_ref[:] = jnp.where(viol, jnp.roll(ws_ref[:], -1, axis=0),
                              ws_ref[:])
        ls_ref[:] = jnp.where(viol, jnp.roll(ls_ref[:], -1, axis=0),
                              ls_ref[:])
        vs_ref[0:1, :] = jnp.where(viol, mv, v0)
        ws_ref[0:1, :] = jnp.where(viol, mw, w0)
        ls_ref[0:1, :] = jnp.where(viol, ml, l0)
        return n - violi, bord

    def init_stacks():
        vs_ref[:] = jnp.zeros((D, _LANES), jnp.float32)
        ws_ref[:] = jnp.ones((D, _LANES), jnp.float32)
        ls_ref[:] = jnp.ones((D, _LANES), jnp.float32)

    def push(t, carry):
        n, redo = carry
        # lockstep push: uniform roll-down, new singleton pool at row 0
        vs_ref[:] = jnp.roll(vs_ref[:], 1, axis=0)
        ws_ref[:] = jnp.roll(ws_ref[:], 1, axis=0)
        ls_ref[:] = jnp.roll(ls_ref[:], 1, axis=0)
        vs_ref[0:1, :] = yy_ref[pl.ds(t, 1), :]
        ws_ref[0:1, :] = jnp.ones((1, _LANES), jnp.float32)
        ls_ref[0:1, :] = jnp.ones((1, _LANES), jnp.float32)
        n = n + 1
        redo = redo | (n > D).astype(jnp.int32)
        # fixed merge budget: pure vector work, no scalar syncs
        for _ in range(K):
            n, bord = masked_merge(n)
            if flag_tol > 0.0:
                redo = redo | (bord * 4)
        # lanes still violating could not resolve in K attempts: flag
        viol, bord, _ = violation(n)
        redo = redo | (viol * 2)
        if flag_tol > 0.0:
            redo = redo | (bord * 4)
        return n, redo

    def finalize_pools():
        vs_ref[:] = jnp.maximum(vs_ref[:] / ws_ref[:], 0.0)

    recon_step = _make_recon_step(c_ref, vs_ref, ls_ref, log_g)
    return init_stacks, push, finalize_pools, recon_step


def _stack_machine_precise(yy_ref, c_ref, vs_ref, ve_ref, ls_ref, D: int,
                           g: float, s_min: float, K: int, flag_tol: float):
    """Precise-mode pool-stack machinery (see the double-single note above).

    Same event structure, stack discipline, and redo-bit semantics as
    :func:`_stack_machine`; the three scratch stacks are (v_hi, v_lo, l) —
    the w stack is replaced by the closed form w(l) = -expm1(2l ln g)/(1-g²)
    of the exactly-carried integer length, so the VMEM roll traffic is
    unchanged while the merge-decision error drops from O(eps*l) to the
    intrinsic ~1-ulp of exp/expm1/div. The matching (tighter) borderline
    band is ``ops.oasis._BORDERLINE_TOL_PRECISE``."""
    log_g = math.log(g)
    lng_hi, lng_lo = _split12(log_g)
    inv_1mg2 = float(np.float32(1.0 / (1.0 - float(g) * float(g))))

    def gl_of(l):
        # g^l with an exact exp argument: l*lng_hi is exact for integer
        # l <= 4096 (12-bit split), the residual l*lng_lo (<= ~0.06) rides
        # a cubic correction
        return jnp.exp(l * lng_hi) * (1.0 + _poly_expm1_small(l * lng_lo))

    def w_of(l):
        # w(l) = (1 - g^(2l)) / (1 - g^2), expm1 formulation so small-l
        # cancellation costs no bits; w(1) == 1 exactly by construction
        m = _expm1_neg((2.0 * l) * lng_hi,   # exact: same split argument
                       (2.0 * l) * lng_lo)
        w = -m * inv_1mg2
        return jnp.where(l == 1.0, 1.0, w)

    def violation(n, top_singleton: bool):
        # division-free decision: multiply lhs < rhs through by w0*w1 > 0,
        #   F = v0*w1 - w0*R,  R = gl*v1 + s_min*w1  (= rhs*w1)
        # so viol <=> F < 0, and the relative band |lhs-rhs| <
        # tol*(1+|rhs|) becomes |F| < tol * w0*(w1 + |R|) — scale-invariant
        # by construction, and the f32 error budget improves (products
        # round at 0.5 ulp; the two-term compensated divisions did not)
        v0h, v0e = vs_ref[0:1, :], ve_ref[0:1, :].astype(jnp.float32)
        v1h, v1e = vs_ref[1:2, :], ve_ref[1:2, :].astype(jnp.float32)
        l1 = ls_ref[1:2, :]
        gl = gl_of(l1)
        w1 = w_of(l1)
        R = gl * v1h + gl * v1e + s_min * w1
        v0w1 = v0h * w1 + v0e * w1
        if top_singleton:
            # the pool just pushed is a singleton on every lane: w0 == 1
            F = v0w1 - R
            scale = w1 + jnp.abs(R)
        else:
            w0 = w_of(ls_ref[0:1, :])
            F = v0w1 - w0 * R
            scale = w0 * (w1 + jnp.abs(R))
        active = n >= 2
        viol = active & (F < 0.0)
        if flag_tol > 0.0:
            bord = active & (jnp.abs(F) < flag_tol * scale)
        else:
            bord = jnp.zeros_like(viol)
        return viol.astype(jnp.int32), bord.astype(jnp.int32), gl

    def masked_merge(n, top_singleton: bool):
        violi, bord, gl = violation(n, top_singleton)
        viol = violi > 0
        v0h, l0 = vs_ref[0:1, :], ls_ref[0:1, :]
        v1h, l1 = vs_ref[1:2, :], ls_ref[1:2, :]
        v0e = ve_ref[0:1, :].astype(jnp.float32)
        v1e = ve_ref[1:2, :].astype(jnp.float32)
        # compensated mv = v1 + gl*v0: track the product and sum roundings
        p, pe = _two_product(gl, v0h)
        s, se = _two_sum(v1h, p)
        mve = ((se + pe) + gl * v0e) + v1e
        mvh, mve = _fast_two_sum(s, mve)
        ml = l1 + l0
        vs_ref[:] = jnp.where(viol, jnp.roll(vs_ref[:], -1, axis=0),
                              vs_ref[:])
        ve_ref[:] = jnp.where(viol, jnp.roll(ve_ref[:], -1, axis=0),
                              ve_ref[:])
        ls_ref[:] = jnp.where(viol, jnp.roll(ls_ref[:], -1, axis=0),
                              ls_ref[:])
        vs_ref[0:1, :] = jnp.where(viol, mvh, v0h)
        ve_ref[0:1, :] = jnp.where(
            viol, mve.astype(jnp.bfloat16), ve_ref[0:1, :])
        ls_ref[0:1, :] = jnp.where(viol, ml, l0)
        return n - violi, bord

    def init_stacks():
        vs_ref[:] = jnp.zeros((D, _LANES), jnp.float32)
        ve_ref[:] = jnp.zeros((D, _LANES), jnp.bfloat16)
        ls_ref[:] = jnp.ones((D, _LANES), jnp.float32)

    def push(t, carry):
        n, redo = carry
        vs_ref[:] = jnp.roll(vs_ref[:], 1, axis=0)
        ve_ref[:] = jnp.roll(ve_ref[:], 1, axis=0)
        ls_ref[:] = jnp.roll(ls_ref[:], 1, axis=0)
        vs_ref[0:1, :] = yy_ref[pl.ds(t, 1), :]
        ve_ref[0:1, :] = jnp.zeros((1, _LANES), jnp.bfloat16)
        ls_ref[0:1, :] = jnp.ones((1, _LANES), jnp.float32)
        n = n + 1
        redo = redo | (n > D).astype(jnp.int32)
        for i in range(K):
            n, bord = masked_merge(n, top_singleton=(i == 0))
            if flag_tol > 0.0:
                redo = redo | (bord * 4)
        viol, bord, _ = violation(n, top_singleton=False)
        redo = redo | (viol * 2)
        if flag_tol > 0.0:
            redo = redo | (bord * 4)
        return n, redo

    def finalize_pools():
        w = w_of(ls_ref[:])
        vs_ref[:] = jnp.maximum(
            (vs_ref[:] + ve_ref[:].astype(jnp.float32)) / w, 0.0)

    recon_step = _make_recon_step(c_ref, vs_ref, ls_ref, log_g)
    return init_stacks, push, finalize_pools, recon_step


def _make_recon_step(c_ref, vs_ref, ls_ref, log_g: float):
    """Backward-replay step shared by both stack machines (vs holds pool
    heights after ``finalize_pools``, ls the lengths — see
    :func:`_stack_machine`'s ``recon_step`` doc)."""
    def recon_step(t, rem):
        h0 = vs_ref[0:1, :]
        decay = jnp.exp((rem - 1.0) * log_g)
        c_ref[pl.ds(t, 1), :] = h0 * decay
        rem = rem - 1.0
        done = rem < 0.5
        vs_ref[:] = jnp.where(done, jnp.roll(vs_ref[:], -1, axis=0),
                              vs_ref[:])
        ls_ref[:] = jnp.where(done, jnp.roll(ls_ref[:], -1, axis=0),
                              ls_ref[:])
        return jnp.where(done, ls_ref[0:1, :], rem)

    return recon_step


def _oasis_kernel(T: int, D: int, g: float, s_min: float, K: int,
                  flag_tol: float, precise: bool = False):
    machine = _stack_machine_precise if precise else _stack_machine

    def kernel(yy_ref, c_ref, s_ref, redo_ref, vs_ref, ws_ref, ls_ref,
               n_ref):
        # in precise mode the middle scratch stack carries the v
        # compensation terms instead of the pool weights
        init_stacks, push, finalize_pools, recon_step = machine(
            yy_ref, c_ref, vs_ref, ws_ref, ls_ref, D, g, s_min, K, flag_tol)
        init_stacks()

        # seed loop carries from memory, not splat constants: Mosaic gives
        # splats a fully-replicated layout that cannot unify with the body's
        n_ref[:] = jnp.zeros((1, _LANES), jnp.int32)
        redo_ref[:] = jnp.zeros((1, _LANES), jnp.int32)
        n, redo = lax.fori_loop(0, T, push, (n_ref[:], redo_ref[:]))
        redo_ref[:] = redo
        finalize_pools()

        # ---- fused reconstruction: backward replay of the pool stacks ----
        # Walking time from T-1 down to 0 keeps the CURRENT pool at the
        # FIXED stack row 0 (the design constraint that rules out per-lane
        # sublane gathers): c_t = h0 * g^(rem-1) where rem counts down the
        # pool's remaining length, and exhausted lanes pop via the same
        # lane-masked roll as the merge step. Pool lengths sum to T per
        # lane, so T iterations consume every stack exactly. Replaces the
        # XLA splat-scan + associative_scan pass (15-20 ms per 4096 traces
        # at sl2048, round-2 BASELINE.md) with 2 extra rolls per timestep
        # inside the same dispatch.
        lax.fori_loop(0, T, lambda i, rem: recon_step(T - 1 - i, rem),
                      ls_ref[0:1, :])

        # spikes: s_t = c_t - g*c_{t-1}, s_0 = 0 (one vector pass)
        c = c_ref[:]
        s_ref[:] = c - g * jnp.roll(c, 1, axis=0)
        s_ref[0:1, :] = jnp.zeros((1, _LANES), jnp.float32)

    return kernel


def _oasis_kernel_long(Tc: int, C: int, T: int, D: int, g: float,
                       s_min: float, K: int, flag_tol: float,
                       precise: bool = False):
    """Time-chunked variant: a (lane_block, 2*C) grid walks each lane
    block's chunks FORWARD (grid steps 0..C-1: pool pushes/merges, stacks
    carried in scratch) then BACKWARD (steps C..2C-1: fused reconstruction
    revisits the c output blocks newest-chunk-first). Scratch persists
    across grid steps, so the pool state flows through the whole trace even
    though only one (Tc, 128) fluorescence window is VMEM-resident at a
    time — this lifts the whole-trace VMEM cap (``_PALLAS_MAX_T``) that
    forces 20k-frame recordings onto the host kernel."""
    machine = _stack_machine_precise if precise else _stack_machine

    def kernel(yy_ref, c_ref, redo_ref, vs_ref, ws_ref, ls_ref, n_ref,
               rem_ref):
        i = pl.program_id(1)
        init_stacks, push, finalize_pools, recon_step = machine(
            yy_ref, c_ref, vs_ref, ws_ref, ls_ref, D, g, s_min, K, flag_tol)

        @pl.when(i == 0)
        def _init():
            init_stacks()
            n_ref[:] = jnp.zeros((1, _LANES), jnp.int32)
            # redo_ref keeps the SAME block index for every grid step of a
            # lane block, so it doubles as the cross-chunk carry
            redo_ref[:] = jnp.zeros((1, _LANES), jnp.int32)

        @pl.when(i < C)
        def _forward():
            base = i * Tc
            # the final chunk may be partial: run exactly the real steps
            steps = jnp.minimum(Tc, T - base)
            n, redo = lax.fori_loop(0, steps, push,
                                    (n_ref[:], redo_ref[:]))
            n_ref[:] = n
            redo_ref[:] = redo

            @pl.when(i == C - 1)
            def _seed_backward():
                finalize_pools()
                rem_ref[:] = ls_ref[0:1, :]

        @pl.when(i >= C)
        def _backward():
            chunk = 2 * C - 1 - i
            base = chunk * Tc
            steps = jnp.minimum(Tc, T - base)
            rem_ref[:] = lax.fori_loop(
                0, steps, lambda j, rem: recon_step(steps - 1 - j, rem),
                rem_ref[:])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("g", "lam", "s_min", "depth", "merge_attempts",
                     "chunk", "interpret", "flag_tol", "precise"))
def oasis_ar1_pallas_long(signals: jnp.ndarray, g: float = 0.95,
                          lam: float = 0.0, s_min: float = 0.0,
                          depth: int = 512, merge_attempts: int = 4,
                          chunk: int = 2048, interpret: bool = False,
                          flag_tol: float = 0.0, precise: bool = False):
    """OASIS AR(1) for traces LONGER than the whole-trace kernel's VMEM cap
    (``ops.oasis._PALLAS_MAX_T``), e.g. the 20k-frame recordings
    ``dataset/spike_train_inference.py`` deconvolves (reference hot loop:
    ``/root/reference/dataset/spike_train_inference.py:24-32``).

    Same algorithm and outputs as :func:`oasis_ar1_pallas`; only the
    traversal is chunked (see :func:`_oasis_kernel_long`). The final pool
    count of a T-frame trace grows with T (≈ spike count), so the default
    stack ``depth`` is deeper than the short kernel's ladder; overflowing
    lanes are flagged in ``redo`` exactly like the short kernel. Spikes are
    differenced from ``c`` OUTSIDE the kernel (one fused elementwise XLA
    op) because ``s_t`` at a chunk boundary needs ``c_{t-1}`` from the
    neighbouring block.

    Returns (c, s, redo) shaped like the short kernel's.
    """
    signals = jnp.asarray(signals, jnp.float32)
    batch_shape = signals.shape[:-1]
    T = signals.shape[-1]
    Tc = min(chunk, T)
    C = -(-T // Tc)
    D = max(8, -(-min(depth, T) // 8) * 8)

    y = signals.reshape((-1, T))
    B = y.shape[0]
    yy = y - lam * (1.0 - g)
    yy = yy.at[:, T - 1].set(y[:, T - 1] - lam)

    Bp = -(-B // _LANES) * _LANES
    Tp = C * Tc
    yy = jnp.pad(yy, ((0, Bp - B), (0, Tp - T)))
    yyT = yy.T  # (Tp, Bp)

    # grid: lane blocks outer, 2*C time sweeps inner (forward then backward;
    # the kernel predicates on program_id(1)). Pallas only DMAs a block when
    # its index CHANGES between grid steps, so each ref pins its index
    # through the phase that never touches it: the input walks chunks
    # 0..C-1 forward then stays at C-1 (the backward replay reads only
    # scratch — re-fetching input blocks would double input HBM traffic),
    # and the c output stays at C-1 through the forward phase (nothing
    # writes c yet) then walks C-1..0 with the backward replay.
    in_map = lambda b, i: (jnp.minimum(i, C - 1), b)
    out_map = lambda b, i: (jnp.minimum(2 * C - 1 - i, C - 1), b)
    cT, redo = pl.pallas_call(
        _oasis_kernel_long(Tc, C, T, D, g, s_min, merge_attempts,
                           flag_tol, precise),
        grid=(Bp // _LANES, 2 * C),
        in_specs=[pl.BlockSpec((Tc, _LANES), in_map,
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((Tc, _LANES), out_map,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, _LANES), lambda b, i: (0, b),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, _LANES), jnp.float32),
            # precise mode's middle stack holds the v compensation terms,
            # carried in bf16 (|ve| <= ulp(v)/2, so bf16's 8-bit mantissa
            # keeps the compensated error O(2^-32 * l)) — half the roll
            # bytes of the classic w stack
            pltpu.VMEM((D, _LANES),
                       jnp.bfloat16 if precise else jnp.float32),
            pltpu.VMEM((D, _LANES), jnp.float32),
            pltpu.VMEM((1, _LANES), jnp.int32),
            pltpu.VMEM((1, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(yyT)

    c = cT.T[:B, :T]
    s = c - g * jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), c[:, :-1]], axis=1)
    s = s.at[:, 0].set(0.0)
    redo = redo[0, :B]
    return (c.reshape(signals.shape), s.reshape(signals.shape),
            redo.reshape(batch_shape))


@functools.partial(
    jax.jit,
    static_argnames=("g", "lam", "s_min", "depth", "merge_attempts",
                     "interpret", "flag_tol", "precise"))
def oasis_ar1_pallas(signals: jnp.ndarray, g: float = 0.95, lam: float = 0.0,
                     s_min: float = 0.0, depth: int | None = None,
                     merge_attempts: int = 4, interpret: bool = False,
                     flag_tol: float = 0.0, precise: bool = False):
    """Batched OASIS AR(1) on TPU via Pallas.

    Args:
        signals: (..., T) fluorescence traces.
        g, lam, s_min: AR(1) decay, sparsity penalty, minimum spike size
            (reference recipe: g=0.95, lam=0, s_min=0.55).
        depth: pool-stack cap; lanes exceeding it are flagged, not fixed.
        merge_attempts: fixed per-timestep merge budget (see module doc).
        interpret: run the kernel in interpreter mode (CPU tests).

    Returns:
        (c, s, redo): denoised trace and spikes shaped like ``signals``, plus
        an int32 flag BITMASK per trace (batch shape) marking traces whose
        result is unreliable and must be recomputed with the exact path:
        bit 0 = pool-stack overflow (a deeper ``depth`` would fix it),
        bit 1 = merge budget exhausted (only an exact recompute fixes it),
        bit 2 = a merge decision was numerically borderline (only set when
        ``flag_tol`` > 0 — the f64 host kernel may decide it the other
        way, so callers wanting f64 parity must recompute these too);
        0 = trustworthy within the f32 arithmetic. ``flag_tol`` is the
        relative borderline band width (0 disables; the production
        dispatch passes ``ops.oasis._flag_tol(s_min, threshold)``).
    """
    signals = jnp.asarray(signals, jnp.float32)
    batch_shape = signals.shape[:-1]
    T = signals.shape[-1]
    D = default_depth(T) if depth is None else min(T, depth)
    D = max(8, -(-D // 8) * 8)  # sublane-tile multiple

    y = signals.reshape((-1, T))
    B = y.shape[0]
    yy = y - lam * (1.0 - g)
    yy = yy.at[:, T - 1].set(y[:, T - 1] - lam)

    Bp = -(-B // _LANES) * _LANES
    yy = jnp.pad(yy, ((0, Bp - B), (0, 0)))
    yyT = yy.T  # (T, Bp): traces on lanes

    grid = (Bp // _LANES,)
    blk = lambda r: pl.BlockSpec((r, _LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    cT, sT, redo = pl.pallas_call(
        _oasis_kernel(T, D, g, s_min, merge_attempts, flag_tol, precise),
        grid=grid,
        in_specs=[blk(T)],
        out_specs=(blk(T), blk(T), blk(1)),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, _LANES), jnp.float32),
            # see the long kernel: bf16 compensation stack in precise mode
            pltpu.VMEM((D, _LANES),
                       jnp.bfloat16 if precise else jnp.float32),
            pltpu.VMEM((D, _LANES), jnp.float32),
            pltpu.VMEM((1, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(yyT)

    c, s = cT.T[:B], sT.T[:B]
    redo = redo[0, :B]
    return (c.reshape(signals.shape), s.reshape(signals.shape),
            redo.reshape(batch_shape))
