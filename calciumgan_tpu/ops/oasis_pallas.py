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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["oasis_ar1_pallas", "oasis_ar1_pallas_long", "default_depth"]

_LANES = 128


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

    return init_stacks, push, finalize_pools, recon_step


def _oasis_kernel(T: int, D: int, g: float, s_min: float, K: int,
                  flag_tol: float):
    def kernel(yy_ref, c_ref, s_ref, redo_ref, vs_ref, ws_ref, ls_ref,
               n_ref):
        init_stacks, push, finalize_pools, recon_step = _stack_machine(
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
                       s_min: float, K: int, flag_tol: float):
    """Time-chunked variant: a (lane_block, 2*C) grid walks each lane
    block's chunks FORWARD (grid steps 0..C-1: pool pushes/merges, stacks
    carried in scratch) then BACKWARD (steps C..2C-1: fused reconstruction
    revisits the c output blocks newest-chunk-first). Scratch persists
    across grid steps, so the pool state flows through the whole trace even
    though only one (Tc, 128) fluorescence window is VMEM-resident at a
    time — this lifts the whole-trace VMEM cap (``_PALLAS_MAX_T``) that
    forces 20k-frame recordings onto the host kernel."""

    def kernel(yy_ref, c_ref, redo_ref, vs_ref, ws_ref, ls_ref, n_ref,
               rem_ref):
        i = pl.program_id(1)
        init_stacks, push, finalize_pools, recon_step = _stack_machine(
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
                     "chunk", "interpret", "flag_tol"))
def oasis_ar1_pallas_long(signals: jnp.ndarray, g: float = 0.95,
                          lam: float = 0.0, s_min: float = 0.0,
                          depth: int = 512, merge_attempts: int = 4,
                          chunk: int = 2048, interpret: bool = False,
                          flag_tol: float = 0.0):
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
                           flag_tol),
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
            pltpu.VMEM((D, _LANES), jnp.float32),
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
                     "interpret", "flag_tol"))
def oasis_ar1_pallas(signals: jnp.ndarray, g: float = 0.95, lam: float = 0.0,
                     s_min: float = 0.0, depth: int | None = None,
                     merge_attempts: int = 4, interpret: bool = False,
                     flag_tol: float = 0.0):
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
        _oasis_kernel(T, D, g, s_min, merge_attempts, flag_tol),
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
            pltpu.VMEM((D, _LANES), jnp.float32),
            pltpu.VMEM((D, _LANES), jnp.float32),
            pltpu.VMEM((1, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(yyT)

    c, s = cT.T[:B], sT.T[:B]
    redo = redo[0, :B]
    return (c.reshape(signals.shape), s.reshape(signals.shape),
            redo.reshape(batch_shape))
