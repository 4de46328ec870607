"""On-device OASIS AR(1) spike deconvolution (JAX).

The reference calls the external Cython ``oasisAR1`` per neuron per trial from
host Python, fanned out over a ``multiprocessing.Pool``
(``/root/reference/gan/utils/spike_helper.py:23-54``,
``compute_metrics.py:45-49``). Here the same pool-adjacency algorithm (see
:mod:`calciumgan_tpu.ops.oasis_ref` for the spec and provenance) is expressed
as a fixed-trip-count state machine under ``lax.while_loop`` and vmapped over
traces, so deconvolution of a whole (trials x neurons) batch is ONE XLA
computation on the TPU. (:func:`deconvolve_signals` defaults to the much
faster Pallas kernel in :mod:`calciumgan_tpu.ops.oasis_pallas` on TPU; the
while_loop machine stays as the exact fallback and CPU path.)

- time is the sequential dimension (a merge/push event machine, at most
  ``2T-1`` iterations), the trace batch is the vector dimension — each step is
  a tiny batched gather/scatter, so wall-clock is ~O(T) regardless of batch.
- pool reconstruction is fully parallel (cumsum + searchsorted + gather).

Also provides :func:`ar1_filter` — spikes->calcium synthesis as an
``associative_scan`` (log-depth first-order recurrence), the inverse
direction used by the DG data generators
(``/root/reference/dataset/generate_dg_data.py:54-70``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["oasis_ar1_jax", "deconvolve_signals", "deconvolve_signals_host",
           "ar1_filter", "first_order_recurrence"]


def _oasis_single(y: jnp.ndarray, g: float, lam: float, s_min: float):
    """Single-trace OASIS AR(1). y: (T,) float32. Returns (c, s)."""
    T = y.shape[0]
    dtype = y.dtype
    g = jnp.asarray(g, dtype)
    log_g = jnp.log(g)
    s_min_ = jnp.asarray(s_min, dtype)

    yy = y - lam * (1.0 - g)
    yy = yy.at[T - 1].set(y[T - 1] - lam)

    def gpow(e):
        # g**e for a traced integer exponent; underflows cleanly to 0.
        return jnp.exp(e.astype(dtype) * log_g)

    def violation(v, w, ln, p):
        pm1 = jnp.maximum(p - 1, 0)
        top = v[p] / w[p]
        prev = gpow(ln[pm1]) * (v[pm1] / w[pm1]) + s_min_
        return (p > 0) & (top < prev)

    def cond(state):
        v, w, ln, t, p = state
        return (t < T) | violation(v, w, ln, p)

    def body(state):
        v, w, ln, t, p = state
        viol = violation(v, w, ln, p)
        pm1 = jnp.maximum(p - 1, 0)

        # merge top pool into its left neighbour
        gl = gpow(ln[pm1])
        v_m = v.at[pm1].add(gl * v[p])
        w_m = w.at[pm1].add(gl * gl * w[p])
        l_m = ln.at[pm1].add(ln[p])

        # push a new singleton pool at p+1 (clipped: inactive lanes under
        # vmap may reach t == T; their state is masked out by the batched
        # while_loop select)
        tc = jnp.minimum(t, T - 1)
        pp1 = jnp.minimum(p + 1, T - 1)
        v_p = v.at[pp1].set(yy[tc])
        w_p = w.at[pp1].set(jnp.asarray(1.0, dtype))
        l_p = ln.at[pp1].set(1)

        v2 = jnp.where(viol, v_m, v_p)
        w2 = jnp.where(viol, w_m, w_p)
        l2 = jnp.where(viol, l_m, l_p)
        t2 = jnp.where(viol, t, t + 1)
        p2 = jnp.where(viol, p - 1, p + 1)
        return (v2, w2, l2, t2, p2)

    v0 = jnp.zeros((T,), dtype).at[0].set(yy[0])
    w0 = jnp.zeros((T,), dtype).at[0].set(1.0)
    l0 = jnp.zeros((T,), jnp.int32).at[0].set(1)
    state = (v0, w0, l0, jnp.int32(1), jnp.int32(0))

    v, w, ln, _, p = lax.while_loop(cond, body, state)

    # ---- parallel reconstruction ----
    n_pools = p + 1
    idx = jnp.arange(T, dtype=jnp.int32)
    valid = idx < n_pools
    l_masked = jnp.where(valid, ln, 0)
    starts = jnp.cumsum(l_masked) - l_masked      # inclusive start per pool
    # invalid tail pools all start at T, after every time index
    starts = jnp.where(valid, starts, T)
    pool_id = jnp.searchsorted(starts, idx, side="right") - 1
    h = jnp.maximum(v / w, 0.0)
    c = h[pool_id] * jnp.exp(
        (idx - starts[pool_id]).astype(dtype) * log_g)
    s = jnp.concatenate([jnp.zeros((1,), dtype), c[1:] - g * c[:-1]])
    return c, s


@functools.partial(jax.jit, static_argnames=("g", "lam", "s_min"))
def oasis_ar1_jax(signals: jnp.ndarray, g: float = 0.95, lam: float = 0.0,
                  s_min: float = 0.0):
    """Batched OASIS AR(1): signals (..., T) -> (c, s) of the same shape."""
    signals = jnp.asarray(signals, jnp.float32)
    batch_shape = signals.shape[:-1]
    flat = signals.reshape((-1, signals.shape[-1]))
    c, s = jax.vmap(lambda tr: _oasis_single(tr, g, lam, s_min))(flat)
    return c.reshape(signals.shape), s.reshape(batch_shape + (s.shape[-1],))


@functools.partial(
    jax.jit, static_argnames=("g", "s_min", "threshold", "backend", "depth"))
def deconvolve_signals(signals: jnp.ndarray, g: float = 0.95,
                       s_min: float = 0.55, threshold: float = 0.5,
                       backend: str = "auto", depth: int | None = None):
    """Binary spike trains for a (..., T) batch, on device.

    Parity with the reference's ``spike_helper.deconvolve_signals`` /
    ``oasis_function`` (g=0.95, s_min=0.55, binarise at 0.5 —
    ``spike_helper.py:23-29``), minus the host pool.

    ``backend``: ``'pallas'`` (the VMEM event machine in
    :mod:`calciumgan_tpu.ops.oasis_pallas`; 23-56k traces/s/chip at sl2048
    vs 444 for the while_loop path and 13.6k for the C++ host kernel),
    ``'while'`` (the exact ``lax.while_loop`` machine above), or ``'auto'``
    (pallas on TPU for traces up to ``_PALLAS_MAX_T`` — longer ones exceed
    the kernel's VMEM window budget — while elsewhere). Traces the Pallas
    kernel flags as
    unreliable (stack overflow / unresolved merges — rare by construction)
    are transparently recomputed with the exact path under a ``lax.cond``.

    Precision contract: this in-graph API is exact W.R.T. THE F32
    ALGORITHM — its redo path re-runs the same arithmetic family on
    device, so a merge decision whose f32 margin sits inside the
    arithmetic error band (~1 per 4e7 decisions) can still differ from
    the f64 host kernel. Callers that need f64-golden spike parity use
    :func:`deconvolve_signals_host`, whose borderline-flagged lanes
    (redo bit 2) are recomputed in f64 on the host.
    """
    T = signals.shape[-1]
    if backend == "auto":
        on_tpu = jax.default_backend() == "tpu"
        backend = "pallas" if on_tpu and T <= _PALLAS_MAX_T else "while"
    if backend == "while":
        _, s = oasis_ar1_jax(signals, g=g, lam=0.0, s_min=s_min)
    else:
        from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas
        interpret = jax.default_backend() != "tpu"
        _, s, redo = oasis_ar1_pallas(signals, g=g, lam=0.0, s_min=s_min,
                                      depth=depth, interpret=interpret)

        def fix(s):
            # in-graph exactness: when ANY lane flags, the whole batch
            # re-runs the exact while_loop machine and flagged lanes take
            # its result. Flags are rare by construction (module doc of
            # oasis_pallas), but one flagged trace in a large chunk costs a
            # full slow pass — host callers that can tolerate a device
            # round-trip should prefer :func:`deconvolve_signals_host`,
            # which gathers and recomputes only the flagged traces.
            _, s_w = oasis_ar1_jax(signals, g=g, lam=0.0, s_min=s_min)
            return jnp.where((redo != 0)[..., None], s_w, s)

        s = lax.cond(jnp.any(redo != 0), fix, lambda x: x, s)
    return (s > threshold).astype(jnp.float32)


# Eval-path stack-depth ladder: the kernel's per-timestep VMEM roll traffic
# scales with the stack cap, so each step down the ladder is ~linear
# throughput. First rung 64 covers spiky-calcium sl2048 workloads with zero
# flags (measured per-trace max pool depth on 512 bench traces: mean 42.7,
# p99 57, max 64 — and DG-like calcium ~54; round-4 study), 33% less roll
# traffic than round-3's 96 rung. Atypically dense data (e.g. >=5%
# spikes/frame, demand ~123 at sl2048) legitimately needs deeper stacks;
# when more than ``_ESCALATE_FRAC`` of a chunk's lanes carry a DEPTH flag
# (redo bit 0), re-dispatching the whole chunk one rung deeper beats the
# host redo path (one 16k-trace dispatch ~ 0.13 s ~ recomputing ~1.7k
# traces on the C++ host kernel at 13.6k traces/s/core). The rung after 64
# jumps straight to 160: demand between 64 and 96 is rare on every
# measured family (spiky <=64, dense ~123), so an intermediate 96 rung
# would only add a compile shape and a wasted dispatch on escalating data.
_DEPTH_LADDER = (64, 160, 256)
_ESCALATE_FRAC = 0.10

# Eval-path per-timestep merge budget: the kernel's default is 4 (covers
# everything ever measured with margin), but each masked-merge attempt is 3
# (D, 128) VMEM rolls per timestep, so the budget is ~2/3 of the forward
# sweep's roll traffic. Measured per-timestep merge demand at the production
# s_min=0.55 — synthetic spiky + 6%-dense calcium, real validation traces,
# and raw early-epoch GAN output (the nastiest data the eval sees) — is <= 2
# on 831/832 traces (max 3; round-4 study), so budget 2 leaves ~0.1% of
# traces merge-flagged (measured 22/16384 on the bench data; +38% throughput:
# 251k vs 182k traces/s at depth 96). Merge-flagged traces are recomputed
# exactly host-side — and because the redo output is a cause bitmask, they
# do NOT trigger the depth ladder (deeper stacks add no merge attempts).
_MERGE_BUDGET = 2

# relative width of the kernel's borderline-decision band (see
# oasis_pallas._stack_machine): a merge decision whose f32 margin falls
# inside flag_tol*(1+|rhs|) may flip against the f64 exact host kernel,
# toggling a spike of amplitude ≈ s_min. Calibrated 10x above the largest
# f32 margin error measured over 257k replayed decisions (2.8e-6); flags
# ~2.4% of lanes on bench-style spiky data (~400/16384 — each an exact
# host redo, ~30 ms/chunk on one core).
_BORDERLINE_TOL = 1e-5

# band for the PRECISE stack machine (compensated v, closed-form w,
# split-argument g^l — oasis_pallas._stack_machine_precise), whose margin
# error is the intrinsic ~ulp of exp/expm1/div instead of the classic
# machine's O(eps * pool_length) accumulation. Calibration
# (tools/calibrate_oasis_band.py, 15.3M replayed decisions on 256 lanes x
# 20k frames): max |margin_kernel - margin_f64| = 3.36e-7 (p99 1.3e-7) vs
# the classic machine's 1.96e-6 — this band is 4.5x the max, and predicts
# ~2-3% flagged lanes at 20k frames vs ~19-23% at the classic 1e-5 band
# (round-4 VERDICT weak #2). True f64 margins as small as 2.1e-7 occur in
# that corpus, so SOME flags are inherent at any honest band width.
_BORDERLINE_TOL_PRECISE = 1.5e-6


def _flag_tol(s_min: float, threshold: float,
              precise: bool = False) -> float:
    """Borderline band width for a (s_min, threshold) pair.

    Any ``s_min > 0`` makes a flipped merge decision consequential: the
    boundary spike itself has amplitude ≈ s_min + margin (thresholdable
    when s_min >= threshold), and even when it isn't, merging shifts both
    pools' heights by O(s_min), which can move a NEIGHBOURING boundary
    spike across the binarisation threshold. Only at ``s_min == 0`` is a
    flipped decision provably harmless — an exact-equality split there
    reconstructs the identical trace (merged height equals both pool
    heights), and clean synthetic data hits exact equality often enough
    that a band would mass-flag — so the band is off only there.
    """
    del threshold
    if s_min <= 0.0:
        return 0.0
    return _BORDERLINE_TOL_PRECISE if precise else _BORDERLINE_TOL

# Longest trace the whole-trace Pallas kernel can hold: each grid step
# keeps THREE (T, 128) float32 VMEM windows (fluorescence in, c and s out),
# and Mosaic double-buffers blocks across grid steps, so the footprint is
# ~6*T*128*4 B + the (depth, 128) stacks. T=4096 is ~12.6 MB against the
# ~16 MB/core VMEM budget. Longer traces (e.g. the 20k-frame recordings
# spike_train_inference deconvolves) take the TIME-CHUNKED kernel
# (ops.oasis_pallas.oasis_ar1_pallas_long): only one (chunk, 128) window is
# VMEM-resident at a time while the pool stacks persist in scratch across
# grid steps, so T is unbounded. Its stack ladder is deeper because the
# final pool count grows with T (~ the spike count).
_PALLAS_MAX_T = 4096
_LONG_CHUNK = 2048


def _long_ladder(T: int) -> tuple:
    """Depth ladder for whole-recording traces, scaled to T.

    The final pool count grows with T (~ the spike count: measured mean
    403 / max 439 on 20k-frame 2%-rate traces), so a static first rung
    either always overflows (256 at 20k frames — every call paid a wasted
    dispatch before escalating) or wastes roll traffic on short traces.
    First rung 2.3% of T (64-row aligned, floored at 256) lands on 512 at
    20k frames — measured zero depth flags there (f32 demand can exceed
    the f64 max 439 by a few lanes: 11/2048 flag at 448), and the
    depth-cost curve is ~linear (hardware sweep 448..640: 10.7k -> 8.2k
    traces/s), so the shallowest zero-flag rung wins. Deeper rungs double.

    Every rung is capped at 2048 rows (3 f32 stacks = 3 MB of the ~16 MB
    VMEM budget, next to the double-buffered chunk windows): an hour-long
    recording would otherwise scale the stacks past VMEM and fail to
    COMPILE, where the algorithm only needs the cap to degrade gracefully
    — lanes deeper than the deepest rung depth-flag and are host-redone.
    """
    r1 = max(256, -(-int(0.023 * T) // 64) * 64)
    return tuple(dict.fromkeys(
        min(T, d, 2048) for d in (r1, 2 * r1, max(4 * r1, 1024))))


def deconvolve_signals_host(signals, g: float = 0.95, s_min: float = 0.55,
                            threshold: float = 0.5, depth: int | None = None,
                            device_signals=None):
    """Host-driver deconvolution: Pallas kernel + host-side redo gathering.

    Same result as :func:`deconvolve_signals` (backend='pallas') but redo
    flags are resolved OUTSIDE the graph: only the flagged traces re-run the
    exact while_loop machine, instead of the in-graph ``lax.cond`` that
    recomputes the entire batch when any single lane flags (one unlucky
    trace in a 4096-trace chunk would cost ~9 s there). Spikes come back as
    a host int8 array — 4x less tunnel/host traffic than float32.

    With ``depth=None`` the dispatch walks ``_DEPTH_LADDER`` (or the deeper
    T-scaled ``_long_ladder`` through the time-chunked kernel when the
    traces exceed ``_PALLAS_MAX_T`` — whole recordings stay on device
    instead of falling back to the host kernel): shallow first for speed,
    escalating
    the whole chunk on device while a large fraction of lanes flags. An
    explicit ``depth`` pins a single dispatch.

    ``device_signals``: optional already-on-device copy of ``signals``
    (same shape/dtype). Callers looping over chunks pass the NEXT chunk's
    async ``jax.device_put`` before blocking on the current one, so the
    host->device transfer overlaps kernel compute
    (:func:`calciumgan_tpu.eval.spike_eval.deconvolve_file`).

    Args: signals (..., T) host array. Returns np.int8 of the same shape.
    """
    import numpy as np

    signals = np.asarray(signals, np.float32)
    interpret = jax.default_backend() != "tpu"

    T = signals.shape[-1]
    if T > _PALLAS_MAX_T and interpret:
        # interpret-mode chunked Pallas on a whole recording is not a real
        # path — off-TPU the C++ OpenMP kernel handles long traces
        flat = signals.reshape((-1, T))
        exact = _exact_spikes_host(flat, g, s_min, threshold)
        return exact.reshape(signals.shape)
    long_kernel = T > _PALLAS_MAX_T
    if depth is not None:
        ladder = (depth,)
    elif long_kernel:
        ladder = _long_ladder(T)
    else:  # clamp to T and dedupe so short traces run one rung, not three
        ladder = tuple(dict.fromkeys(min(T, d) for d in _DEPTH_LADDER))
    if device_signals is not None:
        if tuple(device_signals.shape) != signals.shape:
            raise ValueError(
                f"device_signals shape {tuple(device_signals.shape)} != "
                f"signals shape {signals.shape}")
        dev = device_signals
    else:
        dev = jax.device_put(signals)  # upload once; ladder retries reuse it
    for i, d in enumerate(ladder):
        if long_kernel:
            spikes_dev, redo_dev = _pallas_spikes_long(
                dev, g, s_min, threshold, d, _LONG_CHUNK, interpret)
        else:
            spikes_dev, redo_dev = _pallas_spikes(dev, g, s_min, threshold,
                                                  d, interpret)
        flags = np.asarray(jax.device_get(redo_dev))
        # escalate only on DEPTH flags (bit 0): a deeper rung cannot help a
        # lane whose merge budget was exhausted (bit 1) or whose merge
        # decision was numerically borderline (bit 2) — those go straight
        # to the exact host redo below
        depth_frac = float(((flags & 1) != 0).mean())
        if depth_frac <= _ESCALATE_FRAC or i == len(ladder) - 1:
            break
    # np.array (copy): device_get views are read-only and flagged rows are
    # patched in place below
    spikes = np.array(jax.device_get(spikes_dev))
    if flags.any():
        idx = np.nonzero(flags.reshape(-1))[0]
        flat = signals.reshape((-1, signals.shape[-1]))
        exact = _exact_spikes_host(flat[idx], g, s_min, threshold)
        spikes.reshape((-1, signals.shape[-1]))[idx] = exact
    return spikes


@functools.partial(jax.jit, static_argnames=("g", "s_min", "threshold",
                                              "depth", "interpret"))
def _pallas_spikes(y, g, s_min, threshold, depth, interpret):
    """Module-level jit: :func:`deconvolve_signals_host` calls this once per
    chunk — a closure jitted inside the function would start a fresh trace
    cache every call and recompile the same (chunk, T) program per chunk."""
    from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas
    _, s, redo = oasis_ar1_pallas(y, g=g, lam=0.0, s_min=s_min,
                                  depth=depth, interpret=interpret,
                                  merge_attempts=_MERGE_BUDGET,
                                  flag_tol=_flag_tol(s_min, threshold))
    return (s > threshold).astype(jnp.int8), redo


@functools.partial(jax.jit, static_argnames=("g", "s_min", "threshold",
                                              "depth", "chunk", "interpret"))
def _pallas_spikes_long(y, g, s_min, threshold, depth, chunk, interpret):
    """Whole-recording variant of :func:`_pallas_spikes` (time-chunked grid,
    stacks persisted in scratch — see oasis_pallas.oasis_ar1_pallas_long).

    Runs the PRECISE stack machine: at whole-recording lengths the per-lane
    decision count is ~10x sl2048's, so the classic machine's borderline
    band flagged ~23% of lanes (each an exact host redo); the compensated
    arithmetic earns a ~10x tighter band at unchanged roll traffic."""
    from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas_long
    _, s, redo = oasis_ar1_pallas_long(
        y, g=g, lam=0.0, s_min=s_min, depth=depth, chunk=chunk,
        interpret=interpret, merge_attempts=_MERGE_BUDGET, precise=True,
        flag_tol=_flag_tol(s_min, threshold, precise=True))
    return (s > threshold).astype(jnp.int8), redo


def _exact_spikes_host(traces, g, s_min, threshold):
    """Exact f64 spikes for a handful of flagged traces. Prefers the C++
    OpenMP kernel (f64 accumulation; ~13.6k traces/s/core at sl2048) over
    the numpy golden model (same f64 arithmetic, ~100x slower Python pool
    loop). Both are float64: a borderline-flagged lane (redo bit 2) was
    flagged precisely because f32 cannot decide it, so the redo must leave
    the f32 arithmetic family — falling back to the f32 while_loop machine
    here would silently void the parity guarantee (round-4 ADVICE)."""
    import numpy as np
    from calciumgan_tpu import native
    from calciumgan_tpu.ops import oasis_ref
    out = native.deconvolve_batch(traces, g=g, s_min=s_min,
                                  threshold=threshold)
    if out is not None:
        return out.astype(np.int8)
    global _WARNED_NATIVE_FALLBACK
    if not _WARNED_NATIVE_FALLBACK:
        _WARNED_NATIVE_FALLBACK = True
        import warnings
        warnings.warn(
            "calciumgan_tpu native lib unavailable; exact OASIS redo is "
            "using the numpy f64 golden model (correct but ~100x slower "
            "than the C++ kernel)", RuntimeWarning, stacklevel=2)
    traces = np.asarray(traces, np.float64)
    return oasis_ref.deconvolve_signals_ref(
        traces.reshape((-1, traces.shape[-1])), g=g, s_min=s_min,
        threshold=threshold).astype(np.int8).reshape(traces.shape)


_WARNED_NATIVE_FALLBACK = False


def first_order_recurrence(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
                           reverse: bool = False):
    """Solve ``c[t] = a[t] * c[t-1] + b[t]`` (with ``c`` before the first
    element = 0; time flipped when ``reverse``) as a log-depth
    ``associative_scan`` over the composition of affine maps
    ``x -> x*a + b``. Returns ``(a_prod, c)``. Shared by :func:`ar1_filter`
    and the van Rossum decay kernel
    (:mod:`calciumgan_tpu.ops.spike_metrics`)."""
    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, b1 * a2 + b2

    if reverse and axis < 0:  # associative_scan(reverse) needs axis >= 0
        axis += b.ndim
    return lax.associative_scan(combine, (a, b), axis=axis, reverse=reverse)


def ar1_filter(spikes: jnp.ndarray, g=(0.95,), axis: int = -1) -> jnp.ndarray:
    """Spikes -> calcium via the AR recurrence, as a log-depth parallel scan.

    AR(1): c[t] = s[t] + g*c[t-1] for t >= 2, with c[0]=s[0], c[1]=s[1]
    (the DG generators start the recurrence at t=2 — reference
    ``dataset/generate_dg_data.py:54-70`` — so the g*c[0] term is absent at
    t=1; we reproduce that by pre-subtracting g*s[0] from s[1] and running
    the full recurrence). AR(2) falls back to ``lax.scan``.

    Implemented with ``lax.associative_scan`` over the composition of affine
    maps (a, b) -> x*a + b, so the sequential dimension costs O(log T) depth
    on TPU instead of O(T).
    """
    spikes = jnp.asarray(spikes)
    if not jnp.issubdtype(spikes.dtype, jnp.floating):
        # int/bool spike trains (e.g. the int8 `spikes` h5 datasets) would
        # truncate g to 0 in the affine maps and silently skip the decay
        spikes = spikes.astype(jnp.float32)
    g = tuple(float(x) for x in (g if hasattr(g, "__len__") else (g,)))
    x = jnp.moveaxis(spikes, axis, -1)

    if len(g) == 1:
        if x.shape[-1] >= 2:
            x = x.at[..., 1].add(-g[0] * x[..., 0])
        a = jnp.full(x.shape, g[0], x.dtype)
        _, c = first_order_recurrence(a, x, axis=-1)
    else:
        g1, g2 = g

        def step(carry, s_t):
            c1, c2 = carry
            c = s_t + g1 * c1 + g2 * c2
            return (c, c1), c

        xt = jnp.moveaxis(x, -1, 0)
        # reference semantics: first two samples are passed through unchanged
        init = (xt[1], xt[0])
        _, tail = lax.scan(step, init, xt[2:])
        c = jnp.moveaxis(jnp.concatenate([xt[:2], tail], axis=0), 0, -1)

    return jnp.moveaxis(c, -1, axis)
