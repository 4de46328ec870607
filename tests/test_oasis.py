"""OASIS AR(1) kernel: JAX on-device vs numpy golden model.

SURVEY.md §7 names OASIS numerical parity as the main risk: the on-device
scan must match the pool-adjacency algorithm output exactly (g=0.95,
s_min=0.55, threshold 0.5 — the reference's spike_helper.py:28-29 recipe).
"""

import numpy as np
import pytest

from calciumgan_tpu.ops import oasis_ref
from calciumgan_tpu.ops.oasis import ar1_filter, deconvolve_signals, oasis_ar1_jax


def synth_traces(rng, n=8, T=256, g=0.95, rate=0.02, sn=0.3):
    spikes = (rng.random((n, T)) < rate).astype(np.float64)
    c = np.zeros_like(spikes)
    for t in range(T):
        c[:, t] = spikes[:, t] + (g * c[:, t - 1] if t > 0 else 0.0)
    return c + sn * rng.standard_normal((n, T)), spikes


def test_single_trace_matches_reference(rng):
    y, _ = synth_traces(rng, n=1, T=300)
    c_ref, s_ref = oasis_ref.oasis_ar1(y[0], g=0.95, s_min=0.55)
    c_jax, s_jax = oasis_ar1_jax(y[0][None], g=0.95, s_min=0.55)
    np.testing.assert_allclose(np.asarray(c_jax)[0], c_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_jax)[0], s_ref, atol=1e-4)


@pytest.mark.parametrize("s_min,lam", [(0.0, 0.0), (0.55, 0.0), (0.0, 1.0)])
def test_batch_matches_reference(rng, s_min, lam):
    y, _ = synth_traces(rng, n=16, T=200)
    c_jax, s_jax = oasis_ar1_jax(y, g=0.95, lam=lam, s_min=s_min)
    for i in range(len(y)):
        c_ref, s_ref = oasis_ref.oasis_ar1(y[i], g=0.95, lam=lam, s_min=s_min)
        np.testing.assert_allclose(np.asarray(c_jax)[i], c_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_jax)[i], s_ref, atol=1e-4)


def test_binarised_spikes_match(rng):
    y, _ = synth_traces(rng, n=8, T=256)
    ref = oasis_ref.deconvolve_signals_ref(y)
    jx = np.asarray(deconvolve_signals(y))
    # binarisation tolerates tiny float differences except at the threshold;
    # these synthetic traces keep spike sizes away from exactly 0.5
    np.testing.assert_array_equal(jx, ref)


def test_deconvolve_recovers_clean_spikes():
    # noiseless trace: deconvolution must recover the exact spike train
    T, g = 128, 0.95
    spikes = np.zeros(T)
    spikes[[10, 40, 90]] = 1.0
    c = np.zeros(T)
    for t in range(T):
        c[t] = spikes[t] + (g * c[t - 1] if t > 0 else 0.0)
    out = np.asarray(deconvolve_signals(c[None]))[0]
    np.testing.assert_array_equal(out, spikes)


def test_constant_zero_trace():
    out = np.asarray(deconvolve_signals(np.zeros((2, 64))))
    assert out.sum() == 0


def test_deconvolve_signals_host_matches_and_recomputes_flagged(rng):
    """The host-driver path (Pallas + host-side redo gathering) must match
    the exact path bit-for-bit — including when some traces overflow a
    deliberately tiny stack depth and get recomputed individually."""
    from calciumgan_tpu.ops.oasis import deconvolve_signals_host
    from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas

    y, _ = synth_traces(rng, n=12, T=192)
    y = np.asarray(y, np.float32)
    exact = np.asarray(deconvolve_signals(y, backend="while")).astype(np.int8)

    # depth=8 forces stack overflow on busy traces -> redo flags fire
    _, _, redo = oasis_ar1_pallas(y, g=0.95, s_min=0.55, depth=8,
                                  interpret=True)
    assert bool(np.asarray(redo).any()), "test needs at least one flag"
    out = deconvolve_signals_host(y, depth=8)
    assert out.dtype == np.int8
    np.testing.assert_array_equal(out, exact)

    # and with ample depth (no flags) it still matches
    out_full = deconvolve_signals_host(y)
    np.testing.assert_array_equal(out_full, exact)


def test_deconvolve_signals_host_escalates_depth(rng, monkeypatch):
    """When most of a chunk overflows the shallow first rung, the host
    driver must re-dispatch the whole chunk one rung deeper on device
    instead of recomputing the majority of traces on the host."""
    from calciumgan_tpu.ops import oasis as oasis_mod
    from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas

    y, _ = synth_traces(rng, n=12, T=192, rate=0.2)
    y = np.asarray(y, np.float32)
    exact = np.asarray(deconvolve_signals(y, backend="while")).astype(np.int8)

    # precondition: dense traces overflow depth 8 on well over 10% of lanes
    _, _, redo = oasis_ar1_pallas(y, g=0.95, s_min=0.55, depth=8,
                                  interpret=True)
    assert float(((np.asarray(redo) & 1) != 0).mean()) > \
        oasis_mod._ESCALATE_FRAC

    redone_rows = []
    real_exact = oasis_mod._exact_spikes_host

    def spy(traces, *args, **kwargs):
        redone_rows.append(len(traces))
        return real_exact(traces, *args, **kwargs)

    monkeypatch.setattr(oasis_mod, "_DEPTH_LADDER", (8, 192))
    monkeypatch.setattr(oasis_mod, "_exact_spikes_host", spy)
    out = oasis_mod.deconvolve_signals_host(y)
    np.testing.assert_array_equal(out, exact)
    # the deep rung (192 = T) resolves every lane: nothing went to the host
    assert redone_rows == []


def test_deconvolve_signals_host_merge_flags_skip_ladder(monkeypatch):
    """Merge-budget flags (redo bit 1) must go straight to the exact host
    redo, NOT walk the depth ladder: a deeper stack adds no merge attempts,
    so escalating on them would waste whole-chunk re-dispatches. Trace 423
    of this synth draw deterministically needs 3 merges in one timestep
    (the round-4 merge-demand study), so budget 2 merge-flags it."""
    from calciumgan_tpu.ops import oasis as oasis_mod
    from calciumgan_tpu.ops.oasis_pallas import oasis_ar1_pallas
    from calciumgan_tpu.ops.oasis_ref import synth_ar1_traces

    y = synth_ar1_traces(np.random.default_rng(1), 512, 2048)[423:424]
    y = np.asarray(np.repeat(y, 12, axis=0), np.float32)
    exact = np.asarray(deconvolve_signals(y, backend="while")).astype(np.int8)

    # precondition: budget 2 flags EVERY lane with the merge bit alone —
    # 100% flagged, so cause-blind escalation would re-dispatch twice
    _, _, redo = oasis_ar1_pallas(y, g=0.95, s_min=0.55, depth=96,
                                  merge_attempts=2, interpret=True)
    redo = np.asarray(redo)
    assert ((redo & 2) != 0).all() and ((redo & 1) == 0).all()

    dispatch_depths = []
    real_dispatch = oasis_mod._pallas_spikes

    def spy(dev, g, s_min, threshold, depth, interpret):
        dispatch_depths.append(depth)
        return real_dispatch(dev, g, s_min, threshold, depth, interpret)

    monkeypatch.setattr(oasis_mod, "_MERGE_BUDGET", 2)
    monkeypatch.setattr(oasis_mod, "_pallas_spikes", spy)
    out = oasis_mod.deconvolve_signals_host(y)
    np.testing.assert_array_equal(out, exact)
    assert dispatch_depths == [oasis_mod._DEPTH_LADDER[0]]


def test_deconvolve_signals_host_reroutes_long_traces(rng, monkeypatch):
    """Traces longer than _PALLAS_MAX_T exceed the fused kernel's VMEM
    window budget (three (T, 128) f32 blocks, double-buffered); the host
    driver must hand the WHOLE batch to the exact host path instead of
    dispatching a kernel Mosaic cannot allocate."""
    from calciumgan_tpu.ops import oasis as oasis_mod

    y, _ = synth_traces(rng, n=6, T=192)
    y = np.asarray(y, np.float32)
    exact = np.asarray(deconvolve_signals(y, backend="while")).astype(np.int8)

    routed = []
    real_exact = oasis_mod._exact_spikes_host

    def spy(traces, *args, **kwargs):
        routed.append(len(traces))
        return real_exact(traces, *args, **kwargs)

    monkeypatch.setattr(oasis_mod, "_PALLAS_MAX_T", 128)
    monkeypatch.setattr(oasis_mod, "_exact_spikes_host", spy)
    out = oasis_mod.deconvolve_signals_host(y)
    assert routed == [6]  # every trace took the exact path, no kernel call
    np.testing.assert_array_equal(out, exact)


def test_ar1_filter_matches_reference_loop(rng):
    # reference generate_dg_data.py:54-70 starts the recurrence at t=2
    spikes = (rng.random((4, 100)) < 0.1).astype(np.float32)
    ref = spikes.copy()
    for t in range(2, 100):
        ref[:, t] += 0.95 * ref[:, t - 1]
    out = np.asarray(ar1_filter(spikes, g=(0.95,)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ar1_filter_casts_integer_spikes(rng):
    """int8/bool spike trains (the on-disk `spikes` dataset dtype) must get
    the same AR(1) decay as float input — without the internal cast the
    affine maps truncate g to 0 and return the spikes unchanged."""
    spikes = (rng.random((3, 64)) < 0.1).astype(np.int8)
    out_int = np.asarray(ar1_filter(spikes, g=0.95))
    out_float = np.asarray(ar1_filter(spikes.astype(np.float32), g=0.95))
    np.testing.assert_allclose(out_int, out_float, atol=1e-6)
    assert out_int.dtype.kind == "f"


def test_ar2_filter_matches_reference_loop(rng):
    spikes = (rng.random((4, 100)) < 0.1).astype(np.float32)
    ref = spikes.copy()
    for t in range(2, 100):
        ref[:, t] += 0.6 * ref[:, t - 1] + 0.2 * ref[:, t - 2]
    out = np.asarray(ar1_filter(spikes, g=(0.6, 0.2)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_roundtrip_filter_then_deconvolve(rng):
    # spikes -> calcium -> deconvolved spikes should match for clean data
    spikes = np.zeros((3, 200), np.float32)
    spikes[0, [20, 70, 150]] = 1.0
    spikes[1, [5, 100]] = 1.0
    spikes[2, [60, 61, 120]] = 1.0  # adjacent spikes
    # undo the reference's t=2 start quirk for a true AR(1) trace
    c_full = np.asarray(ar1_filter(np.concatenate(
        [np.zeros((3, 1), np.float32), spikes], axis=1), g=(0.95,)))[:, 1:]
    out = np.asarray(deconvolve_signals(c_full))
    np.testing.assert_array_equal(out, spikes)


def test_jax_matches_native_cpp(rng):
    """Direct cross-check of the two production backends (both are also
    tested against the numpy golden model independently)."""
    from calciumgan_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    spikes = (rng.uniform(size=(8, 300)) < 0.06).astype(np.float32)
    sig = np.zeros_like(spikes)
    for t in range(1, 300):
        sig[:, t] = 0.95 * sig[:, t - 1] + spikes[:, t]
    sig += 0.1 * rng.normal(size=sig.shape).astype(np.float32)
    ours = np.asarray(deconvolve_signals(sig))
    theirs = native.deconvolve_batch(sig)
    np.testing.assert_array_equal(ours, theirs)


def test_long_ladder_scales_with_t():
    from calciumgan_tpu.ops.oasis import _long_ladder
    # measured pool demand ~403 (max 439) at 20k frames: the first rung
    # must fit it in ONE dispatch (the old static 256 always overflowed)
    ladder = _long_ladder(20000)
    assert ladder[0] >= 440 and ladder[0] % 64 == 0
    assert ladder == tuple(sorted(set(ladder)))  # ascending, deduped
    # short long-traces keep the shallow floor
    assert _long_ladder(4097)[0] == 256
    # rungs never exceed T
    assert all(d <= 5000 for d in _long_ladder(5000))
    # VMEM safety: rungs cap at 2048 rows (3 MB of stacks) no matter how
    # long the recording — deeper demand depth-flags to the host redo
    # instead of failing to compile
    assert _long_ladder(400000) == (2048,)


def test_flag_tol_gate():
    from calciumgan_tpu.ops.oasis import _flag_tol, _BORDERLINE_TOL
    # any s_min > 0 makes a flipped merge consequential (pool heights move
    # by O(s_min), which can shift a NEIGHBOURING boundary spike across the
    # threshold); only s_min == 0 is provably harmless and must stay off
    # so clean-data exact-equality splits don't mass-flag
    assert _flag_tol(0.55, 0.5) == _BORDERLINE_TOL
    assert _flag_tol(0.5, 0.5) == _BORDERLINE_TOL
    assert _flag_tol(0.3, 0.5) == _BORDERLINE_TOL
    assert _flag_tol(0.0, 0.5) == 0.0


def test_deconvolve_signals_host_accepts_device_signals(rng):
    """The one-chunk-ahead staging path (eval.spike_eval.deconvolve_file)
    passes a pre-uploaded device copy; result must be identical to the
    host-array path, and a shape mismatch must fail loudly."""
    import jax
    from calciumgan_tpu.ops.oasis import deconvolve_signals_host
    y, _ = synth_traces(rng, n=6, T=192)
    y = y.astype(np.float32)
    base = deconvolve_signals_host(y)
    staged = deconvolve_signals_host(y, device_signals=jax.device_put(y))
    np.testing.assert_array_equal(base, staged)
    with pytest.raises(ValueError, match="device_signals shape"):
        deconvolve_signals_host(y, device_signals=jax.device_put(y[:3]))


def test_exact_spikes_host_fallback_is_f64(monkeypatch, rng):
    """Without the native lib, the exact redo must use the f64 numpy golden
    (NOT the f32 while_loop family the flag exists to escape) and warn once
    (round-4 ADVICE)."""
    import warnings
    from calciumgan_tpu import native
    from calciumgan_tpu.ops import oasis as oasis_mod

    monkeypatch.setattr(native, "deconvolve_batch",
                        lambda *a, **k: None)
    monkeypatch.setattr(oasis_mod, "_WARNED_NATIVE_FALLBACK", False)
    y, _ = synth_traces(rng, n=4, T=200)
    y = y.astype(np.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = oasis_mod._exact_spikes_host(y, 0.95, 0.55, 0.5)
        # second call: warn-once
        oasis_mod._exact_spikes_host(y, 0.95, 0.55, 0.5)
    assert sum("numpy f64 golden" in str(w.message) for w in caught) == 1
    exp = oasis_ref.deconvolve_signals_ref(
        y.astype(np.float64), g=0.95, s_min=0.55, threshold=0.5)
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, exp.astype(np.int8))


def test_deconvolve_signals_host_fuzz_matches_f64_golden():
    """Seeded fuzz: the full dispatch (ladder + flags + host redo) must
    match the f64 exact kernel across data characters — rates from sparse
    to dense, noise levels, amplitude scales. One fixed shape so interpret
    mode compiles once; the data varies."""
    from calciumgan_tpu.ops.oasis import (deconvolve_signals_host,
                                          _exact_spikes_host)
    rng = np.random.default_rng(2024)
    for case in range(8):
        rate = float(rng.uniform(0.005, 0.12))
        sn = float(rng.uniform(0.05, 0.6))
        scale = float(rng.uniform(0.3, 8.0))
        spikes = (rng.random((12, 160)) < rate).astype(np.float64)
        c = np.zeros_like(spikes)
        for t in range(1, 160):
            c[:, t] = spikes[:, t] + 0.95 * c[:, t - 1]
        c[:, 0] = spikes[:, 0]
        y = (scale * (c + sn * rng.standard_normal(c.shape))).astype(np.float32)
        got = deconvolve_signals_host(y)
        exp = _exact_spikes_host(y, 0.95, 0.55, 0.5)
        np.testing.assert_array_equal(
            got, exp, err_msg=f"case {case}: rate={rate:.3f} sn={sn:.2f} "
                              f"scale={scale:.2f}")
