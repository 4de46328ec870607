"""Pallas OASIS kernel: golden parity with the numpy model + redo fallback.

The kernel (calciumgan_tpu/ops/oasis_pallas.py) replaces the reference's
Cython oasisAR1 + multiprocessing.Pool (spike_helper.py:23-54). Tests run in
interpreter mode on the CPU mesh; the compiled path is exercised and
benchmarked on the real chip by bench.py.
"""

import numpy as np
import pytest

from calciumgan_tpu.ops import oasis_ref
from calciumgan_tpu.ops.oasis import deconvolve_signals
from calciumgan_tpu.ops.oasis_pallas import (oasis_ar1_pallas,
                                             oasis_ar1_pallas_long)


def synth_traces(rng, n=8, T=256, g=0.95, rate=0.02, sn=0.3):
    spikes = (rng.random((n, T)) < rate).astype(np.float64)
    c = np.zeros_like(spikes)
    for t in range(T):
        c[:, t] = spikes[:, t] + (g * c[:, t - 1] if t > 0 else 0.0)
    return c + sn * rng.standard_normal((n, T))


@pytest.mark.parametrize("precise", [False, True])
@pytest.mark.parametrize("s_min,lam", [(0.55, 0.0), (0.0, 0.0), (0.0, 1.0)])
def test_matches_numpy_golden(rng, s_min, lam, precise):
    y = synth_traces(rng, n=6, T=220)
    c, s, redo = oasis_ar1_pallas(y, g=0.95, lam=lam, s_min=s_min,
                                  interpret=True, precise=precise)
    c, s, redo = map(np.asarray, (c, s, redo))
    assert not redo.any()
    for i in range(len(y)):
        c_ref, s_ref = oasis_ref.oasis_ar1(y[i], g=0.95, lam=lam, s_min=s_min)
        np.testing.assert_allclose(c[i], c_ref, atol=1e-4)
        np.testing.assert_allclose(s[i], s_ref, atol=1e-4)


def test_batch_shape_and_multi_block(rng):
    # >128 traces exercises the lane-block grid; 3-D batch exercises reshape
    y = synth_traces(rng, n=130, T=64).reshape(13, 10, 64)
    c, s, redo = oasis_ar1_pallas(y, g=0.95, s_min=0.55, interpret=True)
    assert c.shape == y.shape and s.shape == y.shape
    assert redo.shape == (13, 10)
    flat = y.reshape(-1, 64)
    for i in (0, 64, 129):  # first block, boundary, second block
        _, s_ref = oasis_ref.oasis_ar1(flat[i], g=0.95, s_min=0.55)
        np.testing.assert_allclose(np.asarray(s).reshape(-1, 64)[i], s_ref,
                                   atol=1e-4)


def test_redo_flag_on_stack_overflow():
    # a monotone ramp at s_min=0 keeps every pool: depth = T > tiny cap
    ramp = np.linspace(0.0, 10.0, 64)[None].repeat(3, 0)
    _, _, redo = oasis_ar1_pallas(ramp, s_min=0.0, depth=8, interpret=True)
    assert np.asarray(redo).all()


def test_redo_flag_on_merge_budget():
    # a long decay after a big spike forces a cascade of merges at one
    # timestep; merge_attempts=1 cannot resolve it
    T = 96
    spikes = np.zeros(T)
    spikes[5] = 5.0
    c = np.zeros(T)
    for t in range(T):
        c[t] = spikes[t] + (0.95 * c[t - 1] if t else 0.0)
    y = c + 0.3 * np.sin(np.arange(T))  # wiggle creates pools to merge
    _, s1, redo1 = oasis_ar1_pallas(y[None], s_min=0.55, merge_attempts=1,
                                    interpret=True)
    _, s4, redo4 = oasis_ar1_pallas(y[None], s_min=0.55, merge_attempts=4,
                                    interpret=True)
    # with the full budget the result is exact and unflagged
    assert not np.asarray(redo4).any()
    _, s_ref = oasis_ref.oasis_ar1(y, g=0.95, s_min=0.55)
    np.testing.assert_allclose(np.asarray(s4)[0], s_ref, atol=1e-4)
    # the starved kernel must either match anyway or flag itself
    if not np.allclose(np.asarray(s1)[0], s_ref, atol=1e-4):
        assert np.asarray(redo1).any()


def test_borderline_flag():
    # a merge decision whose f32 margin sits inside the kernel's error band
    # (|lhs - rhs| < flag_tol*(1+|rhs|)) must set redo bit 2 so the dispatch
    # host-redoes the lane in f64 — the f32 kernel cannot decide it reliably
    # (observed hardware flip at margin 6e-7, tools/debug_long_mismatch.py)
    g, s_min = 0.95, 0.55
    a = 2.0
    y = np.zeros((1, 64), np.float32)
    y[0, 0] = a
    y[0, 1] = g * a + s_min + 1e-7  # margin 1e-7 vs band ~2.5e-5
    _, _, redo = oasis_ar1_pallas(y, g=g, s_min=s_min, flag_tol=1e-5,
                                  interpret=True)
    assert int(np.asarray(redo)[0]) & 4
    # the band is opt-in: the raw kernel (flag_tol=0) must not flag
    _, _, redo0 = oasis_ar1_pallas(y, g=g, s_min=s_min, interpret=True)
    assert not int(np.asarray(redo0)[0]) & 4
    # a decision comfortably outside the band must not flag
    y2 = y.copy()
    y2[0, 1] = g * a + s_min + 0.2
    _, _, redo2 = oasis_ar1_pallas(y2, g=g, s_min=s_min, flag_tol=1e-5,
                                   interpret=True)
    assert not int(np.asarray(redo2)[0]) & 4


def test_precise_mode_narrows_borderline_band():
    """The precise machine (compensated v, closed-form w, split-argument
    g^l) decides margins the classic f32 band cannot: a ~1e-5 margin sits
    INSIDE the classic band (tol 1e-5 => ~2.5e-5 absolute here) but
    comfortably OUTSIDE the precise band (tol 1e-6), so precise mode
    resolves it unflagged — and must resolve it the f64 way."""
    g, s_min = 0.95, 0.55
    a = 2.0
    y = np.zeros((1, 64), np.float32)
    y[0, 0] = a
    y[0, 1] = np.float32(g * a + s_min + 1e-5)
    _, _, redo_c = oasis_ar1_pallas(y, g=g, s_min=s_min, flag_tol=1e-5,
                                    interpret=True)
    assert int(np.asarray(redo_c)[0]) & 4  # classic: undecidable, flags
    _, s_p, redo_p = oasis_ar1_pallas(y, g=g, s_min=s_min, flag_tol=1e-6,
                                      interpret=True, precise=True)
    assert int(np.asarray(redo_p)[0]) == 0  # precise: decides it
    _, s_ref = oasis_ref.oasis_ar1(y[0].astype(np.float64), g=g, s_min=s_min)
    np.testing.assert_array_equal(np.asarray(s_p)[0] > 0.5, s_ref > 0.5)
    # a margin below even the precise band must still flag
    y[0, 1] = np.float32(g * a + s_min + 1e-8)
    _, _, redo_t = oasis_ar1_pallas(y, g=g, s_min=s_min, flag_tol=1e-6,
                                    interpret=True, precise=True)
    assert int(np.asarray(redo_t)[0]) & 4


@pytest.mark.slow
def test_long_kernel_precise_fuzz_matches_golden(rng):
    """Whole-recording regime (the precise machine's production path via
    ops.oasis._pallas_spikes_long): multi-chunk traversal at the tight
    band must match the f64 golden spikes with flags rare."""
    from calciumgan_tpu.ops.oasis import (_BORDERLINE_TOL_PRECISE,
                                          _MERGE_BUDGET)
    y = synth_traces(rng, n=6, T=4500)
    c, s, redo = oasis_ar1_pallas_long(
        y, g=0.95, s_min=0.55, depth=256, chunk=1024, interpret=True,
        merge_attempts=_MERGE_BUDGET, precise=True,
        flag_tol=_BORDERLINE_TOL_PRECISE)
    s = np.asarray(s)
    redo = np.asarray(redo)
    for i in range(len(y)):
        if redo[i]:  # flagged lanes go to the host redo in production
            continue
        _, s_ref = oasis_ref.oasis_ar1(y[i], g=0.95, s_min=0.55)
        np.testing.assert_array_equal(s[i] > 0.5, s_ref > 0.5)
    assert (redo != 0).sum() <= 1  # tight band, tiny corpus: flags rare


@pytest.mark.parametrize("precise", [False, True])
@pytest.mark.parametrize("s_min,lam", [(0.55, 0.0), (0.0, 0.0), (0.0, 1.0)])
def test_long_kernel_matches_numpy_golden(rng, s_min, lam, precise):
    # T spans several chunks including a PARTIAL final one (300 = 4*64 + 44)
    y = synth_traces(rng, n=6, T=300)
    c, s, redo = oasis_ar1_pallas_long(y, g=0.95, lam=lam, s_min=s_min,
                                       depth=64, chunk=64, interpret=True,
                                       precise=precise)
    c, s, redo = map(np.asarray, (c, s, redo))
    assert not redo.any()
    for i in range(len(y)):
        c_ref, s_ref = oasis_ref.oasis_ar1(y[i], g=0.95, lam=lam, s_min=s_min)
        np.testing.assert_allclose(c[i], c_ref, atol=1e-4)
        np.testing.assert_allclose(s[i], s_ref, atol=1e-4)


def test_long_kernel_matches_short_kernel(rng):
    """Same masked-merge semantics: the time-chunked traversal must agree
    with the whole-trace kernel on inputs both can hold — including the
    spike difference across chunk boundaries (computed outside the long
    kernel from neighbouring c blocks)."""
    y = synth_traces(rng, n=9, T=256)
    c0, s0, r0 = oasis_ar1_pallas(y, g=0.95, s_min=0.55, interpret=True)
    c1, s1, r1 = oasis_ar1_pallas_long(y, g=0.95, s_min=0.55, depth=96,
                                       chunk=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)


def test_long_kernel_multi_block_and_partial_chunk(rng):
    # >128 traces exercises the lane-block grid dimension together with the
    # 2*C forward/backward sweep; T=130 leaves a 2-step final chunk
    y = synth_traces(rng, n=130, T=130)
    c, s, redo = oasis_ar1_pallas_long(y, g=0.95, s_min=0.55, depth=64,
                                       chunk=64, interpret=True)
    assert c.shape == y.shape and s.shape == y.shape
    assert redo.shape == (130,)
    for i in (0, 64, 127, 129):  # both lane blocks incl. boundaries
        _, s_ref = oasis_ref.oasis_ar1(y[i], g=0.95, s_min=0.55)
        np.testing.assert_allclose(np.asarray(s)[i], s_ref, atol=1e-4)


def test_long_kernel_redo_flag_on_stack_overflow():
    # monotone ramp at s_min=0 keeps every pool: pool count = T > depth
    ramp = np.linspace(0.0, 10.0, 160)[None].repeat(3, 0)
    _, _, redo = oasis_ar1_pallas_long(ramp, s_min=0.0, depth=16, chunk=64,
                                       interpret=True)
    assert np.asarray(redo).all()


def test_deconvolve_signals_pallas_backend_matches_while(rng):
    y = synth_traces(rng, n=8, T=200)
    a = np.asarray(deconvolve_signals(y, backend="pallas"))
    b = np.asarray(deconvolve_signals(y, backend="while"))
    np.testing.assert_array_equal(a, b)


def test_deconvolve_signals_fallback_is_exact(rng):
    # force the redo path with a tiny stack: output must still be exact
    y = synth_traces(rng, n=4, T=200, rate=0.2)  # dense -> deeper stacks
    a = np.asarray(deconvolve_signals(y, backend="pallas", depth=8))
    b = np.asarray(deconvolve_signals(y, backend="while"))
    np.testing.assert_array_equal(a, b)
