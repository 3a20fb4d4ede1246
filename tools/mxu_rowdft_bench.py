"""A/B microbench: sublane row-DFT as MXU matmuls vs the sliced butterfly
cascade.

The fused GCC kernels are VPU-compute-bound in the radix-2/radix-4 sliced
stages (CLAUDE.md round-3/4 measured facts).  This tool measures a
four-step-style alternative for the length-N2 row DFT that moves the bulk
of the work to the MXU:

    q = b*G + g  (b in [0,8) leading, g in [0,G) sublane; G = N2/8)
    t = 8*m + p  (output row r' = p*G + m -> opaque permuted order,
                  exactly like the production bit-reversed order)

    1. DFT-8 over the LEADING dim b: 8 outputs, each an unrolled scalar
       MAC over 8 leading slices (the trivial W8 table — same trick as
       the production tile8 'bcast' schedule, but leading-dim slices are
       free and the coefficients are Python scalars).
    2. ONE complex matmul per p: (G, G) x (G, 128) on the MXU, with the
       inter-digit twiddle w^{g p} FOLDED INTO the matrix (an (8, G, G)
       const) — zero twiddle passes, zero rolls, zero masked selects.

MAC count: 8 * G^2 * 128 = N2/8 * N2 * 128 complex MACs = exactly one
lane-DFT equivalent — 8x fewer than round-1's rejected (N2, N2) long-DFT
matmul (dead end (b), docs/pallas_fft_deadends.md).

The historical four-step dead end (a) failed on LANE reshapes; this
formulation only ever splits/merges the LEADING dim, which the sliced
stages already rely on.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python tools/mxu_rowdft_bench.py
        (add --interpret for the CPU equivalence checks only)
"""

import argparse
import functools
import os
import time

import jax

os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyaudiolocalization_tpu.ops import pallas_fft
from pyaudiolocalization_tpu.ops.pallas_fft import (
    _bfly_consts, _bfly_cspec, _bfly_spec, _BFLY_PARAMS, _cmac, _dif_stages,
    _dit_stages, _lane_dft, _MXU_PREC, _N1, _W8)


# ---------------------------------------------------------------------------
# consts
# ---------------------------------------------------------------------------

def _t_perm(n2: int) -> np.ndarray:
    """Natural row-bin t held at output row r' = p*G + m: t = 8*m + p."""
    g = n2 // 8
    r = np.arange(n2)
    p, m = r // g, r % g
    return 8 * m + p


@functools.lru_cache(maxsize=8)
def _rowdft_consts(n2: int):
    """(8, G, G) fused matrices W'_p[m, g] = W_G[m, g] * w^{g p} (f32 pair),
    w = e^{-2 pi i / n2}, W_G = e^{-2 pi i g m / G}."""
    g = n2 // 8
    gm = np.exp(-2j * np.pi * np.outer(np.arange(g), np.arange(g)) / g)
    out = np.empty((8, g, g), np.complex128)
    for p in range(8):
        tw = np.exp(-2j * np.pi * np.arange(g) * p / n2)
        out[p] = gm * tw[None, :]
    return out.real.astype(np.float32), out.imag.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _rowdft_inv_consts(n2: int):
    """(8, G, G) inverse matrices W''_p[g, m] = conj(W'_p[m, g])."""
    wr, wi = _rowdft_consts(n2)
    return (np.ascontiguousarray(np.swapaxes(wr, 1, 2)),
            np.ascontiguousarray(-np.swapaxes(wi, 1, 2)))


@functools.lru_cache(maxsize=8)
def _longtw_perm(n: int):
    """Long twiddle W_N^{p_lane * t} with t in the _t_perm slots."""
    n2 = n // _N1
    t = _t_perm(n2)
    tw = np.exp(-2j * np.pi * np.outer(t, np.arange(_N1)) / n)
    return tw.real.astype(np.float32), tw.imag.astype(np.float32)


# ---------------------------------------------------------------------------
# the row-DFT (in-kernel body)
# ---------------------------------------------------------------------------

def _rowdft_mxu(xr, xi, wgr_ref, wgi_ref, n2, zero_top=False):
    """Row-DFT of a (n2, 128) plane ((n2/2, 128) when zero_top) via
    DFT-8-over-leading + 8 fused-twiddle MXU matmuls.  Output rows in
    _t_perm order.  ``xi=None`` marks a real input."""
    g = n2 // 8
    nb = 4 if zero_top else 8
    x3r = xr.reshape(nb, g, _N1)
    x3i = None if xi is None else xi.reshape(nb, g, _N1)
    outs = []
    for p in range(8):
        ar = ai = None
        for b in range(nb):
            cr, ci = _W8[(b * p) % 8]
            ar, ai = _cmac(ar, ai, cr, ci, x3r[b],
                           None if x3i is None else x3i[b])
        if ai is None:
            ai = jnp.zeros_like(ar)
        wr = wgr_ref[p]
        wi = wgi_ref[p]
        # complex (G, G) @ (G, 128): W' is applied from the left
        yr = (jnp.dot(wr, ar, precision=_MXU_PREC,
                      preferred_element_type=jnp.float32)
              - jnp.dot(wi, ai, precision=_MXU_PREC,
                        preferred_element_type=jnp.float32))
        yi = (jnp.dot(wr, ai, precision=_MXU_PREC,
                      preferred_element_type=jnp.float32)
              + jnp.dot(wi, ar, precision=_MXU_PREC,
                        preferred_element_type=jnp.float32))
        outs.append((yr, yi))
    outr = jnp.concatenate([o[0][None] for o in outs], axis=0)
    outi = jnp.concatenate([o[1][None] for o in outs], axis=0)
    return outr.reshape(n2, _N1), outi.reshape(n2, _N1)


def _rowinv_mxu(xr, xi, vgr_ref, vgi_ref, n2):
    """Inverse row-DFT: consume _t_perm order, return natural rows.
    Per p: matmul with W''_p, then inverse DFT-8 across the 8 T_p planes
    (conjugate W8 scalars), output natural rows q = b*G + g."""
    g = n2 // 8
    x3r = xr.reshape(8, g, _N1)
    x3i = xi.reshape(8, g, _N1)
    tr, ti = [], []
    for p in range(8):
        vr = vgr_ref[p]
        vi = vgi_ref[p]
        tr.append(jnp.dot(vr, x3r[p], precision=_MXU_PREC,
                          preferred_element_type=jnp.float32)
                  - jnp.dot(vi, x3i[p], precision=_MXU_PREC,
                            preferred_element_type=jnp.float32))
        ti.append(jnp.dot(vr, x3i[p], precision=_MXU_PREC,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(vi, x3r[p], precision=_MXU_PREC,
                            preferred_element_type=jnp.float32))
    outr, outi = [], []
    for b in range(8):
        ar = ai = None
        for p in range(8):
            cr, ci = _W8[(-b * p) % 8]
            ar, ai = _cmac(ar, ai, cr, ci, tr[p], ti[p])
        outr.append(ar[None])
        outi.append(ai[None])
    return (jnp.concatenate(outr, axis=0).reshape(n2, _N1),
            jnp.concatenate(outi, axis=0).reshape(n2, _N1))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _stages_kernel(xr_ref, xi_ref, mask_ref, str_ref, sti_ref, or_ref,
                   oi_ref, *, n2, rep=1):
    yr, yi = xr_ref[0], xi_ref[0]
    for it in range(rep):
        if it:
            yr, yi = yr * 1e-3, yi * 1e-3  # keep rep chains finite
        yr, yi = _dif_stages(yr, yi, mask_ref, str_ref, sti_ref, n2)
    or_ref[0] = yr
    oi_ref[0] = yi


def _rowdft_kernel(xr_ref, xi_ref, wgr_ref, wgi_ref, or_ref, oi_ref, *, n2,
                   rep=1):
    yr, yi = xr_ref[0], xi_ref[0]
    for it in range(rep):
        if it:
            yr, yi = yr * 1e-3, yi * 1e-3
        yr, yi = _rowdft_mxu(yr, yi, wgr_ref, wgi_ref, n2)
    or_ref[0] = yr
    oi_ref[0] = yi


def _rowinv_kernel(xr_ref, xi_ref, vgr_ref, vgi_ref, or_ref, oi_ref, *, n2):
    yr, yi = _rowinv_mxu(xr_ref[0], xi_ref[0], vgr_ref, vgi_ref, n2)
    or_ref[0] = yr
    oi_ref[0] = yi


def _fwd_full_kernel(x_ref, mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                     w1r_ref, w1i_ref, or_ref, oi_ref, *, n2, zero_top):
    xr, xi = _dif_stages(x_ref[0], None, mask_ref, str_ref, sti_ref, n2,
                         zero_top=zero_top)
    cr = xr * twr_ref[:] - xi * twi_ref[:]
    ci = xr * twi_ref[:] + xi * twr_ref[:]
    yr, yi = _lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False)
    or_ref[0] = yr
    oi_ref[0] = yi


def _fwd_mxu_kernel(x_ref, wgr_ref, wgi_ref, twr_ref, twi_ref, w1r_ref,
                    w1i_ref, or_ref, oi_ref, *, n2, zero_top):
    xr, xi = _rowdft_mxu(x_ref[0], None, wgr_ref, wgi_ref, n2,
                         zero_top=zero_top)
    cr = xr * twr_ref[:] - xi * twi_ref[:]
    ci = xr * twi_ref[:] + xi * twr_ref[:]
    yr, yi = _lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False)
    or_ref[0] = yr
    oi_ref[0] = yi


def _fwd_mxu2_kernel(x_ref, wgr_ref, wgi_ref, twr_ref, twi_ref, w1r_ref,
                     w1i_ref, or_ref, oi_ref, *, n2, zero_top):
    """Per-p fused forward: row-matmul -> long-twiddle rows -> lane DFT ->
    sliced row write.  No concat/reshape between the row transform and the
    lane DFT (the naive composition's relayout cost)."""
    g = n2 // 8
    nb = 4 if zero_top else 8
    x3r = x_ref[0].reshape(nb, g, _N1)
    for p in range(8):
        ar = ai = None
        for b in range(nb):
            cr, ci = _W8[(b * p) % 8]
            ar, ai = _cmac(ar, ai, cr, ci, x3r[b], None)
        if ai is None:
            ai = jnp.zeros_like(ar)
        wr = wgr_ref[p]
        wi = wgi_ref[p]
        yr = (jnp.dot(wr, ar, precision=_MXU_PREC,
                      preferred_element_type=jnp.float32)
              - jnp.dot(wi, ai, precision=_MXU_PREC,
                        preferred_element_type=jnp.float32))
        yi = (jnp.dot(wr, ai, precision=_MXU_PREC,
                      preferred_element_type=jnp.float32)
              + jnp.dot(wi, ar, precision=_MXU_PREC,
                        preferred_element_type=jnp.float32))
        twr = twr_ref[p * g:(p + 1) * g]
        twi = twi_ref[p * g:(p + 1) * g]
        cr = yr * twr - yi * twi
        ci = yr * twi + yi * twr
        zr, zi = _lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False)
        or_ref[0, p * g:(p + 1) * g] = zr
        oi_ref[0, p * g:(p + 1) * g] = zi


_CHAIN_PAIRS = ((0, 1), (2, 3), (0, 3))


def _chain_stages_kernel(x_ref, mask_ref, str_ref, sti_ref, twr_ref,
                         twi_ref, w1r_ref, w1i_ref, o_ref, *, n2, eps=1e-6):
    """GCC-like compute chain: 4 independent forwards -> 3 whiten+inverse,
    1 plane in / 1 plane out (compute-dense, like the fused GCC kernel)."""
    x = x_ref[0]
    twr = twr_ref[:]
    twi = twi_ref[:]
    specs = []
    for m in range(4):
        xr, xi = _dif_stages(x * (1.0 + 0.25 * m), None, mask_ref, str_ref,
                             sti_ref, n2)
        cr = xr * twr - xi * twi
        ci = xr * twi + xi * twr
        specs.append(_lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False))
    acc = None
    for a, b in _CHAIN_PAIRS:
        ar, ai = specs[a]
        br, bi = specs[b]
        rr = ar * br + ai * bi
        ri = ai * br - ar * bi
        mag = jnp.sqrt(rr * rr + ri * ri) + eps
        rr = rr / mag
        ri = ri / mag
        cr, ci = _lane_dft(rr, ri, w1r_ref[:], w1i_ref[:], conj=True)
        er = cr * twr + ci * twi
        ei = ci * twr - cr * twi
        yr, _ = _dit_stages(er, ei, mask_ref, str_ref, sti_ref, n2)
        acc = yr if acc is None else acc + yr
    o_ref[0] = acc


def _chain_mxu_kernel(x_ref, wgr_ref, wgi_ref, vgr_ref, vgi_ref, twr_ref,
                      twi_ref, w1r_ref, w1i_ref, o_ref, *, n2, eps=1e-6):
    x = x_ref[0]
    twr = twr_ref[:]
    twi = twi_ref[:]
    specs = []
    for m in range(4):
        xr, xi = _rowdft_mxu(x * (1.0 + 0.25 * m), None, wgr_ref, wgi_ref,
                             n2)
        cr = xr * twr - xi * twi
        ci = xr * twi + xi * twr
        specs.append(_lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False))
    acc = None
    for a, b in _CHAIN_PAIRS:
        ar, ai = specs[a]
        br, bi = specs[b]
        rr = ar * br + ai * bi
        ri = ai * br - ar * bi
        mag = jnp.sqrt(rr * rr + ri * ri) + eps
        rr = rr / mag
        ri = ri / mag
        cr, ci = _lane_dft(rr, ri, w1r_ref[:], w1i_ref[:], conj=True)
        er = cr * twr + ci * twi
        ei = ci * twr - cr * twi
        yr, _ = _rowinv_mxu(er, ei, vgr_ref, vgi_ref, n2)
        acc = yr if acc is None else acc + yr
    o_ref[0] = acc


def _lane_kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, or_ref, oi_ref):
    yr, yi = _lane_dft(xr_ref[0], xi_ref[0], w1r_ref[:], w1i_ref[:],
                       conj=False)
    or_ref[0] = yr
    oi_ref[0] = yi


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _call(kernel, ins, consts, n2, n_out=2, interpret=False, rows=None):
    b = ins[0].shape[0]
    rows = n2 if rows is None else rows
    out_shape = tuple(jax.ShapeDtypeStruct((b, n2, _N1), jnp.float32)
                      for _ in range(n_out))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_bfly_spec((1, rows, _N1)) for _ in ins] +
                 [_bfly_cspec(c.shape) for c in consts],
        out_specs=tuple(_bfly_spec((1, n2, _N1)) for _ in range(n_out)),
        out_shape=out_shape,
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(*ins, *consts)


def run_stages(x2r, x2i, interpret=False, rep=1):
    b, n2, _ = x2r.shape
    mask_u, stw_r, stw_i, *_ = [jnp.asarray(c) for c in
                                _bfly_consts(n2 * _N1)]
    k = functools.partial(_stages_kernel, n2=n2, rep=rep)
    return _call(k, [x2r, x2i], [mask_u, stw_r, stw_i], n2,
                 interpret=interpret)


def run_rowdft(x2r, x2i, interpret=False, rep=1):
    b, n2, _ = x2r.shape
    wgr, wgi = [jnp.asarray(c) for c in _rowdft_consts(n2)]
    k = functools.partial(_rowdft_kernel, n2=n2, rep=rep)
    return _call(k, [x2r, x2i], [wgr, wgi], n2, interpret=interpret)


def run_fwd_full(x2, zero_top, interpret=False):
    b, rows, _ = x2.shape
    n2 = rows * 2 if zero_top else rows
    consts = [jnp.asarray(c) for c in _bfly_consts(n2 * _N1)]
    k = functools.partial(_fwd_full_kernel, n2=n2, zero_top=zero_top)
    return _call(k, [x2], consts, n2, interpret=interpret, rows=rows)


def run_fwd_mxu(x2, zero_top, interpret=False):
    b, rows, _ = x2.shape
    n2 = rows * 2 if zero_top else rows
    wgr, wgi = [jnp.asarray(c) for c in _rowdft_consts(n2)]
    twr, twi = [jnp.asarray(c) for c in _longtw_perm(n2 * _N1)]
    _, _, _, _, _, w1r, w1i = [jnp.asarray(c) for c in
                               _bfly_consts(n2 * _N1)]
    k = functools.partial(_fwd_mxu_kernel, n2=n2, zero_top=zero_top)
    return _call(k, [x2], [wgr, wgi, twr, twi, w1r, w1i], n2,
                 interpret=interpret, rows=rows)


def run_fwd_mxu2(x2, zero_top, interpret=False):
    b, rows, _ = x2.shape
    n2 = rows * 2 if zero_top else rows
    wgr, wgi = [jnp.asarray(c) for c in _rowdft_consts(n2)]
    twr, twi = [jnp.asarray(c) for c in _longtw_perm(n2 * _N1)]
    _, _, _, _, _, w1r, w1i = [jnp.asarray(c) for c in
                               _bfly_consts(n2 * _N1)]
    k = functools.partial(_fwd_mxu2_kernel, n2=n2, zero_top=zero_top)
    return _call(k, [x2], [wgr, wgi, twr, twi, w1r, w1i], n2,
                 interpret=interpret, rows=rows)


def run_rowinv(x2r, x2i, interpret=False):
    b, n2, _ = x2r.shape
    vgr, vgi = [jnp.asarray(c) for c in _rowdft_inv_consts(n2)]
    k = functools.partial(_rowinv_kernel, n2=n2)
    return _call(k, [x2r, x2i], [vgr, vgi], n2, interpret=interpret)


def run_chain_stages(x2, interpret=False):
    b, n2, _ = x2.shape
    consts = [jnp.asarray(c) for c in _bfly_consts(n2 * _N1)]
    k = functools.partial(_chain_stages_kernel, n2=n2)
    return _call(k, [x2], consts, n2, n_out=1, interpret=interpret)


def run_chain_mxu(x2, interpret=False):
    b, n2, _ = x2.shape
    wgr, wgi = [jnp.asarray(c) for c in _rowdft_consts(n2)]
    vgr, vgi = [jnp.asarray(c) for c in _rowdft_inv_consts(n2)]
    twr, twi = [jnp.asarray(c) for c in _longtw_perm(n2 * _N1)]
    _, _, _, _, _, w1r, w1i = [jnp.asarray(c) for c in
                               _bfly_consts(n2 * _N1)]
    k = functools.partial(_chain_mxu_kernel, n2=n2)
    return _call(k, [x2], [wgr, wgi, vgr, vgi, twr, twi, w1r, w1i], n2,
                 n_out=1, interpret=interpret)


def run_lane(x2r, x2i, interpret=False):
    b, n2, _ = x2r.shape
    *_, w1r, w1i = [jnp.asarray(c) for c in _bfly_consts(n2 * _N1)]
    return _call(_lane_kernel, [x2r, x2i], [jnp.asarray(w1r),
                 jnp.asarray(w1i)], n2, interpret=interpret)


# ---------------------------------------------------------------------------
# equivalence (interpret mode, CPU)
# ---------------------------------------------------------------------------

def check(n2):
    rng = np.random.default_rng(0)
    b = 2
    x = rng.standard_normal((b, n2, _N1)).astype(np.float32)
    xi = rng.standard_normal((b, n2, _N1)).astype(np.float32)

    # row-DFT: out[r'] == fft(x, axis=rows)[t_perm[r']]
    yr, yi = run_rowdft(jnp.asarray(x), jnp.asarray(xi), interpret=True)
    ref = np.fft.fft(x + 1j * xi, axis=1)
    perm = _t_perm(n2)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    err1 = np.max(np.abs(got - ref[:, perm])) / np.max(np.abs(ref))

    # full forward transform of real rows vs np.fft of the flat signal:
    # plane layout x2d[q, p_lane] = sig[q*128 + p], k = s*n2 + t.
    sig = rng.standard_normal((b, n2 * _N1)).astype(np.float32)
    fr, fi = run_fwd_mxu(jnp.asarray(sig.reshape(b, n2, _N1)), False,
                         interpret=True)
    full = np.fft.fft(sig, axis=1)
    k = np.arange(_N1)[None, :] * n2 + perm[:, None]     # (n2, 128)
    got = np.asarray(fr) + 1j * np.asarray(fi)
    err2 = np.max(np.abs(got - full[:, k])) / np.max(np.abs(full))
    fr, fi = run_fwd_mxu2(jnp.asarray(sig.reshape(b, n2, _N1)), False,
                          interpret=True)
    got = np.asarray(fr) + 1j * np.asarray(fi)
    err2b = np.max(np.abs(got - full[:, k])) / np.max(np.abs(full))
    assert err2b < 2e-4, err2b

    # zero-top: n <= nfft/2 samples, lower half-plane input
    sig[:, n2 * _N1 // 2:] = 0.0
    fr, fi = run_fwd_mxu(jnp.asarray(sig[:, :n2 * _N1 // 2]
                                     .reshape(b, n2 // 2, _N1)), True,
                         interpret=True)
    full = np.fft.fft(sig, axis=1)
    got = np.asarray(fr) + 1j * np.asarray(fi)
    err3 = np.max(np.abs(got - full[:, k])) / np.max(np.abs(full))

    # inverse mirror roundtrip: rowinv(rowdft(x)) == n2 * x
    yr, yi = run_rowdft(jnp.asarray(x), jnp.asarray(xi), interpret=True)
    zr, zi = run_rowinv(yr, yi, interpret=True)
    rt = (np.asarray(zr) + 1j * np.asarray(zi)) / n2
    err4 = np.max(np.abs(rt - (x + 1j * xi))) / np.max(np.abs(x))

    # GCC-like chain: stages vs mxu layouts must agree (whitening is
    # permutation-equivariant; each inverse undoes its own layout)
    ca = np.asarray(run_chain_stages(jnp.asarray(x), interpret=True)[0])
    cb = np.asarray(run_chain_mxu(jnp.asarray(x), interpret=True)[0])
    err5 = np.max(np.abs(ca - cb)) / np.max(np.abs(ca))
    print(f"n2={n2:5d} rowdft err {err1:.2e}  fwd err {err2:.2e}  "
          f"fwd/zero-top err {err3:.2e}  inv-rt err {err4:.2e}  "
          f"chain err {err5:.2e}", flush=True)
    assert err1 < 2e-4 and err2 < 2e-4 and err3 < 2e-4
    assert err4 < 2e-4 and err5 < 2e-3


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------

def _time(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters


def bench(n2, batch):
    key = jax.random.PRNGKey(0)
    xr = jax.random.normal(key, (batch, n2, _N1), jnp.float32)
    xi = jax.random.normal(jax.random.PRNGKey(1), (batch, n2, _N1),
                           jnp.float32)
    xh = xr[:, :n2 // 2, :]

    def red(fn, *a):
        out = fn(*a)
        return jnp.max(out[0]), jnp.sum(out[1])

    js = jax.jit(lambda a, b: red(run_stages, a, b))
    jm = jax.jit(lambda a, b: red(run_rowdft, a, b))
    js8 = jax.jit(lambda a, b: red(run_stages, a, b, False, 8))
    jm8 = jax.jit(lambda a, b: red(run_rowdft, a, b, False, 8))
    jl = jax.jit(lambda a, b: red(run_lane, a, b))
    jff = jax.jit(lambda a: red(run_fwd_full, a, False))
    jfm = jax.jit(lambda a: red(run_fwd_mxu, a, False))
    jfm2 = jax.jit(lambda a: red(run_fwd_mxu2, a, False))
    jffz = jax.jit(lambda a: red(run_fwd_full, a, True))
    jfmz = jax.jit(lambda a: red(run_fwd_mxu, a, True))
    jfmz2 = jax.jit(lambda a: red(run_fwd_mxu2, a, True))

    dt = {}
    dt["stages"] = _time(js, xr, xi)
    dt["rowdft"] = _time(jm, xr, xi)
    dt["stages8"] = _time(js8, xr, xi)
    dt["rowdft8"] = _time(jm8, xr, xi)
    dt["lane"] = _time(jl, xr, xi)
    dt["fwd_full"] = _time(jff, xr)
    dt["fwd_mxu"] = _time(jfm, xr)
    dt["fwd_mxu2"] = _time(jfm2, xr)
    dt["fwdz_full"] = _time(jffz, xh)
    dt["fwdz_mxu"] = _time(jfmz, xh)
    dt["fwdz_mxu2"] = _time(jfmz2, xh)
    if n2 >= 512:
        jcs = jax.jit(lambda a: jnp.max(run_chain_stages(a)[0]))
        jcm = jax.jit(lambda a: jnp.max(run_chain_mxu(a)[0]))
        dt["chain_stages"] = _time(jcs, xr)
        dt["chain_mxu"] = _time(jcm, xr)

    us = {k: v / batch * 1e6 for k, v in dt.items()}
    # compute-only estimate: (rep8 - rep1) / 7 removes the HBM-traffic floor
    comp_s = (us["stages8"] - us["stages"]) / 7.0
    comp_m = (us["rowdft8"] - us["rowdft"]) / 7.0
    print(f"n2={n2:5d} B={batch:5d}  "
          f"stages {us['stages']:6.2f}us  rowdft {us['rowdft']:6.2f}us "
          f"({us['stages']/us['rowdft']:4.2f}x)  "
          f"COMPUTE stages {comp_s:6.2f}us rowdft {comp_m:6.2f}us "
          f"({comp_s/comp_m:4.2f}x)  lane {us['lane']:6.2f}us  "
          f"fwd {us['fwd_full']:6.2f}->{us['fwd_mxu']:6.2f}/"
          f"{us['fwd_mxu2']:6.2f}us "
          f"(mxu2 {us['fwd_full']/us['fwd_mxu2']:4.2f}x)  "
          f"fwd/ztop {us['fwdz_full']:6.2f}->{us['fwdz_mxu']:6.2f}/"
          f"{us['fwdz_mxu2']:6.2f}us "
          f"(mxu2 {us['fwdz_full']/us['fwdz_mxu2']:4.2f}x)"
          + (f"  CHAIN {us['chain_stages']:7.2f}->{us['chain_mxu']:7.2f}us "
             f"({us['chain_stages']/us['chain_mxu']:4.2f}x)"
             if "chain_stages" in us else ""), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU equivalence checks only")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        for n2 in (64, 128, 1024):
            check(n2)
        return
    print(f"device: {jax.devices()[0]}", flush=True)
    for n2, batch in ((64, 4096), (128, 2048), (256, 1024), (512, 1024),
                      (1024, 512)):
        bench(n2, batch)


if __name__ == "__main__":
    main()
