"""Pallas TPU FFT: the BUTTERFLY ENGINE — whole pow2 transforms in VMEM.

True log-N radix-2 stages (contiguous sliced butterflies while the
half-distance spans whole sublane tiles, full-array rolls + masked
selects within tiles), one MXU matmul for the lane-axis DFT, bit-reversal
cancelled between forward and inverse.  This is the PRODUCTION fused
GCC/render path: ops/gccphat.gcc_phat_all_pairs dispatches to its fused
per-scene kernel on TPU (f32, nfft = 128*pow2, VMEM permitting), measured
2.4-3.1x the XLA path (tools/gcc_ab_bench.py, all-roll schedule) plus
1.8x from the sliced-stage schedule at the 131072 headline shape
(tools/stage_ab_bench.py).  On the healthy tunnel (~300 GB/s copy floor)
the kernels are VPU-COMPUTE-bound in the butterfly stages, not HBM-bound
— but the traffic win still stands: signals in, correlations out,
~2.5 MB per scene instead of the XLA path's ~8 MB of intermediate spectra
and whitening passes.

XLA's TPU FFT runs multiple HBM passes; a 131072-point complex64 row is
only 1 MB as float32 planes, so the entire transform fits in VMEM and the
HBM traffic collapses to one read + one write per row.  Complex data is
carried as separate real/imag planes (the MXU has no complex type).

Two earlier formulations — a recursive four-step matmul (Mosaic rejects
its lane-dim reshapes) and a two-level permuted-basis matmul (compiles
but measured 19x SLOWER than XLA: 45x flop inflation, <1% MXU
utilization) — were built, measured, and removed; the full investigation
record, including what the butterfly engine took from each, lives in
docs/pallas_fft_deadends.md.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False



# Lane width of every butterfly plane: a length-N row is laid out as an
# (N2, 128) tile with x2d[q, p] = x[q*128 + p].
_N1 = 128


# ---------------------------------------------------------------------------
# Butterfly FFT: TRUE log-N stages via full-array sublane rolls.
#
# The length-N row is laid out as a (N2, 128) plane with
# x2d[q, p] = x[q*128 + p].  Four-step decomposition with k = s*N2 + t:
#
#   X[s*N2 + t] = sum_p W_N1^{ps} W_N^{pt} * (sum_q x2d[q, p] W_N2^{qt})
#
#   1. length-N2 FFT along the SUBLANE axis per lane — log2(N2) radix-2 DIF
#      stages.  Each stage is TWO full-array rolls + masked selects:
#        y = where(mask_u, x + roll(x, -h), (roll(x, +h) - x) * tw)
#      No reshapes, no lane shuffles, no per-block slicing — only
#      tpu-native sublane rolls and elementwise VPU work.  Output lands in
#      BIT-REVERSED t order, which is never materialized away:
#   2. twiddle W_N^{pt} as one precomputed (N2, 128) plane with t stored in
#      bit-reversed slots;
#   3. the 128-point lane DFT as ONE (N2,128)@(128,128) MXU matmul.
#
# The spectrum lives in an opaque (t_bitrev, s) layout; cross-spectrum +
# PHAT whitening are elementwise (layout-blind), and the inverse kernel
# mirrors the steps (conjugate lane matmul, conjugate twiddle, DIT stages
# consuming bit-reversed input), so the bit-reversal cancels end to end —
# the classic convolution-ordering trick.  FLOPs: ~5*N2*log2(N2) VPU per
# lane-column + one dense N1 matmul on the MXU (the only super-FFT term,
# ~13x of ideal FFT flops but at high MXU utilization, unlike dead end (b)
# whose (N2, N2) long-DFT matmul inflated flops 45x on the VPU-sized M).
# ---------------------------------------------------------------------------


# v5e has 128 MB of physical VMEM; the XLA default SCOPED limit is only
# 16 MB (measured: a 24 MB-scoped kernel compiles and runs fine with the
# limit raised).  All butterfly kernels request this cap.
_VMEM_LIMIT = 64 * 1024 * 1024
_BFLY_PARAMS = None if not _HAS_PALLAS else pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_LIMIT)


def _bitrev_perm(n2: int) -> np.ndarray:
    bits = int(np.log2(n2))
    t = np.arange(n2)
    r = np.zeros(n2, np.int64)
    for _ in range(bits):
        r = (r << 1) | (t & 1)
        t >>= 1
    return r


@functools.lru_cache(maxsize=8)
def _bfly_consts(n: int):
    """Stage masks/twiddles + bit-reversed long twiddle + lane-DFT matrix.

    Returns float32 numpy arrays:
      mask_u  (S, N2, 1)  1.0 at u positions
      stw_r/i (S, N2, 1)  stage twiddles (1 at u positions)
      tw_r/i  (N2, 128)   W_N^{p t_nat} with t in bit-reversed slots
      w1_r/i  (128, 128)  W_128 DFT matrix
    """
    n2 = n // _N1
    if n2 * _N1 != n or (n2 & (n2 - 1)):
        raise ValueError("n must be 128 * pow2")
    q = np.arange(n2)
    masks, twr, twi = [], [], []
    m = n2
    while m > 1:
        h = m // 2
        qm = q % m
        mask_u = qm < h
        j = np.where(mask_u, 0, qm - h)
        tw = np.where(mask_u, 1.0, np.exp(-2j * np.pi * j / m))
        masks.append(mask_u.astype(np.float32))
        twr.append(tw.real.astype(np.float32))
        twi.append(tw.imag.astype(np.float32))
        m = h
    f32 = np.float32
    mask_u = np.stack(masks)[:, :, None]
    stw_r = np.stack(twr)[:, :, None]
    stw_i = np.stack(twi)[:, :, None]
    t_nat = _bitrev_perm(n2)
    tw = np.exp(-2j * np.pi * np.outer(t_nat, np.arange(_N1)) / n)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(_N1), np.arange(_N1)) / _N1)
    return (mask_u, stw_r, stw_i, tw.real.astype(f32), tw.imag.astype(f32),
            w1.real.astype(f32), w1.imag.astype(f32))


def _roll(x, shift, n2):
    """Sublane-axis circular shift by a static amount (axis 0 of (N2, L))."""
    return pltpu.roll(x, shift % n2, 0)


def _zero_top_ok(n_samp: int, nfft: int) -> bool:
    """Whether forward inputs of ``n_samp`` samples padded to ``nfft``
    qualify for zero-top pruning (see ``_dif_stages``)."""
    n2 = nfft // _N1
    return _SLICED_STAGES and n2 >= 16 and n_samp <= nfft // 2


# Stage schedule: butterflies whose half-distance h is >= 8 sublanes pair
# CONTIGUOUS 8-aligned block halves, so they are computed exactly (one add,
# one sub, one twiddle-mul per output) on a (blocks, m, 128) leading-dim
# view — zero rolls, half the flops of the full-plane masked-select form,
# which evaluates BOTH butterfly branches everywhere and then selects.
# Only the last three within-tile stages (h = 4, 2, 1) keep the roll form.
# Measured (v5e, 2026-08-18, tools/stage_ab_bench.py, bit-identical
# outputs): 1.81x on the fused GCC at nfft=131072 (the headline bench
# shape), 1.18-1.24x at 8192-65536, 1.06-1.13x on the windowed kernels —
# the sliced share of total stage work grows with log2(N2).
_SLICED_STAGES = True

# Within-tile schedule for the last three stages (h = 4, 2, 1): the three
# radix-2 stages act identically and independently on every 8-sublane tile,
# so their composition is ONE fixed 8x8 complex matrix — the 8-point DFT
# with bit-reversed output (forward DIF) / input (inverse DIT) order:
#   B_fwd[r, j] = W8^{bitrev3(r)*j}      B_inv[k, j] = W8^{-k*bitrev3(j)}*
# (*conjugate twiddles).  48 of the 64 entries are exactly 0/±1/±i and the
# rest (±1±i)/√2, so on a (g, 8, 128) leading-dim view each output row is
# a short unrolled linear combination of the 8 input row-slices with
# SCALAR constants — zero rolls, zero masked selects, and exact flops
# (the roll form evaluates BOTH branches everywhere and selects).
#   'roll':     the original full-plane roll+select stages.
#   'slice':    8x8 combos on 2-D (g, 128) row slices, restacked at the end.
#   'bcast':    8x8 combos as full-plane MACs against (1, 8, 1) coefficient
#               planes (middle-dim keepdim slices broadcast over sublanes).
#   'subslice': no 8x8 transform — extend the sliced butterfly loop below
#               h=8 (sub-tile-aligned slices, exact flops, zero rolls).
# A/B measured on-chip (v5e, 2026-08-19, tools/stage_ab_bench.py, with
# zero-top pruning active on all schedules): 'bcast' wins the full-output
# GCC kernels at every production shape (1.17x at nfft=131072, 1.09-1.13x
# at 8192-65536) and is neutral on the windowed kernels (0.96-1.03x);
# 'slice' LOSES everywhere (0.74-1.00x — within-tile row extraction +
# restack relayouts cost more than the rolls they replace) and 'subslice'
# loses badly (0.56-0.93x — sub-tile-aligned slices force masked copies
# per stage).  The 8x8 modes are NOT bit-identical to 'roll' (a DFT-sum
# rounds differently than cascaded butterflies); 'subslice' is exact-flops
# identical butterflies, bit-identical to 'roll'.
_TILE8_MODE = "bcast"

# Radix-4 sliced stages: fuse each pair of adjacent sliced radix-2 stages
# (half-distances h, h/2 with h >= 16) into one radix-4 butterfly on the
# (g, 4q, 128) leading-dim view.  Per 4 outputs this is 3 complex twiddle
# muls + 22 real adds vs the radix-2 pair's 4 muls + 24 adds (the W^{3j}
# twiddle plane is the PRODUCT of the two existing (q, 1) stage const
# planes — negligible against the (g, q, 128) data work), and HALF the
# concat+reshape relayouts between stages.  Odd stage counts keep one
# radix-2 stage (the zero-top pruned first stage and/or the final h=8).
# NOT bit-identical to the radix-2 pairs (different rounding order);
# tools/tpu_path_fuzz.py tolerances are the contract.
# A/B measured on-chip (v5e, 2026-08-19, 4 repeats, degraded-tunnel
# variance ~3%): +2-3% at the headline fused-GCC shape (nfft=131072,
# consistent across every repeat), neutral within noise at 8192-65536
# and on the windowed kernels (0.97-1.05x scatter centered on 1.00).
_RADIX4_SLICED = True

# ILP chain stacking (VERDICT r4 #2 A/B): the fused GCC kernel saturates
# neither unit (36% MXU / 17% VPU measured) — the hypothesis was
# dependency/issue stalls between the ops of ONE transform chain.  With
# _ILP_FWD / _ILP_INV = 2 the kernel stacks TWO independent transforms
# (two mic forwards / two pair couples) along the leading block axis and
# runs the stage cascade ONCE on the doubled view: every stage op carries
# twice the independent vregs, the lane-DFT matmul doubles its M dim, and
# per-op fixed overheads amortize.  Outputs are BIT-IDENTICAL to the
# unstacked schedule (elementwise ops are positionwise; matmul rows are
# independent; confirmed err 0.0 on-chip).  Requires the sliced+tile8
# schedule (the full-plane roll form would roll across the chain
# boundary).
#
# MEASURED AND REJECTED — dead end (e), v5e 2026-08-20
# (tools/stage_ab_bench.py ilp): 0.84-0.99x on the big full-GCC shapes
# (131072: 0.84x, 65536: 0.89x), neutral at 8-mic 32768, and its one win
# (8192 windowed, 1.26x) is matched by bf16x3 alone (1.33x) — stacking
# doubles the live stage temporaries, and the already-128-vreg stage ops
# gain nothing from wider bodies.  The stalls the utilization counters
# show are NOT intra-chain dependency stalls.  Kept at 1; the chains
# machinery stays for the record (interpret-mode equivalence pinned by
# tests/test_pallas_fft.py::test_ilp_chains_match_unstacked).
_ILP_FWD = 1
_ILP_INV = 1

# Exact W8 powers: e^{-2*pi*i*p/8} as (re, im) Python floats (cos(pi/2)
# via np.exp is 6e-17, not 0 — build from the integer exponent instead so
# zero/±1 coefficients specialize away at trace time).
_SQ2 = float(1.0 / np.sqrt(2.0))
_W8 = ((1.0, 0.0), (_SQ2, -_SQ2), (0.0, -1.0), (-_SQ2, -_SQ2),
       (-1.0, 0.0), (-_SQ2, _SQ2), (0.0, 1.0), (_SQ2, _SQ2))


@functools.lru_cache(maxsize=2)
def _tile8_coeffs(inverse: bool):
    """8x8 (re, im) scalar table for the composed within-tile transform."""
    br = _bitrev_perm(8)
    out = []
    for k in range(8):
        row = []
        for j in range(8):
            p = (-k * br[j]) % 8 if inverse else (br[k] * j) % 8
            row.append(_W8[p])
        out.append(tuple(row))
    return tuple(out)


def _cmac(acc_r, acc_i, cr, ci, xr, xi):
    """acc += (cr + i*ci) * (xr + i*xi) with 0/±1 specialization.
    ``xi=None`` marks an exactly-zero imaginary plane (real input)."""
    def add(a, t):
        return t if a is None else a + t

    def scaled(c, v):
        return v if c == 1.0 else (-v if c == -1.0 else c * v)

    if cr != 0.0:
        acc_r = add(acc_r, scaled(cr, xr))
        if xi is not None:
            acc_i = add(acc_i, scaled(cr, xi))
    if ci != 0.0:
        if xi is not None:
            acc_r = add(acc_r, scaled(-ci, xi))
        acc_i = add(acc_i, scaled(ci, xr))
    return acc_r, acc_i


def _tile8(x3r, x3i, inverse: bool):
    """Apply the composed h=4,2,1 transform on a (g, 8, 128) view.

    'slice': row slices are 2-D (g, 128) — full sublane occupancy per op
    (a (g, 1, 128) formulation would waste 7/8 of every vreg) — and the 8
    outputs are restacked into (g, 8, 128) once at the end.
    'bcast': keepdim (g, 1, 128) slices broadcast against (1, 8, 1)
    coefficient planes; every MAC is a full-plane op, no restack."""
    if _TILE8_MODE == "bcast":
        return _tile8_bcast(x3r, x3i, inverse)
    B = _tile8_coeffs(inverse)
    xr = [x3r[:, j] for j in range(8)]
    xi = None if x3i is None else [x3i[:, j] for j in range(8)]
    outr, outi = [], []
    for k in range(8):
        ar = ai = None
        for j in range(8):
            cr, ci = B[k][j]
            ar, ai = _cmac(ar, ai, cr, ci, xr[j],
                           None if xi is None else xi[j])
        if ai is None:  # real input, all-real row (k = 0 forward)
            ai = jnp.zeros_like(ar)
        outr.append(ar[:, None])
        outi.append(ai[:, None])
    return (jnp.concatenate(outr, axis=1), jnp.concatenate(outi, axis=1))


def _const_col8(vals):
    """(1, 8, 1) f32 plane holding ``vals`` along the middle axis, built
    from iota + selects (Pallas kernels cannot capture array constants)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    out = jnp.full((1, 8, 1), vals[7], jnp.float32)
    for idx in range(7):
        out = jnp.where(k == idx, jnp.float32(vals[idx]), out)
    return out


def _tile8_bcast(x3r, x3i, inverse: bool):
    B = _tile8_coeffs(inverse)
    yr = yi = None
    for j in range(8):
        cr = _const_col8([B[k][j][0] for k in range(8)])
        ci = _const_col8([B[k][j][1] for k in range(8)])
        xjr = x3r[:, j:j + 1]
        tr = cr * xjr
        ti = ci * xjr
        if x3i is not None:
            xji = x3i[:, j:j + 1]
            tr = tr - ci * xji
            ti = ti + cr * xji
        yr = tr if yr is None else yr + tr
        yi = ti if yi is None else yi + ti
    return yr, yi


def _dif_stages(xr, xi, mask_u, stw_r, stw_i, n2, zero_top: bool = False,
                chains: int = 1):
    """Forward radix-2 DIF stages along axis 0; bit-reversed output order.

    ``xi=None`` marks a real input: the first sliced stage elides all
    imaginary-plane work (the forward transforms here are always r2c).

    ``zero_top=True`` declares the caller padded a signal of n <= nfft/2
    samples, so ``xr`` holds ONLY the nonzero lower n2/2 rows (callers also
    shrink the input block — half the input HBM traffic) and the first
    stage prunes to a = u, b = u * tw.  Requires a real input and n2 >= 16
    (the first stage must be a sliced stage).

    ``chains=C`` stacks C independent transforms: input is the FLAT
    vertical concatenation (C*rows, 128) and the output planes are
    (C*n2, 128) — bit-identical per chain to C separate calls (sliced
    stage ops are positionwise on the leading-dim view).  Requires the
    sliced+tile8 schedule (the full-plane roll form would mix chains).
    """
    stages = int(np.log2(n2))
    h = n2 // 2
    s = 0
    tile8 = (_TILE8_MODE in ("slice", "bcast") and _SLICED_STAGES
             and stages >= 3)
    min_h = 1 if (_TILE8_MODE == "subslice" and _SLICED_STAGES) else 8
    assert chains == 1 or (tile8 and (zero_top or h >= min_h or h == 4))
    if zero_top:
        assert xi is None and _SLICED_STAGES and h >= 8
        x3r = xr.reshape(chains, n2 // 2, _N1)
        x3i = None
    elif (_SLICED_STAGES and h >= min_h) or (tile8 and h == 4):
        x3r = xr.reshape(chains, n2, _N1)
        x3i = None if xi is None else xi.reshape(chains, n2, _N1)
    if (_SLICED_STAGES and h >= min_h) or (tile8 and h == 4):
        while h >= min_h:
            if zero_top and s == 0:
                # Within-block twiddle W_m^j, identical for every block:
                # the v-half rows of block 0 of the stage's const plane.
                twr = stw_r[s, h:2 * h]
                twi = stw_i[s, h:2 * h]
                # v half is identically zero: a = u, d = u.
                ar = x3r[:, :h]
                dr = ar
                ai = jnp.zeros_like(ar)
                br = dr * twr
                bi = dr * twi
                g = x3r.shape[0]
                x3r = jnp.concatenate([ar, br], axis=1).reshape(2 * g, h,
                                                                _N1)
                x3i = jnp.concatenate([ai, bi], axis=1).reshape(2 * g, h,
                                                                _N1)
                s += 1
                h //= 2
                continue
            if _RADIX4_SLICED and h >= 2 * max(min_h, 8):
                # Radix-4: consume stages s (block 2h) and s+1 (block h)
                # in one pass.  Quarters q0..q3 of each 2h block (size
                # q = h/2 each), j in [0, q):
                #   A = (q0+q2) + (q1+q3)
                #   B = ((q0+q2) - (q1+q3)) * W^{2j}
                #   C = ((q0-q2) - i(q1-q3)) * W^{j}
                #   D = ((q0-q2) + i(q1-q3)) * W^{3j}      (W = W_{2h})
                q = h // 2
                w1r, w1i = stw_r[s, h:h + q], stw_i[s, h:h + q]
                w2r, w2i = stw_r[s + 1, q:h], stw_i[s + 1, q:h]
                w3r = w1r * w2r - w1i * w2i
                w3i = w1r * w2i + w1i * w2r
                q0r, q1r = x3r[:, :q], x3r[:, q:2 * q]
                q2r, q3r = x3r[:, 2 * q:3 * q], x3r[:, 3 * q:]
                s0r, s1r = q0r + q2r, q1r + q3r
                d0r, d1r = q0r - q2r, q1r - q3r
                ar = s0r + s1r
                tr = s0r - s1r
                if x3i is None:
                    ai = jnp.zeros_like(ar)
                    br, bi = tr * w2r, tr * w2i
                    # C_in = (d0, -d1), D_in = (d0, +d1) with real quarters
                    cr = d0r * w1r + d1r * w1i
                    ci = d0r * w1i - d1r * w1r
                    er = d0r * w3r - d1r * w3i
                    ei = d0r * w3i + d1r * w3r
                else:
                    q0i, q1i = x3i[:, :q], x3i[:, q:2 * q]
                    q2i, q3i = x3i[:, 2 * q:3 * q], x3i[:, 3 * q:]
                    s0i, s1i = q0i + q2i, q1i + q3i
                    d0i, d1i = q0i - q2i, q1i - q3i
                    ai = s0i + s1i
                    ti = s0i - s1i
                    br = tr * w2r - ti * w2i
                    bi = tr * w2i + ti * w2r
                    cinr, cini = d0r + d1i, d0i - d1r     # d0 - i*d1
                    dinr, dini = d0r - d1i, d0i + d1r     # d0 + i*d1
                    cr = cinr * w1r - cini * w1i
                    ci = cinr * w1i + cini * w1r
                    er = dinr * w3r - dini * w3i
                    ei = dinr * w3i + dini * w3r
                g = x3r.shape[0]
                x3r = jnp.concatenate([ar, br, cr, er],
                                      axis=1).reshape(4 * g, q, _N1)
                x3i = jnp.concatenate([ai, bi, ci, ei],
                                      axis=1).reshape(4 * g, q, _N1)
                s += 2
                h //= 4
                continue
            twr = stw_r[s, h:2 * h]
            twi = stw_i[s, h:2 * h]
            ur, vr = x3r[:, :h], x3r[:, h:]
            ar = ur + vr
            dr = ur - vr
            if x3i is None:
                ai = jnp.zeros_like(ar)
                br = dr * twr
                bi = dr * twi
            else:
                ui, vi = x3i[:, :h], x3i[:, h:]
                ai = ui + vi
                di = ui - vi
                br = dr * twr - di * twi
                bi = dr * twi + di * twr
            g = x3r.shape[0]
            x3r = jnp.concatenate([ar, br], axis=1).reshape(2 * g, h, _N1)
            x3i = jnp.concatenate([ai, bi], axis=1).reshape(2 * g, h, _N1)
            s += 1
            h //= 2
        if tile8:  # the remaining h = 4, 2, 1 stages as one 8x8 transform
            x3r, x3i = _tile8(x3r, x3i, inverse=False)
            return (x3r.reshape(chains * n2, _N1),
                    x3i.reshape(chains * n2, _N1))
        xr = x3r.reshape(n2, _N1)
        xi = x3i.reshape(n2, _N1)
    elif xi is None:
        xi = jnp.zeros_like(xr)
    for ss in range(s, stages):
        mu = mask_u[ss]
        tr = stw_r[ss]
        ti = stw_i[ss]
        ar = xr + _roll(xr, -h, n2)
        ai = xi + _roll(xi, -h, n2)
        dr = _roll(xr, h, n2) - xr
        di = _roll(xi, h, n2) - xi
        br = dr * tr - di * ti
        bi = dr * ti + di * tr
        xr = jnp.where(mu > 0, ar, br)
        xi = jnp.where(mu > 0, ai, bi)
        h //= 2
    return xr, xi


def _dit_stages(xr, xi, mask_u, stw_r, stw_i, n2, chains: int = 1):
    """Inverse (conjugate) DIT stages consuming bit-reversed order.

    ``chains=C`` stacks C independent transforms along axis 0 (flat
    (C*n2, 128) input/output planes) — see ``_dif_stages``.  Requires the
    sliced+tile8 schedule."""
    stages = int(np.log2(n2))
    tile8 = (_TILE8_MODE in ("slice", "bcast") and _SLICED_STAGES
             and stages >= 3)
    assert chains == 1 or tile8
    if tile8:
        # First three stages (h = 1, 2, 4) as the composed 8x8 transform
        # on each 8-sublane tile, then hand off to the sliced loop at h=8.
        g8 = chains * n2 // 8
        x3r, x3i = _tile8(xr.reshape(g8, 8, _N1), xi.reshape(g8, 8, _N1),
                          inverse=True)
        xr = x3r.reshape(chains * n2, _N1)
        xi = x3i.reshape(chains * n2, _N1)
        if stages == 3:
            return xr, xi
        n_roll = 3  # consumed by tile8; the sliced loop below continues
        h = 8
    elif _TILE8_MODE == "subslice" and _SLICED_STAGES:
        n_roll = 0  # every stage takes the sliced form
        h = 1
    else:
        n_roll = stages if not _SLICED_STAGES else min(stages, 3)
        h = 1
    for s in range(stages - 1, stages - 1 - (0 if tile8 else n_roll), -1):
        mu = mask_u[s]
        tr = stw_r[s]
        ti = -stw_i[s]  # conjugate stage twiddles
        ur = xr * tr - xi * ti
        ui = xr * ti + xi * tr
        # t = tw*x at v positions, x at u positions
        tr_ = jnp.where(mu > 0, xr, ur)
        ti_ = jnp.where(mu > 0, xi, ui)
        yr = jnp.where(mu > 0, xr + _roll(tr_, -h, n2),
                       _roll(xr, h, n2) - tr_)
        yi = jnp.where(mu > 0, xi + _roll(ti_, -h, n2),
                       _roll(xi, h, n2) - ti_)
        xr, xi = yr, yi
        h *= 2
    if stages > n_roll:
        s = stages - 1 - n_roll
        while s >= 0:
            if _RADIX4_SLICED and s >= 1 and h >= 8:
                # Radix-4: consume stages s (block 2h) and s-1 (block 4h).
                # Quarters z0..z3 (each h) of a 4h block, j in [0, h):
                #   c1 = z1*conj(W_{2h}^j); c2 = z2*conj(W_{4h}^j);
                #   c3 = z3*conj(W_{4h}^{3j});  out = [e0+f0, e1+i*f1,
                #   e0-f0, e1-i*f1] with e = z0 -+ c1, f = c2 -+ c3.
                m4 = 4 * h
                g = chains * n2 // m4
                x3r = xr.reshape(g, m4, _N1)
                x3i = xi.reshape(g, m4, _N1)
                w1r, w1i = stw_r[s, h:2 * h], -stw_i[s, h:2 * h]
                w2r = stw_r[s - 1, 2 * h:3 * h]
                w2i = -stw_i[s - 1, 2 * h:3 * h]
                w3r = w1r * w2r - w1i * w2i
                w3i = w1r * w2i + w1i * w2r
                z0r, z1r = x3r[:, :h], x3r[:, h:2 * h]
                z2r, z3r = x3r[:, 2 * h:3 * h], x3r[:, 3 * h:]
                z0i, z1i = x3i[:, :h], x3i[:, h:2 * h]
                z2i, z3i = x3i[:, 2 * h:3 * h], x3i[:, 3 * h:]
                c1r = z1r * w1r - z1i * w1i
                c1i = z1r * w1i + z1i * w1r
                c2r = z2r * w2r - z2i * w2i
                c2i = z2r * w2i + z2i * w2r
                c3r = z3r * w3r - z3i * w3i
                c3i = z3r * w3i + z3i * w3r
                e0r, e0i = z0r + c1r, z0i + c1i
                e1r, e1i = z0r - c1r, z0i - c1i
                f0r, f0i = c2r + c3r, c2i + c3i
                f1r, f1i = c2r - c3r, c2i - c3i
                # i*f1 = (-f1_i, f1_r)
                xr = jnp.concatenate(
                    [e0r + f0r, e1r - f1i, e0r - f0r, e1r + f1i],
                    axis=1).reshape(chains * n2, _N1)
                xi = jnp.concatenate(
                    [e0i + f0i, e1i + f1r, e0i - f0i, e1i - f1r],
                    axis=1).reshape(chains * n2, _N1)
                h *= 4
                s -= 2
            else:
                g = chains * n2 // (2 * h)
                x3r = xr.reshape(g, 2 * h, _N1)
                x3i = xi.reshape(g, 2 * h, _N1)
                twr = stw_r[s, h:2 * h]
                twi = -stw_i[s, h:2 * h]  # conjugate stage twiddles
                ur, vr = x3r[:, :h], x3r[:, h:]
                ui, vi = x3i[:, :h], x3i[:, h:]
                tr = vr * twr - vi * twi
                ti = vr * twi + vi * twr
                xr = jnp.concatenate([ur + tr, ur - tr],
                                     axis=1).reshape(chains * n2, _N1)
                xi = jnp.concatenate([ui + ti, ui - ti],
                                     axis=1).reshape(chains * n2, _N1)
                h *= 2
                s -= 1
    return xr, xi


_MXU_PREC = jax.lax.Precision.HIGHEST

# Manual bf16x3 lane-DFT matmuls: split each f32 operand into a bf16 head
# + bf16 residual and accumulate hi@hi + hi@lo + lo@hi in f32 — 3 native
# MXU passes per real matmul vs HIGHEST's 6 (jax.lax.Precision.HIGH does
# not lower in Mosaic).  ~1e-6 relative vs HIGHEST on the 128-point DFT.
# Round-1 measured this a wash when the VPU stages dominated; re-probed
# (VERDICT r4 #2, v5e 2026-08-20, tools/stage_ab_bench.py ilp) now that
# sliced/tile8/radix-4 cut the VPU share: WINS EVERY production shape —
# full GCC 1.24x at nfft=131072 (the headline bench shape), 1.14x at
# 65536, 1.16x at 8-mic 32768, 1.07x at 8192; windowed kernels
# 1.18-1.33x.  On-chip output deltas 5e-7..2.7e-6 relative (full
# correlations) and <=2.5e-8 on windowed stats — inside the path-fuzz
# tolerances.  IN PRODUCTION since round 5.
_LANE_BF16X3 = True


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(a_split, b_split):
    (ah, al), (bh, bl) = a_split, b_split

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _lane_dft(cr, ci, w1r, w1i, conj: bool):
    wi = -w1i if conj else w1i
    if _LANE_BF16X3:
        crs, cis = _split_bf16(cr), _split_bf16(ci)
        w1rs, wis = _split_bf16(w1r), _split_bf16(wi)
        yr = _dot_bf16x3(crs, w1rs) - _dot_bf16x3(cis, wis)
        yi = _dot_bf16x3(crs, wis) + _dot_bf16x3(cis, w1rs)
        return yr, yi
    yr = (jnp.dot(cr, w1r, precision=_MXU_PREC,
                  preferred_element_type=jnp.float32)
          - jnp.dot(ci, wi, precision=_MXU_PREC,
                    preferred_element_type=jnp.float32))
    yi = (jnp.dot(cr, wi, precision=_MXU_PREC,
                  preferred_element_type=jnp.float32)
          + jnp.dot(ci, w1r, precision=_MXU_PREC,
                    preferred_element_type=jnp.float32))
    return yr, yi


def _bfly_fwd_kernel(x_ref, mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                     w1r_ref, w1i_ref, or_ref, oi_ref, *, n2):
    """Real rows -> spectrum planes in (t_bitrev, lane) layout."""
    xr = x_ref[0]
    xr, xi = _dif_stages(xr, None, mask_ref, str_ref, sti_ref, n2)
    twr = twr_ref[:]
    twi = twi_ref[:]
    cr = xr * twr - xi * twi
    ci = xr * twi + xi * twr
    yr, yi = _lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False)
    or_ref[0] = yr
    oi_ref[0] = yi


def _bfly_corr_kernel(ar_ref, ai_ref, br_ref, bi_ref, band_ref,
                      mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                      w1r_ref, w1i_ref, out_ref, *, n2, eps, scale):
    """Whitened cross-correlation of two spectra in butterfly layout:
    R = A * conj(B); R /= |R| + eps; R *= band; corr = real(IFFT(R))."""
    ar, ai = ar_ref[0], ai_ref[0]
    br, bi = br_ref[0], bi_ref[0]
    rr = ar * br + ai * bi
    ri = ai * br - ar * bi
    mag = jnp.sqrt(rr * rr + ri * ri) + eps
    b = band_ref[:]
    rr = rr / mag * b
    ri = ri / mag * b
    # inverse: conjugate lane matmul, conjugate long twiddle, DIT stages
    cr, ci = _lane_dft(rr, ri, w1r_ref[:], w1i_ref[:], conj=True)
    twr = twr_ref[:]
    twi = -twi_ref[:]
    dr = cr * twr - ci * twi
    di = cr * twi + ci * twr
    yr, _ = _dit_stages(dr, di, mask_ref, str_ref, sti_ref, n2)
    out_ref[0] = yr * scale


def _bfly_spec(block):
    return pl.BlockSpec(block, lambda i: (i,) + (0,) * (len(block) - 1),
                        memory_space=pltpu.VMEM)


def _bfly_cspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def bfly_fft_real(x: jnp.ndarray, interpret: bool = False):
    """Forward butterfly FFT of real rows (B, N) -> two (B, N2, 128) f32
    planes holding the spectrum in the opaque (t_bitrev, s) layout."""
    b, n = x.shape
    n2 = n // _N1
    consts = [jnp.asarray(c) for c in _bfly_consts(n)]
    x3 = x.reshape(b, n2, _N1)
    kernel = functools.partial(_bfly_fwd_kernel, n2=n2)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_bfly_spec((1, n2, _N1))] +
                 [_bfly_cspec(c.shape) for c in consts],
        out_specs=(_bfly_spec((1, n2, _N1)),
                   _bfly_spec((1, n2, _N1))),
        out_shape=(jax.ShapeDtypeStruct((b, n2, _N1), jnp.float32),
                   jax.ShapeDtypeStruct((b, n2, _N1), jnp.float32)),
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(x3, *consts)


def bfly_whitened_corr(ar, ai, br, bi, band_plane, eps: float = 1e-10,
                       interpret: bool = False):
    """PHAT-whitened circular correlation rows (B, N) from spectra in
    butterfly layout (B, N2, 128).  ``band_plane`` is a (N2, 128) f32 mask
    in the SAME layout (use ``bfly_band_plane``)."""
    b, n2, n1 = ar.shape
    n = n2 * n1
    consts = [jnp.asarray(c) for c in _bfly_consts(n)]
    kernel = functools.partial(_bfly_corr_kernel, n2=n2, eps=eps,
                               scale=1.0 / n)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_bfly_spec((1, n2, _N1))] * 4 +
                 [_bfly_cspec(band_plane.shape)] +
                 [_bfly_cspec(c.shape) for c in consts],
        out_specs=_bfly_spec((1, n2, _N1)),
        out_shape=jax.ShapeDtypeStruct((b, n2, _N1), jnp.float32),
        interpret=interpret,
    )(ar, ai, br, bi, band_plane, *consts)
    return out.reshape(b, n)


def bfly_band_plane(n: int, band, fs: float) -> np.ndarray:
    """(N2, 128) whitening band mask in the butterfly (t_bitrev, s) layout.

    Natural bin at plane position (t_tilde, s) is k = s*N2 + bitrev(t_tilde);
    mask passes bins whose |frequency| lies in [low, high] (mirroring the
    Hermitian half, like ops/gccphat's band mask)."""
    n2 = n // _N1
    if band is None:
        return np.ones((n2, _N1), np.float32)
    t_nat = _bitrev_perm(n2)
    k = np.arange(_N1)[None, :] * n2 + t_nat[:, None]      # (N2, 128)
    freq = k * (fs / n)
    freq = np.minimum(freq, fs - freq)                     # mirrored half
    low, high = band
    return ((freq >= low) & (freq <= high)).astype(np.float32)


def _long_twiddle(xr, xi, twr, twi, n2, chains: int):
    """(xr + i*xi) * (twr + i*twi) with the (N2, 128) twiddle plane
    broadcast over ``chains`` stacked flat transforms."""
    if chains > 1:
        xr = xr.reshape(chains, n2, _N1)
        xi = xi.reshape(chains, n2, _N1)
        twr = twr[None]
        twi = twi[None]
    cr = xr * twr - xi * twi
    ci = xr * twi + xi * twr
    if chains > 1:
        cr = cr.reshape(chains * n2, _N1)
        ci = ci.reshape(chains * n2, _N1)
    return cr, ci


def _fwd_one(xr, mask_ref, str_ref, sti_ref, twr_ref, twi_ref, w1r_ref,
             w1i_ref, n2, zero_top: bool = False, chains: int = 1):
    """Forward butterfly transform of one real (N2, 128) plane (lower
    (N2/2, 128) half-plane when ``zero_top``; ``chains`` stacked planes
    flat along axis 0 — see ``_dif_stages``)."""
    xr, xi = _dif_stages(xr, None, mask_ref, str_ref, sti_ref, n2,
                         zero_top=zero_top, chains=chains)
    cr, ci = _long_twiddle(xr, xi, twr_ref[:], twi_ref[:], n2, chains)
    return _lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False)


def _inv_packed(dr, di, mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                w1r_ref, w1i_ref, n2, chains: int = 1):
    """Inverse chain of a PACKED pair of Hermitian spectra (Z = R0 + i*R1):
    returns (ifft(R0), ifft(R1)) as the real/imag output planes
    (unnormalized — callers scale by 1/n).  ``chains`` stacked couples run
    the cascade once on the flat (chains*N2, 128) view."""
    cr, ci = _lane_dft(dr, di, w1r_ref[:], w1i_ref[:], conj=True)
    er, ei = _long_twiddle(cr, ci, twr_ref[:], -twi_ref[:], n2, chains)
    return _dit_stages(er, ei, mask_ref, str_ref, sti_ref, n2,
                       chains=chains)


def _fwd_spectra(get_mic, m, mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                 w1r_ref, w1i_ref, sr_ref, si_ref, n2,
                 zero_top: bool = False, chains: int = 1):
    """Forward-transform every mic row into the spectra scratch planes
    (``chains`` mics stacked per cascade when the schedule allows)."""
    mm = 0
    while mm < m:
        c = min(chains, m - mm)
        if c > 1:
            x = jnp.concatenate([get_mic(mm + k) for k in range(c)], axis=0)
        else:
            x = get_mic(mm)
        yr, yi = _fwd_one(x, mask_ref, str_ref, sti_ref, twr_ref,
                          twi_ref, w1r_ref, w1i_ref, n2, zero_top=zero_top,
                          chains=c)
        for k in range(c):
            sr_ref[mm + k] = yr[k * n2:(k + 1) * n2]
            si_ref[mm + k] = yi[k * n2:(k + 1) * n2]
        mm += c


def _bfly_gcc_kernel(pi_ref, pj_ref, x_ref, band_ref, mask_ref, str_ref,
                     sti_ref, twr_ref, twi_ref, w1r_ref, w1i_ref, out_ref,
                     sr_ref, si_ref, *dma, n2, eps, scale,
                     hbm_input=False, zero_top=False):
    """Fused per-scene GCC-PHAT: (1, M, N2, 128) real signals ->
    (1, P, N2, 128) whitened circular correlations, all stages VMEM-resident.

    HBM is touched exactly once per signal and once per correlation —
    spectra, cross-spectra, and whitening never leave VMEM (the XLA path
    moves ~8 MB per 4-mic scene; this kernel moves 2.5 MB).  On the healthy
    tunnel (~300 GB/s copy floor) the kernel is VPU-compute-bound in the
    butterfly stages, so the stage schedule, not traffic, sets the ceiling
    (see _SLICED_STAGES)."""
    m = x_ref.shape[1]
    p = pl.program_id(1)

    # Spectra are computed once per scene (grid step p == 0) into scratch,
    # which persists across the pair steps; the input block's index map
    # ignores p, so Pallas does not re-fetch it (revolving-buffer rule).
    # In hbm_input mode the whole-scene block would not fit VMEM (131072 x
    # 4 mics), so the signals stay in HBM and each mic row is streamed
    # through two double-buffered DMA slots instead.
    @pl.when(p == 0)
    def _():
        if hbm_input:
            xbuf, sem = dma
            scene = pl.program_id(0)

            def copy(mm, slot):
                return pltpu.make_async_copy(x_ref.at[scene, mm],
                                             xbuf.at[slot], sem.at[slot])

            copy(0, 0).start()

            def get_mic(mm):
                if mm + 1 < m:
                    copy(mm + 1, (mm + 1) % 2).start()
                copy(mm, mm % 2).wait()
                return xbuf[mm % 2]
        else:
            def get_mic(mm):
                return x_ref[0, mm]
        _fwd_spectra(get_mic, m, mask_ref, str_ref, sti_ref,
                     twr_ref, twi_ref, w1r_ref, w1i_ref, sr_ref, si_ref, n2,
                     zero_top=zero_top, chains=1 if hbm_input else _ILP_FWD)

    b = band_ref[:]

    def whitened(idx):
        i = pi_ref[idx]
        j = pj_ref[idx]
        ar, ai = sr_ref[i], si_ref[i]
        br, bi = sr_ref[j], si_ref[j]
        rr = ar * br + ai * bi
        ri = ai * br - ar * bi
        mag = jnp.sqrt(rr * rr + ri * ri) + eps
        return rr / mag * b, ri / mag * b

    # Two Hermitian spectra share ONE inverse transform: the whole inverse
    # chain is linear and ifft(R0 + i*R1) = corr0 + i*corr1 for real
    # correlations, so each grid step resolves a PAIR COUPLE (or _ILP_INV
    # stacked couples — one cascade on the flat stacked view).
    num_pairs = pi_ref.shape[0]
    cc = _ILP_INV
    drs, dis = [], []
    for k in range(cc):
        base = 2 * (cc * p + k)
        i0 = jnp.minimum(base, num_pairs - 1) if k else base
        r0r, r0i = whitened(i0)
        r1r, r1i = whitened(jnp.minimum(base + 1, num_pairs - 1))
        drs.append(r0r - r1i)
        dis.append(r0i + r1r)
    dr = jnp.concatenate(drs, axis=0) if cc > 1 else drs[0]
    di = jnp.concatenate(dis, axis=0) if cc > 1 else dis[0]
    yr, yi = _inv_packed(dr, di, mask_ref, str_ref, sti_ref, twr_ref,
                         twi_ref, w1r_ref, w1i_ref, n2, chains=cc)
    for k in range(cc):
        out_ref[0, 2 * k] = yr[k * n2:(k + 1) * n2] * scale
        out_ref[0, 2 * k + 1] = yi[k * n2:(k + 1) * n2] * scale


def _bfly_gcc_vmem(nfft: int, num_mics: int, hbm_input: bool) -> int:
    """Measured VMEM model (v5e): in blocks (pipelined whole-scene block, or
    2 single-mic DMA slots in hbm_input mode) + double-buffered pair-couple
    output + spectra scratch + const planes + ~8 live stage temporaries
    (scaled by the stacked ILP chain count)."""
    in_bytes = 2 * nfft * 4 if hbm_input else 2 * num_mics * nfft * 4
    chains = max(_ILP_FWD, _ILP_INV)
    return (in_bytes
            + 2 * 2 * _ILP_INV * nfft * 4  # couple output block, d-buffered
            + 2 * num_mics * nfft * 4    # spectra scratch planes
            + 3 * nfft * 4               # band + long twiddle planes
            + 8 * chains * nfft * 4)     # stage temporaries (peak)


def _bfly_gcc_hbm_input(nfft: int, num_mics: int) -> bool:
    """Whether the fused kernel must stream signals from HBM manually (one
    mic row per DMA) instead of a pipelined whole-scene input block."""
    return _bfly_gcc_vmem(nfft, num_mics, False) > 40 * 1024 * 1024


def bfly_gcc_eligible(nfft: int, num_mics: int, dtype) -> bool:
    """The fused kernel handles f32, nfft = 128 * pow2 >= 1024, and enough
    VMEM for M spectra + a correlation couple per scene under the raised
    _VMEM_LIMIT scoped cap (4 mics fit comfortably at 65536 and 131072; the
    model's stage-temporary term is calibrated against measured compiles)."""
    if not available() or jnp.dtype(dtype) != jnp.float32:
        return False
    n2 = nfft // _N1
    if n2 * _N1 != nfft or n2 & (n2 - 1) or n2 < 8:
        return False
    return _bfly_gcc_vmem(nfft, num_mics, _bfly_gcc_hbm_input(nfft, num_mics)
                          ) <= 48 * 1024 * 1024


def bfly_gcc_all_pairs(signals: jnp.ndarray,
                       pairs_i: np.ndarray,
                       pairs_j: np.ndarray,
                       nfft: int,
                       band=None,
                       fs: float = None,
                       eps: float = 1e-10,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused butterfly GCC-PHAT over all mic pairs.

    signals (..., M, N) f32 -> (..., P, nfft) circular whitened
    correlations, numerically equivalent to ops/gccphat.gcc_phat_all_pairs
    (measured ~1e-6 relative; MXU runs at HIGHEST precision)."""
    pi = jnp.asarray(np.asarray(pairs_i, np.int32))
    pj = jnp.asarray(np.asarray(pairs_j, np.int32))
    lead = signals.shape[:-2]
    m, n_samp = signals.shape[-2:]
    n2 = nfft // _N1
    b = int(np.prod(lead)) if lead else 1
    x = signals.reshape(b, m, n_samp)
    # Zero-top pruning: GCC inputs always satisfy n <= nfft/2 (nfft >=
    # 2n-1), so ship only the nonzero lower half-plane — half the input
    # HBM traffic — and let the first forward stage skip the zero half.
    zero_top = _zero_top_ok(n_samp, nfft)
    rows = n2 // 2 if zero_top else n2
    if n_samp < rows * _N1:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rows * _N1 - n_samp)))
    x4 = x.reshape(b, m, rows, _N1)
    consts = [jnp.asarray(c) for c in _bfly_consts(nfft)]
    band_plane = jnp.asarray(bfly_band_plane(nfft, band, fs))
    p = pi.shape[0]
    hbm = _bfly_gcc_hbm_input(nfft, m)
    kernel = functools.partial(_bfly_gcc_kernel, n2=n2, eps=eps,
                               scale=1.0 / nfft, hbm_input=hbm,
                               zero_top=zero_top)

    def cspec2(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, q: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if hbm:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        dma_scratch = [pltpu.VMEM((2, rows, _N1), jnp.float32),
                       pltpu.SemaphoreType.DMA((2,))]
    else:
        x_spec = pl.BlockSpec((1, m, rows, _N1), lambda i, q: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        dma_scratch = []

    # Grid (scene, pair couple): spectra are built once at couple step 0
    # into scratch (persists across steps); the input block's index map
    # ignores the couple index, so it is fetched once per scene.  Each step
    # writes TWO pairs per stacked couple (packed inverse); trailing
    # duplicate pairs are dropped by the host slice.
    cc = _ILP_INV
    ph = (p + 2 * cc - 1) // (2 * cc)
    out = pl.pallas_call(
        kernel,
        grid=(b, ph),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  x_spec,
                  cspec2(band_plane.shape)] +
                 [cspec2(c.shape) for c in consts],
        out_specs=pl.BlockSpec((1, 2 * cc, n2, _N1),
                               lambda i, q: (i, q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * cc * ph, n2, _N1),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, n2, _N1), jnp.float32),
                        pltpu.VMEM((m, n2, _N1), jnp.float32)] + dma_scratch,
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(pi, pj, x4, band_plane, *consts)
    return out[:, :p].reshape(lead + (p, nfft))


def _bfly_gcc_win_kernel(pi_ref, pj_ref, x_ref, band_ref, mask_ref, str_ref,
                         sti_ref, twr_ref, twi_ref, w1r_ref, w1i_ref,
                         win_ref, stat_ref, sr_ref, si_ref, *, n2, wq, eps,
                         scale, zero_top=False):
    """Windowed variant of ``_bfly_gcc_kernel``: instead of the full
    correlation, writes only the +-wq*128-lag window around lag 0 plus the
    global statistics the single-peak TDOA ladder needs — the (P, nfft)
    correlation tensor never reaches HBM (~94% of the fused kernel's output
    traffic at 65536 with a 2048-lag window).

    Outputs per (scene, pair):
      win  (2*wq, 128): rows [wq:] = lags 0..wq*128-1 (correlation rows
           0..wq-1), rows [:wq] = lags -wq*128..-1 (rows n2-wq..n2-1) —
           i.e. a lag-centered slice, row-major natural time order.
      stat (8, 128): [0,0] = mean |corr| (threshold statistic),
           [0,1] = global max, [0,2] = its natural index as f32.
    """
    m = x_ref.shape[1]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        _fwd_spectra(lambda mm: x_ref[0, mm], m, mask_ref, str_ref, sti_ref,
                     twr_ref, twi_ref, w1r_ref, w1i_ref, sr_ref, si_ref, n2,
                     zero_top=zero_top, chains=_ILP_FWD)

    _couple_window_stats(p, pi_ref, pj_ref, band_ref, sr_ref, si_ref,
                         mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                         w1r_ref, w1i_ref, win_ref, stat_ref, n2, wq, eps,
                         scale, chains=_ILP_INV)


def _couple_window_stats(p, pi_ref, pj_ref, band_ref, sr_ref, si_ref,
                         mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                         w1r_ref, w1i_ref, win_ref, stat_ref, n2, wq, eps,
                         scale, chains: int = 1):
    """Whiten + packed windowed inverse + stats for pair couple ``p``
    (``chains`` stacked couples per grid step — couples chains*p+k;
    shared by the windowed GCC kernel and the whole-scene kernel)."""
    b = band_ref[:]

    def whitened(idx):
        i = pi_ref[idx]
        j = pj_ref[idx]
        ar, ai = sr_ref[i], si_ref[i]
        br, bi = sr_ref[j], si_ref[j]
        rr = ar * br + ai * bi
        ri = ai * br - ar * bi
        mag = jnp.sqrt(rr * rr + ri * ri) + eps
        return rr / mag * b, ri / mag * b

    # Packed inverse: ifft(R0 + i*R1) = corr0 + i*corr1 (both real), so one
    # inverse chain resolves a pair couple per grid step.
    num_pairs = pi_ref.shape[0]
    drs, dis = [], []
    for k in range(chains):
        base = 2 * (chains * p + k)
        i0 = jnp.minimum(base, num_pairs - 1) if k else base
        r0r, r0i = whitened(i0)
        r1r, r1i = whitened(jnp.minimum(base + 1, num_pairs - 1))
        drs.append(r0r - r1i)
        dis.append(r0i + r1r)
    dr = jnp.concatenate(drs, axis=0) if chains > 1 else drs[0]
    di = jnp.concatenate(dis, axis=0) if chains > 1 else dis[0]
    yf0, yf1 = _inv_packed(dr, di, mask_ref, str_ref, sti_ref,
                           twr_ref, twi_ref, w1r_ref, w1i_ref, n2,
                           chains=chains)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n2, _N1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n2, _N1), 1)
    nat = rows * _N1 + cols
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, _N1), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, _N1), 1)
    slot = jnp.where(r8 == 0, c8, -1)

    for cpl in range(chains):
        y0 = yf0[cpl * n2:(cpl + 1) * n2]
        y1 = yf1[cpl * n2:(cpl + 1) * n2]
        for k, yr in enumerate((y0, y1)):
            yr = yr * scale
            win_ref[0, 2 * cpl + k, wq:, :] = yr[:wq]
            win_ref[0, 2 * cpl + k, :wq, :] = yr[n2 - wq:]
            amean = jnp.mean(jnp.abs(yr))
            gmax = jnp.max(yr)
            gidx = jnp.min(jnp.where(yr >= gmax, nat, n2 * _N1))
            # Scatter is not lowerable in Mosaic — place the three scalars
            # with masked selects over an index plane instead.
            stats = jnp.where(slot == 0, amean,
                              jnp.where(slot == 1, gmax,
                                        jnp.where(slot == 2,
                                                  gidx.astype(jnp.float32),
                                                  0.0)))
            stat_ref[0, 2 * cpl + k] = stats


def bfly_gcc_windowed(signals: jnp.ndarray,
                      pairs_i: np.ndarray,
                      pairs_j: np.ndarray,
                      nfft: int,
                      wq: int,
                      band=None,
                      fs: float = None,
                      eps: float = 1e-10,
                      interpret: bool = False):
    """Fused GCC-PHAT with windowed output (see ``_bfly_gcc_win_kernel``).

    Returns (win (..., P, 2*wq*128), stats (..., P, 3)): ``win`` is the
    lag-centered correlation slice (sample k holds lag k - wq*128), stats
    columns are (mean |corr|, global max, global argmax natural index)."""
    pi = jnp.asarray(np.asarray(pairs_i, np.int32))
    pj = jnp.asarray(np.asarray(pairs_j, np.int32))
    lead = signals.shape[:-2]
    m, n_samp = signals.shape[-2:]
    n2 = nfft // _N1
    if not 0 < wq <= n2 // 2:
        raise ValueError("wq must be in (0, n2//2]")
    b = int(np.prod(lead)) if lead else 1
    x = signals.reshape(b, m, n_samp)
    zero_top = _zero_top_ok(n_samp, nfft)
    rows = n2 // 2 if zero_top else n2
    if n_samp < rows * _N1:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rows * _N1 - n_samp)))
    x4 = x.reshape(b, m, rows, _N1)
    consts = [jnp.asarray(c) for c in _bfly_consts(nfft)]
    band_plane = jnp.asarray(bfly_band_plane(nfft, band, fs))
    p = pi.shape[0]
    kernel = functools.partial(_bfly_gcc_win_kernel, n2=n2, wq=wq, eps=eps,
                               scale=1.0 / nfft, zero_top=zero_top)

    def cspec2(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, q: (0,) * nd,
                            memory_space=pltpu.VMEM)

    cc = _ILP_INV
    ph = (p + 2 * cc - 1) // (2 * cc)
    win, stats = pl.pallas_call(
        kernel,
        grid=(b, ph),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, m, rows, _N1), lambda i, q: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  cspec2(band_plane.shape)] +
                 [cspec2(c.shape) for c in consts],
        out_specs=(pl.BlockSpec((1, 2 * cc, 2 * wq, _N1),
                                lambda i, q: (i, q, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2 * cc, 8, _N1),
                                lambda i, q: (i, q, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 2 * cc * ph, 2 * wq, _N1),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((b, 2 * cc * ph, 8, _N1),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((m, n2, _N1), jnp.float32),
                        pltpu.VMEM((m, n2, _N1), jnp.float32)],
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(pi, pj, x4, band_plane, *consts)
    win = win[:, :p].reshape(lead + (p, 2 * wq * _N1))
    stats = stats[:, :p, 0, :3].reshape(lead + (p, 3))
    return win, stats


# ---------------------------------------------------------------------------
# WHOLE-SCENE kernel: base signal -> windowed correlations + stats, with the
# multipath render, per-mic finalize + measurement noise, forward spectra,
# whitening, and packed windowed inverses ALL VMEM-resident.  Per 4-mic
# scene, HBM sees only the padded base (~256 KB in) and the tiny window +
# stats blocks (~100 KB out) — everything between (signals, spectra,
# cross-spectra, full correlations) exists only on-chip.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Bootstrap resample peaks: the reference's dominant cost (1000 serial
# resample+PHAT iterations per pair, ~258 s of its 274 s default run) is a
# fwd-FFT of each shuffled row, a whiten against the FIXED sig1 spectrum,
# and a global max.  The kernel keeps everything in VMEM: per grid step
# TWO shuffled rows are forward-transformed, whitened, resolved by ONE
# packed inverse, and reduced to their scalar maxima — 1.5 butterfly
# transforms per resample, and the (chunk, nfft) correlation tensor never
# exists.  Measured (v5e 2026-08-18): 5.3k -> 7.6k resamples/s at
# nfft=131072 (1.43x end-to-end; the residual cost is the resample itself
# — jax.random.permutation is a sort over n samples per draw, and the
# reference's permutation-bootstrap semantics pin that choice).
# ---------------------------------------------------------------------------


def _bfly_boot_kernel(s1r_ref, s1i_ref, x_ref, mask_ref, str_ref, sti_ref,
                      twr_ref, twi_ref, w1r_ref, w1i_ref, out_ref, *,
                      n2, eps, scale, zero_top=False):
    ar, ai = s1r_ref[:], s1i_ref[:]

    def whitened(k):
        # R = S1 * conj(S2); R /= |R| + eps  (ops/gccphat._whiten order).
        br, bi = _fwd_one(x_ref[k], mask_ref, str_ref, sti_ref, twr_ref,
                          twi_ref, w1r_ref, w1i_ref, n2, zero_top=zero_top)
        rr = ar * br + ai * bi
        ri = ai * br - ar * bi
        mag = jnp.sqrt(rr * rr + ri * ri) + eps
        return rr / mag, ri / mag

    r0r, r0i = whitened(0)
    r1r, r1i = whitened(1)
    y0, y1 = _inv_packed(r0r - r1i, r0i + r1r, mask_ref, str_ref, sti_ref,
                         twr_ref, twi_ref, w1r_ref, w1i_ref, n2)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, _N1), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, _N1), 1)
    slot0 = (r8 == 0) & (c8 == 0)
    out_ref[0] = jnp.where(slot0, jnp.max(y0) * scale, 0.0)
    out_ref[1] = jnp.where(slot0, jnp.max(y1) * scale, 0.0)


def bfly_bootstrap_eligible(nfft: int, dtype) -> bool:
    """f32, nfft = 128*pow2 >= 1024, and the ~20-plane working set (two
    double-buffered input rows, sig1 planes, consts, stage temporaries)
    fits the raised VMEM cap."""
    if not available() or jnp.dtype(dtype) != jnp.float32:
        return False
    n2 = nfft // _N1
    if n2 * _N1 != nfft or n2 & (n2 - 1) or n2 < 8:
        return False
    return 20 * nfft * 4 <= 48 * 1024 * 1024


def bfly_bootstrap_peaks(s1_planes, shuffled: jnp.ndarray,
                         eps: float = 1e-10,
                         interpret: bool = False) -> jnp.ndarray:
    """Max of the PHAT-whitened circular correlation between sig1 and each
    shuffled row.

    s1_planes: (s1r, s1i) (N2, 128) f32 spectrum planes of the (padded)
    sig1 from ``bfly_fft_real``.  shuffled: (B, n_samp<=nfft) f32 resample
    rows.  Returns (B,) f32 peak maxima, numerically matching
    ``jnp.max(irfft(whiten(rfft(sig1)*conj(rfft(row)))), -1)``."""
    s1r, s1i = s1_planes
    n2 = s1r.shape[-2]
    nfft = n2 * _N1
    b, n_samp = shuffled.shape
    x = shuffled
    zero_top = _zero_top_ok(n_samp, nfft)
    rows = n2 // 2 if zero_top else n2
    if n_samp < rows * _N1:
        x = jnp.pad(x, ((0, 0), (0, rows * _N1 - n_samp)))
    bh = (b + 1) // 2
    if b % 2:
        x = jnp.pad(x, ((0, 1), (0, 0)))
    x3 = x.reshape(2 * bh, rows, _N1)
    consts = [jnp.asarray(c) for c in _bfly_consts(nfft)]
    kernel = functools.partial(_bfly_boot_kernel, n2=n2, eps=eps,
                               scale=1.0 / nfft, zero_top=zero_top)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda q: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[cspec(s1r.shape), cspec(s1i.shape),
                  pl.BlockSpec((2, rows, _N1), lambda q: (q, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [cspec(c.shape) for c in consts],
        out_specs=pl.BlockSpec((2, 8, _N1), lambda q: (q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * bh, 8, _N1), jnp.float32),
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(s1r, s1i, x3, *consts)
    return out[:b, 0, 0]


# ---------------------------------------------------------------------------
# Noise-null bootstrap (bootstrap_mode='noise'): under PHAT whitening the
# permutation null equals the WHITE-NOISE null within Monte-Carlo error —
# a permuted row is exchangeable, its padded-window spectrum is
# asymptotically complex Gaussian with the SAME Dirichlet-kernel bin
# covariance as a length-n noise burst (the n-of-nfft zero-padding is what
# a naive full-band phase surrogate gets wrong: measured 12% low), and the
# whitening cancels the amplitude spectrum.  So each draw synthesizes a
# LENGTH-n uniform-noise row in-kernel (pltpu.prng bits, no HBM input, no
# permutation sort), forward-transforms it (zero-top pruned), whitens
# against the fixed S1, and reduces to the packed-pair maxima.  The draw
# stream is deterministic per key but BACKEND-SPECIFIC (hardware PRNG in
# the kernel, jax.random on the XLA fallback) — like the simulator's
# in-kernel measurement noise; the thresholds agree in distribution.
# ---------------------------------------------------------------------------


def _bfly_noise_boot_kernel(seed_ref, s1r_ref, s1i_ref, mask_ref, str_ref,
                            sti_ref, twr_ref, twi_ref, w1r_ref, w1i_ref,
                            out_ref, *, n2, n_samp, eps, scale, zero_top):
    ar, ai = s1r_ref[:], s1i_ref[:]
    rows = n2 // 2 if zero_top else n2
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, _N1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, _N1), 1)
    valid = (ri * _N1 + ci) < n_samp

    def whitened(d):
        # Uniform noise in [-0.5, 0.5): the null only needs the padded
        # white-noise spectrum (Gaussian bins by the CLT); uniform variates
        # are one bitcast + cast from the raw PRNG bits.
        pltpu.prng_seed(seed_ref[0, d, 0], seed_ref[0, d, 1])
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, _N1)), jnp.int32)
        row = jnp.where(valid, bits.astype(jnp.float32) * (2.0 ** -32), 0.0)
        br, bi = _fwd_one(row, mask_ref, str_ref, sti_ref, twr_ref,
                          twi_ref, w1r_ref, w1i_ref, n2, zero_top=zero_top)
        rr = ar * br + ai * bi
        rim = ai * br - ar * bi
        mag = jnp.sqrt(rr * rr + rim * rim) + eps
        return rr / mag, rim / mag

    r0r, r0i = whitened(0)
    r1r, r1i = whitened(1)
    y0, y1 = _inv_packed(r0r - r1i, r0i + r1r, mask_ref, str_ref, sti_ref,
                         twr_ref, twi_ref, w1r_ref, w1i_ref, n2)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, _N1), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, _N1), 1)
    slot0 = (r8 == 0) & (c8 == 0)
    out_ref[0] = jnp.where(slot0, jnp.max(y0) * scale, 0.0)
    out_ref[1] = jnp.where(slot0, jnp.max(y1) * scale, 0.0)


def bfly_noise_bootstrap_peaks(s1_planes, seeds: jnp.ndarray, n_samp: int,
                               eps: float = 1e-10) -> jnp.ndarray:
    """Peak maxima of PHAT correlations between sig1 and in-kernel
    length-``n_samp`` uniform-noise rows (bootstrap_mode='noise').

    s1_planes: (s1r, s1i) (N2, 128) f32 spectrum planes of the padded sig1.
    seeds: (B, 2) int32 per-draw key words.  Returns (B,) f32 maxima.
    No CPU interpret mode (prng_seed does not lower there)."""
    s1r, s1i = s1_planes
    n2 = s1r.shape[-2]
    nfft = n2 * _N1
    b = seeds.shape[0]
    bh = (b + 1) // 2
    if b % 2:
        seeds = jnp.concatenate([seeds, seeds[-1:]], axis=0)
    seeds2 = seeds.reshape(bh, 2, 2).astype(jnp.int32)
    consts = [jnp.asarray(c) for c in _bfly_consts(nfft)]
    zero_top = _zero_top_ok(n_samp, nfft)
    kernel = functools.partial(_bfly_noise_boot_kernel, n2=n2,
                               n_samp=n_samp, eps=eps, scale=1.0 / nfft,
                               zero_top=zero_top)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda q: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[pl.BlockSpec((1, 2, 2), lambda q: (q, 0, 0),
                               memory_space=pltpu.SMEM),
                  cspec(s1r.shape), cspec(s1i.shape)] +
                 [cspec(c.shape) for c in consts],
        out_specs=pl.BlockSpec((2, 8, _N1), lambda q: (q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * bh, 8, _N1), jnp.float32),
        compiler_params=_BFLY_PARAMS,
    )(seeds2, s1r, s1i, *consts)
    return out[:b, 0, 0]


# ---------------------------------------------------------------------------
# Separable path-ramp synthesis.  The mixed per-mic transfer function is
#   H_m = sum_p g_p * exp(-2*pi*i * k_signed * tau_p / N),   tau in samples,
# and with the butterfly layout's k = s*N2 + t (s = lane, t = natural
# sublane) the sign wrap k_signed = k - N*[k > N/2] depends ONLY on the
# lane: k_signed = s_signed*N2 + t with s_signed = s - 128*[s >= 64].  The
# exponential therefore factors into an OUTER PRODUCT of a 128-entry lane
# vector and an N2-entry sublane vector.  Measured (v5e 2026-08-18):
# render-kernel time is NEUTRAL vs the full-plane cos/sin form — an
# (N2, 1) array occupies as many VPU registers as an (N2, 128) plane, so
# the transcendental savings cancel against the extra outer-product
# multiplies.  The form is kept because it is substantially MORE ACCURATE
# (the lane phase is range-reduced exactly — integer lane indices make
# whole-turn subtraction lossless — cutting worst-case ramp phase error
# from ~2e-3 rad to ~5e-5 rad at long delay budgets) and it retires the
# (N2, 128) frequency-plane constant (256 KB VMEM at nfft=65536).
#
# NYQUIST (t=0, lane 64): a real-output fractional delay must have a REAL
# Nyquist response, Re(e^{-i pi tau}) = cos(pi tau) — which is what the
# XLA path's irfft implicitly applies by discarding that bin's imaginary
# part.  The pre-round-3 frq-plane kernel kept the complex e^{-i pi tau}
# instead, which broke the mixed spectrum's Hermitian symmetry and let
# the packed-pair inverse (ifft(Z0 + i*Z1)) leak each mic's Nyquist
# imaginary into its packed partner: measured 2.2e-2 relative waveform
# error vs an f64 oracle at nfft=2048 (scales as |spec(N/2)|/nfft; found
# round 3 by the first kernel-vs-delay_and_sum drive).  The separable
# form patches the bin with the accumulated REAL part (a per-mic lane
# accumulator + one masked select), fixing the defect: kernel-vs-f64
# error drops to XLA-path levels.
# ---------------------------------------------------------------------------


def _mixed_ramps(d_ref, g_ref, m_idx, num_paths, sgn, tnat, nyq_mask, n2,
                 inv_n):
    """Accumulate H_m = sum_p g_p exp(-2*pi*i*f_signed*tau_p) in butterfly
    layout from per-path sample delays ``d_ref`` (SMEM, samples) and gains.
    ``sgn`` (1, 128) signed lane index, ``tnat`` (n2, 1) natural sublane
    index, ``nyq_mask`` (n2, 128) bool marking (t=0, lane 64)."""
    two_pi = 2.0 * np.pi
    hr = jnp.zeros((n2, _N1), jnp.float32)
    hi = jnp.zeros((n2, _N1), jnp.float32)
    for pth in range(num_paths):
        tau = d_ref[0, m_idx, pth]
        g = g_ref[0, m_idx, pth]
        # Lane phase, range-reduced by whole turns (exact: s_signed is an
        # integer, so subtracting floor multiples of 2*pi per lane leaves
        # cos/sin unchanged while keeping |pha| < ~400 rad even for long
        # delay budgets).
        pha = (two_pi / _N1) * tau * sgn
        pha = pha - two_pi * jnp.floor(pha * (1.0 / two_pi))
        ar = g * jnp.cos(pha)
        ai = -g * jnp.sin(pha)
        phb = (two_pi * inv_n) * tau * tnat
        br = jnp.cos(phb)
        bi = -jnp.sin(phb)
        hr = hr + (br * ar - bi * ai)
        hi = hi + (br * ai + bi * ar)
    # Row 0 is natural t = 0 (phb = 0, B = 1+0i exactly), so hr[0, 64]
    # already holds sum_p g cos(pi tau) — the real Nyquist response; only
    # the imaginary part needs zeroing.
    hi = jnp.where(nyq_mask, 0.0, hi)
    return hr, hi


# Per-path cost of the vector loop above is ~8.3 us/scene/path on v5e at
# 4 mics x 65536 (tools/stage_ab_bench.py render rows: 52.6 us at 1 path,
# 140 us at 10, 351 us at 37) — the per-path (N2, 1)/(1, 128) factor trig
# costs full VPU registers.  For multi-path scenes the sum is a RANK-P
# factorization, H = B @ A with B[t, p] = e^{-2 pi i t tau_p / N} and
# A[p, s] = g_p e^{-2 pi i tau_p s_signed / 128}: ONE (N2, P) trig pair
# per mic (register cost independent of P) + four small MXU matmuls
# replace P plane-scale accumulation rounds.  Measured (v5e 2026-08-18):
# 10 paths 140 -> 56 us/scene, 37 paths 351 -> 71 us/scene (4.9x); the
# vector loop stays for P <= 2 where its fixed cost is lower.
_MXU_RAMP_MIN_PATHS = 3


def _mixed_ramps_mxu(d_ref, g_ref, m_idx, num_paths, sgn, tnat, nyq_mask,
                     n2, inv_n):
    """Rank-P matmul form of ``_mixed_ramps`` (same contract).  Requires
    num_paths <= 128 (the contraction dim); callers fall back to the
    vector loop otherwise."""
    two_pi = 2.0 * np.pi
    p_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, num_paths), 1)
    p_rows = jax.lax.broadcasted_iota(jnp.int32, (num_paths, 1), 0)
    tau_lane = jnp.zeros((1, num_paths), jnp.float32)
    tau_col = jnp.zeros((num_paths, 1), jnp.float32)
    g_col = jnp.zeros((num_paths, 1), jnp.float32)
    for pth in range(num_paths):
        tau = d_ref[0, m_idx, pth]
        g = g_ref[0, m_idx, pth]
        tau_lane = jnp.where(p_lanes == pth, tau, tau_lane)
        tau_col = jnp.where(p_rows == pth, tau, tau_col)
        g_col = jnp.where(p_rows == pth, g, g_col)
    phb = (two_pi * inv_n) * tnat * tau_lane          # (n2, P)
    br = jnp.cos(phb)
    bi = -jnp.sin(phb)
    pha = (two_pi / _N1) * tau_col * sgn              # (P, 128)
    pha = pha - two_pi * jnp.floor(pha * (1.0 / two_pi))
    ar = g_col * jnp.cos(pha)
    ai = -(g_col * jnp.sin(pha))

    def dot(x, w):
        return jnp.dot(x, w, precision=_MXU_PREC,
                       preferred_element_type=jnp.float32)

    hr = dot(br, ar) - dot(bi, ai)
    hi = dot(br, ai) + dot(bi, ar)
    hi = jnp.where(nyq_mask, 0.0, hi)
    return hr, hi


def _mixed_ramps_best(d_ref, g_ref, m_idx, num_paths, sgn, tnat, nyq_mask,
                      n2, inv_n):
    fn = (_mixed_ramps_mxu
          if _MXU_RAMP_MIN_PATHS <= num_paths <= _N1 else _mixed_ramps)
    return fn(d_ref, g_ref, m_idx, num_paths, sgn, tnat, nyq_mask, n2,
              inv_n)


def _nyq_mask(n2):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n2, _N1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n2, _N1), 1)
    return (rows == 0) & (cols == _N1 // 2)


def _ramp_consts(n2):
    """Signed lane index (1, 128) and natural sublane index (n2, 1) f32
    vectors for the separable ramp synthesis (bit-reversed storage)."""
    s = np.arange(_N1)
    sgn = np.where(s < _N1 // 2, s, s - _N1).astype(np.float32)[None, :]
    tnat = _bitrev_perm(n2).astype(np.float32)[:, None]
    return sgn, tnat


def _bfly_scene_kernel(pi_ref, pj_ref, d_ref, g_ref, seed_ref, snr_ref,
                       base_ref, fade_ref, sgn_ref, tnat_ref, band_ref,
                       mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                       w1r_ref, w1i_ref,
                       win_ref, stat_ref, sig_ref, sr_ref, si_ref, *,
                       n2, n2_out, wq, num_paths, out_samples, eps,
                       render_scale, corr_scale, with_noise,
                       zero_top=False):
    m = d_ref.shape[1]
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        # Phase 1: render — forward the base once, mix per-mic path ramps,
        # packed inverse per mic couple, finalize (+noise), store signals
        # (zero-padded to the transform length) in scratch.
        br_, bi_ = _fwd_one(base_ref[0], mask_ref, str_ref, sti_ref,
                            twr_ref, twi_ref, w1r_ref, w1i_ref, n2,
                            zero_top=zero_top)
        sgn = sgn_ref[:]
        tnat = tnat_ref[:]
        nyq = _nyq_mask(n2)
        window = fade_ref[:] * render_scale

        def mixed(m_idx):
            hr, hi = _mixed_ramps_best(d_ref, g_ref, m_idx, num_paths,
                                       sgn, tnat, nyq, n2,
                                       1.0 / (n2 * _N1))
            return br_ * hr - bi_ * hi, br_ * hi + bi_ * hr

        for mq in range((m + 1) // 2):
            i0 = 2 * mq
            i1 = min(2 * mq + 1, m - 1)
            z0r, z0i = mixed(i0)
            z1r, z1i = mixed(i1)
            y0, y1 = _inv_packed(z0r - z1i, z0i + z1r, mask_ref, str_ref,
                                 sti_ref, twr_ref, twi_ref, w1r_ref,
                                 w1i_ref, n2)
            for k, (y, mi) in enumerate(((y0, i0), (y1, i1))):
                if k == 1 and i1 == i0:
                    continue  # odd M: last couple's imag half is a dup
                # Same int32 Weyl mix as _bfly_delay_sum's emit() so both
                # kernels draw the SAME per-mic noise stream for a given
                # scene key (0x9E3779B9 as a wrapped int32; mi is a Python
                # int here, so wrap explicitly before the int32 cast).
                weyl = np.int32((mi * -1640531527 + 2**31) % 2**32 - 2**31)
                seed = (seed_ref[0, 0, 0], seed_ref[0, 0, 1] + weyl
                        ) if with_noise else None
                y = _render_postprocess(
                    y[:n2_out] * window, out_samples, True, seed, snr_ref)
                sig_ref[mi, :n2_out] = y
                if n2_out < n2:  # empty slices are rejected by Pallas
                    sig_ref[mi, n2_out:] = jnp.zeros((n2 - n2_out, _N1),
                                                     jnp.float32)

        # Phase 2: forward spectra of the finished signals.  The scratch
        # rows above n2_out are explicit zeros, so when the rendered
        # signals cover at most half the transform the forward can read
        # only the lower half-plane and prune its first stage.
        sig_zt = _SLICED_STAGES and n2 >= 16 and n2_out <= n2 // 2
        get_sig = ((lambda mm: sig_ref[mm, :n2 // 2]) if sig_zt
                   else (lambda mm: sig_ref[mm]))
        _fwd_spectra(get_sig, m, mask_ref, str_ref, sti_ref,
                     twr_ref, twi_ref, w1r_ref, w1i_ref, sr_ref, si_ref, n2,
                     zero_top=sig_zt, chains=_ILP_FWD)

    # Phase 3 (every couple step): whiten + windowed inverse + stats.
    _couple_window_stats(q, pi_ref, pj_ref, band_ref, sr_ref, si_ref,
                         mask_ref, str_ref, sti_ref, twr_ref, twi_ref,
                         w1r_ref, w1i_ref, win_ref, stat_ref, n2, wq, eps,
                         corr_scale, chains=_ILP_INV)


def bfly_scene_eligible(nfft: int, num_mics: int, num_paths: int,
                        dtype) -> bool:
    """Scene kernel fits: f32, nfft = 128*pow2, num_paths within the MXU
    ramp's contraction width (beyond 128 the ramp synthesis would fall
    back to the per-path vector loop — ~8.3 us/scene/path with a
    P-unrolled Mosaic body, the opposite of a fast path), and signals +
    spectra scratch + temporaries under the raised VMEM cap (this kernel
    has no HBM-streaming mode)."""
    if not available() or jnp.dtype(dtype) != jnp.float32:
        return False
    n2 = nfft // _N1
    if n2 * _N1 != nfft or n2 & (n2 - 1) or n2 < 8:
        return False
    if num_paths > _N1:
        return False
    vmem = (2 * nfft * 4                  # base input block, d-buffered
            + num_mics * nfft * 4         # signal scratch planes
            + 2 * num_mics * nfft * 4     # spectra scratch planes
            + 5 * nfft * 4                # band/fade/ramp-vector/twiddles
            + 4 * nfft * 4                # rank-P ramp planes (B, A, phase)
            + 10 * nfft * 4)              # stage temporaries (peak)
    return vmem <= 48 * 1024 * 1024


def bfly_scene_windowed(base: jnp.ndarray,
                        delays: jnp.ndarray,
                        gains: jnp.ndarray,
                        pairs_i: np.ndarray,
                        pairs_j: np.ndarray,
                        fs: float,
                        nfft: int,
                        out_samples: int,
                        wq: int,
                        band=None,
                        fade: Optional[jnp.ndarray] = None,
                        snr_db: Optional[jnp.ndarray] = None,
                        noise_seeds: Optional[jnp.ndarray] = None,
                        eps: float = 1e-10,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-scene fused pipeline: multipath render (+finalize, +noise) ->
    band-limited GCC-PHAT -> windowed correlations + stats.

    base (..., N<=nfft) real; delays/gains (..., M, P); returns
    (win (..., PAIRS, 2*wq*128), stats (..., PAIRS, 3)) with the
    ``bfly_gcc_windowed`` layout/semantics computed on signals identical to
    ``bfly_delay_sum(..., finalize=True, snr_db=..., noise_seeds=...)``."""
    pi = jnp.asarray(np.asarray(pairs_i, np.int32))
    pj = jnp.asarray(np.asarray(pairs_j, np.int32))
    lead = base.shape[:-1]
    n_samp = base.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    m, num_paths = delays.shape[-2:]
    n2 = nfft // _N1
    n2_out = -(-out_samples // _N1)
    if not 0 < wq <= n2 // 2:
        raise ValueError("wq must be in (0, n2//2]")
    x = base.reshape(b, n_samp)
    zero_top = _zero_top_ok(n_samp, nfft)
    in_rows = n2 // 2 if zero_top else n2
    if n_samp < in_rows * _N1:
        x = jnp.pad(x, ((0, 0), (0, in_rows * _N1 - n_samp)))
    x3 = x.reshape(b, in_rows, _N1)
    # Path delays travel in SAMPLES (the kernel's separable ramp synthesis
    # needs no frequency plane, so fs never enters the kernel).
    d3 = (delays * fs).reshape(b, m, num_paths).astype(jnp.float32)
    g3 = gains.reshape(b, m, num_paths).astype(jnp.float32)
    with_noise = snr_db is not None
    if with_noise:
        if noise_seeds is None:
            raise ValueError("snr_db requires noise_seeds")
        seeds = noise_seeds.reshape(b, 1, 2).astype(jnp.int32)
        snr = snr_db.reshape(b, 1, 1).astype(jnp.float32)
    else:
        seeds = jnp.zeros((b, 1, 2), jnp.int32)
        snr = jnp.zeros((b, 1, 1), jnp.float32)
    consts = [jnp.asarray(c) for c in _bfly_consts(nfft)]
    band_plane = jnp.asarray(bfly_band_plane(nfft, band, fs))
    sgn, tnat = (jnp.asarray(c) for c in _ramp_consts(n2))
    fade_plane = jnp.zeros((n2_out, _N1), jnp.float32).reshape(-1).at[
        :out_samples].set(jnp.ones(out_samples, jnp.float32)
                          if fade is None else fade.astype(jnp.float32)
                          ).reshape(n2_out, _N1)
    p = pi.shape[0]
    ph = (p + 2 * _ILP_INV - 1) // (2 * _ILP_INV)
    kernel = functools.partial(_bfly_scene_kernel, n2=n2, n2_out=n2_out,
                               wq=wq, num_paths=num_paths,
                               out_samples=out_samples, eps=eps,
                               render_scale=1.0 / nfft,
                               corr_scale=1.0 / nfft, with_noise=with_noise,
                               zero_top=zero_top)

    def cspec2(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, qq: (0,) * nd,
                            memory_space=pltpu.VMEM)

    win, stats = pl.pallas_call(
        kernel,
        grid=(b, ph),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, m, num_paths), lambda i, qq: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, m, num_paths), lambda i, qq: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 2), lambda i, qq: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 1), lambda i, qq: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, in_rows, _N1), lambda i, qq: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  cspec2(fade_plane.shape), cspec2(sgn.shape),
                  cspec2(tnat.shape),
                  cspec2(band_plane.shape)] +
                 [cspec2(c.shape) for c in consts],
        out_specs=(pl.BlockSpec((1, 2 * _ILP_INV, 2 * wq, _N1),
                                lambda i, qq: (i, qq, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2 * _ILP_INV, 8, _N1),
                                lambda i, qq: (i, qq, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 2 * _ILP_INV * ph, 2 * wq, _N1),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((b, 2 * _ILP_INV * ph, 8, _N1),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((m, n2, _N1), jnp.float32),
                        pltpu.VMEM((m, n2, _N1), jnp.float32),
                        pltpu.VMEM((m, n2, _N1), jnp.float32)],
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(pi, pj, d3, g3, seeds, snr, x3, fade_plane, sgn, tnat, band_plane,
      *consts)
    win = win[:, :p].reshape(lead + (p, 2 * wq * _N1))
    stats = stats[:, :p, 0, :3].reshape(lead + (p, 3))
    return win, stats


# ---------------------------------------------------------------------------
# Fused multipath render: base signal -> delayed/attenuated per-mic mixes.
# Counterpart of ops/delay.delay_and_sum (reference main.py:104-118), fused:
# forward FFT of the padded base ONCE per scene into scratch, then per mic
# the path phase ramps H_m(f) = sum_p g[m,p] exp(-2pi i f d[m,p]) are
# synthesized on the VPU (signed-frequency plane in butterfly layout, so H
# is Hermitian), multiplied in VMEM, inverse-transformed, faded, and only
# the sublanes covering the kept samples are written back.  The XLA path
# materializes the (M, P, F) ramp tensor in HBM — at high path counts that
# is tens of MB per scene; here it never exists.
# ---------------------------------------------------------------------------


def _bfly_render_kernel(d_ref, g_ref, seed_ref, snr_ref, x_ref, fade_ref,
                        sgn_ref, tnat_ref, mask_ref, str_ref, sti_ref,
                        twr_ref, twi_ref, w1r_ref, w1i_ref, out_ref,
                        sr_ref, si_ref,
                        *, n2, n2_out, num_paths, out_samples, scale,
                        finalize=False, with_noise=False, zero_top=False):
    mq = pl.program_id(1)

    @pl.when(mq == 0)
    def _():
        xr = x_ref[0]
        xr, xi = _dif_stages(xr, None, mask_ref, str_ref, sti_ref, n2,
                             zero_top=zero_top)
        twr = twr_ref[:]
        twi = twi_ref[:]
        cr = xr * twr - xi * twi
        ci = xr * twi + xi * twr
        yr, yi = _lane_dft(cr, ci, w1r_ref[:], w1i_ref[:], conj=False)
        sr_ref[:] = yr
        si_ref[:] = yi

    sgn = sgn_ref[:]
    tnat = tnat_ref[:]
    nyq = _nyq_mask(n2)
    ar, ai = sr_ref[:], si_ref[:]

    def mixed(m_idx):
        hr, hi = _mixed_ramps_best(d_ref, g_ref, m_idx, num_paths, sgn,
                                   tnat, nyq, n2, 1.0 / (n2 * _N1))
        return ar * hr - ai * hi, ar * hi + ai * hr

    # Packed inverse: two mics' (Hermitian) mixed spectra share one
    # transform — ifft(Z0 + i*Z1) = mix0 + i*mix1.
    num_m = d_ref.shape[1]
    z0r, z0i = mixed(2 * mq)
    z1r, z1i = mixed(jnp.minimum(2 * mq + 1, num_m - 1))
    dr = z0r - z1i
    di = z0i + z1r
    cr, ci = _lane_dft(dr, di, w1r_ref[:], w1i_ref[:], conj=True)
    twr = twr_ref[:]
    twi = -twi_ref[:]
    er = cr * twr - ci * twi
    ei = cr * twi + ci * twr
    y0, y1 = _dit_stages(er, ei, mask_ref, str_ref, sti_ref, n2)
    window = fade_ref[:] * scale

    def emit(k, y, mic_idx):
        # Mosaic caps prng_seed at 2 words: fold the mic index into the
        # second scene word with a Weyl increment (distinct per mic,
        # full 64-bit scene entropy retained).
        seed = (seed_ref[0, 0, 0],
                seed_ref[0, 0, 1] + mic_idx * np.int32(-1640531527)
                ) if with_noise else None
        y = _render_postprocess(y[:n2_out] * window, out_samples, finalize,
                                seed, snr_ref)
        out_ref[0, k] = y

    emit(0, y0, 2 * mq)
    emit(1, y1, jnp.minimum(2 * mq + 1, num_m - 1))


def _render_postprocess(y, out_samples, finalize, noise_seed, snr_ref):
    """Per-mic finalize (normalize + log compression) and in-kernel
    measurement noise on a trimmed (n2_out, 128) render plane.

    ``noise_seed=None`` skips the noise stage (static); otherwise it is a
    tuple of TWO seed words (Mosaic's prng_seed limit): the scene key's
    first word and its second word offset by a per-mic Weyl increment —
    full 64-bit scene entropy, so per-mic/cross-scene streams cannot
    collide the way independently drawn 31-bit seeds could."""
    if finalize:
        # ops/signal.py semantics: peak-normalize, sign*log1p(|x|/0.8+1e-8),
        # re-peak-normalize; silent channels pass through.  The fade plane
        # is zero beyond out_samples, so the maxima ignore the padded tail.
        peak = jnp.max(jnp.abs(y))
        y = jnp.where(peak > 0, y / jnp.where(peak > 0, peak, 1.0), y)
        comp = jnp.sign(y) * jnp.log1p(jnp.abs(y) / 0.8 + 1e-8)
        cpeak = jnp.max(jnp.abs(comp))
        y = jnp.where(cpeak > 0,
                      comp / jnp.where(cpeak > 0, cpeak, 1.0), comp)
    if noise_seed is not None:
        # Additive white measurement noise at the scene SNR, generated by
        # the core PRNG (Box-Muller over hardware random bits) — the (M, N)
        # Gaussian tensor never exists in HBM.  A different (but equally
        # seeded-deterministic) stream than the XLA fallback's
        # jax.random.normal.
        n2_out = y.shape[0]
        rms = jnp.sqrt(jnp.sum(y * y) / out_samples)
        # 10**x as exp(x*ln10): Mosaic cannot legalize math.powf.
        sigma = rms * jnp.exp(-snr_ref[0, 0, 0] / 20.0 * np.log(10.0))
        pltpu.prng_seed(*noise_seed)
        # Mosaic has no uint32->f32 cast; go through int32 with logical
        # shifts (top 24 bits are a non-negative int32).
        b1 = jax.lax.shift_right_logical(
            pltpu.bitcast(pltpu.prng_random_bits((n2_out, _N1)),
                          jnp.int32), 8)
        b2 = jax.lax.shift_right_logical(
            pltpu.bitcast(pltpu.prng_random_bits((n2_out, _N1)),
                          jnp.int32), 8)
        # u1 in (0, 1]: top 24 bits + half-ulp offset keeps log finite.
        u1 = b1.astype(jnp.float32) * (2.0 ** -24) + 2.0 ** -25
        u2 = b2.astype(jnp.float32) * (2.0 ** -24)
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n2_out, _N1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n2_out, _N1), 1)
        valid = (rows * _N1 + cols) < out_samples
        y = y + jnp.where(valid, sigma * z, 0.0)
    return y


def bfly_render_eligible(nfft: int, num_mics: int, num_paths: int,
                         dtype) -> bool:
    """f32, nfft = 128*pow2, and the VMEM working set fits: base+out blocks
    (double-buffered) + one spectrum scratch + consts + stage temps."""
    if not available() or jnp.dtype(dtype) != jnp.float32:
        return False
    n2 = nfft // _N1
    if n2 * _N1 != nfft or n2 & (n2 - 1) or n2 < 8:
        return False
    vmem = (2 * nfft * 4 + 2 * nfft * 4 + 2 * nfft * 4
            + 4 * nfft * 4 + 10 * nfft * 4)
    return vmem <= 48 * 1024 * 1024


def bfly_delay_sum(base: jnp.ndarray, delays: jnp.ndarray, gains: jnp.ndarray,
                   fs: float, nfft: int, out_samples: int,
                   fade: Optional[jnp.ndarray] = None,
                   finalize: bool = False,
                   snr_db: Optional[jnp.ndarray] = None,
                   noise_seeds: Optional[jnp.ndarray] = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused multipath render.

    base (..., N) real, delays/gains (..., M, P) seconds / linear gain.
    Returns (..., M, out_samples): for each mic the sum of delayed, scaled
    copies of base (circular at ``nfft``), multiplied by ``fade`` (an
    (out_samples,) window; ones if None).  ``finalize=True`` additionally
    applies the per-mic peak-normalize + log compression in VMEM
    (models/simulator.render_scene's trailing stage).  With ``snr_db``
    ((...,) per-scene dB) and ``noise_seeds`` ((..., 2) int32 scene key
    words — e.g. the bitcast PRNGKey data), white measurement noise at
    that SNR is generated in-kernel from the core PRNG (seed words mixed
    with the mic index) and added before writeback.  Numerically matches
    ops/delay.delay_and_sum at pow2 padding up to float rounding."""
    lead = base.shape[:-1]
    n_samp = base.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    m, num_paths = delays.shape[-2:]
    n2 = nfft // _N1
    n2_out = -(-out_samples // _N1)
    x = base.reshape(b, n_samp)
    zero_top = _zero_top_ok(n_samp, nfft)
    in_rows = n2 // 2 if zero_top else n2
    if n_samp < in_rows * _N1:
        x = jnp.pad(x, ((0, 0), (0, in_rows * _N1 - n_samp)))
    x3 = x.reshape(b, in_rows, _N1)
    # Path delays travel in SAMPLES (separable ramp synthesis in-kernel).
    d3 = (delays * fs).reshape(b, m, num_paths).astype(jnp.float32)
    g3 = gains.reshape(b, m, num_paths).astype(jnp.float32)
    with_noise = snr_db is not None
    if with_noise:
        if noise_seeds is None:
            raise ValueError("snr_db requires noise_seeds")
        seeds = noise_seeds.reshape(b, 1, 2).astype(jnp.int32)
        snr = snr_db.reshape(b, 1, 1).astype(jnp.float32)
    else:
        seeds = jnp.zeros((b, 1, 2), jnp.int32)
        snr = jnp.zeros((b, 1, 1), jnp.float32)
    consts = [jnp.asarray(c) for c in _bfly_consts(nfft)]
    sgn, tnat = (jnp.asarray(c) for c in _ramp_consts(n2))
    fade_plane = jnp.zeros((n2_out, _N1), jnp.float32).reshape(-1).at[
        :out_samples].set(jnp.ones(out_samples, jnp.float32)
                          if fade is None else fade.astype(jnp.float32)
                          ).reshape(n2_out, _N1)
    kernel = functools.partial(_bfly_render_kernel, n2=n2, n2_out=n2_out,
                               num_paths=num_paths, out_samples=out_samples,
                               scale=1.0 / nfft, finalize=finalize,
                               with_noise=with_noise, zero_top=zero_top)

    def cspec2(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, q: (0,) * nd,
                            memory_space=pltpu.VMEM)

    mh = (m + 1) // 2
    out = pl.pallas_call(
        kernel,
        grid=(b, mh),
        in_specs=[pl.BlockSpec((1, m, num_paths), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, m, num_paths), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 2), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 1), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, in_rows, _N1), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  cspec2(fade_plane.shape), cspec2(sgn.shape),
                  cspec2(tnat.shape)] +
                 [cspec2(c.shape) for c in consts],
        out_specs=pl.BlockSpec((1, 2, n2_out, _N1),
                               lambda i, q: (i, q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * mh, n2_out, _N1),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((n2, _N1), jnp.float32),
                        pltpu.VMEM((n2, _N1), jnp.float32)],
        compiler_params=_BFLY_PARAMS,
        interpret=interpret,
    )(d3, g3, seeds, snr, x3, fade_plane, sgn, tnat, *consts)
    out = out[:, :m].reshape(b, m, n2_out * _N1)[..., :out_samples]
    return out.reshape(lead + (m, out_samples))


def bfly_fft_real_reference(x: jnp.ndarray):
    """Plain-jnp oracle for bfly_fft_real (tests / CPU)."""
    b, n = x.shape
    n2 = n // _N1
    mask_u, str_, sti, twr, twi, w1r, w1i = [
        jnp.asarray(c) for c in _bfly_consts(n)]
    xr = x.reshape(b, n2, _N1)
    xi = jnp.zeros_like(xr)

    def rollb(a, s):
        return jnp.roll(a, s, axis=1)

    h = n2 // 2
    for s in range(int(np.log2(n2))):
        mu, tr, ti = mask_u[s], str_[s], sti[s]
        ar = xr + rollb(xr, -h)
        ai = xi + rollb(xi, -h)
        dr = rollb(xr, h) - xr
        di = rollb(xi, h) - xi
        xr = jnp.where(mu > 0, ar, dr * tr - di * ti)
        xi = jnp.where(mu > 0, ai, dr * ti + di * tr)
        h //= 2
    cr = xr * twr - xi * twi
    ci = xr * twi + xi * twr
    yr = cr @ w1r - ci @ w1i
    yi = cr @ w1i + ci @ w1r
    return yr, yi
