"""Pallas TPU FFT prototype: whole pow2 complex transforms in VMEM.

STATUS: math-validated prototypes, NOT wired into production paths —
measured on v5e, neither formulation beats XLA's FFT (see below); kept as
documentation of the investigated design space.  The
four-step matmul formulation is exact (see tests/test_pallas_fft.py and
``fft_planes_reference``), and the VMEM-residency argument promises ~4x
over XLA's multi-pass FFT (one HBM read + write per 1 MB row), but Mosaic
currently rejects the in-kernel lane-dimension reshapes ((rows, n) ->
(rows, n2, r) with r = 64/32 trailing) with 'infer-vector-layout:
unsupported shape cast'.  Lowering it needs a layout-aware reformulation
(radix-128 trailing axis + left-matmuls over the sublane axis, or pltpu
primitives) — recorded in CLAUDE.md as the round-2 perf frontier.

XLA's TPU FFT runs multiple HBM passes; a 131072-point complex64 row is
only 1 MB as float32 planes, so the entire transform fits in VMEM and the
HBM traffic collapses to one read + one write per row.  Inside the kernel
the FFT is a recursive four-step (Cooley-Tukey N = N1*N2) whose N1=radix
stages are DFT MATMULS on the MXU:

    x.reshape(N2, N1) @ DFT_N1  ->  * twiddle(N2, N1)  ->  transpose
    ->  recurse over rows (length N2)  ->  natural-order readout

Complex data is carried as separate real/imag planes (the MXU has no
complex type; each complex matmul is 4 real ones).  Radices are 64/32 so
every matmul is MXU-shaped.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _plan(n: int):
    """Factor n into radix steps (each 64, last may be smaller)."""
    steps = []
    rest = n
    while rest > 64:
        steps.append(64)
        rest //= 64
    steps.append(rest)
    if np.prod(steps) != n:
        raise ValueError(f"cannot plan FFT length {n}")
    return steps


@functools.lru_cache(maxsize=16)
def _consts(n: int):
    """DFT matrices + twiddles for every recursion level (float32 numpy).

    With x viewed as (N2, N1) row-major (n = q*N1 + p, p fast):
      X[s*N2 + t] = sum_p W_N1^{ps} * W_N^{pt} * (sum_q x[q,p] W_N2^{qt})
    i.e. long DFT over q FIRST, twiddle T[p,t] = W_N^{pt} (shape (N1, N2)),
    then the radix-N1 DFT matmul, with transposed readout.
    """
    steps = _plan(n)
    mats = {}
    twids = []
    rest = n
    for r in steps[:-1]:
        n2 = rest // r
        if r not in mats:
            w = np.exp(-2j * np.pi * np.outer(np.arange(r), np.arange(r)) / r)
            mats[r] = (w.real.astype(np.float32), w.imag.astype(np.float32))
        t = np.exp(-2j * np.pi * np.outer(np.arange(r), np.arange(n2)) / rest)
        twids.append((t.real.astype(np.float32), t.imag.astype(np.float32)))
        rest = n2
    r = steps[-1]
    if r not in mats:
        w = np.exp(-2j * np.pi * np.outer(np.arange(r), np.arange(r)) / r)
        mats[r] = (w.real.astype(np.float32), w.imag.astype(np.float32))
    return steps, mats, twids


def _cmatmul(xr, xi, wr, wi):
    """(..., k) complex @ (k, k) complex as 4 real matmuls."""
    yr = xr @ wr - xi @ wi
    yi = xr @ wi + xi @ wr
    return yr, yi


def _const_list(n: int):
    """Flat constant list for length-n: per level (Wr, Wi, Tr, Ti), last
    level just (Wr, Wi)."""
    steps, mats, twids = _consts(n)
    flat = []
    for i, r in enumerate(steps):
        wr, wi = mats[r]
        flat.extend([wr, wi])
        if i < len(steps) - 1:
            tr, ti = twids[i]
            flat.extend([tr, ti])
    return steps, flat


def _fft_val(xr, xi, steps, consts):
    """FFT along the LAST axis of (..., n) value arrays; ``consts`` is the
    flat (Wr, Wi[, Tr, Ti]) list from _const_list (values, not refs)."""
    r = steps[0]
    wr, wi = consts[0], consts[1]
    if len(steps) == 1:
        return _cmatmul(xr, xi, wr, wi)
    n = xr.shape[-1]
    n2 = n // r
    lead = xr.shape[:-1]
    # (..., n) -> (..., n2, r): q slow, p fast.
    xr = xr.reshape(lead + (n2, r))
    xi = xi.reshape(lead + (n2, r))
    # Long DFT over q first: transpose to (..., r, n2) and recurse.
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    br, bi = _fft_val(xr, xi, steps[1:], consts[4:])  # B[p, t]
    tr, ti = consts[2], consts[3]                     # T[p, t] = W_N^{pt}
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # Radix DFT over p: transpose to (..., t, p), matmul with W_r.
    cr = jnp.swapaxes(cr, -1, -2)
    ci = jnp.swapaxes(ci, -1, -2)
    yr, yi = _cmatmul(cr, ci, wr, wi)                 # C[t, s]
    # Readout X[s*n2 + t]: transpose to (..., s, t) and flatten.
    yr = jnp.swapaxes(yr, -1, -2)
    yi = jnp.swapaxes(yi, -1, -2)
    return yr.reshape(lead + (n,)), yi.reshape(lead + (n,))


def fft_planes_reference(xr: jnp.ndarray, xi: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain-jnp evaluation of the kernel's math (used by tests and as the
    interpret-mode oracle): FFT along the last axis via matmul four-step."""
    n = xr.shape[-1]
    steps, flat = _const_list(n)
    return _fft_val(xr, xi, steps, [jnp.asarray(c) for c in flat])


def _fft_kernel(*refs, steps, n):
    xr_ref, xi_ref = refs[0], refs[1]
    const_refs = refs[2:-2]
    or_ref, oi_ref = refs[-2], refs[-1]
    consts = [c[:] for c in const_refs]
    rows = xr_ref.shape[0]
    xr = xr_ref[:].reshape(rows, n)
    xi = xi_ref[:].reshape(rows, n)
    yr, yi = _fft_val(xr, xi, steps, consts)
    or_ref[:] = yr.reshape(or_ref.shape)
    oi_ref[:] = yi.reshape(oi_ref.shape)


def fft_pallas(xr: jnp.ndarray, xi: jnp.ndarray, rows_per_block: int = 1,
               interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched complex FFT over the last axis of (B, N) float32 planes,
    one VMEM-resident kernel invocation per ``rows_per_block`` rows.

    Mosaic requires the trailing block dims to tile (8, 128), so each row
    ships as an (N/128, 128) plane and is flattened in-kernel.
    """
    b, n = xr.shape
    if b % rows_per_block:
        raise ValueError("batch not divisible by rows_per_block")
    if n % 128:
        raise ValueError("n must be a multiple of 128")
    steps, flat = _const_list(n)
    grid = (b // rows_per_block,)
    lanes = n // 128
    x3r = xr.reshape(b, lanes, 128)
    x3i = xi.reshape(b, lanes, 128)
    row_spec = pl.BlockSpec((rows_per_block, lanes, 128),
                            lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_fft_kernel, steps=tuple(steps), n=n)
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec] + [const_spec(c.shape) for c in flat],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct(x3r.shape, jnp.float32),
                   jax.ShapeDtypeStruct(x3i.shape, jnp.float32)),
        interpret=interpret,
    )(x3r, x3i, *[jnp.asarray(c) for c in flat])
    return yr.reshape(b, n), yi.reshape(b, n)


def available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Two-level permuted-basis FFT: NO in-kernel reshapes/transposes.
#
# View a length-N row as x2d[p, q] = x[p*N2 + q] (host reshape, N1=128 rows).
# With the output index split k = t*N1 + s:
#
#   Xp[s, t] = sum_q W_N2^{qt} * W_N^{qs} * (sum_p x2d[p, q] W_N1^{ps})
#
# i.e. LEFT matmul (W_N1^T @ x2d) -> elementwise twiddle W_N^{qs} ->
# RIGHT matmul (@ W_N2) — three Mosaic-friendly ops.  The result is the DFT
# in a PERMUTED bin order (Xp[s, t] = X[t*N1 + s]); the inverse kernel
# consumes the same layout, so correlation pipelines (fft -> elementwise
# whiten -> ifft) never need the permutation materialized.
#
# MEASURED (v5e, 64 rows of 131072): 137 ms vs XLA's 7.3 ms — the
# (N2, N2) right-matmul inflates flops ~45x over a true FFT and the MXU
# sits at <1% utilization at M=128, so VMEM residency cannot save it; MXU
# default precision also costs ~3e-3 relative error.  Conclusion recorded
# in CLAUDE.md: matmul-FFTs are a dead end; a competitive Pallas FFT needs
# genuine log-N butterfly stages, which Mosaic's layout rules currently
# reject ('unsupported shape cast' on lane reshapes).
# ---------------------------------------------------------------------------

_N1 = 128


@functools.lru_cache(maxsize=8)
def _consts2l(n: int, inverse: bool):
    n2 = n // _N1
    sgn = 2j * np.pi / n if inverse else -2j * np.pi / n
    w1 = np.exp(sgn * n2 * np.outer(np.arange(_N1), np.arange(_N1)))  # W_N1
    w2 = np.exp(sgn * _N1 * np.outer(np.arange(n2), np.arange(n2)))   # W_N2
    tw = np.exp(sgn * np.outer(np.arange(_N1), np.arange(n2)))        # W_N^{sq}
    f32 = np.float32
    return (w1.T.real.astype(f32), w1.T.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32),
            w2.real.astype(f32), w2.imag.astype(f32))


def _fft2l_kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
                  w2r_ref, w2i_ref, or_ref, oi_ref):
    xr = xr_ref[0]
    xi = xi_ref[0]
    w1r, w1i = w1r_ref[:], w1i_ref[:]
    ar = w1r @ xr - w1i @ xi          # A[s, q] = sum_p W_N1^{ps} x[p, q]
    ai = w1r @ xi + w1i @ xr
    twr, twi = twr_ref[:], twi_ref[:]
    br = ar * twr - ai * twi          # B[s, q] = A * W_N^{qs}
    bi = ar * twi + ai * twr
    w2r, w2i = w2r_ref[:], w2i_ref[:]
    or_ref[0] = br @ w2r - bi @ w2i   # Xp[s, t] = sum_q B W_N2^{qt}
    oi_ref[0] = br @ w2i + bi @ w2r


def _ifft2l_kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
                   w2r_ref, w2i_ref, or_ref, oi_ref):
    # Mirror of the forward: RIGHT matmul over t, twiddle, LEFT over s.
    xr = xr_ref[0]
    xi = xi_ref[0]
    w2r, w2i = w2r_ref[:], w2i_ref[:]
    ar = xr @ w2r - xi @ w2i          # D[s, q] = sum_t Xp[s, t] W_N2^{-qt}
    ai = xr @ w2i + xi @ w2r
    twr, twi = twr_ref[:], twi_ref[:]
    br = ar * twr - ai * twi          # * W_N^{-qs}
    bi = ar * twi + ai * twr
    w1r, w1i = w1r_ref[:], w1i_ref[:]
    or_ref[0] = w1r @ br - w1i @ bi   # x[p, q] = sum_s W_N1^{-ps} ...
    oi_ref[0] = w1r @ bi + w1i @ br


def fft2l_pallas(xr: jnp.ndarray, xi: jnp.ndarray, inverse: bool = False,
                 interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permuted-basis DFT of (B, N) float32 planes (see module comment).

    Returns planes of shape (B, N1=128, N2=N/128) holding Xp[s, t] =
    X[t*128 + s] (forward) or the unnormalized inverse of a spectrum given
    in that same layout (divide by N for the true inverse).  Input for the
    forward is the natural row reshaped to (128, N/128); for the inverse it
    is a permuted-layout spectrum.
    """
    b = xr.shape[0]
    if xr.ndim == 2:
        n = xr.shape[-1]
        x3r = xr.reshape(b, _N1, n // _N1)
        x3i = xi.reshape(b, _N1, n // _N1)
    else:
        x3r, x3i = xr, xi
    n2 = x3r.shape[-1]
    n = _N1 * n2
    consts = [jnp.asarray(c) for c in _consts2l(n, inverse)]
    row_spec = pl.BlockSpec((1, _N1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _ifft2l_kernel if inverse else _fft2l_kernel,
        grid=(b,),
        in_specs=[row_spec, row_spec] + [cspec(c.shape) for c in consts],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct(x3r.shape, jnp.float32),
                   jax.ShapeDtypeStruct(x3i.shape, jnp.float32)),
        interpret=interpret,
    )(x3r, x3i, *consts)


def permuted_to_natural(xp: jnp.ndarray) -> jnp.ndarray:
    """(B, 128, N2) permuted layout -> (B, N) natural bin order."""
    b, n1, n2 = xp.shape
    return jnp.swapaxes(xp, -1, -2).reshape(b, n1 * n2)


def natural_to_permuted(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N) natural order -> (B, 128, N2) permuted spectrum layout."""
    b, n = x.shape
    return jnp.swapaxes(x.reshape(b, n // _N1, _N1), -1, -2)
