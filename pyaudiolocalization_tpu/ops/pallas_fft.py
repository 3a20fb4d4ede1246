"""Pallas TPU FFT prototype: whole pow2 complex transforms in VMEM.

STATUS: math-validated prototype, NOT wired into production paths.  The
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
