"""Pallas TPU kernels for the hot elementwise stages.

The GCC-PHAT pipeline is FFT-bound on its transforms (XLA's FFT) but the
phase-whitening stage between them — ``R / (|R| + eps)`` over (pairs, bins)
complex spectra (reference: utils.py:116-117) — is pure VPU work that we fuse
into one VMEM-resident kernel over the real/imag planes.  A jnp fallback with
identical semantics is used off-TPU and in interpret-mode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _whiten_kernel(re_ref, im_ref, out_re_ref, out_im_ref, *, eps: float):
    re = re_ref[:]
    im = im_ref[:]
    inv = 1.0 / (jnp.sqrt(re * re + im * im) + eps)
    out_re_ref[:] = re * inv
    out_im_ref[:] = im * inv


def phat_whiten_planes(re: jnp.ndarray, im: jnp.ndarray, eps: float = 1e-10,
                       interpret: bool = False):
    """Whiten a cross-spectrum given as separate real/imag planes of shape
    (rows, bins).  Returns (re', im') with unit magnitude per bin (+eps)."""
    rows, bins = re.shape
    block_rows = min(8, rows)
    block_bins = min(512, _round_up(bins, 128))
    grid = (pl.cdiv(rows, block_rows), pl.cdiv(bins, block_bins))
    spec = lambda: pl.BlockSpec(
        (block_rows, block_bins),
        lambda i, j: (i, j),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_whiten_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(), spec()],
        out_specs=(spec(), spec()),
        out_shape=(jax.ShapeDtypeStruct(re.shape, re.dtype),
                   jax.ShapeDtypeStruct(im.shape, im.dtype)),
        interpret=interpret,
    )(re, im)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def whiten_available(x: jnp.ndarray) -> bool:
    """Whether the Pallas path applies: TPU backend and fp32 data."""
    if not _HAS_PALLAS:
        return False
    if x.dtype != jnp.float32:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
