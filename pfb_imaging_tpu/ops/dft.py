"""Explicit-DFT measurement operator.

The exact (no-approximation) degridder/gridder under the pinned phase
convention (see geometry.py docstring). Serves two roles:

1. The *oracle* every fast gridder is validated against — the same role the
   explicit DFT plays in the reference test suite
   (/root/reference/tests/test_hessian_approx.py:44-68).
2. A production path for small images / few visibilities: the phase matrix
   ``uvw_eff @ lmn^T`` is a dense matmul that maps straight onto the MXU,
   batched over row blocks to bound memory.

All functions are jittable with static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIGHTSPEED
from ..geometry import conventions_signs, lm_grid


def _lmn_pix(nx, ny, cellx, celly, l0, m0, dtype):
    ll, mm, nn = lm_grid(nx, ny, cellx, celly, l0, m0)
    lmn = np.stack([ll.ravel(), mm.ravel(), nn.ravel() - 1.0], axis=-1)
    return jnp.asarray(lmn, dtype=dtype), jnp.asarray(nn.ravel(), dtype=dtype)


def _uvw_eff(uvw, flip_u, flip_v, flip_w):
    su, sv, sw = conventions_signs(flip_u, flip_v, flip_w)
    # phase = su*u*l + sv*v*m - sw*w*(n-1); fold the -sw into the w column so
    # the phase is a plain inner product with (l, m, n-1)
    signs = jnp.asarray([su, sv, -sw], dtype=uvw.dtype)
    return uvw * signs[None, :]


@partial(jax.jit, static_argnames=("nx", "ny", "cellx", "celly", "l0", "m0", "flip_u", "flip_v", "flip_w", "divide_by_n", "row_block"))
def dirty2vis_dft(
    uvw,
    freq,
    image,
    *,
    nx: int,
    ny: int,
    cellx: float,
    celly: float,
    l0: float = 0.0,
    m0: float = 0.0,
    flip_u: bool = False,
    flip_v: bool = True,
    flip_w: bool = False,
    divide_by_n: bool = True,
    row_block: int = 512,
):
    """vis[r, f] = sum_pix I/n * exp(-2 pi j (su*u*l + sv*v*m - sw*w*(n-1)) * freq/c)."""
    rdtype = image.dtype
    cdtype = jnp.result_type(rdtype, jnp.complex64)
    lmn, nn = _lmn_pix(nx, ny, cellx, celly, l0, m0, rdtype)
    ieff = image.reshape(-1).astype(rdtype)
    if divide_by_n:
        ieff = jnp.where(nn > 0, ieff / nn, 0.0)

    uvw_e = _uvw_eff(uvw.astype(rdtype), flip_u, flip_v, flip_w)
    invlam = (freq.astype(rdtype) / LIGHTSPEED)[None, :, None]  # (1, nchan, 1)

    nrow = uvw.shape[0]
    pad = (-nrow) % row_block
    uvw_p = jnp.pad(uvw_e, ((0, pad), (0, 0)))

    def block(uvw_b):
        # (rb, npix) geometric phase in metres, MXU matmul
        a = uvw_b @ lmn.T
        # (rb, nchan, npix) phase in cycles
        ph = a[:, None, :] * invlam
        e = jnp.exp((-2j * jnp.pi) * ph.astype(cdtype))
        return e @ ieff.astype(cdtype)

    vis = jax.lax.map(block, uvw_p.reshape(-1, row_block, 3))
    return vis.reshape(-1, freq.shape[0])[:nrow]


@partial(jax.jit, static_argnames=("nx", "ny", "cellx", "celly", "l0", "m0", "flip_u", "flip_v", "flip_w", "divide_by_n", "row_block"))
def vis2dirty_dft(
    uvw,
    freq,
    vis,
    *,
    wgt=None,
    mask=None,
    nx: int,
    ny: int,
    cellx: float,
    celly: float,
    l0: float = 0.0,
    m0: float = 0.0,
    flip_u: bool = False,
    flip_v: bool = True,
    flip_w: bool = False,
    divide_by_n: bool = True,
    row_block: int = 512,
):
    """Exact adjoint of :func:`dirty2vis_dft` with optional weights/mask.

    dirty[p] = sum_{r,f} Re[ w*vis * exp(+2 pi j phase) ] / n_p
    """
    rdtype = jnp.real(vis).dtype
    cdtype = vis.dtype
    lmn, nn = _lmn_pix(nx, ny, cellx, celly, l0, m0, rdtype)

    wv = vis
    if wgt is not None:
        wv = wv * wgt.astype(rdtype)
    if mask is not None:
        wv = wv * mask.astype(rdtype)

    uvw_e = _uvw_eff(uvw.astype(rdtype), flip_u, flip_v, flip_w)
    invlam = (freq.astype(rdtype) / LIGHTSPEED)[None, :, None]

    nrow = uvw.shape[0]
    pad = (-nrow) % row_block
    uvw_p = jnp.pad(uvw_e, ((0, pad), (0, 0)))
    wv_p = jnp.pad(wv, ((0, pad), (0, 0)))

    def block(carry, xs):
        uvw_b, wv_b = xs
        a = uvw_b @ lmn.T
        ph = a[:, None, :] * invlam
        e = jnp.exp((2j * jnp.pi) * ph.astype(cdtype))
        contrib = jnp.real(jnp.einsum("rf,rfp->p", wv_b.astype(cdtype), e))
        return carry + contrib, None

    init = jnp.zeros(nx * ny, dtype=rdtype)
    acc, _ = jax.lax.scan(block, init, (uvw_p.reshape(-1, row_block, 3), wv_p.reshape(-1, row_block, vis.shape[1])))
    if divide_by_n:
        acc = jnp.where(nn > 0, acc / nn, 0.0)
    return acc.reshape(nx, ny)
