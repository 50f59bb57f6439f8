"""Mesh-sharded 2D real FFT + PSF convolution (the 8k-image axis).

The reference pays a full psf_oversize-padded FFT per CG iteration per band
on one node (reference operators/hessian.py:484-485); at 8k images the
padded grid is 16k x 16k and SURVEY §5.7 flags this as the make-or-break
scaling axis. The TPU-native answer: shard the padded grid's rows over a
mesh axis and run the classic distributed-FFT dance —

    rows sharded: local rfft along y
      -> all_to_all (transpose: shard y, gather x)
    cols sharded: local fft along x
      -> pointwise * |PSFHAT| in the TRANSPOSED layout
    inverse: ifft along x -> all_to_all back -> irfft along y

Each device holds 1/d of the padded grid; the only communication is the
two all_to_alls, which ride ICI. The half-spectrum axis (ny//2+1) is
zero-padded to a multiple of the shard count; psfhat is stored pre-padded
and pre-transposed so the convolution is a local elementwise multiply.

All entry points are *local* functions meant to be called INSIDE a
``shard_map`` over the mesh axis (see ``psf_convolve_sharded`` for the
wrapper), so they compose with band-axis sharding and whole-solver jits.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = [
    "psfhat_transposed",
    "rfft2_t_local",
    "irfft2_t_local",
    "psf_convolve_local",
    "psf_convolve_sharded",
    "hessian_psf_sharded",
]


def _nyh_padded(ny_psf: int, d: int) -> int:
    nyh = ny_psf // 2 + 1
    return ((nyh + d - 1) // d) * d


def psfhat_transposed(abspsfhat: np.ndarray, d: int):
    """|PSFHAT| (..., nx_psf, nyh) -> transposed padded (..., nyh_p, nx_psf).

    Host-side, once per dataset: the sharded convolution multiplies in the
    transposed layout, sharded along the (padded) half-spectrum axis.
    """
    nyh = abspsfhat.shape[-1]
    nyh_p = _nyh_padded((nyh - 1) * 2, d)
    pad = [(0, 0)] * (abspsfhat.ndim - 2) + [(0, 0), (0, nyh_p - nyh)]
    padded = np.pad(np.asarray(abspsfhat), pad)
    return np.swapaxes(padded, -1, -2)  # (..., nyh_p, nx_psf)


def rfft2_t_local(x_rows, axis_name: str, nx_psf: int, ny_psf: int):
    """Local leg of the sharded rfft2, returning the TRANSPOSED spectrum.

    x_rows: (nx_psf/d, ny_psf) — this shard's rows of the padded input.
    Returns (nyh_p/d, nx_psf): this shard's rows of the padded transposed
    half-spectrum.
    """
    d = jax.lax.axis_size(axis_name)
    nyh_p = _nyh_padded(ny_psf, d)
    xh = jnp.fft.rfft(x_rows, n=ny_psf, axis=1)  # (nx/d, nyh)
    xh = jnp.pad(xh, ((0, 0), (0, nyh_p - xh.shape[1])))
    # split the y-spectrum axis over the mesh, gather the x axis
    # (all_to_all removes the split axis and inserts the source-device
    # axis at concat_axis)
    xh = xh.reshape(x_rows.shape[0], d, nyh_p // d)
    xh = jax.lax.all_to_all(xh, axis_name, split_axis=1, concat_axis=0, tiled=False)
    # (d, nx/d, nyh_p/d): source-major row order == global x order
    xh = xh.reshape(nx_psf, nyh_p // d).T
    return jnp.fft.fft(xh, axis=1)  # (nyh_p/d, nx)


def irfft2_t_local(yh_t, axis_name: str, nx_psf: int, ny_psf: int):
    """Inverse of :func:`rfft2_t_local` (1/N convention of irfft2).

    yh_t: (nyh_p/d, nx_psf) transposed spectrum shard.
    Returns (nx_psf/d, ny_psf) rows of the padded spatial result.
    """
    d = jax.lax.axis_size(axis_name)
    nyh = ny_psf // 2 + 1
    nyh_p = _nyh_padded(ny_psf, d)
    yh = jnp.fft.ifft(yh_t, axis=1)  # (nyh_p/d, nx)
    yh = yh.T.reshape(d, nx_psf // d, nyh_p // d)
    yh = jax.lax.all_to_all(yh, axis_name, split_axis=0, concat_axis=2, tiled=False)
    # (nx/d, nyh_p/d, d): source-device axis last; global y = src*chunk+loc
    yh = yh.transpose(0, 2, 1).reshape(nx_psf // d, nyh_p)[:, :nyh]
    return jnp.fft.irfft(yh, n=ny_psf, axis=1)


def psf_convolve_local(x_rows, abspsfhat_t_rows, axis_name: str, nx_psf: int, ny_psf: int):
    """PSF ⊛ x for one shard of rows inside a shard_map.

    x_rows: (nx_psf/d, ny_psf) padded input rows (caller pads/crops the
    image); abspsfhat_t_rows: (nyh_p/d, nx_psf) transposed |PSFHAT| shard.
    """
    spec = rfft2_t_local(x_rows, axis_name, nx_psf, ny_psf)
    return irfft2_t_local(spec * abspsfhat_t_rows, axis_name, nx_psf, ny_psf)


def _pad_rows_spec(mesh: Mesh, axis: str):
    return NamedSharding(mesh, P(axis, None))


def psf_convolve_sharded(mesh: Mesh, x, abspsfhat_t, nx: int, ny: int, nx_psf: int, ny_psf: int, axis: str = "row"):
    """Convolve an (nx, ny) image with the PSF, rows sharded over ``axis``.

    ``x`` is the unpadded image; padding to (nx_psf, ny_psf), the forward/
    inverse sharded FFTs and the crop all happen under one shard_map.
    ``abspsfhat_t`` is the pre-transposed padded spectrum from
    :func:`psfhat_transposed`, sharded along its first axis.
    """
    d = mesh.shape[axis]
    if nx_psf % d or _nyh_padded(ny_psf, d) % d:
        raise ValueError(f"nx_psf={nx_psf} must divide by the {d}-way '{axis}' mesh axis")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def _conv(xp_rows, ph_rows):
        out = psf_convolve_local(xp_rows, ph_rows, axis, nx_psf, ny_psf)
        return out

    xp = jnp.zeros((nx_psf, ny_psf), x.dtype).at[:nx, :ny].set(x)
    out = _conv(xp, abspsfhat_t)
    return out[:nx, :ny]


def hessian_psf_sharded(mesh: Mesh, x, abspsfhat_t, nx_psf: int, ny_psf: int, beam=None, eta: float = 0.0, axis: str = "row"):
    """Row-sharded Tikhonov PSF Hessian: beam*(|PSFHAT| ⊛ (beam*x)) + eta*x.

    The sharded analogue of ops.hessian.hessian_psf for 8k-class images
    (reference hessian.py:103-175 / 484-485)."""
    nx, ny = x.shape[-2], x.shape[-1]
    xin = x if beam is None else x * beam
    out = psf_convolve_sharded(mesh, xin, abspsfhat_t, nx, ny, nx_psf, ny_psf, axis=axis)
    if beam is not None:
        out = out * beam
    if eta:
        out = out + eta * x
    return out
