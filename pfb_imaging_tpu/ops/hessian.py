"""Hessian approximations of the measurement operator (reference operators/hessian.py).

Three tiers, matching the reference:
  * ``hessian_vis``       — exact vis-space Hessian `B^T G^T W G B x (+ eta x)`
                            via a full degrid/grid round trip
                            (reference hessian.py:15-100).
  * ``hessian_psf``       — FFT PSF-convolution approximation
                            (reference hessian.py:103-175).
  * ``hess_direct``       — tapered direct Hessian and its pointwise inverse,
                            used as a cheap preconditioner
                            (reference hessian.py:178-248).
  * ``hessian_tree_dot``  — sum-over-partitions PSF Hessian
                            `H x = (1/wsum) Σ_p B_pᵀ(PSF_p ⊛ (B_p x)) + ηx`
                            (reference hessian.py:439-522, HessianTree).

All are pure jittable functions; the band axis is vmapped/sharded by callers
(parallel/ module) instead of living in Ray band workers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .gridder import WGridderPlan, dirty2vis, vis2dirty
from .psf import psf_convolve


def hessian_vis(plan: WGridderPlan, x, wgt=None, mask=None, beam=None, eta: float = 0.0, wsum=None):
    """Exact vis-space Hessian on one image slice.

    The plan must be built with ``divide_by_n=False`` (reference
    hessian_slice uses divide_by_n=False on both legs, hessian.py:49,76).
    """
    xin = x if beam is None else x * beam
    mvis = dirty2vis(plan, xin, mask=mask)
    conv = vis2dirty(plan, mvis, wgt=wgt, mask=mask)
    if wsum is not None:
        conv = conv / wsum
    if beam is not None:
        conv = conv * beam
    if eta:
        conv = conv + eta * x
    return conv


def hessian_psf(x, abspsfhat, nx_psf: int, ny_psf: int, beam=None, eta: float = 0.0):
    """Tikhonov-regularised FFT PSF Hessian: beam * (|PSFHAT| conv (beam*x)) + eta*x."""
    xin = x if beam is None else x * beam
    out = psf_convolve(xin, abspsfhat, nx_psf, ny_psf)
    if beam is not None:
        out = out * beam
    if eta:
        out = out + eta * x
    return out


def hess_direct(x, abspsfhat, taperxy, nx_psf: int, ny_psf: int, eta: float = 1.0, mode: str = "forward"):
    """Tapered direct Hessian (mode='forward') or its inverse (mode='backward').

    ``eta`` is relative to wsum (the PSF peak), as in the reference
    (hessian.py:210-248). x: (..., nx, ny).
    """
    nx, ny = x.shape[-2], x.shape[-1]
    xhat = jnp.fft.rfft2(x * taperxy, s=(nx_psf, ny_psf), axes=(-2, -1))
    if mode == "forward":
        xhat = xhat * (abspsfhat + eta)
    else:
        xhat = xhat / (abspsfhat + eta)
    big = jnp.fft.irfft2(xhat, s=(nx_psf, ny_psf), axes=(-2, -1))
    return big[..., :nx, :ny] * taperxy


def hessian_tree_dot(x, abspsfhat_parts, beam_parts, wsum, nx_psf: int, ny_psf: int, eta: float = 0.0):
    """Sum-over-partitions PSF Hessian for one band image.

    Args:
        x: (nx, ny) image.
        abspsfhat_parts: (npart, nx_psf, ny_psf//2+1) |PSFHAT| per partition.
        beam_parts: (npart, nx, ny) primary beam per partition (or None).
        wsum: normalisation (the caller passes TOTAL wsum across bands to
            match the legacy total-normalised convention — design D4).
        eta: Tikhonov parameter.
    """

    def one(abspsfhat, beam):
        xin = x if beam is None else x * beam
        out = psf_convolve(xin, abspsfhat, nx_psf, ny_psf)
        return out if beam is None else out * beam

    if beam_parts is None:
        terms = jax.vmap(lambda ph: one(ph, None))(abspsfhat_parts)
    else:
        terms = jax.vmap(one)(abspsfhat_parts, beam_parts)
    out = jnp.sum(terms, axis=0) / wsum
    if eta:
        out = out + eta * x
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["abspsfhat", "beam", "wsum_tot", "eta_b"],
    meta_fields=["nx_psf", "ny_psf", "mesh", "row_axis", "band_axis"],
)
@dataclasses.dataclass(frozen=True)
class HessianCube:
    """Cube-level sum-over-partitions PSF Hessian, a registered pytree.

    The TPU-native replacement for the reference's per-band ``HessianTree``
    actors behind ``HessTreeRay`` (hessian.py:439-615): the band axis is a
    leading array axis (vmapped here; shard it over a mesh axis in
    parallel/), and the object itself is a pytree so jitted solvers take it
    as a traced argument (no baked-in constants, stable jit caches).

    Conventions preserved (design D4): normalisation by the TOTAL wsum
    across bands, per-band ``eta_b = eta * wsum_b / wsum_tot``.

    Image-axis sharding (round 3, VERDICT #4 / SURVEY §5.7): built with a
    ``mesh`` whose ``row_axis`` is >1-way, the matvec runs the distributed
    rfft2 of parallel/fft.py under a shard_map over (band, row): each
    device holds 1/d of each padded grid's rows and the only communication
    is the two all_to_alls of the transpose, riding ICI. ``abspsfhat`` is
    then stored in the TRANSPOSED PADDED layout of
    :func:`parallel.fft.psfhat_transposed` — (nband, npart, nyh_p, nx_psf).

    Fields:
        abspsfhat: (nband, npart, nx_psf, ny_psf//2+1) |PSFHAT| per
            partition (transposed layout when mesh-sharded, see above).
        beam: (nband, npart, nx, ny) or None.
        wsum_tot: scalar total weight across bands/partitions.
        eta_b: (nband,) per-band Tikhonov parameters.
    """

    nx_psf: int
    ny_psf: int
    abspsfhat: jnp.ndarray
    beam: jnp.ndarray | None
    wsum_tot: jnp.ndarray
    eta_b: jnp.ndarray
    mesh: object = None  # jax.sharding.Mesh (hashable) or None
    row_axis: str = "row"
    band_axis: str = "band"

    @classmethod
    def build(
        cls,
        abspsfhat,
        wsums,
        eta: float,
        nx_psf: int,
        ny_psf: int,
        beam=None,
        mesh=None,
        row_axis: str = "row",
        band_axis: str = "band",
        transposed: bool = False,
    ):
        """wsums: (nband,) per-band wsum; eta scaled per band by wsum share.

        ``mesh``: activate the row-sharded matvec when its ``row_axis`` is
        larger than 1 (``transposed=True`` says abspsfhat is already in the
        psfhat_transposed layout, e.g. band-streamed onto shards)."""
        wsums = jnp.asarray(wsums)
        wsum_tot = jnp.sum(wsums)
        eta_b = eta * wsums / wsum_tot
        if mesh is not None and dict(mesh.shape).get(row_axis, 1) > 1:
            if beam is not None:
                raise NotImplementedError(
                    "row-sharded HessianCube with per-partition beams: pad the "
                    "beams into the convolution or use the unsharded path"
                )
            if not transposed:
                from ..parallel.fft import psfhat_transposed

                abspsfhat = psfhat_transposed(abspsfhat, dict(mesh.shape)[row_axis])
        else:
            mesh = None
        return cls(
            nx_psf=nx_psf,
            ny_psf=ny_psf,
            abspsfhat=jnp.asarray(abspsfhat),
            beam=None if beam is None else jnp.asarray(beam),
            wsum_tot=wsum_tot,
            eta_b=eta_b,
            mesh=mesh,
            row_axis=row_axis,
            band_axis=band_axis,
        )

    def dot(self, x):
        return hess_cube_dot(self, x)

    def hdot(self, x):
        return hess_cube_dot(self, x)

    def dot_partial(self):
        """The matvec as a traced-pytree callable: the cube's arrays travel
        as jit arguments rather than baked-in constants."""
        return jax.tree_util.Partial(hess_cube_dot, self)


def hess_cube_dot(h: HessianCube, x):
    """Pure jittable cube Hessian matvec; pass via jax.tree_util.Partial."""
    if h.mesh is not None:
        return _hess_cube_dot_rowsharded(h, x)

    def band(ph, bm, eta, xb):
        return hessian_tree_dot(xb, ph, bm, h.wsum_tot, h.nx_psf, h.ny_psf) + eta * xb

    if h.beam is None:
        return jax.vmap(lambda ph, eta, xb: band(ph, None, eta, xb))(h.abspsfhat, h.eta_b, x)
    return jax.vmap(band)(h.abspsfhat, h.beam, h.eta_b, x)


def _hess_cube_dot_rowsharded(h: HessianCube, x):
    """(band, row)-sharded cube matvec: each device owns 1/r of every
    padded grid's rows for its 1/b of the bands; the distributed rfft2's
    two all_to_alls are the only communication (parallel/fft.py; the
    reference instead pays full 2x-padded single-node FFTs per band per
    CG iteration, hessian.py:484-485)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.fft import psf_convolve_local

    mesh = h.mesh
    bname, rname = h.band_axis, h.row_axis
    nband, nx, ny = x.shape
    bsz = dict(mesh.shape).get(bname, 1)
    nb_loc = nband // bsz
    npart = h.abspsfhat.shape[1]
    nxp, nyp = h.nx_psf, h.ny_psf

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(bname, rname, None), P(bname, None, rname, None)),
        out_specs=P(bname, rname, None),
        check_vma=False,
    )
    def _conv(xp_s, ph_s):
        outs = []
        for b in range(nb_loc):
            acc = None
            for p in range(npart):
                o = psf_convolve_local(xp_s[b], ph_s[b, p], rname, nxp, nyp)
                acc = o if acc is None else acc + o
            outs.append(acc)
        return jnp.stack(outs)

    xp = jnp.zeros((nband, nxp, nyp), x.dtype).at[:, :nx, :ny].set(x)
    out = _conv(xp, h.abspsfhat)[:, :nx, :ny] / h.wsum_tot
    return out + h.eta_b[:, None, None] * x
