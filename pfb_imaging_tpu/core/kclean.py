"""``kclean``: CLEAN deconvolution driver (reference core/kclean.py:23-441).

Clark (or Hogbom) minor cycle on the wsum-normalised cube + exact residual
major cycle through the measurement operator; optional mask; divergence
guarded by the peak-residual threshold loop.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..deconv.clark import clark
from ..deconv.hogbom import hogbom
from ..utils.logging import get_logger
from ..utils.store import TreeStore, require_complete
from .imager import residual_from_parts

log = get_logger("KCLEAN")


def kclean(
    dt_path,
    niter: int = 5,
    minor: str = "clark",
    gamma: float = 0.1,
    peak_factor: float = 0.15,
    sub_peak_factor: float = 0.75,
    minor_maxit: int = 50,
    subminor_maxit: int = 1000,
    threshold: float = 0.0,
    mask=None,
    epsilon: float = 1e-7,
    do_wgridding: bool = True,
    double_precision: bool = True,
):
    """Returns (model, residual). Progress checkpointed into the tree."""
    dt = TreeStore(dt_path, mode="w")
    require_complete(dt)
    attrs = dt.attrs
    nx, ny = attrs["nx"], attrs["ny"]
    nx_psf, ny_psf = attrs["nx_psf"], attrs["ny_psf"]
    band_nodes = [k for k in dt.groups() if k.startswith("band")]
    nband = len(band_nodes)

    wsums = np.zeros(nband)
    residual = np.zeros((nband, nx, ny))
    psf = np.zeros((nband, nx_psf, ny_psf))
    model = np.zeros((nband, nx, ny))
    for b, key in enumerate(band_nodes):
        node = dt.group(key)
        wsums[b] = float(np.asarray(node.read("WSUM"))[0])
        residual[b] = np.asarray(node.read("RESIDUAL" if node.has("RESIDUAL") else "DIRTY"))
        psf[b] = np.asarray(node.read("PSF"))
        if node.has("MODEL"):
            model[b] = np.asarray(node.read("MODEL"))
    wsum = wsums.sum()
    psfhat = np.abs(np.fft.rfft2(np.fft.ifftshift(psf / wsum, axes=(1, 2)), axes=(1, 2)))

    rmax0 = np.abs(residual.sum(axis=0) / wsum).max()
    for k in range(niter):
        if minor == "clark":
            dmodel, _, status = clark(
                jnp.asarray(residual / wsum),
                jnp.asarray(psf / wsum),
                jnp.asarray(psfhat),
                jnp.asarray(wsums / wsum),
                mask=None if mask is None else jnp.asarray(mask),
                gamma=gamma,
                pf=peak_factor,
                subpf=sub_peak_factor,
                maxit=minor_maxit,
                submaxit=subminor_maxit,
                threshold=threshold,
            )
        else:
            dmodel, _, status = hogbom(
                jnp.asarray(residual / wsum),
                jnp.asarray(psf / wsum),
                gamma=gamma,
                pf=peak_factor,
                maxit=subminor_maxit,
                threshold=threshold,
            )
        model = model + np.asarray(dmodel)

        for b, key in enumerate(band_nodes):
            node = dt.group(key)
            residual[b] = residual_from_parts(
                node, model[b], epsilon=epsilon, do_wgridding=do_wgridding, double_precision=double_precision
            )
        rmax = np.abs(residual.sum(axis=0) / wsum).max()
        rms = np.std(residual.sum(axis=0) / wsum)
        log.info("major %d: rmax=%.3e rms=%.3e", k + 1, rmax, rms)

        for b, key in enumerate(band_nodes):
            node = dt.group(key)
            node.write("MODEL", model[b])
            node.write("RESIDUAL", residual[b])
            node.set_attrs(niters=k + 1, rms=float(rms), rmax=float(rmax))

        if rmax < max(threshold, peak_factor * rmax0):
            log.info("reached threshold")
            break
    return model, residual
