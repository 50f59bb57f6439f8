"""Minor-cycle preset factories (reference deconv/presets.py:24-152).

Where the reference assembles Ray facades (PsiNocopytRay/HessTreeRay over a
BandWorkerPool), here the same seams are assembled from pytree operators
and vmapped dictionaries — band distribution is a mesh-sharding concern
(parallel/), not a wiring concern.

Gotchas preserved: nu = len(bases) (design D3), total-wsum normalisation
with per-band eta scaling (design D4, inside HessianCube.build).
"""

from __future__ import annotations

import numpy as np

from ..ops.hessian import HessianCube
from ..ops.identity_psi import IdentityPsi
from ..ops.psi import Psi
from ..opt.forward_backward import ForwardBackward
from ..opt.pcg import PCG
from ..opt.primal_dual import PrimalDual
from ..prox.l1 import L1
from ..prox.l21 import L21
from ..prox.positivity import positivity_prox
from .pfb import PFBSolver

DEFAULT_OPTS = dict(
    bases="self,db1,db2",
    nlevels=2,
    eta=1e-5,
    gamma=1.0,
    hess_norm=None,
    rmsfactor=1.0,
    alpha=2.0,
    positivity=1,
    opt_backend="primal-dual",
    cg_tol=1e-3,
    cg_maxit=100,
    cg_minit=1,
    cg_verbose=0,
    pd_tol=1e-5,
    pd_maxit=1000,
    pd_verbose=0,
    fb_tol=1e-5,
    fb_maxit=1000,
    fb_verbose=0,
    acceleration=True,
    l1_reweight_from=5,
    pm_tol=1e-3,
    pm_maxit=100,
    verbosity=1,
)


def _opts_with_defaults(opts):
    merged = dict(DEFAULT_OPTS)
    merged.update(opts or {})
    return merged


def _build_hess(abspsfhat_per_band, wsums, geometry, opts, beam_per_band=None, mesh=None, transposed=False):
    """HessianCube with the legacy total-wsum normalisation (D4).

    ``mesh`` with a >1 'row' axis activates the row-sharded distributed-FFT
    matvec for 8k-class images (ops/hessian._hess_cube_dot_rowsharded)."""
    return HessianCube.build(
        abspsfhat_per_band,
        np.asarray(wsums, dtype=float),
        opts["eta"],
        geometry["nx_psf"],
        geometry["ny_psf"],
        beam=beam_per_band,
        mesh=mesh,
        transposed=transposed,
    )


def _build_backward(opts):
    pprox = positivity_prox(opts["positivity"])
    if opts["opt_backend"] == "primal-dual":
        return PrimalDual(
            tol=opts["pd_tol"],
            maxit=opts["pd_maxit"],
            verbosity=opts["pd_verbose"],
            gamma=opts["gamma"],
            primal_prox=pprox,
        )
    if opts["opt_backend"] == "forward-backward":
        return ForwardBackward(
            tol=opts["fb_tol"],
            maxit=opts["fb_maxit"],
            verbosity=opts["fb_verbose"],
            gamma=opts["gamma"],
            acceleration=opts["acceleration"],
            primal_prox=pprox,
        )
    raise ValueError(f"Unknown opt_backend '{opts['opt_backend']}'")


def _common_kwargs(model, update, opts):
    return dict(
        model=model,
        update=update,
        gamma=opts["gamma"],
        hessnorm=opts["hess_norm"],
        l1_reweight_from=opts["l1_reweight_from"],
        pm_tol=opts["pm_tol"],
        pm_maxit=opts["pm_maxit"],
        verbosity=opts["verbosity"],
    )


def make_sara(abspsfhat_per_band, wsums, geometry, model, update, opts=None, beam_per_band=None, mesh=None, transposed=False):
    """SARA: l21 over the wavelet dictionary, PD or FB backward.

    Args:
        abspsfhat_per_band: (nband, npart, nx_psf, ny_psf//2+1) |PSFHAT|.
        wsums: (nband,) raw per-band weight sums.
        geometry: dict with nx, ny, nx_psf, ny_psf.
        model, update: (nband, nx, ny) warm starts.
        opts: option overrides on DEFAULT_OPTS.
    """
    opts = _opts_with_defaults(opts)
    nband = model.shape[0]
    bases = tuple(opts["bases"]) if not isinstance(opts["bases"], str) else tuple(opts["bases"].split(","))
    psi = Psi(nband, geometry["nx"], geometry["ny"], bases=bases, nlevel=opts["nlevels"])
    # nu = ||Psi Psi^T|| = nbasis (D3) — the tight-frame default 1.0 makes
    # the PD dual step ~nbasis x too large and multi-band runs diverge
    reg = L21(psi, bases, nu=len(bases), rmsfactor=opts["rmsfactor"], alpha=opts["alpha"])
    hess = _build_hess(abspsfhat_per_band, wsums, geometry, opts, beam_per_band, mesh, transposed)
    fwd = PCG(tol=opts["cg_tol"], maxit=opts["cg_maxit"], minit=opts["cg_minit"], verbosity=opts["cg_verbose"])
    return PFBSolver(hess, fwd, _build_backward(opts), reg, **_common_kwargs(model, update, opts))


def make_ista(abspsfhat_per_band, wsums, geometry, model, update, opts=None, beam_per_band=None, mesh=None, transposed=False):
    """ISTA: image-domain l1, forward-backward without acceleration."""
    opts = _opts_with_defaults(opts)
    nband = model.shape[0]
    reg = L1(IdentityPsi(nband, geometry["nx"], geometry["ny"]))
    hess = _build_hess(abspsfhat_per_band, wsums, geometry, opts, beam_per_band, mesh, transposed)
    fwd = PCG(tol=opts["cg_tol"], maxit=opts["cg_maxit"], minit=opts["cg_minit"], verbosity=opts["cg_verbose"])
    bwd = ForwardBackward(
        tol=opts["fb_tol"],
        maxit=opts["fb_maxit"],
        verbosity=opts["fb_verbose"],
        gamma=opts["gamma"],
        acceleration=False,
        primal_prox=positivity_prox(opts["positivity"]),
    )
    return PFBSolver(hess, fwd, bwd, reg, **_common_kwargs(model, update, opts))


PRESETS = {"sara": make_sara, "ista": make_ista}
