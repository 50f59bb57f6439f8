"""``deconv``: the composable PFB major cycle on a .dt tree
(reference core/deconv.py:22-403).

Behaviour preserved from the reference:
  * lambda schedule: ``lam = (init_factor if iter0==0 and k==0 else 1)
    * rmsfactor * rms`` (design D5, core/deconv.py:230);
  * checkpoint/resume through the tree: band nodes carry niters/rms/rmax/
    hess_norm attrs and MODEL/UPDATE/MODEL_BEST arrays, reruns warm-start
    (core/deconv.py:150-170, SURVEY.md §5.4);
  * divergence counter: consecutive (rms up AND rmax up) terminates
    (core/deconv.py:383-387); best-model tracking keeps the lowest-rms
    model (core/deconv.py:340-342);
  * component-model fit to .mds + model re-evaluation from the fit each
    cycle (core/deconv.py:238-305);
  * hess_norm cached in attrs to skip the power method on resume.
"""

from __future__ import annotations

import numpy as np

from ..deconv.presets import PRESETS
from ..utils.logging import get_logger
from ..utils.modelspec import eval_coeffs_to_cube, fit_image_cube, save_mds
from ..utils.store import TreeStore, require_complete
from .imager import residual_from_parts, residual_from_parts_multiband

log = get_logger("DECONV")


def deconv(
    dt_path,
    preset: str = "sara",
    niter: int = 5,
    rmsfactor: float = 1.0,
    init_factor: float = 1.0,
    gamma: float = 1.0,
    eta: float = 1e-5,
    bases: str = "self,db1,db2",
    nlevels: int = 2,
    positivity: int = 1,
    cg_tol: float = 1e-4,
    cg_maxit: int = 100,
    pd_tol: float = 1e-5,
    pd_maxit: int = 500,
    l1_reweight_from: int = 5,
    fit_mds: bool = True,
    nbasisf: int | None = None,
    epsilon: float = 1e-7,
    do_wgridding: bool = True,
    diverge_count: int = 3,
    double_precision: bool = True,
    hess_norm: float | None = None,
    opts_extra: dict | None = None,
    use_mesh: bool = True,
    row_shard_above: int = 8192,
):
    """Run the major cycle in place on the tree. Returns (model, residual)."""
    import jax.numpy as jnp

    from ..parallel.multihost import (
        allsum as mh_allsum,
        barrier as mh_barrier,
        host_gather,
        is_multihost,
        process_count as jax_pc,
        process_index as jax_pi,
    )

    multihost = is_multihost()
    dt = TreeStore(dt_path, mode="w")
    require_complete(dt)
    attrs = dt.attrs
    nx, ny = attrs["nx"], attrs["ny"]
    nx_psf, ny_psf = attrs["nx_psf"], attrs["ny_psf"]
    # nodes are band####_time####; the solver treats every (band, time)
    # slice uniformly along the cube's leading axis (the reference's v1
    # deconv asserted single-time, core/deconv.py:105-112 — lifted here)
    band_nodes = [k for k in dt.groups() if k.startswith("band")]
    nband_f = int(attrs["nband"])
    ntime = int(attrs.get("ntime", 1))
    nband = len(band_nodes)
    assert nband == nband_f * ntime, f"{nband} nodes != nband {nband_f} x ntime {ntime}"
    node_times = []
    node_freqs = []
    freq_attr = np.asarray(attrs["freq_out"], dtype=float)
    for key in band_nodes:
        na = dt.group(key).attrs
        node_times.append(float(na.get("time_out", 0.0)))
        node_freqs.append(float(na.get("freq_out", freq_attr.ravel()[0])))
    freq_out = np.asarray(node_freqs)

    # driver holds only image-scale cubes (design D10)
    wsums = np.zeros(nband)
    residual = np.zeros((nband, nx, ny))
    model = np.zeros((nband, nx, ny))
    update = np.zeros((nband, nx, ny))
    abspsfhat = []
    beams = []
    iter0 = 0
    for b, key in enumerate(band_nodes):
        node = dt.group(key)
        wsums[b] = float(np.asarray(node.read("WSUM"))[0])
        name = "RESIDUAL" if node.has("RESIDUAL") else "DIRTY"
        residual[b] = np.asarray(node.read(name))
        if node.has("MODEL"):
            model[b] = np.asarray(node.read("MODEL"))
        if node.has("UPDATE"):
            update[b] = np.asarray(node.read("UPDATE"))
        iter0 = max(iter0, int(node.attrs.get("niters", 0)))

        # per-partition |PSFHAT| loader (abs taken at load, reference
        # band_worker.py:95) — invoked lazily so the meshed path can stream
        # each band straight onto its shard (round-1 VERDICT weak #8: the
        # driver-side full stack is hundreds of GB at 8k/16-band scale)
        def _ph_loader(node=node):
            parts_ = node.groups()
            if parts_:
                return np.stack([np.abs(np.asarray(node.group(p).read("PSFHAT"))) for p in parts_])
            return np.abs(np.asarray(node.read("PSFHAT")))[None]

        abspsfhat.append(_ph_loader)
        parts = node.groups()
        # per-partition primary beams -> the Hessian's B^T ... B
        # (reference HessianTree beam argument; round-1 always ran beam=None)
        if parts and all(node.group(p).has("BEAM") for p in parts):
            beams.append(np.stack([np.asarray(node.group(p).read("BEAM")) for p in parts]))
        else:
            beams.append(None)

    hess_mesh = None
    transposed = False
    if use_mesh:
        import jax as _jax
        from jax.sharding import PartitionSpec as _P

        from ..parallel.fft import psfhat_transposed
        from ..parallel.mesh import make_mesh, stream_band_stack

        ndev = len(_jax.devices())
        band_size = ndev
        while nband % band_size:
            band_size -= 1
        # devices the band axis cannot absorb shard the IMAGE rows when the
        # padded FFT grid is large enough to matter (SURVEY §5.7 8k axis)
        row_size = 1
        if nx_psf >= row_shard_above and band_size < ndev:
            row_size = ndev // band_size
            while row_size > 1 and nx_psf % row_size:
                row_size -= 1
        if multihost:
            # interleave devices by process so every host owns bands and
            # the band axis spans DCN (parallel/multihost.spanning_devices)
            from ..parallel.multihost import spanning_devices

            mesh = make_mesh(
                band=band_size, row=row_size,
                devices=spanning_devices(band_size * row_size),
            )
        else:
            mesh = make_mesh(band=band_size, row=row_size)
        if row_size > 1 and all(bm is None for bm in beams):
            # stream each band's |PSFHAT| straight into the transposed
            # padded row-sharded layout the distributed FFT consumes
            hess_mesh = mesh
            transposed = True
            loaders_t = [
                (lambda ld=ld: psfhat_transposed(ld(), row_size)) for ld in abspsfhat
            ]
            ph0 = loaders_t[0]()
            abspsfhat = stream_band_stack(
                mesh, loaders_t, ph0.shape, ph0.dtype, spec=_P("band", None, "row", None)
            )
            log.info("row-sharded PSF Hessian: %d-way image rows x %d-way bands", row_size, band_size)
        else:
            ph0 = abspsfhat[0]()
            abspsfhat = stream_band_stack(mesh, abspsfhat, ph0.shape, ph0.dtype)
    else:
        mesh = None
        abspsfhat = np.stack([ld() for ld in abspsfhat])  # (nband, npart, nxp, nyo2)
    beam_per_band = np.stack(beams) if all(bm is not None for bm in beams) else None
    # band-mean beam: multiplies the residual before the forward solve so
    # the normal equations target the INTRINSIC sky (reference legacy sara
    # driver `residual *= beam`, core/sara.py:280)
    band_beam = None
    if beam_per_band is not None:
        band_beam = np.stack(
            [np.asarray(dt.group(key).read("BEAM")) if dt.group(key).has("BEAM") else beam_per_band[b].mean(0) for b, key in enumerate(band_nodes)]
        )
    wsum = wsums.sum()

    cached_norm = dt.attrs.get("hess_norm")
    opts = dict(
        bases=bases,
        nlevels=nlevels,
        eta=eta,
        gamma=gamma,
        positivity=positivity,
        cg_tol=cg_tol,
        cg_maxit=cg_maxit,
        pd_tol=pd_tol,
        pd_maxit=pd_maxit,
        rmsfactor=rmsfactor,
        l1_reweight_from=l1_reweight_from,
        hess_norm=hess_norm if hess_norm is not None else cached_norm,
        verbosity=1,
    )
    if opts_extra:
        opts.update(opts_extra)

    geometry = dict(nx=nx, ny=ny, nx_psf=nx_psf, ny_psf=ny_psf)
    solver = PRESETS[preset](
        abspsfhat, wsums, geometry, model, update, opts,
        beam_per_band=beam_per_band, mesh=hess_mesh, transposed=transposed,
    )
    if not multihost or jax_pi() == 0:
        # single-writer for the shared top-level attrs (multi-host peers
        # each construct the solver; the torn-JSON race showed up in the
        # 2-process suite run)
        dt.set_attrs(hess_norm=solver.hess_norm)

    # warm-start the PD dual from the checkpoint when present — the
    # reference re-zeros it every run (primal_dual.py:383, noted in SURVEY
    # §5.4 as unpersisted state); persisting it shortens the backward solve
    # on resume
    bwd = solver.backward_alg
    if getattr(bwd, "_v", None) is not None:
        dual0 = []
        for key in band_nodes:
            node = dt.group(key)
            if node.has("DUAL"):
                dual0.append(np.asarray(node.read("DUAL")))
        if len(dual0) == nband:
            import jax.numpy as jnp_

            bwd._v = jnp_.asarray(np.stack(dual0))
            log.info("warm-started PD dual from checkpoint")

    if use_mesh:
        # shard the solver's cube state over the band mesh axis — the jitted
        # CG/PD programs then run SPMD with band-sum collectives (replaces
        # the reference's one-Ray-actor-per-band topology); |PSFHAT| is
        # already band-sharded (streamed above)
        import jax

        from ..parallel.mesh import band_sharding

        spec = band_sharding(mesh)
        put = lambda a: jax.device_put(a, spec)  # noqa: E731
        solver.hess = jax.tree_util.tree_map(
            lambda a: put(a) if getattr(a, "ndim", 0) >= 1 and a.shape[0] == nband else a, solver.hess
        )
        solver._model = put(solver._model)
        solver._update = put(solver._update)
        if getattr(solver.backward_alg, "_v", None) is not None:
            # the PD dual must share the band sharding: mixed local/global
            # inputs cannot jit across hosts (multi-host, VERDICT r4 #2)
            solver.backward_alg._v = put(np.asarray(solver.backward_alg._v))
        log.info("band mesh: %d-way sharding over %d devices", band_size, ndev)
    else:
        spec = None
        put = None

    best_rms = np.inf
    best_model = model.copy()
    rms = float(np.std(residual.sum(axis=0) / wsum))
    rmax = float(np.abs(residual.sum(axis=0) / wsum).max())
    diverge = 0
    log.info("start: iter0=%d rms=%.3e rmax=%.3e", iter0, rms, rmax)

    for k in range(iter0, iter0 + niter):
        rin = residual if band_beam is None else residual * band_beam
        rin_dev = put(rin / wsum) if put is not None else jnp.asarray(rin / wsum)
        solver.first(rin_dev)
        update = host_gather(solver.forward(None))
        lam = (init_factor if (iter0 == 0 and k == 0) else 1.0) * rmsfactor * rms  # D5
        model = host_gather(solver.backward(lam))
        solver.last()

        if fit_mds and model.any():
            # fit component model over the (time, freq) node grid, then
            # re-evaluate so the on-disk model matches the .mds
            times_u = np.asarray(node_times).reshape(nband_f, ntime)[0]
            freqs_u = freq_out.reshape(nband_f, ntime)[:, 0]
            mcube = model.reshape(nband_f, ntime, nx, ny).transpose(1, 0, 2, 3)
            coeffs, ix, iy, mattrs = fit_image_cube(
                times_u, freqs_u, mcube, nbasisf=nbasisf or nband_f, nbasist=min(ntime, 2)
            )
            if not multihost or jax_pi() == 0:
                mds = TreeStore(str(dt.path).replace(".dt", ".mds"), mode="w")
                save_mds(mds, coeffs, ix, iy, mattrs)
            mcube = eval_coeffs_to_cube(times_u, freqs_u, coeffs, ix, iy, mattrs)
            model = mcube.transpose(1, 0, 2, 3).reshape(nband, nx, ny)

        # exact residual through the measurement operator. Bands of one
        # time slice share partition uvw, so the multiband path grids all
        # of them in ONE vmapped dispatch per partition (round-3 VERDICT
        # #5); per-(band, time) async dispatch is the fallback for
        # layouts the stacking cannot serve.
        by_time: dict = {}
        owned = (
            {b for b in range(nband) if b % jax_pc() == jax_pi()} if multihost else None
        )
        for b, key in enumerate(band_nodes):
            if owned is not None and b not in owned:
                continue  # another host grids this band's residual
            by_time.setdefault(key.split("_time")[-1], []).append((b, key))
        serial: list = []
        for items in by_time.values():
            idxs = [b for b, _ in items]
            out = residual_from_parts_multiband(
                dt, [k for _, k in items], model[idxs], epsilon=epsilon,
                do_wgridding=do_wgridding, double_precision=double_precision,
            )
            if out is not None:
                residual[idxs] = out
            else:
                serial.extend(items)
        if serial:
            from .imager import RESIDUAL_DISPATCH_STATS

            RESIDUAL_DISPATCH_STATS["fallback_bands"] += len(serial)
            resid_d = [
                residual_from_parts(
                    dt.group(key), model[b], epsilon=epsilon, do_wgridding=do_wgridding,
                    double_precision=double_precision, as_device=True,
                )
                for b, key in serial
            ]
            for (b, _), rd in zip(serial, resid_d):
                residual[b] = np.asarray(rd)
        if owned is not None:
            # disjoint per-host band residuals -> every host (each host
            # gridded only its bands; stale un-owned bands are dropped)
            keep = np.zeros(nband, bool)
            keep[list(owned)] = True
            residual = mh_allsum(residual * keep[:, None, None])

        rms_p, rmax_p = rms, rmax
        mfs = residual.sum(axis=0) / wsum
        rms = float(np.std(mfs))
        rmax = float(np.abs(mfs).max())
        from ..utils.profiling import memory_line

        from .imager import RESIDUAL_DISPATCH_STATS as _rds

        log.info(
            "iter %d: lam=%.3e rms=%.3e rmax=%.3e residual-dispatch[mb=%d fb=%d] [%s]",
            k + 1, lam, rms, rmax,
            _rds["multiband_parts"], _rds["fallback_bands"], memory_line(),
        )

        if rms < best_rms:
            best_rms = rms
            best_model = model.copy()

        # checkpoint write-back (reference core/deconv.py:346-372), plus the
        # PD dual (an improvement over the reference's unpersisted dual)
        dual_ck = getattr(solver.backward_alg, "_v", None)
        if dual_ck is not None and multihost:
            dual_ck = host_gather(dual_ck)
        for b, key in enumerate(band_nodes):
            if owned is not None and b not in owned:
                continue  # single-writer: the owning host persists it
            node = dt.group(key)
            node.write("MODEL", model[b])
            node.write("UPDATE", update[b])
            node.write("RESIDUAL", residual[b])
            node.write("MODEL_BEST", best_model[b])
            if dual_ck is not None:
                node.write("DUAL", np.asarray(dual_ck[b]))
            node.set_attrs(niters=k + 1, rms=rms, rmax=rmax, hess_norm=solver.hess_norm)
        if multihost:
            mh_barrier(f"deconv-iter-{k}")

        if rms > rms_p and rmax > rmax_p:
            diverge += 1
            if diverge >= diverge_count:
                log.info("Algorithm is diverging, terminating")
                break
        else:
            diverge = 0

    return model, residual
