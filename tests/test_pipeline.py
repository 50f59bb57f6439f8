"""End-to-end pipeline tests through the drivers and CLI, mirroring the
reference's init->grid->sara / kclean CLI tests (tests/test_sara.py:22-226,
tests/test_kclean.py:26): simulate known sources, run the full pipeline
in-process, assert recovery."""

import numpy as np
import pytest

from pfb_imaging_tpu.core.simulate import simulate_vis_store
from pfb_imaging_tpu.core.init import init
from pfb_imaging_tpu.core.imager import imager
from pfb_imaging_tpu.utils.store import TreeStore


@pytest.fixture(scope="module")
def sim_ms(tmp_path_factory):
    path = tmp_path_factory.mktemp("sim") / "test.ms.tree"
    store, truth = simulate_vis_store(
        str(path), nant=12, ntime=2, nchan=4, nx=64, sources=((0.5, 0.5, 1.0, -0.7),)
    )
    return str(path), truth


@pytest.fixture(scope="module")
def gridded(sim_ms, tmp_path_factory):
    ms_path, truth = sim_ms
    base = tmp_path_factory.mktemp("prod")
    xds = str(base / "test_I.xds")
    dt = str(base / "test_I.dt")
    init(ms_path, xds, product="I")
    # the simulator phase-centres at l0=m0=0 and uses its own cell; image at
    # the same geometry so the source lands on a pixel centre
    imager(
        xds,
        dt,
        nband=2,
        nx=truth["nx"],
        cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
        robustness=None,
        epsilon=1e-9,
        do_wgridding=True,
        fits_out=True,
    )
    return dt, truth


def test_imager_dirty_peak(gridded):
    """The dirty image of a centred unit point source peaks at the source at
    ~flux (natural weighting, wsum-normalised)."""
    dt, truth = gridded
    tree = TreeStore(dt)
    assert tree.attrs["nband"] == 2
    nx = truth["nx"]
    wsum = 0.0
    dirty = None
    for key in tree.groups():
        node = tree.group(key)
        d = np.asarray(node.read("DIRTY"))
        dirty = d if dirty is None else dirty + d
        wsum += float(np.asarray(node.read("WSUM"))[0])
    dirty = dirty / wsum
    p = q = nx // 2
    assert np.unravel_index(np.abs(dirty).argmax(), dirty.shape) == (p, q)
    # MFS flux of the source: mean over channels of the spectrum
    expected = truth["model"][:, p, q].mean()
    assert dirty[p, q] == pytest.approx(expected, rel=0.1)


def test_imager_fits_outputs(gridded):
    dt, truth = gridded
    base = dt[:-3]
    from pfb_imaging_tpu.utils.fits import load_fits

    data, hdr = load_fits(base + "_dirty_mfs.fits")
    assert data.shape[-2:] == (truth["nx"], truth["nx"])
    assert hdr["CTYPE1"] == "RA---SIN"


def test_deconv_recovers_flux(gridded):
    dt, truth = gridded
    from pfb_imaging_tpu.core.deconv import deconv

    model, residual = deconv(
        dt,
        preset="sara",
        niter=5,
        eta=1e-4,
        cg_maxit=50,
        pd_maxit=200,
        pd_tol=1e-4,
        cg_tol=1e-4,
        l1_reweight_from=-1,
        fit_mds=True,
        epsilon=1e-9,
    )
    nx = truth["nx"]
    p = q = nx // 2
    mfs = model.sum(axis=0)
    # with the deliberately sparse test uv coverage the abs(PSFHAT) Hessian
    # over-estimates (design D4 discussion in tests/test_deconv.py) and the
    # model smears over a few pixels; assert localisation + box flux
    pk = np.unravel_index(mfs.argmax(), mfs.shape)
    assert abs(pk[0] - p) <= 1 and abs(pk[1] - q) <= 1
    box = mfs[p - 3 : p + 4, q - 3 : q + 4].sum()
    true_flux = truth["model"][:, p, q].reshape(2, 2).mean(axis=1).sum()
    assert box == pytest.approx(true_flux, rel=0.3)
    # residual went down substantially
    assert np.abs(residual).max() < 0.15 * np.abs(TreeStore(dt).group("band0000_time0000").read("DIRTY")).max()
    # checkpoint attrs written
    tree = TreeStore(dt)
    node = tree.group(tree.groups()[0])
    assert node.attrs["niters"] == 5
    assert tree.attrs["hess_norm"] > 0
    # .mds written alongside
    assert (tree.path.parent / tree.path.name.replace(".dt", ".mds")).is_dir()


def test_deconv_resume(gridded):
    """Re-running warm-starts from the checkpoint (niters continues)."""
    dt, truth = gridded
    from pfb_imaging_tpu.core.deconv import deconv

    tree = TreeStore(dt)
    n0 = tree.group(tree.groups()[0]).attrs["niters"]
    deconv(dt, preset="sara", niter=1, eta=1e-4, cg_maxit=20, pd_maxit=100, l1_reweight_from=-1, epsilon=1e-9)
    n1 = TreeStore(dt).group(tree.groups()[0]).attrs["niters"]
    assert n1 == n0 + 1


def test_kclean_and_restore(sim_ms, tmp_path_factory):
    ms_path, truth = sim_ms
    base = tmp_path_factory.mktemp("kclean")
    xds = str(base / "k_I.xds")
    dt = str(base / "k_I.dt")
    init(ms_path, xds, product="I")
    imager(xds, dt, nband=2, nx=truth["nx"], cell_size=np.rad2deg(truth["cell_rad"]) * 3600, epsilon=1e-9, fits_out=False)

    from pfb_imaging_tpu.core.kclean import kclean
    from pfb_imaging_tpu.core.restore import restore

    model, residual = kclean(dt, niter=3, minor="clark", gamma=0.1, peak_factor=0.05, epsilon=1e-9)
    nx = truth["nx"]
    p = q = nx // 2
    mfs = model.sum(axis=0)
    # ~2 px/beam: CLEAN legitimately splits flux between adjacent pixels
    pk = np.unravel_index(mfs.argmax(), mfs.shape)
    assert abs(pk[0] - p) <= 1 and abs(pk[1] - q) <= 1
    true_flux = truth["model"][:, p, q].reshape(2, 2).mean(axis=1).sum()
    assert mfs[p - 3 : p + 4, q - 3 : q + 4].sum() == pytest.approx(true_flux, rel=0.35)

    written = restore(dt, outputs="MI")
    assert len(written) == 2
    from pfb_imaging_tpu.utils.fits import load_fits

    img, hdr = load_fits(written[1])
    assert "BMAJ" in hdr


def test_model2comps_degrid_roundtrip(gridded, tmp_path):
    """model2comps -> degrid writes MODEL_DATA consistent with the model
    (reference test_model2comps round trip + degrid path)."""
    dt, truth = gridded
    from pfb_imaging_tpu.core.model2comps import model2comps
    from pfb_imaging_tpu.core.degrid import degrid
    from pfb_imaging_tpu.ops.dft import dirty2vis_dft

    mds = model2comps(dt, mds_path=str(tmp_path / "m.mds"))

    # build a small vis container to predict into
    ms2 = str(tmp_path / "pred.ms.tree")
    store, truth2 = simulate_vis_store(ms2, nant=8, ntime=1, nchan=2, nx=truth["nx"])
    cell = TreeStore(dt).attrs["cell_rad"]
    degrid(str(tmp_path / "m.mds"), ms2, cell_rad=cell, column="MODEL_DATA")

    g = TreeStore(ms2).group("scan0000")
    mvis = g.read("MODEL_DATA")
    assert mvis.shape[0] == g.read("UVW").shape[0]
    assert np.abs(mvis).max() > 0

    # oracle: direct DFT of the rendered model at one frequency
    from pfb_imaging_tpu.utils.modelspec import eval_coeffs_to_slice, load_mds

    coeffs, ix, iy, mattrs = load_mds(TreeStore(str(tmp_path / "m.mds")))
    freqs = np.asarray(TreeStore(ms2).attrs["freq"])
    img = eval_coeffs_to_slice(0.0, freqs[0], coeffs, ix, iy, mattrs)
    uvw = np.asarray(g.read("UVW"))
    oracle = np.asarray(
        dirty2vis_dft(uvw, freqs[:1], img, nx=truth["nx"], ny=truth["nx"], cellx=cell, celly=cell, divide_by_n=False)
    )
    np.testing.assert_allclose(np.asarray(mvis[:, :1]), oracle, atol=1e-6 * np.abs(oracle).max())


def test_hci_cube(sim_ms, tmp_path):
    ms_path, truth = sim_ms
    xds = str(tmp_path / "h_I.xds")
    init(ms_path, xds, product="I")
    from pfb_imaging_tpu.core.hci import hci

    out = hci(xds, str(tmp_path / "h.cube"), nx=64, freq_chunks=2, epsilon=1e-7)
    cube = out.read("CUBE")
    assert cube.shape == (2, 2, 64, 64)
    assert np.isfinite(cube).all()
    assert np.abs(cube).max() > 0


def test_cli_help_and_simulate(tmp_path, capsys):
    from pfb_imaging_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    capsys.readouterr()
    main(["simulate", str(tmp_path / "c.ms.tree"), "--nant", "8", "--ntime", "1", "--nchan", "2", "--nx", "32"])
    assert (tmp_path / "c.ms.tree" / "scan0000" / "VIS.npy").exists()


def test_imager_model_transfer_and_l2_reweight(gridded, tmp_path):
    """Gridding with the true model transferred gives ~zero residual dirty
    (reference model-transfer path); L2 reweighting runs without changing
    that (residuals are uniform ~0)."""
    dt, truth = gridded
    from pfb_imaging_tpu.core.model2comps import model2comps

    # build an .mds from the true model by writing it into a scratch tree
    scratch = TreeStore(str(tmp_path / "true.dt"), mode="w")
    tree = TreeStore(dt)
    scratch.set_attrs(**tree.attrs)
    bands = [k for k in tree.groups() if k.startswith("band")]
    for b, key in enumerate(bands):
        node = scratch.group(key)
        chans = truth["model"].shape[0] // len(bands)
        node.write("MODEL", truth["model"][b * chans : (b + 1) * chans].mean(axis=0))
        node.set_attrs(freq_out=tree.attrs["freq_out"][b])
    model2comps(str(tmp_path / "true.dt"), mds_path=str(tmp_path / "true.mds"))

    xds = str(tree.path.parent.parent / "prod0" / "test_I.xds")
    import os

    if not os.path.isdir(xds):  # locate the xds fixture path robustly
        base = tree.path.parent
        cands = list(base.glob("*.xds"))
        xds = str(cands[0])
    out2 = str(tmp_path / "resid.dt")
    imager(
        xds,
        out2,
        nband=2,
        nx=truth["nx"],
        cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
        epsilon=1e-9,
        fits_out=False,
        model_mds=str(tmp_path / "true.mds"),
        l2_reweight_dof=5.0,
    )
    t2 = TreeStore(out2)
    wsum = sum(float(np.asarray(t2.group(k).read("WSUM"))[0]) for k in t2.groups())
    resid = sum(np.asarray(t2.group(k).read("DIRTY")) for k in t2.groups()) / wsum
    # the transferred model is the per-band channel average of the true
    # spectral model, so the residual is small but not machine zero
    assert np.abs(resid).max() < 0.05


def test_fluxtractor_mops_residual_flux(gridded, tmp_path_factory):
    """The vis-space CG mop recovers flux remaining in the residual inside
    the mask (reference core/fluxtractor.py + pcg_dds)."""
    import shutil

    dt_src, truth = gridded
    base = tmp_path_factory.mktemp("mop")
    dt = str(base / "mop.dt")
    shutil.copytree(dt_src, dt)
    from pfb_imaging_tpu.core.fluxtractor import fluxtractor

    nx = truth["nx"]
    mask = np.zeros((nx, nx))
    mask[nx // 2 - 4 : nx // 2 + 5, nx // 2 - 4 : nx // 2 + 5] = 1.0
    model, residual = fluxtractor(dt, mask=mask, eta=1e-3, cg_maxit=30, epsilon=1e-9)
    tree = TreeStore(dt)
    node = tree.group("band0000_time0000")
    assert node.has("MODEL_MOPPED") and node.has("RESIDUAL_MOPPED")
    # residual power inside the mask decreases
    wsum = sum(float(np.asarray(tree.group(k).read("WSUM"))[0]) for k in tree.groups())
    r0 = sum(
        np.asarray(tree.group(k).read("RESIDUAL" if tree.group(k).has("RESIDUAL") else "DIRTY"))
        for k in tree.groups()
    ) / wsum
    r1 = residual.sum(axis=0) / wsum
    assert np.abs(r1 * mask).max() < np.abs(r0 * mask).max()


def test_hci_transient_injection(sim_ms, tmp_path):
    ms_path, truth = sim_ms
    xds = str(tmp_path / "ht_I.xds")
    init(ms_path, xds, product="I")
    from pfb_imaging_tpu.core.hci import hci

    out = hci(
        xds,
        str(tmp_path / "ht.cube"),
        nx=64,
        freq_chunks=1,
        epsilon=1e-7,
        inject_transient=dict(kind="step", t0=30.0, width=10.0, amplitude=5.0, xfrac=0.25, yfrac=0.25),
        rms_flag_level=1e9,  # effectively off
    )
    cube = np.asarray(out.read("CUBE"))
    # scan times are 0 and 60 s; the step turns on at t0=30 -> only frame 1
    p = q = 16
    assert abs(cube[0, 0, p, q]) < 0.5
    assert cube[1, 0, p, q] == pytest.approx(5.0, rel=0.15)


def test_imager_briggs_weighting(sim_ms, tmp_path):
    """Briggs robustness narrows the PSF mainlobe relative to natural
    weighting (the classic uniform/natural trade)."""
    ms_path, truth = sim_ms
    xds = str(tmp_path / "b_I.xds")
    init(ms_path, xds, product="I")
    kw = dict(nband=1, nx=truth["nx"], cell_size=np.rad2deg(truth["cell_rad"]) * 3600, epsilon=1e-9, fits_out=False)
    dt_nat = str(tmp_path / "nat.dt")
    dt_uni = str(tmp_path / "uni.dt")
    imager(xds, dt_nat, robustness=None, **kw)
    imager(xds, dt_uni, robustness=-2.0, **kw)

    from pfb_imaging_tpu.geometry import fitcleanbeam

    def beam_area(dt):
        tree = TreeStore(dt)
        node = tree.group("band0000_time0000")
        psf = np.asarray(node.read("PSF"))
        wsum = float(np.asarray(node.read("WSUM"))[0])
        par = fitcleanbeam((psf / wsum)[None])[0]
        return par[0] * par[1]

    a_nat = beam_area(dt_nat)
    a_uni = beam_area(dt_uni)
    assert a_uni < a_nat, f"uniform beam ({a_uni}) should be tighter than natural ({a_nat})"


def test_bda_reduces_rows_preserves_dirty(tmp_path):
    """Ingest-time BDA shrinks the row axis (short baselines averaged) while
    preserving wsum and the natural dirty image to the decorrelation
    tolerance (reference stokes2vis_msv4.py:324-365 via africanus)."""
    ms = str(tmp_path / "bda.ms.tree")
    store, truth = simulate_vis_store(
        ms, nant=10, ntime=12, nchan=2, nx=64, times_per_scan=12, sources=((0.5, 0.5, 1.0, 0.0),)
    )
    xds_full = str(tmp_path / "full.xds")
    xds_bda = str(tmp_path / "bda.xds")
    init(ms, xds_full, product="I")
    init(ms, xds_bda, product="I", bda_decorrelation=0.98)
    gf = TreeStore(xds_full).group("scan0000")
    gb = TreeStore(xds_bda).group("scan0000")
    nfull = np.asarray(gf.read("VIS")).shape[0]
    nbda = np.asarray(gb.read("VIS")).shape[0]
    assert nbda < nfull  # rows actually averaged
    wf = (np.asarray(gf.read("WEIGHT")) * np.asarray(gf.read("MASK"))).sum()
    wb = (np.asarray(gb.read("WEIGHT")) * np.asarray(gb.read("MASK"))).sum()
    assert wb == pytest.approx(wf, rel=1e-10)  # wsum preserved

    dt_f = str(tmp_path / "full.dt")
    dt_b = str(tmp_path / "bda.dt")
    kw = dict(nband=1, nx=truth["nx"], cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
              robustness=None, epsilon=1e-7, fits_out=False, do_noise=False)
    imager(xds_full, dt_f, **kw)
    imager(xds_bda, dt_b, **kw)
    df = np.asarray(TreeStore(dt_f).group("band0000_time0000").read("DIRTY"))
    db = np.asarray(TreeStore(dt_b).group("band0000_time0000").read("DIRTY"))
    assert np.abs(df - db).max() / np.abs(df).max() < 0.05


def test_beam_end_to_end_flux(tmp_path):
    """Apparent sky simulated through the primary beam; the beam-aware
    deconv recovers the INTRINSIC flux of an off-centre source while the
    beam-blind dirty peak stays attenuated (VERDICT round-1 item 7: beam
    must be produced, written and consumed by the Hessian)."""
    ms = str(tmp_path / "beam.ms.tree")
    # probe run to learn the cell size, then pick a dish diameter that puts
    # the off-centre source well down the beam (the beam scale is FoV-tiny
    # for this toy array, so the diameter is synthetic)
    _, truth0 = simulate_vis_store(str(tmp_path / "probe.ms.tree"), nant=12, ntime=2, nchan=2, nx=64,
                                   sources=((0.25, 0.25, 1.0, 0.0),))
    from pfb_imaging_tpu.constants import LIGHTSPEED
    from pfb_imaging_tpu.utils.beam import gauss_beam

    nx = truth0["nx"]
    p = q = nx // 4
    offset = (nx // 2 - p) * truth0["cell_rad"] * np.sqrt(2.0)
    lam_mean = LIGHTSPEED / truth0["freqs"].mean()
    diameter = 1.18 * lam_mean / (2.2 * offset)  # FWHM ~ 2.2x the offset
    store, truth = simulate_vis_store(
        ms, nant=12, ntime=2, nchan=2, nx=64, sources=((0.25, 0.25, 1.0, 0.0),),
        beam_diameter=diameter,
    )
    lg = (np.arange(nx) - nx // 2) * truth["cell_rad"]
    bvals = gauss_beam(lg[p] * np.ones((1, 1)), lg[q] * np.ones((1, 1)), truth["freqs"], diameter=diameter)
    bsrc = float(np.mean(bvals))  # beam at the source
    assert 0.2 < bsrc < 0.9

    xds = str(tmp_path / "beam.xds")
    dt = str(tmp_path / "beam.dt")
    init(ms, xds, product="I")
    assert TreeStore(xds).group("scan0000").has("BEAM_SMALL")
    imager(xds, dt, nband=1, nx=nx, cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
           robustness=None, epsilon=1e-7, fits_out=False, do_noise=False)
    node = TreeStore(dt).group("band0000_time0000")
    assert node.has("BEAM") and node.group("part0000").has("BEAM")
    # dirty peak is attenuated by ~the beam value
    dirty = np.asarray(node.read("DIRTY")) / float(np.asarray(node.read("WSUM"))[0])
    assert dirty[p, q] == pytest.approx(bsrc * 1.0, rel=0.15)

    from pfb_imaging_tpu.core.deconv import deconv

    model, residual = deconv(dt, preset="sara", niter=4, eta=1e-4, cg_maxit=60, cg_tol=1e-5,
                             pd_maxit=150, pd_tol=1e-4, l1_reweight_from=-1, fit_mds=False, epsilon=1e-7)
    box = model.sum(axis=0)[p - 3 : p + 4, q - 3 : q + 4].sum()
    # intrinsic flux recovered (NOT the attenuated apparent flux)
    assert box == pytest.approx(1.0, rel=0.25)
    assert abs(box - bsrc) > 0.1 * bsrc  # distinguishable from no-beam answer


def test_imager_noise_and_psfparsn_products(gridded):
    dt, truth = gridded
    node = TreeStore(dt).group("band0000_time0000")
    assert node.has("NOISE")
    noise = np.asarray(node.read("NOISE")) / float(np.asarray(node.read("WSUM"))[0])
    assert np.all(np.isfinite(noise)) and noise.std() > 0
    pars = np.asarray(node.read("PSFPARSN"))
    assert pars.shape[-1] == 3 and pars[0] > 0


def test_multitime_pipeline(tmp_path):
    """2-time x 2-band tree through imager -> deconv -> restore (round-1
    VERDICT item 8: reference .dt supports band####_time#### with ntime>1)."""
    ms = str(tmp_path / "mt.ms.tree")
    store, truth = simulate_vis_store(ms, nant=12, ntime=4, nchan=4, nx=64,
                                      sources=((0.5, 0.5, 1.0, 0.0),))
    xds = str(tmp_path / "mt.xds")
    dt = str(tmp_path / "mt.dt")
    init(ms, xds, product="I")
    imager(xds, dt, nband=2, ntime=2, nx=truth["nx"],
           cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
           robustness=None, epsilon=1e-7, fits_out=False, do_noise=False)
    tree = TreeStore(dt)
    nodes = [k for k in tree.groups() if k.startswith("band")]
    assert sorted(nodes) == [
        "band0000_time0000", "band0000_time0001", "band0001_time0000", "band0001_time0001"
    ]
    t00 = tree.group("band0000_time0000").attrs["time_out"]
    t01 = tree.group("band0000_time0001").attrs["time_out"]
    assert t01 > t00

    from pfb_imaging_tpu.core.deconv import deconv

    model, residual = deconv(dt, preset="sara", niter=3, eta=1e-4, cg_maxit=40, cg_tol=1e-4,
                             pd_maxit=120, pd_tol=1e-4, l1_reweight_from=-1, fit_mds=True, epsilon=1e-7)
    assert model.shape[0] == 4
    nx = truth["nx"]
    p = q = nx // 2
    box = model.sum(axis=0)[p - 3 : p + 4, q - 3 : q + 4].sum()
    # 4 (band,time) slices each carry the per-band mean flux
    per_slice = truth["model"][:, p, q].reshape(2, 2).mean(axis=1)
    assert box == pytest.approx(2.0 * per_slice.sum(), rel=0.35)

    from pfb_imaging_tpu.core.restore import restore

    written = restore(dt, outputs="MI")
    assert any("image_mfs" in w for w in written)


def test_full_stokes_fsclark_recovery(tmp_path):
    """Full-Stokes end-to-end: simulate a polarised source, image I and Q,
    deconvolve jointly with fsclark, recover both fluxes (round-1 VERDICT
    item 8; reference energy.py / clark.py:147-295)."""
    import jax.numpy as jnp
    from pfb_imaging_tpu.deconv.clark import fsclark
    from pfb_imaging_tpu.ops.psf import psf_to_psfhat

    ms = str(tmp_path / "fs.ms.tree")
    store, truth = simulate_vis_store(
        ms, nant=12, ntime=2, nchan=2, nx=64, ncorr=4,
        sources=((0.5, 0.5, 1.0, 0.0),), pol_fractions=(0.3, 0.0, 0.0),
    )
    dirts, psfs, wsums = [], [], []
    for prod in ("I", "Q"):
        xds = str(tmp_path / f"fs_{prod}.xds")
        dt = str(tmp_path / f"fs_{prod}.dt")
        init(ms, xds, product=prod)
        imager(xds, dt, nband=1, nx=truth["nx"], cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
               robustness=None, epsilon=1e-7, fits_out=False, do_noise=False)
        node = TreeStore(dt).group("band0000_time0000")
        dirts.append(np.asarray(node.read("DIRTY")))
        psfs.append(np.asarray(node.read("PSF")))
        wsums.append(float(np.asarray(node.read("WSUM"))[0]))
    wsums = np.asarray(wsums)
    # per-corr wsum-normalised cubes, nband=1 (wsums column sums == 1)
    dirty = (np.stack(dirts) / wsums[:, None, None])[None]  # (1, ncorr, nx, ny)
    psf = (np.stack(psfs) / wsums[:, None, None])[None]  # (1, ncorr, nxp, nyp)
    psfhat = np.asarray(psf_to_psfhat(jnp.asarray(psf)))
    model, residual, status = fsclark(
        jnp.asarray(dirty),
        jnp.asarray(psf),
        jnp.asarray(psfhat),
        jnp.asarray(np.ones((1, 2))),
        gamma=0.1,
        pf=0.1,
        maxit=30,
    )
    nx = truth["nx"]
    p = q = nx // 2
    m = np.asarray(model)
    flux_i = m[0, 0, p - 2 : p + 3, q - 2 : q + 3].sum()
    flux_q = m[0, 1, p - 2 : p + 3, q - 2 : q + 3].sum()
    assert flux_i == pytest.approx(1.0, rel=0.3)
    assert flux_q == pytest.approx(0.3, rel=0.4)


def test_model2comps_multitime(tmp_path):
    """model2comps fits the (time, freq) node grid on a multi-time tree."""
    ms = str(tmp_path / "m2c.ms.tree")
    store, truth = simulate_vis_store(ms, nant=10, ntime=4, nchan=4, nx=64,
                                      sources=((0.5, 0.5, 1.0, 0.0),))
    xds = str(tmp_path / "m2c.xds")
    dt = str(tmp_path / "m2c.dt")
    init(ms, xds, product="I")
    imager(xds, dt, nband=2, ntime=2, nx=truth["nx"],
           cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
           robustness=None, epsilon=1e-7, fits_out=False, do_noise=False)
    tree = TreeStore(dt)
    # plant a time-varying model: flux doubles in the second time bin
    for key in tree.groups():
        if not key.startswith("band"):
            continue
        t = int(key.split("_time")[1])
        m = np.zeros((truth["nx"], truth["nx"]))
        m[32, 32] = 1.0 + t
        tree.group(key).write("MODEL", m)

    from pfb_imaging_tpu.core.model2comps import model2comps
    from pfb_imaging_tpu.utils.modelspec import eval_coeffs_to_slice, load_mds

    model2comps(dt, mds_path=str(tmp_path / "m2c.mds"))
    coeffs, ix, iy, mattrs = load_mds(TreeStore(str(tmp_path / "m2c.mds")))
    t0 = tree.group("band0000_time0000").attrs["time_out"]
    t1 = tree.group("band0000_time0001").attrs["time_out"]
    f0 = tree.group("band0000_time0000").attrs["freq_out"]
    m0 = eval_coeffs_to_slice(t0, f0, coeffs, ix, iy, mattrs)
    m1 = eval_coeffs_to_slice(t1, f0, coeffs, ix, iy, mattrs)
    assert m0[32, 32] == pytest.approx(1.0, rel=1e-6)
    assert m1[32, 32] == pytest.approx(2.0, rel=1e-6)


def test_hci_per_scan_products_and_idg(sim_ms, tmp_path):
    ms_path, truth = sim_ms
    xds = str(tmp_path / "h2_I.xds")
    init(ms_path, xds, product="I")
    from pfb_imaging_tpu.core.hci import hci

    out = hci(xds, str(tmp_path / "h2.cube"), nx=64, freq_chunks=2, epsilon=1e-5,
              gridder="idg", per_scan_products=True)
    cube = out.read("CUBE")
    assert cube.shape == (2, 2, 64, 64) and np.abs(cube).max() > 0
    sg = out.group("scan0000")
    assert sg.has("DIRTY") and sg.has("WSUM")
    # stacked scan dirty == wsum-weighted sum of its chunks
    ws = np.asarray(out.read("WSUMS"))[0]
    recon = (np.asarray(cube[0]) * ws[:, None, None]).sum(axis=0)
    np.testing.assert_allclose(np.asarray(sg.read("DIRTY")), recon, rtol=1e-10, atol=1e-8)


def test_gain_table_ingest_recovery(tmp_path):
    """Corrupted-gain e2e recovery (reference tests/test_kclean.py:26 with
    simulated QuartiCal gains; round-3 VERDICT #8): visibilities corrupted
    through a coarse (time, freq) gain table are restored by
    ``init(gain_table=...)`` — the dirty peak recovers the source flux,
    while ignoring the table leaves a corrupted image."""
    ms = str(tmp_path / "g.ms.tree")
    gtab = str(tmp_path / "g.gains")
    _, truth = simulate_vis_store(
        ms, nant=9, ntime=4, nchan=4, nx=64, sources=((0.5, 0.5, 1.0, -0.7),),
        gain_table_out=gtab,
    )
    nx = truth["nx"]
    common = dict(
        nband=1, nx=nx, cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
        robustness=None, epsilon=1e-7, do_wgridding=True, fits_out=False,
        use_mesh=False,
    )

    def dirty(dt_path):
        tree = TreeStore(dt_path)
        key = tree.groups()[0]
        d = np.asarray(tree.group(key).read("DIRTY"))
        w = float(np.asarray(tree.group(key).read("WSUM"))[0])
        return d / w

    # with the table: exact inversion of the corruption
    xds_c = str(tmp_path / "c.xds")
    init(ms, xds_c, product="I", gain_table=gtab)
    imager(xds_c, str(tmp_path / "c.dt"), **common)
    flux = truth["model"][:, nx // 2, nx // 2].mean()
    d_c = dirty(str(tmp_path / "c.dt"))
    assert abs(d_c[nx // 2, nx // 2] - flux) / flux < 0.02

    # without: the corruption scatters flux into artefacts across the
    # image (the peak itself is robust — mean-one gains average out there)
    xds_r = str(tmp_path / "r.xds")
    init(ms, xds_r, product="I")
    imager(xds_r, str(tmp_path / "r.dt"), **common)
    d_r = dirty(str(tmp_path / "r.dt"))
    assert np.abs(d_r - d_c).max() / flux > 0.03


def _mk_mds(tmp_path, truth, ms_path):
    from pfb_imaging_tpu.utils.modelspec import fit_image_cube, save_mds

    rng2 = np.random.default_rng(5)
    freqs = np.asarray(TreeStore(ms_path).attrs["freq"])
    nx = truth["nx"]
    cube = np.zeros((1, freqs.size, nx, nx))
    cube[:, :, nx // 2, nx // 2] = 1.0 + 0.05 * rng2.standard_normal(freqs.size)
    cube[:, :, nx // 2 + 5, nx // 2 - 4] = 0.5
    coeffs, ix, iy, mattrs = fit_image_cube(np.zeros(1), freqs, cube)
    mds = str(tmp_path / "m.mds")
    save_mds(TreeStore(mds, mode="w"), coeffs, ix, iy, mattrs)
    return mds


def test_degrid_region_masks(tmp_path):
    """Region-file prediction (reference core/degrid.py:200-260, round-3
    VERDICT #7): remainder + per-region columns sum to the unsplit
    prediction; overlapping regions are rejected."""
    import pytest as _pytest

    from pfb_imaging_tpu.core.degrid import degrid, load_region_masks
    from pfb_imaging_tpu.core.simulate import simulate_vis_store

    ms = str(tmp_path / "d.ms.tree")
    _, truth = simulate_vis_store(ms, nant=6, ntime=2, nchan=3, nx=32)
    mds = _mk_mds(tmp_path, truth, ms)
    nx = truth["nx"]
    reg = tmp_path / "regions.txt"
    reg.write_text(f"circle {nx // 2 + 5} {nx // 2 - 4} 2.5\n")
    degrid(mds, ms, truth["cell_rad"], to_corr=True)
    degrid(mds, ms, truth["cell_rad"], to_corr=True, column="SPLIT", region_file=str(reg))
    ts = TreeStore(ms)
    for key in ts.groups():
        g = ts.group(key)
        full = np.asarray(g.read("MODEL_DATA"))
        summed = np.asarray(g.read("SPLIT")) + np.asarray(g.read("SPLIT1"))
        np.testing.assert_allclose(summed, full, rtol=1e-12, atol=1e-12 * np.abs(full).max())
        # the region column must carry ONLY the off-centre source
        assert np.abs(np.asarray(g.read("SPLIT1"))).max() > 0.1
    masks = load_region_masks(str(reg), nx, nx)
    assert len(masks) == 2 and float(np.sum(masks, axis=0).max()) == 1.0
    reg2 = tmp_path / "overlap.txt"
    reg2.write_text(f"circle {nx // 2} {nx // 2} 4\ncircle {nx // 2} {nx // 2 + 1} 4\n")
    with _pytest.raises(ValueError, match="Overlapping"):
        load_region_masks(str(reg2), nx, nx)


def test_degrid_idg_matches_stack(tmp_path):
    """IDG-routed degrid == classic w-stacking degrid within the epsilon
    envelope (round-3 VERDICT #7: degrid backend parity)."""
    from pfb_imaging_tpu.core.degrid import degrid
    from pfb_imaging_tpu.core.simulate import simulate_vis_store

    ms = str(tmp_path / "d.ms.tree")
    _, truth = simulate_vis_store(ms, nant=9, ntime=2, nchan=3, nx=32)
    mds = _mk_mds(tmp_path, truth, ms)
    degrid(mds, ms, truth["cell_rad"], to_corr=True, column="M_IDG", gridder="idg", epsilon=1e-6)
    degrid(mds, ms, truth["cell_rad"], to_corr=True, column="M_STK", gridder="stack", epsilon=1e-10)
    ts = TreeStore(ms)
    for key in ts.groups():
        a = np.asarray(ts.group(key).read("M_IDG"))
        b = np.asarray(ts.group(key).read("M_STK"))
        assert np.abs(a - b).max() / np.abs(b).max() < 5e-6, key
