"""Utils layer tests: FITS round trip, TreeStore, Stokes conversion,
modelspec fit/eval round trip, restoration, spi, transients."""

import numpy as np
import pytest

from pfb_imaging_tpu.utils.fits import load_fits, save_fits, set_wcs
from pfb_imaging_tpu.utils.store import TreeStore, band_key
from pfb_imaging_tpu.utils.stokes import stokes_to_corr, weight_data
from pfb_imaging_tpu.utils.modelspec import eval_coeffs_to_cube, fit_image_cube, load_mds, save_mds
from pfb_imaging_tpu.utils.restoration import convolve2gaussres
from pfb_imaging_tpu.models.spi import fit_spi_components
from pfb_imaging_tpu.models.transients import transient_spectrum


def test_fits_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1, 3, 16, 20)).astype(np.float32)  # (ncorr,nchan,nx,ny)
    freq = np.linspace(1e9, 1.2e9, 3)
    hdr = set_wcs(1e-3, 1e-3, 16, 20, (0.1, -0.5), freq, gausspar=(3.0, 2.0, 0.5), ms_time=5e9)
    name = str(tmp_path / "test.fits")
    save_fits(data, name, hdr)
    back, hdr2 = load_fits(name)
    np.testing.assert_allclose(back, data, atol=1e-6)
    assert hdr2["CTYPE1"] == "RA---SIN"
    assert hdr2["CRVAL3"] == pytest.approx(freq[1])
    assert hdr2["BMAJ"] == pytest.approx(3.0)
    assert hdr2["CDELT1"] == pytest.approx(-1e-3)


def test_tree_store(tmp_path):
    root = TreeStore(tmp_path / "prod.dt", mode="w")
    root.set_attrs(nband=2, cell_rad=1e-5)
    node = root.group(band_key(0))
    node.write("DIRTY", np.ones((8, 8)))
    node.set_attrs(wsum=3.5)
    part = node.group("part0000")
    part.write("UVW", np.zeros((10, 3)))

    ro = TreeStore(tmp_path / "prod.dt")
    assert ro.attrs["nband"] == 2
    assert ro.groups() == ["band0000_time0000"]
    n = ro.group("band0000_time0000")
    np.testing.assert_allclose(n.read("DIRTY"), 1.0)
    assert n.attrs["wsum"] == 3.5
    assert n.group("part0000").read("UVW", mmap=True).shape == (10, 3)


@pytest.mark.parametrize("feed", ["linear", "circular"])
@pytest.mark.parametrize("ncorr", [2, 4])
def test_weight_data_identity_jones(feed, ncorr):
    """For unit weights and pure Stokes-I sky, every product recovers I on
    the diagonal and 0 on the others."""
    rng = np.random.default_rng(1)
    nrow, nchan = 10, 3
    I = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))
    stokes = np.zeros((4, nrow, nchan), dtype=complex)
    stokes[0] = I
    vis = np.asarray(stokes_to_corr(stokes, feed_type=feed, ncorr=ncorr))
    wgt = np.ones((ncorr, nrow, nchan))
    vis_i, wgt_i = weight_data(vis, wgt, product="I", feed_type=feed)
    np.testing.assert_allclose(np.asarray(vis_i), I, atol=1e-12)
    assert np.asarray(wgt_i).min() > 0
    vis_q, _ = weight_data(vis, wgt, product="Q", feed_type=feed)
    np.testing.assert_allclose(np.asarray(vis_q), 0.0, atol=1e-12)


def test_weight_data_with_jones():
    """Diagonal gains must be corrected exactly for a single-product sky."""
    rng = np.random.default_rng(2)
    nrow, nchan, ncorr = 8, 2, 2
    I = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))
    stokes = np.zeros((4, nrow, nchan), dtype=complex)
    stokes[0] = I
    clean = np.asarray(stokes_to_corr(stokes, "linear", ncorr))
    gp = rng.standard_normal((ncorr, nrow, nchan)) + 1j * rng.standard_normal((ncorr, nrow, nchan))
    gq = rng.standard_normal((ncorr, nrow, nchan)) + 1j * rng.standard_normal((ncorr, nrow, nchan))
    vis = gp * np.conj(gq) * clean
    wgt = np.ones((ncorr, nrow, nchan))
    vis_i, _ = weight_data(vis, wgt, jones_p=gp, jones_q=gq, product="I", feed_type="linear")
    np.testing.assert_allclose(np.asarray(vis_i), I, atol=1e-10)


def test_weight_data_full_jones():
    """Full 2x2 Jones (off-diagonal leakage) corrected exactly against an
    explicit per-row Mueller reference (round-3 VERDICT #6; reference
    full-Jones expression set, utils/weighting.py:275-468)."""
    from pfb_imaging_tpu.utils.stokes import brightness_map

    rng = np.random.default_rng(5)
    nrow, nchan = 8, 3
    for feed in ("linear", "circular"):
        for product, sidx in (("I", 0), ("Q", 1), ("U", 2), ("V", 3)):
            S = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))
            stokes = np.zeros((4, nrow, nchan), dtype=complex)
            stokes[sidx] = S
            clean = np.asarray(stokes_to_corr(stokes, feed, 4))
            # full 2x2 Jones: diagonal gains + ~10% leakage
            jp = rng.standard_normal((2, 2, nrow, nchan)) * 0.1 + 1j * rng.standard_normal((2, 2, nrow, nchan)) * 0.1
            jq = rng.standard_normal((2, 2, nrow, nchan)) * 0.1 + 1j * rng.standard_normal((2, 2, nrow, nchan)) * 0.1
            jp[0, 0] += 1.0
            jp[1, 1] += 1.0
            jq[0, 0] += 1.0
            jq[1, 1] += 1.0
            # corrupt via the explicit per-row RIME: V = Jp B Jq^H
            B = clean.reshape(2, 2, nrow, nchan)
            vis = np.einsum("ijrc,jlrc,klrc->ikrc", jp, B, np.conj(jq)).reshape(4, nrow, nchan)
            wgt = np.ones((4, nrow, nchan))
            got, wgt_s = weight_data(vis, wgt, jones_p=jp, jones_q=jq, product=product, feed_type=feed)
            np.testing.assert_allclose(np.asarray(got), S, atol=1e-10, err_msg=(feed, product))
            assert np.asarray(wgt_s).min() > 0
            # explicit Mueller cross-check of the response the WLS solves:
            # a_c = M @ T[:, s] with M = Jp (x) conj(Jq)
            M = np.einsum("ijrc,klrc->ikjlrc", jp, np.conj(jq)).reshape(4, 4, nrow, nchan)
            T = np.asarray(brightness_map(feed, 4))[:, sidx]
            a_ref = np.einsum("cd...,d->c...", M, T)
            num = (np.conj(a_ref) * vis).sum(0)
            den = (np.abs(a_ref) ** 2).sum(0)
            np.testing.assert_allclose(np.asarray(got), num / den, atol=1e-10)


def test_modelspec_roundtrip(tmp_path):
    """Fitting with a full basis reproduces the cube exactly at the sample
    points (reference test_model2comps round trip)."""
    rng = np.random.default_rng(3)
    ntime, nband, nx, ny = 2, 4, 8, 8
    image = np.zeros((ntime, nband, nx, ny))
    for _ in range(5):
        image[:, :, rng.integers(0, nx), rng.integers(0, ny)] = rng.standard_normal((ntime, nband))
    times = np.linspace(0, 100, ntime)
    freqs = np.linspace(1e9, 1.3e9, nband)
    coeffs, ix, iy, attrs = fit_image_cube(times, freqs, image, nbasisf=nband, nbasist=ntime)
    cube = eval_coeffs_to_cube(times, freqs, coeffs, ix, iy, attrs)
    np.testing.assert_allclose(cube, image, atol=1e-9)

    store = TreeStore(tmp_path / "model.mds", mode="w")
    save_mds(store, coeffs, ix, iy, attrs)
    c2, ix2, iy2, at2 = load_mds(TreeStore(tmp_path / "model.mds"))
    cube2 = eval_coeffs_to_cube(times, freqs, c2, ix2, iy2, at2)
    np.testing.assert_allclose(cube2, image, atol=1e-9)


def test_convolve2gaussres_point_source():
    """Convolving a delta with the clean beam gives the unit-sum Gaussian."""
    img = np.zeros((1, 32, 32))
    img[0, 16, 16] = 1.0
    out = convolve2gaussres(img, (4.0, 3.0, 0.3))
    assert out.sum() == pytest.approx(1.0, rel=1e-6)
    assert np.unravel_index(out[0].argmax(), out[0].shape) == (16, 16)


def test_spi_fit():
    freqs = np.linspace(0.8e9, 1.6e9, 8)
    ref = 1.0e9
    alpha_true, i0_true = -0.7, 2.5
    data = i0_true * (freqs / ref) ** alpha_true
    alpha, aerr, i0, ierr = fit_spi_components(data[None], np.ones_like(freqs), freqs, ref)
    assert alpha[0] == pytest.approx(alpha_true, abs=1e-10)
    assert i0[0] == pytest.approx(i0_true, rel=1e-10)


def test_transients():
    times = np.linspace(0, 100, 50)
    freqs = np.linspace(1e9, 1.2e9, 4)
    for kind in ("gaussian", "exponential", "step", "periodic"):
        ds = transient_spectrum(times, freqs, kind=kind, t0=50.0, width=10.0, amplitude=2.0)
        assert ds.shape == (50, 4)
        assert ds.max() <= 2.0 + 1e-12
        assert (ds >= 0).all()


def test_phase_timer():
    import time

    from pfb_imaging_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t("a"):
        time.sleep(0.01)
    with t("b"):
        time.sleep(0.02)
    assert t.totals["b"] > t.totals["a"] > 0
    lines = []
    t.report(lines.append)
    assert any("accounted" in ln for ln in lines)


def test_cost_analysis_and_lowering():
    import jax.numpy as jnp

    from pfb_imaging_tpu.utils.profiling import cost_analysis, lowering_text

    f = lambda x: jnp.sum(x * x)  # noqa: E731
    txt = lowering_text(f, jnp.ones((8, 8)))
    assert "stablehlo" in txt or "mhlo" in txt or "func" in txt
    ca = cost_analysis(f, jnp.ones((8, 8)))
    assert isinstance(ca, dict)


def test_device_memory_stats():
    from pfb_imaging_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    assert len(stats) >= 1 and "device" in stats[0]


def test_bringup_nan_trap():
    """The bring-up sanitizer raises at the op producing a NaN (SURVEY
    §5.2 TPU-equivalent of the reference's accidental write detector)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from pfb_imaging_tpu.utils.debug import bringup_checks

    def bad(x):
        return jnp.log(x - 2.0)  # negative argument -> NaN

    x = jnp.asarray([1.0])
    with bringup_checks():
        with _pytest.raises(FloatingPointError):
            np.asarray(jax.jit(bad)(x))
    # traps restored afterwards
    assert not jax.config.jax_debug_nans
    np.asarray(jax.jit(bad)(x))  # no raise


def test_require_complete_stamp(tmp_path):
    """Interrupted imager runs must be detectable: consumers reject trees
    without the `complete` stamp (a SIGKILLed run leaves a structurally
    valid but partial tree)."""
    import pytest as _pytest

    from pfb_imaging_tpu.utils.store import TreeStore, require_complete

    t = TreeStore(tmp_path / "x.dt", mode="w")
    t.group("band0000_time0000")  # structurally valid, but no stamp
    with _pytest.raises(RuntimeError, match="completion stamp"):
        require_complete(t)
    t.set_attrs(complete=False)  # writer started, never finished
    with _pytest.raises(RuntimeError, match="completion stamp"):
        require_complete(t)
    t.set_attrs(complete=True)
    require_complete(t)  # no raise


def test_gain_containing_bin_nonuniform():
    """Solution-interval maps are CONTAINING-bin over interval edges
    (reference construct_mappings, utils/misc.py:204-466) — not nearest
    centre, which mis-assigns near boundaries on non-uniform grids
    (round-5, VERDICT r4 #7)."""
    import numpy as np

    from pfb_imaging_tpu.utils.gains import containing_bin

    # non-uniform solution intervals: edges [0, 10), [10, 40), [40, 100)
    edges = np.array([0.0, 10.0, 40.0, 100.0])
    centres = np.array([5.0, 25.0, 70.0])
    x = np.array([0.0, 9.9, 10.0, 39.9, 14.0, 40.0, 99.0, -5.0, 120.0])
    idx = containing_bin(centres, x, edges=edges)
    np.testing.assert_array_equal(idx, [0, 0, 1, 1, 1, 2, 2, 0, 2])
    # x=14 sits in interval 1 ([10, 40)) but is NEAREST to centre 0 (5.0
    # at distance 9 vs 25.0 at distance 11): nearest-centre gets it wrong
    mid = containing_bin(centres, np.array([14.0]))  # midpoint-inferred
    assert mid[0] == 0  # the documented inference without edges
    assert containing_bin(centres, np.array([14.0]), edges=edges)[0] == 1
    # bad edge count is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="edges"):
        containing_bin(centres, x, edges=edges[:-1])


def test_gain_table_edges_roundtrip(tmp_path):
    """save/load_gain_table round-trips explicit interval edges and
    gains_to_jones honours them."""
    import numpy as np

    from pfb_imaging_tpu.utils.gains import (
        gains_to_jones,
        load_gain_table,
        save_gain_table,
    )
    from pfb_imaging_tpu.utils.store import TreeStore

    rng = np.random.default_rng(3)
    ntg, nfg, nant = 3, 2, 4
    gains = rng.standard_normal((ntg, nfg, nant, 2)) + 1j * rng.standard_normal(
        (ntg, nfg, nant, 2)
    )
    gt = np.array([5.0, 25.0, 70.0])
    gf = np.array([1.0e9, 1.3e9])
    te = np.array([0.0, 10.0, 40.0, 100.0])
    fe = np.array([0.9e9, 1.2e9, 1.4e9])
    st = TreeStore(str(tmp_path / "g.gains"), mode="w")
    save_gain_table(st, gains, gt, gf, time_edges=te, freq_edges=fe)
    g2, t2, f2, te2, fe2 = load_gain_table(str(tmp_path / "g.gains"))
    np.testing.assert_array_equal(te2, te)
    np.testing.assert_array_equal(fe2, fe)
    times = np.array([14.0, 50.0])
    ant1 = np.array([0, 1])
    ant2 = np.array([2, 3])
    freqs = np.array([1.25e9])
    jp, _ = gains_to_jones(g2, t2, f2, times, ant1, ant2, freqs,
                           time_edges=te2, freq_edges=fe2)
    # row 0 (t=14) -> interval 1 (containing), chan -> freq interval 1
    np.testing.assert_allclose(jp[:, 0, 0], gains[1, 1, 0])
    np.testing.assert_allclose(jp[:, 1, 0], gains[2, 1, 1])
