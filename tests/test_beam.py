"""Primary-beam subsystem: katbeam-equivalent model, holography ingest,
parallactic rotation, Jones->Stokes responses, SIN reprojection
(reference utils/beam.py:12-172, utils/stokes.py:16-45)."""

import numpy as np
import pytest

from pfb_imaging_tpu.utils.beam import (
    beam_at_freq,
    cosine_taper_beam,
    eval_beam_model,
    load_holography_npz,
    reproject_beam,
    rotate_beam,
)
from pfb_imaging_tpu.utils.stokes import (
    jones_beam_to_stokes,
    jones_to_mueller,
    mueller_to_stokes_diag,
)

C = 299792458.0


def _grid(n, ext):
    g = np.linspace(-ext, ext, n)
    return (g,) + tuple(np.meshgrid(g, g, indexing="ij"))


def test_cosine_taper_beam_shape():
    """Unity at boresight, exactly half power at theta = FWHM/2, and the
    width scales as 1/frequency."""
    freq = 1.2e9
    D, k = 13.5, 1.178
    fwhm = k * (C / freq) / D
    _, ll, mm = _grid(101, 2 * fwhm)
    b = cosine_taper_beam(ll, mm, freq, diameter=D, fwhm_scale=k)
    assert b[50, 50] == pytest.approx(1.0)
    # sample exactly at r = fwhm/2 along the l axis
    b_half = cosine_taper_beam(np.array([[fwhm / 2]]), np.array([[0.0]]), freq, diameter=D, fwhm_scale=k)
    assert b_half[0, 0] == pytest.approx(0.5, abs=1e-4)  # 1.189 is a rounded constant
    # half-frequency -> double width: value at r matches value at r/2
    b2 = cosine_taper_beam(np.array([[fwhm / 2]]), np.array([[0.0]]), freq / 2, diameter=D, fwhm_scale=k)
    b2_expect = cosine_taper_beam(np.array([[fwhm / 4]]), np.array([[0.0]]), freq, diameter=D, fwhm_scale=k)
    assert b2[0, 0] == pytest.approx(b2_expect[0, 0], rel=1e-12)
    # removable singularity at x = 1/2 is finite and smooth
    xs = 0.5 * fwhm / 1.189
    bs = cosine_taper_beam(np.array([[xs]]), np.array([[0.0]]), freq, diameter=D, fwhm_scale=k)
    assert np.isfinite(bs[0, 0]) and 0 < bs[0, 0] < 1


def test_holography_npz_roundtrip(tmp_path):
    """Archive-format npz (abeam/ldeg/mdeg/freq) loads and frequency-
    interpolates back to the analytic pattern it encodes."""
    n = 65
    ldeg = np.linspace(-2, 2, n)
    freqs = np.array([1.0e9, 1.4e9])
    ll, mm = np.meshgrid(np.deg2rad(ldeg), np.deg2rad(ldeg), indexing="ij")
    cubes = np.stack([np.sqrt(cosine_taper_beam(ll, mm, f)) for f in freqs])  # voltage
    abeam = np.zeros((2, 2, n, n), complex)
    abeam[0] = cubes  # J00
    abeam[-1] = cubes  # J11
    p = tmp_path / "holo.npz"
    np.savez(p, abeam=abeam, ldeg=ldeg, mdeg=ldeg, freq=freqs)
    amp, l_h, m_h, fr = load_holography_npz(p)
    assert amp.shape == (2, n, n)
    np.testing.assert_allclose(amp[0], cosine_taper_beam(ll, mm, freqs[0]), atol=1e-12)
    mid = beam_at_freq(amp, fr, 1.2e9)
    np.testing.assert_allclose(mid, 0.5 * (amp[0] + amp[1]), atol=1e-12)
    # the dispatcher reaches the same cube through a path name
    got = eval_beam_model(str(p), ll, mm, 1.0e9)
    np.testing.assert_allclose(got, amp[0], atol=1e-6)


def test_eval_beam_model_dispatch():
    _, ll, mm = _grid(33, 0.02)
    assert (eval_beam_model(None, ll, mm, 1e9) == 1.0).all()
    kb = eval_beam_model("katbeam-l", ll, mm, 1e9)
    assert kb[16, 16] == pytest.approx(1.0)
    uhf = eval_beam_model("kbuhf", ll, mm, 0.8e9)
    assert (uhf >= kb - 1e-12).all()  # same width law at lower freq -> wider
    with pytest.raises(ValueError):
        eval_beam_model("nope", ll, mm, 1e9)


def test_rotate_beam_quarter_turn():
    """A beam elongated along l maps onto m under a 90-degree rotation."""
    lg, ll, mm = _grid(129, 0.05)
    ell = np.exp(-0.5 * ((ll / 0.02) ** 2 + (mm / 0.01) ** 2))
    rot = rotate_beam(ell, lg, lg, np.pi / 2, ll, mm)
    expect = np.exp(-0.5 * ((mm / 0.02) ** 2 + (ll / 0.01) ** 2))
    assert np.abs(rot - expect).max() < 5e-4  # interp error only


def test_jones_to_stokes_diag_beams():
    """Pins the reference transform exactly (utils/stokes.py:16-45,
    response_i = sum_j M[i, j] T[j, i]): a diagonal Jones diag(a, b)
    yields responses [a^2, 0, ab, 0] under the linear t-matrix."""
    nx = 5
    a = np.full((nx, nx), 0.8)
    b = np.full((nx, nx), 0.6)
    jones = np.zeros((2, 2, nx, nx), complex)
    jones[0, 0] = a
    jones[1, 1] = b
    M = jones_to_mueller(jones, jones)
    assert M.shape == (4, 4, nx, nx)
    # kron structure: M[(i,k),(j,l)] = Jp[i,j] conj(Jq[k,l])
    np.testing.assert_allclose(M[0, 0].real, a * a, atol=1e-12)
    np.testing.assert_allclose(M[3, 3].real, b * b, atol=1e-12)
    np.testing.assert_allclose(M[1, 1].real, a * b, atol=1e-12)
    s = mueller_to_stokes_diag(M, "linear")
    np.testing.assert_allclose(s[0], a * a, atol=1e-12)
    np.testing.assert_allclose(s[1], 0.0, atol=1e-12)
    np.testing.assert_allclose(s[2], a * b, atol=1e-12)
    np.testing.assert_allclose(s[3], 0.0, atol=1e-12)
    sel = jones_beam_to_stokes(jones, product="IQ")
    assert sel.shape == (2, nx, nx)
    np.testing.assert_allclose(sel[0], s[0], atol=1e-12)
    # unit Jones: the I response is unity everywhere
    eye = np.zeros((2, 2, nx, nx), complex)
    eye[0, 0] = eye[1, 1] = 1.0
    np.testing.assert_allclose(jones_beam_to_stokes(eye, "I")[0], 1.0, atol=1e-12)


def test_reproject_beam_identity_and_shift():
    """Reprojection onto the same centre is the identity (inner pixels);
    onto an offset centre moves the boresight peak to the predicted
    pixel."""
    n = 97
    cell = np.deg2rad(0.02)
    lg = (np.arange(n) - n // 2) * cell
    ll, mm = np.meshgrid(lg, lg, indexing="ij")
    beam = cosine_taper_beam(ll, mm, 1.2e9)
    radec = (0.3, -0.5)
    same = reproject_beam(beam, cell, radec, radec, cell, n, n)
    assert np.abs(same - beam)[8:-8, 8:-8].max() < 1e-10
    # target centre offset by 10 pixels in dec: the peak lands 10 pixels off
    radec_t = (0.3, -0.5 + 10 * cell)
    shifted = reproject_beam(beam, cell, radec, radec_t, cell, n, n)
    i, j = np.unravel_index(np.argmax(shifted), shifted.shape)
    assert i == n // 2
    assert abs(j - (n // 2 - 10)) <= 1
    # multi-plane input broadcasts
    multi = reproject_beam(np.stack([beam, 0.5 * beam]), cell, radec, radec_t, cell, n, n)
    assert multi.shape == (2, n, n)
    np.testing.assert_allclose(multi[1], 0.5 * multi[0], atol=1e-12)


def test_parallactic_angles_poles():
    """At the celestial pole the parallactic angle tracks the hour angle's
    sign; the function is finite and continuous over a day."""
    from pfb_imaging_tpu.utils.astrometry import parallactic_angles

    t = np.linspace(0, 86164, 7)
    q = parallactic_angles(t, ra=0.2, dec=-0.6)
    assert q.shape == t.shape and np.isfinite(q).all()
    # a full sidereal day returns to the starting angle
    assert parallactic_angles(np.array([0.0]), 0.2, -0.6)[0] == pytest.approx(
        parallactic_angles(np.array([86164.0905]), 0.2, -0.6)[0], abs=1e-6
    )


def test_init_beam_model_selection(tmp_path):
    """`init --beam-model kbl` writes a katbeam-equivalent BEAM_SMALL even
    when the container has no beam_diameter; "none" suppresses it."""
    from pfb_imaging_tpu.core.init import init
    from pfb_imaging_tpu.core.simulate import simulate_vis_store
    from pfb_imaging_tpu.utils.store import open_store

    ms = str(tmp_path / "t.ms.tree")
    simulate_vis_store(ms, nant=5, ntime=2, nchan=2, nx=16)
    init(ms, str(tmp_path / "kb.xds"), beam_model="kbl")
    g = open_store(str(tmp_path / "kb.xds"))
    key = sorted(g.groups())[0]
    node = g.group(key)
    assert node.has("BEAM_SMALL")
    b = np.asarray(node.read("BEAM_SMALL"))
    assert b.max() == pytest.approx(1.0, abs=1e-6) and b.min() < 1.0

    init(ms, str(tmp_path / "nb.xds"), beam_model="none")
    node = open_store(str(tmp_path / "nb.xds")).group(key)
    assert not node.has("BEAM_SMALL")
