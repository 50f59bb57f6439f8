"""Image geometry and measurement-operator conventions.

The single source of truth for sign/offset conventions and image sizing,
mirroring the behaviour of the reference implementation
(/root/reference/src/pfb_imaging/operators/gridder.py:23-34 and
utils/misc.py:888-953) but with XLA/TPU-friendly grid sizes.

Convention (pinned by tests/test_conventions.py against an explicit DFT,
the same oracle the reference uses in tests/test_hessian_approx.py:44-68):

    vis[r, f] = sum_pix I[x, y] * exp(-2*pi*j * phase) / n
    phase = (su*u*l + sv*v*m - sw*w*(n - 1)) / lambda
    l(x)  = -l0 + (x - nx/2) * cellx
    m(y)  =  m0 + (y - ny/2) * celly
    n     = sqrt(1 - l^2 - m^2)

with (flip_u, flip_v, flip_w) = (False, True, False) i.e. (su, sv, sw) =
(+1, -1, +1), and phase-centre offsets x0 = -l0, y0 = -m0.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .constants import LIGHTSPEED


def wgridder_conventions(l0: float, m0: float):
    """Return (flip_u, flip_v, flip_w, x0, y0).

    Mirrors reference operators/gridder.py:23-34 (conventions documented in
    https://github.com/mreineck/ducc/issues/34). Stored in dataset attrs so
    all operators acting on a dataset agree.
    """
    return False, True, False, -l0, -m0


def conventions_signs(flip_u: bool = False, flip_v: bool = True, flip_w: bool = False):
    """Signs (su, sv, sw) entering the DFT phase for given flips."""
    return (-1.0 if flip_u else 1.0, -1.0 if flip_v else 1.0, -1.0 if flip_w else 1.0)


def good_size(n: int, even: bool = True) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) integer >= n.

    The reference uses ducc0.misc.good_size (7- and 11-smooth); XLA's FFTs
    are fastest on 5-smooth sizes so we restrict the factor set. With
    ``even`` the result is additionally forced even (reference requires even
    image sizes, utils/misc.py:928-931).
    """
    if n <= 2:
        return 2 if even else max(n, 1)
    best = None
    p2 = 1
    while p2 < 4 * n:
        p23 = p2
        while p23 < 4 * n:
            p235 = p23
            while p235 < n:
                p235 *= 5
            if (not even) or p235 % 2 == 0:
                if best is None or p235 < best:
                    best = p235
            p23 *= 3
        p2 *= 2
    return int(best)


@dataclasses.dataclass(frozen=True)
class ImageGeometry:
    """Static image geometry shared by all operators on a dataset."""

    nx: int
    ny: int
    nx_psf: int
    ny_psf: int
    cell_rad: float
    cell_deg: float
    cell_n: float  # Nyquist cell in radians
    l0: float = 0.0
    m0: float = 0.0

    @property
    def cellx(self) -> float:
        return self.cell_rad

    @property
    def celly(self) -> float:
        return self.cell_rad


def set_image_size(
    max_blength: float,
    max_freq: float,
    field_of_view: float,
    super_resolution_factor: float,
    cell_size: float | None = None,
    nx: int | None = None,
    ny: int | None = None,
    psf_oversize: float = 2.0,
    l0: float = 0.0,
    m0: float = 0.0,
) -> ImageGeometry:
    """Compute image geometry (reference utils/misc.py:888-953).

    The Nyquist cell is ``1 / (2 * max_blength * max_freq / c)``; the cell
    actually used divides it by ``super_resolution_factor`` unless an
    explicit ``cell_size`` (arcsec) is given. Pixel counts are rounded up to
    even 5-smooth sizes; the PSF grid is ``psf_oversize`` times larger.
    """
    cell_n = 1.0 / (2.0 * max_blength * max_freq / LIGHTSPEED)

    if cell_size is not None:
        cell_rad = cell_size * math.pi / 60 / 60 / 180
    else:
        cell_rad = cell_n / super_resolution_factor
        cell_size = cell_rad * 60 * 60 * 180 / math.pi

    cell_deg = math.degrees(cell_rad)

    if nx is None:
        fov_asec = field_of_view * 3600.0
        npix = int(fov_asec / cell_size)
        npix = good_size(npix, even=True)
        nx = npix
        ny = npix
    else:
        ny = ny if ny is not None else nx
        if nx % 2 or ny % 2:
            raise NotImplementedError("Only even numbers of pixels are supported")

    if psf_oversize:
        nx_psf = good_size(int(psf_oversize * nx), even=True)
        ny_psf = good_size(int(psf_oversize * ny), even=True)
    else:
        nx_psf = good_size(128, even=True)
        ny_psf = good_size(128, even=True)

    return ImageGeometry(
        nx=nx,
        ny=ny,
        nx_psf=nx_psf,
        ny_psf=ny_psf,
        cell_rad=cell_rad,
        cell_deg=cell_deg,
        cell_n=cell_n,
        l0=l0,
        m0=m0,
    )


def lm_grid(nx: int, ny: int, cellx: float, celly: float, l0: float = 0.0, m0: float = 0.0):
    """Per-pixel (l, m, n) arrays under the pinned convention.

    l runs along axis 0 (x), m along axis 1 (y):
        l[x] = -l0 + (x - nx/2) * cellx
        m[y] =  m0 + (y - ny/2) * celly
    """
    x = np.arange(nx) - nx // 2
    y = np.arange(ny) - ny // 2
    ell = -l0 + x * cellx
    emm = m0 + y * celly
    # broadcast views (read-only), not meshgrid copies: at 8k^2 the four
    # materialised meshgrid/intermediate arrays cost seconds per plan
    ll = np.broadcast_to(ell[:, None], (nx, ny))
    mm = np.broadcast_to(emm[None, :], (nx, ny))
    nn = np.sqrt(np.maximum(1.0 - ell[:, None] ** 2 - emm[None, :] ** 2, 0.0))
    return ll, mm, nn


def taperf(shape: tuple[int, int], taper_width: int) -> np.ndarray:
    """Cosine edge taper (reference utils/misc.py:968-976)."""
    tapers1d = []
    for npix in shape:
        taper = np.ones(npix)
        taper[:taper_width] = 0.5 * (1 + np.cos(np.linspace(1.1 * np.pi, 2 * np.pi, taper_width)))
        taper[-taper_width:] = 0.5 * (1 + np.cos(np.linspace(0, 0.9 * np.pi, taper_width)))
        tapers1d.append(taper)
    return np.outer(*tapers1d)


# ── Clean-beam fitting ────────────────────────────────────────────────


def _psf_errorsq(params, data, xy):
    """Sum-of-squares misfit of a rotated-Gaussian mainlobe model.

    Same parametrisation as the reference (utils/misc.py:505-527):
    (emaj, emin, pa) are FWHMs and position angle; the rotation matrix is
    the FITS-compatible form with t = pi/2 + pa.
    """
    import jax.numpy as jnp

    emaj, emin, pa = params
    amat = jnp.array([[1.0 / emaj**2, 0.0], [0.0, 1.0 / emin**2]])
    rmat = jnp.array([[-jnp.sin(pa), -jnp.cos(pa)], [jnp.cos(pa), -jnp.sin(pa)]])
    bmat = rmat @ amat @ rmat.T
    qvec = jnp.einsum("nb,bc,cn->n", xy.T, bmat, xy)
    fwhm_conv = 2 * jnp.sqrt(2 * jnp.log(2.0))
    model = jnp.exp(-0.5 * fwhm_conv**2 * qvec)
    res = data - model
    return jnp.vdot(res, res)


def fitcleanbeam(psf: np.ndarray, level: float = 0.5, pixsize: float = 1.0, nsigma: float = 10.0) -> np.ndarray:
    """Fit a Gaussian to the PSF mainlobe per band (reference utils/misc.py:529-629).

    Args:
        psf: (nband, nx, ny) PSF cube (peak assumed ~1 after normalisation).
        level: mainlobe identification level.
        pixsize: pixel size multiplying the fitted FWHMs.
        nsigma: fit radius in estimated major-axis standard deviations.

    Returns:
        (nband, 3) array of (emaj, emin, pa).
    """
    import jax
    from scipy.ndimage import label
    from scipy.optimize import fmin_l_bfgs_b

    nband, nx, ny = psf.shape
    x = -(nx // 2) + np.arange(nx)
    y = -(ny // 2) + np.arange(ny)
    xx, yy = np.meshgrid(x, y, indexing="ij")

    dfunc = jax.value_and_grad(_psf_errorsq)

    gausspars = []
    for v in range(nband):
        if not psf[v].any():
            gausspars.append([np.nan, np.nan, np.nan])
            continue
        psfv = psf[v] / psf[v].max()
        mask = np.where(psfv > level, 1.0, 0.0)
        islands, _ = label(mask)
        ncenter = islands[nx // 2, ny // 2]
        xs = xx[islands == ncenter]
        ys = yy[islands == ncenter]

        psftmp = psfv[islands == ncenter]
        wsum = psftmp.sum()
        dx = xs - np.sum(psftmp * xs) / wsum
        dy = ys - np.sum(psftmp * ys) / wsum
        mxx = np.sum(psftmp * dx**2) / wsum
        myy = np.sum(psftmp * dy**2) / wsum
        mxy = np.sum(psftmp * dx * dy) / wsum
        pa0 = float(np.clip(np.pi / 2 + 0.5 * np.arctan2(2 * mxy, mxx - myy), 0.0, np.pi))

        t = np.pi / 2 + pa0
        ct, st = np.cos(t), np.sin(t)
        dx_rot = ct * dx + st * dy
        dy_rot = -st * dx + ct * dy
        emaj0 = max(dx_rot.max() - dx_rot.min(), 1.0)
        emin0 = max(dy_rot.max() - dy_rot.min(), 1.0)

        fwhm_conv = 2 * np.sqrt(2 * np.log(2))
        sigma_est = emaj0 / fwhm_conv
        idxs = (xx**2 + yy**2) < (nsigma * sigma_est) ** 2
        data = psfv[idxs]
        xy = np.vstack((xx[idxs], yy[idxs]))

        def f(p, _data=data, _xy=xy):
            val, grad = dfunc(p, _data, _xy)
            return float(val), np.asarray(grad, dtype=np.float64)

        p, _, d = fmin_l_bfgs_b(
            f,
            np.array((emaj0, emin0, pa0), dtype=np.float64),
            bounds=((0, None), (0, None), (0, np.pi)),
            factr=1e7,
        )
        if p[0] >= p[1]:
            emaj, emin, pa = p[0], p[1], p[2]
        else:
            emaj, emin, pa = p[1], p[0], p[2] + np.pi / 2
        gausspars.append([emaj * pixsize, emin * pixsize, pa])

    return np.array(gausspars)


def gaussian_kernel(xx: np.ndarray, yy: np.ndarray, gaussparf, normalise: bool = True) -> np.ndarray:
    """Render a rotated Gaussian with FWHM parameters on a pixel grid.

    Used by restore (convolve model with the clean beam) and by
    Gaussian-ratio convolution kernels (reference utils/misc.py:123-193).
    """
    emaj, emin, pa = gaussparf
    cosp, sinp = np.cos(pa), np.sin(pa)
    xr = -sinp * xx - cosp * yy
    yr = cosp * xx - sinp * yy
    fwhm_conv = 2 * np.sqrt(2 * np.log(2))
    q = (xr / emaj) ** 2 + (yr / emin) ** 2
    g = np.exp(-0.5 * fwhm_conv**2 * q)
    if normalise:
        s = g.sum()
        if s > 0:
            g = g / s
    return g
