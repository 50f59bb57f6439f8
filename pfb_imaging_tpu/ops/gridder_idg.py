"""Image-domain gridding (IDG) — the MXU-native measurement operator.

Stencil-scatter gridding is bound by per-visibility serial work on TPU
(~120 cycles/vis floor, docs/perf.md). This module restructures gridding so
that ALL per-visibility work is dense batched linear algebra:

  1. visibilities are bucketed (host-side, at plan time) into ``half``-cell
     uv tiles; each non-empty tile chunk of <= G visibilities becomes a
     *group* whose uv footprint fits an S x S subgrid patch;
  2. per group, the patch's *spatial* samples are a (S, G) x (G, S) complex
     matmul against per-visibility phase matrices — batched over groups,
     i.e. MXU work;
  3. an S-point FFT of each tapered patch yields the patch's uv samples;
  4. patches are segment-summed onto a dense bucket lattice and assembled
     onto the big grid by a dense overlap-add — no scatter anywhere.

Replaces the reference's ducc0 ``vis2dirty``/``dirty2vis``
(reference operators/gridder.py:37-144) under the same pinned phase
conventions (geometry.py, ops/dft.py), re-derived for TPU — not a port.

Two design elements carry the accuracy (round-2 rework):

  * **Free-taper separable fit.** The subgrid taper ``c`` is NOT tied to an
    ES kernel (whose support-edge sqrt singularity floors a trig-poly fit
    at ~3e-3). Instead ``c`` and a free band response T(xi) are optimised
    jointly: minimise the deviation of the patch's image response from
    T(xi) e^{2 pi i du xi} over the offset range and image band (a
    generalised eigenproblem). At S=16, half=8 the worst-case per-vis
    response error is ~1e-6 with T conditioning ~9; the image correction
    is 1/T (complex), applied like the classic taper correction.
  * **w-bins + per-visibility quadratic chirp** (instead of the w-kernel of
    improved w-stacking, which multiplies per-vis work by the w-support).
    w is split as w = w_c + dw: the bin centre w_c is applied EXACTLY as an
    image screen e^{±2 pi i w_c (n-1)}; the per-vis residual dw couples
    through the Taylor expansion of n-1 at the field centre — its constant
    folds into the per-vis phase, its linear terms shift the effective
    (u, v), and its quadratic terms become a separable chirp folded into
    the same phase matrices (fit trained over the chirp budget). The
    uncaptured remainder (quartic + l-m cross term) bounds the bin width;
    bins are cheap (one big FFT each) and per-vis work is w-independent.

Accuracy envelope: epsilon >= ~2e-6 (S=16, half=8). For tighter epsilon
use the classic ES-kernel gridder (ops/gridder.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import LIGHTSPEED
from ..geometry import conventions_signs, good_size, lm_grid

__all__ = ["IDGPlan", "plan_idg", "vis2dirty_idg", "dirty2vis_idg"]

CHIRP_BUDGET = 0.1  # max |image chirp phase| (rad) the taper fit absorbs


# ── free-taper separable fit ─────────────────────────────────────────

_FIT_CACHE: dict = {}


def _fit_rows(S, xis, dus, phis, xc, ks, F):
    """Demodulated response rows: R(xi; du, phi) = row . c."""
    blocks = []
    for xi in xis:
        M = np.exp(2j * np.pi * ks * xi) @ F  # (x,)
        rows = []
        for du in dus:
            for phi in phis:
                a = np.exp(2j * np.pi * xc * du / S + 1j * phi * xc**2)
                demod = np.exp(-2j * np.pi * du * xi - 1j * phi * (xi * S) ** 2)
                rows.append(M * a * demod)
        blocks.append(np.array(rows))
    return blocks


def fit_taper(S: int, half: int, ximax: float, chirp_max: float = CHIRP_BUDGET):
    """Joint (taper c, band response T) optimisation.

    Minimises sum_xi var_du,phi(demodulated response) / response energy —
    a generalised eigenproblem — so the patch response separates as
    T(xi) e^{2 pi i du xi + i phi (S xi)^2} to ~1e-6 worst case at
    (S=16, half=8, ximax=0.26). Returns (c, T_of_xi, err) where T_of_xi
    maps an array of image frequencies to the (complex) band response.
    """
    key = (S, half, round(ximax, 4), round(chirp_max, 4))
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]
    k0_off = (S - half) // 2
    xc = np.fft.fftfreq(S) * S
    ks = np.arange(S)
    F = np.exp(-2j * np.pi * np.outer(ks, xc) / S)
    nxi = 2 * int(S * ximax * 4) + 9
    xis = np.linspace(-ximax, ximax, nxi)
    dus = np.linspace(k0_off, k0_off + half, 33)
    phimax = chirp_max / (S * ximax) ** 2 if chirp_max > 0 else 0.0
    phis = np.linspace(-phimax, phimax, 7) if chirp_max > 0 else [0.0]
    H = np.zeros((S, S), complex)
    G = np.zeros((S, S), complex)
    for B in _fit_rows(S, xis, dus, phis, xc, ks, F):
        mean = B.mean(axis=0)
        Bc = B - mean
        H += Bc.conj().T @ Bc
        G += np.outer(mean.conj(), mean)
    reg = 1e-8 * np.trace(G).real / S
    w, V = np.linalg.eig(np.linalg.solve(G + reg * np.eye(S), H))
    c = V[:, np.argmin(w.real)]

    # validation on an off-grid denser set
    dus_v = np.linspace(k0_off + 0.0137, k0_off + half - 0.0119, 71)
    phis_v = np.linspace(-phimax, phimax, 11) if chirp_max > 0 else [0.0]
    xis_v = np.linspace(-ximax * 0.999, ximax * 0.999, 2 * nxi + 7)
    errs, Ts = [], []
    for B in _fit_rows(S, xis_v, dus_v, phis_v, xc, ks, F):
        r = B @ c
        Ts.append(r.mean())
        errs.append(np.abs(r - r.mean()).max())
    scale = np.abs(Ts).max()
    err = max(errs) / scale
    # normalise so T(0) ~ 1 (pure convention; keeps grids O(vis))
    t0 = Ts[len(Ts) // 2]
    c = c / t0

    def T_of_xi(xi_arr):
        xi_arr = np.atleast_1d(np.asarray(xi_arr, np.float64))
        du_ref = np.linspace(k0_off + 0.1, k0_off + half - 0.1, 5)
        out = np.zeros(xi_arr.shape, complex)
        for i, xi in enumerate(xi_arr):
            M = np.exp(2j * np.pi * ks * xi) @ F
            acc = 0.0
            for du in du_ref:
                a = np.exp(2j * np.pi * xc * du / S)
                acc += (M * a) @ c * np.exp(-2j * np.pi * du * xi)
            out[i] = acc / du_ref.size
        return out

    _FIT_CACHE[key] = (c, T_of_xi, err)
    return _FIT_CACHE[key]


# ── plan ─────────────────────────────────────────────────────────────


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "au_re",
        "au_im",
        "av_re",
        "av_im",
        "cg_idx",
        "bid",
        "inv_orig",
        "phase_re",
        "phase_im",
        "corr_re",
        "corr_im",
        "nm1",
    ],
    meta_fields=[
        "nx",
        "ny",
        "nbig_x",
        "nbig_y",
        "S",
        "half",
        "G",
        "ngroups",
        "nbu",
        "nbv",
        "k0_off",
        "nrow",
        "nchan",
        "nbins",
        "bin_gstart",
        "bin_gcount",
        "bin_wc",
        "do_wgridding",
    ],
)
@dataclasses.dataclass(frozen=True)
class IDGPlan:
    """Static plan + device arrays for one (uvw, freq) layout (IDG path).

    Registered pytree: per-bin group ranges and bin centres are *static*
    metadata so the runtime uses only static slices (no dynamic shapes).
    """

    # static
    nx: int
    ny: int
    nbig_x: int
    nbig_y: int
    S: int
    half: int
    G: int
    ngroups: int
    nbu: int
    nbv: int
    k0_off: int
    nrow: int
    nchan: int
    nbins: int
    bin_gstart: tuple  # per-bin start into the group arrays
    bin_gcount: tuple
    bin_wc: tuple  # per-bin centre w (wavelengths)
    do_wgridding: bool
    # device arrays
    au_re: jnp.ndarray  # (ng, S, G) A_u incl. taper c_u
    au_im: jnp.ndarray
    av_re: jnp.ndarray  # (ng, S, G) A_v incl. taper c_v
    av_im: jnp.ndarray
    cg_idx: jnp.ndarray  # (ng, G) int32 ORIGINAL flat (row*chan) index of
    #                       each slot (sentinel nvis -> appended zero row):
    #                       the single combined sort+group gather
    bid: jnp.ndarray  # (ng,) int32 bucket id bu*nbv+bv (lattice cell)
    inv_orig: jnp.ndarray  # (nvis,) original flat index -> flat (g*G+slot)
    phase_re: jnp.ndarray  # (ng, G) forward per-vis phase, group layout
    phase_im: jnp.ndarray
    corr_re: jnp.ndarray  # (nx, ny) complex image correction 1/(Tu Tv) [/n]
    corr_im: jnp.ndarray
    nm1: jnp.ndarray  # (nx, ny) n-1 (exact, for the bin screens)


def _good_multiple(n: int, m: int) -> int:
    """Smallest 5-smooth size >= n that is a multiple of m."""
    s = good_size(n)
    while s % m:
        s = good_size(s + 1)
    return s


def plan_idg(
    uvw: np.ndarray,
    freq: np.ndarray,
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
    epsilon: float = 1e-5,
    do_wgridding: bool = True,
    divide_by_n: bool = True,
    sigma: float = 2.0,
    dtype=np.float64,
    subgrid: int = 16,
    half: int = 8,
    group_size: int = 64,
    max_bins: int = 4096,
    force_w_range: tuple | None = None,
    bin_gcap: tuple | None = None,
    count_only: bool = False,
) -> IDGPlan:
    """Host-side IDG planning: bucketing, taper fit, phase matrices, bins.

    Mirrors ``plan_wgridder``'s signature/conventions (ops/gridder.py).

    SPMD-uniformity hooks (plan_idg_sharded, parallel/sharded.py): pass
    ``force_w_range=(wmin, wmax, nbins)`` so row shards share one bin grid,
    ``bin_gcap`` (per-bin group capacities) to pad every shard to a common
    static group layout, and ``count_only=True`` for a cheap first pass
    that returns (nbins, bin_gcount, (wmin, wmax)) without building the
    phase matrices.
    """
    uvw = np.asarray(uvw, np.float64)
    freq = np.asarray(freq, np.float64)
    nrow, nchan = uvw.shape[0], freq.shape[0]
    su, sv, sw = conventions_signs(flip_u, flip_v, flip_w)
    S, G = int(subgrid), int(group_size)
    half = int(half)
    if S % half:
        raise ValueError("subgrid must be a multiple of half")
    k0_off = (S - half) // 2

    nbig_x = _good_multiple(max(int(np.ceil(sigma * nx)), nx + 2 * S), half)
    nbig_y = _good_multiple(max(int(np.ceil(sigma * ny)), ny + 2 * S), half)
    nbu = nbig_x // half
    nbv = nbig_y // half

    invlam = freq / LIGHTSPEED
    u_l = su * np.multiply.outer(uvw[:, 0], invlam)
    v_l = sv * np.multiply.outer(uvw[:, 1], invlam)
    w_l = sw * np.multiply.outer(uvw[:, 2], invlam)
    u_pix = (u_l * cellx * nbig_x).ravel()
    v_pix = (v_l * celly * nbig_y).ravel()
    w_lam = w_l.ravel()
    nvis = u_pix.size

    # phase-centre shift (forward): e^{-2 pi i (u' lshift + v' mshift)}
    shift_cycles = u_l.ravel() * (-l0) + v_l.ravel() * m0
    phase_fwd = np.exp(-2j * np.pi * shift_cycles)

    _, _, nn = lm_grid(nx, ny, cellx, celly, l0, m0)
    nm1 = nn - 1.0

    # ── w handling: Taylor expansion of n-1 at the field centre ──────
    # n-1 = alpha + bl*dl + bm*dm + gl*dl^2 + gm*dm^2 + rho(l, m)
    do_w = bool(do_wgridding) and bool(np.any(np.abs(w_lam) > 0))
    # the image centre sits at (l, m) = (-l0, +m0) (geometry.lm_grid)
    cl, cm = -l0, m0
    n0 = float(np.sqrt(max(1.0 - cl * cl - cm * cm, 1e-12)))
    alpha = n0 - 1.0
    bl, bm = -cl / n0, -cm / n0
    gl = -(1.0 - cm * cm) / (2.0 * n0**3)
    gm = -(1.0 - cl * cl) / (2.0 * n0**3)
    jx = (np.arange(nx) - nx // 2) * cellx
    jy = (np.arange(ny) - ny // 2) * celly
    dl2d, dm2d = np.meshgrid(jx, jy, indexing="ij")
    taylor2 = alpha + bl * dl2d + bm * dm2d + gl * dl2d**2 + gm * dm2d**2
    resid_max = float(np.abs(nm1 - taylor2).max())

    if force_w_range is not None:
        do_w = True
    if do_w:
        wmin, wmax = float(w_lam.min()) if w_lam.size else 0.0, float(w_lam.max()) if w_lam.size else 0.0
        if force_w_range is not None:
            fw0, fw1, fnb = force_w_range
            if w_lam.size and (wmin < fw0 - 1e-9 or wmax > fw1 + 1e-9):
                raise ValueError("force_w_range does not cover this shard's w range")
            wmin, wmax = float(fw0), float(fw1)
        ximax_x = nx / (2.0 * nbig_x) + 0.01
        ximax_y = ny / (2.0 * nbig_y) + 0.01
        # bin halfwidth constraints: residual phase and chirp budget
        tol_resid = max(epsilon / 3.0, 1e-13)
        c1 = tol_resid / (2.0 * np.pi * resid_max) if resid_max > 0 else np.inf
        chirp_l = 2.0 * np.pi * abs(gl) * (nbig_x * cellx * ximax_x) ** 2
        chirp_m = 2.0 * np.pi * abs(gm) * (nbig_y * celly * ximax_y) ** 2
        c2 = CHIRP_BUDGET / max(chirp_l, chirp_m)
        delta = min(c1, c2)
        nbins = max(1, int(np.ceil((wmax - wmin) / (2.0 * delta)))) if wmax > wmin else 1
        if force_w_range is not None:
            nbins = int(force_w_range[2])
        if nbins > max_bins:
            raise ValueError(
                f"IDG needs {nbins} w-bins (> {max_bins}); field too wide — use the classic w-stacking gridder"
            )
        edges = np.linspace(wmin, wmax, nbins + 1)
        wc = 0.5 * (edges[:-1] + edges[1:])
        # clamp the top edge into the last bin
        bin_of = np.clip(np.searchsorted(edges, w_lam, side="right") - 1, 0, nbins - 1)
        dw = w_lam - wc[bin_of]
    else:
        nbins = 1
        wc = np.zeros(1)
        bin_of = np.zeros(nvis, np.int64)
        dw = np.zeros(nvis)

    # fold the dw Taylor terms into per-vis quantities:
    #   constant: forward phase e^{+2 pi i dw alpha}
    #   linear:   u_eff = u_pix - dw * bl * nbig_x * cellx (adjoint wants
    #             e^{-2 pi i dw bl dl}; response carries e^{+2 pi i du xi})
    #   quadratic: separable chirp phi_axis = -2 pi dw g (nbig cell)^2/S^2
    phase_fwd = phase_fwd * np.exp(2j * np.pi * dw * alpha)
    u_eff = u_pix - dw * bl * nbig_x * cellx
    v_eff = v_pix - dw * bm * nbig_y * celly
    phi_u = -2.0 * np.pi * dw * gl * (nbig_x * cellx) ** 2 / S**2
    phi_v = -2.0 * np.pi * dw * gm * (nbig_y * celly) ** 2 / S**2

    # ── bucketing + grouping (vectorised host pass) ──────────────────
    um = np.mod(u_eff, nbig_x)
    vm = np.mod(v_eff, nbig_y)
    bu = np.minimum((um // half).astype(np.int64), nbu - 1)
    bv = np.minimum((vm // half).astype(np.int64), nbv - 1)
    key = (bin_of * nbu + bu) * nbv + bv
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, starts, counts = np.unique(key_s, return_index=True, return_counts=True)
    gper = -(-counts // G)  # ceil
    gbase = np.concatenate([[0], np.cumsum(gper)])
    ng = int(gbase[-1])
    # position of each sorted vis within its bucket
    pos = np.arange(nvis) - np.repeat(starts, counts)
    bucket_rank = np.repeat(np.arange(uniq.size), counts)
    g_of = gbase[bucket_rank] + pos // G
    slot_of = pos % G

    # combined gather index: group slot -> ORIGINAL flat (row*chan) index
    cg_idx = np.full((ng, G), nvis, np.int64)
    cg_idx[g_of, slot_of] = order
    du_g = np.zeros((ng, G))
    dv_g = np.zeros((ng, G))
    phiu_g = np.zeros((ng, G))
    phiv_g = np.zeros((ng, G))
    bu_s = bu[order]
    bv_s = bv[order]
    du_g[g_of, slot_of] = um[order] - (bu_s * half - k0_off)
    dv_g[g_of, slot_of] = vm[order] - (bv_s * half - k0_off)
    phiu_g[g_of, slot_of] = phi_u[order]
    phiv_g[g_of, slot_of] = phi_v[order]
    # per-group bucket id and bin (all rows of a group share them)
    bid_g = np.zeros(ng, np.int64)
    bin_g = np.zeros(ng, np.int64)
    bid_g[g_of] = bu_s * nbv + bv_s
    bin_g[g_of] = bin_of[order]
    # per-bin group ranges (groups are bin-sorted because key is)
    bin_gstart = np.searchsorted(bin_g, np.arange(nbins), side="left")
    bin_gend = np.searchsorted(bin_g, np.arange(nbins), side="right")
    bin_gcount = bin_gend - bin_gstart

    if count_only:
        wlo = float(w_lam.min()) if (do_w and w_lam.size) else 0.0
        whi = float(w_lam.max()) if (do_w and w_lam.size) else 0.0
        return nbins, tuple(int(x) for x in bin_gcount), (wlo, whi)

    if bin_gcap is not None:
        # pad every bin's group block to its forced capacity: sentinel
        # groups (all slots empty, bucket 0) make the layout identical
        # across row shards so ONE SPMD program serves them all
        bin_gcap = tuple(int(x) for x in bin_gcap)
        if any(c < int(n) for c, n in zip(bin_gcap, bin_gcount)):
            raise ValueError("bin_gcap smaller than this shard's group count")
        new_start = np.concatenate([[0], np.cumsum(bin_gcap)])[:-1]
        new_ng = int(sum(bin_gcap))
        remap = np.zeros(ng, np.int64)
        for b in range(nbins):
            s, c = bin_gstart[b], bin_gcount[b]
            remap[s : s + c] = new_start[b] + np.arange(c)

        def _pad_groups(arr, fill):
            shp = (new_ng,) + arr.shape[1:]
            out = np.full(shp, fill, arr.dtype)
            out[remap] = arr
            return out

        cg_idx = _pad_groups(cg_idx, nvis)
        du_g = _pad_groups(du_g, 0.0)
        dv_g = _pad_groups(dv_g, 0.0)
        phiu_g = _pad_groups(phiu_g, 0.0)
        phiv_g = _pad_groups(phiv_g, 0.0)
        bid_g = _pad_groups(bid_g, 0)
        g_of = remap[g_of]
        ng = new_ng
        bin_gstart = new_start
        bin_gcount = np.asarray(bin_gcap, np.int64)

    # inverse map for degrid: ORIGINAL flat index -> flat (g*G + slot)
    # (g_of/slot_of are indexed by sorted position; order maps back)
    inv_orig = np.empty(nvis, np.int64)
    inv_orig[order] = g_of * G + slot_of
    # forward per-vis phase in group layout (sentinel slots get 0 so the
    # padded row contributes nothing either way)
    phase_g = np.zeros((ng, G), np.complex128)
    phase_g[g_of, slot_of] = phase_fwd[order]

    # ── taper fit + phase matrices ───────────────────────────────────
    ximax_x = nx / (2.0 * nbig_x) + 0.01
    ximax_y = ny / (2.0 * nbig_y) + 0.01
    chirp = CHIRP_BUDGET if do_w else 0.0
    cu, Tu_fn, err_u = fit_taper(S, half, ximax_x, chirp)
    cv, Tv_fn, err_v = fit_taper(S, half, ximax_y, chirp)

    xc = np.fft.fftfreq(S) * S
    rdt = np.float32 if dtype == np.float32 else np.float64

    def build_A(du, phi, c1d):
        # (ng, S, G) = c[x] * exp(i(2 pi du x / S + phi x^2)), chunked
        out_re = np.empty((ng, S, G), rdt)
        out_im = np.empty((ng, S, G), rdt)
        chunk = max(1, (1 << 22) // (S * G))
        for i in range(0, ng, chunk):
            ph = (
                2.0 * np.pi / S * np.einsum("gv,x->gxv", du[i : i + chunk], xc)
                + np.einsum("gv,x->gxv", phi[i : i + chunk], xc**2)
            )
            block = c1d[None, :, None] * np.exp(1j * ph)
            out_re[i : i + chunk] = block.real
            out_im[i : i + chunk] = block.imag
        return out_re, out_im

    au_re, au_im = build_A(du_g, phiu_g, cu)
    av_re, av_im = build_A(dv_g, phiv_g, cv)

    # ── image correction: 1/(Tu(xi_x) Tv(xi_y)) [ / n ] ──────────────
    xix = (np.arange(nx) - nx // 2) / nbig_x
    xiy = (np.arange(ny) - ny // 2) / nbig_y
    Tu = Tu_fn(xix)
    Tv = Tv_fn(xiy)
    corr = 1.0 / np.outer(Tu, Tv)
    if divide_by_n:
        with np.errstate(divide="ignore"):
            corr = np.where(nn > 0, corr / nn, 0.0)

    idx_t = np.int32
    host = lambda a, t: np.ascontiguousarray(np.asarray(a), dtype=t)  # noqa: E731
    return IDGPlan(
        nx=nx,
        ny=ny,
        nbig_x=nbig_x,
        nbig_y=nbig_y,
        S=S,
        half=half,
        G=G,
        ngroups=ng,
        nbu=nbu,
        nbv=nbv,
        k0_off=k0_off,
        nrow=nrow,
        nchan=nchan,
        nbins=nbins,
        bin_gstart=tuple(int(x) for x in bin_gstart),
        bin_gcount=tuple(int(x) for x in bin_gcount),
        bin_wc=tuple(float(x) for x in wc),
        do_wgridding=do_w,
        au_re=jnp.asarray(au_re),
        au_im=jnp.asarray(au_im),
        av_re=jnp.asarray(av_re),
        av_im=jnp.asarray(av_im),
        cg_idx=jnp.asarray(host(cg_idx, idx_t)),
        bid=jnp.asarray(host(bid_g, idx_t)),
        inv_orig=jnp.asarray(host(inv_orig, idx_t)),
        phase_re=jnp.asarray(host(phase_g.real, rdt)),
        phase_im=jnp.asarray(host(phase_g.imag, rdt)),
        corr_re=jnp.asarray(host(corr.real, rdt)),
        corr_im=jnp.asarray(host(corr.imag, rdt)),
        nm1=jnp.asarray(host(nm1, rdt)),
    )


# ── runtime: adjoint (vis -> dirty) ──────────────────────────────────


def _cplx(re, im):
    return jax.lax.complex(re, im)


def _crop(plan, big):
    px0 = plan.nbig_x // 2 - plan.nx // 2
    py0 = plan.nbig_y // 2 - plan.ny // 2
    return big[px0 : px0 + plan.nx, py0 : py0 + plan.ny]


def _pad(plan, img):
    px0 = plan.nbig_x // 2 - plan.nx // 2
    py0 = plan.nbig_y // 2 - plan.ny // 2
    out = jnp.zeros((plan.nbig_x, plan.nbig_y), img.dtype)
    return out.at[px0 : px0 + plan.nx, py0 : py0 + plan.ny].set(img)


@jax.jit
def _idg_prepare(plan: IDGPlan, vis_re, vis_im, wgt, mask):
    """Weighted, conj-phased, group-gathered values: (2, ng, G).

    ONE row-gather (the combined sort+group permutation, plan.cg_idx) —
    random-access gathers are ~10 ns/element on the TPU (docs/perf.md
    microbenchmarks), so the permutation is collapsed into a single pass
    over (re, im) row pairs. The production major cycle avoids even this
    via the *_grouped variants.
    """
    rdt = plan.phase_re.dtype
    wre = vis_re.astype(rdt).reshape(-1)
    wim = vis_im.astype(rdt).reshape(-1)
    if wgt is not None:
        w = wgt.astype(rdt).reshape(-1)
        wre = wre * w
        wim = wim * w
    if mask is not None:
        m = mask.astype(rdt).reshape(-1)
        wre = wre * m
        wim = wim * m
    rows = jnp.stack([wre, wim], axis=-1)  # (nvis, 2)
    rows = jnp.concatenate([rows, jnp.zeros((1, 2), rdt)])
    g = rows[plan.cg_idx]  # (ng, G, 2) single row-gather
    # multiply by conj(forward phase), group layout
    pre, pim = plan.phase_re, plan.phase_im
    vre = g[..., 0] * pre + g[..., 1] * pim
    vim = g[..., 1] * pre - g[..., 0] * pim
    return jnp.stack([vre, vim])


def _n_chunks(plan) -> int:
    """Static chunk count bounding the per-chunk einsum transients (the
    (chunk, S, G) complex intermediate) to ~256 MB."""
    bytes_per_group = plan.S * plan.G * 8
    return max(1, -(-plan.ngroups * bytes_per_group // (1 << 28)))


def _chunk_bounds(plan):
    nc = _n_chunks(plan)
    step = -(-plan.ngroups // nc)
    return [(i, min(i + step, plan.ngroups)) for i in range(0, plan.ngroups, step)]


@jax.jit
def _idg_patches_uv(plan: IDGPlan, vals):
    """(ng, S, S) complex patch uv samples from group values (adjoint).

    Chunked over groups so the (chunk, S, G) complex intermediates stay a
    fraction of HBM (an unchunked 8M-vis call OOM'd at 4096^2)."""
    Au = _cplx(plan.au_re, plan.au_im)
    Av = _cplx(plan.av_re, plan.av_im)
    V = _cplx(vals[0], vals[1])
    outs = []
    for s, e in _chunk_bounds(plan):
        B = Av[s:e] * V[s:e, None, :]
        spatial = jnp.einsum("gxv,gyv->gxy", Au[s:e], B, precision=jax.lax.Precision.HIGHEST)
        outs.append(jnp.fft.fft2(spatial))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _screen(plan, wc, sign, dtype):
    ph = (sign * 2.0 * jnp.pi * wc) * plan.nm1
    return _cplx(jnp.cos(ph).astype(plan.nm1.dtype), jnp.sin(ph).astype(plan.nm1.dtype)).astype(dtype)


def _assemble_bin(plan, p_b, bid_b):
    """Patches of one bin -> big grid, via r^2 quarter-block scatters.

    Memory-lean replacement for the (nbu*nbv, S, S) lattice (which is
    r^2 x the grid size and OOM'd 4096^2/8M-vis calls): each (a, b) shift
    scatters its (half, half) patch quarter into a grid-sized dense slab.
    """
    half, S = plan.half, plan.S
    r = S // half
    nbu, nbv = plan.nbu, plan.nbv
    ext_u = (nbu + r - 1) * half
    ext_v = (nbv + r - 1) * half
    out = jnp.zeros((ext_u, ext_v), p_b.dtype)
    for a in range(r):
        for b in range(r):
            q = p_b[:, a * half : (a + 1) * half, b * half : (b + 1) * half]
            slab = jnp.zeros((nbu * nbv, half, half), p_b.dtype).at[bid_b].add(q)
            dense = slab.reshape(nbu, nbv, half, half).transpose(0, 2, 1, 3).reshape(nbu * half, nbv * half)
            out = out.at[a * half : a * half + nbu * half, b * half : b * half + nbv * half].add(dense)
    # periodic fold (absolute cell of out index t is t - k0_off)
    ko = plan.k0_off
    nbx, nby = plan.nbig_x, plan.nbig_y
    fu = out[ko : ko + nbx, :]
    fu = fu.at[nbx - ko :, :].add(out[:ko, :])
    if ext_u - nbx - ko > 0:
        fu = fu.at[: ext_u - nbx - ko, :].add(out[ko + nbx :, :])
    fv = fu[:, ko : ko + nby]
    fv = fv.at[:, nby - ko :].add(fu[:, :ko])
    if ext_v - nby - ko > 0:
        fv = fv.at[:, : ext_v - nby - ko].add(fu[:, ko + nby :])
    return fv


@jax.jit
def _idg_accumulate_bins(plan: IDGPlan, patches):
    """Sum per-bin images: quarter-scatter -> fold -> iFFT -> screen."""
    cdt = patches.dtype
    acc = None
    for b in range(plan.nbins):
        gs, gc = plan.bin_gstart[b], plan.bin_gcount[b]
        if gc == 0:
            continue
        grid = _assemble_bin(plan, patches[gs : gs + gc], plan.bid[gs : gs + gc])
        big = jnp.fft.ifft2(grid) * (plan.nbig_x * plan.nbig_y)
        a = _crop(plan, jnp.fft.fftshift(big))
        if plan.do_wgridding:
            a = a * _screen(plan, plan.bin_wc[b], -1.0, cdt)
        acc = a if acc is None else acc + a
    if acc is None:
        acc = jnp.zeros((plan.nx, plan.ny), cdt)
    return acc


@jax.jit
def _idg_finish(plan: IDGPlan, acc):
    corr = _cplx(plan.corr_re, plan.corr_im)
    return jnp.real(acc * corr)


@jax.jit
def _vis2dirty_idg_impl(plan: IDGPlan, vis_re, vis_im, wgt, mask):
    """Whole adjoint in ONE jitted program (one dispatch — the tunnelled
    runtime adds ~8 ms per dispatch, docs/perf.md)."""
    vals = _idg_prepare(plan, vis_re, vis_im, wgt, mask)
    patches = _idg_patches_uv(plan, vals)
    acc = _idg_accumulate_bins(plan, patches)
    return _idg_finish(plan, acc)


@jax.jit
def vis2dirty_idg_grouped(plan: IDGPlan, vals):
    """Adjoint from group-layout values (2, ng, G) — zero gathers.

    The production major cycle keeps the visibility stream in group
    layout end-to-end (weights/data pre-permuted once per dataset), so
    repeated residual evaluations never pay the permutation.
    """
    patches = _idg_patches_uv(plan, vals)
    acc = _idg_accumulate_bins(plan, patches)
    return _idg_finish(plan, acc)


def vis2dirty_idg(plan: IDGPlan, vis, wgt=None, mask=None, vis_im=None):
    """Grid (nrow, nchan) visibilities to an (nx, ny) dirty image (adjoint).

    ``vis`` may be complex, or the real part with ``vis_im`` imaginary
    (runtimes without complex host->device transfers).
    """
    if vis_im is None:
        vis_re, vis_im = jnp.real(vis), jnp.imag(vis)
    else:
        vis_re = vis
    return _vis2dirty_idg_impl(plan, vis_re, vis_im, wgt, mask)


# ── runtime: forward (dirty -> vis), exact conj-transpose ────────────


def _extract_bin(plan, grid, bid_b):
    """Transpose of ``_assemble_bin``: per-group S x S patches from the grid."""
    half, S = plan.half, plan.S
    r = S // half
    nbu, nbv = plan.nbu, plan.nbv
    ko = plan.k0_off
    nbx, nby = plan.nbig_x, plan.nbig_y
    ext_u = (nbu + r - 1) * half
    ext_v = (nbv + r - 1) * half
    # exact transpose of the two-axis fold: read the grid periodically
    fu = jnp.concatenate(
        [grid[nbx - ko :, :], grid] + ([grid[: ext_u - nbx - ko, :]] if ext_u - nbx - ko > 0 else []),
        axis=0,
    )
    out = jnp.concatenate(
        [fu[:, nby - ko :], fu] + ([fu[:, : ext_v - nby - ko]] if ext_v - nby - ko > 0 else []),
        axis=1,
    )
    gc = bid_b.shape[0]
    patches = jnp.zeros((gc, S, S), grid.dtype)
    for a in range(r):
        for b in range(r):
            dense = out[a * half : a * half + nbu * half, b * half : b * half + nbv * half]
            slab = dense.reshape(nbu, half, nbv, half).transpose(0, 2, 1, 3).reshape(nbu * nbv, half, half)
            patches = patches.at[:, a * half : (a + 1) * half, b * half : (b + 1) * half].set(slab[bid_b])
    return patches


@jax.jit
def _idg_bins_to_grid_patches(plan: IDGPlan, image):
    """Forward: image -> per-group patch uv samples (conj-transpose path)."""
    rdt = plan.phase_re.dtype
    cdt = jnp.complex64 if rdt == jnp.float32 else jnp.complex128
    corr = _cplx(plan.corr_re, plan.corr_im)
    y = image.astype(rdt).astype(cdt) * jnp.conj(corr)
    patches = None
    for b in range(plan.nbins):
        gs, gc = plan.bin_gstart[b], plan.bin_gcount[b]
        if gc == 0:
            continue
        yb = y * _screen(plan, plan.bin_wc[b], 1.0, cdt) if plan.do_wgridding else y
        grid = jnp.fft.fft2(jnp.fft.ifftshift(_pad(plan, yb)))
        p_b = _extract_bin(plan, grid, plan.bid[gs : gs + gc])
        patches = p_b if patches is None else jnp.concatenate([patches, p_b], axis=0)
    return patches


@jax.jit
def _idg_patches_to_vals(plan: IDGPlan, patches):
    """Forward: patch uv samples -> group-layout values (2, ng, G)."""
    Au = _cplx(plan.au_re, plan.au_im)
    Av = _cplx(plan.av_re, plan.av_im)
    outs = []
    for s, e in _chunk_bounds(plan):
        # adjoint of fft2 is ifft2 * S^2
        spatial = jnp.fft.ifft2(patches[s:e]) * (plan.S * plan.S)
        t = jnp.einsum("gxy,gxv->gyv", spatial, jnp.conj(Au[s:e]), precision=jax.lax.Precision.HIGHEST)
        outs.append(jnp.sum(t * jnp.conj(Av[s:e]), axis=1))  # (chunk, G)
    V = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return jnp.stack([jnp.real(V), jnp.imag(V)])


@jax.jit
def dirty2vis_idg_grouped(plan: IDGPlan, image):
    """Forward to group-layout values (2, ng, G) — zero gathers.

    Exact conj-transpose of ``vis2dirty_idg_grouped``."""
    patches = _idg_bins_to_grid_patches(plan, image)
    return _idg_patches_to_vals(plan, patches)


@jax.jit
def _dirty2vis_idg_impl(plan: IDGPlan, image, mask):
    rdt = plan.phase_re.dtype
    vals = dirty2vis_idg_grouped(plan, image)
    V = _cplx(vals[0], vals[1]) * _cplx(plan.phase_re, plan.phase_im)
    flat = jnp.stack([jnp.real(V).reshape(-1), jnp.imag(V).reshape(-1)], axis=-1)
    rows = flat[plan.inv_orig]  # (nvis, 2) single row-gather back
    out = rows.T.reshape(2, plan.nrow, plan.nchan)
    if mask is not None:
        out = out * mask.astype(rdt)[None]
    return out


def dirty2vis_idg(plan: IDGPlan, image, mask=None, split: bool = False):
    """Degrid an (nx, ny) image to (nrow, nchan) visibilities (forward).

    Exact conjugate transpose of ``vis2dirty_idg`` (adjointness holds to
    rounding). ``split=True`` returns stacked (2, nrow, nchan) real/imag.
    """
    out_ri = _dirty2vis_idg_impl(plan, image, mask)
    if split:
        return out_ri
    return jax.lax.complex(out_ri[0], out_ri[1])


# ── group-layout utilities + vis-space Hessian ───────────────────────


@jax.jit
def to_group_layout(plan: IDGPlan, arr):
    """(nrow, nchan) real array -> (ng, G) group layout (one row-gather).

    Pay the permutation ONCE per dataset (weights, masks, data vis); the
    vis-space Hessian and residual evaluations then run with zero gathers.
    """
    rdt = plan.phase_re.dtype
    flat = jnp.concatenate([arr.astype(rdt).reshape(-1), jnp.zeros(1, rdt)])
    return flat[plan.cg_idx]


def hessian_vis_idg(plan: IDGPlan, x, wgt_g=None, beam=None, eta: float = 0.0, wsum=None):
    """Exact vis-space Hessian B^T R^H W R B x (+ eta x), all group-layout.

    ``wgt_g``: (ng, G) group-layout weights (already masked) from
    :func:`to_group_layout`. The whole round trip — degrid, weight, grid —
    is gather-free (the TPU production counterpart of reference
    hessian_slice, hessian.py:15-100).
    """
    xin = x if beam is None else x * beam
    vals = dirty2vis_idg_grouped(plan, xin)
    if wgt_g is not None:
        vals = vals * wgt_g[None]
    conv = vis2dirty_idg_grouped(plan, vals)
    if wsum is not None:
        conv = conv / wsum
    if beam is not None:
        conv = conv * beam
    if eta:
        conv = conv + eta * x
    return conv
