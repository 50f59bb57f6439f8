"""FFT-accelerated w-gridding measurement operator (JAX/XLA).

A from-scratch NUFFT-style wgridder replacing the reference's ducc0
``vis2dirty``/``dirty2vis`` (reference operators/gridder.py:37-144) under the
same pinned phase convention (see geometry.py and ops/dft.py). Algorithm:
exponential-of-semicircle (ES) kernel convolutional resampling on an
oversampled uv grid + improved w-stacking (gridding in w with the same ES
kernel, per-plane FFT and image-space w-screen), i.e. the scheme of
ducc0/"efficient wide-field" w-gridding — re-derived, not translated.

Design for TPU/XLA:
  * ``plan_wgridder`` runs once on the host: kernel parameter selection,
    grid-correction quadrature, w-plane layout, and w-sorting/bucketing of
    the visibility stream so each w-plane touches a *contiguous, statically
    sized* slice of the sorted stream. All shapes downstream are static.
  * ``dirty2vis``/``vis2dirty`` are pure jittable functions: a ``lax.scan``
    over w-planes with an FFT + dense gather/scatter body. Scatters are
    bucketed (capacity = max visibilities per plane) so compute scales with
    nnz * support^3 rather than nnz * support^2 * nplanes.

Accuracy: validated against the explicit DFT oracle (ops/dft.py) in
tests/test_gridder.py at the requested epsilon (reference default 1e-7 in
f64; the TPU f32 path supports epsilon >= ~1e-5).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIGHTSPEED
from ..geometry import conventions_signs, good_size, lm_grid

__all__ = ["WGridderPlan", "plan_wgridder", "dirty2vis", "vis2dirty"]


# ── ES kernel ─────────────────────────────────────────────────────────


def es_kernel(x, beta):
    """exp(beta*(sqrt(1-x^2)-1)) on |x|<1, else 0 (reference weighting.py:26-35)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x2 = x * x
    inside = x2 < 1.0
    arg = xp.sqrt(xp.where(inside, 1.0 - x2, 0.0))
    return xp.where(inside, xp.exp(beta * (arg - 1.0)), 0.0)


def _kernel_params(epsilon: float, sigma: float = 2.0) -> tuple[int, float]:
    """Support and shape parameter for the ES kernel at target accuracy.

    Empirical finufft-style rule for oversampling sigma=2:
    support W ~= ceil(log10(1/eps)) + 1, beta = 2.30 * W.
    """
    w = int(np.ceil(-np.log10(epsilon))) + 1
    w = max(4, min(w, 16))
    beta = 2.30 * w
    return w, beta


def _kernel_ft(xi: np.ndarray, support: int, beta: float, delta: float = 1.0, nquad: int = 64) -> np.ndarray:
    """Fourier transform of the gridded ES kernel at frequencies ``xi``.

    khat(xi) = int_{-W*delta/2}^{W*delta/2} phi(2t/(W*delta)) e^{-2 pi i xi t} dt
             = (W*delta/2) * int_{-1}^{1} phi(x) cos(pi*W*delta*xi*x) dx

    Evaluated chunked (the (npts, nquad) work matrix for a full image's nm1
    would be GBs); for > 2^21 points a dense-grid + linear-interp shortcut
    is used — khat is a 64-term cosine series whose total phase across the
    xi range is a few radians, so an 8193-node grid is accurate to ~1e-7
    relative, well below the f32 path's epsilon floor.
    """
    q, wq = np.polynomial.legendre.leggauss(nquad)
    phi = np.exp(beta * (np.sqrt(1.0 - q * q) - 1.0))
    wphi = wq * phi
    half = support * delta / 2.0
    xi = np.asarray(xi)
    shape = xi.shape
    flat = xi.ravel()

    def direct(pts):
        out = np.empty(pts.shape[0])
        chunk = 1 << 16
        for i in range(0, pts.shape[0], chunk):
            args = np.pi * support * delta * np.multiply.outer(pts[i : i + chunk], q)
            out[i : i + chunk] = np.cos(args) @ wphi
        return half * out

    if flat.size > (1 << 21):
        lo, hi = float(flat.min()), float(flat.max())
        if hi == lo:
            return np.full(shape, direct(np.array([lo]))[0])
        grid = np.linspace(lo, hi, 8193)
        vals = direct(grid)
        return np.interp(flat, grid, vals).reshape(shape)
    return direct(flat).reshape(shape)


# ── Plan ──────────────────────────────────────────────────────────────


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "u_pix",
        "v_pix",
        "w_lam",
        "sort_idx",
        "plane_start",
        "plane_count",
        "phase_re",
        "phase_im",
        "corr_img",
        "nm1",
        "cw_img",
    ],
    meta_fields=[
        "nx",
        "ny",
        "nbig_x",
        "nbig_y",
        "cellx",
        "celly",
        "support",
        "beta",
        "nw",
        "w_support",
        "capacity",
        "do_wgridding",
        "divide_by_n",
        "nrow",
        "nchan",
        "w0",
        "dw",
    ],
)
@dataclasses.dataclass(frozen=True)
class WGridderPlan:
    """Static plan + device arrays for one (uvw, freq) visibility layout.

    Registered as a pytree: the static configuration lives in aux_data (so
    jit re-traces on shape-affecting changes) and the arrays are leaves.
    """

    # static geometry
    nx: int
    ny: int
    nbig_x: int
    nbig_y: int
    cellx: float
    celly: float
    support: int
    beta: float
    nw: int
    w_support: int
    capacity: int
    do_wgridding: bool
    divide_by_n: bool
    nrow: int
    nchan: int
    # device arrays (flattened, w-sorted visibility stream)
    u_pix: jnp.ndarray  # (nvis,) uv grid coords (fractional)
    v_pix: jnp.ndarray
    w_lam: jnp.ndarray  # (nvis,) sign-folded w in wavelengths
    sort_idx: jnp.ndarray  # (nvis,) position in original (row*chan) order
    plane_start: jnp.ndarray  # (nw,) start of each plane's slice in sorted order
    plane_count: jnp.ndarray  # (nw,)
    w0: float  # w of plane 0
    dw: float
    phase_re: jnp.ndarray  # (nvis,) real/imag of e^{-2 pi i (u'l0' + v'm0')}
    phase_im: jnp.ndarray  # (complex leaves are split: c64 host<->device
    #                         transfers are unimplemented on some runtimes)
    corr_img: jnp.ndarray  # (nx, ny) real image-domain correction (uv, /n)
    nm1: jnp.ndarray  # (nx, ny) n-1
    cw_img: jnp.ndarray  # (nx, ny) w-kernel correction (dw/khat_w(nm1)), ones if no w


def plan_wgridder(
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
    epsilon: float = 1e-7,
    do_wgridding: bool = True,
    divide_by_n: bool = True,
    sigma: float = 2.0,
    w_sigma: float = 2.0,
    dtype=np.float64,
    force_w_grid: tuple | None = None,
) -> WGridderPlan:
    """Host-side planning: kernel selection, corrections, w-plane bucketing.

    ``force_w_grid``: optional (w0, dw, nw) overriding the data-derived
    w-plane layout — row shards must share one plane grid so a single SPMD
    program serves them (parallel/sharded.plan_wgridder_sharded).
    """
    uvw = np.asarray(uvw, dtype=np.float64)
    freq = np.asarray(freq, dtype=np.float64)
    nrow, nchan = uvw.shape[0], freq.shape[0]
    su, sv, sw = conventions_signs(flip_u, flip_v, flip_w)

    support, beta = _kernel_params(epsilon, sigma)
    nbig_x = good_size(max(int(np.ceil(sigma * nx)), nx + 2 * support))
    nbig_y = good_size(max(int(np.ceil(sigma * ny)), ny + 2 * support))

    # flattened (row, chan) uv coordinates in oversampled-grid cells
    invlam = freq / LIGHTSPEED
    u_l = su * np.multiply.outer(uvw[:, 0], invlam)  # (nrow, nchan) wavelengths
    v_l = sv * np.multiply.outer(uvw[:, 1], invlam)
    w_l = sw * np.multiply.outer(uvw[:, 2], invlam)
    u_pix = (u_l * cellx * nbig_x).ravel()
    v_pix = (v_l * celly * nbig_y).ravel()
    w_lam = w_l.ravel()
    nvis = u_pix.size

    # phase-centre shift: vis *= e^{-2 pi i (u' lshift + v' mshift)},
    # lshift = -l0, mshift = m0 (see geometry.py conventions)
    shift_cycles = u_l.ravel() * (-l0) + v_l.ravel() * m0
    phase_shift = np.exp(-2j * np.pi * shift_cycles)

    # image-domain corrections
    _, _, nn = lm_grid(nx, ny, cellx, celly, l0, m0)
    nm1 = nn - 1.0
    jx = np.arange(nx) - nx // 2
    jy = np.arange(ny) - ny // 2
    cx = _kernel_ft(jx / nbig_x, support, beta)
    cy = _kernel_ft(jy / nbig_y, support, beta)
    corr = 1.0 / np.outer(cx, cy)
    if divide_by_n:
        with np.errstate(divide="ignore"):
            corr = np.where(nn > 0, corr / nn, 0.0)

    if do_wgridding and (np.any(np.abs(w_lam) > 0) or force_w_grid is not None):
        w_supp = support
        if force_w_grid is not None:
            w0, dw, nw = force_w_grid
            p0f = (w_lam - w0) / dw
            i0 = np.floor(p0f - w_supp / 2.0).astype(np.int64) + 1
            if i0.size and (i0.min() < 0 or int(i0.max()) + w_supp > nw):
                raise ValueError("force_w_grid does not cover this shard's w range")
        else:
            nm1_absmax = float(np.abs(nm1).max())
            nm1_absmax = max(nm1_absmax, 1e-12)
            dw = 1.0 / (2.0 * w_sigma * nm1_absmax)
            wmin = float(w_lam.min())
            # base plane index i0(v): kernel support covers planes i0..i0+Ww-1
            # (parity-correct windowing, see _uv_stencil)
            p0f = (w_lam - wmin) / dw
            i0 = np.floor(p0f - w_supp / 2.0).astype(np.int64) + 1
            shift = i0.min()
            i0 = i0 - shift
            w0 = wmin + shift * dw  # w of plane 0
            nw = int(i0.max()) + w_supp
        # contiguous plane buckets over the i0-sorted stream (native O(n)
        # counting sort when the C++ kernels are available)
        from ..native import wplane_buckets

        sort_perm, starts, counts = wplane_buckets(i0, nw, w_supp)
        capacity = int(counts.max())
        cw = dw / _kernel_ft(nm1, w_supp, beta, delta=dw)

        u_pix = u_pix[sort_perm]
        v_pix = v_pix[sort_perm]
        w_lam_s = w_lam[sort_perm]
        phase_shift = phase_shift[sort_perm]
        plan = dict(
            nw=nw,
            w_support=w_supp,
            capacity=capacity,
            w0=w0,
            dw=dw,
            plane_start=starts,
            plane_count=counts,
            sort_idx=sort_perm,
            w_lam=w_lam_s,
        )
    else:
        do_wgridding = False
        plan = dict(
            nw=1,
            w_support=1,
            capacity=nvis,
            w0=0.0,
            dw=1.0,
            plane_start=np.zeros(1, dtype=np.int64),
            plane_count=np.asarray([nvis], dtype=np.int64),
            sort_idx=np.arange(nvis),
            w_lam=w_lam,
        )
        cw = np.ones((nx, ny))

    # pad the sorted coordinate stream by `capacity` so dynamic_slice never
    # clamps its start index (clamping would misalign the last plane buckets)
    cap = int(plan["capacity"])
    u_pad = np.pad(u_pix, (0, cap))
    v_pad = np.pad(v_pix, (0, cap))
    w_pad = np.pad(np.asarray(plan["w_lam"]), (0, cap))

    cdtype = np.complex64 if dtype == np.float32 else np.complex128
    # convert on the HOST before device transfer: an f64/i64 numpy array
    # handed to jnp.asarray(dtype=...) lowers to a device-side convert, and
    # TPUs (axon runtime especially) cannot ingest 64-bit host buffers
    idx_t = np.int32 if dtype == np.float32 else np.int64
    host = lambda a, t: np.ascontiguousarray(np.asarray(a), dtype=t)  # noqa: E731
    return WGridderPlan(
        nx=nx,
        ny=ny,
        nbig_x=nbig_x,
        nbig_y=nbig_y,
        cellx=cellx,
        celly=celly,
        support=support,
        beta=beta,
        do_wgridding=do_wgridding,
        divide_by_n=divide_by_n,
        nrow=nrow,
        nchan=nchan,
        u_pix=jnp.asarray(host(u_pad, dtype)),
        v_pix=jnp.asarray(host(v_pad, dtype)),
        w_lam=jnp.asarray(host(w_pad, dtype)),
        sort_idx=jnp.asarray(host(plan["sort_idx"], idx_t)),
        plane_start=jnp.asarray(host(plan["plane_start"], idx_t)),
        plane_count=jnp.asarray(host(plan["plane_count"], idx_t)),
        w0=float(plan["w0"]),
        dw=float(plan["dw"]),
        nw=int(plan["nw"]),
        w_support=int(plan["w_support"]),
        capacity=int(plan["capacity"]),
        phase_re=jnp.asarray(host(phase_shift.real, dtype)),
        phase_im=jnp.asarray(host(phase_shift.imag, dtype)),
        corr_img=jnp.asarray(host(corr, dtype)),
        nm1=jnp.asarray(host(nm1, dtype)),
        cw_img=jnp.asarray(host(cw, dtype)),
    )


# ── kernels on the sorted stream ─────────────────────────────────────


def _uv_stencil(plan: WGridderPlan, up, vp):
    """Integer support indices + kernel weights for a batch of vis.

    Returns (iu, iv, ku, kv): (cap, W) wrapped indices and weights.
    """
    w = plan.support
    # window = the w integers in (u - w/2, u + w/2): i0 = floor(u - w/2) + 1
    # (the w//2 form silently drops one support point for odd w)
    iu0 = jnp.floor(up - w / 2.0).astype(jnp.int32) + 1
    iv0 = jnp.floor(vp - w / 2.0).astype(jnp.int32) + 1
    offs = jnp.arange(w, dtype=jnp.int32)
    iu = iu0[:, None] + offs[None, :]
    iv = iv0[:, None] + offs[None, :]
    xu = 2.0 * (up[:, None] - iu) / w
    xv = 2.0 * (vp[:, None] - iv) / w
    ku = es_kernel(xu, plan.beta)
    kv = es_kernel(xv, plan.beta)
    iu = jnp.mod(iu, plan.nbig_x)
    iv = jnp.mod(iv, plan.nbig_y)
    return iu, iv, ku, kv


def _plane_slice(plan: WGridderPlan, p):
    start = plan.plane_start[p]
    count = plan.plane_count[p]
    cap = plan.capacity
    up = jax.lax.dynamic_slice_in_dim(plan.u_pix, start, cap)
    vp = jax.lax.dynamic_slice_in_dim(plan.v_pix, start, cap)
    wl = jax.lax.dynamic_slice_in_dim(plan.w_lam, start, cap)
    valid = jnp.arange(cap) < count
    return start, up, vp, wl, valid


def _w_weight(plan: WGridderPlan, wl, p):
    if not plan.do_wgridding:
        return jnp.ones_like(wl)
    wp = plan.w0 + p.astype(wl.dtype) * plan.dw
    x = 2.0 * (wl - wp) / (plan.w_support * plan.dw)
    return es_kernel(x, plan.beta)


def _pad_center(plan: WGridderPlan, img):
    px0 = plan.nbig_x // 2 - plan.nx // 2
    py0 = plan.nbig_y // 2 - plan.ny // 2
    return jnp.zeros((plan.nbig_x, plan.nbig_y), dtype=img.dtype).at[px0 : px0 + plan.nx, py0 : py0 + plan.ny].set(img)


def _crop_center(plan: WGridderPlan, big):
    px0 = plan.nbig_x // 2 - plan.nx // 2
    py0 = plan.nbig_y // 2 - plan.ny // 2
    return big[px0 : px0 + plan.nx, py0 : py0 + plan.ny]


@jax.jit
def dirty2vis(plan: WGridderPlan, image, mask=None):
    """Degrid an (nx, ny) image to (nrow, nchan) visibilities."""
    rdtype = plan.u_pix.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    ieff = image.astype(rdtype) * plan.corr_img * plan.cw_img

    def body(carry, p):
        vis_acc = carry
        start, up, vp, wl, valid = _plane_slice(plan, p)
        if plan.do_wgridding:
            wp = plan.w0 + p.astype(rdtype) * plan.dw
            screen = jnp.exp((2j * jnp.pi * wp) * plan.nm1.astype(cdtype))
            a = _pad_center(plan, ieff.astype(cdtype) * screen)
        else:
            a = _pad_center(plan, ieff.astype(cdtype))
        grid = jnp.fft.fft2(jnp.fft.ifftshift(a))
        iu, iv, ku, kv = _uv_stencil(plan, up, vp)
        # gather/accumulate on stacked real+imag f32: complex gathers and
        # scatter-adds do not lower on all TPU runtimes and decompose to
        # twice the real work anyway
        grid_ri = jnp.stack([jnp.real(grid), jnp.imag(grid)])  # (2, nbx, nby)
        g = grid_ri[:, iu[:, :, None], iv[:, None, :]]  # (2, cap, W, W)
        kw2 = (ku[:, :, None] * kv[:, None, :]) * _w_weight(plan, wl, p)[:, None, None]
        vals = jnp.sum(g * kw2[None], axis=(2, 3))  # (2, cap)
        vals = jnp.where(valid[None], vals, 0.0)
        # accumulate into sorted-stream order (accumulator includes the
        # padding tail; invalid slots are redirected there and dropped later)
        idx = start + jnp.arange(plan.capacity)
        vis_acc = vis_acc.at[:, idx].add(vals)
        return vis_acc, None

    nvis = plan.sort_idx.shape[0]
    npad = plan.u_pix.shape[0]
    vis_ri, _ = jax.lax.scan(body, jnp.zeros((2, npad), dtype=rdtype), jnp.arange(plan.nw))
    phase = jax.lax.complex(plan.phase_re, plan.phase_im)
    vis_padded = jax.lax.complex(vis_ri[0], vis_ri[1])
    vis_sorted = vis_padded[:nvis] * phase
    # unsort back to (row, chan) order
    vis = jnp.zeros(nvis, dtype=cdtype).at[plan.sort_idx].set(vis_sorted)
    vis = vis.reshape(plan.nrow, plan.nchan)
    if mask is not None:
        vis = vis * mask.astype(rdtype)
    return vis


@jax.jit
def vis2dirty(plan: WGridderPlan, vis, wgt=None, mask=None):
    """Grid (nrow, nchan) visibilities to an (nx, ny) dirty image (exact adjoint)."""
    rdtype = plan.u_pix.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    wv = vis.astype(cdtype)
    if wgt is not None:
        wv = wv * wgt.astype(rdtype)
    if mask is not None:
        wv = wv * mask.astype(rdtype)
    # sorted-stream order, conjugate phase shift, padded to match coordinates
    wv_sorted = wv.reshape(-1)[plan.sort_idx] * jnp.conj(jax.lax.complex(plan.phase_re, plan.phase_im))
    wv_sorted = jnp.pad(wv_sorted, (0, plan.capacity))

    def body(carry, p):
        img_acc = carry
        start, up, vp, wl, valid = _plane_slice(plan, p)
        vals = jax.lax.dynamic_slice_in_dim(wv_sorted, start, plan.capacity)
        vals = vals * _w_weight(plan, wl, p).astype(cdtype)
        vals = jnp.where(valid, vals, 0.0)
        iu, iv, ku, kv = _uv_stencil(plan, up, vp)
        kw2 = ku[:, :, None] * kv[:, None, :]
        # scatter-add on stacked real+imag f32 (see dirty2vis note)
        contrib = jnp.stack([jnp.real(vals), jnp.imag(vals)])[:, :, None, None] * kw2[None]
        grid_ri = jnp.zeros((2, plan.nbig_x, plan.nbig_y), dtype=rdtype)
        grid_ri = grid_ri.at[:, iu[:, :, None], iv[:, None, :]].add(contrib)
        grid = jax.lax.complex(grid_ri[0], grid_ri[1])
        # adjoint of (ifftshift -> fft2) is (ifft2 * N -> fftshift)
        big = jnp.fft.fftshift(jnp.fft.ifft2(grid)) * (plan.nbig_x * plan.nbig_y)
        a = _crop_center(plan, big)
        if plan.do_wgridding:
            wp = plan.w0 + p.astype(rdtype) * plan.dw
            screen = jnp.exp((-2j * jnp.pi * wp) * plan.nm1.astype(cdtype))
            a = a * screen
        return img_acc + a, None

    init = jnp.zeros((plan.nx, plan.ny), dtype=cdtype)
    acc, _ = jax.lax.scan(body, init, jnp.arange(plan.nw))
    return jnp.real(acc) * plan.corr_img * plan.cw_img


# ── host-loop execution mode ─────────────────────────────────────────
#
# The scan+dynamic_slice formulation above is the efficient one (each plane
# touches only its bucket), but some TPU runtimes (the axon tunnel) cannot
# execute dynamic slicing reliably. These variants process the FULL stream
# at every plane inside a per-plane jitted stage driven by a host loop:
# the w-kernel is exactly zero outside a visibility's support planes, so
# the result is identical. Cost is nvis * W^2 * nw instead of
# nvis * W^3 — acceptable for the small plane counts typical of
# narrow-field imaging, and every op involved (dense stencil math, f32
# scatter/gather, c2c FFT) is proven on the target runtime.


@jax.jit
def _vis2dirty_plane(plan: WGridderPlan, wv_sorted_ri, p_arr):
    """One plane's image contribution from the full sorted stream.

    wv_sorted_ri: (2, nvis) real/imag weighted vis (sorted-stream order,
    phase shift applied); p_arr: (1,) int32 plane index.

    Real-only arithmetic except the FFT itself (the only complex op proven
    to execute on every target runtime — docs/tpu-runtime-notes.md).
    """
    rdtype = plan.u_pix.dtype
    nvis = plan.sort_idx.shape[0]
    p = p_arr[0]
    up = plan.u_pix[:nvis]
    vp = plan.v_pix[:nvis]
    wl = plan.w_lam[:nvis]
    ww = _w_weight(plan, wl, p)
    vals_re = wv_sorted_ri[0] * ww
    vals_im = wv_sorted_ri[1] * ww
    iu, iv, ku, kv = _uv_stencil(plan, up, vp)
    kw2 = ku[:, :, None] * kv[:, None, :]
    contrib = jnp.stack([vals_re, vals_im])[:, :, None, None] * kw2[None]
    grid_ri = jnp.zeros((2, plan.nbig_x, plan.nbig_y), dtype=rdtype)
    grid_ri = grid_ri.at[:, iu[:, :, None], iv[:, None, :]].add(contrib)
    grid = jax.lax.complex(grid_ri[0], grid_ri[1])
    big = jnp.fft.ifft2(grid) * (plan.nbig_x * plan.nbig_y)
    bre = jnp.fft.fftshift(jnp.real(big))
    bim = jnp.fft.fftshift(jnp.imag(big))
    are = _crop_center(plan, bre)
    aim = _crop_center(plan, bim)
    if plan.do_wgridding:
        wp = plan.w0 + p.astype(rdtype) * plan.dw
        phase = (-2.0 * jnp.pi * wp) * plan.nm1
        c, s = jnp.cos(phase), jnp.sin(phase)
        return jnp.stack([are * c - aim * s, are * s + aim * c])
    return jnp.stack([are, aim])


@jax.jit
def _vis2dirty_prepare(plan: WGridderPlan, vis_re, vis_im, wgt, mask):
    """Sorted-stream real/imag weighted vis with the conjugate phase shift
    applied — all in real arithmetic."""
    rdtype = plan.u_pix.dtype
    wre = vis_re.astype(rdtype)
    wim = vis_im.astype(rdtype)
    if wgt is not None:
        wre = wre * wgt.astype(rdtype)
        wim = wim * wgt.astype(rdtype)
    if mask is not None:
        wre = wre * mask.astype(rdtype)
        wim = wim * mask.astype(rdtype)
    sre = wre.reshape(-1)[plan.sort_idx]
    sim = wim.reshape(-1)[plan.sort_idx]
    pre = plan.phase_re
    pim = plan.phase_im
    # multiply by conj(phase_shift)
    return jnp.stack([sre * pre + sim * pim, sim * pre - sre * pim])


@jax.jit
def _vis2dirty_finish(plan: WGridderPlan, acc_ri):
    return acc_ri[0] * plan.corr_img * plan.cw_img


@jax.jit
def _vis2dirty_plane_image(plan: WGridderPlan, grid_ri, p_arr):
    """Shared epilogue of every scatter backend: complexify, inverse FFT,
    shift/crop, apply the plane's w-screen. Returns stacked (2, nx, ny)."""
    rdtype = plan.u_pix.dtype
    p = p_arr[0]
    grid = jax.lax.complex(grid_ri[0], grid_ri[1])
    big = jnp.fft.ifft2(grid) * (plan.nbig_x * plan.nbig_y)
    bre = jnp.fft.fftshift(jnp.real(big))
    bim = jnp.fft.fftshift(jnp.imag(big))
    are = _crop_center(plan, bre)
    aim = _crop_center(plan, bim)
    if plan.do_wgridding:
        wp = plan.w0 + p.astype(rdtype) * plan.dw
        phase = (-2.0 * jnp.pi * wp) * plan.nm1
        c, s = jnp.cos(phase), jnp.sin(phase)
        return jnp.stack([are * c - aim * s, are * s + aim * c])
    return jnp.stack([are, aim])


def vis2dirty_hostloop(plan: WGridderPlan, vis, wgt=None, mask=None, vis_im=None):
    """vis2dirty via the per-plane host loop (runtime-portable mode).

    ``vis`` may be complex, or the real part with ``vis_im`` the imaginary
    part (runtimes that cannot transfer complex host->device).
    """
    import numpy as np

    if vis_im is None:
        vis_re, vis_im = jnp.real(vis), jnp.imag(vis)
    else:
        vis_re = vis
    wv_ri = _vis2dirty_prepare(plan, vis_re, vis_im, wgt, mask)
    acc = None
    for p in range(plan.nw):
        c = _vis2dirty_plane(plan, wv_ri, jnp.asarray(np.asarray([p], np.int32)))
        acc = c if acc is None else acc + c
    return _vis2dirty_finish(plan, acc)


@jax.jit
def _dirty2vis_plane(plan: WGridderPlan, ieff, p_arr):
    """One plane's contribution to every visibility (full stream).

    Real-only except the FFT (see _vis2dirty_plane)."""
    rdtype = plan.u_pix.dtype
    nvis = plan.sort_idx.shape[0]
    p = p_arr[0]
    if plan.do_wgridding:
        wp = plan.w0 + p.astype(rdtype) * plan.dw
        phase = (2.0 * jnp.pi * wp) * plan.nm1
        are = _pad_center(plan, ieff * jnp.cos(phase))
        aim = _pad_center(plan, ieff * jnp.sin(phase))
    else:
        are = _pad_center(plan, ieff)
        aim = jnp.zeros_like(are)
    a = jax.lax.complex(jnp.fft.ifftshift(are), jnp.fft.ifftshift(aim))
    grid = jnp.fft.fft2(a)
    up = plan.u_pix[:nvis]
    vp = plan.v_pix[:nvis]
    wl = plan.w_lam[:nvis]
    iu, iv, ku, kv = _uv_stencil(plan, up, vp)
    grid_ri = jnp.stack([jnp.real(grid), jnp.imag(grid)])
    g = grid_ri[:, iu[:, :, None], iv[:, None, :]]
    kw2 = (ku[:, :, None] * kv[:, None, :]) * _w_weight(plan, wl, p)[:, None, None]
    return jnp.sum(g * kw2[None], axis=(2, 3))  # (2, nvis)


@jax.jit
def _dirty2vis_finish_ri(plan: WGridderPlan, vis_ri, mask):
    """Unsort + phase shift in real arithmetic; returns (2, nrow, nchan)."""
    rdtype = plan.u_pix.dtype
    nvis = plan.sort_idx.shape[0]
    pre = plan.phase_re
    pim = plan.phase_im
    sre = vis_ri[0] * pre - vis_ri[1] * pim
    sim = vis_ri[0] * pim + vis_ri[1] * pre
    out = jnp.zeros((2, nvis), dtype=rdtype)
    out = out.at[0, plan.sort_idx].set(sre)
    out = out.at[1, plan.sort_idx].set(sim)
    out = out.reshape(2, plan.nrow, plan.nchan)
    if mask is not None:
        out = out * mask.astype(rdtype)[None]
    return out


def dirty2vis_hostloop(plan: WGridderPlan, image, mask=None, split: bool = False):
    """dirty2vis via the per-plane host loop (runtime-portable mode).

    ``split=True`` returns stacked (2, nrow, nchan) real/imag instead of a
    complex array (runtimes without complex d2h transfers)."""
    import numpy as np

    ieff = image.astype(plan.u_pix.dtype) * plan.corr_img * plan.cw_img
    acc = None
    for p in range(plan.nw):
        c = _dirty2vis_plane(plan, ieff, jnp.asarray(np.asarray([p], np.int32)))
        acc = c if acc is None else acc + c
    out_ri = _dirty2vis_finish_ri(plan, acc, mask)
    if split:
        return out_ri
    return jax.lax.complex(out_ri[0], out_ri[1])
