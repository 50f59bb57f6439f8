"""Image-domain gridding (IDG) — the MXU-native gridding formulation.

The stencil-scatter formulations (XLA scatter, the Pallas tiled kernel)
are bound by per-visibility serial work on TPU (docs/perf.md). IDG (the
image-domain gridding family of van der Tol et al.; see PAPERS.md's
retrieved gridding-acceleration papers for the lineage) restructures the
computation so the per-visibility work is a dense matrix product:

  1. visibilities are grouped so each group's uv footprint fits inside an
     S x S subgrid patch (host-side bucketing by S/2 uv cells);
  2. per group, the subgrid *image* is a direct DFT of the group's
     visibilities at their fractional offsets — a (S^2, nvis_group)
     matmul, batched over groups => MXU work;
  3. multiplying by the gridding kernel's image-domain taper and FFT-ing
     the subgrid yields exactly the ES-kernel-convolved uv samples of the
     patch (convolution -> multiplication under the subgrid DFT);
  4. patches are accumulated onto the big grid (dense block adds).

Identity used (all on the S-point grid):
  G[k] = sum_j v_j C(k - u_j)  ==  FFT_S( c(x) * sum_j v_j e^{2 pi i x du_j / S} )
with c = IFFT_S(C) the kernel's subgrid image response and du_j = u_j - k0
the offset from the patch origin. Exact when the kernel support plus the
group's uv spread fit within S (aliasing-free window) — guaranteed by the
bucketing.

STATUS: experimental prototype. The least-squares taper reaches a
per-visibility identity error of ~1.3e-4 at S=32; because the deviation is
systematic in the fractional uv offset it accumulates with visibility
count (measured ~1e-2 at 20k vis) — the accuracy dial is the subgrid size
(S=64 with the same bucket spread fits to far tighter tolerances; this is
the standard accuracy/throughput trade of the IDG literature). The
THROUGHPUT characteristics are the point of the prototype: all
per-visibility work is batched matmuls, and patch assembly is a dense
overlap-add with no scatter anywhere.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .gridder import WGridderPlan, es_kernel

S = 32  # subgrid size (must be >= 2 * support + bucket spread)
_TAPER_CACHE: dict = {}


def _fit_taper(support: int, beta: float) -> np.ndarray:
    """Least-squares subgrid taper: the patch response at image coordinate
    xi for a visibility at offset du is linear in the taper c; fit c so
    that response == k_hat_ES(xi) * e^{2 pi i du xi} over the image band
    (|xi| <= 0.26) and the full bucket offset spread. ~3e-4 worst-case
    identity error at S=32 (vs 3e-3 for a windowed-ES taper)."""
    key = (S, support, round(beta, 6))
    if key in _TAPER_CACHE:
        return _TAPER_CACHE[key]
    from .gridder import _kernel_ft

    half = S // 2
    xc = np.fft.fftfreq(S) * S
    ks = np.arange(S)
    F = np.exp(-2j * np.pi * np.outer(ks, np.arange(S)) / S)
    dus = np.linspace(half - 8.3, half + 8.3, 35)
    xis = np.linspace(-0.27, 0.27, 55)
    rows, tgt = [], []
    for xi in xis:
        kt = _kernel_ft(np.array([xi]), support, beta)[0]
        w = np.exp(2j * np.pi * ks * xi)
        wF = w @ F
        for du in dus:
            svec = np.exp(2j * np.pi * xc * du / S)
            rows.append((wF * svec) * np.exp(-2j * np.pi * du * xi))
            tgt.append(kt)
    arows = np.array(rows)
    tv = np.array(tgt)
    mmat = np.concatenate([arows.real, arows.imag])
    yvec = np.concatenate([tv.real, np.zeros_like(tv.real)])
    c_fit, *_ = np.linalg.lstsq(mmat, yvec, rcond=None)
    _TAPER_CACHE[key] = c_fit
    return c_fit


def plan_idg(plan: WGridderPlan, group_size: int = 128):
    """Bucket the plan's visibility stream into S x S subgrid groups.

    Buckets are (S/2)-sized uv cells so every member's support window fits
    the patch with margin. Oversized buckets split into chunks of
    ``group_size``. Returns a dict of packed host arrays:

      vis_idx (ngroups, group_size): indices into the sorted stream
          (sentinel nvis = padding);
      k0u/k0v (ngroups,): patch origins (integer grid coords, wrapped);
      du/dv (ngroups, group_size): fractional offsets from the origin.
    """
    nvis = plan.sort_idx.shape[0]
    u = np.mod(np.asarray(plan.u_pix[:nvis], np.float64), plan.nbig_x)
    v = np.mod(np.asarray(plan.v_pix[:nvis], np.float64), plan.nbig_y)
    W = plan.support
    half = S // 2
    # DENSE half-subgrid lattice: every lattice cell is a group (mostly
    # empty groups cost only cheap padded matmul work), so patch assembly
    # is a pure overlap-add with NO scatter
    nbu = int(np.ceil(plan.nbig_x / half))
    nbv = int(np.ceil(plan.nbig_y / half))
    bu = np.minimum((u // half).astype(np.int64), nbu - 1)
    bv = np.minimum((v // half).astype(np.int64), nbv - 1)
    bid = bu * nbv + bv
    order = np.argsort(bid, kind="stable")
    bid_s = bid[order]
    nbuckets = nbu * nbv
    starts = np.searchsorted(bid_s, np.arange(nbuckets), side="left")
    ends = np.searchsorted(bid_s, np.arange(nbuckets), side="right")
    counts = ends - starts
    cap = max(int(counts.max()), 1)
    # chunk overloaded buckets into repeats of the group capacity
    nchunks = max(int(np.ceil(cap / group_size)), 1)
    ng = nbuckets * nchunks
    vis_idx = np.full((nbuckets, nchunks, group_size), nvis, np.int64)
    du = np.zeros((nbuckets, nchunks, group_size), np.float32)
    dv = np.zeros((nbuckets, nchunks, group_size), np.float32)
    k0u_b = (np.arange(nbu) * half - (S - half) // 2).astype(np.int64)
    k0v_b = (np.arange(nbv) * half - (S - half) // 2).astype(np.int64)
    for b in range(nbuckets):
        sel = order[starts[b] : ends[b]]
        if sel.size == 0:
            continue
        bu_g, bv_g = b // nbv, b % nbv
        du_all = u[sel] - k0u_b[bu_g]
        dv_all = v[sel] - k0v_b[bv_g]
        for ch in range(nchunks):
            piece = slice(ch * group_size, (ch + 1) * group_size)
            c = sel[piece].size
            if c == 0:
                break
            vis_idx[b, ch, :c] = sel[piece]
            du[b, ch, :c] = du_all[piece]
            dv[b, ch, :c] = dv_all[piece]
    vis_idx = vis_idx.reshape(ng, group_size)
    du = du.reshape(ng, group_size)
    dv = dv.reshape(ng, group_size)

    # subgrid taper: least-squares fit so the patch's measured response
    # matches the ES kernel's k_hat over the image band for every offset in
    # the bucket spread (the "optimal kernel" idea of the IDG literature).
    # One (n_samples x S) real lstsq at plan time.
    c1d = _fit_taper(W, plan.beta)
    cimg = np.outer(c1d, c1d)

    return dict(
        vis_idx=jnp.asarray(vis_idx.astype(np.int32)),
        du=jnp.asarray(du),
        dv=jnp.asarray(dv),
        cimg=jnp.asarray(cimg.astype(np.float32)),
        ngroups=ng,
        group_size=group_size,
        nbu=nbu,
        nbv=nbv,
        nchunks=nchunks,
        k0_off=(S - half) // 2,
    )


@jax.jit
def _idg_patches(idg: dict, vre_ext, vim_ext):
    """Batched subgrid evaluation: (ng, S, S) patch uv-samples (re, im).

    vre_ext/vim_ext: (nvis + 1,) weighted values with a zero sentinel.
    The pixel axis uses CENTRED offsets in FFT order so the subsequent
    fft2 implements the symmetric trig interpolation.
    """
    # centred pixel offsets in FFT order: x = [0, 1, .., S/2-1, -S/2, .., -1]
    xs = np.fft.fftfreq(S) * S

    def _powers(theta):
        """(S, G) matrix e^{i theta x} for x in FFT order via one cos/sin
        per visibility + cumulative rotation (transcendental count G, not
        S*G — the trig was the measured hot spot on TPU)."""
        w = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))  # (G,)
        up = jnp.cumprod(jnp.broadcast_to(w[None, :], (S // 2, theta.shape[0])), axis=0)  # w^1..w^{S/2}
        ones = jnp.ones_like(w)[None]
        pos = jnp.concatenate([ones, up[: S // 2 - 1]], axis=0)  # w^0..w^{S/2-1}
        neg = jnp.conj(up[::-1])  # w^{-S/2}..w^{-1}
        return jnp.concatenate([pos, neg], axis=0)  # FFT order

    def one_group(vis_idx, du, dv):
        vr = vre_ext[vis_idx]  # (G,)
        vi = vim_ext[vis_idx]
        eu = _powers(2.0 * jnp.pi * du / S)  # (S, G) complex
        ev = _powers(2.0 * jnp.pi * dv / S)
        cu, su_ = jnp.real(eu), jnp.imag(eu)
        cv, sv_ = jnp.real(ev), jnp.imag(ev)
        # e^{i(au+av)} * (vr + i vi), accumulated over the group:
        # re = sum vr*(cu cv - su sv) - vi*(su cv + cu sv)
        # im = sum vr*(su cv + cu sv) + vi*(cu cv - su sv)
        re = (
            jnp.einsum("xg,yg->xy", cu, cv * vr)
            - jnp.einsum("xg,yg->xy", su_, sv_ * vr)
            - jnp.einsum("xg,yg->xy", su_, cv * vi)
            - jnp.einsum("xg,yg->xy", cu, sv_ * vi)
        )
        im = (
            jnp.einsum("xg,yg->xy", su_, cv * vr)
            + jnp.einsum("xg,yg->xy", cu, sv_ * vr)
            + jnp.einsum("xg,yg->xy", cu, cv * vi)
            - jnp.einsum("xg,yg->xy", su_, sv_ * vi)
        )
        return re, im

    pre, pim = jax.vmap(one_group)(idg["vis_idx"], idg["du"], idg["dv"])
    # image-domain taper then subgrid FFT: patch = FFT_S(c * s)
    spatial = jax.lax.complex(pre, pim) * idg["cimg"][None]
    patch = jnp.fft.fft2(spatial)
    return jnp.real(patch), jnp.imag(patch)


@partial(jax.jit, static_argnames=("nbu", "nbv", "nchunks", "k0_off", "nbig_x", "nbig_y"))
def _idg_assemble(patch_re, patch_im, nbu: int, nbv: int, nchunks: int, k0_off: int, nbig_x: int, nbig_y: int):
    """Dense overlap-add of the lattice patches (no scatter).

    Patches sit at stride S/2 with extent S: split each patch into 2x2
    half-blocks; half-block (a, b) of lattice cell (i, j) lands at cell
    (i + a, j + b) of the output lattice — four dense placements summed.
    """
    half = S // 2
    vals = jnp.stack([patch_re, patch_im]).reshape(2, nbu, nbv, nchunks, S, S).sum(axis=3)
    out = jnp.zeros((2, (nbu + 1) * half, (nbv + 1) * half), vals.dtype)
    for a in range(2):
        for b in range(2):
            blk = vals[:, :, :, a * half : (a + 1) * half, b * half : (b + 1) * half]
            dense = blk.transpose(0, 1, 3, 2, 4).reshape(2, nbu * half, nbv * half)
            out = out.at[:, a * half : a * half + nbu * half, b * half : b * half + nbv * half].add(dense)
    # undo the patch-origin offset and wrap onto the grid
    out = jnp.roll(out, (-k0_off, -k0_off), axis=(1, 2))
    # fold the overhang back periodically
    main = out[:, :nbig_x, :nbig_y]
    over_u = out[:, nbig_x:, :nbig_y]
    main = main.at[:, : over_u.shape[1], :].add(over_u)
    over_v = out[:, :nbig_x, nbig_y:]
    main = main.at[:, :, : over_v.shape[2]].add(over_v)
    corner = out[:, nbig_x:, nbig_y:]
    main = main.at[:, : corner.shape[1], : corner.shape[2]].add(corner)
    return main


def idg_scatter_grid(plan: WGridderPlan, idg: dict, vre_sorted, vim_sorted):
    """(2, nbig, nbig) grid from sorted-stream weighted values via IDG."""
    z = jnp.zeros(1, vre_sorted.dtype)
    pre, pim = _idg_patches(idg, jnp.concatenate([vre_sorted, z]), jnp.concatenate([vim_sorted, z]))
    return _idg_assemble(
        pre, pim, idg["nbu"], idg["nbv"], idg["nchunks"], idg["k0_off"], plan.nbig_x, plan.nbig_y
    )


def vis2dirty_idg(plan: WGridderPlan, idg: dict, vis_re, vis_im, wgt=None, mask=None):
    """vis2dirty through the IDG core (per-plane host loop)."""
    from .gridder import _vis2dirty_finish, _vis2dirty_prepare, _vis2dirty_plane_image, _w_weight

    wv_ri = _vis2dirty_prepare(plan, vis_re, vis_im, wgt, mask)
    nvis = plan.sort_idx.shape[0]

    @jax.jit
    def _plane_vals(plan, wv_ri, p_arr):
        p = p_arr[0]
        ww = _w_weight(plan, plan.w_lam[:nvis], p)
        return wv_ri[0] * ww, wv_ri[1] * ww

    acc = None
    for p in range(plan.nw):
        p_arr = jnp.asarray(np.asarray([p], np.int32))
        vre, vim = _plane_vals(plan, wv_ri, p_arr)
        grid_ri = idg_scatter_grid(plan, idg, vre, vim)
        c = _vis2dirty_plane_image(plan, grid_ri, p_arr)
        acc = c if acc is None else acc + c
    return _vis2dirty_finish(plan, acc)
