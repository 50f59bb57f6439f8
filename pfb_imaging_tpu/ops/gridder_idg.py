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

STATUS: experimental prototype. With the windowed ES taper the accuracy
floors at ~2e-3 (finite-patch Dirichlet leakage); production use needs the
least-squares-optimal subgrid taper of the IDG literature (fit c so the
windowed effective kernel's response matches a target over the image band
— a small linear solve at plan time). The THROUGHPUT characteristics are
the point of the prototype: all per-visibility work is batched matmuls.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .gridder import WGridderPlan, es_kernel

S = 32  # subgrid size (must be >= 2 * support + bucket spread)


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
    # bucket by half-subgrid cells
    bu = (u // half).astype(np.int64)
    bv = (v // half).astype(np.int64)
    nbv = int(np.ceil(plan.nbig_y / half))
    bid = bu * nbv + bv
    order = np.argsort(bid, kind="stable")
    bid_s = bid[order]
    # group boundaries
    uniq, starts = np.unique(bid_s, return_index=True)
    ends = np.append(starts[1:], bid_s.size)

    groups = []
    for b, s0, e0 in zip(uniq, starts, ends):
        for c0 in range(s0, e0, group_size):
            groups.append((b, order[c0 : min(c0 + group_size, e0)]))
    ng = len(groups)

    vis_idx = np.full((ng, group_size), nvis, np.int64)
    k0u = np.zeros(ng, np.int64)
    k0v = np.zeros(ng, np.int64)
    du = np.zeros((ng, group_size), np.float32)
    dv = np.zeros((ng, group_size), np.float32)
    for g, (b, sel) in enumerate(groups):
        bu_g, bv_g = b // nbv, b % nbv
        # patch origin: bucket cell start minus margin so the whole
        # support window [u - W/2, u + W/2] lies within [k0, k0 + S)
        k0u[g] = bu_g * half - (S - half) // 2
        k0v[g] = bv_g * half - (S - half) // 2
        vis_idx[g, : sel.size] = sel
        du[g, : sel.size] = u[sel] - k0u[g]
        dv[g, : sel.size] = v[sel] - k0v[g]

    # kernel subgrid image response: the EXACT ES image response k_hat
    # evaluated on centred subgrid pixels (quadrature), in FFT order. The
    # effective gridding kernel is then the bandlimited interpolant whose
    # image response IS k_hat — it grids exactly (no aliasing inside the
    # band) under the plan's existing ES correction, up to the patch
    # truncation of its Dirichlet tails (~k_hat at Nyquist ~ epsilon).
    from .gridder import _kernel_ft

    xc = np.fft.fftfreq(S) * S  # centred pixel offsets in FFT order
    c1d = _kernel_ft(xc / S, W, plan.beta) / S
    # roll the taper smoothly to zero outside the image band (the big
    # image's correction only samples |x| <= S/4): the effective kernel
    # then decays fast and the patch truncation error vanishes, while the
    # in-band response (and hence the existing ES correction) is untouched
    ax = np.abs(xc)
    r0, r1 = S / 4 + 1.0, S / 2 - 1.0
    t = np.clip((ax - r0) / (r1 - r0), 0.0, 1.0)
    c1d = c1d * (0.5 * (1.0 + np.cos(np.pi * t)))
    cimg = np.outer(c1d, c1d)

    return dict(
        vis_idx=jnp.asarray(np.where(vis_idx >= nvis, nvis, vis_idx).astype(np.int32)),
        k0u=jnp.asarray(k0u.astype(np.int32)),
        k0v=jnp.asarray(k0v.astype(np.int32)),
        du=jnp.asarray(du),
        dv=jnp.asarray(dv),
        cimg=jnp.asarray(cimg.astype(np.float32)),
        ngroups=ng,
        group_size=group_size,
    )


@jax.jit
def _idg_patches(idg: dict, vre_ext, vim_ext):
    """Batched subgrid evaluation: (ng, S, S) patch uv-samples (re, im).

    vre_ext/vim_ext: (nvis + 1,) weighted values with a zero sentinel.
    The pixel axis uses CENTRED offsets in FFT order so the subsequent
    fft2 implements the symmetric trig interpolation.
    """
    x = jnp.asarray(np.fft.fftfreq(S) * S)[:, None]  # centred, FFT order

    def one_group(vis_idx, du, dv):
        vr = vre_ext[vis_idx]  # (G,)
        vi = vim_ext[vis_idx]
        # phase per pixel-offset pair: e^{2 pi i x du / S}; build the two
        # 1D factor matrices (S, G) and combine via einsum so the heavy
        # contraction is a matmul over the group axis
        au = 2.0 * jnp.pi * x * du[None, :] / S  # (S, G)
        av = 2.0 * jnp.pi * x * dv[None, :] / S
        cu, su_ = jnp.cos(au), jnp.sin(au)
        cv, sv_ = jnp.cos(av), jnp.sin(av)
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


@partial(jax.jit, static_argnames=("nbig_x", "nbig_y"))
def _idg_assemble(k0u, k0v, patch_re, patch_im, nbig_x: int, nbig_y: int):
    """Accumulate patches onto the big grid (wrapped indices, scatter-add)."""
    ng = patch_re.shape[0]
    iu = jnp.mod(k0u[:, None] + jnp.arange(S)[None, :], nbig_x)  # (ng, S)
    iv = jnp.mod(k0v[:, None] + jnp.arange(S)[None, :], nbig_y)
    grid = jnp.zeros((2, nbig_x, nbig_y), patch_re.dtype)
    vals = jnp.stack([patch_re, patch_im])  # (2, ng, S, S)
    return grid.at[:, iu[:, :, None], iv[:, None, :]].add(jnp.moveaxis(vals, 0, 0))


def idg_scatter_grid(plan: WGridderPlan, idg: dict, vre_sorted, vim_sorted):
    """(2, nbig, nbig) grid from sorted-stream weighted values via IDG."""
    z = jnp.zeros(1, vre_sorted.dtype)
    pre, pim = _idg_patches(idg, jnp.concatenate([vre_sorted, z]), jnp.concatenate([vim_sorted, z]))
    return _idg_assemble(idg["k0u"], idg["k0v"], pre, pim, plan.nbig_x, plan.nbig_y)


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
