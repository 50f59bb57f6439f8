"""Row-sharded gridding via shard_map + psum.

Gridding is linear in visibility rows (reference imager-pipeline.md:121-125,
partition sum at core/imager.py:167-169), so row sharding is an
embarrassingly-parallel local grid followed by a single image-space psum
over ICI — the TPU-native form of the reference's pass-2 partition summing.

Two paths: the exact-DFT shard (``row_sharded_vis2dirty``) and the
production wgridder shard (``plan_wgridder_sharded`` +
``sharded_vis2dirty``) where per-shard plans are padded to common static
shapes so one SPMD program serves every shard.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.dft import vis2dirty_dft
from ..ops.gridder import WGridderPlan, plan_wgridder, vis2dirty


def row_sharded_vis2dirty(
    mesh: Mesh,
    uvw,
    freq,
    vis,
    wgt=None,
    *,
    nx: int,
    ny: int,
    cellx: float,
    celly: float,
    l0: float = 0.0,
    m0: float = 0.0,
    divide_by_n: bool = True,
    row_block: int = 64,
):
    """Grid with rows sharded over the mesh's 'row'+'band' axes.

    Each shard grids its local rows (exact DFT adjoint here — the wgridder
    path shards the same way once per-shard plans are built host-side) and
    the partial dirty images are psum-reduced over the row axes.

    The row count must divide evenly by the number of row shards (pad with
    zero-weight rows otherwise).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(("band", "row")), P(), P(("band", "row")), P(("band", "row"))),
        out_specs=P(),
        # the scan carry inside vis2dirty_dft starts from a replicated zeros
        # array; skip the varying-manual-axes check rather than teaching the
        # gridder about mesh axes
        check_vma=False,
    )
    def _grid(uvw_s, freq_s, vis_s, wgt_s):
        partial_img = vis2dirty_dft(
            uvw_s,
            freq_s,
            vis_s,
            wgt=wgt_s,
            nx=nx,
            ny=ny,
            cellx=cellx,
            celly=celly,
            l0=l0,
            m0=m0,
            divide_by_n=divide_by_n,
            row_block=row_block,
        )
        return jax.lax.psum(partial_img, ("band", "row"))

    if wgt is None:
        wgt = jnp.ones(vis.shape, dtype=jnp.real(vis).dtype)
    return _grid(uvw, freq, vis, wgt)


def plan_wgridder_sharded(uvw, freq, nshards: int, **kw):
    """Split rows into nshards chunks and build one SPMD-uniform plan.

    A global plan derives the shared w-plane grid (w0, dw, nw); per-shard
    plans are forced onto it and padded to the common bucket capacity, then
    stacked leaf-wise. Returns (stacked_plan, rows_per_shard).
    """
    uvw = np.asarray(uvw)
    nrow = uvw.shape[0]
    if nrow % nshards:
        raise ValueError(f"nrow={nrow} not divisible by nshards={nshards} — pad with zero-weight rows")
    rows = nrow // nshards
    global_plan = plan_wgridder(uvw, freq, **kw)
    if global_plan.do_wgridding:
        kw = dict(kw, force_w_grid=(global_plan.w0, global_plan.dw, global_plan.nw))
    plans = [plan_wgridder(uvw[i * rows : (i + 1) * rows], freq, **kw) for i in range(nshards)]

    cap = max(p.capacity for p in plans)
    nvis = rows * plans[0].nchan

    def pad_plan(p: WGridderPlan) -> WGridderPlan:
        pad_tail = nvis + cap - p.u_pix.shape[0]
        padi = lambda a: jnp.pad(a, (0, pad_tail))  # noqa: E731
        return dataclasses.replace(
            p,
            capacity=cap,
            u_pix=padi(p.u_pix),
            v_pix=padi(p.v_pix),
            w_lam=padi(p.w_lam),
        )

    plans = [pad_plan(p) for p in plans]
    leaves = [jax.tree_util.tree_leaves(p) for p in plans]
    treedef = jax.tree_util.tree_structure(plans[0])
    stacked = jax.tree_util.tree_unflatten(treedef, [jnp.stack(ls) for ls in zip(*leaves)])
    return stacked, rows


def sharded_vis2dirty(mesh: Mesh, stacked_plan: WGridderPlan, vis, wgt=None, axes=("band", "row")):
    """SPMD wgridding: each shard grids its rows, image psum over the mesh.

    ``vis``/``wgt`` have shape (nshards, rows, nchan) with the leading axis
    sharded over ``axes``.
    """
    if wgt is None:
        wgt = jnp.ones(vis.shape, dtype=stacked_plan.u_pix.dtype)

    shard_spec = P(axes)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: shard_spec, stacked_plan),
            shard_spec,
            shard_spec,
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _grid(plan_s, vis_s, wgt_s):
        plan_local = jax.tree_util.tree_map(lambda a: a[0], plan_s)
        partial_img = vis2dirty(plan_local, vis_s[0], wgt=wgt_s[0])
        return jax.lax.psum(partial_img, axes)

    return _grid(stacked_plan, vis, wgt)


# ── IDG row sharding (the TPU production path) ───────────────────────
#
# The IDG gridder (ops/gridder_idg.py) is all dense static ops — batched
# matmuls, small FFTs, segment adds — so it shards with nothing but leaf
# stacking, provided every shard gets an identical static layout: a shared
# w-bin grid and per-bin group capacities padded to the max across shards.


def plan_idg_sharded(uvw, freq, nshards: int, **kw):
    """Split rows into nshards chunks and build one SPMD-uniform IDG plan.

    Returns (stacked_plan, rows_per_shard): plan leaves gain a leading
    shard axis; static metadata is identical across shards by
    construction (forced w range/bins, per-bin group capacity = max).
    """
    from ..ops.gridder_idg import IDGPlan, plan_idg  # noqa: F401

    uvw = np.asarray(uvw)
    nrow = uvw.shape[0]
    if nrow % nshards:
        raise ValueError(f"nrow={nrow} not divisible by nshards={nshards} — pad with zero-weight rows")
    rows = nrow // nshards
    nbins, _, (wlo, whi, ws) = plan_idg(uvw, freq, count_only=True, **kw)
    force = (wlo, whi, nbins)
    # pin the scheme the global count pass chose: a shard with a narrower
    # w spread must not pick a different w_mode than its peers
    kw = dict(kw, w_mode="wplanes" if ws > 1 else "chirp")
    counts = []
    for i in range(nshards):
        _, cnt, _ = plan_idg(
            uvw[i * rows : (i + 1) * rows], freq, count_only=True, force_w_range=force, **kw
        )
        counts.append(cnt)
    gcap = tuple(max(1, max(c[b] for c in counts)) for b in range(nbins))
    plans = [
        plan_idg(uvw[i * rows : (i + 1) * rows], freq, force_w_range=force, bin_gcap=gcap, **kw)
        for i in range(nshards)
    ]
    leaves = [jax.tree_util.tree_leaves(p) for p in plans]
    treedef = jax.tree_util.tree_structure(plans[0])
    stacked = jax.tree_util.tree_unflatten(treedef, [jnp.stack(ls) for ls in zip(*leaves)])
    return stacked, rows


def plan_idg_multiband(uvw, freq, band_slices, **kw):
    """Stack per-band IDG plans over a SHARED partition uvw (round-3
    VERDICT #8 / perf.md round-3 item 4: multi-band plan stacking).

    Bands of one partition share the uvw rows but see channel subsets;
    forcing a common w grid + per-bin group capacities makes every band's
    plan layout identical, so the stacked plans vmap into ONE dispatch
    (``multiband_vis2dirty_idg``) instead of nband serial programs (each
    paying the ~8 ms tunnel dispatch floor). Narrower bands are padded to
    the widest band's channel count — padded channels must carry ZERO
    weight (the runtime multiplies weights into the values).

    Returns (stacked_plan, nch_max).
    """
    freq = np.asarray(freq)
    return plan_idg_multiband_freqs(uvw, [freq[np.asarray(sl)] for sl in band_slices], **kw)


def plan_idg_multiband_freqs(uvw, freqs, **kw):
    """:func:`plan_idg_multiband` with explicit per-band frequency arrays
    (the .dt layout stores each band's FREQ separately). Returns
    (stacked_plan, nch_max)."""
    from ..ops.gridder_idg import plan_idg

    uvw = np.asarray(uvw)
    freqs = [np.asarray(f) for f in freqs]
    nch_max = max(f.size for f in freqs)
    allfreq = np.unique(np.concatenate(freqs))
    nbins, _, (wlo, whi, ws) = plan_idg(uvw, allfreq, count_only=True, **kw)
    force = (wlo, whi, nbins)
    kw = dict(kw, w_mode="wplanes" if ws > 1 else "chirp")

    def band_freq(fb):
        if fb.size < nch_max:  # pad with the last channel (zero-weighted)
            fb = np.concatenate([fb, np.full(nch_max - fb.size, fb[-1])])
        return fb

    counts = [
        plan_idg(uvw, band_freq(fb), count_only=True, force_w_range=force, **kw)[1]
        for fb in freqs
    ]
    gcap = tuple(max(1, max(c[b] for c in counts)) for b in range(nbins))
    plans = [
        plan_idg(uvw, band_freq(fb), force_w_range=force, bin_gcap=gcap, **kw)
        for fb in freqs
    ]
    leaves = [jax.tree_util.tree_leaves(p) for p in plans]
    treedef = jax.tree_util.tree_structure(plans[0])
    stacked = jax.tree_util.tree_unflatten(treedef, [jnp.stack(ls) for ls in zip(*leaves)])
    return stacked, nch_max


@jax.jit
def multiband_vis2dirty_idg(stacked_plan, vis_re, vis_im, wgt):
    """All bands of one partition gridded in ONE jitted dispatch.

    vis_re/vis_im/wgt: (nband, nrow, nch_max); channels beyond a band's
    width must have wgt == 0. Returns (nband, nx, ny)."""
    from ..ops.gridder_idg import _vis2dirty_idg_impl

    return jax.vmap(lambda p, vr, vi, w: _vis2dirty_idg_impl(p, vr, vi, w, None))(
        stacked_plan, vis_re, vis_im, wgt
    )


@jax.jit
def multiband_to_group_layout(stacked_plan, arr):
    """(nband, nrow, nch_max) -> (nband, ng, G) group layouts, vmapped."""
    from ..ops.gridder_idg import to_group_layout

    return jax.vmap(to_group_layout)(stacked_plan, arr)


@jax.jit
def multiband_hessian_vis_idg(stacked_plan, x, wgt_g):
    """Exact vis-space Hessian for ALL bands of one partition in ONE
    jitted dispatch: conv_b = R_b^T W_b R_b x_b per band (the once-per-
    major-cycle residual round trip, reference band_worker.py:124-140 /
    gridder.py:926-1016 — here the band axis is a vmap instead of one
    Ray actor per band).

    x: (nband, nx, ny); wgt_g: (nband, ng, G) group layout (chirp plans)
    or (nband, nrow, nch_max) original layout (wplanes plans).
    """
    from ..ops.gridder_idg import hessian_vis_idg

    return jax.vmap(hessian_vis_idg)(stacked_plan, x, wgt_g)


def sharded_dirty2vis_idg(mesh: Mesh, stacked_plan, image, axes=("band", "row")):
    """SPMD IDG degrid: the image is replicated, each shard degrids its
    own rows (no collective needed — degridding is row-local). Returns
    stacked (nshards, 2, rows, nchan) re/im visibilities.

    The forward leg of the imager's mesh fan-out — used by the
    model-transfer / L2-reweight path (round-3 VERDICT weak #5: the mesh
    branch used to be skipped entirely when a model was active).
    """
    from ..ops.gridder_idg import _dirty2vis_idg_impl

    shard_spec = P(axes)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: shard_spec, stacked_plan),
            P(),
        ),
        out_specs=shard_spec,
        check_vma=False,
    )
    def _degrid(plan_s, img):
        plan_local = jax.tree_util.tree_map(lambda a: a[0], plan_s)
        return _dirty2vis_idg_impl(plan_local, img, None)[None]

    return _degrid(stacked_plan, image)


def sharded_vis2dirty_idg(mesh: Mesh, stacked_plan, vis_re, vis_im, wgt=None, axes=("band", "row")):
    """SPMD IDG gridding: each shard grids its rows, image psum over mesh.

    ``vis_re``/``vis_im``/``wgt`` have shape (nshards, rows, nchan) with
    the leading axis sharded over ``axes``. Unlike the scan+dynamic_slice
    classic path this contains no ops outside the proven-on-runtime set
    (docs/tpu-runtime-notes.md) — it is the multichip production backend.
    """
    from ..ops.gridder_idg import _vis2dirty_idg_impl

    if wgt is None:
        wgt = jnp.ones(vis_re.shape, dtype=stacked_plan.phase_re.dtype)
    shard_spec = P(axes)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: shard_spec, stacked_plan),
            shard_spec,
            shard_spec,
            shard_spec,
        ),
        out_specs=P(),
        check_vma=False,
    )
    def _grid(plan_s, vr_s, vi_s, wgt_s):
        plan_local = jax.tree_util.tree_map(lambda a: a[0], plan_s)
        partial_img = _vis2dirty_idg_impl(plan_local, vr_s[0], vi_s[0], wgt_s[0], None)
        return jax.lax.psum(partial_img, axes)

    return _grid(stacked_plan, vis_re, vis_im, wgt)
