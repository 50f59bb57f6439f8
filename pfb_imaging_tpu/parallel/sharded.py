"""Row-sharded gridding via shard_map + psum.

Gridding is linear in visibility rows (reference imager-pipeline.md:121-125,
partition sum at core/imager.py:167-169), so row sharding is an
embarrassingly-parallel local grid followed by a single image-space psum
over ICI — the TPU-native form of the reference's pass-2 partition summing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.dft import vis2dirty_dft


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
