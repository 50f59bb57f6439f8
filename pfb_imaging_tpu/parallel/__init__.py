"""Device-mesh parallelism (replaces the reference's Ray/dask runtime, L1).

The reference distributes work three ways (SURVEY.md §2.5): Ray tasks over
independent (band,time) images, one Ray actor per band holding Hessian/Psi
state, and dask-blockwise over visibility rows for degridding. Here all
three collapse into mesh axes:

  * ``band``: the cube's leading axis, sharded — the ℓ2,1 prox's band-axis
    sum (the only inter-band coupling) becomes an XLA all-reduce over ICI.
  * ``row``: visibility rows sharded across devices; gridding is linear in
    rows so each shard grids locally and the image-space partials are
    psum-reduced.

Everything else (CG loops, PD loops, FFTs) is data-parallel over those axes
inside one jitted program — no process pools, no object stores.
"""

from .mesh import band_sharding, make_mesh, shard_cube  # noqa: F401
from .sharded import row_sharded_vis2dirty  # noqa: F401
