"""TPU-native radio-interferometric imaging framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ratt-ru/pfb-imaging (see SURVEY.md): w-gridding measurement operators,
FFT PSF-convolution Hessians, the SARA wavelet dictionary, and the
PCG / power-method / primal-dual solvers of the preconditioned
forward-backward (PFB) major cycle — expressed as jitted, mesh-sharded
programs instead of ducc0/numba/Ray process parallelism.

Subpackage map (reference layer map in SURVEY.md §1):
  ops/      — measurement + image-plane linear operators (L2)
  opt/      — forward/backward solvers: PCG, PD, FB, FISTA, power method (L3)
  prox/     — proximal operators and regularisers (L3)
  deconv/   — minor cycles and the composable PFB solver (L3)
  models/   — sky-model representations: component models, transients (L5)
  parallel/ — device-mesh / sharding helpers (replaces Ray/dask runtime, L1)
  utils/    — weighting front-ends, FITS, storage, logging (L5)
  core/     — pipeline drivers, one per CLI command (L4)
"""

__version__ = "0.1.0"


def set_envs(nthreads: int | None = None, enable_x64: bool = False) -> None:
    """Process bootstrap (cf. reference pfb_imaging/__init__.py:25-70).

    The reference pins numba/TBB/OMP thread counts and JAX_ENABLE_X64.
    Here the only process-level knobs are the x64 flag (CPU correctness
    runs) and host thread counts for the input pipeline.
    """
    import os

    if enable_x64:
        import jax

        jax.config.update("jax_enable_x64", True)
    if nthreads is not None:
        os.environ.setdefault("OMP_NUM_THREADS", str(nthreads))
