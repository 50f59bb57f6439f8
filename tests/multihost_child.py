"""Child process for tests/test_multihost.py: joins a 2-process CPU
runtime and drives simulate -> init -> imager -> deconv through the
multi-host code paths (VERDICT r4 #2).

Run: python multihost_child.py <pid> <port> <workdir>
"""

import os
import sys

pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pfb_imaging_tpu.parallel.multihost import (  # noqa: E402
    barrier,
    init_distributed,
    is_multihost,
)

init_distributed(f"127.0.0.1:{port}", 2, pid)
assert is_multihost(), "expected a 2-process runtime"
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

import numpy as np  # noqa: E402

ms = os.path.join(workdir, "mh.ms.tree")
xds = os.path.join(workdir, "mh.xds")
dt = os.path.join(workdir, "mh.dt")

if pid == 0:
    from pfb_imaging_tpu.core.init import init
    from pfb_imaging_tpu.core.simulate import simulate_vis_store

    simulate_vis_store(ms, nant=6, ntime=2, nchan=2, nx=24)
    init(ms, xds, product="I")
barrier("data-ready")

from pfb_imaging_tpu.core.imager import imager  # noqa: E402

imager(xds, dt, nband=2, epsilon=1e-6, field_of_view=0.2,
       super_resolution_factor=1.2, psf_oversize=1.5, fits_out=False)
barrier("imaged")

from pfb_imaging_tpu.utils.store import TreeStore  # noqa: E402

t = TreeStore(dt)
assert t.attrs.get("complete"), "imager did not stamp complete"
bands = sorted(k for k in t.groups() if k.startswith("band"))
assert len(bands) == 2, bands
wsums = [float(np.asarray(t.group(b).read("WSUM"))[0]) for b in bands]
assert all(w > 0 for w in wsums), wsums

from pfb_imaging_tpu.core.deconv import deconv  # noqa: E402

model, residual = deconv(
    dt, niter=1, epsilon=1e-6, cg_maxit=6, pd_maxit=6, use_mesh=True,
)
barrier("deconvolved")
rms0 = None
for b in bands:
    node = t.group(b)
    assert node.has("MODEL") and node.has("RESIDUAL"), b
    rms0 = float(node.attrs["rms"])
assert np.isfinite(model).all() and np.isfinite(residual).all()
# every host sees the same final rms through its own store handle
print(f"MULTIHOST-OK pid={pid} rms={rms0:.6e} model_sum={float(np.abs(model).sum()):.6e}",
      flush=True)
