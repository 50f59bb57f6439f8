"""Test configuration.

All tests run on CPU with a virtual 8-device mesh (the reference exercises
its distributed behaviour on a single-machine Ray instance; we mirror that
with XLA's forced host platform device count — SURVEY.md §4) and with x64
enabled so tolerances match the reference's f64 oracles.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize imports jax before this conftest runs, so the env
# var alone is too late — force the platform through the config as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def ms_meta():
    """Synthetic measurement-set metadata (uvw/freq), session-scoped.

    The reference downloads a real small MS (tests/conftest.py:52-75); we
    synthesise an equivalent: a random 28-antenna array, 1 freq window.
    """
    rng = np.random.default_rng(7)
    nant = 28
    antennas = 5e3 * rng.standard_normal((nant, 3))
    antennas[:, 2] *= 0.001
    import itertools

    a1, a2 = np.asarray(list(itertools.combinations(range(nant), 2))).T
    uvw = antennas[a1] - antennas[a2]
    freq = np.linspace(0.9e9, 1.1e9, 4)
    from pfb_imaging_tpu.constants import LIGHTSPEED

    max_blength = np.max(np.linalg.norm(uvw, axis=1))

    class Meta:
        pass

    m = Meta()
    m.uvw = uvw
    m.freq = freq
    m.max_blength = max_blength
    m.max_freq = freq.max()
    m.nrow = uvw.shape[0]
    m.lightspeed = LIGHTSPEED
    return m
