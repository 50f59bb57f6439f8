"""Polarisation products through the full init->imager path (reference
tests/test_polproducts.py:25)."""

import numpy as np
import pytest

from pfb_imaging_tpu.core.imager import imager
from pfb_imaging_tpu.core.init import init
from pfb_imaging_tpu.core.simulate import simulate_vis_store
from pfb_imaging_tpu.utils.store import TreeStore


@pytest.mark.parametrize("feed,ncorr", [("linear", 4), ("circular", 4), ("linear", 2)])
def test_stokes_products_recovered(feed, ncorr, tmp_path):
    """A 30%-Q polarised source images to Q/I = 0.3 at the source pixel.

    2-corr linear data samples XX/YY and still constrains I and Q; U/V need
    cross-hands so only 4-corr runs test them.
    """
    ms = str(tmp_path / "p.ms.tree")
    store, truth = simulate_vis_store(
        ms, nant=10, ntime=1, nchan=2, nx=48, sources=((0.5, 0.5, 1.0, 0.0),),
        pol_fractions=(0.3, 0.2, 0.1), ncorr=ncorr, feed_type=feed,
    )
    cell_asec = np.rad2deg(truth["cell_rad"]) * 3600
    peaks = {}
    products = ["I", "Q"] if ncorr == 2 else ["I", "Q", "U", "V"]
    for prod in products:
        xds = str(tmp_path / f"{prod}.xds")
        dt = str(tmp_path / f"{prod}.dt")
        init(ms, xds, product=prod)
        imager(xds, dt, nband=1, nx=48, cell_size=cell_asec, epsilon=1e-9, fits_out=False)
        tree = TreeStore(dt)
        node = tree.group("band0000_time0000")
        d = np.asarray(node.read("DIRTY")) / float(np.asarray(node.read("WSUM"))[0])
        peaks[prod] = d[24, 24]
    assert peaks["I"] == pytest.approx(1.0, rel=0.05)
    assert peaks["Q"] / peaks["I"] == pytest.approx(0.3, abs=0.02)
    if ncorr == 4:
        assert peaks["U"] / peaks["I"] == pytest.approx(0.2, abs=0.02)
        assert peaks["V"] / peaks["I"] == pytest.approx(0.1, abs=0.02)
