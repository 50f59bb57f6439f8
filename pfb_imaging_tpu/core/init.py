"""``init``: raw measurement container -> Stokes visibility product (.xds
analogue). Reference core/init.py:21-376 + utils/stokes2vis.py:26-368.

Per partition: apply (optional) diagonal Jones and convert correlations to
the requested Stokes product via the weighted-least-squares ``weight_data``
(the jitted replacement for the reference's numba literal-specialised
overloads), then write VIS/WEIGHT/MASK (row, chan) + UVW/FREQ.

Channel/BDA averaging (africanus in the reference,
stokes2vis.py:324-365) is an ingest-time volume optimisation, represented
here by simple channel binning; time-dependent BDA is a known gap for a
later round.
"""

from __future__ import annotations

import numpy as np

from ..utils.logging import get_logger
from ..utils.stokes import weight_data
from ..utils.store import TreeStore

log = get_logger("INIT")


def _chan_average(vis, wgt, mask, freqs, cab: int):
    """Weighted channel binning by factor cab."""
    if cab <= 1:
        return vis, wgt, mask, freqs
    nrow, nchan = vis.shape
    ncout = nchan // cab
    sel = slice(0, ncout * cab)
    v = (vis[:, sel] * wgt[:, sel] * mask[:, sel]).reshape(nrow, ncout, cab).sum(-1)
    w = (wgt[:, sel] * mask[:, sel]).reshape(nrow, ncout, cab).sum(-1)
    f = freqs[sel].reshape(ncout, cab).mean(-1)
    m = (w > 0).astype(np.uint8)
    v = np.where(w > 0, v / np.where(w > 0, w, 1), 0)
    return v, w, m, f


def init(
    ms_path,
    output_store,
    product: str = "I",
    chan_average: int = 1,
    apply_jones: bool = True,
):
    """Convert a raw container to a Stokes product store."""
    ms = TreeStore(ms_path)
    out = TreeStore(output_store, mode="w")
    attrs = ms.attrs
    feed_type = attrs.get("feed_type", "linear")
    freqs = np.asarray(attrs["freq"])
    out.set_attrs(
        ra=attrs.get("ra", 0.0),
        dec=attrs.get("dec", 0.0),
        product=product,
        freq=freqs.tolist(),
        cell_rad=attrs.get("cell_rad"),
    )

    for key in ms.groups():
        g = ms.group(key)
        vis = g.read("VIS")
        wgt = g.read("WEIGHT")
        flag = g.read("FLAG")
        jp = g.read("JONES_P") if (apply_jones and g.has("JONES_P")) else None
        jq = g.read("JONES_Q") if (apply_jones and g.has("JONES_Q")) else None

        vis_s, wgt_s = weight_data(vis, wgt, jones_p=jp, jones_q=jq, product=product, feed_type=feed_type)
        vis_s = np.asarray(vis_s)
        wgt_s = np.asarray(wgt_s)
        mask = ((flag == 0) & (wgt_s > 0)).astype(np.uint8)
        f_out = freqs
        if chan_average > 1:
            vis_s, wgt_s, mask, f_out = _chan_average(vis_s, wgt_s, mask, freqs, chan_average)

        og = out.group(key)
        og.set_attrs(**g.attrs)
        og.write("VIS", vis_s)
        og.write("WEIGHT", wgt_s)
        og.write("MASK", mask)
        og.write("UVW", g.read("UVW"))
        og.write("FREQ", f_out)
        log.info("init: %s -> %d rows, %d chans", key, vis_s.shape[0], vis_s.shape[1])
    return out
