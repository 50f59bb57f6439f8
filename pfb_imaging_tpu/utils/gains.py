"""QuartiCal-style gain-table ingest with time/channel interpolation.

The reference interpolates externally-solved gain tables onto the
visibility stream at ingest: ``construct_mappings`` builds per-row
time-bin and per-channel freq-bin maps into the gain grid
(reference utils/misc.py:204-466) and ``stokes2vis`` applies the mapped
Jones terms inside ``weight_data`` (utils/stokes2vis.py:26-368).

Here the table is a plain array store and the mapping is a pair of
nearest-bin index maps — the application path is the existing full/diag
Jones ``weight_data`` (utils/stokes.py).

Table schema (TreeStore or .npz):
    GAINS      (ntime_g, nchan_g, nant, ncorr) complex — diagonal terms,
               or (ntime_g, nchan_g, nant, 2, 2) complex — full Jones
    GAIN_TIME  (ntime_g,) seconds (same clock as the container TIME)
    GAIN_FREQ  (nchan_g,) Hz
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_gain_table", "save_gain_table", "nearest_bin", "gains_to_jones"]


def save_gain_table(store, gains, gain_time, gain_freq) -> None:
    store.write("GAINS", np.asarray(gains))
    store.write("GAIN_TIME", np.asarray(gain_time, np.float64))
    store.write("GAIN_FREQ", np.asarray(gain_freq, np.float64))


def load_gain_table(path):
    """Returns (gains, gain_time, gain_freq) from a TreeStore path or .npz."""
    p = str(path)
    if p.endswith(".npz"):
        z = np.load(p)
        return np.asarray(z["GAINS"]), np.asarray(z["GAIN_TIME"]), np.asarray(z["GAIN_FREQ"])
    from .store import TreeStore

    st = TreeStore(p)
    return (
        np.asarray(st.read("GAINS")),
        np.asarray(st.read("GAIN_TIME")),
        np.asarray(st.read("GAIN_FREQ")),
    )


def nearest_bin(grid: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Nearest-gridpoint index map (the reference's gain mappings are
    containing-bin lookups over solution intervals; for solution grids
    stored at interval centres that is the nearest centre)."""
    grid = np.asarray(grid, np.float64)
    x = np.asarray(x, np.float64)
    if grid.size == 1:
        return np.zeros(x.shape, np.int64)
    hi = np.clip(np.searchsorted(grid, x), 1, grid.size - 1)
    lo = hi - 1
    pick_hi = np.abs(grid[hi] - x) < np.abs(x - grid[lo])
    return np.where(pick_hi, hi, lo)


def gains_to_jones(gains, gain_time, gain_freq, times, ant1, ant2, freqs):
    """Map a gain table onto a visibility partition.

    Args:
        gains: (ntg, nfg, nant, ncorr) diagonal or (ntg, nfg, nant, 2, 2).
        times: (nrow,) row times; ant1/ant2: (nrow,) antenna indices;
        freqs: (nchan,) channel frequencies.

    Returns:
        (jones_p, jones_q) in ``weight_data``'s layout: diagonal
        (ncorr, nrow, nchan), or full (2, 2, nrow, nchan).
    """
    gains = np.asarray(gains)
    ti = nearest_bin(gain_time, times)  # (nrow,)
    fi = nearest_bin(gain_freq, freqs)  # (nchan,)
    full = gains.ndim == 5
    # (nrow, nchan, ...) gather — the gain grid is small, the fancy index
    # is the row x chan outer product of the two bin maps
    jp = gains[ti[:, None], fi[None, :], np.asarray(ant1)[:, None]]
    jq = gains[ti[:, None], fi[None, :], np.asarray(ant2)[:, None]]
    if full:
        # (nrow, nchan, 2, 2) -> (2, 2, nrow, nchan)
        return jp.transpose(2, 3, 0, 1), jq.transpose(2, 3, 0, 1)
    # (nrow, nchan, ncorr) -> (ncorr, nrow, nchan)
    return jp.transpose(2, 0, 1), jq.transpose(2, 0, 1)
