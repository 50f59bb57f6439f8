"""The SARA wavelet dictionary Ψ (reference operators/psi.py).

Ψ concatenates the identity ("self") with multi-level 2D Daubechies
decompositions: analysis ``dot`` maps an image cube (nband, nx, ny) to
coefficients (nband, nbasis, nymax, nxmax); synthesis ``hdot`` sums the
per-basis reconstructions. ``hdot`` is the exact adjoint of ``dot`` (see
ops/wavelets.py), and also a left inverse per basis.

Multi-level packed layout (same scheme as the reference bookkeeping,
operators/psi.py:23-137): level-i blocks of shape (2cx_i, 2cy_i) are packed
at end-indices ix/iy with deeper levels overwriting shallower approx
quadrants; total extent ntot = sum_i c_i + c_{L-1}.

Where the reference runs one jitclass per band inside Ray actors
(PsiBand/ThreadPoolExecutor/PsiNocopytRay, psi.py:217-711), here the band
axis is a ``vmap`` — under a band-sharded mesh it becomes a shard_map axis
with zero code change (see parallel/).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .wavelets import coeff_size, dwt2d_level, dwt_max_level, filter_bank, idwt2d_level


class _WaveletBook:
    """Static per-basis bookkeeping."""

    def __init__(self, base: str, nx: int, ny: int, nlevel: int):
        dec_lo, dec_hi, rec_lo, rec_hi = filter_bank(base)
        self.k = len(dec_lo)
        self.dec_lo = jnp.asarray(dec_lo)
        self.dec_hi = jnp.asarray(dec_hi)
        self.rec_lo = jnp.asarray(rec_lo)
        self.rec_hi = jnp.asarray(rec_hi)
        maxlev = dwt_max_level(min(nx, ny), self.k)
        if nlevel > maxlev:
            raise ValueError(f"Decomposition level {nlevel} not possible for {base} on ({nx},{ny})")
        self.nlevel = nlevel
        cx, cy = [], []
        insx, insy = [], []
        n1, n2 = nx, ny
        for _ in range(nlevel):
            insx.append(n1)
            insy.append(n2)
            c1 = coeff_size(n1, self.k)
            c2 = coeff_size(n2, self.k)
            cx.append(c1)
            cy.append(c2)
            n1, n2 = c1, c2
        self.cx = cx
        self.cy = cy
        self.insx = insx  # input signal size at each level (for inverse crop)
        self.insy = insy
        # end indices per level (reference ix/iy bookkeeping)
        ex = [0] * nlevel
        ey = [0] * nlevel
        ex[nlevel - 1] = 2 * cx[nlevel - 1]
        ey[nlevel - 1] = 2 * cy[nlevel - 1]
        lowx = 2 * cx[nlevel - 1]
        lowy = 2 * cy[nlevel - 1]
        for i in reversed(range(nlevel - 1)):
            ex[i] = lowx + cx[i]
            ey[i] = lowy + cy[i]
            lowx += cx[i]
            lowy += cy[i]
        self.ex = ex
        self.ey = ey
        self.ntotx = ex[0]
        self.ntoty = ey[0]


class Psi:
    """SARA dictionary over an image cube.

    Args:
        nband, nx, ny: cube dimensions.
        bases: tuple of basis names, e.g. ("self","db1",...,"db8").
        nlevel: decomposition levels.
    """

    def __init__(self, nband: int, nx: int, ny: int, bases=("self", "db1", "db2", "db3"), nlevel: int = 2):
        self.nband = nband
        self.nx = nx
        self.ny = ny
        self.bases = tuple(bases)
        self.nbasis = len(self.bases)
        self.nlevel = nlevel
        self._books = {b: _WaveletBook(b, nx, ny, nlevel) for b in self.bases if b != "self"}
        ntotx = [bk.ntotx for bk in self._books.values()]
        ntoty = [bk.ntoty for bk in self._books.values()]
        # first packed axis is x-like, second y-like; attribute names follow
        # the reference's (nymax, nxmax) coefficient-cube convention
        self.nymax = max([nx] + ntotx)
        self.nxmax = max([ny] + ntoty)

    # ── single-band transforms (vmapped over the band axis) ──────────

    def _dot_band(self, x):
        outs = []
        for base in self.bases:
            if base == "self":
                pad = jnp.zeros((self.nymax, self.nxmax), dtype=x.dtype)
                outs.append(pad.at[: self.nx, : self.ny].set(x))
                continue
            bk = self._books[base]
            packed = jnp.zeros((self.nymax, self.nxmax), dtype=x.dtype)
            approx = x
            blocks = []
            for i in range(bk.nlevel):
                block = dwt2d_level(approx, bk.dec_lo, bk.dec_hi)
                blocks.append(block)
                approx = block[: bk.cx[i], : bk.cy[i]]
            # shallow first; deeper levels overwrite the approx quadrants
            for i in range(bk.nlevel):
                packed = packed.at[bk.ex[i] - 2 * bk.cx[i] : bk.ex[i], bk.ey[i] - 2 * bk.cy[i] : bk.ey[i]].set(
                    blocks[i]
                )
            outs.append(packed)
        return jnp.stack(outs)

    def _hdot_band(self, alpha):
        out = jnp.zeros((self.nx, self.ny), dtype=alpha.dtype)
        for bi, base in enumerate(self.bases):
            if base == "self":
                out = out + alpha[bi, : self.nx, : self.ny]
                continue
            bk = self._books[base]
            packed = alpha[bi]
            # deepest level's block is stored verbatim
            i = bk.nlevel - 1
            block = packed[bk.ex[i] - 2 * bk.cx[i] : bk.ex[i], bk.ey[i] - 2 * bk.cy[i] : bk.ey[i]]
            approx = idwt2d_level(block, bk.rec_lo, bk.rec_hi, bk.insx[i], bk.insy[i])
            for i in reversed(range(bk.nlevel - 1)):
                blk = packed[bk.ex[i] - 2 * bk.cx[i] : bk.ex[i], bk.ey[i] - 2 * bk.cy[i] : bk.ey[i]]
                # replace the (overwritten) approx quadrant with the
                # reconstruction from the deeper levels
                blk = blk.at[: bk.cx[i], : bk.cy[i]].set(approx)
                approx = idwt2d_level(blk, bk.rec_lo, bk.rec_hi, bk.insx[i], bk.insy[i])
            out = out + approx
        return out

    # ── public cube interface ────────────────────────────────────────

    def dot(self, x):
        """Analysis: (nband, nx, ny) -> (nband, nbasis, nymax, nxmax)."""
        return jax.vmap(self._dot_band)(x)

    def hdot(self, alpha):
        """Synthesis (adjoint): (nband, nbasis, nymax, nxmax) -> (nband, nx, ny)."""
        return jax.vmap(self._hdot_band)(alpha)
