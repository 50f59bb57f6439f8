"""Fused IDG patch evaluation — Pallas TPU kernel (round-3 headroom #2).

The grouped IDG runtime's binding cost is HBM traffic: the materialised
phase matrices (``IDGPlan.au_re``..``av_im``) are ~64 bytes per visibility
slot, read in full on every residual evaluation (~3.2 GB at 8M vis — a
third of the measured time at the chip's ~100 GB/s streaming wall,
docs/perf.md). This kernel removes the A matrices entirely:

  * the plan stores only the per-slot *scalars* (du, phi per axis: 16
    bytes/slot, 4x less traffic), and the kernel resynthesises the phase
    rows on the fly by **rotation powers**: the subgrid coordinates
    ``xc = fftfreq(S)*S`` are integers, so Z[x, v] = z_v^xc[x] *
    q_v^(xc[x]^2) needs two sincos per (slot, axis) plus 16 iterated
    complex multiplies — VPU work an order of magnitude below the old
    HBM read, and *more* accurate than direct f32 sincos of the large
    phase (the rotation angles stay < 2 pi, so f32 argument reduction
    never sees the ~40 rad phases the materialised build reduces);
  * the per-group complex contractions patch = (W diag(c) Zu) diag(V)
    (W diag(c) Zv)^T — (16,128)x(128,16) shapes that reach ~0.65
    Tflop/s as XLA batched einsums — are packed **8 groups per 128x128
    MXU matmul**: Z rows are built x-major so an 8-group slab is one
    contiguous (128, 128) tile, the taper-DFT factor becomes the
    row-permuted ``kron(wc, I_8)`` constant (block structure absorbs
    the packing permutation at zero cost), and the cross-group garbage
    is discarded by a masked 0/1 "stacking" matmul that compacts the
    block-diagonal of the (128,128) product to (128, 16) — g-major rows,
    so the result reshapes for free to the (ng, S*S) layout the
    bucket-lattice assembly consumes (gridder_idg._assemble_bin).

Matmul precision: TPU MXU is bf16; plain f32 `dot` (HIGHEST) costs 6
passes. The kernel uses a manual hi/lo bf16 split (3 passes: ah bh +
ah bl + al bh) giving ~7e-6 worst-case patch error — inside the IDG
plan's own free-taper fit envelope (4-8e-6). The 0/1 extraction matmuls
split the *values* into two bf16 passes (exact to ~2^-17; a third pass
is available via ``expasses=3``).

Replaces the runtime of reference ducc0 gridding (operators/gridder.py)
together with gridder_idg.py; see tests/test_idg_fused.py for the
interpret-mode oracle and TPU parity tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16     # subgrid size (fixed for the fused path)
G = 128    # group size = MXU lane count
PK = 8     # groups per 128-row MXU pack
BG = 128   # groups per kernel block (VMEM-sized)

__all__ = ["fused_supported", "patches_from_vals", "vals_from_patches",
           "wc_perm_kron", "S", "G", "PK", "BG"]


def fused_supported(subgrid: int, group_size: int, dtype) -> bool:
    """The kernel is specialised to (S, G) = (16, 128) f32 plans."""
    return subgrid == S and group_size == G and np.dtype(dtype) == np.float32


def wc_perm_kron(wc: np.ndarray) -> np.ndarray:
    """(S, S) complex taper-DFT factor -> packed constant (2, 128, 128).

    Row-permuted kron(wc, I_PK): W[g*S + k, x*PK + g] = wc[k, x], so with
    Z stored x-major (rows x*PK + g) the product W @ Z8 lands g-major
    (rows g*S + k) — the packing permutation is absorbed into this
    constant and costs nothing at runtime.
    """
    out = np.zeros((2, PK * S, PK * S), np.float32)
    for g in range(PK):
        out[0, g * S : (g + 1) * S, g::PK] = wc.real
        out[1, g * S : (g + 1) * S, g::PK] = wc.imag
    return out


def _mm_split3(a, b):
    """f32 matmul as 3 bf16 passes (drops the ~2^-18 al*bl term)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _rot_block(du, phi, scr_r, scr_i, vre=None, vim=None, conj=False):
    """(BG, G) angles -> scratch (S, BG, G): plane x = Z row (xc[x] power).

    xc = fftfreq(S)*S = [0..7, -8..-1]; forward powers multiply by
    z * q^(2k-1), backward by conj(z) * q^(2k-1) (the chirp q^(k^2) is
    even). ``conj`` rotates with conj(z), conj(q) (forward/degrid path);
    ``vre/vim`` scales every row by V (adjoint value fold, saving a
    separate pass over the scratch).
    """
    sgn = -1.0 if conj else 1.0
    zr, zi = jnp.cos(du), sgn * jnp.sin(du)
    qr, qi = jnp.cos(phi), sgn * jnp.sin(phi)
    one = jnp.ones_like(du)
    zero = jnp.zeros_like(du)

    def put(k, rr, ri):
        if vre is not None:
            rr, ri = rr * vre - ri * vim, rr * vim + ri * vre
        scr_r[k, :, :] = rr
        scr_i[k, :, :] = ri

    put(0, one, zero)
    pr, pi_ = one, zero
    mr, mi = one, zero
    cr, ci = qr, qi                      # q^(2k-1) running factor
    q2r = qr * qr - qi * qi
    q2i = 2.0 * qr * qi
    for k in range(1, PK + 1):
        fr = zr * cr - zi * ci
        fi = zr * ci + zi * cr
        br = zr * cr + zi * ci
        bi = zr * ci - zi * cr           # conj(z) * q^(2k-1)
        pr, pi_ = pr * fr - pi_ * fi, pr * fi + pi_ * fr
        mr, mi = mr * br - mi * bi, mr * bi + mi * br
        if k <= PK - 1:
            put(k, pr, pi_)
        put(S - k, mr, mi)
        cr, ci = cr * q2r - ci * q2i, cr * q2i + ci * q2r


def _masks():
    r = jax.lax.broadcasted_iota(jnp.int32, (PK * S, PK * S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (PK * S, PK * S), 1)
    dmask = (r // S == c // S).astype(jnp.float32)
    rK = jax.lax.broadcasted_iota(jnp.int32, (PK * S, S), 0)
    cK = jax.lax.broadcasted_iota(jnp.int32, (PK * S, S), 1)
    stack = (rK % S == cK).astype(jnp.bfloat16)
    return dmask, stack


def _exact_dot(m, w, expasses):
    """m @ w with 0/1 bf16 w, m split into bf16 passes (exact selection)."""
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    mh = m.astype(jnp.bfloat16)
    acc = d(mh, w)
    if expasses >= 2:
        r1 = m - mh.astype(jnp.float32)
        ml = r1.astype(jnp.bfloat16)
        acc = acc + d(ml, w)
        if expasses >= 3:
            mll = (r1 - ml.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + d(mll, w)
    return acc


def _exact_dot_r(w, m, expasses):
    """w @ m with 0/1 bf16 w, m (right) split into bf16 passes."""
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    mh = m.astype(jnp.bfloat16)
    acc = d(w, mh)
    if expasses >= 2:
        r1 = m - mh.astype(jnp.float32)
        ml = r1.astype(jnp.bfloat16)
        acc = acc + d(w, ml)
        if expasses >= 3:
            mll = (r1 - ml.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + d(w, mll)
    return acc


# ── adjoint: group values -> patches ─────────────────────────────────


def _adj_kernel_body(expasses, scal, vals, wur, wui, wvr, wvi,
                     outr, outi, zur, zui, bvr, bvi):
    _rot_block(scal[0], scal[1], zur, zui)
    _rot_block(scal[2], scal[3], bvr, bvi, vals[0], vals[1])
    dmask, stack = _masks()
    for p in range(BG // PK):
        s0 = p * PK
        Zur = zur[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Zui = zui[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Bvr = bvr[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Bvi = bvi[:, s0 : s0 + PK, :].reshape(PK * S, G)
        aur = _mm_split3(wur[:, :], Zur) - _mm_split3(wui[:, :], Zui)
        aui = _mm_split3(wur[:, :], Zui) + _mm_split3(wui[:, :], Zur)
        cvr = _mm_split3(wvr[:, :], Bvr) - _mm_split3(wvi[:, :], Bvi)
        cvi = _mm_split3(wvr[:, :], Bvi) + _mm_split3(wvi[:, :], Bvr)
        pr_ = _mm_split3(aur, cvr.T) - _mm_split3(aui, cvi.T)
        pi_ = _mm_split3(aur, cvi.T) + _mm_split3(aui, cvr.T)
        outr[s0 * S : (s0 + PK) * S, :] = _exact_dot(pr_ * dmask, stack, expasses)
        outi[s0 * S : (s0 + PK) * S, :] = _exact_dot(pi_ * dmask, stack, expasses)


@partial(jax.jit, static_argnames=("expasses", "interpret"))
def patches_from_vals(scal, vals, wcu8, wcv8, expasses: int = 2,
                      interpret: bool = False):
    """Adjoint patch evaluation: (2, ng, G) values -> (2, ng, S, S).

    ``scal`` is the plan's (4, ng, G) [du_u, phi_u, du_v, phi_v] angle
    array (du already scaled by 2 pi / S), ``wcu8/wcv8`` the (2,128,128)
    permuted-kron taper-DFT constants; ng must be a multiple of 128.
    """
    ng = scal.shape[1]
    grid = (ng // BG,)
    sspec = pl.BlockSpec((4, BG, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((2, BG, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((PK * S, PK * S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BG * S, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        partial(_adj_kernel_body, expasses),
        grid=grid,
        in_specs=[sspec, vspec] + [wspec] * 4,
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((ng * S, S), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((S, BG, G), jnp.float32)] * 4,
        interpret=interpret,
    )(scal, vals, wcu8[0], wcu8[1], wcv8[0], wcv8[1])
    # (ng*S, S) -> (2, ng, S, S) is a pure reshape (g-major rows)
    return jnp.stack([outr, outi]).reshape(2, ng, S, S)


# ── forward: patches -> group values (exact transpose) ───────────────


def _fwd_kernel_body(expasses, patr, pati, scal, wur, wui, wvr, wvi,
                     outr, outi, zur, zui, avr, avi):
    # forward uses conj(A) = conj(WC) @ conj(Z): rotations run with
    # conj(z), conj(q), and the WC imaginary part enters negated
    _rot_block(scal[0], scal[1], zur, zui, conj=True)
    _rot_block(scal[2], scal[3], avr, avi, conj=True)
    dmask, stack = _masks()
    rO = jax.lax.broadcasted_iota(jnp.int32, (PK, PK * S), 0)
    cO = jax.lax.broadcasted_iota(jnp.int32, (PK, PK * S), 1)
    ones8t = (rO == cO // S).astype(jnp.bfloat16)   # (PK, PK*S) group-sum
    for p in range(BG // PK):
        s0 = p * PK
        Zur = zur[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Zui = zui[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Avr = avr[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Avi = avi[:, s0 : s0 + PK, :].reshape(PK * S, G)
        # conj(WC) @ conj(Z): re = wur Zr + wui Zi ; im = wur Zi - wui Zr
        # (Z scratch already holds conj(Z): signs fold accordingly)
        aur = _mm_split3(wur[:, :], Zur) + _mm_split3(wui[:, :], Zui)
        aui = _mm_split3(wur[:, :], Zui) - _mm_split3(wui[:, :], Zur)
        cvr = _mm_split3(wvr[:, :], Avr) + _mm_split3(wvi[:, :], Avi)
        cvi = _mm_split3(wvr[:, :], Avi) - _mm_split3(wvi[:, :], Avr)
        # block-diag P8 from x-major patch rows: tile rows then mask
        inr = patr[:, s0 * S : (s0 + PK) * S]   # (S, PK*S) [x, g*S+y]
        ini = pati[:, s0 * S : (s0 + PK) * S]
        p8r = _exact_dot_r(stack, inr, expasses) * dmask
        p8i = _exact_dot_r(stack, ini, expasses) * dmask
        # t = P8^T @ conj(Au)  (cross terms die on the P8 mask)
        t8r = _mm_split3(p8r.T, aur) - _mm_split3(p8i.T, aui)
        t8i = _mm_split3(p8r.T, aui) + _mm_split3(p8i.T, aur)
        # vals[g, v] = sum_y t[g*S+y, v] * conj(Av)[g*S+y, v]
        mr = t8r * cvr - t8i * cvi
        mi = t8r * cvi + t8i * cvr
        outr[s0 : s0 + PK, :] = _exact_dot_r(ones8t, mr, expasses)
        outi[s0 : s0 + PK, :] = _exact_dot_r(ones8t, mi, expasses)


@partial(jax.jit, static_argnames=("expasses", "interpret"))
def vals_from_patches(patches_t, scal, wcu8, wcv8, expasses: int = 2,
                      interpret: bool = False):
    """Forward evaluation: transposed patches (2, S, ng*S) -> (2, ng, G).

    ``patches_t[c, x, g*S + y]`` is the x-major transpose of the
    (2, ng, S, S) patch array (producer: ``jnp.transpose`` — the lattice
    extraction is g-major; the kernel needs 16-lane windows per row).
    """
    ng = patches_t.shape[2] // S
    grid = (ng // BG,)
    pspec = pl.BlockSpec((S, BG * S), lambda i: (0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((4, BG, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((PK * S, PK * S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BG, G), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        partial(_fwd_kernel_body, expasses),
        grid=grid,
        in_specs=[pspec, pspec, sspec] + [wspec] * 4,
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((ng, G), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((S, BG, G), jnp.float32)] * 4,
        interpret=interpret,
    )(patches_t[0], patches_t[1], scal, wcu8[0], wcu8[1], wcv8[0], wcv8[1])
    return jnp.stack([outr, outi])
