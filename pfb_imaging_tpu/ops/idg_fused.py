"""Fused IDG patch evaluation — Pallas TPU kernel (parametric subgrid).

The grouped IDG runtime's binding cost is HBM traffic: the materialised
phase matrices (``IDGPlan.au_re``..``av_im``) are ~64 bytes per visibility
slot, read in full on every residual evaluation (~3.2 GB at 8M vis — a
third of the measured time at the chip's streaming wall, docs/perf.md).
This kernel removes the A matrices entirely:

  * the plan stores only the per-slot *scalars* (du, phi per axis: 16
    bytes/slot, 4x less traffic), and the kernel resynthesises the phase
    rows on the fly by **rotation powers**: the subgrid coordinates
    ``xc = fftfreq(S)*S`` are integers, so Z[x, v] = z_v^xc[x] *
    q_v^(xc[x]^2) needs two sincos per (slot, axis) plus S iterated
    complex multiplies — VPU work an order of magnitude below the old
    HBM read, and *more* accurate than direct f32 sincos of the large
    phase (the rotation angles stay < 2 pi, so f32 argument reduction
    never sees the ~40 rad phases the materialised build reduces);
  * the per-group (S, G) x (G, S) complex contractions — which reach only
    ~0.65 Tflop/s as XLA batched einsums — are packed **PK = 128 // S
    groups per MXU matmul**: Z rows are built x-major so a PK-group slab
    is one contiguous (PK*S, G) tile, the taper-DFT factor becomes the
    row-permuted ``kron(wc, I_PK)`` constant (block structure absorbs
    the packing permutation at zero cost), and the cross-group garbage
    is discarded by a masked 0/1 "stacking" matmul that compacts the
    block-diagonal of the (PK*S, PK*S) product to (PK*S, S) — g-major
    rows, so the result reshapes for free to the (ng, S*S) layout the
    bucket-lattice assembly consumes (gridder_idg._assemble_bin).

Supported subgrids (round 4): S = 16 (PK=8, the epsilon >= 4e-6 tier),
S = 24 (PK=5, the tight-epsilon tier down to 1e-8 — previously served by
the 4x-slower materialised/onfly einsum path), S = 32 (PK=4, the
wide-field coarse-lattice tier: half=16 buckets quarter the group count
of sparse wplanes layouts).

Matmul precision (``zpasses``): TPU MXU is bf16; plain f32 `dot`
(HIGHEST) costs 6 passes through XLA. ``zpasses=3`` uses a manual hi/lo
bf16 split (ah bh + ah bl + al bh) giving ~1e-6 worst-case patch error —
inside the S=16 free-taper fit envelope (4e-6) and right for the
epsilon >= 4e-6 tier. ``zpasses=6`` splits both operands into three
exact bf16 pieces (8+8+8 significand bits) and keeps all terms above
~2^-24 (hh, hm+mh, hl+mm+lh) — numerically equivalent to the HIGHEST
lowering, for the epsilon < 4e-6 tiers where kernel noise must sit at
the f32 substrate floor (~2e-7), not above it. The 0/1 extraction
matmuls split the *values* into bf16 passes (``expasses``: 2 is exact to
~2^-17, 3 is exact).

Note on the naive bf16 splits: outside Pallas the runtime's pinned
``--xla_allow_excess_precision=true`` elides f32->bf16 converts and
collapses split residuals (the round-3 on-chip defect, docs/perf.md) —
XLA-side code must use Veltkamp splits (gridder_idg._split3_bf16).
Inside a Pallas kernel Mosaic compiles the converts as written, so the
cheap naive splits are safe here (verified on-chip by the bench
gridder_verify stage every round).

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

G = 128          # group size = MXU lane count (fixed)
SUPPORTED_S = (16, 24, 32)

# groups per kernel block (VMEM-sized; must be a multiple of pack_count(S)).
# Sized against the ~16 MB scoped-vmem stack limit: the 4 rotation
# scratches (S, BG, G) f32 dominate, plus the zpasses=6 split temporaries
# (S=32 at BG=64 measured 18.4 MB of stack — over the limit).
_BLOCK_GROUPS = {16: 128, 24: 80, 32: 32}

__all__ = ["fused_supported", "patches_from_vals", "vals_from_patches",
           "wc_perm_kron", "pack_count", "block_groups", "G", "SUPPORTED_S"]


def pack_count(S: int) -> int:
    """Groups per 128-row MXU pack (PK)."""
    return 128 // S


def block_groups(S: int) -> int:
    """Groups per kernel grid block (the plan pads ngroups to this)."""
    return _BLOCK_GROUPS[S]


def fused_supported(subgrid: int, group_size: int, dtype) -> bool:
    """The kernel covers (S in {16, 24, 32}, G=128) f32 plans."""
    return subgrid in SUPPORTED_S and group_size == G and np.dtype(dtype) == np.float32


def wc_perm_kron(wc: np.ndarray) -> np.ndarray:
    """(S, S) complex taper-DFT factor -> packed constant (2, PK*S, PK*S).

    Row-permuted kron(wc, I_PK): W[g*S + k, x*PK + g] = wc[k, x], so with
    Z stored x-major (rows x*PK + g) the product W @ Z lands g-major
    (rows g*S + k) — the packing permutation is absorbed into this
    constant and costs nothing at runtime.
    """
    S = wc.shape[0]
    PK = pack_count(S)
    out = np.zeros((2, PK * S, PK * S), np.float32)
    for g in range(PK):
        out[0, g * S : (g + 1) * S, g::PK] = wc.real
        out[1, g * S : (g + 1) * S, g::PK] = wc.imag
    return out


def _mm_split(a, b, zpasses):
    """f32 matmul as bf16 passes.

    zpasses=3: hi/lo split, drops the ~2^-16 al*bl class (~1e-6 after the
    G-lane contraction averages it down). zpasses=6: 8+8+8 three-piece
    splits keeping every term above ~2^-24 — HIGHEST-equivalent."""
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    ra = a - ah.astype(jnp.float32)
    bh = b.astype(jnp.bfloat16)
    rb = b - bh.astype(jnp.float32)
    if zpasses <= 3:
        al = ra.astype(jnp.bfloat16)
        bl = rb.astype(jnp.bfloat16)
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    am = ra.astype(jnp.bfloat16)
    al = (ra - am.astype(jnp.float32)).astype(jnp.bfloat16)
    bm = rb.astype(jnp.bfloat16)
    bl = (rb - bm.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        d(ah, bh)
        + (d(ah, bm) + d(am, bh))
        + (d(ah, bl) + d(am, bm) + d(al, bh))
    )


def _rot_block(S, du, phi, scr_r, scr_i, vre=None, vim=None, conj=False):
    """(BG, G) angles -> scratch (S, BG, G): plane x = Z row (xc[x] power).

    xc = fftfreq(S)*S = [0..S/2-1, -S/2..-1]; forward powers multiply by
    z * q^(2k-1), backward by conj(z) * q^(2k-1) (the chirp q^(k^2) is
    even). ``conj`` rotates with conj(z), conj(q) (forward/degrid path);
    ``vre/vim`` scales every row by V (adjoint value fold, saving a
    separate pass over the scratch).
    """
    NH = S // 2
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
    for k in range(1, NH + 1):
        fr = zr * cr - zi * ci
        fi = zr * ci + zi * cr
        br = zr * cr + zi * ci
        bi = zr * ci - zi * cr           # conj(z) * q^(2k-1)
        pr, pi_ = pr * fr - pi_ * fi, pr * fi + pi_ * fr
        mr, mi = mr * br - mi * bi, mr * bi + mi * br
        if k <= NH - 1:
            put(k, pr, pi_)
        put(S - k, mr, mi)
        cr, ci = cr * q2r - ci * q2i, cr * q2i + ci * q2r


def _masks(S):
    PK = pack_count(S)
    RP = PK * S
    r = jax.lax.broadcasted_iota(jnp.int32, (RP, RP), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (RP, RP), 1)
    dmask = (r // S == c // S).astype(jnp.float32)
    rK = jax.lax.broadcasted_iota(jnp.int32, (RP, S), 0)
    cK = jax.lax.broadcasted_iota(jnp.int32, (RP, S), 1)
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


def _adj_kernel_body(S, zpasses, expasses, scal, vals, wur, wui, wvr, wvi,
                     outr, outi, zur, zui, bvr, bvi):
    PK = pack_count(S)
    BG = block_groups(S)
    _rot_block(S, scal[0], scal[1], zur, zui)
    _rot_block(S, scal[2], scal[3], bvr, bvi, vals[0], vals[1])
    dmask, stack = _masks(S)
    mm = partial(_mm_split, zpasses=zpasses)
    for p in range(BG // PK):
        s0 = p * PK
        Zur = zur[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Zui = zui[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Bvr = bvr[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Bvi = bvi[:, s0 : s0 + PK, :].reshape(PK * S, G)
        aur = mm(wur[:, :], Zur) - mm(wui[:, :], Zui)
        aui = mm(wur[:, :], Zui) + mm(wui[:, :], Zur)
        cvr = mm(wvr[:, :], Bvr) - mm(wvi[:, :], Bvi)
        cvi = mm(wvr[:, :], Bvi) + mm(wvi[:, :], Bvr)
        pr_ = mm(aur, cvr.T) - mm(aui, cvi.T)
        pi_ = mm(aur, cvi.T) + mm(aui, cvr.T)
        outr[s0 * S : (s0 + PK) * S, :] = _exact_dot(pr_ * dmask, stack, expasses)
        outi[s0 * S : (s0 + PK) * S, :] = _exact_dot(pi_ * dmask, stack, expasses)


@partial(jax.jit, static_argnames=("S", "zpasses", "expasses", "interpret"))
def patches_from_vals(scal, vals, wcu8, wcv8, S: int = 16, zpasses: int = 3,
                      expasses: int = 2, interpret: bool = False):
    """Adjoint patch evaluation: (2, ng, G) values -> (2, ng, S, S).

    ``scal`` is the plan's (4, ng, G) [du_u, phi_u, du_v, phi_v] angle
    array (du already scaled by 2 pi / S), ``wcu8/wcv8`` the
    (2, PK*S, PK*S) permuted-kron taper-DFT constants; ng must be a
    multiple of block_groups(S).
    """
    PK = pack_count(S)
    BG = block_groups(S)
    RP = PK * S
    ng = scal.shape[1]
    grid = (ng // BG,)
    sspec = pl.BlockSpec((4, BG, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((2, BG, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((RP, RP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BG * S, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        partial(_adj_kernel_body, S, zpasses, expasses),
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


def _fwd_kernel_body(S, zpasses, expasses, patr, pati, scal, wur, wui, wvr, wvi,
                     outr, outi, zur, zui, avr, avi):
    PK = pack_count(S)
    BG = block_groups(S)
    RP = PK * S
    # forward uses conj(A) = conj(WC) @ conj(Z): rotations run with
    # conj(z), conj(q), and the WC imaginary part enters negated
    _rot_block(S, scal[0], scal[1], zur, zui, conj=True)
    _rot_block(S, scal[2], scal[3], avr, avi, conj=True)
    dmask, stack = _masks(S)
    mm = partial(_mm_split, zpasses=zpasses)
    rO = jax.lax.broadcasted_iota(jnp.int32, (PK, RP), 0)
    cO = jax.lax.broadcasted_iota(jnp.int32, (PK, RP), 1)
    ones8t = (rO == cO // S).astype(jnp.bfloat16)   # (PK, PK*S) group-sum
    for p in range(BG // PK):
        s0 = p * PK
        Zur = zur[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Zui = zui[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Avr = avr[:, s0 : s0 + PK, :].reshape(PK * S, G)
        Avi = avi[:, s0 : s0 + PK, :].reshape(PK * S, G)
        # conj(WC) @ conj(Z): re = wur Zr + wui Zi ; im = wur Zi - wui Zr
        # (Z scratch already holds conj(Z): signs fold accordingly)
        aur = mm(wur[:, :], Zur) + mm(wui[:, :], Zui)
        aui = mm(wur[:, :], Zui) - mm(wui[:, :], Zur)
        cvr = mm(wvr[:, :], Avr) + mm(wvi[:, :], Avi)
        cvi = mm(wvr[:, :], Avi) - mm(wvi[:, :], Avr)
        # block-diag P8 from x-major patch rows: tile rows then mask
        inr = patr[:, s0 * S : (s0 + PK) * S]   # (S, PK*S) [x, g*S+y]
        ini = pati[:, s0 * S : (s0 + PK) * S]
        p8r = _exact_dot_r(stack, inr, expasses) * dmask
        p8i = _exact_dot_r(stack, ini, expasses) * dmask
        # t = P8^T @ conj(Au)  (cross terms die on the P8 mask)
        t8r = mm(p8r.T, aur) - mm(p8i.T, aui)
        t8i = mm(p8r.T, aui) + mm(p8i.T, aur)
        # vals[g, v] = sum_y t[g*S+y, v] * conj(Av)[g*S+y, v]
        mr = t8r * cvr - t8i * cvi
        mi = t8r * cvi + t8i * cvr
        outr[s0 : s0 + PK, :] = _exact_dot_r(ones8t, mr, expasses)
        outi[s0 : s0 + PK, :] = _exact_dot_r(ones8t, mi, expasses)


@partial(jax.jit, static_argnames=("S", "zpasses", "expasses", "interpret"))
def vals_from_patches(patches_t, scal, wcu8, wcv8, S: int = 16,
                      zpasses: int = 3, expasses: int = 2,
                      interpret: bool = False):
    """Forward evaluation: transposed patches (2, S, ng*S) -> (2, ng, G).

    ``patches_t[c, x, g*S + y]`` is the x-major transpose of the
    (2, ng, S, S) patch array (producer: ``jnp.transpose`` — the lattice
    extraction is g-major; the kernel needs S-lane windows per row).
    """
    PK = pack_count(S)
    BG = block_groups(S)
    RP = PK * S
    ng = patches_t.shape[2] // S
    grid = (ng // BG,)
    pspec = pl.BlockSpec((S, BG * S), lambda i: (0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((4, BG, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((RP, RP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BG, G), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        partial(_fwd_kernel_body, S, zpasses, expasses),
        grid=grid,
        in_specs=[pspec, pspec, sspec] + [wspec] * 4,
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((ng, G), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((S, BG, G), jnp.float32)] * 4,
        interpret=interpret,
    )(patches_t[0], patches_t[1], scal, wcu8[0], wcu8[1], wcv8[0], wcv8[1])
    return jnp.stack([outr, outi])
