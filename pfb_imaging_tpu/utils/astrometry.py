"""Astrometry: uvw synthesis, phase rotation, rotation matrices
(reference utils/astrometry.py:15-337)."""

from __future__ import annotations

import numpy as np

from ..constants import LIGHTSPEED


def synthesize_uvw(antpos: np.ndarray, times: np.ndarray, ant1, ant2, ra: float, dec: float, longitude: float = 21.443):
    """uvw from ITRF-ish antenna positions and hour angles.

    Args:
        antpos: (nant, 3) positions (metres, ENU or equatorial XYZ-like).
        times: (nrow,) time in seconds (used for earth rotation).
        ant1/ant2: (nrow,) antenna indices.
        ra/dec: phase centre (rad).
    """
    omega = 2 * np.pi / 86164.0905  # sidereal rate
    ha = omega * np.asarray(times) + np.deg2rad(longitude) - ra
    bl = antpos[np.asarray(ant1)] - antpos[np.asarray(ant2)]
    ch, sh = np.cos(ha), np.sin(ha)
    cd, sd = np.cos(dec), np.sin(dec)
    u = sh * bl[:, 0] + ch * bl[:, 1]
    v = -sd * ch * bl[:, 0] + sd * sh * bl[:, 1] + cd * bl[:, 2]
    w = cd * ch * bl[:, 0] - cd * sh * bl[:, 1] + sd * bl[:, 2]
    return np.stack([u, v, w], axis=1)


def cross_product_matrix(k: np.ndarray) -> np.ndarray:
    """Skew-symmetric [k]_x (reference create_cross_product_matrix)."""
    return np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])


def rotation_matrix_rodrigues(s0: np.ndarray, s1: np.ndarray) -> np.ndarray:
    """Rotation taking unit vector s0 to s1 (reference Rodrigues form)."""
    k = np.cross(s0, s1)
    sk = np.linalg.norm(k)
    ck = np.dot(s0, s1)
    if sk < 1e-15:
        return np.eye(3) if ck > 0 else -np.eye(3)
    kx = cross_product_matrix(k / sk)
    return np.eye(3) + sk * kx + (1 - ck) * (kx @ kx)


def radec_to_lmn(ra, dec, ra0, dec0):
    """Direction cosines of (ra, dec) w.r.t. phase centre (ra0, dec0)."""
    dra = np.asarray(ra) - ra0
    ell = np.cos(dec) * np.sin(dra)
    emm = np.sin(dec) * np.cos(dec0) - np.cos(dec) * np.sin(dec0) * np.cos(dra)
    enn = np.sin(dec) * np.sin(dec0) + np.cos(dec) * np.cos(dec0) * np.cos(dra)
    return ell, emm, enn


def rephase(vis, uvw, freq, radec_new, radec_ref, phasesign: float = -1.0):
    """Rephase visibilities to a new phase centre (reference rephase).

    vis: (nrow, nchan); uvw: (nrow, 3) at the reference centre.
    """
    ell, emm, enn = radec_to_lmn(radec_new[0], radec_new[1], radec_ref[0], radec_ref[1])
    phase = uvw[:, 0] * ell + uvw[:, 1] * emm + uvw[:, 2] * (enn - 1.0)
    factor = np.exp(phasesign * 2j * np.pi * np.multiply.outer(phase, freq / LIGHTSPEED))
    return vis * factor


def change_phase_dir(vis, uvw, freq, radec_new, radec_ref, phasesign: float = -1.0):
    """Rephase AND rotate uvw to the new centre (reference change_phase_dir)."""
    vis_new = rephase(vis, uvw, freq, radec_new, radec_ref, phasesign)
    s0 = np.array(radec_to_lmn(radec_ref[0], radec_ref[1], radec_ref[0], radec_ref[1]))
    s0 = np.array([0.0, 0.0, 1.0])
    s1 = np.array(radec_to_lmn(radec_new[0], radec_new[1], radec_ref[0], radec_ref[1]))
    rot = rotation_matrix_rodrigues(s0, s1)
    return vis_new, uvw @ rot.T


def parallactic_angles(times, ra: float, dec: float, longitude: float = 21.443, latitude: float = -30.713):
    """Parallactic angle per time sample for an alt-az dish
    (reference: africanus parallactic_angles via utils/beam.py:58-61;
    the reference takes the antenna mean — one site angle serves here).

    Uses the same sidereal hour-angle convention as ``synthesize_uvw``:
    HA = omega * t + longitude - ra.
    """
    omega = 2 * np.pi / 86164.0905
    ha = omega * np.asarray(times, np.float64) + np.deg2rad(longitude) - ra
    lat = np.deg2rad(latitude)
    return np.arctan2(
        np.cos(lat) * np.sin(ha),
        np.sin(lat) * np.cos(dec) - np.cos(lat) * np.sin(dec) * np.cos(ha),
    )
