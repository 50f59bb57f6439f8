"""MSv4 zarr ingest: self-contained zarr v2 reader + adapter (utils/zarrio,
utils/msv4) against the ingest contract of reference
utils/stokes2vis_msv4.py (VISIBILITY/FLAG/UVW on (time, baseline, chan,
corr) grids, antenna/field subtables, polarization labels)."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from pfb_imaging_tpu.utils import zarrio


# ── zarr reader round-trips ──────────────────────────────────────────


@pytest.mark.parametrize("comp", [None, {"id": "zlib", "level": 5}, {"id": "zstd", "level": 3}])
def test_zarr_roundtrip_codecs(tmp_path, comp):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "store")
    zarrio.write_group(root, attrs={"hello": 1})
    for name, arr, chunks in [
        ("a", rng.standard_normal((13, 7)).astype(np.float32), (5, 4)),
        ("b", (rng.standard_normal((6, 4, 3)) + 1j * rng.standard_normal((6, 4, 3))).astype(np.complex64), (2, 4, 2)),
        ("c", rng.integers(0, 100, (11,)).astype(np.int64), (4,)),
        ("d", np.float64(3.25).reshape(()), None),
    ]:
        zarrio.write_array(root, name, arr, chunks=chunks, compressor=comp, attrs={"n": name})
    zarrio.consolidate(root)
    g = zarrio.open_zarr(root)
    assert g.attrs == {"hello": 1}
    assert set(g.arrays()) == {"a", "b", "c", "d"}
    rng2 = np.random.default_rng(0)
    expect = {
        "a": rng2.standard_normal((13, 7)).astype(np.float32),
        "b": (rng2.standard_normal((6, 4, 3)) + 1j * rng2.standard_normal((6, 4, 3))).astype(np.complex64),
        "c": rng2.integers(0, 100, (11,)).astype(np.int64),
        "d": np.float64(3.25).reshape(()),
    }
    for name, arr in expect.items():
        a = g.array(name)
        assert a.attrs == {"n": name}
        np.testing.assert_array_equal(a.read(), arr)


def test_zarr_reader_values(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path / "s")
    zarrio.write_group(root)
    x = rng.standard_normal((9, 5, 4)).astype(np.float64)
    zarrio.write_array(root, "x", x, chunks=(4, 2, 3))
    # no consolidation: exercise the directory-walk path
    g = zarrio.open_zarr(root)
    np.testing.assert_array_equal(g.array("x").read(), x)


def test_zarr_missing_chunk_fill(tmp_path):
    root = str(tmp_path / "s")
    zarrio.write_group(root)
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    zarrio.write_array(root, "x", x, chunks=(2, 2), compressor=None)
    os.remove(os.path.join(root, "x", "0.1"))
    meta = json.load(open(os.path.join(root, "x", ".zarray")))
    meta["fill_value"] = -1.0
    json.dump(meta, open(os.path.join(root, "x", ".zarray"), "w"))
    got = zarrio.open_zarr(root).array("x").read()
    assert (got[0:2, 2:4] == -1.0).all()
    np.testing.assert_array_equal(got[:, :2], x[:, :2])


# ── blosc frame decode (encoder lives here, spec-following) ──────────


def _blosc_encode(data: bytes, typesize: int, cname="zstd", shuffle=True, blocksize=None):
    import zstandard as zstd

    nbytes = len(data)
    blocksize = blocksize or min(max(typesize * 256, 1024), nbytes or 1)
    blocksize -= blocksize % typesize or 0
    blocksize = max(blocksize, typesize)
    nblocks = -(-nbytes // blocksize)
    flags = (0x1 if shuffle else 0) | ({"zlib": 3, "zstd": 4}[cname] << 5)
    blocks = []
    for i in range(nblocks):
        raw = data[i * blocksize : (i + 1) * blocksize]
        if shuffle and typesize > 1 and len(raw) % typesize == 0:
            raw = zarrio._shuffle(raw, typesize)
            splits = [raw[j * (len(raw) // typesize) : (j + 1) * (len(raw) // typesize)] for j in range(typesize)]
        else:
            splits = [raw]
        enc = b""
        for sp in splits:
            c = zstd.ZstdCompressor(level=3).compress(sp) if cname == "zstd" else zlib.compress(sp)
            if len(c) >= len(sp):
                c = sp  # stored
            enc += struct.pack("<I", len(c)) + c
        blocks.append(enc)
    header = bytes([2, 1, flags, typesize]) + struct.pack("<III", nbytes, blocksize, 0)
    bstarts = []
    pos = 16 + 4 * nblocks
    for b in blocks:
        bstarts.append(pos)
        pos += len(b)
    frame = header + struct.pack(f"<{nblocks}I", *bstarts) + b"".join(blocks)
    # fix cbytes field
    return frame[:12] + struct.pack("<I", len(frame)) + frame[16:]


@pytest.mark.parametrize("shuffle", [True, False])
@pytest.mark.parametrize("cname", ["zstd", "zlib"])
def test_blosc_decode(shuffle, cname):
    rng = np.random.default_rng(2)
    arr = rng.standard_normal(1000).astype(np.float32)
    frame = _blosc_encode(arr.tobytes(), typesize=4, cname=cname, shuffle=shuffle)
    out = zarrio._blosc_decompress(frame)
    np.testing.assert_array_equal(np.frombuffer(out, np.float32), arr)


# ── MSv4 adapter end-to-end: simulate -> MSv4 zarr -> init parity ────


def _treestore_to_msv4(ms_path, zarr_path):
    """Re-encode a simulator TreeStore container as an MSv4 zarr set."""
    from pfb_imaging_tpu.utils.store import TreeStore

    ms = TreeStore(ms_path)
    attrs = ms.attrs
    freqs = np.asarray(attrs["freq"])
    pol = ["XX", "YY"] if attrs.get("feed_type", "linear") == "linear" else ["RR", "LL"]
    zarrio.write_group(zarr_path)
    for gi, key in enumerate(ms.groups()):
        g = ms.group(key)
        vis = np.asarray(g.read("VIS"))          # (corr, row, chan)
        wgt = np.asarray(g.read("WEIGHT"))
        flag = np.asarray(g.read("FLAG"))        # (row, chan)
        uvw = np.asarray(g.read("UVW"))
        times = np.asarray(g.read("TIME"))
        a1 = np.asarray(g.read("ANTENNA1"))
        a2 = np.asarray(g.read("ANTENNA2"))
        ncorr, nrow, nchan = vis.shape
        ut = np.unique(times)
        nbl = nrow // ut.size
        node = f"msv4_{gi:04d}"
        zarrio.write_group(zarr_path, node, attrs={"time": float(times.mean())})
        vz = np.moveaxis(vis, 0, -1).reshape(ut.size, nbl, nchan, ncorr)
        wz = np.moveaxis(wgt, 0, -1).reshape(ut.size, nbl, nchan, ncorr)
        fz = np.broadcast_to(flag.reshape(ut.size, nbl, nchan, 1), vz.shape)
        zarrio.write_array(zarr_path, f"{node}/VISIBILITY", vz.astype(np.complex64), chunks=(2, nbl, nchan, ncorr))
        zarrio.write_array(zarr_path, f"{node}/WEIGHT", wz.astype(np.float32))
        zarrio.write_array(zarr_path, f"{node}/FLAG", np.ascontiguousarray(fz).astype(np.uint8))
        zarrio.write_array(zarr_path, f"{node}/UVW", uvw.reshape(ut.size, nbl, 3))
        zarrio.write_array(zarr_path, f"{node}/time", ut)
        zarrio.write_array(zarr_path, f"{node}/baseline_id", np.arange(nbl))
        zarrio.write_array(zarr_path, f"{node}/frequency", freqs,
                           attrs={"spectral_window_name": "spw0"})
        zarrio.write_array(zarr_path, f"{node}/polarization", np.array(pol, dtype="S4"))
        ants = np.array([f"m{int(i):03d}" for i in range(int(max(a1.max(), a2.max())) + 1)], dtype="S8")
        zarrio.write_array(zarr_path, f"{node}/baseline_antenna1_name", ants[a1[:nbl]])
        zarrio.write_array(zarr_path, f"{node}/baseline_antenna2_name", ants[a2[:nbl]])
        zarrio.write_group(zarr_path, f"{node}/antenna_xds")
        zarrio.write_array(zarr_path, f"{node}/antenna_xds/antenna_name", ants)
        zarrio.write_group(zarr_path, f"{node}/field_and_source_xds")
        zarrio.write_array(zarr_path, f"{node}/field_and_source_xds/FIELD_PHASE_CENTER_DIRECTION",
                           np.array([[attrs.get("ra", 0.0), attrs.get("dec", 0.0)]]))
    zarrio.consolidate(zarr_path)


def test_msv4_init_parity(tmp_path):
    from pfb_imaging_tpu.core.init import init
    from pfb_imaging_tpu.core.simulate import simulate_vis_store
    from pfb_imaging_tpu.utils.store import TreeStore

    ms_path = str(tmp_path / "ms")
    simulate_vis_store(ms_path, nant=5, ntime=4, nchan=3, nx=16)
    zpath = str(tmp_path / "msv4.zarr")
    _treestore_to_msv4(ms_path, zpath)

    out_ts = init(ms_path, str(tmp_path / "xds_ts"), apply_jones=False)
    out_z = init(zpath, str(tmp_path / "xds_z"), apply_jones=False)
    ts = TreeStore(str(tmp_path / "xds_ts"))
    tz = TreeStore(str(tmp_path / "xds_z"))
    kts, kz = sorted(ts.groups()), sorted(tz.groups())
    assert len(kts) == len(kz) >= 1
    for ka, kb in zip(kts, kz):
        a, b = ts.group(ka), tz.group(kb)
        for prod in ("VIS", "WEIGHT", "MASK", "UVW", "FREQ"):
            x, y = np.asarray(a.read(prod)), np.asarray(b.read(prod))
            np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5, err_msg=prod)


def test_msv4_degrid_writeback(tmp_path):
    """Round trip through the REAL MSv4 store: ingest -> component model ->
    degrid -> re-read MODEL_DATA from the zarr processing set (round-3
    VERDICT #7; reference xds_to_table MODEL_DATA writes,
    core/degrid.py:333-337). The MSv4 write must match the TreeStore-target
    degrid bit-for-bit (same render, different writer) up to the c64 cast."""
    from pfb_imaging_tpu.core.degrid import degrid
    from pfb_imaging_tpu.core.simulate import simulate_vis_store
    from pfb_imaging_tpu.utils.modelspec import fit_image_cube, save_mds
    from pfb_imaging_tpu.utils.store import TreeStore

    ms_path = str(tmp_path / "ms")
    _, truth = simulate_vis_store(ms_path, nant=5, ntime=2, nchan=3, nx=16)
    zpath = str(tmp_path / "msv4.zarr")
    _treestore_to_msv4(ms_path, zpath)

    # tiny smooth component model over the band
    rng = np.random.default_rng(3)
    freqs = np.asarray(TreeStore(ms_path).attrs["freq"])
    nx = truth["nx"]
    cube = np.zeros((1, freqs.size, nx, nx))
    cube[:, :, nx // 2, nx // 2] = 1.0 + 0.1 * rng.standard_normal(freqs.size)
    coeffs, ix, iy, mattrs = fit_image_cube(np.zeros(1), freqs, cube)
    mds = str(tmp_path / "m.mds")
    save_mds(TreeStore(mds, mode="w"), coeffs, ix, iy, mattrs)

    degrid(mds, ms_path, truth["cell_rad"], to_corr=True)  # TreeStore target
    degrid(mds, zpath, truth["cell_rad"])  # MSv4 target (corr layout forced)

    ts = TreeStore(ms_path)
    z = zarrio.open_zarr(zpath)
    for gi, key in enumerate(ts.groups()):
        ref = np.asarray(ts.group(key).read("MODEL_DATA"))  # (ncorr, row, chan)
        md = z.group(f"msv4_{gi:04d}").array("MODEL_DATA").read()
        got = np.moveaxis(md.reshape(-1, md.shape[2], md.shape[3]), -1, 0)
        np.testing.assert_allclose(got, ref.astype(np.complex64), rtol=1e-6, atol=1e-6 * np.abs(ref).max())
