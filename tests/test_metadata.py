"""EXIF/XMP metadata extraction tests with hand-built JPEG segments
(the pattern of reference test/test_extract_metadata.cpp, but with the
fixture bytes constructed in-test so ground truth is exact)."""

import math
import struct

import numpy as np
import pytest


def _tiff_exif_block():
    """Build a little-endian TIFF block: IFD0 (Make/Model/subIFD ptrs),
    Exif IFD (focal 35mm, dims), GPS IFD (lat/lon/alt/dop)."""

    def entry(tag, ttype, count, value_bytes, data_area, tiff_len):
        if len(value_bytes) <= 4:
            v = value_bytes + b"\x00" * (4 - len(value_bytes))
            return struct.pack("<HHI", tag, ttype, count) + v, data_area
        off = tiff_len + len(data_area)
        data_area += value_bytes
        return struct.pack("<HHI", tag, ttype, count) + struct.pack("<I", off), data_area

    def rational(num, den=1):
        return struct.pack("<II", num, den)

    # layout: header(8) | IFD0 | ExifIFD | GPSIFD | data area
    # compute sizes: IFD0 has 4 entries, Exif 3, GPS 7
    ifd0_n, exif_n, gps_n = 4, 3, 7
    ifd0_off = 8
    exif_off = ifd0_off + 2 + ifd0_n * 12 + 4
    gps_off = exif_off + 2 + exif_n * 12 + 4
    data_off = gps_off + 2 + gps_n * 12 + 4

    data = b""
    e = []
    make = b"TestMake\x00"
    model = b"TestModel\x00"
    ent, data = entry(271, 2, len(make), make, data, data_off)
    e.append(ent)
    ent, data = entry(272, 2, len(model), model, data, data_off)
    e.append(ent)
    ent, data = entry(34665, 4, 1, struct.pack("<I", exif_off), data, data_off)
    e.append(ent)
    ent, data = entry(34853, 4, 1, struct.pack("<I", gps_off), data, data_off)
    e.append(ent)
    ifd0 = struct.pack("<H", ifd0_n) + b"".join(e) + struct.pack("<I", 0)

    e = []
    ent, data = entry(41989, 3, 1, struct.pack("<H", 24), data, data_off)  # 35mm focal
    e.append(ent)
    ent, data = entry(40962, 4, 1, struct.pack("<I", 4000), data, data_off)
    e.append(ent)
    ent, data = entry(40963, 4, 1, struct.pack("<I", 3000), data, data_off)
    e.append(ent)
    exif = struct.pack("<H", exif_n) + b"".join(e) + struct.pack("<I", 0)

    e = []
    ent, data = entry(1, 2, 2, b"S\x00", data, data_off)
    e.append(ent)
    lat = rational(47) + rational(30) + rational(0)  # 47deg 30' -> 47.5 S
    ent, data = entry(2, 5, 3, lat, data, data_off)
    e.append(ent)
    ent, data = entry(3, 2, 2, b"E\x00", data, data_off)
    e.append(ent)
    lon = rational(8) + rational(12) + rational(0)  # 8.2 E
    ent, data = entry(4, 5, 3, lon, data, data_off)
    e.append(ent)
    ent, data = entry(5, 1, 1, b"\x00", data, data_off)  # above sea level
    e.append(ent)
    ent, data = entry(6, 5, 1, rational(4521, 10), data, data_off)  # 452.1m
    e.append(ent)
    ent, data = entry(11, 5, 1, rational(15, 10), data, data_off)  # DOP 1.5
    e.append(ent)
    gps = struct.pack("<H", gps_n) + b"".join(e) + struct.pack("<I", 0)

    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) + ifd0 + exif + gps + data
    return tiff


def _write_jpeg_with_metadata(path):
    import cv2

    img = np.full((8, 8, 3), 128, np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    jpg = bytes(jpg)

    tiff = _tiff_exif_block()
    exif_seg_body = b"Exif\x00\x00" + tiff
    exif_seg = b"\xff\xe1" + struct.pack(">H", len(exif_seg_body) + 2) + exif_seg_body

    xmp_body = (
        b"http://ns.adobe.com/xap/1.0/\x00"
        b'<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:Description '
        b'drone-dji:RelativeAltitude="+57.30" '
        b'drone-dji:GimbalRollDegree="+1.50" '
        b'drone-dji:GimbalPitchDegree="-89.90" '
        b'drone-dji:GimbalYawDegree="+12.00"/></x:xmpmeta>'
    )
    xmp_seg = b"\xff\xe1" + struct.pack(">H", len(xmp_body) + 2) + xmp_body

    out = jpg[:2] + exif_seg + xmp_seg + jpg[2:]
    with open(path, "wb") as f:
        f.write(out)


def test_native_exif_parser(tmp_path):
    from opencalibration_tpu.native import parse_exif_native

    path = str(tmp_path / "meta.jpg")
    _write_jpeg_with_metadata(path)
    res = parse_exif_native(path)
    assert res is not None, "native parser unavailable or failed"
    assert res.make == b"TestMake"
    assert res.model == b"TestModel"
    assert res.has_gps
    np.testing.assert_allclose(res.latitude, -47.5, atol=1e-9)
    np.testing.assert_allclose(res.longitude, 8.2, atol=1e-9)
    assert res.has_altitude and abs(res.altitude - 452.1) < 1e-9
    assert abs(res.dop - 1.5) < 1e-9
    assert res.width_px == 4000 and res.height_px == 3000
    assert abs(res.focal_length_35mm - 24) < 1e-9
    assert res.has_relative_altitude and abs(res.relative_altitude - 57.3) < 1e-9
    assert res.has_orientation
    assert abs(res.gimbal_pitch_deg - (-89.9)) < 1e-9


def test_extract_metadata_end_to_end(tmp_path):
    from opencalibration_tpu.extract.metadata import extract_metadata

    path = str(tmp_path / "meta.jpg")
    _write_jpeg_with_metadata(path)
    md = extract_metadata(path)
    assert md.camera_make == "TestMake"
    assert md.has_gps()
    np.testing.assert_allclose(md.latitude, -47.5, atol=1e-9)
    # relative altitude (XMP) overrides GPS altitude (reference :88-92)
    assert abs(md.altitude - 57.3) < 1e-9
    # 35mm-equivalent focal conversion (reference :117-124)
    expected = 24 / 43.27 * math.hypot(4000, 3000)
    assert abs(md.focal_length_px - expected) < 1e-6
    assert md.abs_orientation is not None


def test_extract_metadata_plain_jpeg(tmp_path):
    """No EXIF at all: graceful empty metadata."""
    import cv2

    from opencalibration_tpu.extract.metadata import extract_metadata

    path = str(tmp_path / "plain.jpg")
    cv2.imwrite(path, np.zeros((6, 6, 3), np.uint8))
    md = extract_metadata(path)
    assert not md.has_gps()
    assert md.width_px == 6 and md.height_px == 6
