"""Camera intrinsics-prior database tests (reference
test_camera_database.cpp + data/camera_database.json v1 schema)."""

import math

import numpy as np

from opencalibration_tpu.extract.camera_database import (
    CameraDatabase,
    CameraDBEntry,
    apply_database_entry,
    default_database_path,
)
from opencalibration_tpu.extract.image_loader import camera_model_kwargs
from opencalibration_tpu.types.graph import ImageMetadata


def test_bundled_database_loads_and_primes_models():
    """The bundled priors file ships with the package and is loaded by the
    process-wide instance (reference camera_database.cpp:70-146 +
    CMakeLists.txt:106-109 bundling)."""
    db = CameraDatabase()
    assert db.load(default_database_path())
    md = ImageMetadata(
        camera_make="DJI", camera_model="FC6310",
        width_px=5472, height_px=3648,
    )
    entry = db.lookup(md)
    assert entry is not None
    assert entry.radial_distortion[0] != 0.0
    # the singleton is primed with the same file
    entry2 = CameraDatabase.instance().lookup(md)
    assert entry2 is not None and entry2.make == "DJI"
    # and camera_model_kwargs picks it up end-to-end
    kw = camera_model_kwargs(md)
    assert kw["radial_distortion"][0] == entry.radial_distortion[0]
    assert kw["focal_length_pixels"] > 0


def test_three_tier_lookup():
    db = CameraDatabase()
    db.add_or_update(
        CameraDBEntry(make="A", model="B", lens_model="L1",
                      sensor_width_px=100, sensor_height_px=50,
                      focal_length_pixels=111.0)
    )
    db.add_or_update(
        CameraDBEntry(make="A", model="B", lens_model="",
                      sensor_width_px=100, sensor_height_px=50,
                      focal_length_pixels=222.0)
    )
    db.add_or_update(
        CameraDBEntry(make="A", model="B", lens_model="",
                      sensor_width_px=200, sensor_height_px=100,
                      focal_length_pixels=333.0)
    )
    # tier 1: exact incl. lens + dims
    md = ImageMetadata(camera_make="a", camera_model="b", lens_model="l1",
                       width_px=100, height_px=50)
    assert db.lookup(md).focal_length_pixels == 111.0
    # tier 2: make + model + dims (lens mismatch)
    md = ImageMetadata(camera_make="A", camera_model="B", lens_model="other",
                       width_px=100, height_px=50)
    assert db.lookup(md).focal_length_pixels in (111.0, 222.0)
    md = ImageMetadata(camera_make="A", camera_model="B", lens_model="zz",
                       width_px=200, height_px=100)
    assert db.lookup(md).focal_length_pixels == 333.0
    # tier 3: make + model only (dims mismatch)
    md = ImageMetadata(camera_make="A", camera_model="B", width_px=999, height_px=999)
    assert db.lookup(md) is not None
    # miss
    md = ImageMetadata(camera_make="X", camera_model="Y")
    assert db.lookup(md) is None


def test_apply_entry_scales_principal_point_and_keeps_exif_focal():
    """Dim-mismatched entries scale the principal-point offset; EXIF focal
    wins over the DB prior (reference camera_database.cpp:392-418)."""
    entry = CameraDBEntry(
        make="A", model="B", sensor_width_px=4000, sensor_height_px=3000,
        principal_point_offset=np.array([40.0, -20.0]),
        radial_distortion=np.array([-0.2, 0.1, 0.0]),
        focal_length_pixels=3000.0,
    )
    md = ImageMetadata(width_px=2000, height_px=1500, focal_length_px=1501.0)
    kw = apply_database_entry(entry, md, dict(focal_length_pixels=1501.0))
    assert kw["principal_point"] == (1000.0 + 20.0, 750.0 - 10.0)
    assert kw["radial_distortion"] == (-0.2, 0.1, 0.0)
    assert kw["focal_length_pixels"] == 1501.0  # EXIF focal kept
    # no EXIF focal -> DB focal applied
    kw = apply_database_entry(entry, md, dict(focal_length_pixels=float("nan")))
    assert kw["focal_length_pixels"] == 3000.0


def test_save_load_roundtrip(tmp_path):
    db = CameraDatabase()
    db.add_or_update(
        CameraDBEntry(make="M", model="N", sensor_width_px=10, sensor_height_px=20,
                      radial_distortion=np.array([0.1, 0.2, 0.3]),
                      focal_length_pixels=float("nan"), notes="x")
    )
    p = str(tmp_path / "db.json")
    assert db.save(p)
    db2 = CameraDatabase()
    assert db2.load(p)
    e = db2.lookup(ImageMetadata(camera_make="M", camera_model="N",
                                 width_px=10, height_px=20))
    assert e is not None
    np.testing.assert_allclose(e.radial_distortion, [0.1, 0.2, 0.3])
    assert math.isnan(e.focal_length_pixels)
