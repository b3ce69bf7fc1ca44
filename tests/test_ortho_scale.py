"""Scale-safety tests for ortho: footprint-based tile camera selection
and O(P*K) thumbnail sampling.

* findTileCameras parity (reference ortho.cpp:1104-1160): a camera whose
  ground footprint only clips a tile CORNER must still be a candidate for
  that tile — a center-distance KNN query drops it when tile extent is
  comparable to camera spacing.
* the thumbnail mosaic must render a many-camera survey with per-pixel
  cost independent of the camera count (the old path materialized
  [N_cameras, P, 3]).
"""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

from opencalibration_tpu.types.camera import CameraModel
from opencalibration_tpu.types.graph import (
    ImageMetadata,
    ImageNode,
    MeasurementGraph,
    SurfaceModel,
)

NADIR = np.array([0.0, 1.0, 0.0, 0.0])  # 180deg about x: looking down


def _make_graph(positions, focal=200.0, wh=(160, 120), thumb=None):
    graph = MeasurementGraph(seed=0)
    model = CameraModel.create(
        focal_length_pixels=focal, principal_point=(wh[0] / 2, wh[1] / 2),
        pixels_cols=wh[0], pixels_rows=wh[1],
    )
    store = {1: model}
    ids = []
    for i, pos in enumerate(positions):
        node = ImageNode(
            path=f"img_{i}.jpg", metadata=ImageMetadata(), model_id=1,
            position=np.asarray(pos, float), orientation=NADIR.copy(),
            thumbnail=(
                np.full((12, 16, 3), 100 + (i % 100), np.uint8)
                if thumb is None
                else thumb
            ),
        )
        ids.append(graph.add_node(node))
    return graph, store, ids


def _flat_surface(extent, z=0.0):
    from opencalibration_tpu.surface.mesh import TriMesh

    e = extent
    mesh = TriMesh(
        np.array(
            [[-e, -e, z], [e, -e, z], [e, e, z], [-e, e, z]], float
        ),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    return [SurfaceModel(cloud=[], mesh=mesh)]


class TestFootprintTileCameras:
    def test_corner_clipping_camera_is_candidate(self):
        """Grid of cameras + one distant camera whose footprint reaches
        only a far tile corner: geometric selection must include it for
        that tile even though many cameras are closer to the tile
        center."""
        from opencalibration_tpu.ortho.ortho import OrthoJob

        # dense cluster near the origin so KNN by center would saturate
        rng = np.random.RandomState(0)
        cluster = [
            [x, y, 40.0]
            for x in np.linspace(-30, 0, 4)
            for y in np.linspace(-30, 0, 4)
        ]
        # corner camera: high altitude => huge footprint covering the far
        # positive-x/positive-y corner region the cluster barely reaches
        corner_cam = [55.0, 55.0, 120.0]
        graph, store, ids = _make_graph(cluster + [corner_cam])
        surfaces = _flat_surface(60.0)
        job = OrthoJob(
            surfaces, graph, store, max_megapixels=0.02, tile_size=32
        )
        assert job.ok
        corner_idx = len(ids) - 1
        # the tile containing world (55, 55): which tiles hold it
        found = any(
            corner_idx in cams for cams in job._tile_cams.values()
        )
        assert found, "corner camera absent from every tile candidate set"
        # specifically, tiles near its nadir must include it
        b = job._bounds
        tx = int((55.0 - b.min_x) / job._gsd) // job.tile_size
        ty = int((b.max_y - 55.0) / job._gsd) // job.tile_size
        tx = min(max(tx, 0), job._tiles_x - 1)
        ty = min(max(ty, 0), job._tiles_y - 1)
        assert corner_idx in job._tile_cams[ty * job._tiles_x + tx]

    def test_footprint_bbox_sane(self):
        from opencalibration_tpu.ortho.ortho import camera_ground_footprints

        model = CameraModel.create(
            focal_length_pixels=200.0, principal_point=(80.0, 60.0),
            pixels_cols=160, pixels_rows=120,
        )
        fp = camera_ground_footprints(
            np.asarray([NADIR]), np.asarray([[10.0, -5.0, 50.0]]), [model],
            ground_z=0.0,
        )[0]
        # nadir camera at 50m, fov half-width = (80/200)*50 = 20m
        assert fp[0] < 10.0 - 15 and fp[1] > 10.0 + 15
        assert fp[2] < -5.0 - 10 and fp[3] > -5.0 + 10
        # bounded (no runaway reach)
        assert fp[1] - fp[0] < 500 and fp[3] - fp[2] < 500


class TestThumbnailScale:
    def test_many_camera_thumbnail_bounded(self):
        """1k-camera synthetic survey thumbnail renders through the
        per-pixel K-NN kernel (cost O(P*K)); the old all-cameras path
        would materialize a [1000, P, 3] array."""
        from opencalibration_tpu.ortho import ortho as O

        n = 1000
        side = int(np.sqrt(n))
        # centre the grid on the origin so the surface extent (centred on
        # 0) matches the cameras' span
        span = 8.0 * (side - 1)
        positions = [
            [8.0 * (i % side) - span / 2, 8.0 * (i // side) - span / 2, 40.0]
            for i in range(n)
        ]
        graph, store, ids = _make_graph(positions)
        surfaces = _flat_surface(span / 2 + 8.0)
        mosaic = O.generate_orthomosaic(
            surfaces, graph, store, max_megapixels=0.05
        )
        assert mosaic is not None
        assert mosaic.rgba.shape[2] == 4
        got = mosaic.rgba[:, :, 3] > 0
        assert got.mean() > 0.5, "mosaic mostly covered"
        # camera indices must come from many distinct cameras
        cams = np.unique(mosaic.camera_index[mosaic.camera_index >= 0])
        assert len(cams) > 50

    def test_thumbnail_matches_small_case(self):
        """K-NN kernel agrees with a direct dense evaluation on a tiny
        scene: the chosen best camera per pixel is plausible (nearest by
        footprint weight) and colors come from that camera's thumbnail."""
        from opencalibration_tpu.ortho import ortho as O

        positions = [[-10.0, 0.0, 40.0], [10.0, 0.0, 40.0]]
        thumbs = None
        graph, store, ids = _make_graph(positions, thumb=thumbs)
        # distinct thumbnail values per camera (set in _make_graph: 100+i)
        surfaces = _flat_surface(30.0)
        mosaic = O.generate_orthomosaic(
            surfaces, graph, store, max_megapixels=0.01
        )
        assert mosaic is not None
        idx = mosaic.camera_index
        h, w = idx.shape
        left = idx[h // 2, : w // 3]
        right = idx[h // 2, -w // 3 :]
        # left pixels see camera 0, right pixels camera 1
        assert (left[left >= 0] == ids[0]).mean() > 0.8
        assert (right[right >= 0] == ids[1]).mean() > 0.8
