import numpy as np

from opencalibration_tpu.geo.geo_coord import GeoCoord


def test_roundtrip():
    g = GeoCoord()
    assert not g.is_initialized()
    g.set_origin(47.5, 8.2)
    assert g.is_initialized()
    local = g.to_local(47.5, 8.2, 450.0)
    np.testing.assert_allclose(local, [0, 0, 450.0], atol=1e-6)

    for dlat, dlon in [(0.01, 0.0), (0.0, 0.01), (-0.005, 0.008), (0.02, -0.015)]:
        lat, lon = 47.5 + dlat, 8.2 + dlon
        loc = g.to_local(lat, lon, 100.0)
        back = g.to_wgs84(loc)
        np.testing.assert_allclose(back, [lat, lon, 100.0], atol=1e-9)


def test_scale_is_metric():
    g = GeoCoord()
    g.set_origin(47.0, 8.0)
    # 0.001 deg of latitude ~ 111.13m at 47N (meridian arc)
    loc = g.to_local(47.001, 8.0, 0.0)
    assert abs(loc[1] - 111.13) < 0.2
    assert abs(loc[0]) < 1e-6
    # 0.001 deg longitude ~ 111.32 * cos(47) km/deg = 75.92m
    loc2 = g.to_local(47.0, 8.001, 0.0)
    assert abs(loc2[0] - 75.92) < 0.2


def test_known_utm_like_point():
    """Compare against an independently computed spherical approximation
    over a short distance (sub-percent agreement expected)."""
    g = GeoCoord()
    g.set_origin(-33.9, 18.4)
    loc = g.to_local(-33.89, 18.41, 0.0)
    # rough: dlat=0.01 -> ~1108m north, dlon=0.01 -> ~923m east
    assert 1090 < loc[1] < 1120
    assert 915 < loc[0] < 935


def test_wkt_contains_origin():
    g = GeoCoord()
    g.set_origin(10.5, -75.25)
    wkt = g.get_wkt()
    assert 'PROJECTION["Transverse_Mercator"]' in wkt
    assert '"latitude_of_origin",10.5' in wkt
    assert '"central_meridian",-75.25' in wkt
