"""The `obia` drop-in namespace: the README headline example must run
verbatim through the reference import paths (SURVEY §7 'Public API to
preserve'). Reference: iosefa/obia package layout."""
import numpy as np

from obia_tpu.geometry.affine import Affine
from obia_tpu.geometry.geom import Point
from obia_tpu.io.tiff import write_tiff
from obia_tpu.vector import GeoDataFrame


def test_readme_flow_via_alias_imports(small_rgb, tmp_path):
    # the exact import lines from README.md / the reference quickstart
    from obia.classification.classify import classify
    from obia.handlers.geotif import open_geotiff
    from obia.segmentation.segment import segment
    from obia.utils.utils import label_segments

    scene = str(tmp_path / "scene.tif")
    write_tiff(scene, (small_rgb * 255).astype(np.uint8),
               transform=Affine(2.0, 0, 600000.0, 0, -2.0, 5100000.0),
               crs="EPSG:32610")

    image = open_geotiff(scene)
    s = segment(image, method="slic", n_segments=12, compactness=10)
    gdf = s.segments
    cents = [(g.centroid.x, g.centroid.y) for g in gdf.geometry.values]
    classes = ["water" if x % 7 < 3.5 else "land" for x, _ in cents]
    pts = GeoDataFrame({"class": classes},
                       geometry=[Point(x, y) for x, y in cents])
    training, mixed = label_segments(gdf, pts)
    result = classify(s, training, method="rf", n_estimators=20)
    out_gpkg = str(tmp_path / "classified.gpkg")
    result.classified.to_file(out_gpkg)
    out_tif = str(tmp_path / "classified.tif")
    result.write_geotiff(out_tif)  # quirk #7: works on classification output

    assert set(result.classified["predicted_class"].dropna()) <= {"water",
                                                                   "land"}
    back = open_geotiff(out_tif)
    assert back.img_data.shape[:2] == small_rgb.shape[:2]


def test_alias_module_identity():
    """Alias modules re-export the SAME objects, not copies."""
    import obia.segmentation.segment as alias
    import obia_tpu.segmentation.segment as real
    assert alias.segment is real.segment
    import obia.classification.classify as alias_c
    import obia_tpu.classification.classify as real_c
    assert alias_c.classify is real_c.classify
