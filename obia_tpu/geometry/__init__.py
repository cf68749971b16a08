from .affine import Affine
from .crs import CRS
from .geom import (Geometry, LineString, MultiPolygon, Point, Polygon,
                   affine_transform, box)
from . import wkb

__all__ = ["Affine", "CRS", "Geometry", "LineString", "MultiPolygon", "Point",
           "Polygon", "affine_transform", "box", "wkb"]
