"""GeoDataFrame: a pandas DataFrame with a geometry column + CRS.

From-scratch replacement for the slice of geopandas the reference uses
(reference segment_boundaries.py:72-77, utils/utils.py:12-34, classify.py:140,
tiling.py:205-231): construction with a ``geometry`` column, ``crs``,
``to_file`` → GeoPackage, ``sjoin`` with the ``intersects`` predicate,
vectorised ``intersects``/``within`` predicates against one geometry, and
``total_bounds``.
"""
from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np
import pandas as pd

from ..geometry.crs import CRS
from ..geometry.geom import Geometry, MultiPolygon, Point, Polygon
from ..io import gpkg as gpkg_io


class GeoDataFrame(pd.DataFrame):
    _metadata = ["crs"]

    def __init__(self, data=None, *args, geometry=None, crs=None, columns=None,
                 **kwargs):
        if data is None and geometry is not None:
            data = {"geometry": list(geometry)}
            geometry = None
        super().__init__(data, *args, columns=columns, **kwargs)
        if geometry is not None:
            self["geometry"] = list(geometry)
        object.__setattr__(self, "crs", CRS.from_user_input(crs) if crs is not None else None)

    @property
    def _constructor(self):
        def _c(mgr, *args, **kwargs):
            # pandas internals hand us a BlockManager (no extra kwargs) OR
            # call the constructor like DataFrame(data, index=..., ...)
            # (transpose/dropna/reduction paths) — accept both
            if (not args and not kwargs and hasattr(mgr, "axes")
                    and not isinstance(mgr, pd.DataFrame)):
                # route through _from_mgr to avoid the deprecated
                # BlockManager __init__ path
                return GeoDataFrame._from_mgr(mgr, axes=mgr.axes)
            df = pd.DataFrame(mgr, *args, **kwargs)
            return GeoDataFrame._from_mgr(df._mgr, axes=df._mgr.axes)
        return _c

    # pandas copies lose __init__-set attrs; make crs default None not raise
    def __getattr__(self, name):
        if name == "crs":
            return None
        return super().__getattr__(name)

    # -- geometry access ------------------------------------------------------
    @property
    def geometry(self) -> pd.Series:
        return self["geometry"]

    @property
    def total_bounds(self) -> np.ndarray:
        bs = np.array([g.bounds for g in self.geometry if g is not None])
        if len(bs) == 0:
            return np.array([np.nan] * 4)
        return np.array([bs[:, 0].min(), bs[:, 1].min(),
                         bs[:, 2].max(), bs[:, 3].max()])

    @property
    def bounds(self) -> pd.DataFrame:
        bs = [g.bounds if g is not None else (np.nan,) * 4 for g in self.geometry]
        return pd.DataFrame(bs, columns=["minx", "miny", "maxx", "maxy"],
                            index=self.index)

    def to_crs(self, crs) -> "GeoDataFrame":
        """Reproject every geometry to ``crs`` (geopandas-shaped; the
        reference calls this before using vectors against a raster,
        reference training.py:117 / cost.py:63). Supported pairs: WGS84
        geographic, UTM 326xx/327xx, Web Mercator — anything else raises
        :class:`obia_tpu.geometry.transform_crs.CRSTransformError`."""
        from ..geometry.crs import CRS
        from ..geometry.transform_crs import Transformer, transform_geom
        dst = CRS.from_user_input(crs)
        if self.crs is None:
            raise ValueError("to_crs: this GeoDataFrame has no source CRS")
        out = self.copy()
        if dst == self.crs:
            object.__setattr__(out, "crs", dst)
            return out
        tr = Transformer.from_crs(self.crs, dst, always_xy=True)
        out["geometry"] = [transform_geom(g, tr) if g is not None else None
                           for g in self.geometry]
        object.__setattr__(out, "crs", dst)
        return out

    # -- predicates -----------------------------------------------------------
    def intersects(self, other: Geometry) -> pd.Series:
        ob = other.bounds
        out = []
        for g in self.geometry:
            if g is None:
                out.append(False)
                continue
            b = g.bounds
            if b[2] < ob[0] or ob[2] < b[0] or b[3] < ob[1] or ob[3] < b[1]:
                out.append(False)
            else:
                out.append(g.intersects(other))
        return pd.Series(out, index=self.index)

    def within(self, other: Geometry) -> pd.Series:
        return pd.Series([g.within(other) if g is not None else False
                          for g in self.geometry], index=self.index)

    def overlaps(self, other: Geometry) -> pd.Series:
        return pd.Series([g.overlaps(other) if g is not None else False
                          for g in self.geometry], index=self.index)

    # -- I/O ------------------------------------------------------------------
    def to_file(self, path: str, driver: Optional[str] = None,
                layer: Optional[str] = None) -> None:
        if driver is None:
            low = str(path).lower()
            driver = ("GeoJSON" if low.endswith((".geojson", ".json"))
                      else "ESRI Shapefile" if low.endswith(".shp")
                      else "GPKG")
        if driver not in ("GPKG", "GeoJSON", "ESRI Shapefile"):
            raise ValueError(
                "only GPKG, GeoJSON and ESRI Shapefile output are "
                f"supported, got {driver}")
        if len(self) and any(g is None for g in self.geometry):
            raise ValueError(
                "GeoDataFrame has None geometries — refusing to write "
                "empty blobs (an unresolved async polygonisation? see "
                "segment_boundaries.resolve_geometry)")
        cols = [(c, self[c].tolist()) for c in self.columns if c != "geometry"]
        if driver == "GeoJSON":
            from ..io.geojson import write_geojson
            write_geojson(path, cols, list(self.geometry), crs=self.crs)
            return
        if driver == "ESRI Shapefile":
            from ..io.shapefile import write_shapefile
            write_shapefile(path, cols, list(self.geometry), crs=self.crs)
            return
        layer = layer or _layer_from_path(path)
        geom_types = {g.geom_type for g in self.geometry if g is not None}
        gtype = geom_types.pop() if len(geom_types) == 1 else "GEOMETRY"
        gpkg_io.write_gpkg(path, cols, list(self.geometry), layer=layer,
                           crs=self.crs, geometry_type=gtype.upper())


def _layer_from_path(path: str) -> str:
    import os
    return os.path.splitext(os.path.basename(path))[0] or "layer"


def read_file(path: str, layer: Optional[str] = None,
              bbox=None) -> GeoDataFrame:
    low = str(path).lower()
    if low.endswith((".geojson", ".json", ".shp")):
        if low.endswith(".shp"):
            from ..io.shapefile import read_shapefile
            cols, geoms, crs = read_shapefile(path)
        else:
            from ..io.geojson import read_geojson
            cols, geoms, crs = read_geojson(path)
        if bbox is not None:
            # None geometries survive the filter, matching the GPKG path
            w, s, e, n = bbox
            keep = [i for i, g in enumerate(geoms)
                    if g is None or not (
                        g.bounds[2] < w or g.bounds[0] > e
                        or g.bounds[3] < s or g.bounds[1] > n)]
            geoms = [geoms[i] for i in keep]
            cols = {k: [v[i] for i in keep] for k, v in cols.items()}
    else:
        cols, geoms, crs = gpkg_io.read_gpkg(path, layer=layer, bbox=bbox)
    gdf = GeoDataFrame(cols if cols else None, geometry=geoms, crs=crs)
    if "geometry" not in gdf.columns:
        gdf["geometry"] = geoms
    return gdf


# --- spatial join -------------------------------------------------------------

def sjoin(left: GeoDataFrame, right: GeoDataFrame, how: str = "inner",
          predicate: str = "intersects",
          lsuffix: str = "left", rsuffix: str = "right") -> GeoDataFrame:
    """Spatial join matching the geopandas call in reference
    utils/utils.py:21 (inner join, intersects). The common fast path —
    right side all points, left side polygons — is vectorised with a
    bbox prefilter + crossing-number point-in-polygon."""
    if how != "inner":
        raise NotImplementedError("only how='inner' is supported")
    if predicate not in ("intersects", "within", "contains"):
        raise NotImplementedError(f"predicate {predicate!r} not supported")

    lgeoms = list(left.geometry)
    rgeoms = list(right.geometry)
    pairs: List[tuple] = []  # (left_pos, right_pos)

    all_points = all(isinstance(g, Point) for g in rgeoms if g is not None)
    all_polys = all(isinstance(g, (Polygon, MultiPolygon))
                    for g in lgeoms if g is not None)
    # the vectorised fast path needs polygon LEFT rows too — a mixed left
    # side (points/lines) must go through the general predicate path, not
    # be silently skipped
    if all_points and all_polys and predicate in ("intersects", "contains"):
        xs = np.array([g.x if g is not None else np.nan for g in rgeoms])
        ys = np.array([g.y if g is not None else np.nan for g in rgeoms])
        for li, lg in enumerate(lgeoms):
            if lg is None:
                continue
            b = lg.bounds
            cand = np.nonzero((xs >= b[0]) & (xs <= b[2])
                              & (ys >= b[1]) & (ys <= b[3]))[0]
            if len(cand) == 0:
                continue
            hit = lg.contains_points(xs[cand], ys[cand])
            for ri in cand[hit]:
                pairs.append((li, int(ri)))
    else:
        rbounds = np.array([g.bounds if g is not None else (np.nan,) * 4
                            for g in rgeoms])
        for li, lg in enumerate(lgeoms):
            if lg is None:
                continue
            b = lg.bounds
            cand = np.nonzero(~((rbounds[:, 2] < b[0]) | (b[2] < rbounds[:, 0])
                                | (rbounds[:, 3] < b[1]) | (b[3] < rbounds[:, 1])))[0]
            for ri in cand:
                rg = rgeoms[ri]
                if rg is None:
                    continue
                ok = (lg.intersects(rg) if predicate == "intersects"
                      else lg.within(rg) if predicate == "within"
                      else rg.within(lg))
                if ok:
                    pairs.append((li, int(ri)))

    if not pairs:
        out = GeoDataFrame(columns=list(left.columns)
                           + [c for c in right.columns if c != "geometry"]
                           + ["index_right"])
        object.__setattr__(out, "crs", left.crs)
        return out

    lpos = [p[0] for p in pairs]
    rpos = [p[1] for p in pairs]
    lpart = left.iloc[lpos].copy()
    rpart = right.drop(columns=["geometry"], errors="ignore").iloc[rpos]

    # geopandas collision semantics: BOTH sides get suffixed
    collide = {c for c in rpart.columns
               if c in lpart.columns and c != "geometry"}
    data = {}
    for c in lpart.columns:
        name = f"{c}_{lsuffix}" if c in collide else c
        data[name] = (lpart[c].to_numpy(dtype=object) if c != "geometry"
                      else list(lpart[c]))
    for c in rpart.columns:
        name = f"{c}_{rsuffix}" if c in collide else c
        data[name] = rpart[c].to_numpy(dtype=object)
    data["index_right"] = right.index.to_numpy()[rpos]

    out = GeoDataFrame(data)
    out.index = left.index.take(lpos)
    object.__setattr__(out, "crs", left.crs)
    return out
