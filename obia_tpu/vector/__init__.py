from .geodataframe import GeoDataFrame, read_file, sjoin

__all__ = ["GeoDataFrame", "read_file", "sjoin"]
