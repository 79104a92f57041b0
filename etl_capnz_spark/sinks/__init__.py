"""Sinks: GeoJSON FeatureCollection assembly (S4) and metrics (S5)."""
