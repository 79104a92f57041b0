"""Correctness-harness support: deterministic CAP-shaped test inputs derived
from the driver's TPC-H-ish tables, in both Spark and DuckDB dialects."""
