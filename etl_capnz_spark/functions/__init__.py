"""Scalar function library (SURVEY.md §2.6, §2.3) — every function returns a
Catalyst ``Column`` built from JVM-side built-ins; no Python UDFs."""

from etl_capnz_spark.functions.lookups import (
    category_description,
    event_description,
    event_icon,
)
from etl_capnz_spark.functions.timestamps import iso_utc, nz_local
from etl_capnz_spark.functions.remarks import remarks
from etl_capnz_spark.functions.signature import color_code, signature_struct

__all__ = [
    "category_description",
    "event_description",
    "event_icon",
    "iso_utc",
    "nz_local",
    "remarks",
    "color_code",
    "signature_struct",
]
