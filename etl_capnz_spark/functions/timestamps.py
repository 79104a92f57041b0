"""Timestamp formatting C4/C5 (SURVEY.md §2.6).

C4: the reference re-serializes CAP timestamps with JS
``new Date(x).toISOString()`` — millisecond-precision UTC ISO-8601
(task.ts:670-672, 814-816).

C5: remarks embed an NZ-local rendering via
``toLocaleString('en-NZ', {timeZone: 'Pacific/Auckland'}) + ' NZT'``
(task.ts:703-704, 848-849). JS locale output is implementation-defined, so
this engine PINS the format to ``d/MM/yyyy, h:mm:ss a`` (e.g.
``3/01/2026, 2:04:05 PM``) — documented engine behavior, stable across
clusters and comparable with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
NZ_FMT = "d/MM/yyyy, h:mm:ss a"
NZ_TZ = "Pacific/Auckland"


def iso_utc(ts: Column) -> Column:
    """C4: millisecond ISO-8601 UTC string (session TZ is pinned UTC)."""
    return F.date_format(ts, ISO_FMT)


def nz_local(ts: Column) -> Column:
    """C5: NZ-local timestamp string with ' NZT' suffix."""
    return F.concat(
        F.date_format(F.from_utc_timestamp(ts, NZ_TZ), NZ_FMT), F.lit(" NZT")
    )


def start_ts(onset: Column, sent: Column) -> Column:
    """start = onset ?? sent (task.ts:671, 815)."""
    return F.coalesce(onset, sent)
