"""Typed result envelopes for the analytic query layer.

The reference wraps query output in NamedTuples that echo the query's
parameters alongside the rows (``Average``/``AverageResult``
reference ballcone/dao.py:129-139, ``Count``/``CountResult``
dao.py:114-127) so the web/JSON layer can render without re-deriving
context. We keep the same field names so JSON output is shape-compatible.
"""

from __future__ import annotations

import datetime
from typing import NamedTuple, Optional, Union

__all__ = ["Average", "AverageResult", "Count", "CountResult"]


class Average(NamedTuple):
    """One day's average row (reference dao.py:129-133)."""

    date: datetime.date
    avg: float
    sum: float
    count: int


class AverageResult(NamedTuple):
    """Envelope for select_average (reference dao.py:136-139)."""

    table: str
    field: str
    elements: list[Average]


class Count(NamedTuple):
    """One day's count row (reference dao.py:114-118)."""

    date: datetime.date
    group: Optional[Union[str, int]]
    count: int


class CountResult(NamedTuple):
    """Envelope for select_count / select_count_group (reference dao.py:121-127)."""

    table: str
    field: Optional[str]
    distinct: bool
    ascending: bool
    group: Optional[str]
    elements: list[Count]
