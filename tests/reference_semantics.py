"""Pure-Python oracle for the reference's per-value cast semantics
(SURVEY §1.2) — an independent ~60-line re-statement of the documented
behavior used as the property-test oracle (SURVEY §5 item 3). Not a copy
of the reference; written from the semantics table."""

from __future__ import annotations

import math
from datetime import date, datetime, timezone

BOOLEAN_TRUE_STRINGS = {"true", "1", "t", "y", "yes"}

OMIT = object()  # sentinel: cast failed → property omitted


def clean_nan(value):
    if isinstance(value, float) and math.isnan(value):
        return None
    return value


def ref_string(value):
    value = clean_nan(value)
    return None if value is None else str(value)


def ref_integer(value):
    value = clean_nan(value)
    if value is None:
        return None
    try:
        return int(value)
    except (ValueError, TypeError):
        return OMIT


def ref_float(value):
    value = clean_nan(value)
    if value is None:
        return None
    try:
        return float(value)
    except (ValueError, TypeError):
        return OMIT


def ref_boolean(value):
    value = clean_nan(value)
    if value is None:
        return None
    if isinstance(value, str):
        # reference main.py:242-249: lower() membership, NO strip —
        # ' true' is False.
        return value.lower() in BOOLEAN_TRUE_STRINGS
    return bool(value)


def ref_unix_timestamp_auto(value):
    value = clean_nan(value)
    if value is None:
        return None
    if isinstance(value, datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=timezone.utc)
        return int(value.timestamp())
    if isinstance(value, date):
        return int(
            datetime(value.year, value.month, value.day, tzinfo=timezone.utc).timestamp()
        )
    if isinstance(value, bool):
        return int(value)
    if isinstance(value, (int, float)):
        return int(value)
    if isinstance(value, str):
        try:
            from dateutil import parser as dateutil_parser

            dt = dateutil_parser.parse(value)
        except Exception:
            return None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    return None
