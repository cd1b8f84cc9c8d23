"""Structured Streaming twins of the §2.9 batch event-time operators.

The reference stack is batch-only (dbt); the streaming surface comes from
the driver's events table + north star (SURVEY.md §2.9). Batch forms live
in operators/eventtime.py and are oracle-checked; this package provides
the ``readStream`` twins behind the same logical transformations, run
with ``trigger(availableNow)`` to completion over staged event files.
"""

from .twins import run_stream_to_batch  # noqa: F401
