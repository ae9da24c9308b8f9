"""Shared time/money helpers for the relational family — split from ``pipelines/relational.py`` along its wave
boundaries (round-5 maintenance split; no behavior change).  The
``relational`` module re-exports everything, so the import surface —
``from ..pipelines import relational as R`` — is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

def _period_index(ts_col, period_s: int):
    """ts -> floor(epoch/period) period ordinal (int64); shared by every
    time-bucketed events query so the derivation can't drift."""
    epoch = pc.divide(pc.cast(ts_col, pa.int64()), 1_000_000)
    return pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()),
                                      float(period_s))), pa.int64())


def _window_start(ts_col, window_s: int):
    """ts -> epoch-second tumbling-window start (int64)."""
    return pc.multiply(_period_index(ts_col, window_s), window_s)


def _value_cents(value_col):
    """Money in integer cents (fp sums break value-hash oracles)."""
    return pc.cast(pc.round(pc.multiply(value_col, pa.scalar(100.0))),
                   pa.int64())

