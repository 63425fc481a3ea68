"""Numeric helpers shared by engine stages and the oracle contract.

``round_half_away`` replicates DuckDB's ROUND (half away from zero) so
Ray results and oracle SQL round identically — numpy/pyarrow default to
banker's rounding, which differs exactly on .5 ties (e.g. 105/128)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(arr, ndigits: int):
    """Arrow (or numpy) float array → half-away-from-zero rounded float64."""
    if isinstance(arr, np.ndarray):
        scale = 10.0 ** ndigits
        return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    arr = pc.cast(arr, pa.float64())
    scale = pa.scalar(10.0 ** ndigits, pa.float64())
    absr = pc.floor(pc.add(pc.multiply(pc.abs(arr), scale), 0.5))
    signed = pc.multiply(pc.sign(arr), absr)
    return pc.divide(pc.cast(signed, pa.float64()), scale)
