"""Host-edge conversion of trace records to the reference DataFrame format.

The engine's on-device ``(G, 15, n)`` record buffer + ``(G, n)`` row mask
convert into the reference's 15-column float32 Pandas frame
(pyrayt/_pyrayt.py:147-186).  Row order matches the reference exactly:
generations in order, and within a generation rays in their original
(source) order — the reference compacts dead rays but preserves relative
order, which mask-filtering reproduces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["FRAME_COLUMNS", "records_to_dataframe"]

FRAME_COLUMNS = (
    "generation",
    "intensity",
    "wavelength",
    "index",
    "id",
    "surface",
    "x0",
    "y0",
    "z0",
    "x1",
    "y1",
    "z1",
    "x_tilt",
    "y_tilt",
    "z_tilt",
)


def records_to_dataframe(records, record_mask) -> pd.DataFrame:
    """Select masked rows from the device buffer and build the results frame."""
    records = np.asarray(records, dtype=np.float32)  # (G, 15, n)
    record_mask = np.asarray(record_mask)  # (G, n)
    # (G, 15, n) -> (G, n, 15) then boolean-select rows generation-major
    rows = records.transpose(0, 2, 1)[record_mask]
    return pd.DataFrame(rows, columns=list(FRAME_COLUMNS), dtype="float32")
