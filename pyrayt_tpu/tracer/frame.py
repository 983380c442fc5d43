"""Host-edge conversion of trace records to the reference DataFrame format.

The engine's on-device ``(G, 15, n)`` record buffer + ``(G, n)`` row mask
convert into the reference's 15-column float32 Pandas frame
(pyrayt/_pyrayt.py:147-186).  Row order matches the reference exactly:
generations in order, and within a generation rays in their original
(source) order — the reference compacts dead rays but preserves relative
order, which both paths below reproduce.

Fetch strategy — measured, then settled (docs/design_notes.md round 4):

* **naive** (the default) — fetch the whole committed buffer, boolean-
  select on the host.  Measured 0.4-0.9 s for the 2^20 x 6 condenser's
  377 MB on the v5e relay.
* **compact=True** — fetch one scalar (the live-generation count) and
  transfer only ``records[:g_live]`` cast float32 on device.  Fewer
  bytes, but fetching a COMPUTED array (any on-device slice/cast) takes
  a ~15x slower transfer path on this stack (6-8 s, interleaved-measured
  — not an ordering artifact), and a row-packing scatter variant lost
  the same way.  Kept as an option for backends where computed-array
  fetches are not pathological (and for halving f64 CPU buffers).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ["FRAME_COLUMNS", "records_to_dataframe", "live_generations"]

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



def live_generations(record_mask) -> int:
    """Number of leading generations with at least one recorded ray."""
    return int(jnp.sum(jnp.any(jnp.asarray(record_mask), axis=1)))


def records_to_dataframe(records, record_mask, compact=None) -> pd.DataFrame:
    """Build the results frame from the device buffer.

    ``compact=None`` resolves to the naive full-buffer fetch — measured
    fastest on real hardware (module docstring); ``True`` forces the
    sliced dtype-tight variant.
    """
    if compact is None:
        compact = False
    if compact:
        g = max(live_generations(record_mask), 1)
        records = np.asarray(jnp.asarray(records)[:g].astype(jnp.float32))
        record_mask = np.asarray(jnp.asarray(record_mask)[:g])
    else:
        records = np.asarray(records, dtype=np.float32)  # (G, 15, n)
        record_mask = np.asarray(record_mask)  # (G, n)
    # (g, 15, n) -> (g, n, 15) then boolean-select rows generation-major
    rows = records.transpose(0, 2, 1)[record_mask]
    return pd.DataFrame(rows, columns=list(FRAME_COLUMNS), dtype="float32")
