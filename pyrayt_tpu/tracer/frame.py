"""Host-edge conversion of trace records to the reference DataFrame format.

The engine's on-device ``(G, 15, n)`` record buffer + ``(G, n)`` row mask
convert into the reference's 15-column float32 Pandas frame
(pyrayt/_pyrayt.py:147-186).  Row order matches the reference exactly:
generations in order, and within a generation rays in their original
(source) order — the reference compacts dead rays but preserves relative
order, which both paths below reproduce.

Two fetch paths:

* **naive** — fetch the whole buffer, boolean-select on the host.  Fine on
  CPU; at production scale on this machine's TPU it is the bottleneck: the
  relay fetches at ~40 MB/s, and a 2^20-ray x 6-generation buffer is
  360 MB (~9 s) of which typically half the generations and half the rows
  are dead zeros.
* **compacted** — a jitted device pass packs the live rows to the front
  (generation-major, original order preserved) and casts float32 *before*
  the fetch; the host then pulls only ``ceil(n_live / chunk) * chunk``
  rows.  Measured reduction on the 2^20-ray condenser is reported by
  ``bench.py`` (``frame_fetch_*`` fields).

``records_to_dataframe`` picks automatically: compaction when the buffer
lives on an accelerator and is large enough to care, the naive path
otherwise (tiny traces and CPU tests skip the extra device work).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ["FRAME_COLUMNS", "records_to_dataframe", "compact_records"]

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

# host fetches are rounded up to this many rows so the slice programs the
# fetch compiles are drawn from a tiny set (<= buffer_rows / chunk shapes)
_FETCH_CHUNK_ROWS = 1 << 16
# compact automatically above this many buffer elements (~4 MB of f32)
_AUTO_COMPACT_ELEMENTS = 1 << 20


@jax.jit
def compact_records(records, record_mask):
    """Pack live record rows to the front of a ``(G*n, 15)`` f32 buffer.

    Returns ``(packed, n_live)``; rows keep the frame order (generation-
    major, original ray order within a generation).  Runs on device so the
    host edge fetches ~n_live rows instead of the full dead-padded buffer.
    """
    g, c, n = records.shape
    rows = jnp.transpose(records, (0, 2, 1)).reshape(g * n, c)
    rows = rows.astype(jnp.float32)  # dtype-tight fetch (f64 tests -> half)
    flat = record_mask.reshape(g * n)
    n_live = jnp.sum(flat.astype(jnp.int32))
    # scatter-compact: live row i goes to slot (# live rows before i)
    idx = jnp.where(flat, jnp.cumsum(flat.astype(jnp.int32)) - 1, g * n)
    packed = jnp.zeros((g * n, c), jnp.float32).at[idx].set(rows, mode="drop")
    return packed, n_live


def _on_accelerator(x) -> bool:
    try:
        devices = x.devices() if callable(getattr(x, "devices", None)) else None
        return bool(devices) and all(d.platform != "cpu" for d in devices)
    except Exception:
        return False


def records_to_dataframe(records, record_mask, compact=None) -> pd.DataFrame:
    """Build the results frame from the device buffer.

    ``compact=None`` (default) compacts on-device before fetching when the
    buffer is on an accelerator and large; ``True``/``False`` force.
    """
    if compact is None:
        compact = (
            getattr(records, "size", 0) >= _AUTO_COMPACT_ELEMENTS
            and _on_accelerator(records)
        )
    if not compact:
        records = np.asarray(records, dtype=np.float32)  # (G, 15, n)
        record_mask = np.asarray(record_mask)  # (G, n)
        # (G, 15, n) -> (G, n, 15) then boolean-select rows generation-major
        rows = records.transpose(0, 2, 1)[record_mask]
        return pd.DataFrame(rows, columns=list(FRAME_COLUMNS), dtype="float32")

    packed, n_live = compact_records(jnp.asarray(records), jnp.asarray(record_mask))
    k = int(n_live)
    total = packed.shape[0]
    k_round = min(total, -(-max(k, 1) // _FETCH_CHUNK_ROWS) * _FETCH_CHUNK_ROWS)
    rows = np.asarray(packed[:k_round])[:k]
    return pd.DataFrame(rows, columns=list(FRAME_COLUMNS), dtype="float32")
