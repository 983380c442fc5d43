"""Host-edge conversion of trace records to the reference DataFrame format.

The engine's on-device ``(G, 15, n)`` record buffer + ``(G, n)`` row mask
convert into the reference's 15-column float32 Pandas frame
(pyrayt/_pyrayt.py:147-186).  Row order matches the reference exactly:
generations in order, and within a generation rays in their original
(source) order — the reference compacts dead rays but preserves relative
order, which both paths below reproduce.

Fetch strategy — measured in round 4, RE-measured and corrected in round
5 (docs/design_notes.md "Host edge"):

* **compact (the default)** — fetch one scalar (the live-generation
  count), then transfer only ``records[:g_live]`` float32-cast, computed
  by a JITTED slice+cast so the transferred array is a compiled
  function's output buffer.  Fewer bytes is what matters for the fetch a
  production ``trace()`` actually performs — the FIRST fetch of a fresh
  buffer (measured on the v5e relay at 2^20 x 6: fresh compact 7.6 s vs
  fresh naive ~20-27 s for 2x the bytes).
* **compact=False** (naive) — fetch the whole committed buffer,
  boolean-select on the host.  Round 4 measured this as "15x faster"
  and made it the default; round 5 found that measurement re-fetched the
  SAME buffer, whose host copy jax caches after the first transfer
  (re-reads are ~0.4 s of host memcpy while every compact call computed
  a FRESH array and paid a real transfer).  Production traces always
  fetch fresh buffers, so the cached-reread advantage is an artifact;
  naive remains available for repeated re-reads of one result.
"""

from __future__ import annotations

from functools import lru_cache

import jax
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


@lru_cache(maxsize=32)
def _slice_cast_fn(g: int):
    """Jitted live-slice + f32 cast: the transferred arrays are compiled
    outputs (committed buffers), not eager-op results — worth ~1.3x on
    the fetch itself on top of the 2x byte saving (design notes)."""
    return jax.jit(
        lambda r, m: (r[:g].astype(jnp.float32), m[:g])
    )


def records_to_dataframe(records, record_mask, compact=None) -> pd.DataFrame:
    """Build the results frame from the device buffer.

    ``compact=None`` resolves to the sliced dtype-tight fetch (fastest
    for the first fetch of a fresh trace — the production case);
    ``False`` forces the naive full-buffer fetch (fastest only when
    re-reading a buffer whose host copy is already cached).
    """
    if compact is None:
        compact = True
    if compact:
        g = max(live_generations(record_mask), 1)
        rec_d, mask_d = _slice_cast_fn(g)(
            jnp.asarray(records), jnp.asarray(record_mask)
        )
        records = np.asarray(rec_d)
        record_mask = np.asarray(mask_d)
    else:
        records = np.asarray(records, dtype=np.float32)  # (G, 15, n)
        record_mask = np.asarray(record_mask)  # (G, n)
    # (g, 15, n) -> (g, n, 15) then boolean-select rows generation-major
    rows = records.transpose(0, 2, 1)[record_mask]
    return pd.DataFrame(rows, columns=list(FRAME_COLUMNS), dtype="float32")
