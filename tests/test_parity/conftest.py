"""Fixture: the live reference PyRayT at /root/reference (run-only).

The reference pins pandas<2 and uses the removed ``DataFrame.append``
(SURVEY.md quirk Q6); a shim maps it onto ``pd.concat`` so it runs under
modern pandas.  Nothing from the reference is imported into the package —
these tests execute it side by side and diff the result frames.
"""

import sys

import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference():
    import pandas as pd

    if not hasattr(pd.DataFrame, "append"):
        pd.DataFrame.append = lambda self, other, ignore_index=False: pd.concat(
            [self, other], ignore_index=ignore_index
        )
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import pyrayt as ref_pyrayt  # noqa: F401

        yield ref_pyrayt
    finally:
        sys.path.remove(REFERENCE_PATH)
