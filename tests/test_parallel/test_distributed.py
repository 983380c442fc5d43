"""Multi-host bootstrap (parallel/distributed.py).

The single-process path must be a harmless no-op; the real coordinator
join is exercised in a subprocess as a 1-process "cluster" (the smallest
configuration jax.distributed accepts), which walks the full
initialize -> process_count path without real multi-host hardware.
"""

import os
import subprocess
import sys
import textwrap

from pyrayt_tpu.parallel.distributed import initialize_distributed, is_distributed


def test_single_process_noop(monkeypatch):
    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES",
        "NUM_PROCESSES",
        "WORLD_SIZE",
        "JAX_PROCESS_ID",
        "PROCESS_ID",
        "RANK",
    ):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
    assert is_distributed() is False


def test_one_process_cluster_join_subprocess():
    script = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        from pyrayt_tpu.parallel.distributed import initialize_distributed

        joined = initialize_distributed(
            coordinator_address="localhost:45987", num_processes=1, process_id=0
        )
        # one process: joined group of size 1 -> is_distributed() False, but
        # the coordinator path ran end to end
        assert jax.process_count() == 1
        # idempotent second call
        initialize_distributed()
        print("JOIN-OK")
        """
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    assert "JOIN-OK" in out.stdout, out.stderr[-2000:]


def test_env_driven_parse(monkeypatch):
    # WORLD_SIZE/RANK spellings resolve, and a bad join (no coordinator
    # listening, tiny timeout) raises rather than silently no-ops
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1")  # nothing there
    import pytest

    with pytest.raises(Exception):
        initialize_distributed(initialization_timeout=1)
