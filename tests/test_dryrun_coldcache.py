"""Driver-seat cold-cache proof for `dryrun_multichip(8)`.

The driver invokes `__graft_entry__.dryrun_multichip(8)` in a fresh process
with no warm compile cache — the exact environment where rounds 1 and 2
went red (bootstrap assert; XLA:CPU collective-permute rendezvous abort
while sibling device threads were descheduled behind 1-core cold compiles).
This test reproduces that seat: a fresh subprocess (jax not yet imported,
so the pass-orchestration path spawns per-pass children) pointed at an
EMPTY compile-cache directory, and asserts every pass prints its OK marker.

Expensive by design (every pass compiles cold, ~serialized on this 1-core
box) — set QEA_SKIP_COLDCACHE=1 to skip locally when iterating.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("QEA_SKIP_COLDCACHE") == "1",
                    reason="QEA_SKIP_COLDCACHE=1")
def test_dryrun_cold_cache_8dev(tmp_path):
    cache = tmp_path / "cold_cache"
    cache.mkdir()
    env = dict(os.environ)
    env["QEA_DRYRUN_CACHE_DIR"] = str(cache)
    # the child decides its own platform bootstrap; scrub the pytest
    # session's CPU pin so the run matches the driver's environment
    env.pop("JAX_PLATFORMS", None)
    code = ("import sys; sys.path.insert(0, %r); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(8)" % _REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=_REPO,
        capture_output=True, text=True, timeout=5400)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    assert "ALL PASSES OK" in proc.stdout, proc.stdout[-3000:]
    # cold really means cold: the fresh cache dir must have been populated
    assert any(cache.iterdir()), "compile cache untouched — not a cold run"
