"""Atomic persistent compile cache for the 2-process trainer pair.

The 2-process `jax.distributed` trainer pass (driver `dryrun_multichip`
pass `trainer_2proc`; pytest `test_two_process_trainer_epoch`) is
rendezvous-sensitive on this 1-core box: the two workers' phase programs
differ (pinned per-host document subsets / validation windows), and an
*asymmetric* persistent cache — one worker warm, one cold — desynchronizes
the first collective past Gloo's non-configurable ~30 s context rendezvous.
A worker fatally terminated mid-compile never writes its cache entry, so a
naive shared cache can stay asymmetric forever.

Round 4 "fixed" this with a fresh (always-cold) per-run cache, which is
symmetric but costs ~8 min of concurrent cold compile on every run — that
pushed the driver's whole dryrun past its timeout (`MULTICHIP_r04.json`
rc=124). The real invariant is *symmetry*, not coldness:

  * a completion marker is written only after BOTH workers exit 0, i.e.
    both per-host program sets are fully present in the cache;
  * the marker records a fingerprint of every source file that shapes the
    compiled programs (the whole `qea_ocr_tpu` package + the worker
    script) plus the jax version, so a code change that could invalidate
    one worker's programs but not the other's wipes the cache instead of
    running asymmetric;
  * `prepare()` reuses the directory only when the marker matches;
    otherwise it wipes, guaranteeing symmetric-cold.

Result: first run after any code change is symmetric-cold (~8 min, same
as round 4's every-run cost); every subsequent run is symmetric-warm
(~1 min), which is what keeps the driver's `dryrun_multichip(8)` inside
its budget.
"""

from __future__ import annotations

import hashlib
import os
import shutil

_MARKER = "PAIR_COMPLETE"


def _fingerprint(repo: str) -> str:
    """Content hash of everything that shapes the pair's XLA programs."""
    h = hashlib.sha256()
    try:
        from importlib.metadata import version
        h.update(version("jax").encode())
        h.update(version("jaxlib").encode())
    except Exception:
        pass
    files = [os.path.join(repo, "tests", "_mh_trainer_worker.py")]
    pkg = os.path.join(repo, "qea_ocr_tpu")
    for dirpath, dirnames, names in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        files += [os.path.join(dirpath, n) for n in names if n.endswith(".py")]
    for f in sorted(files):
        h.update(os.path.relpath(f, repo).encode())
        try:
            with open(f, "rb") as fh:
                h.update(fh.read())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()


def default_dir(repo: str) -> str:
    # dedicated dir: the pair must never share `.jax_cache/cpu` with the
    # single-process test suite (partial key overlap is exactly the
    # one-warm-one-cold hazard).
    return os.path.join(repo, ".jax_cache", "2proc")


def prepare(repo: str, cache_dir: str | None = None) -> str:
    """Return a cache dir that is provably symmetric for the worker pair:
    kept as-is (warm) iff the completion marker matches the current code
    fingerprint, wiped to empty (symmetric-cold) otherwise."""
    cache_dir = cache_dir or default_dir(repo)
    marker = os.path.join(cache_dir, _MARKER)
    warm = False
    try:
        with open(marker) as f:
            warm = f.read().strip() == _fingerprint(repo)
    except OSError:
        pass
    if not warm:
        shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
    return cache_dir


def mark_complete(repo: str, cache_dir: str) -> None:
    """Record (atomically) that both workers exited 0 with their programs
    fully written under `cache_dir`."""
    marker = os.path.join(cache_dir, _MARKER)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(_fingerprint(repo) + "\n")
    os.replace(tmp, marker)
