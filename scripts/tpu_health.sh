#!/usr/bin/env bash
# TPU chip-lease health check / recovery for the tunneled (axon) platform.
#
# After a TPU process is killed or times out, the chip lease lingers: the
# next client WEDGES in its first device op (~0%% CPU, SIGTERM-immune —
# use SIGKILL). This script encapsulates the recovery loop documented in
# CLAUDE.md "Environment gotchas": probe with a tiny matmul, SIGKILL the
# probe if it wedges, back off, retry. Exits 0 as soon as a probe
# succeeds; exits 1 after --tries failed rounds.
#
#   scripts/tpu_health.sh [--tries N] [--probe-secs S] [--backoff-secs B]

set -u
TRIES=5; PROBE_SECS=120; BACKOFF_SECS=300
while [ $# -gt 0 ]; do
  case "$1" in
    --tries) TRIES=$2; shift 2;;
    --probe-secs) PROBE_SECS=$2; shift 2;;
    --backoff-secs) BACKOFF_SECS=$2; shift 2;;
    *) echo "unknown arg $1" >&2; exit 2;;
  esac
done

for i in $(seq 1 "$TRIES"); do
  echo "tpu_health: probe $i/$TRIES (${PROBE_SECS}s budget)..."
  timeout -s KILL "$PROBE_SECS" python -c \
    "import jax, jax.numpy as jnp; \
     print('TPU-OK', float(jnp.sum(jnp.ones((256,256)) @ jnp.ones((256,256)))))" \
    2>/dev/null | grep TPU-OK && exit 0
  echo "tpu_health: probe wedged/killed; lease still held." >&2
  [ "$i" -lt "$TRIES" ] && sleep "$BACKOFF_SECS"
done
echo "tpu_health: chip not reachable after $TRIES probes" >&2
exit 1
