#!/bin/bash
# Wait for the tunneled TPU to recover (quiet period + probe), then launch
# the given command.  Probe = one trivial jitted program, generous timeout.
set -u
cd /root/repo
QUIET=${QUIET:-1200}
while true; do
    echo "### $(date -u +%H:%M:%S) quiet period ${QUIET}s"
    sleep "$QUIET"
    echo "### $(date -u +%H:%M:%S) probing"
    if timeout 1500 python -u -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
print('probe:', float(jax.jit(lambda x:(x+1).sum())(jnp.ones(8))), flush=True)
"; then
        echo "### $(date -u +%H:%M:%S) probe OK — waiting out device release, then launching: $*"
        sleep 180
        "$@"
        exit $?
    fi
    echo "### $(date -u +%H:%M:%S) probe failed; will retry"
done
