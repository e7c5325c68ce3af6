#!/bin/bash
# Probe the TPU relay until it answers, then exec the given command.
#
# The axon relay can wedge after a client is killed mid-RPC; recovery is
# passive (15-40 min observed). We probe with a 1-line jit op every ~3 min
# under a timeout so the hung probe client is killed by exact PID each time.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:.
n=0
while true; do
  n=$((n+1))
  echo "[tpu_wait] probe $n $(date +%H:%M:%S)" >&2
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu', jax.default_backend()
print(jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128))))
" >&2; then
    echo "[tpu_wait] TPU up after $n probes; starting: $*" >&2
    exec "$@"
  fi
  sleep 180
done
