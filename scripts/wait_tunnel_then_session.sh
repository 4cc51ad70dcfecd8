#!/bin/bash
# Poll the axon tunnel with cheap init probes; once a device answers,
# hand off to the full round-3 device session (ONE process at a time).
# Probes only touch backend init + one tiny op, so a timeout kill here
# never lands mid-kernel-compile (the wedge mode the skill warns about).
# Usage: nohup bash scripts/wait_tunnel_then_session.sh > /tmp/r3watch.log 2>&1 &
#        echo $! > /tmp/r3watch.pid
cd "$(dirname "$0")/.."

while true; do
    echo "[watch] $(date -u +%H:%M:%S) probing tunnel..."
    if timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
x = (jnp.ones((8, 128)) * 2).sum()
jax.block_until_ready(x)
print("[watch] tunnel OK:", d, float(x), flush=True)
EOF
    then
        echo "[watch] tunnel up; starting device session"
        bash scripts/r3_device_session.sh
        echo "[watch] device session finished"
        break
    fi
    echo "[watch] tunnel still down; sleeping 240s"
    sleep 240
done
