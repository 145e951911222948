#!/bin/bash
# TPU validation queue for this session's kernel work. Each step logs and
# continues on failure. Run from /root/repo.
cd /root/repo
echo "=== 1. tunnel sanity ==="
timeout -k 5 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); print('tunnel ok', float((x@x).ravel()[0]))" || { echo TUNNEL_DOWN; exit 1; }
echo "=== 2. ref-geometry profile ==="
timeout 900 python scripts/profile_step.py /tmp/v_ref > /tmp/v_ref.log 2>&1
echo "exit=$?"; python scripts/parse_trace.py /tmp/v_ref --ops 0 2>/dev/null | head -2
echo "=== 3. bench.py ==="
timeout 900 python bench.py 2>/dev/null | tail -1
echo "=== 4. full-res profile (default: blocked banded stem fwd) ==="
timeout 900 python scripts/profile_fullres.py > /tmp/v_full.log 2>&1
echo "exit=$?"; python scripts/parse_trace.py /tmp/fullres_profile --ops 12 2>/dev/null | head -14
echo "=== 5. full-res profile (kill-switch: XLA fwd + blocked dw) ==="
rm -rf /tmp/fullres_profile
TRANSMF_NO_BLOCKED_STEM=1 timeout 900 python scripts/profile_fullres.py > /tmp/v_full_bs.log 2>&1
echo "exit=$?"; python scripts/parse_trace.py /tmp/fullres_profile --ops 12 2>/dev/null | head -14
echo "=== 6. sanity train (both phases) ==="
timeout 1800 python scripts/tpu_sanity_train.py 2>&1 | tail -8
echo "=== DONE ==="
