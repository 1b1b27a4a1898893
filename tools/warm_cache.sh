#!/bin/bash
# Warm the persistent XLA compile caches for every driver-facing surface.
#
# /tmp/rmvq_jax_cache is wiped on VM restart, and the flagship's cold
# remote compile (~490 s over the tunnel) nearly fills the driver bench's
# default 560 s budget — cold runs capture only the tokenizer + flagship
# legs. One pass of this script makes the next `python bench.py` land ALL
# legs (tokenizer, flagship, get_action batch 1/16, loader) in well under
# the budget, and the next `__graft_entry__.dryrun_multichip(8)` finish in
# ~2.5 min instead of ~9.
#
# Children killed mid-compile never write their cache entry (the entry is
# written on compile completion), so warming MUST use an extended budget —
# that is this script's whole job.
#
# Usage: tools/warm_cache.sh   (safe to re-run; warm legs are ~free)

set -u
cd "${REPO_ROOT:-$(dirname "$0")/..}" || exit 1

echo "[warm] tokenizer leg SOLO first (inside bench.py it is capped at"
echo "       300 s/attempt while the flagship child compiles concurrently —"
echo "       cold over the tunnel it needs longer, and a child killed"
echo "       mid-compile writes no cache entry)"
timeout 900 python bench_tokenizer.py

echo "[warm] remaining bench legs (extended budget)"
RMVQ_BENCH_BUDGET_SEC=1400 timeout 1500 python bench.py

echo "[warm] multichip dryrun programs (8 virtual CPU devices)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    timeout 1200 python __graft_entry__.py

echo "[warm] done — cache entries:"
ls /tmp/rmvq_jax_cache 2>/dev/null | wc -l
