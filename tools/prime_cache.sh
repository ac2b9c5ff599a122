#!/bin/sh
# Prime the persistent XLA compile cache for the driver's end-of-round runs.
#
# MUST be run as the LAST act of a build round, AFTER the final commit that
# touches any traced source (package modules, bench.py, __graft_entry__.py):
# the cache keys on the traced program, so any later edit invalidates the
# primed entries — that is exactly how BENCH_r04 lost its secondary rows
# (the end-of-round snapshot commit changed runtime/config.py and bench.py
# after the cache was last primed, the headline re-compiled cold for ~460 s
# of a 420 s budget, and the gate then skipped everything).
#
# What it does:
#   1. run bench.py with a huge budget so every sub-benchmark compiles and
#      lands in the persistent cache (~/.cache/safe_exploration_tpu_jax —
#      outside the repo, so git operations cannot wipe it);
#   2. run the driver's compile-check entry (__graft_entry__.entry) once.
#
# The driver then re-runs `python bench.py` on the same machine: every jit is
# a disk hit, the cache probe reports "warm", and the warm estimates let the
# full ~20-row record fit the 420 s budget.
set -e
cd "$(dirname "$0")/.."
echo "prime_cache: bench.py full pass (budget 3600s)..." >&2
BENCH_BUDGET_S=3600 python bench.py
echo "prime_cache: __graft_entry__ compile check..." >&2
python - <<'EOF'
import __graft_entry__ as g
import jax

fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry() compiled and ran", flush=True)
EOF
echo "prime_cache: done. Do NOT edit traced source after this point." >&2
