#!/bin/sh
# One-command TPU measurement queue for a relay session.
#
# The axon relay goes down for hours at a time (CLAUDE.md); when it
# returns, run this to capture every pending number in one sitting,
# serially (two TPU processes deadlock the relay). Each step is bounded
# so a relay hang can't eat the whole session. Logs land in
# /tmp/tpu_measure/.
#
# Usage:  sh scripts/tpu_measure.sh            # probe + full queue
#         sh scripts/tpu_measure.sh bench      # just the headline bench
set -u
OUT=/tmp/tpu_measure
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
    name=$1; secs=$2; shift 2
    echo "== $name (timeout ${secs}s) =="
    timeout "$secs" "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    tail -3 "$OUT/$name.log"
    echo "== $name exit=$rc"
}

echo "probing relay..."
if ! timeout 300 python -c "import jax; print(jax.devices())" \
        > "$OUT/probe.log" 2>&1; then
    echo "RELAY DOWN (probe timed out / failed):"
    tail -2 "$OUT/probe.log"
    exit 1
fi
cat "$OUT/probe.log"

case "${1:-all}" in
bench)
    step bench 3600 python bench.py
    ;;
all)
    # Order: cheapest compile first (device_time shares program shapes
    # with bench warmup), headline bench last so earlier failures still
    # leave the per-program numbers on disk.
    step device_time 2400 python benchmarks/device_time.py
    step limb_backend 2400 python benchmarks/limb_backend_time.py
    step device_time_int8 2400 env TERRAN_TPU_EMBED_PRECISION=int8 \
        python benchmarks/device_time.py
    step pose_int8 2400 env TERRAN_TPU_POSE_PRECISION=int8 \
        python benchmarks/pose_int8_time.py
    # Both trunks int8 in ONE session — the headline combined number
    # (BASELINE.md "39.5 ms -> ~202 fps") must be requeueable from here.
    step device_time_int8_both 2400 env \
        TERRAN_TPU_EMBED_PRECISION=int8 TERRAN_TPU_POSE_PRECISION=int8 \
        python benchmarks/device_time.py
    step bench 3600 python bench.py
    step peak 1200 python benchmarks/peak.py
    ;;
int8)
    step device_time_int8 2400 env TERRAN_TPU_EMBED_PRECISION=int8 \
        python benchmarks/device_time.py
    step pose_int8 2400 env TERRAN_TPU_POSE_PRECISION=int8 \
        python benchmarks/pose_int8_time.py
    step device_time_int8_both 2400 env \
        TERRAN_TPU_EMBED_PRECISION=int8 TERRAN_TPU_POSE_PRECISION=int8 \
        python benchmarks/device_time.py
    ;;
*)
    echo "unknown step: $1" >&2; exit 2
    ;;
esac
echo "done; logs in $OUT"
