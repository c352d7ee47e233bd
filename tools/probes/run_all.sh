#!/bin/bash
# Run the round-3 TPU probes SEQUENTIALLY (never two TPU processes at
# once — see CLAUDE.md). Usage:
#   nohup bash tools/probes/run_all.sh > /tmp/probes.log 2>&1 &
# then poll /tmp/probe_*.log.
set -u
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

# Durable evidence (VERDICT r3 item 6): every probe log is also written
# under docs/perf/<UTC date>/ so round numbers cite committed artifacts,
# not /tmp files that die with the session.
ARCHIVE="docs/perf/$(date -u +%Y-%m-%d)"
mkdir -p "$ARCHIVE"

run() {
  name=$1; log=$2; shift 2
  echo "=== $name $* start $(date)"
  python "tools/probes/$name.py" "$@" > "/tmp/probe_$log.log" 2>&1
  rc=$?
  { echo "# $name $* @ $(date -u +%Y-%m-%dT%H:%M:%SZ) rc=$rc";
    cat "/tmp/probe_$log.log"; } > "$ARCHIVE/$log.log"
  echo "=== $name rc=$rc end $(date)"
}

# each probe in its own process: compiling many very large programs
# with big ones resident is the known worker-crash pattern
run probe_sc_phase sc_phase_b256 256 640
run probe_sc_phase sc_phase_b512 512 1280
run probe_fid32 probe_fid32
run probe_dg3 probe_dg3
run probe_grad probe_grad
# fallback datapoint if the 256^2 transpose kernel OOMs VMEM
run probe_grad probe_grad128 128
# session-5 diff paths (granular 1M + self-collide 256^2 grad rates)
run probe_grad2 probe_grad2
# session-7: SC contact-kernel fixed-vs-math (slab-width) decomposition
run probe_sc4 probe_sc4
# round-5: grad envelope (512^2 banded band sweep + streamed 1024^2),
# packed-candidate gather floor, end-to-end datagen with egress
run probe_band512 grad_band512 512 64
run probe_grad probe_grad1024 1024 64
run probe_packed packed
run probe_dg_e2e datagen_e2e 4096 3
echo "ALL PROBES DONE $(date)"
