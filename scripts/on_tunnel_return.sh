#!/bin/bash
# Wait for the axon relay to come back, then run the TPU deliverables that
# were blocked by the outage (see CLAUDE.md "relay-outage playbook"):
#   1. bench.py              -> full 3-JSON-line record incl. the render leg
#   2. probe_webviewer.py    -> steady-state HTTP serving rate for PERF.md
#   3. showcase GIF render   -> /tmp/tunnel_return/showcase.gif (inspect,
#      then copy over docs/demo_ocean_spray.gif and commit)
#
# Run detached (mkdir FIRST — the redirect below runs before this script's
# own mkdir and would fail on a fresh /tmp):
#   mkdir -p /tmp/tunnel_return && \
#     nohup bash scripts/on_tunnel_return.sh > /tmp/tunnel_return/watch.log 2>&1 &
set -u
LOG=/tmp/tunnel_return
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

echo "watching for relay return, probe every 10 min" && date

while true; do
    if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        break
    fi
    date +"%F %T still down" >> "$LOG/probe.log"
    sleep 600
done
date +"%F %T relay BACK" | tee "$LOG/returned.txt"

# Each stage runs in its own process (the backend pages HBM to host; fresh
# processes avoid cross-contamination) and is individually bounded.
echo "=== auto-tap confirm (round 5: tap_impl=auto -> pallas) ===" && date
timeout 2400 python scripts/profile_pallas_tap.py auto \
    > "$LOG/confirm_auto_tap.log" 2>&1
echo "confirm_auto_tap exit=$?"

echo "=== specular AA probe (round 5: cost + scale2-vs-native delta) ===" && date
timeout 3000 python scripts/probe_specular_aa.py \
    > "$LOG/probe_spec_aa.log" 2>&1
echo "probe_spec_aa exit=$?"

echo "=== bench.py ===" && date
timeout 3000 python bench.py > "$LOG/bench.log" 2>&1
echo "bench exit=$?"

echo "=== probe_webviewer ===" && date
timeout 2400 python scripts/probe_webviewer.py > "$LOG/probe_web.log" 2>&1
echo "probe_web exit=$?"

echo "=== showcase gif ===" && date
timeout 3600 python demo.py --spray --wind-speed 16 --camera 0,4.5,0 \
    --pitch -5 --environment --frames 48 --gif "$LOG/showcase.gif" \
    > "$LOG/gif.log" 2>&1
echo "gif exit=$?"

date +"%F %T all stages done" | tee "$LOG/done.txt"

# Wire-format A/B (appended stage; runs after done.txt): the same probe
# with the frame transfer pinned to RGB, so the YUV420 win is measured
# against RGB in the SAME session (relay variance defeats cross-version
# comparisons).
echo "=== probe_webviewer rgb (wire A/B) ===" && date
timeout 2400 python scripts/probe_webviewer.py rgb > "$LOG/probe_web_rgb.log" 2>&1
echo "probe_web_rgb exit=$?"
date +"%F %T a/b stage done" >> "$LOG/done.txt"
