#!/bin/bash
# One-command finalization of the 1.4B-token flagship run after a tunnel
# outage + supervised resume (docs/runs/slam_1p4b.md records the outage).
#
# Preconditions: the resume supervisor (/tmp/supervise_resume.sh) exited
# rc=0 and the chip queue (/tmp/chip_queue.sh) drained — i.e.
# /tmp/markov_eval_final.json and /tmp/bench_final.json exist.
#
# Re-harvests the full log into docs/runs/, folding in the final ground
# truth eval and the total wall-clock across all legs, then prints the
# diff to review + commit.
set -euo pipefail
cd "$(dirname "$0")/.."

LOG=${LOG:-/tmp/slam_big.log}
OUT=${OUT:-/tmp/slam_big/out}
SUP=${SUP:-/tmp/supervisor.log}
EVAL=${EVAL:-/tmp/markov_eval_final.json}
LEG12_SECONDS=${LEG12_SECONDS:-34898}   # committed legs 1+2 wall-clock

[ -s "$EVAL" ] || { echo "missing $EVAL — chip queue not drained"; exit 1; }

# leg-3 wall-clock: last supervised launch -> wrapper exit in supervisor.log
LEG3=$(python - "$SUP" <<'EOF'
import re, sys
from datetime import datetime

launch = exit_ = None
for line in open(sys.argv[1]):
    ts = " ".join(line.split()[:6])
    try:
        t = datetime.strptime(ts, "%a %b %d %H:%M:%S %Z %Y")
    except ValueError:
        continue
    # FIRST launch -> FINAL rc=0 exit: stall-kill/relaunch cycles inside
    # the leg (and the downtime between them) are part of its wall-clock
    if "launching resume leg" in line and launch is None:
        launch = t
    if "wrapper exited rc=0" in line:
        exit_ = t
if not (launch and exit_):
    sys.exit("supervisor.log has no completed leg (launch/exit pair)")
if exit_ <= launch:
    sys.exit(f"supervisor.log timestamps inverted: {launch} -> {exit_}")
print(int((exit_ - launch).total_seconds()))
EOF
)
TOTAL=$((LEG12_SECONDS + LEG3))
echo "leg-3 wall: ${LEG3}s; total: ${TOTAL}s"

python scripts/harvest_pretrain.py "$OUT" --log "$LOG" \
  --eval-json "$EVAL" --wall-seconds "$TOTAL" \
  --note "LR splice at the step-8556 resume (cosine re-derived for max_steps=11100)" \
  --note "device-tunnel outage at step 9620; completed via supervised auto-resume (scripts/supervise_train.py pattern)"

echo
echo "harvest done — review 'git diff docs/runs/' then commit."
