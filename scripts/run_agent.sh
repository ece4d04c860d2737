#!/bin/bash
# Bring up the semantic-navigation agent stack (the ops role of the
# reference's nav_agent/scripts/run_sem_nav.sh:17-55 host-side bringup:
# voice client + goal publisher + g1_move FIFO pair), adapted to this
# framework's boundaries: the goal service answers FSR queries over zmq
# (tcp://127.0.0.1:5601), and the native FIFO velocity bridge feeds the
# robot-SDK side.  Uses tmux when available (one window per node, like the
# reference's bringup), otherwise plain background processes with pid files
# under /tmp/holoagent_agent/.
#
# Usage: scripts/run_agent.sh <graph_dir> [config.yaml]
#        scripts/run_agent.sh stop
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=/tmp/holoagent_agent
FIFO=${VEL_FIFO:-/tmp/vel_fifo}
SESSION=holoagent

if [[ "${1:-}" == "stop" ]]; then
  if command -v tmux >/dev/null; then tmux kill-session -t "$SESSION" 2>/dev/null || true; fi
  for f in "$RUN_DIR"/*.pid; do
    [[ -e "$f" ]] && kill "$(cat "$f")" 2>/dev/null || true
    rm -f "$f"
  done
  echo "agent stack stopped"
  exit 0
fi

GRAPH=${1:?usage: run_agent.sh <graph_dir> [config.yaml] | stop}
CFG=${2:-config/synthetic_tpu.yaml}
mkdir -p "$RUN_DIR"

GOAL_PY=$(cat <<PY
import time
from holoagent_tpu import config as cfgmod
from holoagent_tpu.apps.common import load_models, tokenizer
from holoagent_tpu.memory.hmsg import HMSGraph
from holoagent_tpu.query import FSRQueryEngine
from holoagent_tpu.agent.goal_service import GoalService

cfg = cfgmod.load('$CFG', [])
graph = HMSGraph.load('$GRAPH')
clip_params, _, cv, _ = load_models(cfg)
engine = FSRQueryEngine(graph, clip_params, tokenizer(), cv)
svc = GoalService(engine)
svc.serve_zmq()
print('goal service up on tcp://127.0.0.1:5601', flush=True)
while True:
    time.sleep(3600)
PY
)

VEL_PY=$(cat <<PY
import time
from holoagent_tpu.native import VelocityBridge
b = VelocityBridge('$FIFO')
print('velocity bridge reading $FIFO', flush=True)
while True:
    v = b.read_shaped()
    if v is not None:
        print('cmd_vel', v, flush=True)
    else:
        time.sleep(0.01)
PY
)

if command -v tmux >/dev/null; then
  tmux kill-session -t "$SESSION" 2>/dev/null || true
  tmux new-session -d -s "$SESSION" -n goal
  tmux send-keys -t "$SESSION:goal" "python -c \"$GOAL_PY\"" Enter
  tmux new-window -t "$SESSION" -n vel
  tmux send-keys -t "$SESSION:vel" "python -c \"$VEL_PY\"" Enter
  echo "agent stack up in tmux session '$SESSION'; attach: tmux attach -t $SESSION"
else
  python -c "$GOAL_PY" > "$RUN_DIR/goal.log" 2>&1 &
  echo $! > "$RUN_DIR/goal.pid"
  python -c "$VEL_PY" > "$RUN_DIR/vel.log" 2>&1 &
  echo $! > "$RUN_DIR/vel.pid"
  echo "agent stack up (no tmux): logs + pids in $RUN_DIR; stop with scripts/run_agent.sh stop"
fi
echo "goal service: tcp://127.0.0.1:5601   velocity FIFO: $FIFO"
