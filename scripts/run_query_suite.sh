#!/usr/bin/env bash
# Rebuild the wide query-benchmark artifacts on the real chip (the reference's
# visualize_query_graph_icra_* battery, reference fsr_vln/application/
# visualize_query_graph/visualize_query_graph_icra_ic4f.py:152-327):
#   1. map the three_room benchmark scene (config/synthetic_tpu_3room.yaml)
#   2. run the >=50-instruction bilingual set through the FSR engine against
#      a 512-distractor gallery, for all three backends (fast CLIP,
#      slow-CLIP verifier, slow generative VLM via the continuous batcher)
#   3. run the GT-generated hierarchical long-query benchmark
# Results land in results/*.json (the reference all_results schema).
set -euo pipefail
cd "$(dirname "$0")/.."

GRAPH_DIR="${1:-}"
CFG=config/synthetic_tpu_3room.yaml
if [ -z "$GRAPH_DIR" ]; then
  python -m holoagent_tpu.apps.build_map --config "$CFG"
  GRAPH_DIR=$(ls -dt /tmp/holoagent_tpu/scene_graphs/synthetic_tpu_3room/graph_* | head -1)
fi
echo "graph: $GRAPH_DIR"

python - <<'PY'
import json
from holoagent_tpu.eval.instruction_sets import three_room_instructions
qs = three_room_instructions()
json.dump(qs, open("/tmp/instructions_3room.json", "w"), ensure_ascii=False)
print(f"{len(qs)} instructions")
PY

python - <<'PY'
import json
from holoagent_tpu.apps.eval_protocol import LAYOUTS
from holoagent_tpu.dataloader.synthetic import SyntheticScene
from holoagent_tpu.eval import gt_from_synthetic
make_scene, rects, _ = LAYOUTS["three_room"]
gt = gt_from_synthetic(make_scene(SyntheticScene), room_rects=rects)
gt.to_json("/tmp/scene_info_3room.json")
PY

run_qb () { # mode extra-args...
  out="results/all_results_$1_tpu.json"; shift
  python -m holoagent_tpu.apps.query_bench --graph "$GRAPH_DIR" \
    --instructions /tmp/instructions_3room.json --config "$CFG" \
    --pad-gallery 512 --out "$out" "$@"
  echo "wrote $out"
}
run_qb fast
run_qb slow_clip --slow --vlm clip
run_qb slow_generative --slow --vlm generative

# latency-only long-query pass over the chip-built (random-weight) map.
# results/long_query_tpu.json — the ACCURACY artifact — is owned by
# apps.correctness_suite (fixture-trained towers, >=2-floor scene,
# >=50 queries); do not overwrite it here.
python -m holoagent_tpu.apps.long_query_bench --graph "$GRAPH_DIR" \
  --gt /tmp/scene_info_3room.json --config "$CFG" \
  --out results/long_query_3room_latency_tpu.json
echo "wrote results/long_query_3room_latency_tpu.json"
