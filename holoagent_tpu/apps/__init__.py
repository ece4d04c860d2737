"""CLI applications (the reference's fsr_vln/application layer):

  python -m holoagent_tpu.apps.build_map   --config cfg.yaml [overrides...]
  python -m holoagent_tpu.apps.query_bench --graph <dir> --instructions q.json
  python -m holoagent_tpu.apps.eval_graph  --graph <dir> --gt scene_info.json
"""
