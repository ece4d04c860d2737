"""holoagent_tpu — a TPU-native embodied-AI mapping/retrieval/navigation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
HorizonRobotics/HoloAgent (see /root/repo/SURVEY.md): posed RGB-D keyframes are
encoded (CLIP image/text towers, SAM-style open-vocabulary segmentation),
backprojected and voxel-fused into a Hierarchical Multi-modal Scene Graph
(floors -> rooms -> views -> objects) held resident in HBM, and queried by a
Fast-to-Slow reasoner combining hierarchical CLIP retrieval with a
continuous-batched on-slice VLM.

Design stance (TPU-first, not a port):
  * every hot op is a pure jitted array program over fixed-capacity padded
    buffers with validity masks (no dynamic shapes under jit);
  * neighbor queries use sort/segment reductions and voxel hash grids instead
    of KD-trees/FAISS;
  * multi-chip scaling is expressed with jax.sharding.Mesh + shard_map and XLA
    collectives over ICI, never host-side communication;
  * cold, graph-shaped algorithms (Voronoi nav graphs, ply/json persistence)
    stay host-side, mirroring the reference's module boundaries.
"""

__version__ = "0.1.0"
