"""Scene memory: the HBM-resident voxel scene, instance sets, and the
Hierarchical Multi-modal Scene Graph (floors -> rooms -> views -> objects)."""
