"""Host-side utilities: camera models, SE(3) helpers, PLY IO, labels, timing."""
