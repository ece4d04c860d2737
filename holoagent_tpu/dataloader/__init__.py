"""Posed-RGBD dataset layer.

Same contract as the reference's RGBDDataset family
(reference fsr_vln/memory/hmsg/dataloader/generic.py:12-190): a dataset yields
(rgb, depth, pose_c2w, K) per frame.  Backprojection/3-D lifting live in
holoagent_tpu.ops (device-side), not here — the loaders only do file IO and
convention fixes.  The synthetic loader procedurally renders a scene so every
test and benchmark runs hermetically with ground truth attached.
"""

from .generic import RGBDFrame, RGBDDataset
from .synthetic import SyntheticScene, SyntheticDataset, Box
