"""Training loops: contrastive CLIP fine-tuning, sharded over the mesh.

The reference never trains anything (frozen CLIP/SAM checkpoints); a TPU-native
framework at production scale must be able to adapt its towers in-domain, so a
DP+TP contrastive trainer ships as a first-class component and doubles as the
multi-chip compile fixture for the driver's dry run.
"""

from .contrastive import clip_loss, make_train_step, init_train_state
from .distill import distill_step, distill_vlm
