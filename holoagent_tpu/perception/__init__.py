"""Perception: per-frame open-vocabulary feature extraction (SAM x CLIP)."""

from .extractor import FrameFeatures, extract_frame_features
