"""On-slice model serving with continuous batching."""

from .batcher import ContinuousBatcher, GenRequest
