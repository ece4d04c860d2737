"""FSR query engine: fast hierarchical CLIP retrieval + slow VLM refinement."""

from .parser import RuleParser, ParsedQuery
from .engine import FSRQueryEngine
from .vlm_backend import VLMBackend, NullVLM, ClipVLM
from .oracle import OracleVLM, tag_image, read_tag
