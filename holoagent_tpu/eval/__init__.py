"""Evaluation: GT scene graphs, HMSG accuracy metrics, segmentation metrics."""

from .gt import GTGraph, GTFloor, GTRoom, GTObject, gt_from_synthetic
from .evaluator import HMSGEvaluator
