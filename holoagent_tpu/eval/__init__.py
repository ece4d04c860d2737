"""Evaluation: GT scene graphs, HMSG accuracy metrics, segmentation metrics."""

from .gt import GTGraph, GTFloor, GTRoom, GTObject, gt_from_synthetic
from .evaluator import HMSGEvaluator
from .long_query import LongQuery, LongQueryReport, generate_long_queries, score_long_queries
