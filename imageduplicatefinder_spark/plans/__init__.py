from imageduplicatefinder_spark.plans.checkpoint import CheckpointManager
from imageduplicatefinder_spark.plans.pipeline import DedupPipeline, PipelineResult

__all__ = ["CheckpointManager", "DedupPipeline", "PipelineResult"]
