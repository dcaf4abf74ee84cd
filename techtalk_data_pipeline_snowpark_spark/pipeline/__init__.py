from .dag import DAG, ContinuousPipeline, Operation, Pipeline, flatten, max_depth_per_node

__all__ = ["DAG", "ContinuousPipeline", "Operation", "Pipeline", "flatten", "max_depth_per_node"]
