from .dag import DAG, ContinuousPipeline, Operation, Pipeline, flatten, max_depth_per_node
from .stream_sample import (
    clean_write_industry_code_first2,
    generate_records_into_employee,
    generate_records_into_industry_code,
    industry_stream_employee,
)

__all__ = [
    "DAG",
    "ContinuousPipeline",
    "Operation",
    "Pipeline",
    "clean_write_industry_code_first2",
    "flatten",
    "generate_records_into_employee",
    "generate_records_into_industry_code",
    "industry_stream_employee",
    "max_depth_per_node",
]
