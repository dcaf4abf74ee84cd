"""Source connectors: table-function (UDTF) row generators and the
driver-side REST acquirer — parity with the reference's UDTF registration
(tt-dps-common udfs/package.scala:47-76) and HTTP client
(HttpClientUtils.scala:24-75)."""

from .rest import fetch_json_to_stage, local_payload_provider
from .udtf_source import (
    generate_employees,
    generate_industries,
    register_generators,
)

__all__ = [
    "fetch_json_to_stage",
    "generate_employees",
    "generate_industries",
    "local_payload_provider",
    "register_generators",
]
