"""Driver-side REST acquisition → landing zone (S12 in SURVEY.md §2.1).

Reference: ``HttpClientUtils.performGetJson`` (HttpClientUtils.scala:24-35)
fetches a JSON array string from the rest-provider servlet
(PipelineServlet.scala:8-54); ``performGetAndWrite`` (:59-75) writes it to
a local file which is then PUT to a stage (pipeline/utils/package.scala:
14-40).

Here: ``fetch_json_to_stage`` does GET → atomic land into the watched
stage directory (streaming/file_ingest.land_file). The HTTP dependency is
stdlib urllib (no extra packages); tests use ``local_payload_provider``
(a deterministic generator standing in for the REST server) so no network
is required — the reference's rest-provider module is itself just a
synthetic-JSON generator.

Scale note: acquisition is driver-side by design (same as the reference);
the cluster-side work starts at the landing zone. At real scale the
landing zone is object storage fed by producers, and this module is only
the demo feeder.
"""

from __future__ import annotations

import json
import urllib.request

from .. import fixtures
from ..streaming.file_ingest import land_file


def fetch_json_to_stage(url: str, stage_dir: str, timeout: float = 10.0) -> str:
    """GET a JSON payload and land it atomically in the stage directory.

    performGetJson + performGetAndWrite + stageLocalPath parity
    (HttpClientUtils.scala:24-75, SnowflakeUtils.scala:100-115).
    """
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        payload = resp.read().decode("utf-8")
    json.loads(payload)  # validate before landing (fail fast, land nothing)
    return land_file(stage_dir, payload)


def local_payload_provider(spark, entity: str, n: int, seed: int = 42) -> str:
    """Deterministic stand-in for the rest-provider servlet
    (PipelineServlet.scala:8-54): returns a JSON array string for one of
    the reference's four entities."""
    gens = {
        "orders": fixtures.orders,
        "payments": fixtures.payments,
        "ratings": fixtures.ratings,
        "restaurants": fixtures.restaurants,
    }
    if entity not in gens:
        raise ValueError(f"unknown entity {entity!r}; one of {sorted(gens)}")
    rows = gens[entity](spark, n, seed=seed).toJSON().collect()
    return "[" + ",".join(rows) + "]"
