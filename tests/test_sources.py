"""Sources: UDTF table functions (S6) and REST landing (S12) —
SURVEY.md §2.1."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from techtalk_data_pipeline_snowpark_spark.sources import (
    fetch_json_to_stage,
    generate_employees,
    generate_industries,
    local_payload_provider,
    register_generators,
)
from techtalk_data_pipeline_snowpark_spark.streaming.file_ingest import create_stage


def test_udtf_generators_dataframe_api(spark):
    """tableFunction invocation parity (SampleStream.scala:27-41)."""
    ind = generate_industries(spark, 10)
    rows = ind.collect()
    assert len(rows) == 10
    assert set(ind.columns) == {"industry_code", "industry_name", "district_code"}
    # deterministic across invocations (unlike the reference's unseeded Random)
    again = generate_industries(spark, 10).collect()
    assert rows == again

    emp = generate_employees(spark, 5).collect()
    assert len(emp) == 5
    assert all(len(r.district_code_first2) == 2 for r in emp)


def test_udtf_sql_registration(spark):
    """registerTemporary parity (udfs/package.scala:67-76)."""
    register_generators(spark)
    n = spark.sql("SELECT * FROM generate_industries(7)").count()
    assert n == 7


def test_rest_fetch_to_stage(spark, tmp_path):
    """GET → validate → atomic land (HttpClientUtils.scala:24-75 parity),
    against a real local HTTP server serving a deterministic payload."""
    payload = local_payload_provider(spark, "orders", 5)
    assert isinstance(json.loads(payload), list) and len(json.loads(payload)) == 5

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            body = payload.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        stage = create_stage(str(tmp_path / "stage"))
        landed = fetch_json_to_stage(
            f"http://127.0.0.1:{srv.server_port}/pipeline/orders", stage
        )
        assert open(landed).read() == payload
        got = spark.read.json(spark.sparkContext.parallelize([payload]))
        assert got.count() == 5
    finally:
        srv.shutdown()
