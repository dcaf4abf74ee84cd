"""DAG orchestrator parity (pipeline/package.scala:5-78, Pipeline.scala:6-24)."""

import time

from techtalk_data_pipeline_snowpark_spark.pipeline import DAG, Operation, Pipeline


def test_dag_depth_order_and_dedup():
    """A node reachable at several depths runs once, at its deepest
    position (maxDeptPerNode — pipeline/package.scala:62-67)."""
    ran = []

    def mk(name):
        return Operation(name, lambda n=name: ran.append(n))

    a, b, c, shared = mk("a"), mk("b"), mk("c"), mk("shared")
    # a >> shared ; a >> b >> shared ; b >> c  → shared at depths 1 and 2
    a >> shared
    a >> b
    b >> shared
    b >> c
    DAG([a]).evaluate()
    assert ran.index("a") < ran.index("b")
    assert ran.index("b") < ran.index("shared")  # deepest occurrence wins
    assert ran.count("shared") == 1


def test_fan_in_fan_out():
    ran = []

    def mk(name):
        return Operation(name, lambda n=name: ran.append(n))

    ingests = [mk(f"ingest{i}") for i in range(4)]
    analytics = [mk(f"an{i}") for i in range(3)]
    for i in ingests:
        for a in analytics:
            i >> a
    DAG(ingests).evaluate()
    assert len(ran) == 7
    assert all(ran.index(i.name) < ran.index(a.name) for i in ingests for a in analytics)


def test_parallel_level_execution():
    order = []

    def slowop(name):
        def fn():
            time.sleep(0.2)
            order.append(name)

        return Operation(name, fn)

    root = Operation("root", lambda: order.append("root"))
    kids = [slowop(f"k{i}") for i in range(4)]
    for k in kids:
        root >> k
    t0 = time.time()
    DAG([root]).evaluate(parallel=True)
    elapsed = time.time() - t0
    assert len(order) == 5
    assert elapsed < 0.7  # 4×0.2s ran concurrently


def test_continuous_pipeline_runs_n_iterations():
    count = []
    op = Operation("tick", lambda: count.append(1))
    p = Pipeline(DAG([op])).as_continuous(0.05, max_iterations=3)
    p.evaluate()
    assert len(count) == 3


def test_sample_stream_employee_industry_parity(spark, tmp_path):
    """SampleStream J2 parity (SampleStream.scala:65-96): UDTF-generated
    EMPLOYEE joined to the INDUSTRY_CODE stream on the computed key;
    incremental ticks consume only new rows, duplicate ticks are no-ops."""
    from techtalk_data_pipeline_snowpark_spark.pipeline.stream_sample import (
        clean_write_industry_code_first2,
        generate_records_into_employee,
        generate_records_into_industry_code,
        industry_stream_employee,
    )
    from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
    import os

    from pyspark.sql import functions as F

    root = str(tmp_path / "stream")
    generate_records_into_employee(spark, root, 50)
    generate_records_into_industry_code(spark, root, 100)

    r1 = industry_stream_employee(spark, root)
    assert not r1.get("skipped")
    # duplicate tick: stream caught up → no-op
    r2 = industry_stream_employee(spark, root)
    assert r2.get("skipped")

    # second generation batch → only the new rows join in
    generate_records_into_industry_code(spark, root, 40)
    r3 = industry_stream_employee(spark, root)
    assert not r3.get("skipped")

    # oracle: plain batch join of ALL industries vs employees
    emp = LakeTable(spark, os.path.join(root, "employee")).read()
    ind = LakeTable(spark, os.path.join(root, "industry_code")).read()
    expected = emp.alias("e").join(
        ind.alias("i"),
        F.col("e.district_code_first2")
        == F.substring(F.upper(F.col("i.district_code")), 1, 2),
    ).count()
    got = LakeTable(spark, os.path.join(root, "employee_industry")).read().count()
    assert got == expected and got > 0

    # projection variant (SampleStream.scala:44-62) consumes its own offset
    p1 = clean_write_industry_code_first2(spark, root)
    assert p1["rows"] == 140  # fresh consumer sees both generation batches
    f2 = LakeTable(spark, os.path.join(root, "industry_code_first2")).read()
    row = f2.first()
    assert row.district_code_first2 == row.district_code.upper()[:2]
