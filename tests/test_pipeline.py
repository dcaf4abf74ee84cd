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
