"""DAG orchestrator — parity with the reference's pipeline framework.

Reference semantics (tt-dps-common pipeline/package.scala:5-78,
Operation.scala:6-32, Pipeline.scala:6-24):
- named Operation nodes composed with ``>>`` (downstream edges)
- ``flatten`` walks children depth-first collecting (depth, node)
  (pipeline/package.scala:46-60)
- ``maxDeptPerNode`` dedups each node to its *deepest* occurrence and sorts
  ascending (pipeline/package.scala:62-67)
- ``evaluate()`` runs nodes sequentially in that order
  (pipeline/package.scala:69-71)
- ``Pipeline.asContinuous(interval)`` re-runs forever (Pipeline.scala:9-19).
  NB: the reference sleeps ``interval.toSeconds`` *milliseconds* — a unit
  bug (SURVEY.md §2.11); we sleep the actual interval.

Driver-side orchestration only — each node's body is a Spark job, so the
"engine" parallelism lives in the cluster, not in this scheduler. Nodes at
equal depth are independent by construction; ``parallel=True`` runs each
depth level in a thread pool (Spark's scheduler interleaves their jobs).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


class Operation:
    """A named pipeline node wrapping a callable (Operation.scala:6-32)."""

    def __init__(self, name: str, fn: Callable[[], object]):
        self.name = name
        self.fn = fn
        self.downstream: list[Operation] = []

    def __rshift__(self, other: "Operation | list[Operation]"):
        """``a >> b`` wires b downstream of a (pipeline/package.scala:24-33)."""
        if isinstance(other, list):
            self.downstream.extend(other)
        else:
            self.downstream.append(other)
        return other

    def execute(self):
        return self.fn()

    def __repr__(self):
        return f"Operation({self.name})"


def flatten(roots: list[Operation]) -> list[tuple[int, Operation]]:
    """Depth-first (depth, node) pairs — pipeline/package.scala:46-60."""
    out: list[tuple[int, Operation]] = []

    def walk(node: Operation, depth: int):
        out.append((depth, node))
        for child in node.downstream:
            walk(child, depth + 1)

    for r in roots:
        walk(r, 0)
    return out


def max_depth_per_node(pairs: list[tuple[int, Operation]]) -> list[tuple[int, Operation]]:
    """Keep each node at its deepest occurrence, ascending order —
    pipeline/package.scala:62-67 (a duplicate node runs once, after all its
    upstream dependents)."""
    best: dict[int, tuple[int, Operation]] = {}
    for depth, node in pairs:
        key = id(node)
        if key not in best or depth > best[key][0]:
            best[key] = (depth, node)
    return sorted(best.values(), key=lambda t: t[0])


class DAG:
    def __init__(self, roots: list[Operation]):
        self.roots = roots

    def ordered(self) -> list[tuple[int, Operation]]:
        return max_depth_per_node(flatten(self.roots))

    def evaluate(self, parallel: bool = False) -> dict[str, object]:
        """Run nodes in depth order (pipeline/package.scala:69-71); with
        parallel=True, nodes sharing a depth run concurrently."""
        results: dict[str, object] = {}
        if not parallel:
            for _, node in self.ordered():
                results[node.name] = node.execute()
            return results
        by_depth: dict[int, list[Operation]] = {}
        for d, node in self.ordered():
            by_depth.setdefault(d, []).append(node)
        for d in sorted(by_depth):
            nodes = by_depth[d]
            if len(nodes) == 1:
                results[nodes[0].name] = nodes[0].execute()
            else:
                with ThreadPoolExecutor(max_workers=len(nodes)) as ex:
                    futs = {n.name: ex.submit(n.execute) for n in nodes}
                    for name, f in futs.items():
                        results[name] = f.result()
        return results


class Pipeline:
    """Pipeline.scala:6-24 parity; continuous mode = micro-batch driver
    loop with a correct sleep (the reference's seconds-as-millis bug is
    deliberately not replicated)."""

    def __init__(self, dag: DAG):
        self.dag = dag

    def evaluate(self, parallel: bool = False):
        return self.dag.evaluate(parallel=parallel)

    def as_continuous(self, interval_seconds: float, max_iterations: int | None = None):
        return ContinuousPipeline(self.dag, interval_seconds, max_iterations)


class ContinuousPipeline:
    def __init__(self, dag: DAG, interval_seconds: float, max_iterations: int | None):
        self.dag = dag
        self.interval_seconds = interval_seconds
        self.max_iterations = max_iterations

    def evaluate(self, parallel: bool = False):
        i = 0
        out = []
        while True:
            start = time.time()
            out.append(self.dag.evaluate(parallel=parallel))
            i += 1
            if self.max_iterations is not None and i >= self.max_iterations:
                return out
            elapsed = time.time() - start
            if elapsed < self.interval_seconds:
                time.sleep(self.interval_seconds - elapsed)
