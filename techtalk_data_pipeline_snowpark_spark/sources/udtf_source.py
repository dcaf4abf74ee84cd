"""Table-function (UDTF) row sources — parity with the reference's
row-generating UDTFs (S6 in SURVEY.md §2.1).

Reference: ``GenerateIndustriesUDT`` / ``GenerateEmployeesUDT`` subclass
``UDTF1[Int]`` — ``process(n)`` yields n random rows, registered with
``session.udtf.registerTemporary`` and invoked as a table function
(udfs/package.scala:47-76; used SampleStream.scala:27-41,
SampleCrud.scala:10-11,39-42).

Spark-first: PySpark 4 Python UDTFs (``@udtf``) give the same call shape
(``SELECT * FROM generate_industries(10)``). Determinism: the reference
uses ``scala.util.Random`` (unseeded); we derive values from a hash of the
row index so results are stable across partitions/retries — same shape,
reproducible.

Scale note: a Python UDTF runs its ``eval`` on a single executor slot per
invocation — fine for dimension-sized generation (the reference generates
10-1000 rows). For bulk fact generation use the distributed generators in
``fixtures/generators.py`` (spark.range + JVM expressions).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import lit, udtf

_DISTRICTS = ["MILANO", "ROMA", "TORINO", "NAPOLI", "BARI", "GENOVA", "VENEZIA", "BOLOGNA"]
_INDUSTRIES = ["FOOD", "TECH", "RETAIL", "ENERGY", "FINANCE", "HEALTH"]
_NAMES = ["ANNA", "BRUNO", "CARLA", "DARIO", "ELENA", "FABIO", "GIULIA", "HUGO"]


def _h(i: int, salt: str, mod: int) -> int:
    d = hashlib.sha256(f"{salt}|{i}".encode()).digest()
    return int.from_bytes(d[:8], "big") % mod


@udtf(returnType="industry_code: string, industry_name: string, district_code: string")
class GenerateIndustries:
    """process(n) → n industry rows (udfs/package.scala:47-55 parity)."""

    def eval(self, n: int):
        for i in range(n):
            ind = _INDUSTRIES[_h(i, "ind", len(_INDUSTRIES))]
            dist = _DISTRICTS[_h(i, "dist", len(_DISTRICTS))]
            yield (f"IND{_h(i, 'code', 9000) + 1000}", ind, dist)


@udtf(
    returnType="employee_id: bigint, employee_name: string, district_code_first2: string"
)
class GenerateEmployees:
    """process(n) → n employee rows (udfs/package.scala:57-65 parity)."""

    def eval(self, n: int):
        for i in range(n):
            dist = _DISTRICTS[_h(i, "edist", len(_DISTRICTS))]
            yield (i, _NAMES[_h(i, "nm", len(_NAMES))], dist[:2])


def register_generators(spark: SparkSession) -> None:
    """registerTemporary parity (udfs/package.scala:67-76): makes the
    generators callable from SQL as table functions."""
    spark.udtf.register("generate_industries", GenerateIndustries)
    spark.udtf.register("generate_employees", GenerateEmployees)


def generate_industries(spark: SparkSession, n: int) -> DataFrame:
    """session.tableFunction(TableFunction("GENERATE_INDUSTRIES"), lit(n))
    parity — SampleStream.scala:27-31."""
    return GenerateIndustries(lit(n))


def generate_employees(spark: SparkSession, n: int) -> DataFrame:
    return GenerateEmployees(lit(n))
