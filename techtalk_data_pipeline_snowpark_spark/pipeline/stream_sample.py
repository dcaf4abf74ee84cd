"""SampleStream parity — UDTF generation, stream consumption, and the
computed-key EMPLOYEE_INDUSTRY join (SampleStream.scala:8-96).

The reference flow:
  1. ``generateRecordsIntoIndustryCode`` — UDTF rows appended to
     INDUSTRY_CODE (SampleStream.scala:24-31)
  2. a Snowflake stream tails INDUSTRY_CODE (SampleStream.scala:10-22)
  3. ``cleanWriteStreamToTableIndustryCodeFirst2`` — stream projection with
     ``substring(upper(districtCode), 0, 2)`` appended to
     INDUSTRY_CODE_FIRST2 (SampleStream.scala:44-62)
  4. ``industryStreamEmployee`` — EMPLOYEE joined to the stream on the
     COMPUTED key ``employee.districtCodeFirst2 ===
     substring(upper(industry.districtCode), 0, 2)`` appended to
     EMPLOYEE_INDUSTRY (SampleStream.scala:65-96) — the J2 join-on-expression
     shape.

Spark-first: "stream" = LakeTable incremental scan from the last consumed
version; the consumed offset rides in the destination table's commit
properties (same transactional shape the reference gets from Snowflake
streams — offset advances iff the write commits). The join key is computed
with the 1-based ``substring1`` shim; Catalyst plans a plain shuffled equi
join on the computed key (both sides evaluate their expression map-side —
no UDF, no driver loop), and the small generated-dimension side broadcasts
under AQE when it fits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.shims import substring1
from ..lake import LakeTable
from ..sources.udtf_source import generate_employees, generate_industries

INDUSTRY_TABLE = "industry_code"
EMPLOYEE_TABLE = "employee"
FIRST2_TABLE = "industry_code_first2"
EMPLOYEE_INDUSTRY_TABLE = "employee_industry"


def _tbl(spark: SparkSession, root: str, name: str) -> LakeTable:
    return LakeTable(spark, os.path.join(root, name))


def generate_records_into_industry_code(
    spark: SparkSession, root: str, n: int
) -> LakeTable:
    """UDTF rows appended to INDUSTRY_CODE (SampleStream.scala:24-31)."""
    df = generate_industries(spark, n)
    t = LakeTable.create(
        spark, os.path.join(root, INDUSTRY_TABLE), df.schema, if_not_exists=True
    )
    t.append(df)
    return t


def generate_records_into_employee(spark: SparkSession, root: str, n: int) -> LakeTable:
    """UDTF rows overwritten into EMPLOYEE (SampleStream.scala:33-41)."""
    df = generate_employees(spark, n)
    t = LakeTable.create(
        spark, os.path.join(root, EMPLOYEE_TABLE), df.schema, if_not_exists=True
    )
    t.overwrite(df)
    return t


def _observed(df: DataFrame):
    """Count rides the append job via Dataset.observe — no second scan per
    tick (same trick the merge/update paths use)."""
    from uuid import uuid4

    from pyspark.sql import Observation

    obs = Observation(f"tick-{uuid4().hex}")
    return df.observe(obs, F.count(F.lit(1)).alias("n")), obs


def _consume_stream(
    src: LakeTable, dest: LakeTable, offset_key: str
) -> tuple[DataFrame | None, int]:
    """New rows of ``src`` since ``dest`` last consumed (None if caught up)."""
    start_v = (
        int(dest.snapshot().properties.get(offset_key, 0)) if dest.exists() else 0
    )
    end_v = src.latest_version()
    if end_v <= start_v:
        return None, end_v
    return src.read_incremental(start_v, end_v), end_v


def clean_write_industry_code_first2(spark: SparkSession, root: str) -> dict:
    """Stream-projection tick (SampleStream.scala:44-62): new INDUSTRY_CODE
    rows projected with the computed first-2 column, appended to
    INDUSTRY_CODE_FIRST2."""
    src = _tbl(spark, root, INDUSTRY_TABLE)
    dest = _tbl(spark, root, FIRST2_TABLE)
    offset_key = f"stream.consumed.{INDUSTRY_TABLE}"
    new_rows, end_v = _consume_stream(src, dest, offset_key)
    if new_rows is None:
        return {"rows": 0, "skipped": True}
    out = new_rows.select(
        substring1(F.upper(F.col("district_code")), 0, 2).alias("district_code_first2"),
        "district_code",
        "industry_code",
        "industry_name",
    )
    if not dest.exists():
        dest = LakeTable.create(spark, os.path.join(root, FIRST2_TABLE), out.schema)
    out, obs = _observed(out)
    res = dest.append(out, properties={offset_key: end_v})
    return {"rows": int(obs.get.get("n") or 0), "version": res.version}


def industry_stream_employee(spark: SparkSession, root: str) -> dict:
    """The J2 computed-key join tick (SampleStream.scala:65-96):
    EMPLOYEE ⋈ new INDUSTRY_CODE rows on
    ``employee.district_code_first2 == substring1(upper(district_code),0,2)``
    appended to EMPLOYEE_INDUSTRY; the stream offset commits with the
    append (exactly-once effects, duplicate ticks are no-ops)."""
    emp_t = _tbl(spark, root, EMPLOYEE_TABLE)
    src = _tbl(spark, root, INDUSTRY_TABLE)
    dest = _tbl(spark, root, EMPLOYEE_INDUSTRY_TABLE)
    offset_key = f"stream.consumed.{INDUSTRY_TABLE}"
    new_rows, end_v = _consume_stream(src, dest, offset_key)
    if new_rows is None:
        return {"rows": 0, "skipped": True}
    emp = emp_t.read().alias("e")
    ind = new_rows.alias("i")
    joined = emp.join(
        ind,
        F.col("e.district_code_first2")
        == substring1(F.upper(F.col("i.district_code")), 0, 2),
    ).select("e.*", "i.industry_code", "i.industry_name", "i.district_code")
    if not dest.exists():
        dest = LakeTable.create(
            spark, os.path.join(root, EMPLOYEE_INDUSTRY_TABLE), joined.schema
        )
    joined, obs = _observed(joined)
    res = dest.append(joined, properties={offset_key: end_v})
    return {"rows_appended": int(obs.get.get("n") or 0), "version": res.version}
