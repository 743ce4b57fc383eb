"""CASE-expression bucketing / decode transforms (SURVEY.md §2.3 P9).

The reference's DimUserInfoApp computes an ``age_group`` bucket from
birthday with a gender override (0-18 少年 / 19-40 青年 / else 老年;
gender F forces 永远18岁 — DimUserInfoApp.scala:55-82) and decodes gender
F→女 else 男 (:77-82).  The operator is a chained ``when/otherwise``
column expression — pure codegen, no UDF.

Testdata mapping: customer plays user_info (FIXTURES.md §5).  The bucket
source is ``c_acctbal`` (customer has no birthday) and the override key is
``c_mktsegment`` — same expression shape, same override-precedence
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tier_bucket(balance: Column, segment: Column) -> Column:
    """3-way bucket with an override branch taking precedence, mirroring
    the gender-override-age precedence of DimUserInfoApp.scala:65-82."""
    return (
        F.when(segment == "AUTOMOBILE", F.lit("vip"))
        .when(balance < 0, F.lit("debt"))
        .when(balance < 5000, F.lit("standard"))
        .otherwise(F.lit("premium"))
    )


def decode_segment(segment: Column) -> Column:
    """Binary decode mirroring gender F→女 else 男 (DimUserInfoApp.scala:77-82)."""
    return F.when(segment == "BUILDING", F.lit("B")).otherwise(F.lit("C"))


def user_dim(customer: DataFrame) -> DataFrame:
    """customer → user dim rows with derived bucket/decode columns."""
    return customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_acctbal").alias("balance"),
        tier_bucket(F.col("c_acctbal"), F.col("c_mktsegment")).alias("tier"),
        decode_segment(F.col("c_mktsegment")).alias("segment_class"),
    )
