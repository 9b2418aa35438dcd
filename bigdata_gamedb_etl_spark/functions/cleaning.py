"""Games-table cleaning functions — exact reference semantics.

The reference's core table encodes lists as stringified Python lists
(`"'Dev A', 'Dev B'"`) and keeps dates as raw strings; every quirk
below is deliberately preserved (SURVEY.md §1.1, §7.3 risk register):

- list-strings are cleaned by stripping quotes then brackets
  (reference: spark_eda.py:73,101 — two regexp_replace passes);
- `Genres` IS comma-split and exploded (reference: spark_eda.py:73);
- `Developers` is NOT split — a developer string `"Dev A, Dev B"`
  groups as ONE key, and `"Foo, Ltd."` stays intact
  (reference: spark_eda.py:101);
- year/month are string prefixes via substring, NOT date functions —
  `substring(release_date, 1, 4)` differs from `year(to_date(...))`
  for malformed rows (reference: spark_eda.py:125,466);
- the year filter is a STRING range compare `>= "2000" & <= "2024"`
  (reference: spark_eda.py:128-132);
- price/owner bins keep the reference's exact edges and labels, which
  sort LEXICOGRAPHICALLY ("$0-5" < "$10-20" < ... < "$5-10" < "免费" —
  decoded logs/final_output.log Task 1.4 order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Explicit schema for the reference's games CSV (stage2_report.md:16-28;
#: the reference infers then casts — spark_eda.py:42-46).
GAMES_SCHEMA = StructType(
    [
        StructField("AppID", LongType()),
        StructField("Name", StringType()),
        StructField("release_date", StringType()),
        StructField("clean_price", FloatType()),
        StructField("avg_owners", IntegerType()),
        StructField("Developers", StringType()),
        StructField("Genres", StringType()),
    ]
)

FREE_LABEL = "免费"


def strip_list_syntax(col: Column) -> Column:
    """Remove quotes then brackets from a stringified-list column
    (reference: spark_eda.py:73,101 — `'` first, then `[`/`]`)."""
    return F.regexp_replace(F.regexp_replace(col, "'", ""), r"[\[\]]", "")


def genres_array(col: Column) -> Column:
    """Genres: strip list syntax, split on comma, trim each token
    (IS split — reference: spark_eda.py:73-74)."""
    # NB: an explicit one-arg lambda — passing F.trim directly makes
    # transform() feed the element index into trim's trim-chars param.
    return F.transform(F.split(strip_list_syntax(col), ","), lambda g: F.trim(g))


def developer_key(col: Column) -> Column:
    """Developers: strip list syntax + trim ONLY — never comma-split
    (reference: spark_eda.py:101; `"Foo, Ltd."` stays one key)."""
    return F.trim(strip_list_syntax(col))


def year_str(col: Column) -> Column:
    """Year as the first 4 chars of the raw date string
    (reference: spark_eda.py:125)."""
    return F.substring(col, 1, 4)


def month_str(col: Column) -> Column:
    """Month as chars 6-7 of the raw date string
    (reference: spark_eda.py:466)."""
    return F.substring(col, 6, 2)


def in_reference_year_range(col: Column) -> Column:
    """The reference's STRING-compare year filter
    (reference: spark_eda.py:128-132)."""
    y = year_str(col)
    return col.isNotNull() & (col != "") & (y >= "2000") & (y <= "2024")


def revenue(price: Column, owners: Column) -> Column:
    """Derived revenue (reference: spark_eda.py:49); null price/owners
    propagate to null revenue, which aggregates then skip while
    COUNT(*) still counts the row — preserved semantics."""
    return price * owners


def price_category(price: Column) -> Column:
    """Reference price bins, exact edges and labels
    (reference: spark_eda.py:161-166)."""
    return (
        F.when(price == 0, FREE_LABEL)
        .when(price < 5, "$0-5")
        .when(price < 10, "$5-10")
        .when(price < 20, "$10-20")
        .when(price < 40, "$20-40")
        .otherwise("$40+")
    )


def owners_range(owners: Column) -> Column:
    """Reference owner-count bins, exact edges
    (reference: spark_eda.py:497-503)."""
    return (
        F.when(owners < 10_000, "0-1万")
        .when(owners < 50_000, "1-5万")
        .when(owners < 150_000, "5-15万")
        .when(owners < 500_000, "15-50万")
        .when(owners < 2_000_000, "50-200万")
        .otherwise("200万+")
    )


def with_derived(games: DataFrame) -> DataFrame:
    """Ingest layer: attach the derived/cleaned columns once
    (the reference recomputes them per query; same semantics)."""
    return (
        games.withColumn("revenue", revenue(F.col("clean_price"), F.col("avg_owners")))
        .withColumn("genres_arr", genres_array(F.col("Genres")))
        .withColumn("developer", developer_key(F.col("Developers")))
        .withColumn("release_year", year_str(F.col("release_date")))
        .withColumn("release_month", month_str(F.col("release_date")))
    )
