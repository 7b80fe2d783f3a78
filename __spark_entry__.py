"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse/tokenize query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see
privacy_crawler_parser_tokenizer_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full parse/tokenize pipeline over sf0.001
    documents (HTML->spans->sentences->rules), corpus rule counts."""
    from pyspark.sql import functions as F

    from privacy_crawler_parser_tokenizer_spark.pipeline import parse_tokenize
    from privacy_crawler_parser_tokenizer_spark.sources.tables import (
        documents_as_rich_html,
        load_table,
    )

    docs = documents_as_rich_html(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    out = parse_tokenize(docs)
    return (
        out["rule_counts"]
        .groupBy("rule")
        .agg(F.sum("cnt").cast("long").alias("n_sentences"))
        .orderBy("rule")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from privacy_crawler_parser_tokenizer_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from privacy_crawler_parser_tokenizer_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
