"""Python UDTF surface (Spark 4; SURVEY.md §2.11).

The engine's user-extension surface for table functions: a Python UDTF
invoked via LATERAL. The built-in example emits positional token bigrams —
the row-generating twin of dedup.word_shingles, so it is oracle-checkable
against the pure-SQL implementation. Arrow-optimized UDTFs batch rows like
pandas UDFs; this is still the slow path relative to ``explode`` +
expressions and exists for semantics the built-ins cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, bigram string")
class BigramsUDTF:
    """Emit (position, 'tok_i tok_i+1') for whitespace tokens of a text."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        toks = text.lower().split()
        for i in range(len(toks) - 1):
            yield i, toks[i] + " " + toks[i + 1]


def register(spark: SparkSession) -> None:
    spark.udtf.register("bigrams_udtf", BigramsUDTF)


def bigrams_lateral(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """id × LATERAL bigrams_udtf(text) → (id, pos, bigram)."""
    spark = df.sparkSession
    register(spark)
    df.createOrReplaceTempView("_udtf_src")
    return spark.sql(
        f"SELECT {id_col}, t.pos, t.bigram "
        f"FROM _udtf_src, LATERAL bigrams_udtf({text_col}) t"
    )
