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


class SplitFixedUDTF:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()`` API): output schema is
    computed at ANALYSIS time from the constant ``n`` argument —
    ``split_fixed(text, 3)`` emits columns c0..c2. The dynamic-schema
    half of the UDTF surface (BigramsUDTF covers the static half);
    the wide-format explode every ragged-text → fixed-columns ingest
    needs."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None or not isinstance(n.value, int) or n.value < 1:
            raise ValueError("split_fixed(text, n): n must be a constant int >= 1")
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"c{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        toks = (text or "").split()
        yield tuple(toks[i] if i < len(toks) else None for i in range(n))


def register_split_fixed(spark: SparkSession) -> None:
    spark.udtf.register("split_fixed", udtf(SplitFixedUDTF))


def split_fixed_lateral(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """id × LATERAL split_fixed(text, n) → (id, c0..c{n-1})."""
    spark = df.sparkSession
    register_split_fixed(spark)
    df.createOrReplaceTempView("_udtf_splitfix_src")
    return spark.sql(
        f"SELECT {id_col}, t.* "
        f"FROM _udtf_splitfix_src, LATERAL split_fixed({text_col}, {int(n)}) t"
    )
