"""Fluent library API — entry point (c) of SURVEY.md §3.3: the
programmatic surface a user of the reference switches to.

    from etl_capnz_spark.pipeline import Pipeline

    fc = (
        Pipeline.from_feed(spark, "/data/cap_snapshots")
        .active(now="2026-08-14 00:00:00")
        .to_features()
        .to_feature_collection()
    )

Each step returns a new Pipeline wrapping a lazily-built DataFrame —
nothing executes until a sink/action method — so the whole chain is ONE
Catalyst plan (filters push into the parse, columns prune into the
scan). ``df`` exposes the underlying DataFrame at any stage for users
who want to drop down to raw Spark.

Stage mapping to the reference's control() (task.ts:598-885):
``from_feed`` = fetch+parse (stages 2-4 of §3.3), ``active`` = the
required-field + expiry filters, ``to_features`` = the geometry branch
+ feature construction, ``to_feature_collection``/``submit`` = stage 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Pipeline:
    """Immutable fluent wrapper; every method returns a NEW Pipeline."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- sources ---------------------------------------------------------

    @classmethod
    def from_feed(
        cls, spark: SparkSession, snapshot_dir: str, per_line: bool = False
    ) -> "Pipeline":
        """Landed CAP XML snapshot dir → parsed alert rows (X1 + T8 error
        isolation + timestamp derivation).

        Default reads one DOCUMENT per FILE (``wholetext`` — real CAP
        snapshots are multi-line XML; line-splitting them would silently
        yield zero parsed alerts under T8 error isolation, ADVICE r3).
        ``per_line=True`` reads one document per line (compact JSONL-style
        landings; also the scalable layout — wholetext makes one task per
        file, fine for snapshot dirs of thousands of files, wrong for a
        handful of concatenated multi-GB archives)."""
        from pyspark.sql import functions as F

        from etl_capnz_spark.sources.xml import parse_cap_xml, with_timestamps

        raw = spark.read.text(
            snapshot_dir, wholetext=not per_line
        ).withColumnRenamed("value", "xml")
        if not per_line:
            # wholetext keeps trailing newlines; the parser trims per-doc
            raw = raw.select(F.trim(F.col("xml")).alias("xml"))
        return cls(with_timestamps(parse_cap_xml(raw)))

    @classmethod
    def from_alerts(cls, alerts: DataFrame) -> "Pipeline":
        """Start from an already-materialized alert table."""
        return cls(alerts)

    # -- transforms ------------------------------------------------------

    def active(self, now: str) -> "Pipeline":
        """T5 required-field filter + T6 expiry filter at ``now``."""
        from etl_capnz_spark.operators.extract import (
            active_filter,
            required_filter,
        )

        return Pipeline(active_filter(required_filter(self._df), now))

    def deduplicated(self, jaccard: float = 0.85) -> "Pipeline":
        """MinHash-LSH near-dup removal over the alert text (flagship
        entry() chain): candidates → exact-Jaccard verify → connected
        components → keep one representative per cluster."""
        from pyspark.sql import functions as F

        from etl_capnz_spark.operators.dedup import (
            connected_components,
            lsh_candidates,
            minhash_signatures,
            word_shingles,
        )

        alerts = self._df
        docs = alerts.select(
            F.col("k").alias("doc_id"),
            F.concat_ws(
                " ", "headline", "description", "instruction"
            ).alias("text"),
        )
        sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
        pairs = lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4)
        sh = docs.select(
            "doc_id",
            F.array_distinct(word_shingles(F.col("text"))).alias("sh"),
        )
        a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("_sa"))
        b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("_sb"))
        inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
        union = F.size(F.array_union(F.col("_sa"), F.col("_sb")))
        verified = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .filter(
                (union > 0)
                & (inter.cast("double") / union.cast("double") >= jaccard)
            )
            .select("id_a", "id_b")
        )
        losers = (
            connected_components(verified)
            .filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias("k"))
        )
        return Pipeline(alerts.join(losers, "k", "left_anti"))

    def to_features(self) -> "Pipeline":
        """G1-G5 + F1-F3 + C1-C9 feature fan-out."""
        from etl_capnz_spark.operators.features import build_features

        return Pipeline(build_features(self._df))

    # -- escapes & sinks -------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    def to_feature_collection(self) -> str:
        """S4: the reference-shape single FeatureCollection document."""
        from etl_capnz_spark.sinks.geojson import feature_collection_json

        return feature_collection_json(self._df)

    def write_ndjson(self, path: str, partitions: int | None = None) -> None:
        """Scalable sink: newline-delimited Feature JSON directory."""
        from etl_capnz_spark.sinks.geojson import write_features

        write_features(self._df, path, partitions)

    def submit(self, url: str, retries: int = 3) -> int:
        """S4 HTTP submit (the reference's ``this.submit``); returns the
        HTTP status. Raises on exhausted retries."""
        from etl_capnz_spark.sinks.submit import post_json

        status, _, err = post_json(
            url, self.to_feature_collection(), retries=retries
        )
        if err:
            raise RuntimeError(f"submit failed after {retries} retries: {err}")
        return status
