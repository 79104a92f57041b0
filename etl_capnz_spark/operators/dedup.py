"""Deduplication operators (north-star extension, SURVEY.md §2.12).

All hashing uses ``md5`` (identical output in Spark and DuckDB, so every
stage is oracle-checkable) — at production scale you would swap in
``xxhash64`` for speed; the structure is unchanged.

Scale design:

* exact_dedup — hash-groupBy on a 128-bit content hash: one shuffle of
  (hash, id), no text movement if ``payload_cols`` are pruned. The
  window-function form keeps the FIRST row per group deterministically
  (min id), which survives at any scale because the partition key is the
  hash itself.
* MinHash LSH — per-row signature computation is embarrassingly parallel
  (no shuffle); candidate generation shuffles only (band_key → id), i.e.
  O(bands × rows) small tuples, never the documents. The band join is a
  self-equi-join on band_key, which AQE turns into a skew-aware shuffle
  join if one bucket is hot (all-identical corpora).
* simhash — 16-bit signature via per-bit majority vote over token hashes;
  near-dup candidates are rows whose signatures differ in ≤ k bits
  (checked with bit_count(xor)); grouping by signature prefix buckets the
  comparison space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import engine_checkpoint


def content_hash(col: Column) -> Column:
    """128-bit content hash of a string column (md5 hex)."""
    return F.md5(col)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row per distinct ``text_col`` — the min ``id_col``.

    Equivalent to ``row_number() over (partition by md5(text) order by id)
    = 1`` — deterministic, unlike ``dropDuplicates`` which keeps an
    arbitrary row.
    """
    w = Window.partitionBy(content_hash(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def word_shingles(col: Column, n: int = 2) -> Column:
    """n-word shingles of a text column as an array<string>; empty for
    texts with fewer than ``n`` tokens.

    The short-text guard must be an explicit ``when``: Spark's
    ``sequence(1, 0)`` DESCENDS to ``[1, 0]`` (step defaults to -1 when
    start > stop) while DuckDB's ``generate_series(1, 0)`` is empty — an
    unguarded expression silently manufactures phantom shingles for
    1-token docs in one engine only (caught round 4 by the bigram-LM
    tests; the sf corpora have no such docs, so contract hashes are
    unchanged)."""
    toks = _tokens(col)
    idx = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def _hash32(col: Column) -> Column:
    """First 32 bits of md5 as a bigint (dialect-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# Universal-hash family over one base hash per shingle: h_i(x) = (a_i·x +
# b_i) mod 2^52, with x the first 52 md5 bits. One md5 per shingle instead
# of one per (shingle, seed) — 8× less hashing for an 8-hash signature —
# and a_i·x stays < 2^63 so the arithmetic is overflow-free (ANSI-safe)
# and bit-identical in the DuckDB oracle.
_MH_MOD = 1 << 52


def _mh_coeffs(seed: int) -> tuple[int, int]:
    return 2 * seed + 1, seed * 97531 + 12345


def _base_hash52(col: Column) -> Column:
    """First 52 bits (13 hex chars) of md5 as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("bigint")


def _mixer(a: int, b: int):
    # closure factory: a 1-arg lambda for F.transform (extra defaulted
    # params would change the lambda's arity — see the HOF-index pitfall)
    return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(_MH_MOD)


def minhash_signature(col: Column, num_hashes: int = 8) -> list[Column]:
    """MinHash signature columns: min over shingles of the hash family.

    NB: each signature column's expression tree repeats the base-hash
    computation; prefer :func:`minhash_signatures`, which let-binds the
    base array in a separate projection so md5 runs once per shingle.
    """
    base = F.transform(word_shingles(col), _base_hash52)
    return [
        F.array_min(F.transform(base, _mixer(*_mh_coeffs(s)))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature (id, mh0..mh{n-1}).

    Two value-identical shapes (min is duplicate- and order-
    insensitive; ``explode_outer`` keeps shingle-less docs as one NULL
    row → NULL signatures, exactly ``array_min`` over an empty
    transform):

    * ``hof`` (default, r9): narrow array-HOF pipeline, no shuffle;
    * ``agg`` (SPARK_GRAFT_MH_IMPL=agg): explode + ONE hash aggregate
      of the 8 family minimums — md5/conv/mixers run in whole-stage
      codegen instead of interpreted lambdas, at the cost of one hash
      exchange of (id, 8×8 B) per doc (map-side partial mins collapse
      the exploded rows first).

    MEASURED (r10 interleaved A/B ×2 windows, sf0.1): the two shapes
    trade ±0.2 s on dedup_lsh_capped/dedup_minhash with the SIGN
    flipping between windows — the md5 hashing dominates both forms, so
    the codegen gain ≈ the exchange cost at this SF (VERDICT r9 #9's
    question answered: the 96-task signature stage is minhash CPU, not
    window sort). The narrow no-shuffle form stays default — at 100 TB
    an avoided exchange beats a same-CPU codegen swap.
    """
    import os as _os

    if _os.environ.get("SPARK_GRAFT_MH_IMPL", "hof") == "hof":
        staged = df.select(
            id_col,
            F.transform(
                word_shingles(F.col(text_col)), _base_hash52
            ).alias("_mh_base"),
        )
        return staged.select(
            id_col,
            *[
                F.array_min(
                    F.transform(F.col("_mh_base"), _mixer(*_mh_coeffs(s)))
                ).alias(f"mh{s}")
                for s in range(num_hashes)
            ],
        )
    ex = df.select(
        id_col,
        F.explode_outer(word_shingles(F.col(text_col))).alias("_sh"),
    ).select(id_col, _base_hash52(F.col("_sh")).alias("_x"))
    return ex.groupBy(id_col).agg(
        *[
            F.min(_mixer(*_mh_coeffs(s))(F.col("_x"))).alias(f"mh{s}")
            for s in range(num_hashes)
        ]
    )


def band_keys(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    with_sig: bool = False,
) -> DataFrame:
    """(id, band_key) rows: each signature emits its ``bands`` band keys
    via ONE array+explode (a per-band union would re-execute the signature
    pipeline once per band).

    ``with_sig=True`` adds a ``sig_key`` column (the FULL signature as one
    string) used by the hot-bucket refinement in :func:`lsh_candidates` —
    rows that collide on a band but differ anywhere in the signature can
    then be split apart without recomputing hashes.
    """
    rows_per_band = num_hashes // bands
    keys = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        keys.append(
            F.concat_ws(
                ":", F.lit(str(b)), *[F.col(c).cast("string") for c in cols]
            )
        )
    out = [F.col(id_col).alias("id"), F.explode(F.array(*keys)).alias("band_key")]
    if with_sig:
        out.append(
            F.concat_ws(
                ":", *[F.col(f"mh{s}").cast("string") for s in range(num_hashes)]
            ).alias("sig_key")
        )
    return sig_df.select(*out)


def lsh_candidates(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (id_a < id_b).

    Single-pass shape: band keys from ONE array+explode (``band_keys``),
    then a self-equi-join on band_key. Both join sides are the identical
    plan shuffled on the same key, so Spark materializes ONE exchange and
    reuses it (ReusedExchange) — the signature computation runs once, and
    only (band_key, id) tuples ever shuffle, never documents.

    ``max_bucket`` caps hot band buckets (the 100 TB template-corpus
    hazard: one band bucket of size B otherwise emits B² candidate
    pairs). Two-level scheme, correctness backstopped by the downstream
    exact-verify stage:

    1. **Refine**: buckets over the cap are split by the FULL signature
       (``band_key # sig_key``) — docs that collided on one band but
       differ anywhere else in the signature separate, so
       template-*variety* buckets shatter into small cold buckets. The
       recall trade-off is explicit: a true near-dup pair with different
       full signatures inside a hot band survives only via one of its
       other (non-hot) bands — the standard production trade
       (super-shingling / second-level banding).
    2. **Star**: a refined bucket STILL over the cap means B docs with
       byte-identical signatures (in practice: identical or
       near-identical text). All-pairs there is pure waste — connected
       components merges the cluster either way — so each doc pairs with
       the bucket's min id only: B−1 pairs instead of B(B−1)/2, and the
       exact-verify stage checks each member against that representative.

    Per-bucket emission is thus ≤ max(max_bucket², B−1) — linear in the
    bucket, never quadratic. Both count aggregations and the joins hash
    on the (refined) band key, so no new shuffle shape is introduced.
    Default ``None`` preserves the exact uncapped pair set.
    """
    if max_bucket is None:
        # lazy localCheckpoint: the planner broadcasts one arm of the
        # self-join (banded is small), so the hoped-for ReusedExchange
        # never forms and the md5-heavy signature pipeline executed
        # TWICE (r9 plan sweep: 6 parquet scans in dedup_minhash).
        # Checkpointing materializes (id, band_key) tuples once; both
        # join arms read the checkpointed RDD. Same device as the
        # capped branch below.
        banded = engine_checkpoint(
            band_keys(sig_df, id_col, num_hashes, bands), eager=False
        )
        left = banded.alias("l")
        right = banded.alias("r")
        return (
            left.join(right, "band_key")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
    # Window form, not count-aggregate + join-back: the signature pipeline
    # is md5-heavy, and a join-based plan re-evaluates it once per join
    # arm. Windows keep ONE lineage — shuffle on band_key, count in place,
    # shuffle on bkey, count in place — and the final self-join on bkey
    # sees two identical subplans, so the exchange is computed once and
    # reused (ReusedExchange).
    banded = band_keys(sig_df, id_col, num_hashes, bands, with_sig=True)
    w1 = Window.partitionBy("band_key")
    refined = banded.withColumn("_bc", F.count(F.lit(1)).over(w1)).select(
        "id",
        F.when(
            F.col("_bc") > max_bucket,
            F.concat_ws("#", F.col("band_key"), F.col("sig_key")),
        )
        .otherwise(F.col("band_key"))
        .alias("bkey"),
    )
    w2 = Window.partitionBy("bkey")
    # lazy localCheckpoint: r2 feeds three consumers (clique left/right,
    # star) and exchange reuse does not survive AQE's per-arm replanning
    # here — without it the md5-heavy signature lineage runs 3×. Same
    # device as connected_components; materialized size is O(bands × rows)
    # compact tuples on executor-local storage.
    r2 = engine_checkpoint(
        refined.withColumn("_c2", F.count(F.lit(1)).over(w2)).withColumn(
            "_rep", F.min("id").over(w2)
        ),
        eager=False,
    )
    cold = r2.filter(F.col("_c2") <= max_bucket).select("id", "bkey")
    clique = (
        cold.alias("l")
        .join(cold.alias("r"), "bkey")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
    star = (
        r2.filter((F.col("_c2") > max_bucket) & (F.col("id") > F.col("_rep")))
        .select(F.col("_rep").alias("id_a"), F.col("id").alias("id_b"))
    )
    return clique.unionByName(star).distinct()


def lsh_cross_candidates(
    sig_new: DataFrame,
    sig_base: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int | None = None,
    base_is_keys: bool = False,
) -> DataFrame:
    """Cross-corpus LSH: candidate (new_id, base_id) pairs between an
    incoming corpus and an existing one — the "dedupe the new crawl
    against everything already ingested" pass, run before the new data is
    admitted (CCNet/RefinedWeb-style incremental hygiene).

    Same banding as :func:`lsh_candidates`, but the equi-join is
    two-sided instead of a self-join, so the candidate space is
    new × base within a band — never new × new (intra-new dups are the
    ordinary ``lsh_candidates`` pass) and never all-pairs. At 100 TB the
    base side's band keys are precomputed and bucketed on band_key at
    ingest time, so admitting a batch shuffles only the BATCH's keys.

    ``max_bucket`` caps hot BASE-side buckets (the base corpus is the
    huge side; a template cluster of B base docs otherwise multiplies
    every colliding new doc by B). Same two-level scheme as
    :func:`lsh_candidates`: base buckets over the cap are refined by full
    signature on BOTH sides (so only signature-identical new docs still
    reach the hot cluster), and a refined base cluster still over the cap
    is represented by its min base_id — each new doc pairs with ONE
    representative, which is the actual decision ("is this new doc a dup
    of something ingested?") at 1/B the volume.

    ``base_is_keys=True`` takes ``sig_base`` as a PRECOMPUTED band-key
    table — (id, band_key[, sig_key]) rows, the persisted-index shape
    :func:`streaming.stream.incremental_neardup_sink` maintains — so
    probing a batch reads the index instead of recomputing base
    signatures (the "band keys precomputed and bucketed at ingest time"
    scale path promised above). With ``max_bucket`` the index must
    carry ``sig_key`` (``band_keys(..., with_sig=True)``).
    """
    if max_bucket is None:
        n = band_keys(sig_new, id_col, num_hashes, bands).withColumnRenamed(
            "id", "new_id"
        )
        b = (
            sig_base.select("id", "band_key")
            if base_is_keys
            else band_keys(sig_base, id_col, num_hashes, bands)
        ).withColumnRenamed("id", "base_id")
        return n.join(b, "band_key").select("new_id", "base_id").distinct()
    # One union lineage with a side tag (window form — see the comment in
    # lsh_candidates): base-row counts come from SUM(is_base) windows over
    # band_key then bkey, so neither side's signature pipeline is
    # re-evaluated, and the final cold join's two arms share one exchange.
    n = band_keys(sig_new, id_col, num_hashes, bands, with_sig=True)
    b = (
        sig_base.select("id", "band_key", "sig_key")
        if base_is_keys
        else band_keys(sig_base, id_col, num_hashes, bands, with_sig=True)
    )
    u = n.withColumn("_side", F.lit("n")).unionByName(
        b.withColumn("_side", F.lit("b"))
    )
    is_base = F.when(F.col("_side") == "b", 1).otherwise(0)
    w1 = Window.partitionBy("band_key")
    refined = u.withColumn("_bc", F.sum(is_base).over(w1)).select(
        "id",
        "_side",
        F.when(
            F.col("_bc") > max_bucket,
            F.concat_ws("#", F.col("band_key"), F.col("sig_key")),
        )
        .otherwise(F.col("band_key"))
        .alias("bkey"),
    )
    w2 = Window.partitionBy("bkey")
    # lazy localCheckpoint — see lsh_candidates: three consumers below,
    # one evaluation of the signature-heavy lineage
    r2 = engine_checkpoint(
        refined.withColumn("_c2", F.sum(is_base).over(w2)).withColumn(
            "_rep", F.min(F.when(F.col("_side") == "b", F.col("id"))).over(w2)
        ),
        eager=False,
    )
    cold_n = r2.filter(
        (F.col("_side") == "n") & (F.col("_c2") <= max_bucket)
    ).select(F.col("id").alias("new_id"), "bkey")
    cold_b = r2.filter(
        (F.col("_side") == "b") & (F.col("_c2") <= max_bucket)
    ).select(F.col("id").alias("base_id"), "bkey")
    cold = cold_n.join(cold_b, "bkey").select("new_id", "base_id")
    star = r2.filter(
        (F.col("_side") == "n")
        & (F.col("_c2") > max_bucket)
        & F.col("_rep").isNotNull()
    ).select(F.col("id").alias("new_id"), F.col("_rep").alias("base_id"))
    return cold.unionByName(star).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bucket_col: str,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity over word-bigram sets for candidate pairs.

    Pairs are generated within ``bucket_col`` groups (at scale: an LSH band
    key or length bucket), never as a global cross join.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(bucket_col).alias("bucket"),
        F.array_distinct(word_shingles(F.col(text_col))).alias("sh"),
    )
    left = base.alias("l")
    right = base.alias("r")
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def setsim_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    PPJoin/AllPairs family — Bayardo et al., WWW'07): ALL token-set pairs
    with Jaccard ≥ t, no false negatives, without the all-pairs scan.

    Prefix principle: order every set by one global total order (here:
    ascending global token frequency, rarest first, token as tie-break);
    two sets with Jaccard ≥ t MUST share at least one token among each
    side's first ``n - ceil(t·n) + 1`` tokens. So candidates come from an
    EQUI-join on prefix tokens — rare tokens generate few pairs (that's
    why frequency order beats lexicographic) — and an exact
    intersect/union verify keeps only true pairs.

    Distributed shape: token-frequency aggregate (two-phase) → per-doc
    sort by (freq, token) → prefix explode → equi-join on the prefix
    token emitting ONLY (id_a, id_b) → distinct → hash-join the two
    token-set arrays back by id for the exact verify. Candidate
    generation shuffles key pairs; full arrays move only for surviving
    candidates. The oracle states the O(n²) brute-force form — results
    are identical because prefix filtering is exact.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("_f"))
    ordered = (
        toks.join(freq, "token")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_f"), F.col("token")))
            ).alias("_st")
        )
    )
    sets = ordered.select(
        "id",
        F.transform(F.col("_st"), lambda x: x["token"]).alias("s"),
        F.size("_st").alias("n"),
    )
    prefix_len = (
        F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + F.lit(1)
    ).cast("int")
    pref = sets.select(
        "id", F.explode(F.slice("s", 1, prefix_len)).alias("ptok")
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "ptok")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    sa = sets.select(F.col("id").alias("id_a"), F.col("s").alias("_sa"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("s").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", F.round(jac, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by min-label propagation over candidate pairs.

    The dedup endgame: LSH/fingerprint candidate PAIRS become dedup GROUPS
    (every doc labelled with the min doc-id of its component), from which a
    pipeline keeps one representative per group.

    Scale design: each round is one shuffle-join of (edge → label), one
    POINTER JUMP (label ← label-of-label, a self-join of the label table
    on lbl = id — the path-doubling trick of HashToMin-style distributed
    CC), and one hash-aggregate on node id — no adjacency lists on the
    driver, no all-pairs anything. Edge propagation alone converges in
    O(diameter) rounds, which on CHAIN-shaped components (measured: the
    sf0.1 title-linkage graph has diameter ~15 → 16 rounds × ~0.4 s of
    fixed per-round cost) is the dominant entity_golden expense; the
    jump shortcuts label chains each round (measured 16 → 11 rounds on
    that graph — sub-doubling because min-labels don't form clean
    parent chains, but every shortcut is one fewer full edge-join
    round, and the advantage grows with diameter — the 100 TB story,
    where a near-linear crawl-graph chain would otherwise dominate the
    schedule). The fixpoint is unchanged (labels are
    always copies of component node ids, monotone decreasing; the
    component-min node keeps its own id, so the unique fixpoint labels
    every node with the component min). Convergence is detected by the
    monotone label sum, one extra 1-row action per round;
    ``localCheckpoint`` truncates the growing lineage so round N doesn't
    replay rounds 1..N-1.
    """
    # Checkpoints here are FLAT (flat_local_checkpoint): since
    # SPARK-39748 a plain localCheckpoint keeps the origin plan's
    # estimated stats, and in this loop round n's plan joins round
    # n-1's checkpoint — the inherited sizeInBytes estimate compounds
    # multiplicatively (~squaring per round with the jump self-join),
    # so by round ~16 (the sf0.1 title-linkage diameter) the planner
    # is multiplying BigIntegers with ~10^5-10^6 digits inside
    # SizeInBytesOnlyStatsPlanVisitor on the DRIVER, serially, once
    # per round. A second jump join (growth ~cubing) pushed that to
    # >20 min on a 12 s test (driver thread dump: BigInteger
    # .multiplyToomCook3 under Dataset.localCheckpoint planning).
    # A persist()ed sym pre-partitioned on the join key (to spare the
    # per-round edge re-shuffle, guide §2.4) was tried and REVERTED
    # for the same reason: the unmaterialized InMemoryRelation keeps
    # the full LSH-composed lineage visible to stats estimation.
    import os as _os

    from ..session import flat_local_checkpoint

    # AQE off for the LOOP only (opt r10, guide §2.4 + VERDICT r9 #4):
    # an AdaptiveSparkPlanExec reports UnknownPartitioning to the
    # checkpoint's partitioning extractor, so with AQE on every round
    # RE-SHUFFLES the label table it just materialized hash-partitioned
    # on id. With AQE off the per-round checkpoint keeps
    # hashpartitioning(id, n) (flat_local_checkpoint preserves it) and
    # the next round's join consumes it in place — the steady-state
    # round plan drops 3 exchanges → 2. AQE's value in the loop was
    # coalescing tiny shuffles; `part_adaptive` replaces that with
    # data-sized loop parallelism (below) because AQE-off alone at the
    # default partition count was A/B-measured 2.3× SLOWER at sf0.1
    # (32 near-empty tasks per exchange per round). Skew never bites
    # here: the (s = id) join's probe side has unique keys.
    #
    # MEASURED (r10 interleaved A/B, entity_golden sf0.1, same noise
    # window): aqe 7.02 / part_adaptive 7.46 / part-at-default-n 13.1 s
    # — at this SF the per-round tables are a few thousand rows, so the
    # removed exchange is worth less than the lost AQE coalescing plus
    # the sizing job, and the r9 behavior stays the DEFAULT. The
    # partitioned loop (plan-verified 3 → 2 exchanges per round) is the
    # cluster-scale option: one fewer full exchange of a NODE-SCALE
    # table per round is the §2.4 win once partitions stop being
    # near-empty. SPARK_GRAFT_CC_IMPL: aqe (default) | part_adaptive |
    # part.
    spark = edges.sparkSession
    mode = _os.environ.get("SPARK_GRAFT_CC_IMPL", "aqe")
    if mode == "aqe":
        return _cc_loop(edges, src, dst, max_iter, flat_local_checkpoint)
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    sp_was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _cc_loop(
            edges,
            src,
            dst,
            max_iter,
            flat_local_checkpoint,
            adaptive_partitions=(mode == "part_adaptive"),
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        spark.conf.set("spark.sql.shuffle.partitions", sp_was)


#: target label-table rows per loop shuffle partition (part_adaptive):
#: the per-round tables are (id, lbl) 16-byte pairs, so 2M rows ≈ 32 MB
#: partitions — small enough for in-memory hash aggregation, large
#: enough that a 10⁶-node sf0.1 graph runs the loop in a handful of
#: tasks instead of 32 near-empty ones per exchange per round.
_CC_ROWS_PER_PARTITION = 2_000_000


def _cc_loop(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    flat_local_checkpoint,
    adaptive_partitions: bool = False,
) -> DataFrame:
    spark = edges.sparkSession
    sym = flat_local_checkpoint(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        ),
        eager=False,
    )
    labels = flat_local_checkpoint(
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
    )
    if adaptive_partitions:
        # Scale-adaptive loop parallelism (guide §2.2 — AQE is off for
        # the loop so the checkpoint keeps its hash partitioning, and
        # this replaces AQE's runtime coalescing): size the per-round
        # shuffles from the MEASURED node count rather than the global
        # default. Sizing from data, not from the local core count, is
        # what keeps the same code right at 100 TB (n grows → partition
        # count grows).
        n_nodes = labels.count()
        default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n_part = max(
            1,
            min(default_p, (n_nodes + _CC_ROWS_PER_PARTITION - 1)
                // _CC_ROWS_PER_PARTITION),
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iter):
        # One join carries BOTH the edge propagation and the pointer
        # jump (opt r9, guide §2.4 — two joins/round fused into one):
        # the jump lbl ← L[L[i]] is exactly propagation along the
        # synthetic edge (lbl_i → i), so uniting those |V| pointer
        # edges with sym before the single (s = id) join yields the
        # same candidate-label multiset as the old msgs ∪ jump pair of
        # joins — per-round label tables are IDENTICAL, only the plan
        # changed (measured: 2 joins + 5 exchanges → 1 join + 3
        # exchanges per round).
        # NOTE: a DOUBLE jump (lbl <- L[L[lbl]]) was tried to shortcut
        # chains two hops per round and REVERTED on measurement: the
        # extra node-table self-joins per round cost more than the
        # saved rounds at every scale probed (entity_golden sf0.1
        # 8.0 s -> 9.5 s, test_dedup_recall 76 s -> 150 s).
        ptr = labels.select(F.col("lbl").alias("s"), F.col("id").alias("d"))
        msgs = (
            sym.unionByName(ptr)
            .join(labels, F.col("s") == labels["id"])
            .select(F.col("d").alias("id"), F.col("lbl"))
        )
        # Lazy checkpoint: the convergence-sum action below is the
        # first computation of the new label RDD, so it materializes
        # the checkpoint as a side effect — one job per round where
        # eager=True + separate agg ran two (opt r9, guide §1/§2).
        labels = flat_local_checkpoint(
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl")),
            eager=False,
        )
        new_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("id", F.col("lbl").alias("component"))


def simhash16(col: Column) -> Column:
    """16-bit SimHash over whitespace tokens.

    bit_j(signature) = 1 iff Σ_tokens (±1 by bit_j of the token hash) > 0.
    """
    toks = _tokens(col)

    def bit_merge(mask: int):
        return lambda acc, t: acc + F.when(
            _hash32(t).bitwiseAND(F.lit(mask)) > 0, 1
        ).otherwise(-1)

    bits = []
    for j in range(16):
        contrib = F.aggregate(toks, F.lit(0).cast("long"), bit_merge(1 << j))
        bits.append(F.when(contrib > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def chunk_span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 10,
) -> DataFrame:
    """C4-style global span dedup with order-preserving reassembly.

    Split each document into non-overlapping ``chunk_tokens``-token
    chunks, keep only the corpus-wide FIRST occurrence of every distinct
    chunk (ordered by doc id, then position), and stitch each document's
    surviving chunks back together in their original order. Returns
    (id, n_total, n_kept, clean_text); a document whose every chunk was
    seen earlier elsewhere disappears entirely (fully-duplicate doc).

    Scale shape: chunking is a narrow array expression. The exploded rows
    shuffle exactly TWICE on the natural keys — once on the chunk text
    (global first-occurrence winner via row_number), once on the doc id
    (ordered reassembly). No joins: the winner filter and the rebuild
    read the same exploded stream. Blank chunks are filtered before the
    first exchange so the one degenerate hot key never shuffles.
    """
    n = chunk_tokens
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
    )
    ex = (
        docs.filter(F.size(toks) > 0)
        .select(
            id_col,
            F.size(chunks).alias("n_total"),
            F.posexplode(chunks).alias("pos", "chunk"),
        )
        .filter(F.col("chunk") != "")
    )
    w = Window.partitionBy("chunk").orderBy(id_col, "pos")
    kept = ex.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
            lambda s: s["chunk"],
        ),
        " ",
    )
    return kept.groupBy(id_col, "n_total").agg(
        F.count("*").alias("n_kept"), rebuilt.alias("clean_text")
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Train/test decontamination: corpus documents sharing ≥1 word
    n-gram with any benchmark document, with the shared-gram count.

    The canonical pre-training hygiene pass (The Pile / GPT-3 style
    13-gram checks — ``n`` is a dial): benchmark docs must not leak into
    the training set via near-copies.

    Scale shape: both sides explode to (md5(ngram), id) tuples — the
    benchmark side distinct'd and typically small enough to broadcast —
    and meet in an equi-join on the hash. Document text never shuffles;
    the join carries 16-byte keys. Per-doc hit counts come from one
    hash-aggregate on the already-partitioned join output.
    """
    c_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("g"),
    ).select("doc_id", F.md5(F.col("g")).alias("gh"))
    b_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), n))
            ).alias("g")
        )
        .select(F.md5(F.col("g")).alias("gh"))
        .distinct()
    )
    return (
        c_grams.join(b_grams, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def line_dedup_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_chars: int = 30,
) -> DataFrame:
    """Corpus-wide exact LINE dedup with document reassembly
    (RefinedWeb/Gopher-style boilerplate removal).

    Every document is split on newlines; for each distinct line of
    ``min_chars`` or more characters, only its FIRST occurrence in the
    corpus (lowest ``id_col``, then lowest line number) is kept — later
    copies (nav bars, cookie banners, license footers) are dropped, and
    each document is reassembled from its surviving lines in original
    order. Lines shorter than ``min_chars`` are always kept: short lines
    collide by chance, and dropping them would mangle prose.

    Output: ``(id_col, text_col)`` with the deduplicated text (empty
    string if every line was removed) — the document set is preserved.

    Scale shape: explode → one shuffle of (16-byte line hash, doc id,
    line no) — never full lines — for the first-occurrence window, then
    one shuffle back on doc id for reassembly. Both exchanges carry
    key-sized tuples; the text moves only inside its own row. This is
    the same global-first-occurrence discipline as chunk_span_dedup, one
    granularity finer.
    """
    # NULL text must not drop the document (posexplode of NULL emits no
    # rows) — treat it as the empty document, preserving the id set
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_no", "line"),
    )
    w = Window.partitionBy(F.md5(F.col("line"))).orderBy(id_col, "line_no")
    kept = lines.withColumn(
        "_keep",
        (F.length("line") < F.lit(min_chars))
        | (F.row_number().over(w) == 1),
    )
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct(F.col("line_no"), F.col("line")),
                        )
                    )
                ),
                lambda s: s.getField("line"),
            ),
        ).alias(text_col)
    )
    return reassembled


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
) -> DataFrame:
    """All pairs of rows whose strings are within edit distance 1
    (Levenshtein ≤ 1: equal, one substitution, one insert/delete) —
    the fuzzy-match primitive for near-identical titles, URLs, and
    entity names, via DELETION-NEIGHBORHOOD blocking (FastSS / the
    SymSpell trick, symmetric-delete spelling correction's core idea):

    two strings with lev(s,t) ≤ 1 always share a member of
    D(s) = {s} ∪ {s minus one character} (substitution: delete the
    differing position from both; indel: the shorter string is a
    deletion of the longer; equality: s itself). The converse does
    NOT hold (s=ab, t=ba share "b" at distance 2), so survivors are
    verified with an exact ``levenshtein`` ≤ 1 filter — blocking
    recall is guaranteed by the theorem, precision by the verify.

    Scale shape: each string emits len+1 variants (one array +
    explode), candidates come from an EQUI-join on the variant key —
    O(Σ len) blocking rows and no CartesianProduct; only (id, string)
    pairs shuffle. Generalizes to distance k by deleting k characters
    (variant count ~ len^k — keep k small and strings short: this is
    a key/title matcher, not a document matcher).

    Output: (id_a, id_b, str_a, str_b, dist) with id_a < id_b,
    dist ∈ {0, 1}.
    """
    s = F.col(str_col)
    variants = F.array_union(
        F.array(s),
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, 1, i - 1),
                s.substr(i + 1, F.length(s)),
            ),
        ),
    )
    sides = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        F.explode(variants).alias("_v"),
    )
    a = sides.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("str_a"), "_v"
    )
    b = sides.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("str_b"), "_v"
    )
    return (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "str_a", "str_b")
        .distinct()
        .withColumn("dist", F.levenshtein("str_a", "str_b"))
        .filter(F.col("dist") <= 1)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    w: int = 4,
    n_shards: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (the classic record-linkage method,
    Hernández–Stolfo): sort the corpus once by a blocking key and emit
    each record paired with its next ``w−1`` neighbours in that order —
    O(n·w) candidates instead of O(n²), the zero-hash complement to the
    LSH/deletion-neighborhood blockers here. Callers compose an exact
    verify on the pairs, as with :func:`lsh_candidates`.

    No global one-partition window: range-partition on (key, id) —
    localCheckpoint pins the sampled partitioning across actions (the
    two-phase-rank discipline) — then the first rows of FOLLOWING
    shards are replicated backwards as lead-targets so within-shard
    ``lead()`` reproduces the global-order neighbourhood exactly. The
    copy plan comes from the per-shard counts (n_shards driver rows,
    bounded): each shard borrows rows from as many successors as it
    takes to cover w−1 — a shard smaller than the window (tiny-SF or
    skew-degenerate ranges) borrows across SEVERAL shards, the case a
    naive next-shard-only copy silently drops pairs on (observed at
    sf0.001: 50 rows over 32 range shards). Copied rows may be the B
    of a boundary pair but never anchor one — they anchor in their
    home shard. Shuffle cost: the range exchange + ≤(w−1) rows per
    shard boundary.

    Output: (id_a, id_b) with A strictly before B in (key, id) order
    and rank distance < w.
    """
    from pyspark.sql.window import Window

    staged = (
        df.select(F.col(key_col).alias("_k"), F.col(id_col).alias("_id"))
        .repartitionByRange(n_shards, F.col("_k"), F.col("_id"))
        .sortWithinPartitions("_k", "_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in staged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    order = sorted(counts)
    copies = []  # (src_pid, take_first_n_rows, target_bucket)
    for i, p in enumerate(order):
        need = w - 1
        for q in order[i + 1:]:
            if need <= 0:
                break
            take = min(counts[q], need)
            if take > 0:
                copies.append((q, take, p))
            need -= take
    win = Window.partitionBy("_pid").orderBy("_k", "_id")
    ranked = staged.withColumn("_rn", F.row_number().over(win))
    native = ranked.select(
        "_k", "_id", F.col("_pid").alias("_bucket")
    ).withColumn("_native", F.lit(True))
    if copies:
        targets = F.array_compact(
            F.array(
                *[
                    F.when(
                        (F.col("_pid") == q) & (F.col("_rn") <= take),
                        F.lit(p),
                    )
                    for q, take, p in copies
                ]
            )
        )
        borrowed = (
            ranked.select("_k", "_id", F.explode(targets).alias("_bucket"))
            .withColumn("_native", F.lit(False))
        )
        aug = native.unionByName(borrowed)
    else:
        aug = native
    bwin = Window.partitionBy("_bucket").orderBy("_k", "_id")
    lead_cols = [
        F.lead(F.col("_id"), o).over(bwin).alias(f"_b{o}")
        for o in range(1, w)
    ]
    return (
        aug.select("_id", "_native", *lead_cols)
        .filter(F.col("_native"))
        .select(
            F.col("_id").alias("id_a"),
            F.explode(
                F.array_compact(
                    F.array(*[F.col(f"_b{o}") for o in range(1, w)])
                )
            ).alias("id_b"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bucket_col: str,
    min_containment: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Directional CONTAINMENT over word-bigram sets — the excerpt/
    quote detector Jaccard structurally misses: a 50-shingle excerpt
    inside a 5000-shingle article has Jaccard ≈ 0.01 but containment
    |A∩B|/|A| = 1.0. Broder's resemblance-vs-containment distinction;
    both directions emitted so the caller knows WHICH side is the
    excerpt.

    Same candidate discipline as :func:`ngram_jaccard_pairs`: pairs
    form within ``bucket_col`` groups (LSH band / length bucket /
    planted-dup bucket at test scale), never a global cross join; the
    intersection is array arithmetic on distinct shingle sets.
    Survivors: max(containment) >= threshold.

    ``max_bucket`` caps hot buckets with the :func:`lsh_candidates`
    star discipline (the 100 TB template-corpus hazard: a quote that
    every doc carries lands them all in one bucket → B² pairs): a
    bucket over the cap pairs each member against the bucket's min-id
    representative only — B−1 pairs, real containment still computed
    per emitted pair, and the downstream connected-components merge
    recovers the cluster. Per-bucket emission ≤ max(max_bucket², B−1),
    measured in tools/skew_probe.py. Default ``None`` preserves the
    exact uncapped pair set (the oracle-checked contract entries).

    Output: (id_a, id_b, n_a, n_b, inter, cont_a_in_b, cont_b_in_a).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(bucket_col).alias("bucket"),
        F.array_distinct(word_shingles(F.col(text_col))).alias("sh"),
    )

    def _scored(pairs: DataFrame) -> DataFrame:
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        na = F.size(F.col("sh_a"))
        nb = F.size(F.col("sh_b"))
        ca = F.when(
            na > 0, inter.cast("double") / na.cast("double")
        ).otherwise(F.lit(0.0))
        cb = F.when(
            nb > 0, inter.cast("double") / nb.cast("double")
        ).otherwise(F.lit(0.0))
        return pairs.select(
            "id_a",
            "id_b",
            na.cast("bigint").alias("n_a"),
            nb.cast("bigint").alias("n_b"),
            inter.cast("bigint").alias("inter"),
            F.round(ca, 6).alias("cont_a_in_b"),
            F.round(cb, 6).alias("cont_b_in_a"),
        ).filter(
            F.greatest("cont_a_in_b", "cont_b_in_a")
            >= F.lit(float(min_containment))
        )

    if max_bucket is None:
        pairs = (
            base.alias("l")
            .join(base.alias("r"), "bucket")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"),
                F.col("l.sh").alias("sh_a"),
                F.col("r.sh").alias("sh_b"),
            )
        )
        return _scored(pairs)
    # hot-bucket star cap: count + representative in one window pass;
    # lazy localCheckpoint pins the shingle lineage (three consumers)
    w = Window.partitionBy("bucket")
    b2 = (
        base.withColumn("_c", F.count(F.lit(1)).over(w))
        .withColumn("_rep", F.min("id").over(w))
        .localCheckpoint(eager=False)
    )
    cold = b2.filter(F.col("_c") <= max_bucket).select("id", "bucket", "sh")
    clique = (
        cold.alias("l")
        .join(cold.alias("r"), "bucket")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
    )
    reps = b2.filter(
        (F.col("_c") > max_bucket) & (F.col("id") == F.col("_rep"))
    ).select("bucket", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    star = (
        b2.filter((F.col("_c") > max_bucket) & (F.col("id") > F.col("_rep")))
        .select("bucket", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
        .join(reps, "bucket")
        .select("id_a", "id_b", "sh_a", "sh_b")
    )
    return _scored(clique.unionByName(star))


def substring_span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Exact duplicated-SPAN removal across document boundaries — the
    Lee-et-al ("Deduplicating Training Data Makes Language Models
    Better") exact-substring mode, the one dedup discipline
    line/chunk/winnow/minhash/containment don't cover: any run of
    ``k`` or more tokens that occurred EARLIER in the corpus (lower
    doc id, then lower position — including earlier in the same
    document) is cut from the text; the first occurrence keeps its
    tokens.

    Exactness via overlapping shingles (the distributed stand-in for
    the single-node suffix array): every k-token window hashes to a
    shingle; a token is removed iff some NON-first-occurrence shingle
    covers it. A maximal duplicated run of length L ≥ k covers all
    its tokens with L−k+1 duplicate shingles, and a token in no
    duplicated ≥k run is covered by none — so the removed set equals
    the suffix-array answer exactly, position by position.

    Scale shape: shingling is a narrow O(n·k) expression (md5 over
    each k-slice, whole-stage codegen; the CPU-side amplification is
    the price of not holding a corpus-wide suffix array). Exactly TWO
    exchanges of compact tuples: (16-byte hash, id, pos) for the
    global first-occurrence window, then (id, pos) for the per-doc
    interval merge + reassembly join — document text never shuffles.
    Duplicate positions collapse to MERGED islands before the
    coverage test (islands ≤ n/k per doc, so reassembly is
    O(n²/k) worst-case per doc, not O(n²)).

    Tokenization is a raw single-space split (byte-preserving on
    reassembly for space-separated text; the chunk_span_dedup
    contract). Docs shorter than ``k`` tokens pass through untouched;
    a fully-duplicated document stays in the output with
    ``clean_text = ''`` (the caller decides whether to drop empties).

    Output: (id_col, n_tokens, n_removed, clean_text).
    """
    toks = F.split(F.col(text_col), " ")
    n_sh = F.size(toks) - (k - 1)
    sh = F.when(
        n_sh > 0,
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i + 1, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col).alias("_id"),
        toks.alias("_toks"),
    )
    shingled = docs.select(
        F.col(id_col).alias("_id"), F.posexplode(sh).alias("pos", "h")
    )
    w = Window.partitionBy("h").orderBy("_id", "pos")
    dups = (
        shingled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("_id", "pos")
    )
    # merge overlapping/adjacent [pos, pos+k-1] intervals per doc:
    # sorted by pos, the furthest previous end is lag(pos)+k-1, so a
    # new island starts when the gap exceeds the span length
    wd = Window.partitionBy("_id").orderBy("pos")
    isl = dups.withColumn(
        "_brk",
        F.when(
            F.col("pos")
            > F.coalesce(F.lag("pos").over(wd), F.lit(-k - 1)) + k,
            1,
        ).otherwise(0),
    ).withColumn("_island", F.sum("_brk").over(wd))
    ivs = (
        isl.groupBy("_id", "_island")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + (k - 1)).alias("e"),
        )
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_ivs"))
    )
    joined = base.join(ivs, "_id", "left").withColumn(
        "_ivs",
        F.coalesce(
            "_ivs", F.array().cast("array<struct<s:int,e:int>>")
        ),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            F.col("_ivs"),
            lambda iv: (i >= iv["s"]) & (i <= iv["e"]),
        ),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )
