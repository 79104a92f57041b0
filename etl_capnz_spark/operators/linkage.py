"""Record linkage: Jaro-Winkler fuzzy matching with prefix blocking.

The name-matching half of entity resolution (the reference's data model
has no free-text name dedup — this is the training-data-pipeline
extension alongside operators/dedup.py): candidate pairs come from
cheap *blocking* (shared Winkler prefix + a provable length-ratio
band), the expensive Jaro-Winkler similarity runs only on candidates,
and survivors are pairs with sim >= threshold.

Scale shape (the SNM / edit1 / LSH discipline): no CartesianProduct
anywhere — candidates are an equi-join on the block key, so at 100 TB
the shuffle carries (id, short-string) pairs and each block is a task.
Hot blocks are the same hazard class as hot LSH bands (dedup.py
``max_bucket``); the block key here is the 2-char Winkler prefix whose
cardinality grows with the alphabet, and the length-band predicate
splits blocks further before the kernel sees them.

Exactness: the Python kernel below is pinned BIT-IDENTICAL to DuckDB's
``jaro_winkler_similarity`` (fuzzed over 19k random pairs incl. 70-char
strings, plus the textbook cases) — the probe resolved three semantics
the textbook definition leaves open, all matching DuckDB:

* transpositions are **floored** (``t // 2`` as an integer, not t/2 as
  a float) before entering the similarity formula;
* either string empty => 0.0 (including both-empty);
* the Winkler boost (prefix up to 4, p = 0.1) applies only when the
  Jaro similarity exceeds the 0.7 boost threshold.

Raw doubles are emitted (no rounding): both engines compute the same
few divisions in the same association, so the oracle matches
bit-for-bit — the EWMA discipline.
"""
from __future__ import annotations

from functools import reduce
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: char-count signature alphabet for the jw_pairs m̂ prefilter — the
#: F.array literal AND the unrolled element_at term count both derive
#: from this single constant (ADVICE r9).
_SIG_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Pure-Python Jaro-Winkler, bit-identical to DuckDB's builtin
    (see module head for the probed semantics)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    bound = max(l1, l2) // 2 - 1
    if bound < 0:
        bound = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - bound), min(l2, i + bound + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2  # floored, matching DuckDB (t/2 as float diverges)
    sim = (m / l1 + m / l2 + (m - t) / m) / 3
    if sim > 0.7:  # Winkler boost threshold
        pref = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                pref += 1
            else:
                break
        sim = sim + pref * 0.1 * (1 - sim)
    return sim


def jw_batch_np(a_list, b_list):
    """Numpy-vectorized Jaro-Winkler over a BATCH of pairs — the Arrow
    kernel behind :func:`jw_pairs` (VERDICT r4 task 2: the per-pair
    Python loop was the single most expensive bench kernel at 41% of
    the driver's entity_golden total).

    Bit-identical to :func:`jaro_winkler_py` (the readable spec, itself
    fuzz-pinned to DuckDB): every float enters through the SAME IEEE
    operations in the SAME association — ``(m/l1 + m/l2 + (m-t)/m)/3``
    elementwise in float64 is the same three divisions/two adds Python
    performs, and the boost ``sim + pref*0.1*(1-sim)`` likewise. The
    greedy matching is sequential in (i, j) but independent ACROSS
    pairs, so the loops run over CHARACTER POSITIONS (≤ max length in
    batch, ~101 steps for 70-char fuzz strings) with all pairs advanced
    per step — O(Lmax·Wmax) numpy passes instead of O(n) Python pair
    loops. Strings decode via utf-32-le (code points, exactly Python's
    character comparison semantics). Returns float64 ndarray.
    """
    import numpy as np

    n = len(a_list)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    l1 = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=n)
    l2 = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=n)
    L1 = int(l1.max())
    L2 = int(l2.max())
    if L1 == 0 or L2 == 0:
        return np.zeros(n, dtype=np.float64)
    # code-point matrices; distinct negative pads so pad never equals
    # pad or any real character (code points are >= 0). ONE decode of
    # the whole batch + index scatter — a per-row fill loop was the
    # actual hot spot at 400k-pair batches (2.8 s of pure Python).
    def _fill(strs, lens, width, pad):
        M = np.full((n, width), pad, dtype=np.int64)
        flat = np.frombuffer(
            "".join(strs).encode("utf-32-le"), dtype=np.uint32
        )
        rows = np.repeat(np.arange(n), lens)
        starts = np.cumsum(lens) - lens
        cols = np.arange(len(flat)) - np.repeat(starts, lens)
        M[rows, cols] = flat
        return M

    A = _fill(a_list, l1, L1, -1)
    B = _fill(b_list, l2, L2, -2)

    bound = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    bmax = int(bound.max())
    m2 = np.zeros((n, L2), dtype=bool)
    mA = np.zeros((n, L1), dtype=bool)
    for i in range(L1):
        # the greedy match is sequential in i (m2 state carries), but
        # within one i every row needs only its FIRST eligible j —
        # one 2D candidate mask over the window span + argmax, no
        # inner j loop. Rows with i >= l1 hold pad -1 which never
        # equals any B cell — no activity mask needed.
        wlo = max(0, i - bmax)
        whi = min(L2, i + bmax + 1)
        if wlo >= whi:
            continue
        c = A[:, i]
        lo = np.maximum(0, i - bound)
        hi = np.minimum(l2, i + bound + 1)
        jidx = np.arange(wlo, whi)
        cand = (
            (B[:, wlo:whi] == c[:, None])
            & ~m2[:, wlo:whi]
            & (jidx[None, :] >= lo[:, None])
            & (jidx[None, :] < hi[:, None])
        )
        rows = np.nonzero(cand.any(axis=1))[0]
        if rows.size:
            jstar = wlo + cand[rows].argmax(axis=1)
            m2[rows, jstar] = True
            mA[rows, i] = True
    m = mA.sum(axis=1)

    # transpositions: matched chars of each side in order, compared
    # positionally; scatter by per-row running match index
    maxm = int(m.max())
    sims = np.zeros(n, dtype=np.float64)
    if maxm > 0:
        S1 = np.full((n, maxm), -1, dtype=np.int64)
        S2 = np.full((n, maxm), -2, dtype=np.int64)
        o1 = np.cumsum(mA, axis=1) - 1
        r, cpos = np.nonzero(mA)
        S1[r, o1[r, cpos]] = A[r, cpos]
        o2 = np.cumsum(m2, axis=1) - 1
        r, cpos = np.nonzero(m2)
        S2[r, o2[r, cpos]] = B[r, cpos]
        k = np.arange(maxm)
        t = (
            (S1 != S2) & (k[None, :] < m[:, None])
        ).sum(axis=1) // 2  # floored, matching DuckDB

        has = m > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = (m / l1 + m / l2 + (m - t) / m) / 3
        sim = np.where(has, sim, 0.0)

        # Winkler boost: common prefix up to 4 (stops at min length),
        # applied only above the 0.7 Jaro threshold
        P = min(4, L1, L2)
        if P > 0:
            kp = np.arange(P)
            eq = (
                (A[:, :P] == B[:, :P])
                & (kp[None, :] < l1[:, None])
                & (kp[None, :] < l2[:, None])
            )
            pref = np.cumprod(eq, axis=1).sum(axis=1)
        else:
            pref = np.zeros(n, dtype=np.int64)
        boosted = sim + pref * 0.1 * (1 - sim)
        sims = np.where(sim > 0.7, boosted, sim)
    # either-empty rows: l1/l2 == 0 ⇒ m == 0 ⇒ already 0.0
    return sims


def _cap_blocks(t: DataFrame, key: str, max_block: int) -> DataFrame:
    """Hot-block cap for linkage candidate generation — the
    lsh_candidates two-level discipline adapted to similarity verify
    (where a star fallback would silently skip REAL comparisons):

    1. **Refine**: blocks over the cap get the EXACT string length
       appended to the block key — sound-alike/same-prefix pairs of
       identical length (the dominant true-match case inside a hot
       block: typos that substitute, not insert) stay candidates,
       while the block shatters by length. Recall trade is explicit
       and mirrors the LSH refine step: a cross-length pair inside a
       hot block is lost unless a finer upstream block catches it.
    2. **Drop**: a refined block STILL over the cap (e.g. 10⁶
       same-length 'JOHN' variants) is removed from candidate
       generation entirely — the Febrl/record-linkage rule that an
       uninformative giant block generates noise pairs, not links.
       Nothing silent: tools/skew_probe.py measures the emitted-pair
       curves, and callers needing those records must supply a finer
       block key.

    Per-block emission after capping ≤ max_block² — linear in the
    block's row count, never quadratic in a hot block.
    """
    from pyspark.sql.window import Window

    w1 = Window.partitionBy(key)
    refined = t.withColumn("_bc", F.count(F.lit(1)).over(w1)).withColumn(
        key,
        F.when(
            F.col("_bc") > max_block,
            F.concat_ws("#", F.col(key), F.col("_len").cast("string")),
        ).otherwise(F.col(key)),
    )
    w2 = Window.partitionBy(key)
    return (
        refined.withColumn("_c2", F.count(F.lit(1)).over(w2))
        .filter(F.col("_c2") <= max_block)
        .drop("_bc", "_c2")
    )


def _min_len_ratio(threshold: float) -> float:
    """Provable blocking bound: jw = j + ℓ·0.1·(1−j) ≤ 0.6·j + 0.4
    (ℓ ≤ 4), and j ≤ (2 + min_len/max_len)/3 because m ≤ min_len and
    m/max_len ≤ min_len/max_len. So jw ≥ θ forces
    min_len/max_len ≥ 5θ − 4 — any pair outside the band is provably
    below threshold and the filter loses nothing."""
    return max(0.0, 5.0 * threshold - 4.0)


def jw_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    threshold: float = 0.9,
    block_prefix: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """All (a, b) pairs with jaro_winkler(a, b) >= threshold whose
    strings share their first ``block_prefix`` characters.
    ``max_block`` bounds hot-block emission via :func:`_cap_blocks`
    (length-refine, then drop — default None keeps the exact
    uncapped candidate set).

    The shared-prefix block is the candidate-generation contract (the
    standard Winkler assumption — the boost itself presumes a common
    prefix; pairs that differ in the first characters are out of scope
    by DESIGN, not by accident, and the oracle blocks identically so
    the implementation is still checked exactly). The length-ratio
    band (see :func:`_min_len_ratio`) is provably lossless within a
    block. The JW kernel is procedural (greedy matching — no SQL
    expression form) and runs ONLY on post-blocking candidates via an
    Arrow-batched pandas UDF: a per-batch distinct-pair memo feeding
    :func:`jw_batch_np`, the numpy kernel vectorized ACROSS pairs
    (bit-identical to :func:`jaro_winkler_py`, the readable spec).

    Between the join and the kernel sits a PROVABLE char-count
    prefilter (JVM-side, whole-stage codegen): Jaro matches are a
    submultiset of the characters both strings share, so
    m ≤ m̂ = Σ_c min(cnt_a(c), cnt_b(c)) over an ASCII alphabet plus
    a min(rest) term for uncovered characters; with (m−t)/m ≤ 1 and
    jw ≤ 0.6·j + 0.4 (the :func:`_min_len_ratio` bound), any pair
    with (m̂/l1 + m̂/l2 + 1)/5 + 0.4 < θ is provably below threshold
    and never reaches Python. Lossless: pruned pairs would have been
    dropped by the ``sim >= threshold`` filter anyway, so the output
    is bit-identical (a 1e-9 slack keeps float borderline cases on
    the keep side).

    Plan: project → equi-join on (block, provable band) → codegen
    char-count prune → map-only verify. No CartesianProduct (pinned
    in tests).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw_kernel(a, b):
        # no type hints: `from __future__ import annotations` stringifies
        # them and pyspark's hint inference rejects the string form.
        # Per-batch memo first: template corpora repeat (a, b) pairs
        # heavily, and the numpy kernel then runs once per DISTINCT
        # pair (factorize is exact tuple equality — no hash-collision
        # hazard).
        import numpy as np

        codes, uniq = pd.factorize(
            pd.Series(list(zip(a, b)), dtype="object"), sort=False
        )
        sims = jw_batch_np(
            [p[0] for p in uniq], [p[1] for p in uniq]
        )
        return pd.Series(np.asarray(sims)[codes], dtype="float64")

    _jw = pandas_udf(_jw_kernel, "double")

    ratio = _min_len_ratio(threshold)
    # char-count signature alphabet: ASCII letters+digits+space; any
    # character outside it is still bounded by the min(rest) term
    alpha = F.array(*[F.lit(c) for c in _SIG_ALPHABET])
    sig = F.transform(
        alpha,
        lambda c: F.length(str_col)
        - F.length(F.replace(F.col(str_col), c, F.lit(""))),
    )
    # _rest (chars outside the alphabet) is a PER-DOC quantity: compute
    # it here, once per row, instead of per candidate pair (opt r9 —
    # the per-pair HOF aggregates dominated the block-join stage's CPU).
    t = (
        df.filter(F.col(str_col).isNotNull())
        .filter(F.length(str_col) >= F.lit(block_prefix))
        .select(
            F.col(id_col).alias("_id"),
            F.col(str_col).alias("_s"),
            F.substring(str_col, 1, block_prefix).alias("_blk"),
            F.length(str_col).alias("_len"),
            sig.alias("_sig"),
        )
        .withColumn(
            "_rest",
            F.col("_len")
            - F.aggregate(F.col("_sig"), F.lit(0), lambda acc, x: acc + x),
        )
    )
    if max_block is not None:
        t = _cap_blocks(t, "_blk", max_block)
    a, b = t.alias("a"), t.alias("b")
    cand = a.join(
        b,
        (F.col("a._blk") == F.col("b._blk"))
        & (F.col("a._id") < F.col("b._id"))
        & (
            F.least(F.col("a._len"), F.col("b._len"))
            >= F.greatest(F.col("a._len"), F.col("b._len")) * F.lit(ratio)
        ),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.col("a._s").alias("str_a"),
        F.col("b._s").alias("str_b"),
        F.col("a._len").alias("_la"),
        F.col("b._len").alias("_lb"),
        F.col("a._sig").alias("_siga"),
        F.col("b._sig").alias("_sigb"),
        F.col("a._rest").alias("_resta"),
        F.col("b._rest").alias("_restb"),
    )
    # provable upper bound on Jaro matches: shared chars in the
    # alphabet + min of the uncovered remainders (see docstring).
    # The min-sum is UNROLLED into fixed element_at terms instead of a
    # zip_with + aggregate HOF chain: higher-order functions are
    # interpreted (no whole-stage codegen), and this expression runs
    # once per CANDIDATE PAIR — the unrolled form is pure codegen
    # arithmetic (opt r9, guide §4/§1: the block-join stage's CPU was
    # ~3 HOF traversals × alphabet size per pair).
    # derived from the SAME constant as ``alpha`` (ADVICE r9: a
    # hardcoded 63 next to an editable alphabet string made F.get read
    # past the array end — NULL _mhat silently dropping valid pairs)
    n_alpha = len(_SIG_ALPHABET)
    covered = reduce(
        lambda x, y: x + y,
        [
            F.least(
                F.get(F.col("_siga"), F.lit(i)),
                F.get(F.col("_sigb"), F.lit(i)),
            )
            for i in range(n_alpha)
        ],
    )
    # Generate barrier (once_per_row): m̂ feeds the bound THREE times
    # (two divisions + the m̂>0 prune) and a plain filter would inline —
    # and the join-condition pushdown would re-evaluate — the whole
    # min-sum per reference. Behind the barrier the sum runs exactly
    # once per candidate pair.
    from ..functions.exprs import once_per_row

    mhat_raw = covered + F.least(F.col("_resta"), F.col("_restb"))
    cand = cand.select(
        "id_a",
        "id_b",
        "str_a",
        "str_b",
        "_la",
        "_lb",
        once_per_row(mhat_raw).alias("_mhat"),
    )
    mhat = F.col("_mhat").cast("double")
    jw_ub = (
        mhat / F.col("_la").cast("double")
        + mhat / F.col("_lb").cast("double")
        + F.lit(1.0)
    ) / F.lit(5.0) + F.lit(0.4)
    keep = jw_ub >= F.lit(float(threshold) - 1e-9)
    if threshold > 0:
        # zero shared characters ⇒ m = 0 ⇒ jw = 0 exactly: prunable
        # whenever the caller demands any positive similarity
        keep = keep & (F.col("_mhat") > 0)
    cand = cand.filter(keep).drop("_la", "_lb", "_mhat")
    # spread candidates before the Python kernel: the block equi-join
    # leaves one output partition per block key (a handful of prefixes
    # on template corpora), which serializes the UDF onto a few cores —
    # measured 11.3 s -> 3.4 s at sf0.1 from this one hash exchange of
    # (ids, short strings). The kernel, not the join, is the cost.
    cand = cand.repartition(F.col("id_a"), F.col("id_b"))
    return cand.withColumn("sim", _jw("str_a", "str_b")).filter(
        F.col("sim") >= F.lit(float(threshold))
    )


def golden_records(
    labeled: DataFrame,
    cluster_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Survivorship — the entity-resolution endgame: collapse each
    cluster of linked records into ONE canonical ("golden") record by
    majority vote per attribute, ties broken by smallest value (NULLS
    LAST explicitly: Spark orders NULLs first ascending, the oracle
    engine last — left implicit this diverges exactly when a cluster's
    modal count ties between NULL and a real value).

    Shape: attributes vote through ONE melt (``stack``) PER TYPE
    GROUP → one (cluster, attr, value) count → one (cluster, attr)
    top-1 window → one pivot back per group: exchanges scale with the
    number of DISTINCT ATTRIBUTE TYPES (1 for the all-string CRM
    case), never with the attribute count — the r6 verdict's
    golden_records finding was the per-attribute groupBy+window+join
    loop putting 3·K operators and K joins in the plan at a
    K-attribute schema. Types are never mixed inside one melt: a
    common cast would change both the tie-break ORDER and value
    equality (``10`` < ``9`` as strings), i.e. the answer — each type
    group melts in its native type. Exchanges carry (cluster, attr,
    value, count) tuples; no record payloads cross after the first
    projection. Attribute votes are independent, so the golden record
    may mix sources (that is the point of survivorship — field-level,
    not record-level, truth selection).

    Output: (cluster_col, n_members, *attr_cols).
    """
    from pyspark.sql.window import Window

    out = labeled.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    dtypes = dict(labeled.dtypes)
    groups: dict[str, list[str]] = {}
    for a in attr_cols:
        groups.setdefault(dtypes[a], []).append(a)
    for cols in groups.values():
        stack_args = ", ".join(f"'{a}', `{a}`" for a in cols)
        stacked = labeled.select(
            F.col(cluster_col),
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS (_attr, _val)"
            ),
        )
        votes = stacked.groupBy(cluster_col, "_attr", "_val").agg(
            F.count(F.lit(1)).alias("_c")
        )
        w = Window.partitionBy(cluster_col, "_attr").orderBy(
            F.desc("_c"), F.col("_val").asc_nulls_last()
        )
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .groupBy(cluster_col)
            .pivot("_attr", cols)
            .agg(F.first("_val"))
        )
        out = out.join(top, cluster_col)
    return out.select(cluster_col, "n_members", *attr_cols)


def phonetic_code(col: Column) -> Column:
    """Classic American Soundex as a PURE expression chain (no UDF —
    translate + regexp only, so the whole thing stays inside
    whole-stage codegen and the oracle mirrors it verbatim):

    1. strip non-letters, uppercase; the first LETTER is kept as-is;
    2. H/W are transparent in the tail (removed BEFORE coding, so same
       codes separated by H/W collapse — the rule naive ports miss);
    3. consonant classes → digits (BFPV=1 CGJKQSXZ=2 DT=3 L=4 MN=5
       R=6), vowels+Y → the run-breaking '0';
    4. adjacent equal digits collapse (per-digit `d{2,}` regexes — RE2
       in the oracle engine has no backreferences, so no `(\\d)\\1+`);
    5. the first letter's own code is dropped, the 0s vanish, and the
       result pads/truncates to letter + 3 digits.

    Empty after stripping → NULL (no phantom '000' block).
    """
    big = 1_000_000
    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    tail = F.regexp_replace(F.substring(u, 2, big), "[HW]", "")
    coded = F.translate(
        F.concat(first, tail),
        "BFPVCGJKQSXZDTLMNRAEIOUY",
        "111122222222334556000000",
    )
    collapsed = coded
    for d in "0123456":
        collapsed = F.regexp_replace(
            collapsed, d + "{2,}", d
        )
    body = F.translate(F.substring(collapsed, 2, big), "0", "")
    return F.when(
        u != "",
        F.concat(first, F.substring(F.concat(body, F.lit("000")), 1, 3)),
    )


def phonetic_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    threshold: float = 0.85,
    max_block: int | None = None,
) -> DataFrame:
    """Phonetic blocking + Jaro-Winkler verify — the Febrl-style
    complement to :func:`jw_pairs`: prefix blocking misses sound-alike
    spellings that diverge in the first letters' SPELLING but not
    their phonetics ("Catherine"/"Katharine" share no 2-char prefix
    but block together under Soundex... here both block keys are
    honest: candidates share their full Soundex code). Same provable
    length band inside the block, same Arrow JW kernel on candidates
    only, same no-CartesianProduct plan. ``max_block`` bounds
    hot-block emission via :func:`_cap_blocks` (length-refine, then
    drop — default None keeps the exact uncapped candidate set).

    Output: (id_a, id_b, code, str_a, str_b, sim >= threshold).
    """
    import pandas as pd  # noqa: F401  (kernel import parity)
    from pyspark.sql.functions import pandas_udf

    def _jw_kernel(a, b):
        import numpy as np

        codes, uniq = pd.factorize(
            pd.Series(list(zip(a, b)), dtype="object"), sort=False
        )
        sims = jw_batch_np(
            [p[0] for p in uniq], [p[1] for p in uniq]
        )
        return pd.Series(np.asarray(sims)[codes], dtype="float64")

    _jw = pandas_udf(_jw_kernel, "double")

    ratio = _min_len_ratio(threshold)
    t = (
        df.filter(F.col(str_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(str_col).alias("_s"),
            phonetic_code(F.col(str_col)).alias("_code"),
            F.length(str_col).alias("_len"),
        )
        .filter(F.col("_code").isNotNull())
    )
    if max_block is not None:
        t = _cap_blocks(t, "_code", max_block)
    a, b = t.alias("a"), t.alias("b")
    cand = a.join(
        b,
        (F.col("a._code") == F.col("b._code"))
        & (F.col("a._id") < F.col("b._id"))
        & (
            F.least(F.col("a._len"), F.col("b._len"))
            >= F.greatest(F.col("a._len"), F.col("b._len")) * F.lit(ratio)
        ),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.col("a._code").alias("code"),
        F.col("a._s").alias("str_a"),
        F.col("b._s").alias("str_b"),
    )
    cand = cand.repartition(F.col("id_a"), F.col("id_b"))
    return cand.withColumn("sim", _jw("str_a", "str_b")).filter(
        F.col("sim") >= F.lit(float(threshold))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    window: int = 5,
    threshold: float = 0.85,
    key: Column | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández–Stolfo SNM) + JW verify
    — the third classic blocking strategy beside :func:`jw_pairs`
    (prefix blocks) and :func:`phonetic_pairs` (Soundex blocks):
    records sort by a key and ONLY pairs within ``window`` positions
    of each other become candidates.

    Relationship to ``operators/dedup.sorted_neighborhood_pairs``
    (entry ``dedup_snm``): that one is the CANDIDATE-ONLY generator
    over a numeric sort key (n_chars), sharded via a driver-computed
    borrow plan that replicates following shards' first rows backwards
    as lead-targets. This one is the full ER pipeline — string sort
    key, rank from the cumsum_sharded scan, neighborhood as a
    rank-bucket BAND equi-join, and the Arrow JW kernel verifying the
    candidates. Two implementations of the same window semantics on
    purpose: the band join generalizes to any window size without a
    borrow plan, and the differential entry pair keeps both honest. Its defining property is the one
    the other two lack: candidate volume is EXACTLY ≤ n·window by
    construction, independent of the key distribution — no hot block
    exists to cap (`_cap_blocks` has nothing to do here), at the price
    of missing matches that sort far apart (complementary recall; run
    multiple passes with different keys, the standard multi-pass SNM).

    Scale shape: the global sort rank comes from the two-phase sharded
    scan (operators/rank.py cumsum_sharded over the (key, id) total
    order) — no single-partition Window.orderBy, per-task memory
    ~n/n_shards (the §20 discipline). Neighborhood pairing is a BAND
    equi-join: each row probes its rank-bucket and the next
    (floor((rank−1)/w) ∈ {b_left, b_left+1} whenever 0 < Δrank ≤ w),
    so every candidate pair is produced exactly once by an equi-join —
    no CartesianProduct (pinned). Verify = the same Arrow JW kernel as
    the other two blockers, on candidates only.

    Output: (id_a, id_b, rank_a, rank_b, str_a, str_b, sim ≥ θ).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from etl_capnz_spark.operators.rank import cumsum_sharded

    def _jw_kernel(a, b):
        import numpy as np

        codes, uniq = pd.factorize(
            pd.Series(list(zip(a, b)), dtype="object"), sort=False
        )
        sims = jw_batch_np([p[0] for p in uniq], [p[1] for p in uniq])
        return pd.Series(np.asarray(sims)[codes], dtype="float64")

    _jw = pandas_udf(_jw_kernel, "double")

    t = (
        df.filter(F.col(str_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(str_col).alias("_s"),
            (key if key is not None else F.col(str_col)).alias("_k"),
            F.lit(1).alias("_one"),
        )
        .filter(F.col("_k").isNotNull())
    )
    ranked, _tot = cumsum_sharded(
        t,
        [F.col("_k"), F.col("_id")],
        ["_one"],
        inclusive=True,
        n_shards=n_shards,
    )
    ranked = ranked.select(
        "_id", "_s", F.col("cum__one").alias("_r")
    )
    bucket = F.floor((F.col("_r") - 1) / window)
    left = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("str_a"),
        F.col("_r").alias("rank_a"),
        F.explode(
            F.array(bucket.cast("bigint"), bucket.cast("bigint") + 1)
        ).alias("_b"),
    )
    right = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("str_b"),
        F.col("_r").alias("rank_b"),
        bucket.cast("bigint").alias("_b"),
    )
    cand = left.join(right, "_b").filter(
        (F.col("rank_b") > F.col("rank_a"))
        & (F.col("rank_b") - F.col("rank_a") <= window)
    )
    cand = cand.repartition(F.col("id_a"), F.col("id_b"))
    return (
        cand.withColumn("sim", _jw("str_a", "str_b"))
        .filter(F.col("sim") >= F.lit(float(threshold)))
        .select(
            "id_a", "id_b", "rank_a", "rank_b", "str_a", "str_b", "sim"
        )
    )
