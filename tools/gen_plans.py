"""Regenerate PLANS.md: executed physical plans of the headline queries
with scale commentary. Usage: python tools/gen_plans.py > PLANS.md"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

NOTES = {
    "cap_features": (
        "Single narrow pass: scan -> derivation -> one repartition "
        "(parallelism for single-file input; at real scale this exchange "
        "disappears) -> per-alert enrichment -> array<feature> build -> "
        "fan-out Generate (explode). A second inner Generate is the "
        "once_per_row barrier pinning the polygon parse to one "
        "evaluation per alert (functions/exprs.py). No join, no "
        "aggregate, no extra shuffle - linear scaling shape."
    ),
    "tpch_q1": (
        "Filter is pushed into the parquet scan (PushedFilters on "
        "l_shipdate) and the scan reads only the 5 needed columns "
        "(ReadSchema). Two-phase HashAggregate: partial before the "
        "exchange, final after - the shuffle carries one row per "
        "(partition x group)."
    ),
    "tpch_region_revenue": (
        "nation and region resolve to BroadcastHashJoin (explicit hints); "
        "only the orders-customer join shuffles. AQE re-plans partition "
        "counts at runtime."
    ),
    "dedup_minhash": (
        "Signature computation happens once, pre-shuffle; the self-join "
        "input projections carry only (id, band_key) - document text never "
        "enters an Exchange."
    ),
    "tpch_q5": (
        "6-table snowflake: region+nation resolve to BroadcastHashJoin "
        "(tiny dims), facts join on their keys with the dual equi-condition "
        "(l_suppkey AND c_nationkey) evaluated inside ONE supplier join - "
        "no extra shuffle for the second condition. Date filter pushed to "
        "the orders scan."
    ),
    "tpch_above_avg": (
        "The correlated-subquery shape stated as agg + self-equi-join - "
        "the plan Catalyst decorrelates TO: one partial/final aggregate on "
        "o_custkey, one equi-join back to orders, both sharing the "
        "o_custkey partitioning (single exchange reused)."
    ),
    "text_repetition": (
        "Two explode -> two-phase hash-aggregate chains (tokens, bigrams) "
        "joined on doc_id; partial aggregation means the shuffle carries "
        "one row per (doc, gram) per partition, never per occurrence. The "
        "per-doc re-aggregate rides the (doc,gram) partitioning - no "
        "second exchange per chain."
    ),
    "dedup_cross": (
        "Two-sided LSH band join: each corpus emits (band_key, id) via one "
        "array+explode; the equi-join on band_key pairs new x base only - "
        "intra-batch pairs never materialize, and only 16-byte keys "
        "shuffle, never documents."
    ),
    "emb_quantize": (
        "Map-only compression rewrite: amax/scale/codes/rmse are one "
        "narrow projection chain - zero exchanges in the whole plan; at "
        "100 TB this is a pure rewrite pass whose cost is the IO."
    ),
    "knn_brute": (
        "The query vectors broadcast (BroadcastNestedLoopJoin); the corpus "
        "streams without shuffling. The only exchange is the per-query "
        "top-k window."
    ),
    "events_session": (
        "One hash-partition exchange on user_id serves BOTH window "
        "functions (lag + running sum) and the final session aggregation - "
        "Catalyst reuses the sort order."
    ),
    "events_asof": (
        "Union of tagged inputs -> single (key) exchange + sort -> "
        "carry-forward last_value window. No join node at all: the as-of "
        "semantics ride on the sort."
    ),
    "events_range_join": (
        "Bucketed rewrite: the inequality join appears as a hash EQUI-join "
        "on (user, bucket) with the exact range as a post-filter - no "
        "BroadcastNestedLoopJoin / cartesian product."
    ),
    "tpch_q3": (
        "Segment and both date filters are pushed to the scans "
        "(PushedFilters); the two fact joins shuffle on the join keys and "
        "AQE sizes them from runtime stats. TakeOrderedAndProject caps the "
        "result - no global sort materializes."
    ),
    "tpch_custdist": (
        "LEFT OUTER with the priority predicate INSIDE the join condition "
        "(not a post-filter - that would drop the zero-order customers); "
        "two HashAggregates, the second over the tiny c_count domain."
    ),
    "knn_srp": (
        "Both sides compute 32-bit SRP signatures pre-shuffle and emit 8 "
        "(band_key, id) rows; candidates come from the band equi-join "
        "(queries broadcast), exact cosine only on candidates. No "
        "CartesianProduct - the all-pairs scan never exists. r7: the "
        "signature and the candidate cosine run as ArrowEvalPython "
        "kernels (order-preserving numpy folds, bit-identical to the "
        "HOF form) - Python only AFTER the band-join blocking, the "
        "jw_pairs discipline."
    ),
    "tpch_q2": (
        "Correlated-MAX decorrelated as a window aggregate: ONE exchange "
        "on p_partkey serves both the max and the tie-filter - no second "
        "join back to the subquery. EUROPE suppliers resolve through two "
        "BroadcastHashJoins; the distinct (partkey, suppkey) pair set is "
        "the only wide shuffle."
    ),
    "tpch_q6": (
        "The pure-scan query: all three predicates land in PushedFilters, "
        "ReadSchema is pruned to the 4 referenced columns (2 aggregated + "
        "2 filter-only), and the whole plan is scan -> partial agg -> "
        "1-row exchange -> final agg. The 100 TB cost is the IO after "
        "row-group pruning - nothing else."
    ),
    "tpch_q8": (
        "Market-share ratio in ONE pass: sum(CASE)/sum over the same "
        "groups, so the nation share needs no self-join or second scan. "
        "The nation dim enters twice (customer role broadcast + supplier "
        "role broadcast); only the three fact joins shuffle."
    ),
    "tpch_q16": (
        "COUNT(DISTINCT) plans as two-phase partial-distinct: first "
        "aggregate keyed (brand,type,size,suppkey) dedups map-side, the "
        "second counts - the shuffle never carries duplicate suppliers. "
        "The complaint NOT-IN is a BroadcastHashJoin LeftAnti, not a "
        "null-aware nested loop, because the exclusion list is non-null "
        "by construction."
    ),
    "tpch_q21": (
        "EXISTS + NOT-EXISTS as LeftSemi + LeftAnti over (orderkey, "
        "suppkey) projections of the same fact - the self-joins shuffle "
        "16-byte key pairs, never lineitem payloads, and the non-equi "
        "supplier<>supplier conjunct rides inside the equi-join on "
        "orderkey as a join-condition filter."
    ),
    "tpch_q11": (
        "Global-threshold HAVING: the scalar is the re-aggregation of the "
        "per-part aggregate, broadcast back as a 1-row crossJoin - no "
        "driver collect, no single-partition window. The lineage below "
        "the per-part agg is computed twice (scalar + probe); at real "
        "scale persist that |parts|-row intermediate."
    ),
    "dedup_setsim": (
        "Exact PPJoin: freq-ordered prefix tokens feed an equi-join that "
        "emits ONLY (id_a, id_b); the token-set arrays re-join by id for "
        "the exact verify, so full arrays move only for surviving "
        "candidates. No CartesianProduct anywhere - the oracle's O(n^2) "
        "form never exists in the plan, yet the answer is identical."
    ),
    "graph_pagerank": (
        "Three power iterations = three (join + partial-aggregated sum) "
        "stages chained in one plan, each shuffling node keys only. At "
        "real scale, localCheckpoint every few iterations truncates the "
        "growing lineage (same discipline as connected components)."
    ),
    "text_pmi": (
        "Two two-phase aggregates (unigrams, bigrams) + the bigram table "
        "re-joined to the unigram counts twice; both corpus totals are "
        "re-aggregations of the count tables broadcast as 1-row sides - "
        "the raw text is scanned once per aggregate and never for the "
        "totals."
    ),
    "sample_weighted": (
        "Efraimidis-Spirakis keys are a narrow per-row expression; the "
        "top-n is TakeOrderedAndProject - per-partition heaps then an "
        "n-row merge, no global sort, losing rows never shuffle."
    ),
    "geo_radius_join": (
        "Spatial radius join as a grid-cell EQUI-join: each point "
        "explodes to its 3x3 cell neighborhood (bounded 9x fan-out of "
        "keys), candidates come from the (cy, cx) hash join, and exact "
        "haversine filters after - no CartesianProduct; candidate count "
        "scales with point density, not n^2."
    ),
    "events_cumulative_users": (
        "Distinct-over-time without unbounded state: first-seen per user "
        "(one two-phase aggregate) -> per-hour counts -> running sum "
        "over #hours rows. The single-partition window at the end is "
        "over the TINY hour domain, not the events."
    ),
    "events_asof_forward": (
        "Forward as-of: the SAME union + one-exchange sort-carry plan as "
        "the backward join, with the sort order reversed - no second "
        "strategy, no join node, direction is just an ORDER BY flip."
    ),
    "events_regression": (
        "OLS from closed-form moments: ONE two-phase hash aggregate "
        "computes all six sums; slope/intercept/r are a driver-free "
        "post-projection. No iteration, no ML library, no extra pass."
    ),
    "distinct_bitmap": (
        "Exact distinct as mergeable state: per-(group, bucket) bitmaps "
        "partial-aggregate map-side like any hash agg; the ALL row is a "
        "re-aggregation (bitmap OR) of the per-group bitmaps - raw data "
        "is scanned once for every grain."
    ),
    "snapshot_diff": (
        "One full-outer equi-join comparing per-side row hashes - only "
        "(key, 52-bit hash) pairs cross the exchange, never payloads; "
        "the classify-and-count is a two-phase aggregate over the join "
        "output."
    ),
    "sample_deterministic": (
        "The md5-hash sample is a pure Filter directly over the scan - no "
        "shuffle, no RNG state, no sample() partition dependence. At 100 "
        "TB this composes with partition pruning untouched."
    ),
    "pack_sequences": (
        "One exchange on the shard key, one sort, one running-sum window - "
        "bin assignment is closed-form from the exclusive cumsum, so "
        "packing needs no global coordinator."
    ),
    "pipeline_dedup_pack": (
        "The full assembly chain: the quality gate prunes pre-shuffle; LSH "
        "candidates shuffle only (band_key, id); label propagation "
        "converges in O(component diameter) rounds, each ONE shuffle-join "
        "+ ONE hash-agg with localCheckpoint truncating lineage; the final "
        "anti-join + packing window reuse the doc_id partitioning. "
        "Documents' text shuffles exactly once (packing window)."
    ),
    "dedup_chunk_spans": (
        "C4-style span dedup: chunking is a narrow array expression; the "
        "exploded rows shuffle TWICE on the natural keys - once on chunk "
        "text (global first-occurrence row_number), once on doc_id "
        "(ordered reassembly). No join anywhere: winner filter and "
        "rebuild read the same exploded stream. Blank chunks are dropped "
        "pre-shuffle so the degenerate hot key never enters an Exchange."
    ),
    "events_pattern": (
        "CEP as ONE hash-aggregate: sort_array(collect_list(struct)) "
        "builds each user's ordered journey inside the agg - no window "
        "sort, no self-join; the regex match is a projection after. "
        "Partial aggregation ships per-partition event lists, so the "
        "exchange carries each event exactly once."
    ),
    "scd2_intervals": (
        "SCD-2 build: row_number and lead share ONE partitioning+sort "
        "(user_id, ts, event_id) - a single Exchange feeds a single "
        "Window operator computing both; is_current is a free projection."
    ),
    "graph_triangles": (
        "Triangle enumeration with the ordered-edge 6x cut: edges kept "
        "only as lo<hi; wedge join partitions on the shared node, closing "
        "probe re-partitions on (lo,hi). Corner credit is a union + one "
        "final hash-agg. All joins are hash equi-joins - no "
        "CartesianProduct at any scale."
    ),
    "sql_lateral_topk": (
        "Correlated LATERAL (ORDER BY+LIMIT per outer row) decorrelated "
        "by Catalyst to WindowGroupLimit top-1 - note the PARTIAL "
        "WindowGroupLimit before the exchange (map-side candidate "
        "pruning: each task forwards at most one row per key) and the "
        "equi-join back to the outer side. Never a per-row re-execution."
    ),
    "basket_lift": (
        "Within-order pair self-join: candidate volume is per-basket "
        "(sum |basket|^2), never corpus^2; supports and the order total "
        "are tiny broadcast aggregates; deterministic TakeOrdered top-k."
    ),
    "events_wau": (
        "Rolling 7-day distinct via bounded day-explode: the daily "
        "distinct table fans out exactly 7x on tiny (date, user) keys, "
        "then one count-distinct per window day - no sliding distinct "
        "state, no 7-way self-join. The HLL twin (events_wau_hll) "
        "replaces the fan-out's count-distinct with a sketch merge."
    ),
    "audit_constraints": (
        "The whole quality suite is ONE aggregate over one scan "
        "(conditional sums + count-distincts computed together) plus a "
        "broadcast anti-join count for the FK - adding a constraint "
        "adds an expression, not a job."
    ),
    "orders_rfm": (
        "Quintile cuts ride ntile over the per-customer aggregate - "
        "#customers rows, range-partitioned global sort at scale (the "
        "documented trade of unpartitioned ranking windows); the "
        "segment-count output is tiny."
    ),
    "dedup_semantic": (
        "SemDeDup: pairwise cosine is confined to k-means cells (equi-"
        "join on cell id) - candidate volume is sum(|cell|^2), bounded by "
        "growing k with the corpus; component labels and the survivor "
        "anti-join ride the vec_id partitioning. k-means itself "
        "materializes only k x dim doubles per round at the driver."
    ),
    "extract_main_text": (
        "Round-3 crawl stage: the whole extraction (block-drop regexes, "
        "tag strip, entity decode chain, line split + word-count filter, "
        "rejoin) is ONE Project over the scan - no shuffle, no Generate, "
        "whole-stage codegen end to end. At 100 TB this is a map-only "
        "rewrite of the crawl; the only cost is interpreted regex per "
        "row, amortized by codegen (crawl_scale_probe: 16x data in 3.1x "
        "time)."
    ),
    "html_outlinks": (
        "Link extraction is the same map-only regexp chain; the only "
        "shuffle is the two-phase hash aggregate on the (short) href "
        "strings - partial counts before the exchange, so the shuffle "
        "carries one row per distinct href per partition."
    ),
    "chunk_documents": (
        "Token chunking: tokenize -> sequence(starts) -> ONE Generate "
        "(posexplode) -> slice/array_join projection. chunk_idx = "
        "start/stride needs no window function, so the 1-to-k fan-out is "
        "completely shuffle-free - linear at any corpus size."
    ),
    "url_normalize": (
        "Pure per-row regex-extract/split/sort/concat normalization - a "
        "single Project, no exchange anywhere. The crawl-frontier dedup "
        "that follows (groupBy url_norm) shuffles canonical STRINGS, "
        "never raw pages."
    ),
    "dedup_lsh_capped": (
        "Hot-bucket-capped LSH (round 4): ONE lineage - band explode -> "
        "exchange on band_key -> window count -> refined-key projection "
        "-> exchange on bkey -> window count+min - then a lazy "
        "localCheckpoint feeds the three consumers (clique left/right, "
        "star) so the md5-heavy signature pipeline runs ONCE. Per-bucket "
        "emission is linear (star pairs for identical-sig clusters), "
        "never B^2: the 16x all-dup probe drops 23.9M->1.9M candidate "
        "pairs and 15.7->7.1 s vs uncapped."
    ),
    "crawl_frontier": (
        "Frontier selection: normalize is map-only; the crawled "
        "anti-join and the priority count both hash on the canonical "
        "url (one exchange), then ONE exchange on host for the "
        "politeness rank window. Both shuffles carry (url, host, "
        "count) tuples - never page content. The k-per-host rank "
        "filter bounds output per host; pre_salt gives a two-phase "
        "top-k (identical output, pinned) when a single host's "
        "candidate list would straggle the sort."
    ),
    "mixture_temperature": (
        "Per-source counts (tiny agg) -> 1-row total via broadcast "
        "crossJoin -> rate table broadcast-joined back to the corpus -> "
        "md5-ppm filter. The corpus itself is never shuffled: the only "
        "exchanges are on the source-count side (sources, not rows), and "
        "the sampler is a narrow filter that can sit on the scan."
    ),
    "ts_similarity_l2": (
        "Series build: two keyed aggregates share the user_id "
        "partitioning (daily sums, then bucket means), the bucket grid "
        "join is key-sized, and the final top-k plans as "
        "TakeOrderedAndProject - per-partition heaps, a k-row driver "
        "merge, losers never shuffle."
    ),
    "geo_point_in_polygon": (
        "Spatial containment as an EQUI-join: polygons explode over "
        "their bbox 1-degree cells (unit squares -> <=4 rows), points "
        "land in one cell, the join is hash-partitioned on (cx, cy), and "
        "the exact ray-cast HOF filters candidates. No "
        "CartesianProduct, no BroadcastNestedLoopJoin - candidate volume "
        "is O(points x local polygon density), the Sedona plan shape."
    ),
    "incremental_rollup": (
        "Two key-sized partial aggregates union into a key-sized merge "
        "aggregate - every exchange after the first partial carries "
        "(day x type) rows, not events. This IS the materialized-view "
        "maintenance plan: at 100 TB the old side is the stored rollup "
        "and the scan covers only the new partition."
    ),
    "events_user_trend": (
        "Grouped-map applyInPandas: ONE hash exchange on user_id feeds "
        "the Arrow batches; the JVM computes x (datediff vs the per-user "
        "min) BEFORE the Python boundary so the kernel is pure "
        "arithmetic. Per-task state is one user's rows - the canonical "
        "grouped-map bound; skewed users are AQE's problem."
    ),
    "graph_sssp": (
        "Each Bellman-Ford round is one equi-join (dist x edges on src) "
        "+ one min-aggregate, both shuffling node keys only and "
        "partial-aggregated map-side; localCheckpoint truncates lineage "
        "per round so plan depth stays constant. Integer weights keep "
        "every distance exact - the oracle unrolls identical rounds as "
        "CTEs and hash-matches."
    ),
    "orders_histogram": (
        "Two passes: a 1-row min/max aggregate broadcast back via "
        "crossJoin (BroadcastNestedLoopJoin of a single row - no "
        "collect), then arithmetic binning + a two-phase hash aggregate "
        "on at most n_bins keys. The shuffle carries bins, not rows."
    ),
    "events_heavy_hitters": (
        "Two scans, no full-domain shuffle: scan 1 feeds mapInPandas "
        "Misra-Gries summaries (<= k rows per PARTITION, state bounded "
        "by k regardless of partition size); the distinct'd candidates "
        "broadcast-join scan 2, every non-candidate collapses to one "
        "sink key, and the exact-count exchange carries <= k*P+1 keys. "
        "Total-n is an unpartitioned window over the already-aggregated "
        "counts - its input is the key-bounded aggregate, never the "
        "data, so the scan appears exactly twice with no reliance on "
        "AQE exchange reuse. The naive form this provably equals would "
        "shuffle the whole value domain."
    ),
    "events_cms_freq": (
        "Sketch build is one narrow pass: a depth-element array+explode "
        "emits (i,j) cell keys (tiny ints, never values); map-side "
        "combine collapses each task to <= depth*width cells before a "
        "key-sized exchange. Estimates probe the sketch with a "
        "BROADCAST hash join (sketch <= depth*width rows by "
        "construction) and min-agg per item - no rescan of the data "
        "the sketch summarizes, which is the point of having it."
    ),
    "dedup_bloom_prefilter": (
        "Base hashes stream through per-partition partial bitmaps "
        "(mapInPandas, m/8 bytes of state each) merged by log-depth "
        "treeReduce OR; the probe is a broadcast byte-array inside a "
        "vectorized pandas UDF, so the definitely-new slice of the new "
        "batch never reaches the anti-join exchange. Only maybe-dups "
        "(true dups + FPR) shuffle. No false negatives makes the "
        "output provably identical to the plain anti-join."
    ),
    "dedup_lines_global": (
        "Explode to (md5(line), doc_id, line_no) - the first-occurrence "
        "window shuffles 16-byte hashes plus two longs, never line "
        "text; the reassembly groupBy shuffles each surviving line "
        "exactly once, inside its own row. Two key-sized exchanges "
        "total; collect_list per doc is bounded by document size, the "
        "same bound any per-doc operator already carries."
    ),
    "media_png_decode": (
        "Two chained mapInPandas stages (synthesize -> decode), each "
        "map-only: payload bytes cross the Arrow boundary once per "
        "batch, no shuffle anywhere. The decode kernel is the REAL "
        "stdlib PNG path (inflate + CRC + filter reconstruction); a "
        "C-speed codec swaps into the same seam without changing this "
        "plan. Embarrassingly parallel - scales with cores."
    ),
    "media_mulaw_decode": (
        "Same two map-only Arrow stages as the PNG path; the kernel is "
        "integer G.711 companding (audioop-exact). No exchange, no "
        "aggregation - per-item decode cost is the whole story, and it "
        "parallelizes linearly."
    ),
    "media_mixed_decode": (
        "Three synthesize branches union into ONE map-only Arrow decode "
        "stage that dispatches per payload on magic bytes - mixed "
        "formats never force format-split scans. Union of narrow "
        "map-only branches; no exchange."
    ),
    "events_trimmed_mean": (
        "Grouped-agg pandas UDF: the agg exchange co-locates each "
        "group, then Arrow hands the column slice to Python once per "
        "group. No partial aggregation exists for order statistics - "
        "the honest cost, same class as percentile(); bound it with "
        "bounded per-group cardinality."
    ),
    "cap_polygon_area": (
        "Map-only shoelace fold per ring (one cross product per edge "
        "inside a single array-aggregate expression); shares the "
        "parsed-polygon scan shape with the centroid queries."
    ),
    "text_winnow": (
        "Narrow shingle-hash array expression, ONE posexplode, then a "
        "single windowed min_by over a w-row frame - no self-join, no "
        "per-window explode. The only exchange hash-partitions doc ids "
        "for the window; distinct reuses that partitioning. Downstream "
        "near-dup detection equi-joins on fp_hash - text never moves."
    ),
    "events_zorder_keys": (
        "Map-only: quantization + Morton interleave is 10 bitwise ops "
        "per column via the magic-number spread (vs 64 for a per-bit "
        "loop), one WholeStageCodegen span, zero exchanges. The layout "
        "write that consumes this key adds exactly one range exchange "
        "- the same cost as any global sort-write - and buys min/max "
        "file pruning in BOTH dimensions (measured in test_layout)."
    ),
    "events_anomaly_rows": (
        "Robust per-row outlier gate: two exact-percentile aggregates "
        "(median, then median of |x-med|) each one keys-only exchange; "
        "the per-group constants come BACK via broadcast joins, so "
        "event rows never shuffle - the filter and robust-z are "
        "map-only. Same bounded-group-cardinality caveat as "
        "events_quantiles; swap approx_percentile for unbounded keys, "
        "identical shape."
    ),
    "scd2_customer": (
        "SCD-2 CDC maintenance (the merge twin of scd2_intervals' "
        "history build): Spark cannot broadcast a FULL-outer side, so "
        "the naive single-join shape would shuffle the whole dimension "
        "every batch. Instead current LEFT JOIN broadcast(updates) "
        "feeds ONE Generate (the 1-or-2-row close+insert fan-out), and "
        "brand-new keys come from a broadcast semi-join on the "
        "column-pruned key scan anti-joined back - three "
        "BroadcastHashJoins, zero exchanges of dimension rows, history "
        "unioned in map-only."
    ),
    "events_quantile_sketch": (
        "Mergeable bottom-k quantile sketch: both exchanges carry "
        "BOUNDED data - the replay-dedupe distinct is collapsed "
        "map-side by a partial HashAggregate before its exchange, "
        "and Spark's WindowGroupLimit applies the rank<=k cut "
        "map-side too, so the group-key exchange ships at most k "
        "rows per (partition x group). The sample-array groupBy "
        "reuses that partitioning and the order-statistic estimates "
        "are array arithmetic on k x 16 bytes of state per group. "
        "Per-day partials merge into coarser rollups WITHOUT "
        "re-reading events - the same partial-aggregate contract as "
        "incremental_rollup, with a DKW-bounded rank error instead "
        "of exactness."
    ),
    "sample_weighted_per_group": (
        "Per-group weighted reservoir: the Efraimidis-Spirakis key "
        "is a narrow map-side expression (md5 -> uniform -> ln(u)/w), "
        "so the plan is scan -> ONE hash exchange on the group key -> "
        "window rank -> filter (WindowGroupLimit applies the cut "
        "map-side). Rows that lose the rank never leave their task; "
        "no global sort (contrast weighted_sample's "
        "TakeOrderedAndProject, the k-global twin). The RoundRobin "
        "exchange below it is the single-file-input parallelism "
        "artifact - gone at real scale."
    ),
    "tar_shard_roundtrip": (
        "Training-data last mile: shard assignment is a map-side md5 "
        "hash, so packing is ONE exchange on shard_id feeding an "
        "Arrow-batched FlatMapGroupsInPandas that streams each "
        "shard through stdlib tarfile (the RoundRobin exchange below "
        "is the single-file-input artifact); unpacking is a map-only "
        "MapInPandas - at 100 TB every 100 MB shard packs and "
        "unpacks independently, and byte-determinism (sorted "
        "members, zeroed headers) makes the sink idempotent and its "
        "output diffable."
    ),
    "text_bm25": (
        "BM25 as an inverted-index PROBE, not a scan-per-query: tf/df/"
        "dl aggregate once from one tokenize pass, query terms "
        "equi-join the postings on token (at sf0.01 AQE broadcasts "
        "the small sides; at 100 TB the 3-row query side broadcasts "
        "and only queried postings shuffle), corpus constants N and "
        "avgdl ride 1-row broadcasts (the only two "
        "BroadcastNestedLoopJoins - both 1-row builds, pinned in "
        "test_plans). Scores round to 6dp BEFORE the per-query rank "
        "window so top-k tie-breaks are cross-engine deterministic."
    ),
    "events_funnel_steps": (
        "Strict-order funnel: each level is a keys-only equi-join of "
        "the next step's TYPE-FILTERED events (pushdown keeps "
        "non-participating rows out of the exchange) against the "
        "previous level's (user, min-ts) - per-user state is one "
        "timestamp, never the event history, and every stage hashes "
        "on user_id. The three 1-row step counts union at the end; "
        "counts are non-increasing by construction."
    ),
    "fuzzy_edit1": (
        "Deletion-neighborhood fuzzy match (FastSS/SymSpell shape): "
        "each string emits len+1 variants via one array+explode, "
        "candidates come from an EQUI-join on the variant key, and "
        "the exact levenshtein verify filters the theorem's false "
        "positives (ab/ba). The oracle is the O(n^2) brute-force "
        "join this plan must never contain - no CartesianProduct / "
        "BroadcastNestedLoopJoin (pinned in test_dedup_recall)."
    ),
    "events_ewma": (
        "Sequential per-group recursion (state depends on the previous "
        "row's OUTPUT - no Spark window expresses it): ONE hash "
        "exchange on user_id feeds FlatMapGroupsInPandas, per-task "
        "state is a single user's series. The oracle is a DuckDB "
        "RECURSIVE CTE over the same expression tree: with a "
        "power-of-two alpha both per-step products are exact, so raw "
        "doubles match bit-identically across engines - 10k rows "
        "hash-equal through an iterative Python kernel."
    ),
    "scd2_snapshot_at": (
        "Time travel as a map-only interval filter over the history "
        "scan (effective_from <= d < effective_to, NULL-open): the "
        "predicate reaches parquet row-group stats, so a "
        "date-clustered history prunes to the overlapping files at "
        "100 TB. The expensive part (the SCD-2 build) is shared with "
        "scd2_customer; the snapshot adds zero exchanges."
    ),
    "events_sequence_match": (
        "MATCH_RECOGNIZE-lite CEP without a self-join: running "
        "max(CASE type) windows over a ROWS frame carry 'last A / "
        "last blocker before me', so the A-then-B-no-C-between test "
        "is a map-side predicate after ONE user_id exchange - the "
        "sessionize partitioning. The naive shape (events JOIN events "
        "ON a.ts < b.ts) is quadratic per user; this is linear in "
        "the timeline."
    ),
    "orders_histogram_equidepth": (
        "Equi-depth (CBO-style) histogram without a global "
        "single-partition window: range-partition + in-partition sort "
        "on (value,id), 32 shard counts to the driver (bounded state), "
        "offsets broadcast back, per-shard rank window, then exact SQL "
        "ntile arithmetic (front-loaded remainder - a naive "
        "floor(p*k/N) alternates big buckets and diverges from every "
        "engine's ntile, observed). localCheckpoint pins ONE "
        "materialized partitioning across the two actions: "
        "repartitionByRange re-samples its bounds per execution, and "
        "offsets computed for one partitioning applied to another "
        "skewed bin counts ~1% (observed, fixed, pinned by the "
        "partition-invariance test)."
    ),
    "split_leakage_safe": (
        "Cluster-granular split: LSH band equi-join makes candidate "
        "pairs, min-label propagation shuffles only (id,label) pairs "
        "per round with localCheckpoint lineage truncation, then ONE "
        "doc-id join attaches components; the md5 split hash is a "
        "free projection. Docs join components once - text moves "
        "never, and split assignment stays stable as the corpus grows."
    ),
    "fuzzy_jw": (
        "JW record linkage: project -> equi-join on (2-char block, "
        "provable 5th-4 length band) -> hash-repartition of candidate "
        "pairs -> ArrowEvalPython verify. The repartition is "
        "load-bearing: the block join leaves one partition per prefix "
        "on template corpora, serializing the Python kernel (11.3 -> "
        "6.2 s measured); after it the kernel runs on every core. No "
        "CartesianProduct / BroadcastNestedLoopJoin."
    ),
    "entity_golden": (
        "Full ER pipeline in one plan: JW candidate join + kernel -> "
        "min-label component rounds (localCheckpoint-pinned, "
        "(id,label) exchanges only) -> left join back to docs -> one "
        "count aggregate + two per-attribute vote windows on the "
        "cluster key. Text crosses an exchange exactly once (the "
        "candidate pair columns); survivorship shuffles (cluster, "
        "value, count) triples."
    ),
    "graph_walks": (
        "walk_len bounded join rounds over a rank-indexed adjacency: "
        "each step is state JOIN ranked ON node with the md5-mod-deg "
        "pick as a post-join filter; per-step lazy localCheckpoint "
        "stops the step-union re-executing join prefixes (quadratic "
        "in walk_len without it - 10.8 -> 5.9 s measured). Exchanges "
        "carry (start, node) pairs; adjacency ranking happens once."
    ),
    "events_survival": (
        "Kaplan-Meier: one duration aggregate collapses the cohort to "
        "the calendar-bounded time axis; the cumulative windows and "
        "ordered-fold survival product run on those few dozen rows "
        "(the one-partition window is over the TIME AXIS, not the "
        "cohort). All O(data) work is the first hash aggregate."
    ),
    "events_seasonal": (
        "Seasonal decomposition: one hourly aggregate, then ROWS "
        "windows + one broadcast join back from the 24-slot seasonal "
        "table. Every float is an exact integer numerator over a "
        "constant denominator - the plan has no rounding because the "
        "arithmetic needs none."
    ),
    "events_kmv_setops": (
        "Theta-style set algebra: two k=16 sketch builds (distinct + "
        "per-day rank window + array_agg), a sketch-row equi-join on "
        "day, list arithmetic in the projection. Exact-count side is "
        "one distinct-pairs aggregate + a keys-only self-join. At "
        "100 TB the sketch join is two tiny rollup tables."
    ),
    "incremental_join_view": (
        "Delta rule: three joins, every one delta-driven - the two "
        "history sides are probed by BroadcastHashJoin on the "
        "broadcast delta batch and never shuffle; history never joins "
        "history. Maintenance cost O(batch), not O(view)."
    ),
    "hybrid_rrf": (
        "RRF fusion: both retrievers' top-20 lists union (ranks only), "
        "one (query,id) hash aggregate sums the 1/(60+rank) credits, "
        "one per-query top-k window. Scores never cross the fusion "
        "boundary; documents never shuffle past retrieval."
    ),
    "item_item_cf": (
        "Item-item CF: basket self equi-join (volume "
        "sum-of-basket-sizes-squared, never corpus-squared), two "
        "item-sized support aggregates joined back, cosine rounds "
        "6dp BEFORE the per-item rank window. The neighbour-list "
        "build every recommender serves from."
    ),
    "doc_negatives": (
        "Negative sampling: two-phase sharded rank gives dense "
        "positions (no one-partition window), a bounded k-times-"
        "oversample fan-out equi-joins slots back to positions, one "
        "(anchor,neg) aggregate + per-anchor window. ids only ever "
        "shuffle; md5 is the RNG so the plan is replayable."
    ),
    "chunk_cdc": (
        "CDC chunking: boundary scan is transform+filter over "
        "sequence() INSIDE the row - one WholeStageCodegen projection, "
        "no per-character explode - then ONE Generate per chunk. "
        "Map-only: no exchange anywhere."
    ),
    "orders_gini": (
        "Gini: per-customer cents aggregate -> two-phase sharded rank "
        "(range partition pinned by localCheckpoint, offsets from an "
        "n_shards-row driver read) -> one global aggregate with the "
        "decimal(38) moment accumulator. No one-partition window over "
        "the unit table."
    ),
    "events_cuped": (
        "CUPED: one per-user aggregate (integer cents), one per-arm "
        "moment aggregate (arm-count rows), pooled theta from summing "
        "those rows broadcast back. The adjusted variance is closed-"
        "form - y_adj never materializes, so the plan has exactly two "
        "aggregates regardless of metric count."
    ),

    "docs_mutual_info": (
        "MI: one contingency aggregate; marginals are window sums "
        "OVER the cells (cell-count rows, not data rows), one final "
        "1-row aggregate. Integer-ratio log trees; the only "
        "order-dependent float is the cell sum."
    ),
    "text_source_kl": (
        "Per-source KL: one (source, token) aggregate; source/corpus "
        "totals as window sums over it; per-source 1-row-per-source "
        "result. Vocab-sized exchanges (Heaps-law), never corpus."
    ),
    "text_zipf": (
        "Zipf fit: tokenize aggregate -> vocab-sized rank window -> "
        "closed-form OLS in one final aggregate. The rank window is "
        "vocab-bounded, not corpus-bounded."
    ),
    "events_seasonal_anomaly": (
        "Decomposition + MAD gate composed: adds two exact-percentile "
        "aggregates and broadcast joins over the ~700-row residual "
        "table. O(data) cost unchanged from events_seasonal."
    ),
    "events_acf": (
        "ACF: time-axis table fans out x max_lag and equi-joins on "
        "the row number (no per-lag passes, no dynamic lead); one "
        "per-lag moment aggregate. All exchanges are "
        "time-axis x max_lag bounded."
    ),
    "events_xcorr": (
        "XCF: identical shape to events_acf with signed lags riding "
        "the same single join; coalesced zeros keep silent hours as "
        "data, not gaps."
    ),
    "events_top_paths": (
        "Path analysis: ordered per-(user,day) aggregate sliced at 3 "
        "(bounded arrays, never the unbounded collect_list hazard), "
        "one path count, one deterministic top-k window."
    ),
    "lineitem_weighted_median": (
        "Weighted median: cumulative-weight window over the "
        "distinct-value table, 2*cum >= total comparison that never "
        "divides - integer-exact end to end."
    ),
    "events_churn_features": (
        "Training-set builder: one per-user pass with a leak-proof "
        "integer-us wall splitting feature and label windows, plus a "
        "1-row median broadcast for the balanced label."
    ),
    "events_user_entropy": (
        "Behavioral entropy: one (user,type) aggregate; totals as "
        "window sums over the cells; integer-ratio log trees."
    ),
    "orders_lorenz": (
        "Lorenz deciles: per-customer cents aggregate -> exact-ntile "
        "bucket arithmetic -> 10-row cumulative windows. The window "
        "over customers is the pareto-decile shape (range-partitioned "
        "sort at scale)."
    ),
    "orders_theil": (
        "Theil T: per-customer cents -> window totals -> one 1-row "
        "aggregate of integer-ratio log terms. Decomposability means "
        "segment attribution needs only per-segment reruns of the "
        "same shape."
    ),
    "events_burstiness": (
        "Fano factor: daily-count aggregate -> per-user moment "
        "aggregate -> closed-form variance/mean. Two exchanges, both "
        "key-sized."
    ),
    "orders_hhi": (
        "HHI: broadcast customer dim -> per-(segment,customer) cents "
        "-> per-segment exact sums ratio with a 128-bit squared "
        "accumulator. Groups are segment-sized; no window at all."
    ),
    "dedup_substring_spans": (
        "Lee-et-al exact span removal (r6): shingling is a narrow "
        "O(n*k) expression (whole-stage codegen); exactly TWO "
        "exchanges of compact tuples - (16-byte hash, id, pos) for "
        "the global first-occurrence window, then (id, pos) for the "
        "island merge + reassembly join. Document text never enters "
        "an Exchange; islands collapse before the coverage test."
    ),
    "text_lr_train": (
        "Distributed LR training (r6): per-iteration one two-phase "
        "aggregate over (feature, residual) pairs - gradients partial-"
        "combine before the exchange, the 33-element weight vector is "
        "the only driver state (k-means collect discipline), features "
        "re-derive from the cached hashed corpus each step."
    ),
    "text_ngram_novelty": (
        "Per-doc novelty (r6): array_distinct collapses grams inside "
        "the array BEFORE anything shuffles; two exchanges of "
        "(md5 hash, id) tuples only - one groupBy(gram) for the "
        "global first-seen id, one groupBy(id) to re-aggregate. Text "
        "never shuffles (plan-pinned in tests/test_plans.py)."
    ),
    "events_ks_test": (
        "Exact two-sample KS (r6; r7 sharded): one union + "
        "groupBy(cents) collapse (domain-bounded), then the TWO-PHASE "
        "SHARDED prefix sum (operators/rank.py): range shards pinned "
        "by localCheckpoint (the plan below starts at the checkpoint "
        "scan), Window.partitionBy(_pid) per shard, the ONLY "
        "unpartitioned window on the 32-row shard-totals table, side "
        "totals a 1-row broadcast. No partition ever sorts more than "
        "~domain/32 rows - the unquantized-domain fix of the r6 "
        "verdict's standing weak."
    ),
    "quality_lr_pipeline": (
        "Train-serve closure (r7): training ran at plan-build time "
        "(10 integer gradient collects, driver state = 33 weights); "
        "the SERVE plan below is a single narrow pass - tokenize, "
        "hash to buckets, fold the weight literals, rational sigmoid, "
        "gate - zero joins, zero shuffles, zero Python. The corpus "
        "never moves; the model travels as literals."
    ),
    "events_bh_fdr": (
        "Welch family + BH (r6): the p-family is one two-phase "
        "decimal-moment aggregate (groups are the only shuffle); the "
        "BH ranks/reverse-running-min windows run on the TESTS-"
        "domain-sized table (a handful of rows), never on data."
    ),
    "events_did": (
        "Difference-in-differences (r6): ONE two-phase global "
        "aggregate builds all twelve 2x2 cell moments - a single "
        "1-row exchange; estimate/SE/z/p are plan-side float trees "
        "over the exact moments. The cheapest possible causal shape."
    ),
    "csv_error_isolation": (
        "Format-layer T8 (r6): to_csv -> union planted bad lines -> "
        "from_csv PERMISSIVE, all inside one narrow Project - a "
        "map-only plan with zero exchanges; per-record corruption "
        "isolates into a column instead of failing the job."
    ),
    "graph_adamic_adar": (
        "Bipartite AA (r6): one degree aggregate, one wedge equi-join "
        "of the edge list with itself on the right node - fan-out "
        "C(deg,2) per right node, which is why the ENTRY orients "
        "supplier-pairs-via-parts (part degree bounded ~4-7 at every "
        "sf) and carries a max_degree hub cap; contributions are "
        "pre-quantized integers, so the pair aggregate partial-"
        "combines before its exchange; top-k is a TakeOrdered."
    ),
    "pipeline_curation_gate": (
        "Curation gate (r6): quality stats, langid argmax, PII "
        "counts and the drop_reason CASE chain are ALL per-row "
        "expressions in one narrow Project over the scan - zero "
        "exchanges, zero joins; the cheapest possible shape for a "
        "full-corpus pass."
    ),
    "dedup_eval_prf": (
        "Dedup P/R/F1 (r6): the band self-join (keys only) feeds "
        "three 1-row count aggregates joined by broadcast - the "
        "truth set derives from the id arithmetic, so no text and "
        "no data-sized table enters any exchange beyond the LSH "
        "band join itself."
    ),
    "events_hll_distinct": (
        "The sketch IS the aggregation state: partial max collapses "
        "each map task to <= 256 (group, j) rows before the exchange, "
        "so the shuffle carries groups x registers regardless of row "
        "or distinct count - the shape that replaces the 1e11-key "
        "distinct shuffle at 100 TB. The estimate agg runs over <= m "
        "rows per group; harmonic sums stay exact bigints end-to-end."
    ),
    "events_hll_wau": (
        "Materialized daily register tables fan out (explode over 7 "
        "window days - tiny: <= 256 rows/day) and every window merge "
        "is one register-max hash agg. Raw events are scanned ONCE to "
        "build daily sketches; no per-window re-scan exists in the "
        "plan. The exact-WAU twin side carries the only range join."
    ),
    "graph_clustering_coeff": (
        "Wedge build and closure are plain equi-joins on node keys "
        "(SortMergeJoin/ShuffledHashJoin under AQE) - no "
        "CartesianProduct anywhere. Degree-ordered orientation caps "
        "out-degree at O(sqrt(m)), so the wedge exchange is O(m^1.5) "
        "worst-case and hub-flat (triangle_scale_probe: a degree-1e5 "
        "star adds zero wedges and zero wall)."
    ),
    "events_w1_drift": (
        "Drift family scale shape: groupBy(value) collapse "
        "(domain-bounded), sharded prefix scan for the cumulatives "
        "(_pid windows only), and the adjacent-value gaps REUSE the "
        "borrow-plan SNM (w=2) - its lead() windows partition by "
        "_bucket, shard-bounded by the same range partitioning. The "
        "exact integer area accumulates in decimal(38,0); one double "
        "division in the whole plan."
    ),
    "ml_pr_curve": (
        "Exclusive sharded scan gives tp/fp/fn at every attained "
        "threshold as exact integers; TakeOrderedAndProject caps the "
        "top-k - no global sort of the score domain materializes, "
        "and the only doubles are the three per-row divisions."
    ),
    "linkage_sorted_neighborhood": (
        "Rank comes from the sharded scan (repartitionByRange + "
        "per-shard window + broadcast offsets - no single-partition "
        "Window.orderBy in the plan); the neighborhood is a bucket "
        "band equi-join (explode to 2 probes/row), so candidates are "
        "exactly <= n*w rows into the Arrow JW kernel. The only "
        "Python in the plan is the post-blocking verify."
    ),
    "ml_ndcg": (
        "One equi-join + one groupBy builds the candidates, then TWO "
        "windows both partitioned BY QUERY (millions of small "
        "partitions at scale, never global), a single hash aggregate "
        "pivots the integer gains into 2k MAX columns, and DCG/IDCG "
        "appear in the plan as ONE fixed-association expression over "
        "literal weights (visible in the Project: 0.6309297535714575 "
        "etc. - injected driver-side, so neither engine calls its own "
        "log2 and no float SUM exists). The whole metric is "
        "whole-stage-codegen arithmetic after the pivot."
    ),
    "token_oov_rate": (
        "The vocab is bounded by the argument (TakeOrdered top-N on "
        "two-phase token counts) and arrives as a BroadcastHashJoin "
        "build side - the occurrence stream never shuffles for "
        "membership. The two countDistincts expand to the standard "
        "3-branch gid Expand over (doc, token) pairs: bounded 3x of "
        "the pair stream, partial-aggregated map-side before the one "
        "hash exchange on doc_id."
    ),
}
def main() -> None:
    from etl_capnz_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("plans", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    qs = entrymod.queries()
    print(
        "# PLANS — executed physical plans of the headline queries "
        "(sf0.01, local[8])"
    )
    print()
    print("Generated by `python tools/gen_plans.py`. Each section: why the")
    print("plan is the one we want at 100 TB, then the executed plan (AQE")
    print("final).")
    for name, note in NOTES.items():
        df = qs[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        if len(plan) > 4000:
            plan = plan[:4000] + "\n  ... (truncated)"
        print(f"\n## {name}\n\n{note}\n\n```\n{plan}```")
    spark.stop()


if __name__ == "__main__":
    main()
