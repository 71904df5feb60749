"""Regenerate PLANS.md: formatted physical plans for representative
suite queries with the scale-relevant properties called out.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE

# query → what to look for in its plan
SHOWCASE: dict[str, str] = {
    "heaps_law": (
        "Both running sums (tokens, new types) ride ONE "
        "`Exchange rangepartitioning(_doc)`; the windows partition by the "
        "range-partition id (bounded), never a single-partition sort; the "
        "only `Exchange SinglePartition` rows are the one-row scalar "
        "aggregates (doc count, 5-sum OLS fit)."
    ),
    "skipgram_cooc": (
        "Pairs come from k zip_with slices flattened into ONE explode — "
        "NO join node anywhere; the only Exchange is the "
        "map-side-combined (`partial_count`/`partial_sum`) pair-count "
        "aggregate on vocabulary keys."
    ),
    "bootstrap_ci": (
        "The rows×B replicate explode is map-side (`Generate explode` "
        "inside the scan's codegen stage) into a map-side-combined "
        "(keys, b) aggregate (`partial_sum`); the nearest-rank window "
        "partitions by the group over B rows — no SinglePartition, no "
        "Python, zero RNG expressions."
    ),
    "hard_negatives": (
        "Exactly one `MapInPandas` (the Arrow kernel); the ranking window "
        "consumes the kernel's local top-k pre-reduction, so the shuffle "
        "into `Window` carries partitions × anchors × k rows, never "
        "N × anchors."
    ),
    "pricing_summary": (
        "Filter reaches the scan (`PushedFilters: [IsNotNull(l_shipdate), "
        "LessThanOrEqual(...)]`); `ReadSchema` carries 6 of 16 lineitem "
        "columns; partial_sum before the exchange (map-side combine); the "
        "whole pipeline is two codegen stages around one shuffle."
    ),
    "broadcast_rank_lut": (
        "The 7-row section-rank table broadcasts (`BroadcastExchange` → "
        "`BroadcastHashJoin`); the fact side never shuffles for the join."
    ),
    "anti_join": (
        "Compound-condition anti join stays a broadcast hash join with "
        "`LeftAnti` build side — no sort, no full shuffle of the probe side."
    ),
    "theta_self_join": (
        "Equi key (p) carries the join; the inequality (id != id) rides as a "
        "residual condition — no nested-loop fallback."
    ),
    "doc_profile": (
        "Single FileScan, zero Exchange, one `split(text)` feeding every "
        "derived stat (tokenize-once contract), all inside one codegen stage."
    ),
    "minhash_pairs": (
        "Signature build is one wide HashAggregate (8 min columns) over the "
        "exploded shingle stream; `InMemoryTableScan` shows both self-join "
        "sides reading the persisted signatures instead of recomputing."
    ),
    "simhash": (
        "Packed bit counters: ONE HashAggregate of 8 try_sum longs + count "
        "(partial_try_sum before the Exchange = map-side combine), the "
        "32-bit signature assembled in a single projection — no per-bit "
        "explode, no 32-column aggregate."
    ),
    "semantic_dedup": (
        "Frozen-quantizer assignment is one ArrowEvalPython stage emitting "
        "(id, unit-vec, cluster); ONE Exchange on the cluster key feeds "
        "`FlatMapGroupsInPandas` — the per-cluster X@X.T SemDeDup kernel — "
        "so pair scoring never joins or re-shuffles."
    ),
    "dedup_embedding_lsh": (
        "VERIFY-FIRST (round 9): the cosine HOF + threshold Filter sit "
        "directly on the bucket-join output, UPSTREAM of the pair-dedup "
        "Exchange — only slim (id_a, id_b, cos) survivor rows shuffle "
        "for dedup; the old shape shipped both dim-wide vectors per "
        "candidate through that Exchange (measured 2.1× the join cost "
        "at 16×).  Both join sides read the ONE persisted bucketed "
        "table (InMemoryTableScan)."
    ),
    "ingest_neardedup_replay": (
        "The streaming near-dup fold as one lazy plan: the corpus band "
        "table materializes ONCE (InMemoryTableScan on every batch "
        "slice — signatures are per-doc facts, identical whichever "
        "batch computes them), each of the K stages is a bucket-keyed "
        "left_semi (index hit) + left_anti (drop) pair, and the "
        "within-batch first-id-wins is a bucket self-join — no writes, "
        "no driver data, no cartesian."
    ),
    "text_keys_nostem": (
        "The grounding key chain minus its one Python stage: pure "
        "whole-stage-codegen HOFs (split, case-sensitive stopword "
        "filter, lower+cleanup transform, sorted-distinct / "
        "order-preserving array_join) — ZERO exchanges beyond the scan "
        "(a per-row map), no EvalPython anywhere."
    ),
    "ingest_dedup_replay": (
        "The streaming fold as one lazy plan: K chained left_anti "
        "probes against the accumulating accepted union + per-batch "
        "first-id-wins (partial_min HashAggregate feeding a "
        "left_semi) — the SAME `_dedup_step` the foreachBatch writer "
        "runs; no writes, no driver data, each anti-join keyed on the "
        "16-byte digest."
    ),
    "literature_relevance": (
        "The production relevance slice: disambiguate's two windowed "
        "mins partition by (pmid, type, keyword) and (type, keyword) — "
        "group-parallel, never SinglePartition; literature_index's "
        "section collect, running flatten and harmonic zip_with fold "
        "all ride partitioned Windows; the section-rank LUT attaches "
        "as a BroadcastHashJoin."
    ),
    "scrub_dup_passages": (
        "No sort window anywhere: first occurrences are partial_min(struct) "
        "HashAggregates on the md5 digest (map-side combine flattens hot "
        "passages before the Exchange — the round-4 16x cliff is gone), "
        "winners regroup per doc, and a slim (id, n_passages) spine "
        "left-joins the rebuilt text."
    ),
    "vocab_coverage": (
        "Zipf rank + running coverage through operators/ranking.py: one "
        "range Exchange, a Window PARTITIONED by the range-partition id "
        "(bounded groups), the grand total as a literal from the collected "
        "partition stats — no single-reducer Window, no second corpus scan."
    ),
    "user_ewma_segmented": (
        "Two HashAggregates: (user, day) summaries fold day-bounded arrays "
        "map-side; the per-user combine folds ~#days structs — the whale "
        "user's 10^6-element array never exists."
    ),
    "binary_ann_topk": (
        "1-bit prescreen: the corpus side of the Hamming join is a "
        "signatures-only projection (two packed longs + id — the float "
        "vectors never enter the prescreen scan); the exact-cosine rerank "
        "joins the tiny shortlist back to the corpus to fetch vectors on "
        "demand."
    ),
    "pq_ann_topk": (
        "Product quantization: encode and the M×K query distance tables "
        "are Arrow-batched numpy kernels (`MapInPandas`, explicit "
        "left-fold accumulation so the doubles match the SQL oracle "
        "bit-for-bit), the tables ride the BroadcastExchange, ADC scoring "
        "is a fixed 8-lookup chain in codegen, and only the per-query "
        "top-k window shuffles."
    ),
    "ivfpq_topk": (
        "The composed index: one MapInPandas emits (id, list_id, codes); "
        "probed queries broadcast; ADC scoring is the 8-lookup chain after "
        "the list_id equijoin — float vectors never appear downstream of "
        "the encode stage."
    ),
    "ann_topk_blocked": (
        "The vectorized exact top-k: one ArrowEvalPython-free mapInPandas "
        "stage (`MapInPandas`) pre-reduces each corpus partition to k rows "
        "per query, so the only Exchange before the ranking window carries "
        "partitions × Q × k rows — the N × Q blowup of the broadcast "
        "nested-loop variant never materializes."
    ),
    "pii_protect": (
        "Redaction/pseudonymization/banding are all in the scan-side "
        "Project; the single Exchange is the k-anonymity window on the "
        "quasi-identifier key."
    ),
    "decontaminate": (
        "The benchmark gram set builds once and broadcasts "
        "(`BroadcastExchange` under `BroadcastHashJoin LeftOuter`); the "
        "corpus side is a single scan → single tokenize → explode_outer → "
        "partial_count before the only exchange (one row per document "
        "after map-side combine).  At 100 TB the corpus never shuffles "
        "its grams — only per-doc count rows move."
    ),
    "window_dup_stats": (
        "The substring-dup signal has NO pair join and ONE FileScan: "
        "tokenize → window-hash explode, document frequency as "
        "`count OVER (PARTITION BY hash)` (a `Window` node, not a "
        "groupBy+join that would re-derive the stream), then the "
        "per-document rollup — two shuffles, both linear in the window "
        "stream."
    ),
    "bm25_topk": (
        "BM25 search: ONE parquet scan — the staged token array "
        "(`Project` over `Project`, split() evaluated once per row, not "
        "once per term) feeds a persisted slim (id, dl, tf...) table "
        "(`InMemoryRelation`) read by BOTH the corpus-stats rollup and "
        "the scoring side; the single-row stats aggregate broadcasts "
        "back (`BroadcastNestedLoopJoin` over one row); "
        "`TakeOrderedAndProject` caps every partition at k rows — no "
        "global Sort, no SortMergeJoin anywhere."
    ),
    "events_segment_hourly": (
        "Stream-static enrichment (batch twin): the customer dimension "
        "broadcasts (`BroadcastHashJoin LeftOuter`) so the events side "
        "never shuffles for the join; the only Exchange is the windowed "
        "rollup's, with partial aggregation before it."
    ),
    "zorder_locality": (
        "Z-order binning: the per-column min/max single-row aggregate "
        "broadcasts back (`BroadcastNestedLoopJoin` over one row) and "
        "the Morton interleave is pure integer projection — the only "
        "data-row Exchange is the final bucket rollup's, with partial "
        "aggregation before it."
    ),
    "table_profile": (
        "Profiling: typed null/min/max stats are ONE single-row "
        "HashAggregate over one scan; the exact distincts come from the "
        "melted (col_name, value) explode whose partial-distinct "
        "aggregate keys the shuffle by column AND value — no "
        "count-distinct branch funnels through a single reducer."
    ),
    "dedup_components": (
        "Each large-star/small-star round is group-bys/joins over a "
        "2-long edge table; the displayed plan is the FINAL labeling "
        "aggregate reading the last round's `localCheckpoint` "
        "(`LocalTableScan`/checkpoint scan), so the iterative phase's "
        "lineage never re-executes.  Checkpoint-per-round is what keeps "
        "Catalyst analysis O(1) per round instead of O(2^rounds)."
    ),
    "k_core": (
        "Iterative degree peel: the displayed plan is the FINAL degree "
        "aggregate reading the fixpoint round's `localCheckpoint` — one "
        "exchange keyed by node, map-side partial_count; the peel "
        "rounds themselves (degree agg + broadcast survivor semi-joins "
        "under loop-scoped shuffle confs) are materialized checkpoints "
        "whose lineage never re-executes."
    ),
    "winnow_pairs": (
        "Winnowing sketch: one corpus scan builds the per-row gram-hash "
        "array and the window-min fingerprint selection entirely inside "
        "codegen (no explode until the final (id, fp) emit); both "
        "self-join sides read the persisted fingerprint table "
        "(`InMemoryTableScan` ×2) and pairs come from a hash equijoin on "
        "the 8-byte fingerprint — never all-pairs."
    ),
    "lm_doc_logprob": (
        "Bigram-LM scoring: the instance table materializes once and "
        "feeds BOTH the count rollup and the scoring join "
        "(`InMemoryTableScan` ×2); gram counts reduce with map-side "
        "partial_sum before their exchanges; the vocabulary scalar "
        "attaches via a single-row broadcast.  No hard-coded broadcast "
        "on the count tables — at 100 TB they are vocabulary-sized and "
        "AQE picks shuffle-hash joins co-partitioned on the gram key."
    ),
    "prefix_jaccard": (
        "PPJoin with all FOUR lossless filters: candidates come from a "
        "self-equijoin on the EXPLODED RARE-TOKEN PREFIX only (slice of "
        "the persisted rank-array table), with a DISTRIBUTED global "
        "token rank (range Exchange + monotonically_increasing_id + "
        "broadcast offsets; no `Exchange SinglePartition`, test-"
        "pinned).  The ICDE'06 LENGTH filter and WWW'08 POSITIONAL "
        "filter apply BEFORE the pair-dedup Exchange; the pair "
        "aggregation then applies BOTH the min-slack bound and the "
        "full PPJoin COUNT bound (overlap <= matched-prefix count + "
        "min remaining suffix).  The verify is a deliberate SHUFFLE "
        "join (the broadcast-record-table variant was measured and "
        "rejected — hash relations over rank arrays cost hundreds of "
        "MB of heap; see DESIGN.md); exact-Jaccard is per-pair "
        "array_intersect, no re-tokenization anywhere."
    ),
    "rrf_hybrid": (
        "Reciprocal-rank fusion: each ranking reaches its top-50 via "
        "`TakeOrderedAndProject` (per-partition local k, no global "
        "sort); the <=k survivors are ranked by the 1-partition "
        "zipWithIndex (range Exchange + monotonically_increasing_id — "
        "NO WindowExec anywhere, so the `No Partition Defined` "
        "degradation warning is gone from bench logs) and the fusion "
        "is one hash aggregate over exact integer nano-unit "
        "contributions."
    ),
    "ann_recall_at_k": (
        "Recall accountability: the exact top-k materializes once "
        "(`InMemoryTableScan`) and rides a BroadcastExchange into five "
        "per-method left_semi joins; each method's leg pre-reduces to a "
        "single-row count before the 1×1 cross joins, so the union "
        "carries five rows total."
    ),
    "edit_distance_join": (
        "FastSS candidates come from an equijoin on deletion keys — no "
        "cartesian/theta join anywhere; the vocabulary aggregate is "
        "computed once (AQE `ReusedExchange` at runtime) and the "
        "`levenshtein` verify rides the join condition, so false "
        "positives die before the pair-dedup aggregate."
    ),
    "robust_outliers": (
        "Both median passes aggregate to DISTINCT (key, value) counts "
        "BEFORE their window (partial_count = map-side combine; the "
        "window sorts distinct values, not raw rows) and every window is "
        "partitioned by event_type — no `SinglePartition`; the slim "
        "per-group stats row returns via `BroadcastHashJoin`."
    ),
    "dq_verify": (
        "Completeness/compliance/bounds and BOTH count-distinct metrics "
        "share one scan (`Expand` fans the distinct columns inside a "
        "single aggregate); uniqueness reads only its pruned column; the "
        "referential leg is a hash join against deduplicated dimension "
        "keys."
    ),
    "graph_triangles": (
        "Triangles count via ADJACENCY INTERSECTION over the "
        "degree-ORIENTED edges (max out-degree O(√m) — the "
        "last-reducer fix): two node-keyed hash equijoins attach "
        "collected out-neighbor arrays and array_intersect runs per "
        "edge inside codegen, so only the m oriented edges shuffle — "
        "never Σ C(outdeg,2) wedge rows; the only nested-loop joins "
        "are the 1-row scalar combines of the summary, which include "
        "the wedge-volume accountability columns (n_candidates, "
        "max_out_degree) so scale cells stay value-verified."
    ),
    "pagerank": (
        "NO edge-sized shuffle inside the loop: the node-sized rank "
        "frame broadcasts into the contrib join "
        "(`BroadcastHashJoin`) over the persisted edge spine, and the "
        "dst aggregate partial-sums map-side so the one shuffle per "
        "iteration carries N rows, not |E|; the rank frame is an "
        "eager localCheckpoint each round (5 shallow stages, not a "
        "growing DAG), the loop runs under loop-scoped shuffle "
        "settings (AQE off, partitions ∝ N), and the static "
        "dangling/outdeg structure is ONE fused edge-sized "
        "aggregation hoisted before the loop — skipped entirely per "
        "iteration for dangling-free graphs."
    ),
    "ivfpq_rerank_topk": (
        "Two-phase refine: the IVF-PQ shortlist (already "
        "broadcast-probed) joins back to true vectors via a "
        "BroadcastHashJoin of the candidate pairs into ONE corpus scan "
        "— refine cost ∝ shortlist, never corpus; the only hash "
        "shuffle is the per-query top-k window over ≤ n_q × m scored "
        "rows."
    ),
    "hdr_quantile_sketch": (
        "Histogram build is one map-side projection + a (g, b)-keyed "
        "aggregation with partial counts — the shuffle carries at most "
        "~63·m cells per key, sketch-sized; the cumulative walk and "
        "the exact-accounting rank window partition by g (no "
        "single-reducer sort); the merged ALL row re-aggregates "
        "sketch cells, never the raw rows."
    ),
    "incremental_agg": (
        "Pure aggregation end to end: every leg (base build, insert "
        "delta, delete delta) partial-aggregates map-side before its "
        "exchange, the final merge groups state + delta rows — no "
        "join of the facts back into the state, no fact rescan."
    ),
    "bloom_join_prune": (
        "The m_bits/64-long filter rides a single-row "
        "BroadcastNestedLoopJoin and the bit tests appear as a Filter "
        "on the big side BEFORE the equijoin — rows are dropped "
        "map-side pre-shuffle; the join strategy itself stays "
        "Catalyst's choice."
    ),
    "zonemap_skip": (
        "After the corpus projection everything is file-count-sized: "
        "two grouped aggregations build the n_files-row zone maps "
        "(map-side partial min/max), and the overlap counts are "
        "single-row combines against the broadcast global-stats row."
    ),
    "funnel_steps": (
        "The step-type IN filter is pushed to the events scan; each "
        "frontier advance is an equijoin on the shrinking user set + "
        "a keyed min with map-side partial aggregation; the report "
        "rows are single-row count combines."
    ),
    "quality_thresholds": (
        "LM scoring reuses the lm family's proven join plan; the "
        "sketch and threshold stages are sketch-sized; the "
        "per-language threshold table rides a BroadcastExchange into "
        "the flagging join, so scored corpus rows are never shuffled "
        "for it."
    ),
    "gap_fill_ffill": (
        "The dense bucket grid is `Generate explode(sequence(...))` INSIDE "
        "the task that owns the key — no driver materialization; the "
        "per-bucket dedup window, the grid join, and the forward-fill "
        "window key on the same user column, and the fill is "
        "`last(ignorenulls)` over a row frame (O(1) running state, no "
        "per-key array).  No SinglePartition exchange anywhere."
    ),
    "asof_enrich": (
        "No join operator at all: both event streams union, take ONE "
        "hash exchange on user_id, and the latest click payload rides a "
        "`last(_rrow, ignorenulls)` row-frame window — O(1) running "
        "state per key.  Both event_type filters are pushed into the "
        "parquet scans."
    ),
    "asof_segmented": (
        "The whale-safe twin: the carry exchange keys on "
        "(user_id, _seg) — a hot key's sort splits across its day "
        "slices — both the within-slice and whole-slice carries ride "
        "that ONE exchange as two window functions; the per-slice "
        "summary frame (keys × segments rows) chains with a "
        "keys-partitioned window and joins back on (user_id, _seg), "
        "where the big side reuses the existing partitioning."
    ),
    "interval_overlap": (
        "The range join never theta-joins: each interval explodes to "
        "its covering bins via in-task `Generate explode(sequence)`, "
        "candidates meet in a hash EQUIJOIN on the bin id (broadcast "
        "here, sort-merge at scale, AQE-splittable on skewed bins), the "
        "exact overlap predicate rides the join condition, and the "
        "meeting-bin filter dedups multi-bin pairs without a distinct."
    ),
    "point_in_interval": (
        "Asymmetric range join: the corpus-sized point side maps to ONE "
        "bin via a plain projection — the single Generate in the plan "
        "belongs to the small interval side.  One hash exchange each, "
        "equijoin on the bin, containment verified in the join "
        "condition, no dedup needed by construction."
    ),
    "compaction_plan": (
        "The manifest prefix sum runs on the distributed rank "
        "(RangePartitioning exchange + per-partition sums + broadcast "
        "offsets) — no SinglePartition window anywhere, so planning a "
        "billion-file manifest is itself a distributed job."
    ),
    "training_shuffle": (
        "The global shuffle position is the distributed rank — "
        "RangePartitioning exchange on the md5 key + per-partition "
        "numbering + broadcast offsets; no SinglePartition sort touches "
        "the corpus, so shuffling 100 TB into shards is itself "
        "distributed."
    ),
    "img_near_dup": (
        "One plan end to end: Arrow-batched BMP decode (mapInPandas), "
        "block-mean embedding assembly via an ordered collect, then the "
        "brute cosine verify — quadratic BY DESIGN as the exactness "
        "baseline (sampled here; the LSH route is the scale path)."
    ),
    "asof_nearest": (
        "Both the backward and forward carries ride ONE hash exchange "
        "(same partition keys — the second Window just re-sorts in "
        "place); the closer side wins per row.  Still zero join "
        "operators for a three-direction as-of family."
    ),
    "asof_forward_tolerance": (
        "Same zero-join union-and-carry shape as asof_enrich, reversed "
        "time order + tolerance null-out — still one hash exchange and "
        "one window pass; direction and tolerance are pure expression "
        "changes, not new operators."
    ),
    "multimodal_resize": (
        "Three Arrow-batched mapInPandas stages in one plan — encode, "
        "resample+re-encode, decode — with no shuffle anywhere: media "
        "transforms are embarrassingly parallel and stay in the "
        "partition that owns the row."
    ),
    "scd2_time_travel": (
        "Each snapshot read is a pure validity-interval Filter over the "
        "history — zero additional shuffle beyond the history build "
        "itself; at rest the predicate pushes to the parquet footer and "
        "skips closed-history files."
    ),
    "touch_attribution": (
        "The whole attribution — last touch, first touch, touch count — "
        "is ONE Window exec over one (user_id) exchange: three "
        "accumulators on a RANGE frame over microsecond event time; "
        "the conversion filter prunes AFTER the frame so the window "
        "sees every touch, and no join appears anywhere in the plan."
    ),
    "gap_fill_interpolate": (
        "Both interpolation brackets are RUNNING frames on the same "
        "(user) partitioning — the forward one over the reversed "
        "bucket order, so the plan shows two in-partition Sorts but "
        "only the grid-join exchanges; the naive unbounded-following "
        "frame would re-scan to partition end per row (O(grid²), "
        "measured 10.3 s vs 1.6 s at sf0.1)."
    ),
    "kn_lm_score": (
        "The KN model is never broadcast by construction: the four "
        "count tables (prefix totals, bigram counts, follower/"
        "predecessor types) join back onto the persisted instance "
        "frame co-partitioned on the gram key — AQE picks broadcast "
        "at test scale, but nothing in the plan hard-codes it; T is "
        "the one scalar, attached via a single-row broadcast."
    ),
    "funnel_windowed": (
        "Each funnel step is a user-keyed hash EQUIJOIN with the "
        "window bound riding as a residual range condition — no "
        "nested-loop join anywhere; the distinct after each step "
        "keeps the feasible-time set, and every stage shrinks with "
        "the surviving user set."
    ),
    "weighted_median": (
        "Rows collapse to (key, value) weight cells in the map-side "
        "partial aggregate; the window pass runs over DISTINCT values "
        "per group and the 2·cum ≥ W test selects exactly one row — "
        "a hot value costs one cell, never its multiplicity."
    ),
    "binning_balance": (
        "Rows touch the plan once, in the groupBy(value) count; both "
        "histograms (equi-width arithmetic bins, equi-depth rank "
        "thresholds off the range-exchange global index) and the "
        "threshold build itself are per-distinct-value frames."
    ),
    "bloomindex_skip": (
        "After the single corpus projection every frame is files × "
        "probes sized: the probe set and its positions BROADCAST into "
        "position-keyed equijoins; the per-file position sets are the "
        "only corpus-derived state and they are index-sized, not "
        "corpus-sized."
    ),
    "hilbert_skip": (
        "The Hilbert d-index is a single `aggregate(sequence(...))` "
        "fold in the projection — O(bits) expression, no join, no "
        "Python; everything downstream of the corpus projection is "
        "file-count-sized aggregates of the simulated zone maps."
    ),
    "rp_ann_topk": (
        "The 16 projected coordinates are pure ±chains inside one "
        "codegen projection (no multiplies — sign flips are exact); "
        "the top-k stage is the standard broadcast-queries cosine "
        "plan over 4× fewer dimensions."
    ),
    "mmr_rerank": (
        "The returned plan is a flat union of the five checkpointed "
        "per-step picks: each step's scoring tree references the "
        "previous selection twice (max-sim join + anti-join), so "
        "without per-step truncation the logical plan doubles per "
        "step (~2^k nodes, measured 10k plan lines at k=5) — the "
        "checkpointed picks (≤ n_queries rows each) make plan growth "
        "linear in k; nothing corpus-sized appears after the "
        "shortlist's own top-k."
    ),
    "link_prediction": (
        "The capped wedge self-join is a plain shuffled equijoin on "
        "the center key; the node-sized degree frame broadcasts at "
        "all three attachment points (`BroadcastHashJoin`), and the "
        "existing-edge subtraction is a LeftAnti hash join — no "
        "cartesian, no nested loop anywhere."
    ),
    "seasonal_profile": (
        "Join-free: one map-side-combined HashAggregate pair to the "
        "(event_type, hour) grid, then a PARTITIONED window over the "
        "≤24-row per-key grid for the grand totals — no "
        "SinglePartition exchange, no Python eval node."
    ),
    "ngram_containment": (
        "Both inverted-index sides re-explode from the ONE "
        "InMemoryTableScan of the compact (id, n_sh, grams) table — "
        "single tokenize pass; the overlap count is a shuffled "
        "equijoin on the 8-byte shingle hash with map-side-combined "
        "pair aggregation; both directed containments derive from "
        "the same overlap column in one projection."
    ),
    "moore_lewis_select": (
        "Both bigram LMs score the one materialized instance table "
        "in a single join pipeline: self counts attach inner, target "
        "counts LEFT with zero-coalesce, and the two vocabulary "
        "scalars ride one-row BroadcastNestedLoopJoins; the "
        "selection window partitions by shard — nothing here is "
        "corpus-shaped except the instance scan itself."
    ),
    "ks_drift": (
        "Cell collapse first: ONE map-side-combined HashAggregate to "
        "(key, value) cells with both side-counts, then a window over "
        "DISTINCT values per key and a final aggregate for the integer "
        "supremum — NO join node anywhere; the exchange volume is "
        "cells, not rows (a hot value costs one cell)."
    ),
    "grouped_ols": (
        "Two HashAggregate pairs total (the daily rollup + the six "
        "sufficient statistics), no window, no join, no "
        "SinglePartition; the closed-form slope/intercept/r2 are "
        "per-row projections over exact BIGINTs."
    ),
    "kmv_source_overlap": (
        "The final plan reads the CHECKPOINTED k-row sketch (no "
        "parquet rescan — the data-sized build ran exactly once); "
        "pair thetas, below-theta counts and the common-hash equijoin "
        "are all broadcast hash joins over sketch-sized frames."
    ),
    "ts_similar": (
        "The dense per-id vector frame (one hash aggregate: length-L "
        "array + Σv + Σv²) materializes ONCE (InMemoryTableScan feeds "
        "the map-side signature AND both verify sides); candidates "
        "are a pure signature equijoin with the hot-bucket valve; the "
        "exact-Pearson verify is a zip_with dot product on the pair "
        "join (deliberate lazy SHUFFLE joins — the forced broadcast "
        "was A/B'd and rejected, see DESIGN.md; AQE elects broadcasts "
        "from byte-based estimates) — no per-(pair, pos) shuffle, no "
        "cartesian, no nested loop."
    ),
    "cusum_changepoint": (
        "Cell collapse, one partitioned window over the <=31 "
        "positions per key, and a min(struct) argmax aggregate — no "
        "join; the scaled-integer CUSUM keeps every comparison exact."
    ),
    "event_transitions": (
        "One lag window on the high-cardinality user key (no hot "
        "reducer), one map-side-combined count pair, and a "
        "vocabulary-sized normalization window — no join anywhere."
    ),
    "metric_health": (
        "Three independent exact folds (OLS sufficient statistics, "
        "scaled-integer CUSUM, integer-supremum KS) joined on the "
        "5-row type key: every branch collapses to cells before its "
        "shuffle, and the final joins are over key-count-sized "
        "frames."
    ),
    "bfs_distances": (
        "The result is a union of per-hop checkpoints: each expansion "
        "hop joined the checkpointed symmetrized edge list against a "
        "BROADCAST frontier and anti-joined a BROADCAST settled set — "
        "no SortMergeJoin, no per-hop edge shuffle, no "
        "SinglePartition."
    ),
    "pmi_collocations": (
        "Bigrams come from zip_with over the per-doc token array — no "
        "positional self-join, no window; the min_pair_count filter "
        "sits BELOW the two unigram-vocabulary hash joins, so the "
        "join inputs are filtered-pair-vocab × vocab; the two corpus "
        "totals attach as one-row broadcasts."
    ),
    "naive_bayes": (
        "Training is two vocabulary-keyed hash aggregates; the 5-row "
        "class frame (priors + totals + vocab size folded in) attaches "
        "via ONE BroadcastNestedLoopJoin — the declared data-size of "
        "multinomial scoring — token likelihoods join on the (w, c) "
        "vocabulary key, and the argmax window partitions by doc."
    ),
    "rfm_segments": (
        "ONE RangePartitioning exchange for all three dimensions (the "
        "round-9 fusion: tag-stacked, direction-normalized sort keys; "
        "per-dimension rank = global rank − tag·n_users) and ZERO "
        "Window operators: the equi-depth binning rides the "
        "range-exchange global rank, never a single-partition ntile "
        "sort; the score pivot is one hash aggregate; the stitch join "
        "is user-keyed; scalar one-row aggregates (corpus max-ts, "
        "user count) are the only SinglePartition collapses."
    ),
    "acf_lags": (
        "All 7 lag columns ride ONE partitioned Window pass and all "
        "42 sufficient statistics come from ONE hash-aggregate pair; "
        "stack() unpivots to (key, lag) rows — no join, no per-lag "
        "pass anywhere in the plan."
    ),
    "benford": (
        "One corpus-collapse hash aggregate, then everything is "
        "digit-cell-sized: the 1..9 spine broadcast, the per-key "
        "total and chi² windows run over ≤9-row partitions."
    ),
    "ccf_lags": (
        "All 7 lead/lag shifted columns (k = −3..+3) ride ONE "
        "partitioned Window pass over the (cohort, day) cells; all "
        "42 sufficient statistics fold in one hash-aggregate pair; "
        "stack() unpivots — no self-join, no per-lag pass."
    ),
    "auc_roc": (
        "The corpus collapses to DISTINCT-SCORE cells map-side; the "
        "midrank window runs over cells, never subject rows; no join "
        "anywhere — a billion scored rows with a bounded score "
        "domain shuffle only the domain."
    ),
    "kaplan_meier": (
        "Subjects collapse to (cohort, duration) cells in one "
        "map-side aggregate; at-risk bookkeeping and the micro-nat "
        "running product are group-parallel cumulative windows over "
        "distinct durations — no join, no SinglePartition."
    ),
    "mann_kendall": (
        "The DECLARED per-group pair join (S is pairwise, same valve "
        "as Theil-Sen); tie correction is one value-keyed aggregate; "
        "the stitch joins are all broadcast over key-count-sized "
        "frames."
    ),
    "nelson_aalen": (
        "The KM cell shape: one collapse to distinct durations, "
        "group-parallel cumulative windows for at-risk counts and "
        "the micro-unit hazard fold — no join."
    ),
    "logrank": (
        "KM cells pivoted by arm via CONDITIONAL SUMS — no "
        "arm-vs-arm join anywhere; at-risk windows and both "
        "micro-unit term folds are group-parallel; one final "
        "aggregate yields χ²."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("dump-plans")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# PLANS — physical-plan evidence for the scale claims",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`; plan-shape",
        "invariants are enforced in tests/test_plans.py — this file is the",
        "human-readable evidence.  Plans are AQE-initial (pre-execution);",
        "exchanges marked here may still coalesce or convert at runtime.",
        "",
    ]
    for name, note in SHOWCASE.items():
        df = SUITE[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        # strip the volatile per-run expression ids (#123) for a stable diff
        plan = re.sub(r"#\d+L?", "#_", plan)
        # escape raw control bytes plan constants can embed (e.g. the
        # exact_dedup \x01 concat_ws separator) — keep the file text
        plan = re.sub(
            r"[\x00-\x08\x0b-\x1f]",
            lambda m: f"\\x{ord(m.group()):02x}",
            plan,
        )
        out.append(f"## {name}")
        out.append("")
        out.append(note)
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
