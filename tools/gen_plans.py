"""Regenerate PLANS.md: physical-plan audit of every registered query.

Counts, per query, from the executed (post-AQE) plan string at sf0.01:
shuffle exchanges, broadcast exchanges, Arrow Python stages, join strategy
occurrences, and whether parquet filter pushdown fired.  The prose commentary
below the table is maintained by hand in _NOTES — keep it in sync when a
query's deliberate shape changes.

Usage: python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_HEADER = """# PLANS — physical-plan audit of the query corpus

Generated from `.explain` (executedPlan) at sf0.01.  Columns: shuffle
exchanges (hash/range/single partition), broadcast exchanges, Arrow Python
stages (mapInPandas), join strategies, parquet filter pushdown.

A shuffle count of 0 means the query is fully narrow (scan -> project ->
output, whole-stage codegen).  Broadcast exchanges are deliberate (dimension
tables / tiny centroid sets); shuffles appear only where semantics demand a
repartition (groupBy keys, join keys, windows).

| query | shuffles | broadcasts | py stages | BHJ | SMJ | BNLJ | pushdown |
|---|---|---|---|---|---|---|---|
"""

_NOTES = """
## Notes on the deliberate shapes

- **Ingest roundtrips (kafka_*)**: 0 shuffles — encode and decode are both
  narrow Arrow stages; at scale this is the per-topic-partition decode cost
  of the real Kafka read. `kafka_primitive_roundtrip` has ONE Python stage
  (the test-side encoder); its decode is pure JVM (substring/conv/cast).
- **q1/q3/q5 (TPC-H flavors)**: dimension sides broadcast explicitly
  (`F.broadcast`), facts shuffle once on the join/group keys; q5's five
  broadcasts are the five dimension tables of the star join — the only
  shuffles are orders⋈lineitem and the final tiny aggregation.
- **dedup_minhash_lsh**: shuffles = signature groupBy, band self-join,
  candidate distinct, verify joins; the distinct shingle set is persisted
  (MEMORY_AND_DISK) because it feeds three subtrees; MinHash members are
  8-hex md5 slices (4x less hashing than one md5 per member).
- **dedup_embedding_cosine**: inherits ann_lsh_bucketed's bucket self-join,
  plus one partial-aggregated groupBy on dup_id (≤1 output row per vector).
- **ann_brute_force_topk**: BLAS candidate selection is one narrow Python
  stage over a broadcast index; the shuffles are the n·k exact re-score
  joins + final per-query window — O(n·k) rows, not O(n²).
- **ann_ivf_topk**: the two BroadcastNestedLoopJoins are corpus×centroids
  and queries×centroids with 16 centroid rows broadcast — O(16·n) narrow
  work; candidates then shuffle on list_id only.  Its regime is corpora
  beyond the broadcast cap (see SCALING.md); at test SF brute-BLAS wins.
- **semdedup_cluster_prune**: inherits ann_ivf_topk's IVF assignment
  (centroid BNLJs are 16-row broadcasts); its own work is ONE list_id
  shuffle for the within-cluster self-join (quadratic only inside a
  cluster) + a kept_by aggregation; exchange reuse shares the assignment
  subplan between the pair join's two sides and the output base.
- **temperature_mixture_sample / mixture_rebalance**: the
  BroadcastNestedLoopJoins are 1-row scalar broadcasts (normalizer,
  budget) — the pattern that replaces a driver collect; the real work is
  one counts aggregate + one per-lang window take.
- **text_* / multimodal_* / dedup_simhash**: fully narrow, zero shuffles,
  whole-stage codegen end to end (multimodal_fake_decode's single Python
  stage is the decode kernel slot; simhash hashes each token once).
- **Windows (ranking/offset/frame, tumbling, session)**: exactly one
  shuffle on the partition keys — the minimum the semantics allow.
- **asof_purchase_attribution**: union-merge as-of join — one shuffle, no
  join operator at all (plan-asserted in tests/test_asof.py).
- **streaming_window_counts** executes under the streaming engine
  (stateful aggregation + state store), not a one-shot batch plan; its
  correctness gate is the batch GROUP BY oracle.
- **lateral_top_orders**: Catalyst decorrelates the LATERAL subquery into
  a window-ranked join — no per-row re-execution.
- **token_budget_pack**: a GLOBAL cumulative sum with no single-partition
  window over the data — range partition on the priority order, parallel
  per-partition windows, broadcast per-partition offsets
  (operators/scale.py:global_running_sum).  The only SinglePartition
  exchange in its plan carries <= num_partitions offset rows.  The ranged
  intermediate is persisted (it feeds both the window and the totals
  subtree).
- **chunk_documents**: tokenize -> sequence of chunk starts -> posexplode
  -> slice; fully narrow, zero shuffles — per-split parallel at any scale.
- **vocab_coverage_curve**: the ranked input is bounded FIRST with
  orderBy+limit(1024) (TakeOrderedAndProject — top-k merge, no global
  sort); the row_number/cumsum windows then run over <=1024 rows.  The two
  BNLJs are 1-row scalar cross-joins (total mass, coverage row fan-out).
- **dedup_longest_common_span**: shingle extraction is narrow codegen; the
  df-capped (<=10 docs) hash join bounds pair fan-out at 45/hash; island
  windows partition on (id_a, id_b, diagonal) — thousands of small groups.
  At sf0.01 AQE broadcasts the rare-hash set; beyond broadcast size it
  degrades to the same shuffle join, still linear in shingle count.
- **dedup_url_canonical**: canonical key is pure codegen regex/array work
  riding the scan; 3 exchanges = the exact-countDistinct expansion
  ((canon,raw) partial, canon final) plus the output sort, all map-side
  combined on a uniform string key.  `streaming_url_dedup` is the same
  canonicalizer inside a streaming plan (all-zero counts in the table
  above because the returned DataFrame is the drained memory sink — the
  streaming work happened under the streaming engine).
- **embedding_covariance_topk / embedding_top_pc**: the dim^2/2 pair
  products expand per-row inside codegen (no self-join) and the (i, j)
  groupBy partial-aggregates map-side — at most dim^2 rows shipped per
  partition; broadcasts are the dim-sized linear-sum/count tables and the
  64-row iteration vector; the BNLJs are 1-row scalar cross-joins.  The
  top-PC plan is shallow because each power-iteration step is cut by a
  localCheckpoint (2^t lineage growth otherwise — see the query
  docstring).
- **tfidf_cosine_topk**: pair partials exist only where two docs share a
  term — a posting-table self-equi-join on the term key, never doc x doc;
  the persisted posting table feeds the norms and both join sides, the
  df table broadcasts, and the stop-term cap (df <= N/2) bounds per-term
  fan-out (THE skew knob for sparse all-pairs similarity).
- **pagerank_dup_graph / dup_graph_triangles**: both iterate/join on the
  persisted LSH pair sketch, so the corpus is scanned once; PageRank's
  shallow final plan is the checkpointed rank frame (degree rides in it —
  no per-iteration degree join; dangling mass is a scalar filter-agg off
  the checkpoint), triangles are two id-oriented self-joins on pair rows.
- **bitext_margin_mining**: target side broadcasts (one language side is
  orders smaller, or IVF-blocked first), scoring is codegen fold work per
  source row, and the per-source window shuffles only k-bounded rows.
- **streaming_click_purchase_join**: all-zero counts like the other
  streaming rows — the watermarked stream-stream interval join ran under
  the streaming engine; both sides shuffle on user_id into the join state
  store, state bounded by watermark + interval.
- **event_robust_outliers**: two key-partitioned exact-median aggs over
  the bounded event_type key with the per-type center/scale broadcast
  back; at cluster scale the exact median swaps for percentile_approx
  with the same plan shape.
- **simhash64 family** (`dedup_simhash_hamming`, `dedup_incremental_simhash64`,
  `simhash_slice_occupancy`, `streaming_simhash_neardup`): the fingerprint
  is one codegen projection (64 array-filter bit votes into a LONG) riding
  the scan; blocking shuffles on (blk, slc) with 65,536 buckets/block, and
  the verify is a single bit_count per collision.  The incremental probe's
  history side is the persisted 8 B/doc fingerprint table — its plan never
  touches history text.  The streaming row shows 2 exchanges (replay-prep
  write); the stateful work ran under the streaming engine.
- **dedup_cross_source_leakage**: inherits dedup_minhash_lsh's blocked pair
  plan (persisted shingle sets feed signatures + both verify sides); its
  own additions are two (doc_id, source) broadcast enrich joins and a
  |sources|²-bounded rollup — the pair set is never rescanned per source.
- **audio fingerprint family** (`multimodal_audio_fingerprint_dedup`,
  `multimodal_audio_incremental`): two narrow Arrow stages (synth, decode
  — 8 B/clip leaves the kernel, payloads never shuffle) feeding the SAME
  (blk, slc) blocking as the text/image Hamming queries; the incremental
  probe's history side is the persisted fingerprint table.
- **text_kneser_ney_bigram / text_bigram_logprob**: one corpus explode
  into vocabulary-sized broadcast-hash joins (bigram/context/predecessor
  count tables + a 1-row type total) and a single per-doc rollup shuffle.
- **mmr_diverse_topk**: relevance is one broadcast-probe pass + a
  TakeOrdered pool cut; the greedy loop's plans run on the persisted
  24-row pool and 24x24 sim table — per-step exchanges are constant-size.
- **streaming_quantile_sketch** executes under the streaming engine (the
  batch-plan row shows the replay-prep write + final explode/quantile);
  state is bottom-64 registers per key, folded per micro-batch.
- **decontaminate_semantic**: the eval set broadcasts through the BLAS
  top-1 scan (one narrow Python stage over Arrow batches); the corpus is
  never shuffled — only the k-row-per-vector re-score joins appear.
- **embedding_matryoshka_recall**: prefix truncation is a zero-cost slice
  inside the ranking expression — same fixed-8-query pair-table shape as
  the JL curve with NO projection stage; the exact truth set persists
  once and feeds all three configs.
- **bpe_apply_merges**: the train loop's per-step exchanges are
  vocabulary-sized (persisted (word, symbols, freq) state); the corpus
  appears exactly twice — once in the wf scan, once in the apply explode
  feeding a broadcast segmentation join + per-doc rollup.
- **ann_index_persist_roundtrip**: ann_ivf_topk's probe plan re-rooted on
  parquet scans of the landed index — the extra exchanges are the two
  index writes; the probe itself is unchanged (norm column re-derived).
- **length_trim_sketch_gated**: the KLL register build (narrow rank +
  prefilter, ~8k-row top-64 shuffle) plus ONE corpus pass gated by a
  2-numbers-per-lang broadcast — the exact-sort trim's corpus-wide
  sort/window is gone.
"""


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    from kwack_spark.plans.registry import query_map
    from kwack_spark.session import get_session

    spark = get_session(app_name="gen-plans", shuffle_partitions=8)
    rows = []
    for name, fn in query_map().items():
        if name == "streaming_window_counts":
            rows.append(f"| {name} | streaming | — | 1 | — | — | — |  |")
            continue
        df = fn(spark, sf_dir)
        df.collect()  # materialize so AQE settles on the final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        # count DISTINCT exchange operators: a persisted subtree's plan is
        # printed once per consumer, which would double-count its exchanges
        shuf = len(
            set(
                re.findall(
                    r"Exchange (?:hash|range)partitioning.*?\[plan_id=(\d+)\]"
                    r"|Exchange SinglePartition.*?\[plan_id=(\d+)\]",
                    plan,
                )
            )
        )
        # same dedup for broadcasts: cached subtrees reprint per consumer
        bcast = len(
            set(re.findall(r"BroadcastExchange .*?\[plan_id=(\d+)\]", plan))
        ) or plan.count("BroadcastExchange")
        py = plan.count("InPandas") + plan.count("ArrowEvalPython")
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        pushed = "pushed" if "PushedFilters: [" in plan and "PushedFilters: []" not in plan else ""
        rows.append(
            f"| {name} | {shuf} | {bcast} | {py} | {bhj} | {smj} | {bnlj} | {pushed} |"
        )
        print(rows[-1])
    out = _HEADER + "\n".join(rows) + "\n" + _NOTES
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(out)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
