"""Distributed suffix-array substring pass: near-duplicate substring
detection across transcripts.

The Spark re-expression of the reference's minimap2 self-alignment +
PAF chaining (/root/reference/dedup/dedup.py:424-462;
alignment.py:284-372), done seed-and-chain style over suffix-prefix
keys instead of shelling out to an aligner:

1. **Suffix keys** — every transcript suffix is keyed by the hash of
   its first ``anchor_w`` characters (`xxhash64(substr(doc, i, w))`,
   all JVM-side). Two suffixes agree on a key iff they share a length-w
   prefix, so grouping by key is exactly the bucketing a suffix array's
   first-w-byte radix pass produces.
2. **Anchor matches** — a self-join on the key yields cross-conversation
   anchor pairs ``(conv_a, conv_b, a_pos, b_pos)`` — the analog of
   minimap2's seed hits (one PAF line ≈ one chained run of these).
   Skew guard: suffix keys are Zipfian under boilerplate; keys whose
   corpus-wide occurrence exceeds ``max_anchor_occ`` are excluded from
   the join and REPORTED (never silently), mirroring the LSH bucket cap.
3. **Chaining** — colinear anchors whose gaps stay under ``max_gap``
   merge into maximal shared spans. The reference builds a per-pair DAG
   and runs longest-path (alignment.py:284-372, exponential worst case,
   TODO at alignment.py:87); the colinear-chain semantics reduce to a
   sorted window scan with a gap predicate (SURVEY.md §2.4 J6) —
   O(n log n), no graph, no Python in the loop. Text has no reverse
   strand, so the reference's +/− direction collapses to '+'.
4. **Best span per pair** — top-1 by score (alignment.py:99-102, O1).

Scale notes: suffix-key enumeration multiplies rows by ~doc_len/stride;
the key self-join shuffles on the key (high-cardinality, cap-bounded
buckets ⇒ bounded pair fan-out m·(m−1)/2 ≤ occ²); chaining shuffles
once on the pair key. All three shuffles are AQE-coalesced. For a
10^12-turn corpus raise ``anchor_stride`` (sampled suffixes) — recall
degrades gracefully: a shared span of length L is still seeded by
⌊(L−w)/stride⌋ anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from dedup_spark.config import DedupConfig


def suffix_keys(transcripts: DataFrame, cfg: DedupConfig) -> DataFrame:
    """transcripts → (conv_id, pos, key): 1-based suffix position and the
    hash of the suffix's first ``anchor_w`` chars. JVM-only expression —
    no Python, no UDF."""
    w, stride = cfg.anchor_w, cfg.anchor_stride
    return (
        transcripts.filter(F.length("doc") >= w)
        .select(
            "conv_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(doc) - {w} + 1, {stride}), "
                    f"i -> struct(i as pos, xxhash64(substr(doc, i, {w})) as key))"
                )
            ).alias("s"),
        )
        .select("conv_id", F.col("s.pos").alias("pos"), F.col("s.key").alias("key"))
    )


def key_occurrence(keys: DataFrame) -> DataFrame:
    """(key, occ): corpus-wide suffix-key occurrence counts."""
    return keys.groupBy("key").agg(F.count(F.lit(1)).alias("occ"))


def suffix_buckets(keys: DataFrame, cfg: DedupConfig) -> DataFrame:
    """One groupBy(key) pass → (key, occs array<struct<conv_id,pos>>, occ),
    keeping only keys seen more than once (singleton suffixes — the vast
    majority — can never anchor a match). This is the single shared
    upstream of both the skew report and anchor-pair expansion, so the
    (huge) suffix-key explode is scanned exactly once; the result is
    small (repeated keys only) and checkpoint-friendly.

    Oversized buckets keep only their occurrence COUNT (occs truncated
    to empty) so a boilerplate key can't blow up the checkpoint; they
    are excluded from pairing and surface in the skew report."""
    return (
        keys.groupBy("key")
        .agg(
            F.collect_list(F.struct("conv_id", "pos")).alias("occs"),
            F.count(F.lit(1)).alias("occ"),
        )
        .filter(F.col("occ") > 1)
        .withColumn(
            "occs",
            F.when(F.col("occ") <= cfg.max_anchor_occ, F.col("occs")).otherwise(
                F.slice("occs", 1, 0)  # type-preserving empty array
            ),
        )
    )


def anchor_skew_report(key_occ: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Keys excluded by the occurrence cap — logged, never silent.
    Accepts any DF with (key, occ) — raw counts or suffix_buckets."""
    return key_occ.select("key", "occ").filter(F.col("occ") > cfg.max_anchor_occ)


def anchor_matches(
    keys: DataFrame,
    cfg: DedupConfig,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Suffix-key bucketing → (conv_a, conv_b, a_pos, b_pos), conv_a <
    conv_b (canonical order, reference dedup.py:373-376).

    ONE shuffle: groupBy(key) collects each bucket's occurrences (cap-
    bounded, so the array is ≤ max_anchor_occ structs), then all
    unordered occurrence pairs expand JVM-side inside the array
    (`transform`/`slice`/`flatten`) — no self-join, so no mis-estimated
    broadcast and no second scan of the (huge) exploded key table. The
    per-key fan-out is bounded by occ·(occ−1)/2 ≤ cap²/2.

    When ``pairs`` (candidate pairs) is given, anchors are restricted to
    those pairs — the semantic-preserving restriction of the reference's
    corpus-wide self-alignment, which only ever *looks up* candidate
    pairs (dedup.py:152; SURVEY.md §3.4)."""
    return anchor_pairs_from_buckets(suffix_buckets(keys, cfg), cfg, pairs)


def anchor_pairs_from_buckets(
    buckets: DataFrame, cfg: DedupConfig, pairs: DataFrame | None = None
) -> DataFrame:
    """suffix_buckets → anchor pairs (see anchor_matches)."""
    grouped = buckets.filter(
        (F.col("occ") > 1) & (F.col("occ") <= cfg.max_anchor_occ)
    )
    pair_expr = F.expr(
        "flatten(transform(occs, (x, i) -> "
        "transform(slice(occs, i + 2, size(occs)), "
        "y -> named_struct('p', x, 'q', y))))"
    )
    e = grouped.select(F.explode(pair_expr).alias("pq")).filter(
        F.col("pq.p.conv_id") != F.col("pq.q.conv_id")
    )
    a_first = F.col("pq.p.conv_id") < F.col("pq.q.conv_id")
    out = e.select(
        F.when(a_first, F.col("pq.p.conv_id")).otherwise(F.col("pq.q.conv_id")).alias("conv_a"),
        F.when(a_first, F.col("pq.q.conv_id")).otherwise(F.col("pq.p.conv_id")).alias("conv_b"),
        F.when(a_first, F.col("pq.p.pos")).otherwise(F.col("pq.q.pos")).alias("a_pos"),
        F.when(a_first, F.col("pq.q.pos")).otherwise(F.col("pq.p.pos")).alias("b_pos"),
    )
    if pairs is not None:
        out = out.join(
            pairs.select("conv_a", "conv_b").dropDuplicates(), ["conv_a", "conv_b"], "left_semi"
        )
    return out


def chain_anchors(anchors: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Colinear gap-bounded chaining → spans, one row per maximal chain.

    Window scan per pair, ordered by (a_pos, b_pos): a new chain starts
    when the a-gap or b-gap to the previous anchor exceeds ``max_gap``
    or colinearity breaks (b must advance with a) — the relational form
    of the reference DAG's edge predicate (alignment.py:300-323: parent
    ends before child ends, gap < max_gap).

    Span score = estimated matched chars: each anchor certifies w
    matching chars, consecutive in-chain anchors overlap by
    (w − step), so matched ≈ min(span_len, n·stride + w − stride),
    weighted analog of the reference's match bonus
    (alignment.py:342-343, match_weight).
    """
    w = cfg.anchor_w
    win = W.partitionBy("conv_a", "conv_b").orderBy("a_pos", "b_pos")
    prev_a = F.lag("a_pos").over(win)
    prev_b = F.lag("b_pos").over(win)
    new_chain = (
        prev_a.isNull()
        | ((F.col("a_pos") - prev_a) > cfg.max_gap)
        | (F.col("b_pos") <= prev_b)
        | ((F.col("b_pos") - prev_b) > cfg.max_gap)
    ).cast("int")
    chained = anchors.withColumn(
        "chain_id",
        F.sum(new_chain).over(win.rowsBetween(W.unboundedPreceding, 0)),
    )
    spans = (
        chained.groupBy("conv_a", "conv_b", "chain_id")
        .agg(
            F.min("a_pos").alias("a_start"),
            (F.max("a_pos") + (w - 1)).alias("a_end"),
            F.min("b_pos").alias("b_start"),
            (F.max("b_pos") + (w - 1)).alias("b_end"),
            F.count(F.lit(1)).alias("n_anchors"),
        )
        .withColumn(
            "matched",
            F.least(
                F.col("a_end") - F.col("a_start") + 1,
                (F.col("n_anchors") - 1) * cfg.anchor_stride + w,
            ),
        )
        .withColumn("score", F.col("matched"))
    )
    # positive-score / report-floor predicate (alignment.py:277-280, F5)
    return spans.filter(F.col("matched") >= cfg.min_span_len).select(
        "conv_a", "conv_b", "a_start", "a_end", "b_start", "b_end",
        "n_anchors", "matched", "score",
    )


def best_substring_match(spans: DataFrame) -> DataFrame:
    """Top-1 span per pair by score (alignment.py:99-102): ties broken by
    earliest a_start then b_start for determinism."""
    win = W.partitionBy("conv_a", "conv_b").orderBy(
        F.desc("score"), F.asc("a_start"), F.asc("b_start")
    )
    return (
        spans.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def substring_matches(
    transcripts: DataFrame, cfg: DedupConfig, pairs: DataFrame | None = None
) -> DataFrame:
    """End-to-end substring pass: transcripts → best span per pair."""
    keys = suffix_keys(transcripts, cfg)
    anchors = anchor_matches(keys, cfg, pairs)
    return best_substring_match(chain_anchors(anchors, cfg))
