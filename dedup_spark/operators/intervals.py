"""Dedup decision + interval algebra: which side of a substring match to
mark, interval merging, and turn-level trim/emit.

Ports the reference's pair-dedup decision semantics
(/root/reference/dedup/dedup.py:189-308) and trim/emit contract
(contig.py:134-191) to transcripts, as pure select expressions — no
Python in the row path.

Decision rules per best span (dedup.py:244-308), applied to the side
with the higher duplicated fraction first, falling back to the other
side (dedup.py:290-307), else giving up (dedup.py:285):

* full duplication: span covers > ``full_dup_threshold`` of the doc →
  mark the WHOLE doc (dedup.py:263-269);
* 5′ edge: span starts within ``end_buffer`` of the doc start → mark
  [1, span_end] (dedup.py:273-277);
* 3′ edge: span ends within ``end_buffer`` of the doc end → mark
  [span_start, doc_len] (dedup.py:278-281).

Interval merge (contig.py:168-178): overlapping marks on one doc union
into maximal intervals via a running-max window scan.

Turn-level emit: transcripts are never rewritten (per-turn text equality
invariant) — a turn is dropped iff its span in the assembled doc lies
entirely inside a merged duplicated interval; a conversation is dropped
entirely when its surviving length falls to ``min_doc_len`` or below
(the min_sequence_len=5000 emit gate, contig.py:51,188-191).

Coordinate system: ALL positions and lengths in this module are BYTES
of the UTF-8 encoding — matching the byte offsets the suffix-array pass
emits (substring.suffix_keys), so non-ASCII documents get correct
interval decisions and turn trimming (on pure-ASCII text bytes == chars
and nothing changes). ``min_doc_len`` and ``end_buffer`` are therefore
byte thresholds — the honest analog of the reference's base-pair counts
(contig.py:51), which are bytes too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.operators.transcripts import TURN_SEP


def decide_intervals(
    best_spans: DataFrame, transcripts: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """best span per pair + doc lengths → interval marks
    (conv_id, start, end, kind), 1-based inclusive.

    kind ∈ {'full', 'edge5', 'edge3'}; pairs where neither side admits a
    rule produce no mark (the reference's give-up branch, dedup.py:285).

    Byte space: span positions are byte offsets, so the coverage
    denominators and edge distances use the doc's BYTE length (char
    doc_len would inflate pct/edge math on non-ASCII docs).
    """
    lens = transcripts.select("conv_id", F.octet_length("doc").alias("doc_len"))
    j = (
        best_spans.join(
            lens.select(
                F.col("conv_id").alias("conv_a"), F.col("doc_len").alias("len_a")
            ),
            "conv_a",
        )
        .join(
            lens.select(
                F.col("conv_id").alias("conv_b"), F.col("doc_len").alias("len_b")
            ),
            "conv_b",
        )
        .withColumn("pct_a", (F.col("a_end") - F.col("a_start") + 1) / F.col("len_a"))
        .withColumn("pct_b", (F.col("b_end") - F.col("b_start") + 1) / F.col("len_b"))
    )

    def side_mark(pct, start, end, doclen):
        """when/otherwise cascade for one side; null struct = no rule."""
        return (
            F.when(
                pct > cfg.full_dup_threshold,
                F.struct(F.lit(1).alias("start"), doclen.alias("end"), F.lit("full").alias("kind")),
            )
            .when(
                start <= cfg.end_buffer,
                F.struct(F.lit(1).alias("start"), end.alias("end"), F.lit("edge5").alias("kind")),
            )
            .when(
                (doclen - end) < cfg.end_buffer,
                F.struct(start.alias("start"), doclen.alias("end"), F.lit("edge3").alias("kind")),
            )
        )

    mark_a = side_mark(F.col("pct_a"), F.col("a_start"), F.col("a_end"), F.col("len_a"))
    mark_b = side_mark(F.col("pct_b"), F.col("b_start"), F.col("b_end"), F.col("len_b"))
    # primary = more-duplicated side, STRICT comparison so exact ties mark
    # conv_b — reference parity (dedup.py:247 `contig1_percent_duplicated >
    # contig2_percent_duplicated`, else branch picks contig2); fall back to
    # the other side when the primary admits no rule (dedup.py:290-307)
    a_primary = F.col("pct_a") > F.col("pct_b")
    chosen_conv = (
        F.when(a_primary & mark_a.isNotNull(), F.col("conv_a"))
        .when(a_primary & mark_b.isNotNull(), F.col("conv_b"))
        .when(~a_primary & mark_b.isNotNull(), F.col("conv_b"))
        .when(~a_primary & mark_a.isNotNull(), F.col("conv_a"))
    )
    chosen_mark = (
        F.when(a_primary & mark_a.isNotNull(), mark_a)
        .when(a_primary & mark_b.isNotNull(), mark_b)
        .when(~a_primary & mark_b.isNotNull(), mark_b)
        .when(~a_primary & mark_a.isNotNull(), mark_a)
    )
    return (
        j.select(chosen_conv.alias("conv_id"), chosen_mark.alias("m"))
        .filter(F.col("conv_id").isNotNull())
        .select("conv_id", F.col("m.start").alias("start"), F.col("m.end").alias("end"),
                F.col("m.kind").alias("kind"))
    )


def merge_intervals(marks: DataFrame) -> DataFrame:
    """(conv_id, start, end) → maximal merged intervals per conv
    (contig.py:168-178 union semantics): running-max window scan, a new
    group starts when an interval begins past everything seen so far.
    ADJACENT intervals merge too (start == prev_max_end + 1): positions
    are integral, so [1,50]+[51,100] covers [1,100] with no gap — a turn
    straddling 50/51 must count as covered."""
    win = W.partitionBy("conv_id").orderBy("start", "end")
    prev_max_end = F.max("end").over(win.rowsBetween(W.unboundedPreceding, -1))
    grouped = marks.withColumn(
        "grp",
        F.sum(
            (prev_max_end.isNull() | (F.col("start") > prev_max_end + 1)).cast("int")
        ).over(win.rowsBetween(W.unboundedPreceding, 0)),
    )
    return grouped.groupBy("conv_id", "grp").agg(
        F.min("start").alias("start"), F.max("end").alias("end")
    ).select("conv_id", "start", "end")


def turn_offsets(turns: DataFrame) -> DataFrame:
    """turns → + (turn_start, turn_end): the turn's 1-based inclusive
    BYTE span inside the assembled doc's UTF-8 encoding
    (separator-aware, matching assemble_transcripts' concat_ws order) —
    directly comparable to the suffix pass's byte intervals."""
    sep_len = len(TURN_SEP.encode("utf-8"))
    win = W.partitionBy("conv_id").orderBy("turn_idx")
    prior = F.sum(F.octet_length("text") + sep_len).over(
        win.rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(prior, F.lit(0)) + 1
    return turns.withColumn("turn_start", start).withColumn(
        "turn_end", start + F.octet_length("text") - 1
    )


def trim_turns(turns: DataFrame, merged: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Drop turns whose byte span lies inside a duplicated interval;
    drop whole conversations whose surviving BYTE length ≤
    ``min_doc_len`` (contig.py:134-191 emit contract). Surviving rows
    pass through verbatim — per-turn text equality invariant."""
    t = turn_offsets(turns)
    covered = (
        t.join(merged, "conv_id")
        .filter(
            (F.col("turn_start") >= F.col("start"))
            & (F.col("turn_end") <= F.col("end"))
        )
        .select("conv_id", "turn_idx")
        .dropDuplicates()
    )
    kept = t.join(covered, ["conv_id", "turn_idx"], "left_anti")
    sep_len = len(TURN_SEP.encode("utf-8"))
    surviving_len = kept.groupBy("conv_id").agg(
        (F.sum(F.octet_length("text") + sep_len) - sep_len).alias("kept_len")
    )
    too_short = surviving_len.filter(F.col("kept_len") <= cfg.min_doc_len).select(
        "conv_id"
    )
    return (
        kept.join(too_short, "conv_id", "left_anti")
        .select(*turns.columns)
    )
