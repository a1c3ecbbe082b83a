"""Transcript assembly: turns → one document per conversation.

Analog of FASTA contig loading (reference dedup.py:498-511,
contig.py:37-38): a transcript is the conversation's turns concatenated
in ``turn_idx`` order.

Determinism under shuffle: ``collect_list`` order is NOT deterministic,
so we collect ``struct(turn_idx, text)`` and ``array_sort`` before
concatenation — stable turn ordering is the per-turn text equality
invariant the north rule demands (SURVEY.md §4 item 4).

Scale: one hash-aggregate shuffle on conv_id; partial aggregation is
ineffective for collect_list, so at 10^12 turns size
spark.sql.shuffle.partitions so each conv group's turns fit comfortably
in an executor (turns per conv is small and bounded — the key is
high-cardinality and unskewed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TURN_SEP = "\n"


def assemble_transcripts(turns: DataFrame) -> DataFrame:
    """turns → transcripts(conv_id, doc, n_turns, doc_len)."""
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    return (
        turns.groupBy("conv_id")
        .agg(
            F.concat_ws(TURN_SEP, F.transform(ordered, lambda s: s["text"])).alias("doc"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .withColumn("doc_len", F.length("doc"))
    )
