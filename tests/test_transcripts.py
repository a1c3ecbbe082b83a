"""Transcript assembly: stable turn ordering under shuffled input
(the per-turn text equality invariant, BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from dedup_spark.operators.transcripts import TURN_SEP, assemble_transcripts


def test_assembly_order_invariant(spark):
    rows = [
        ("a", 1, "assistant", "world", None, None),
        ("a", 0, "user", "hello", None, None),
        ("a", 2, "user", "bye", None, None),
        ("b", 0, "user", "solo", None, None),
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    df = spark.createDataFrame(rows, schema)
    out = {r.conv_id: r for r in assemble_transcripts(df).collect()}
    assert out["a"].doc == TURN_SEP.join(["hello", "world", "bye"])
    assert out["a"].n_turns == 3
    assert out["b"].doc == "solo"

    # shuffled + repartitioned input must produce the identical doc
    shuffled = df.orderBy(F.rand(7)).repartition(5)
    out2 = {r.conv_id: r.doc for r in assemble_transcripts(shuffled).collect()}
    assert out2 == {k: v.doc for k, v in out.items()}


def test_assembly_null_text(spark):
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, "x")], "conv_id string, turn_idx int, text string"
    )
    doc = assemble_transcripts(df).collect()[0].doc
    # concat_ws skips nulls → null turn contributes empty segment
    assert doc in ("x", TURN_SEP + "x", "" + "x")
