"""Chat flattening + loss spans: hand-computed offsets, edge cases."""

from pyspark.sql import functions as F

from h2h_spark.operators.chat import flatten_chat, loss_spans, masked_text


def _conv(spark, msgs):
    return spark.createDataFrame(
        [(msgs,)],
        "msgs array<struct<role:string, content:string>>",
    )


def test_flatten_and_spans_hand_computed(spark):
    df = _conv(spark, [
        ("system", "sys"),
        ("user", "hi"),
        ("assistant", "yo!"),
        ("user", "more"),
        ("assistant", "ok"),
    ]).select(
        flatten_chat("msgs").alias("flat"),
        loss_spans("msgs").alias("spans"),
    ).withColumn("masked", masked_text("flat", "spans"))
    r = df.collect()[0]
    assert r.flat == (
        "<|system|>sys<|end|><|user|>hi<|end|><|assistant|>yo!<|end|>"
        "<|user|>more<|end|><|assistant|>ok<|end|>"
    )
    # offsets must equal the positions str.index would find
    assert [(s.start, s.len) for s in r.spans] == \
        [(r.flat.index("yo!"), 3), (r.flat.index("ok<|end|>"), 2)]
    assert r.flat[50:53] == "yo!" and r.flat[92:94] == "ok"
    assert r.masked == "yo!ok"


def test_no_assistant_and_empty(spark):
    df = _conv(spark, [("system", "s"), ("user", "u")]).select(
        loss_spans("msgs").alias("spans"),
        flatten_chat("msgs").alias("flat"),
    ).withColumn("masked", masked_text("flat", "spans"))
    r = df.collect()[0]
    assert list(r.spans) == [] and r.masked == ""
    empty = _conv(spark, []).select(
        flatten_chat("msgs").alias("flat"),
        loss_spans("msgs").alias("spans"),
    ).collect()[0]
    assert empty.flat == "" and list(empty.spans) == []


def test_unicode_contents(spark):
    df = _conv(spark, [
        ("user", "héllo ☃"),
        ("assistant", "ça va"),
    ]).select(
        flatten_chat("msgs").alias("flat"),
        loss_spans("msgs").alias("spans"),
    ).withColumn("masked", masked_text("flat", "spans"))
    r = df.collect()[0]
    # spans are CHARACTER offsets (Spark length/substring semantics)
    assert r.masked == "ça va"
    assert r.spans[0].len == 5
