"""Physical-plan quality gates: the 100-TB properties must be visible in
the plan, not just hoped for.

 - column pruning: aggregates over 3 scalar columns must not read the
   tokens array from parquet
 - predicate pushdown: partition-style filters reach the parquet scan
 - referential check: broadcast join, never a shuffle join
 - row pass: zero Python (no BatchEvalPython / ArrowEvalPython) and
   whole-stage codegen present
"""

import tempfile

from pyspark.sql import functions as F

from goskema_spark.corpus import corpus_from_documents, corpus_schema, dim_source_df, row_id_col
from goskema_spark.referential import referential_violations
from goskema_spark.rowpass import validate_rows
from goskema_spark.stats import profile

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _corpus_parquet(spark, tmp):
    corpus_from_documents(spark, SF).write.mode("overwrite").parquet(f"{tmp}/c")
    return spark.read.parquet(f"{tmp}/c")


def test_column_pruning_stats(spark):
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        plan = _plan(profile(df, ["doc_id", "n_tok", "source"]))
        scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        assert "tokens" not in scan, f"tokens not pruned: {scan}"


def test_filter_pushdown(spark):
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        plan = _plan(df.filter(F.col("source") == "src1").select("doc_id"))
        assert "PushedFilters: [IsNotNull(source), EqualTo(source,src1)]" in plan \
            or "EqualTo(source,src1)" in plan, plan


def test_referential_small_dim_compiles_to_filter(spark):
    """A small dim is collected once and compiled into an isin filter —
    no join operator at all, the fact side is a pure codegen'd scan
    (r6: the per-run broadcast anti-join measured 1.59s vs 0.15s for
    the compiled filter at 12.8M rows)."""
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        v = referential_violations(df, "source", dim_source_df(spark), "source", row_id_col())
        plan = _plan(v)
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, "fact side must not shuffle"


def test_referential_large_dim_is_broadcast(spark):
    """Above the inline threshold the check falls back to a broadcast
    anti-join — still never a shuffle of the fact side."""
    from pyspark.sql import functions as F
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        big_dim = spark.range(10000).select(
            F.concat(F.lit("src"), F.col("id").cast("string")).alias("source"))
        v = referential_violations(df, "source", big_dim, "source", row_id_col())
        plan = _plan(v)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
        assert "SortMergeJoin" not in plan, "referential check must not sort-merge"


def test_referential_inline_matches_join(spark):
    """Both physical shapes must produce identical violations,
    null-domain values and empty dims included."""
    from pyspark.sql import functions as F, types as T
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        dim_rows = [("src1",), ("src2",), (None,)]
        dim = spark.createDataFrame(
            dim_rows, T.StructType([T.StructField("source", T.StringType(), True)]))
        a = referential_violations(df, "source", dim, "source", row_id_col())
        b = referential_violations(df, "source", dim, "source", row_id_col(),
                                   max_inline_values=0)  # force the join path
        assert a.count() == b.count() > 0
        norm = lambda d: d.withColumn("params", F.map_entries("params"))
        assert norm(a).exceptAll(norm(b)).count() == 0
        # empty dim: every non-null value is a miss, on both paths
        empty = spark.createDataFrame(
            [], T.StructType([T.StructField("source", T.StringType(), True)]))
        n_nonnull = df.filter(F.col("source").isNotNull()).count()
        ea = referential_violations(df, "source", empty, "source", row_id_col())
        eb = referential_violations(df, "source", empty, "source", row_id_col(),
                                    max_inline_values=0)
        assert ea.count() == eb.count() == n_nonnull


def test_rowpass_no_python_and_codegen(spark):
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        _, viols, _ = validate_rows(df, corpus_schema(), row_id_col())
        plan = _plan(viols)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
            "row pass must stay JVM-side"
        # '*(n)' marks whole-stage-codegen'd operators in executedPlan
        # output; the lambda (higher-order-function) projection itself
        # cannot codegen in Spark, but the surrounding operators must
        assert "*(" in plan, "row pass should have codegen'd stages"


def test_violations_filter_first_matches_guarded(spark):
    """r6: the violations feed filters on the codegen'd gate BELOW the
    interpreted HOF body projection (explode drops empty arrays, so the
    two shapes are equivalent). Checks (a) the plan really has the gate
    as a Filter under the Generate, and (b) row-for-row equivalence with
    exploding the guarded with_violations output — including a WIDE
    (non-exact) gate, where gate-fired rows can still build an empty
    array that explode must drop."""
    from pyspark.sql import types as T

    from goskema_spark import schema as S
    from goskema_spark.rowpass import (_dirty_with_violations, apply_defaults,
                                       explode_violations, with_violations)

    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        sch = corpus_schema()
        dfd = apply_defaults(df, sch)
        new = explode_violations(_dirty_with_violations(dfd, sch), row_id_col())
        old = explode_violations(with_violations(dfd, sch), row_id_col())
        plan = _plan(new)
        gen = plan.find("Generate")
        filt = plan.find("Filter", gen)
        assert gen != -1 and filt != -1, "expected Filter below the Generate"
        norm = lambda d: d.withColumn("params", F.map_entries("params"))
        assert new.count() == old.count() > 0
        assert norm(new).exceptAll(norm(old)).count() == 0
        assert norm(old).exceptAll(norm(new)).count() == 0

    # wide gate: an Or-combinator whose branches can fire while the
    # chosen (minimal) branch stays empty
    rows = [("r1", 1, None), ("r2", None, 2), ("r3", None, None),
            ("r4", 5, 6)]
    df2 = spark.createDataFrame(
        rows, T.StructType([T.StructField("id", T.StringType()),
                            T.StructField("a", T.IntegerType()),
                            T.StructField("b", T.IntegerType())]))
    sch2 = S.table(S.field("id", "string", required=True),
                   S.field("a", "int32"), S.field("b", "int32"),
                   unknown="strip")
    # branch A fires on rows where `a` is null, branch B on `b` null —
    # r1/r2 trip the wide OR gate yet their minimal branch is empty
    sch2.or_refine("a_or_b", [
        [S.Refinement(name="a_set", path="/a", code="required",
                      violates=lambda: F.col("a").isNull())],
        [S.Refinement(name="b_set", path="/b", code="required",
                      violates=lambda: F.col("b").isNull())],
    ])
    dfd2 = apply_defaults(df2, sch2)
    new2 = explode_violations(_dirty_with_violations(dfd2, sch2), F.col("id"))
    old2 = explode_violations(with_violations(dfd2, sch2), F.col("id"))
    got_new = sorted((r["row_id"], r["path"], r["code"]) for r in new2.collect())
    got_old = sorted((r["row_id"], r["path"], r["code"]) for r in old2.collect())
    assert got_new == got_old
    assert any(r[0] == "r3" for r in got_new)  # the violating row


def test_gate_projection_boundary(spark):
    """The violation gate (OR of all check conditions) must survive in
    its OWN projection after optimization: if CollapseProject ever
    re-inlines it into the HOF build projection, the whole projection —
    gate included — falls back to interpreted eval and clean rows pay
    the full check-condition re-evaluation again (the r3 rowpass
    regression)."""
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        ann, _, _ = validate_rows(df, corpus_schema(), row_id_col())
        opt = ann._jdf.queryExecution().optimizedPlan().toString()
        assert "AS _gsk_dirty" in opt, "gate column collapsed away"
        # defined once, referenced by the guarded violations expression
        assert opt.count("_gsk_dirty") >= 3, opt[:500]
        # and the output schema must not leak the internal column
        assert "_gsk_dirty" not in ann.columns


def test_uniqueness_is_two_stage_agg(spark):
    """The duplicate-key aggregate must show partial aggregation
    (map-side combine) before the exchange."""
    from goskema_spark.uniqueness import duplicate_keys
    with tempfile.TemporaryDirectory() as tmp:
        df = _corpus_parquet(spark, tmp)
        plan = _plan(duplicate_keys(df, "doc_id"))
        # HashAggregate (partial) ... Exchange ... HashAggregate (final/merge)
        first_exchange = plan.find("Exchange")
        first_agg = plan.rfind("HashAggregate")
        assert "HashAggregate" in plan and first_exchange != -1
        assert first_agg > first_exchange, "expected partial agg below the shuffle"


def test_json_schema_export(spark):
    """JSON Schema export parity (reference jsonschema/schema.go:5-23,
    dsl/object_core.go:289-320)."""
    sch = corpus_schema()
    js = sch.to_json_schema()
    assert js["type"] == "object"
    assert js["additionalProperties"] is False
    assert js["required"] == ["doc_id", "n_tok", "source", "tokens"]
    tok = js["properties"]["tokens"]
    assert tok == {"type": "array", "items": {"type": "integer"},
                   "minItems": 1, "maxItems": 64}
    assert js["properties"]["n_tok"]["minimum"] == 1
    assert js["properties"]["n_tok"]["maximum"] == 64


def test_json_schema_roundtrip(spark):
    """Export -> import -> export fixpoint (contract-import direction,
    reference kubeopenapi import surface)."""
    from goskema_spark.schema import from_json_schema
    sch = corpus_schema()
    js = sch.to_json_schema()
    sch2 = from_json_schema(js)
    assert sch2.to_json_schema() == js
    assert sch2.unknown == "strict"
    assert sch2.get("tokens").dtype.max_len == 64


def test_json_schema_oneof_union_roundtrip(spark):
    """Discriminated unions export as oneOf with a const-pinned
    discriminator (reference dsl/union.go:85-93, jsonschema/schema.go:22)
    and round-trip back into a working union: per-variant required/type
    differences survive export -> from_json_schema -> re-validate."""
    from pyspark.sql import functions as F, types as T

    from goskema_spark import schema as S
    from goskema_spark.rowpass import validate_rows
    from goskema_spark.schema import from_json_schema

    card = S.table(S.field("kind", "string", required=True),
                   S.field("number", "string"),
                   S.field("iban", "string"),
                   unknown="strip")
    card.discriminate("kind", {
        "card": S.table(S.field("number", "string", required=True,
                                pattern=r"^\d{12,19}$"), unknown="strip"),
        "bank": S.table(S.field("iban", "string", required=True,
                                min_str_len=15), unknown="strip"),
    })

    js = card.to_json_schema()
    assert js["discriminator"] == {"propertyName": "kind"}
    tags = {b["properties"]["kind"]["const"] for b in js["oneOf"]}
    assert tags == {"card", "bank"}
    by_tag = {b["properties"]["kind"]["const"]: b for b in js["oneOf"]}
    assert by_tag["card"]["required"] == ["number"]
    assert by_tag["bank"]["properties"]["iban"]["minLength"] == 15

    sch2 = from_json_schema(js)
    assert sch2.discriminator is not None
    df = spark.createDataFrame(
        [("r1", "card", "4111111111111111", None),
         ("r2", "card", "x", None),
         ("r3", "bank", None, "DE00123456789012345"),
         ("r4", "bank", None, "short"),
         ("r5", "crypto", None, None)],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("kind", T.StringType()),
                      T.StructField("number", T.StringType()),
                      T.StructField("iban", T.StringType())]))
    _, viols, _ = validate_rows(df, sch2, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()
           if r["row_id"] != "r5" or "discriminator" in (r["rule"] or "")}
    assert ("r2", "/number", "pattern") in got
    assert ("r4", "/iban", "too_short") in got
    assert ("r5", "/kind", "discriminator_unknown") in got
    assert not any(r[0] in ("r1", "r3") for r in got)
