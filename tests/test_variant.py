"""VariantType dynamic-tree mapping + sample-based schema inference."""

import pytest
from pyspark.sql import functions as F, types as T

from embulk_util_json_spark.functions.variant import (
    infer_json_schema,
    to_variant,
    variant_pointer_get,
    variant_schema,
)


def test_variant_typed_access_and_permissive(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "a": [1, 2], "o": {"x": "y"}}'),
            (2, '{"k": null}'),
            (3, "not json"),  # PERMISSIVE -> NULL variant
            (4, None),
        ],
        "id long, doc string",
    )
    v = to_variant("doc")
    out = df.select(
        "id",
        variant_pointer_get(v, "/k", "long").alias("k"),
        variant_pointer_get(v, "/a/1", "long").alias("a1"),
        variant_pointer_get(v, "/o/x", "string").alias("ox"),
        F.to_json(v).alias("whole"),
    ).orderBy("id").collect()
    assert [(r.id, r.k, r.a1, r.ox) for r in out] == [
        (1, 5, 2, "y"), (2, None, None, None), (3, None, None, None),
        (4, None, None, None),
    ]
    # canonical whole-doc: minified, keys sorted (variant semantics)
    assert out[0].whole == '{"a":[1,2],"k":5,"o":{"x":"y"}}'
    # FAILFAST twin raises on malformed input
    with pytest.raises(Exception):
        df.select(to_variant("doc", permissive=False)).collect()


def test_variant_schema_observability(spark):
    df = spark.createDataFrame([('{"k": 1, "s": "x"}',)], "doc string")
    row = df.select(variant_schema(to_variant("doc")).alias("s")).first()
    assert row.s == "OBJECT<k: BIGINT, s: STRING>"


def test_infer_json_schema_sample(spark):
    df = spark.createDataFrame(
        [
            ('{"k": 1, "tags": ["a"]}',),
            ('{"k": 2, "extra": {"深": 1.5}}',),
            (None,),
        ],
        "doc string",
    )
    schema = infer_json_schema(spark, df, "doc", sample_rows=10)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["k"] == T.LongType()
    assert by_name["tags"] == T.ArrayType(T.StringType())
    assert isinstance(by_name["extra"], T.StructType)
    # inferred schema drives the full-scale typed pass
    typed = df.withColumn("v", F.from_json("doc", schema))
    ks = [r.v.k if r.v else None for r in typed.collect()]
    assert ks == [1, 2, None]


def test_infer_json_schema_empty_input(spark):
    df = spark.createDataFrame([], "doc string")
    assert infer_json_schema(spark, df, "doc") == T.StructType([])
