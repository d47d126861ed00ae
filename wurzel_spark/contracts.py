"""Data contracts: schema + constraints validated at stage boundaries.

Re-expresses wurzel's two-level type system (SURVEY §1.3):
  - static check at composition time — wurzel compares input/output model
    types when chaining steps (typed_step.py:261-275, StaticTypeError);
    here: StructType compatibility between stages.
  - dynamic check at run time — wurzel wraps run() in
    pydantic.validate_call (base_executor.py:322-325,
    ContractFailedException); here: schema assert + nullability/constraint
    filters executed as cheap aggregations.

A Contract is intentionally thin: Spark already carries the schema on every
DataFrame; the contract adds wurzel's semantics (named contract, required
columns, nullability, row-level checks) without leaving the JVM.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ContractError(Exception):
    """Dynamic contract violation (wurzel's ContractFailedException,
    executors/base_executor.py:373-374)."""


class StaticTypeError(TypeError):
    """Composition-time contract mismatch (wurzel's StaticTypeError,
    core/typed_step.py:142-218)."""


@dataclass(frozen=True)
class Contract:
    """A named schema contract.

    ``checks`` are row-level boolean expressions (pandera Field parity,
    wurzel/steps/data.py:14-21: nullable=False, coerce, ge/le bounds),
    given as zero-arg callables because PySpark Columns can't be built
    before a SparkContext exists (contracts are module-level constants).
    """

    name: str
    schema: T.StructType
    checks: dict[str, Callable[[], Column]] = field(default_factory=dict)

    def required_columns(self) -> dict[str, T.DataType]:
        return {f.name: f.dataType for f in self.schema.fields}

    def is_compatible_with(self, other: "Contract") -> bool:
        """Static chaining check: our columns must all exist in ``other``
        with equal types (wurzel requires exact model equality,
        typed_step.py:271-274; we allow supersets, which is the DataFrame
        notion of substitutability).
        """
        theirs = other.required_columns()
        return all(
            name in theirs and theirs[name] == dtype
            for name, dtype in self.required_columns().items()
        )

    def validate(self, df: DataFrame, sample_failures: int = 3) -> DataFrame:
        """Dynamic validation. Schema part is free (no job); constraint part
        runs ONE aggregation counting violations per check — a single pass,
        no per-check jobs.
        """
        have = {f.name: f.dataType for f in df.schema.fields}
        for name, dtype in self.required_columns().items():
            if name not in have:
                raise ContractError(f"{self.name}: missing column '{name}'")
            if have[name] != dtype:
                raise ContractError(
                    f"{self.name}: column '{name}' is {have[name].simpleString()}, "
                    f"contract requires {dtype.simpleString()}"
                )
        non_nullable = [f.name for f in self.schema.fields if not f.nullable]
        agg = [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null__{c}")
            for c in non_nullable
        ] + [
            F.sum(F.when(~expr(), 1).otherwise(0)).alias(f"check__{cname}")
            for cname, expr in self.checks.items()
        ]
        if agg:
            row = df.agg(*agg).collect()[0].asDict()
            bad = {k: v for k, v in row.items() if (v or 0) > 0}
            if bad:
                raise ContractError(f"{self.name}: constraint violations {bad}")
        return df


def struct(*fields: tuple) -> T.StructType:
    """Shorthand: struct(("md", T.StringType(), False), ...)."""
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# ---------------------------------------------------------------- contracts
# The reference's core record contracts, re-expressed (SURVEY §1.1, FIXTURES).

S = T.StringType()
MAP_SS = T.MapType(T.StringType(), T.StringType())

#: MarkdownDataContract (wurzel/datacontract/common.py:80-85)
MARKDOWN_DOC = Contract(
    "MarkdownDataContract",
    struct(("md", S, False), ("keywords", S, False), ("url", S, False), ("metadata", MAP_SS, True)),
    checks={"md_not_blank": lambda: F.length(F.trim(F.col("md"))) > 0},
)

#: EmbeddingResult (wurzel/steps/data.py:11-21)
EMBEDDING_RESULT = Contract(
    "EmbeddingResult",
    struct(
        ("text", S, False),
        ("vector", T.ArrayType(T.FloatType()), False),
        ("url", S, True),
        ("keywords", S, True),
        ("embedding_input_text", S, True),
        ("metadata", MAP_SS, True),
    ),
    checks={"vector_not_empty": lambda: F.size(F.col("vector")) > 0},
)

#: EmbeddingMultiVectorResult (wurzel/steps/data.py:24-35)
EMBEDDING_MULTI_RESULT = Contract(
    "EmbeddingMultiVectorResult",
    struct(
        ("text", S, False),
        ("vectors", T.ArrayType(T.ArrayType(T.FloatType())), False),
        ("url", S, True),
        ("keywords", S, True),
        ("splits", T.ArrayType(S), True),
    ),
)

#: QdrantResult (wurzel/steps/qdrant/data.py:11-17, FIXTURES §4)
QDRANT_RESULT = Contract(
    "QdrantResult",
    struct(
        ("text", S, False),
        ("vector", T.ArrayType(T.FloatType()), False),
        ("url", S, True),
        ("keywords", S, True),
        ("embedding_input_text", S, True),
        ("metadata", MAP_SS, True),
        ("text_sha256_hash", S, False),
        ("collection", S, False),
        ("id", T.LongType(), False),
        ("history", S, False),
    ),
)

#: UrlItem (wurzel/steps/scraperapi/data.py:14-20)
URL_ITEM = Contract(
    "UrlItem",
    struct(("url", S, False), ("title", S, False), ("description", S, True), ("category", S, True)),
)
