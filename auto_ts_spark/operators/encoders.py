"""Encoders: NaN/unseen-safe, invertible label encoding + the assembled
feature pipeline.

Reference parity (SURVEY.md §2.9 M12): ``My_LabelEncoder``
(auto_ts/utils/my_encoders.py:11-115) label-encodes with three
guarantees the Spark rebuild preserves:
- NaN/None receives its own stable code (not dropped, not an error);
- values unseen at fit time map to ``max_code + 1`` at transform time
  (auto_ts/utils/my_encoders.py:81-95);
- the mapping is invertible (``inverse_transform``).

Design: the fitted state is a tiny *mapping DataFrame* ``(value,
code)`` — not driver-side dicts — applied with a broadcast left join,
so transform is one shuffle-free stage at any scale and the mapping is
trivially persistable (parquet) and auditable. Codes are assigned by
sorted value order (deterministic across runs/partitionings, unlike
first-seen order which is partition-order-dependent on a cluster).

``build_feature_pipeline`` assembles the Spark ML equivalent of the
reference's column transformer (ml_models.py:463-568): StringIndexer
(handleInvalid='keep' ≡ unseen bucket) → Imputer → OneHotEncoder →
VectorAssembler → MaxAbsScaler (preserves sparsity/sign like the
reference's MaxAbs choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00__NULL__"


class LabelEncoder:
    """Fit/transform/inverse label encoder backed by a mapping DataFrame."""

    def __init__(self, col: str, *, out_col: str | None = None) -> None:
        self.col = col
        self.out_col = out_col or f"{col}_code"
        self.mapping: DataFrame | None = None
        self.max_code: int | None = None

    def fit(self, df: DataFrame) -> "LabelEncoder":
        vals = df.select(
            F.coalesce(F.col(self.col).cast("string"), F.lit(NULL_SENTINEL)).alias(
                "value"
            )
        ).distinct()
        w = Window.orderBy("value")
        self.mapping = vals.select(
            "value", (F.row_number().over(w) - 1).alias("code")
        )
        self.max_code = self.mapping.agg(F.max("code")).collect()[0][0]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        assert self.mapping is not None, "fit first"
        key = F.coalesce(F.col(self.col).cast("string"), F.lit(NULL_SENTINEL))
        joined = df.withColumn("_key", key).join(
            F.broadcast(self.mapping.withColumnRenamed("value", "_key")),
            "_key",
            "left",
        )
        # unseen value -> max_code + 1 (reference my_encoders.py:81-95)
        return joined.withColumn(
            self.out_col,
            F.coalesce(F.col("code"), F.lit(self.max_code + 1)).cast("int"),
        ).drop("_key", "code")

    def inverse_transform(self, df: DataFrame, code_col: str | None = None) -> DataFrame:
        assert self.mapping is not None, "fit first"
        code_col = code_col or self.out_col
        inv = self.mapping.select(
            F.col("code").alias(code_col),
            F.when(F.col("value") == NULL_SENTINEL, F.lit(None))
            .otherwise(F.col("value"))
            .alias(f"{code_col}_value"),
        )
        return df.join(F.broadcast(inv), code_col, "left")


def label_encode(
    df: DataFrame, col: str, *, train_df: DataFrame | None = None
) -> DataFrame:
    """One-shot NaN/unseen-safe label encode (fit on ``train_df`` or
    ``df`` itself)."""
    enc = LabelEncoder(col).fit(train_df if train_df is not None else df)
    return enc.transform(df)


def build_feature_pipeline(
    cat_cols: list[str],
    num_cols: list[str],
    *,
    output_col: str = "features",
):
    """Spark ML Pipeline mirroring the reference's transformer stack
    (ml_models.py:463-568): index+OHE categoricals (unseen kept as an
    extra bucket), median-impute numerics, assemble, MaxAbs-scale."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import (
        Imputer,
        MaxAbsScaler,
        OneHotEncoder,
        StringIndexer,
        VectorAssembler,
    )

    stages = []
    ohe_outs = []
    for c in cat_cols:
        stages.append(
            StringIndexer(
                inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep",
                stringOrderType="alphabetAsc",
            )
        )
        stages.append(
            OneHotEncoder(
                inputCol=f"{c}_idx", outputCol=f"{c}_ohe", handleInvalid="keep"
            )
        )
        ohe_outs.append(f"{c}_ohe")
    imputed = [f"{c}_imp" for c in num_cols]
    if num_cols:
        stages.append(
            Imputer(inputCols=num_cols, outputCols=imputed, strategy="median")
        )
    stages.append(
        VectorAssembler(
            inputCols=ohe_outs + imputed, outputCol="_assembled",
            handleInvalid="keep",
        )
    )
    stages.append(MaxAbsScaler(inputCol="_assembled", outputCol=output_col))
    return Pipeline(stages=stages)
