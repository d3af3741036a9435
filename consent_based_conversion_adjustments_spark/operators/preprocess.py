"""Preprocessing: clean → union → one-hot encode → split.

Re-expresses the reference's concat-then-encode-then-split trick
(reference: preprocess.py:81-148) — the structural guarantee that consenting
and non-consenting rows land in the *same* feature space — as
``unionByName`` → fit one encoding over the union → filter on the
``consent`` flag. The encoding itself (reference: pd.get_dummies,
preprocess.py:99-102) becomes a single ``array<double>`` features column
built from Catalyst expressions: one ``(col == value)`` indicator per
distinct categorical value plus the numeric feature columns.

Scale design: the only non-streaming step is collecting the per-column
distinct value sets (one small ``collect`` over an agg that Catalyst
executes as a partial/final ``collect_set``). The value sets are then baked
into the expression tree as literals, so ``transform`` is a pure map — no
shuffle, fully codegen'd, and safe on a 100 TB input. Cardinality guardrail:
``max_categories`` caps the literal explosion; beyond it, switch to the
hashed-feature path (operators.similarity_join handles arbitrary widths).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import AdjustmentConfig

CONSENT_FLAG = "consent"


def clean_data(df: DataFrame, conversion_column: str) -> DataFrame:
    """Drop null conversions, keep strictly positive values.

    reference: preprocess.py:45-47 (P2 drop-NaN, P3 predicate filter).
    """
    return df.na.drop(subset=[conversion_column]).filter(
        F.col(conversion_column) > 0
    )


def add_consent_flag(df: DataFrame, value: int) -> DataFrame:
    """reference: preprocess.py:132-133 (P4 literal column add)."""
    return df.withColumn(CONSENT_FLAG, F.lit(value))


@dataclass(frozen=True)
class FeatureEncoder:
    """One-hot encoding fitted over the union of both sides.

    ``categories`` maps categorical column → sorted distinct values (the
    dummy dimensions); ``numeric_cols`` pass through as-is. Feature order is
    deterministic: numerics first (sorted), then each categorical column's
    values in sorted order — the analogue of pd.get_dummies' column order
    being data-independent given the same fitted value sets.
    """

    categories: dict[str, tuple]
    numeric_cols: tuple

    @property
    def feature_names(self) -> list[str]:
        names = [str(c) for c in self.numeric_cols]
        for col in self.categories:
            names.extend(f"{col}={v}" for v in self.categories[col])
        return names

    @property
    def width(self) -> int:
        return len(self.numeric_cols) + sum(
            len(v) for v in self.categories.values()
        )

    def feature_exprs(self) -> list[Column]:
        exprs: list[Column] = [
            F.col(c).cast("double") for c in self.numeric_cols
        ]
        for col, values in self.categories.items():
            for v in values:
                # eqNullSafe: a null categorical encodes as all-zeros, like
                # pd.get_dummies(dummy_na=False)
                exprs.append(
                    F.when(F.col(col).eqNullSafe(F.lit(v)), 1.0).otherwise(0.0)
                )
        return exprs

    def transform(self, df: DataFrame, output_col: str = "features") -> DataFrame:
        return df.withColumn(output_col, F.array(*self.feature_exprs()))


def fit_encoder(
    df: DataFrame,
    categorical_cols: list[str],
    numeric_cols: list[str],
    max_categories: int = 10_000,
) -> FeatureEncoder:
    """Collect sorted distinct values per categorical column in ONE job.

    reference: the implicit fit inside pd.get_dummies over the concatenated
    frame (preprocess.py:99-102).
    """
    categories: dict[str, tuple] = {}
    if categorical_cols:
        row = df.select(
            *[
                F.sort_array(F.collect_set(F.col(c))).alias(c)
                for c in categorical_cols
            ]
        ).first()
        for c in categorical_cols:
            values = tuple(row[c])
            if len(values) > max_categories:
                raise ValueError(
                    f"column {c!r} has {len(values)} distinct values; "
                    f"exceeds max_categories={max_categories} — use the "
                    "hashed-feature path instead"
                )
            categories[c] = values
    return FeatureEncoder(
        categories=categories, numeric_cols=tuple(sorted(numeric_cols))
    )


@dataclass(frozen=True)
class HashedFeatureEncoder:
    """Feature hashing for high-cardinality categoricals (the fallback when
    a column blows past ``max_categories``): each (column, value) pair
    increments bucket ``hash(col || '=' || value) mod n_features``. No fit
    pass at all — fully stateless, identical on both table sides by
    construction, the standard trick when the distinct-value set itself is
    too large to broadcast. Collisions fold dimensions together (slightly
    blurring distances) but never break side-alignment."""

    categorical_cols: tuple
    numeric_cols: tuple
    n_features: int = 64

    @property
    def width(self) -> int:
        return len(self.numeric_cols) + self.n_features

    def transform(self, df: DataFrame, output_col: str = "features") -> DataFrame:
        # NULL categoricals contribute to no bucket (all-zeros), matching
        # FeatureEncoder's one-hot null semantics — without the guard,
        # concat_ws would skip the null and hash the bare column name into
        # a phantom category, so the two encoder paths would disagree on
        # distances for rows with missing values
        buckets = [
            (
                F.col(c).isNotNull(),
                F.pmod(
                    F.xxhash64(
                        F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
                    ),
                    F.lit(self.n_features),
                ),
            )
            for c in self.categorical_cols
        ]
        exprs: list[Column] = [
            F.col(c).cast("double") for c in sorted(self.numeric_cols)
        ]
        for j in range(self.n_features):
            total = None
            for not_null, bucket in buckets:
                term = F.when(not_null & (bucket == j), 1.0).otherwise(0.0)
                total = term if total is None else total + term
            exprs.append(total if total is not None else F.lit(0.0))
        return df.withColumn(output_col, F.array(*exprs))


def infer_feature_columns(
    df: DataFrame, config: AdjustmentConfig
) -> tuple[list[str], list[str]]:
    """Split the frame's columns into (categorical, numeric) feature roles.

    Mirrors the reference's dtype-driven selection: every string column that
    is not an id/drop/non-dummy/date column is dummy-coded
    (reference: preprocess.py:99-100); numeric columns (minus conversion,
    ids, flags) pass through as numeric features.

    Documented deviation (FIXTURES.md F5): the reference leaves the consent
    flag and non_dummy_columns IN the feature matrix
    (nearest_consented_customers.py:68-75 drops only id + conversion), so
    all its probe-build distances carry a constant +1. Excluding them keeps
    rankings and softmax weights identical (shift-invariance) but means a
    radius tuned on the reference must be reduced by that constant.
    """
    excluded = set(
        config.id_columns
        + config.drop_columns
        + config.non_dummy_columns
        + [config.conversion_column, CONSENT_FLAG]
    )
    if config.date_column:
        excluded.add(config.date_column)
    categorical, numeric = [], []
    for f in df.schema.fields:
        if f.name in excluded:
            continue
        if f.dataType.typeName() == "string":
            categorical.append(f.name)
        else:
            numeric.append(f.name)
    return sorted(categorical), sorted(numeric)


def union_encode_split(
    consent: DataFrame,
    noconsent: DataFrame,
    config: AdjustmentConfig,
    feature_engineering: Callable[[DataFrame], DataFrame] | None = None,
    features_col: str = "features",
) -> tuple[DataFrame, DataFrame, FeatureEncoder]:
    """The full preprocessing operator chain P2-P8 + U1 + E1 + P6.

    reference: preprocess.concatenate_and_process_data (preprocess.py:108-148)
    — concat with consent flags, clean, feature-engineering hook, dummy-code
    over the union, split back on the flag. The union-length invariant U4
    (preprocess.py:136-139) is structurally guaranteed by unionByName (exact,
    no silent row loss), so we do not force an extra count() job here.

    Returns (consent_processed, noconsent_processed, encoder); both outputs
    carry id/non-dummy/conversion columns plus the ``features`` array.
    """
    df = add_consent_flag(noconsent, 0).unionByName(add_consent_flag(consent, 1))
    df = df.drop(*[c for c in config.drop_columns if c in df.columns])
    df = clean_data(df, config.conversion_column)
    if feature_engineering is not None:
        # reference: preprocess.py:52-78 (P8 hook, identity by default)
        df = feature_engineering(df)
    categorical, numeric = infer_feature_columns(df, config)
    encoder = fit_encoder(df, categorical, numeric)
    encoded = encoder.transform(df, output_col=features_col)
    consent_out = encoded.filter(F.col(CONSENT_FLAG) == 1).drop(CONSENT_FLAG)
    noconsent_out = encoded.filter(F.col(CONSENT_FLAG) == 0).drop(CONSENT_FLAG)
    return consent_out, noconsent_out, encoder


def fit_ml_encoder(
    df: DataFrame, categorical_cols: list[str], numeric_cols: list[str]
):
    """SURVEY.md §2.4 E1 option (b): the pyspark.ml encoding path —
    StringIndexer → OneHotEncoder → VectorAssembler producing a
    ``SparseVector`` features column. Better than the relational encoder at
    very high cardinality (sparse storage, no literal explosion); fit it
    over the union exactly like ``fit_encoder`` so both sides share
    dimensions. Returns a fitted PipelineModel whose ``transform`` adds
    ``ml_features``.

    ``dropLast=False`` keeps one indicator per distinct value — the same
    dimensions as pd.get_dummies / FeatureEncoder, so L1/L2 distances agree
    between the two paths (up to feature order, which distances ignore).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler

    stages = []
    vec_inputs = [f"{c}" for c in sorted(numeric_cols)]
    if categorical_cols:
        idx_cols = [f"__idx_{c}" for c in categorical_cols]
        ohe_cols = [f"__ohe_{c}" for c in categorical_cols]
        stages.append(
            StringIndexer(
                inputCols=list(categorical_cols),
                outputCols=idx_cols,
                stringOrderType="alphabetAsc",
                handleInvalid="keep",
            )
        )
        stages.append(
            OneHotEncoder(inputCols=idx_cols, outputCols=ohe_cols, dropLast=False)
        )
        vec_inputs = vec_inputs + ohe_cols
    stages.append(
        VectorAssembler(inputCols=vec_inputs, outputCol="ml_features")
    )
    return Pipeline(stages=stages).fit(df)


def ml_features_to_array(df: DataFrame, output_col: str = "features") -> DataFrame:
    """Bridge the SparseVector column into the engine's ``array<double>``
    feature layout so the same distance expressions / kernels apply."""
    from pyspark.ml.functions import vector_to_array

    return df.withColumn(output_col, vector_to_array(F.col("ml_features")))


def split_adgroup_levels(
    df: DataFrame, adgroup_col: str = "adgroup", n_levels: int = 3, sep: str = "_"
) -> DataFrame:
    """Notebook feature engineering: split ``'A_B_C'`` into level columns.

    reference: cocoa_template.ipynb cell 13 (P8 variant).
    """
    parts = F.split(F.col(adgroup_col), sep)
    out = df
    for i in range(n_levels):
        out = out.withColumn(f"{adgroup_col}_level_{i}", parts.getItem(i))
    return out.drop(adgroup_col)
