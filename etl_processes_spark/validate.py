"""validate(profiles, synthetic_df) — re-profile the synthetic frame and diff
against the learned stats, per column (Latanova_v1.py:425-494).

Unlike the reference, which only PRINTS errors (:706-710), these results are
returned structured so tests can assert thresholds. Datetime columns are
validated on epoch seconds — the reference's datetime validation feeds
formatted date strings into np.mean and crashes (UFuncTypeError,
Latanova_v1.py:460-463 with :697); documented fix (SURVEY.md §2.11 Q8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_processes_spark.profile.profilers import (
    bool_profile,
    cat_profile,
    datetime_profile,
    numeric_profile,
)
from etl_processes_spark.profile.types import (
    BOOLEAN,
    CATEGORICAL,
    DATETIME,
    FLOAT,
    INTEGER,
    ColumnProfile,
)


def validate_numeric(prof: ColumnProfile, df: DataFrame, c: str) -> dict:
    """abs errors of mean/std/median (Latanova_v1.py:455-472)."""
    synth = numeric_profile(df, c)
    if synth is None:
        return {"error": "empty synthetic column"}
    return {
        "mean_error": abs(synth["mean"] - prof.stats["mean"]),
        "std_error": abs(synth["std"] - prof.stats["std"]),
        "median_error": abs(synth["median"] - prof.stats["median"]),
    }


def validate_datetime(prof: ColumnProfile, df: DataFrame, c: str) -> dict:
    """Numeric validation over parsed epoch seconds (reference-bug fix Q8)."""
    synth = datetime_profile(df, c)
    if synth is None:
        return {"error": "empty synthetic column"}
    return {
        "mean_error": abs(synth["mean"] - prof.stats["mean"]),
        "std_error": abs(synth["std"] - prof.stats["std"]),
        "median_error": abs(synth["median"] - prof.stats["median"]),
    }


def validate_boolean(prof: ColumnProfile, df: DataFrame, c: str) -> dict:
    """abs error of true-probability (Latanova_v1.py:473-484)."""
    synth = bool_profile(df, c)
    if synth is None:
        return {"error": "no parseable boolean values"}
    return {
        "true_prob_error": abs(
            synth["true_probability"] - prof.stats["true_probability"]
        )
    }


def validate_categorical(prof: ColumnProfile, df: DataFrame, c: str) -> dict:
    """n_categories error + most-common match (Latanova_v1.py:485-493)."""
    synth = cat_profile(df, c)
    if synth is None:
        return {"error": "empty synthetic column"}
    return {
        "n_categories_error": abs(
            synth["n_categories"] - prof.stats["n_categories"]
        ),
        "most_common_match": synth["most_common"] == prof.stats["most_common"],
    }


def validate(profiles: dict[str, ColumnProfile], synthetic: DataFrame) -> dict[str, dict]:
    results: dict[str, dict] = {}
    for c, prof in profiles.items():
        if c not in synthetic.columns:
            results[c] = {"error": "column missing from synthetic frame"}
            continue
        t = prof.logical_type
        if t in (INTEGER, FLOAT):
            results[c] = validate_numeric(prof, synthetic, c)
        elif t == DATETIME:
            results[c] = validate_datetime(prof, synthetic, c)
        elif t == BOOLEAN:
            results[c] = validate_boolean(prof, synthetic, c)
        elif t == CATEGORICAL:
            results[c] = validate_categorical(prof, synthetic, c)
        else:
            results[c] = {"skipped": t}
    return results


__all__ = [
    "validate",
    "validate_numeric",
    "validate_datetime",
    "validate_boolean",
    "validate_categorical",
]
