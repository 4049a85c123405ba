"""Array higher-order-function kernels (SURVEY A6/A7/F9-F12).

The reference iterated Python lists per row (`(np.array(snrss) >
20).sum()`, `np.mean(snrss)`, signed label-weighted sums). These are
the same semantics as Catalyst array expressions — no shuffle, no
UDF, fully codegen'd, and they scale to 100 TB because they run
row-local inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_count_above(arr: Column, threshold: float) -> Column:
    """size(filter(arr, x -> x > t)) — the reference's
    `n_snr_ok = (np.array(snrss) > 20).sum()`
    (yt_channel_list_quality_merge.ipynb cell 4)."""
    return F.size(F.filter(arr, lambda x: x > F.lit(threshold)))


def array_count_where(arr: Column, pred) -> Column:
    """Generalized count-if over an array column."""
    return F.size(F.filter(arr, pred))


def array_mean(arr: Column) -> Column:
    """aggregate(arr, 0D, (a,x) -> a+x) / size(arr) — the reference's
    `np.mean(snrss)`; null for empty arrays (instead of NaN)."""
    total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return F.when(F.size(arr) > 0, total / F.size(arr))


def weighted_label_score(
    preds: Column, positive: list[str], negative: list[str]
) -> Column:
    """Signed label-weighted reduce over array<struct<label,score>> —
    the reference's ac_get_speech_probs (audio_ac.py:53-79, SURVEY
    F12/D4): +score for positive labels, -score for negative ones,
    0 otherwise. Pure Catalyst expression."""
    return F.aggregate(
        preds,
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(x["label"].isin(*positive), x["score"])
        .when(x["label"].isin(*negative), -x["score"])
        .otherwise(F.lit(0.0)),
    )


# The reference's live speech-prob label sets (audio_ac.py:53-79).
SPEECH_POSITIVE = [
    "Narration, monologue",
    "Female speech, woman speaking",
    "Male speech, man speaking",
    "Speech",
]
SPEECH_NEGATIVE = ["Conversation", "Music", "Sound effect"]


def speech_prob(preds: Column) -> Column:
    """The reference's exact speech-probability reduction (D4)."""
    return weighted_label_score(preds, SPEECH_POSITIVE, SPEECH_NEGATIVE)
