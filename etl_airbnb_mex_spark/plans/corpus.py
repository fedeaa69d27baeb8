"""End-to-end LLM training-data hygiene pipeline (SURVEY.md §2.11):
the composed form of the corpus operators — quality gate → PII scrub →
exact dedup → MinHash near-dedup → benchmark decontamination — as ONE
lazy plan, the way a production pre-training pipeline chains them.

Stage order is the standard one: cheap in-row gates first (so every
later shuffle sees fewer rows), fingerprint dedup before LSH (exact
dups would otherwise saturate LSH buckets), decontamination last (its
eval side is tiny; running it on the deduped corpus minimizes the gram
join's probe side).

Scale shape: the only shuffles are the dedup hash (32-byte md5), the
LSH band join (ids + band hashes), and the decontamination gram join
(ids + grams) — text ships through projections only, never through a
shuffle. The whole chain composes lazily; one action executes it with
AQE sizing every exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import pii_scrub, quality_score_cols, word_repetition_ratio
from ..operators.dedup import (
    dedup_text_exact,
    decontaminate_ngram_overlap,
    near_dedup_corpus,
)


def corpus_pipeline(
    docs: DataFrame,
    eval_set: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_repetition: float = 0.6,
    near_dup_threshold: float = 0.5,
    decontam_ngram: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Returns the cleaned corpus: (id, clean_text, n_tokens).

    Gates: token count ≥ ``min_tokens``, word-repetition ratio ≤
    ``max_repetition`` (both in-row, evaluated before any shuffle);
    then PII scrub (projection), exact dedup (keep lowest id per
    normalized-text md5), MinHash-LSH near-dedup at
    ``near_dup_threshold``, and — when ``eval_set`` is given —
    removal of documents sharing a distinct word ``decontam_ngram``-gram
    with it.

    ``portable=True`` swaps the MinHash stage to the engine-portable
    hash family (operators/dedup.py:minhash_signatures) so the whole
    composed pipeline is DuckDB-replayable; production keeps xxhash64.
    """
    q = quality_score_cols(text_col)
    gated = (
        docs.filter(F.col(text_col).isNotNull())
        .filter(q["n_tokens"] >= min_tokens)
        .filter(
            F.coalesce(word_repetition_ratio(text_col), F.lit(0.0))
            <= max_repetition
        )
    )
    # Two consumers (the md5 dedup build and the semi-join probe) —
    # without truncation the in-row gates + the PII regex chain (the
    # CPU-heaviest projection in the chain) re-execute per consumer.
    scrubbed = gated.select(
        id_col, pii_scrub(text_col).alias(text_col)
    ).localCheckpoint(eager=False)
    exact_survivors = dedup_text_exact(scrubbed, text_col, id_col).select(
        id_col
    )
    deduped = scrubbed.join(exact_survivors, id_col, "left_semi")
    near = near_dedup_corpus(
        deduped, text_col, id_col, threshold=near_dup_threshold,
        portable=portable,
    )
    if eval_set is not None:
        flagged = decontaminate_ngram_overlap(
            near, eval_set, id_col, text_col, n=decontam_ngram
        ).select(id_col)
        near = near.join(flagged, id_col, "left_anti")
    return near.select(
        id_col,
        F.col(text_col).alias("clean_text"),
        F.size(F.split(F.col(text_col), r"\s+")).alias("n_tokens"),
    )


def corpus_pipeline_report(
    docs: DataFrame,
    eval_set: DataFrame | None = None,
    **kwargs,
) -> dict[str, int]:
    """Per-stage survivor counts (eager — each count re-executes the
    chain up to that stage; at scale persist the intermediate stages or
    fold the counts into accumulators instead)."""
    id_col = kwargs.get("id_col", "doc_id")
    text_col = kwargs.get("text_col", "text")
    q = quality_score_cols(text_col)
    gated = (
        docs.filter(F.col(text_col).isNotNull())
        .filter(q["n_tokens"] >= kwargs.get("min_tokens", 5))
        .filter(
            F.coalesce(word_repetition_ratio(text_col), F.lit(0.0))
            <= kwargs.get("max_repetition", 0.6)
        )
    )
    scrubbed = gated.select(id_col, pii_scrub(text_col).alias(text_col))
    deduped = scrubbed.join(
        dedup_text_exact(scrubbed, text_col, id_col).select(id_col),
        id_col,
        "left_semi",
    )
    near = near_dedup_corpus(
        deduped, text_col, id_col,
        threshold=kwargs.get("near_dup_threshold", 0.5),
    )
    report = {
        "input": docs.count(),
        "after_quality_gate": gated.count(),
        "after_exact_dedup": deduped.count(),
        "after_near_dedup": near.count(),
    }
    if eval_set is not None:
        flagged = decontaminate_ngram_overlap(
            near, eval_set, id_col, text_col,
            n=kwargs.get("decontam_ngram", 5),
        ).select(id_col)
        report["after_decontaminate"] = near.join(
            flagged, id_col, "left_anti"
        ).count()
    return report
