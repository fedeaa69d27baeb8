"""Declarative pipeline plans (SURVEY.md §3, §7.2 phase 4–5)."""

from .transforms import (
    transform_calendar,
    transform_listings,
    transform_reviews,
)
from .pipeline import run_pipeline
from .quality import quality_report

__all__ = [
    "transform_calendar",
    "transform_listings",
    "transform_reviews",
    "run_pipeline",
    "quality_report",
]
