"""Analytics artifact generation (SURVEY.md §3.2, §5.1).

The reference's notebook run emits 8 PNG charts (nb:cell15:72-81):
price distribution, price by room type, top property types, top
neighbourhoods, monthly review series, sentiment distribution, outlier
summaries, and a correlation heatmap. The engine computes each chart's
DATA as a small aggregate DataFrame (operators from plans.analytics) and
renders driver-side with matplotlib **when available**; this container
has no plotting libraries, so the gated fallback writes each chart's
collected data as CSV — the artifact contract (one file per chart, same
names) holds either way, and the expensive part (the aggregation) is
identical.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame

from . import analytics as an

try:  # pragma: no cover - matplotlib absent in this environment
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False


#: chart name -> (builder(listings_df, reviews_df) -> DataFrame)
def _chart_specs():
    return {
        "distribucion_precios": lambda lst, rev: an.distribuciones_numericas(
            lst, "price_clean"
        ),
        "precios_por_room_type": lambda lst, rev: an.analisis_precios(lst)[
            "por_room_type"
        ],
        "top_property_types": lambda lst, rev: an.analisis_categorico(
            lst, "property_type_normalizado", k=10
        ),
        "top_neighbourhoods": lambda lst, rev: an.analisis_categorico(
            lst, "neighbourhood_cleansed_clean", k=15
        ),
        "reviews_por_mes": lambda lst, rev: an.analisis_reviews(rev)["por_mes"],
        "distribucion_sentimiento": lambda lst, rev: an.analisis_reviews(rev)[
            "sentimiento"
        ],
        "outliers_precio": lambda lst, rev: an.analisis_outliers(
            lst, ["price_clean"]
        )["price_clean"],
        "correlaciones": lambda lst, rev: an.analisis_correlaciones(
            lst,
            ["price_clean", "accommodates_clean", "bedrooms_clean",
             "minimum_nights_clean", "availability_365_clean"],
            min_non_null=1,
        ),
    }


def _write_csv(df: DataFrame, path: str) -> None:
    rows = df.collect()
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.writer(fh)
        writer.writerow(df.columns)
        for r in rows:
            writer.writerow(list(r))


def _render_png(df: DataFrame, path: str, title: str) -> None:  # pragma: no cover
    rows = df.collect()
    fig, ax = plt.subplots(figsize=(8, 5))
    # First NUMERIC column is the bar height (e.g. correlaciones rows are
    # (col_a, col_b, corr) — index 1 would be a string).
    y_idx = next(
        (i for i, v in enumerate(rows[0]) if isinstance(v, (int, float))
         and i > 0),
        None,
    ) if rows else None
    if len(rows) > 1 and y_idx is not None:
        xs = [" ".join(str(v) for i, v in enumerate(r) if i != y_idx)
              for r in rows]
        ys = [r[y_idx] if r[y_idx] is not None else 0 for r in rows]
        ax.bar(xs, ys)
        ax.tick_params(axis="x", rotation=60)
    else:
        ax.axis("off")
        ax.table(
            cellText=[[str(v) for v in r] for r in rows],
            colLabels=df.columns, loc="center",
        )
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def generar_graficos(
    listings: DataFrame, reviews: DataFrame, out_dir: str
) -> list[str]:
    """Produce the 8 reference chart artifacts from TRANSFORMED tables.
    Returns the written file paths (PNG with matplotlib, CSV fallback)."""
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    for name, build in _chart_specs().items():
        df = build(listings, reviews)
        if HAVE_MPL:  # pragma: no cover
            path = os.path.join(out_dir, f"{name}.png")
            _render_png(df, path, name.replace("_", " "))
        else:
            path = os.path.join(out_dir, f"{name}.csv")
            _write_csv(df, path)
        written.append(path)
    return written
