"""The reference's Transform phase as lazy DataFrame plans.

Reference: ``transformar_listings`` (10 numbered steps,
src/transformacion.py:185-329), ``transformar_reviews`` (:331-374),
``transformar_calendar`` (:376-402). Each reference step mutates a pandas
frame in place with row-wise Python (the 16.2 s amenities loop and 11.9 s
boolean loop, log:56-75); here each transform is ONE ``select`` over
native expressions — zero Python UDFs, zero shuffles except the dedup's
single hash shuffle, so the whole phase is a narrow scan→project pipeline
that scales linearly with input splits.

Derived-column names follow the reference (Spanish where it is Spanish:
``categoria_precio``, ``año``...); widths match FIXTURES.md B.4
(listings +33, reviews +11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import (
    amenity_flags_packed,
    clean_string_array,
    parse_string_array,
)
from ..functions.cleaning import (
    bool_encode,
    bool_encode_narrow,
    clean_price,
    map_with_default,
    numeric_coerce,
    price_bucket,
    text_fill_sentinel,
)
from ..functions.dates import (
    date_normalize,
    month_name,
    robust_to_timestamp,
    weekday_mon0,
)
from ..functions.text import sentiment_score, string_length_compat, title_case
from ..operators.dedup import dedup_keep_first
from ..sources.readers import unwrap_mongo_date

#: F10 category translations (src/transformacion.py:231-245).
ROOM_TYPE_MAP = {
    "Entire home/apt": "Casa/Departamento completo",
    "Private room": "Habitación privada",
    "Shared room": "Habitación compartida",
    "Hotel room": "Habitación de hotel",
}
PROPERTY_TYPE_MAP = {
    "Apartment": "Departamento",
    "House": "Casa",
    "Condominium": "Condominio",
    "Loft": "Loft",
    "Other": "Otro",
}

#: Step groupings (column lists) for listings, from FIXTURES.md B.1.
LISTING_DATE_COLS = ("host_since", "calendar_last_scraped", "last_scraped")
LISTING_NUMERIC_COLS = (
    "accommodates", "bedrooms", "beds", "minimum_nights", "maximum_nights",
    "availability_30", "availability_60", "availability_90",
    "availability_365",
)
LISTING_TEXT_COLS = ("name", "description", "neighbourhood_cleansed")
LISTING_BOOL_COLS = (
    "host_is_superhost", "host_identity_verified", "has_availability",
)

_ORDER_COL = "__file_order"


def _with_file_order(df: DataFrame) -> DataFrame:
    """Surrogate for pandas' first-in-file-order dedup semantics (D1,
    SURVEY.md §7.4.4): a per-row monotonically increasing id captured at
    scan time, used as the deterministic keep-first tie-break.

    Caveat: monotonically_increasing_id encodes (partition index, row
    offset), so WHICH duplicate survives depends on the file-split
    layout — deterministic for a given input + reader configuration, but
    a different maxPartitionBytes (or a different engine) can pick a
    different member of the duplicate group. That matches the pandas
    semantics only insofar as Spark's split planning preserves file
    order within partitions (it does for unsplit row groups). Callers
    that need byte-for-byte reference parity on the survivor should pass
    a stable source column (e.g. ``_id`` or a reader-provided line
    number) to :func:`dedup_keep_first` instead; all quality metrics
    downstream are survivor-invariant (duplicate groups are exact-key
    groups, so aggregate counts do not depend on the choice)."""
    return df.withColumn(_ORDER_COL, F.monotonically_increasing_id())


def _keyed_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    return dedup_keep_first(df, keys=keys, order=[_ORDER_COL])


def transform_listings(df: DataFrame) -> DataFrame:
    """Steps 1–9 of the listings transform (step 10, the quality report,
    lives in :mod:`.quality`): critical-key dropna → keep-first dedup →
    price clean/bucket → date normalization ×3 → amenities parse/flags →
    category translation ×2 → boolean encoding ×3 → numeric coercion ×9
    → text fill ×3. Adds exactly the 33 columns recorded at log:99
    (77→110 on the full schema)."""
    base = _keyed_dedup(
        _with_file_order(df).na.drop(subset=["id", "latitude", "longitude"]),
        keys=["id"],
    )
    amenities_arr = clean_string_array(parse_string_array(F.col("amenities")))
    price_clean = clean_price("price")
    derived = [
        price_clean.alias("price_clean"),
        price_bucket(price_clean).alias("categoria_precio"),
        *[
            date_normalize(unwrap_mongo_date(c)).alias(f"{c}_clean")
            for c in LISTING_DATE_COLS
        ],
        amenities_arr.alias("amenities_procesados"),
        *amenity_flags_packed(amenities_arr),
        map_with_default("room_type", ROOM_TYPE_MAP).alias(
            "room_type_normalizado"
        ),
        map_with_default("property_type", PROPERTY_TYPE_MAP).alias(
            "property_type_normalizado"
        ),
        *[bool_encode(c).alias(f"{c}_bin") for c in LISTING_BOOL_COLS],
        *[
            numeric_coerce(c).alias(f"{c}_clean")
            for c in LISTING_NUMERIC_COLS
        ],
        *[
            text_fill_sentinel(c).alias(f"{c}_clean")
            for c in LISTING_TEXT_COLS
        ],
    ]
    return base.select(*df.columns, *derived)


def transform_reviews(df: DataFrame) -> DataFrame:
    """Reviews transform (src/transformacion.py:331-374): critical-key
    dropna → keep-first dedup → date normalize + 6 calendar parts
    (Spanish names, Mon=0 weekday) → comments clean/length (astype(str)
    'nan' compat, F5) → sentiment (F13) → reviewer-name title case (F6).
    Adds exactly the 11 columns recorded at log:100 (7→18)."""
    base = _keyed_dedup(
        _with_file_order(df).na.drop(subset=["id", "listing_id"]),
        keys=["id"],
    )
    ts = robust_to_timestamp(unwrap_mongo_date("date"))
    comments_clean = F.trim(F.coalesce(F.col("comments"), F.lit("nan")))
    derived = [
        date_normalize(unwrap_mongo_date("date")).alias("date_clean"),
        F.year(ts).alias("año"),
        F.month(ts).alias("mes"),
        F.dayofmonth(ts).alias("dia"),
        F.quarter(ts).alias("trimestre"),
        weekday_mon0(ts).alias("dia_semana"),
        month_name(ts).alias("nombre_mes"),
        comments_clean.alias("comments_clean"),
        string_length_compat("comments").alias("comments_length"),
        F.coalesce(sentiment_score(comments_clean), F.lit(0)).alias(
            "sentiment_score"
        ),
        title_case("reviewer_name").alias("reviewer_name_clean"),
    ]
    return base.select(*df.columns, *derived)


def transform_calendar(df: DataFrame) -> DataFrame:
    """Calendar transform (src/transformacion.py:376-402): critical-key
    dropna → date normalize → narrow availability map (F12) → price
    clean (F1)."""
    base = _with_file_order(df).na.drop(subset=["listing_id", "date"])
    derived = [
        date_normalize(unwrap_mongo_date("date")).alias("date_clean"),
        bool_encode_narrow("available").alias("available_bin"),
        clean_price("price").alias("price_clean"),
    ]
    return base.select(*df.columns, *derived)


TRANSFORMS = {
    "listings": transform_listings,
    "reviews": transform_reviews,
    "calendar": transform_calendar,
}
