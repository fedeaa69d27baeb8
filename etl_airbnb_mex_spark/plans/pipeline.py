"""End-to-end E-T-L orchestration (SURVEY.md §3.1 redesigned).

The reference runs eager sequential phases through an ETLManager
(src/main.py:224-263) holding every table in driver RAM between phases.
Here each table is ONE lazy plan — scan → transform expressions → write —
so Spark pipelines extract+transform+load per partition with no
whole-table materialization; the driver only ever holds per-table counts
for the run report (S11/S12).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import read_table_set
from ..sources.writers import (
    drop_id_columns,
    normalize_for_sink,
    write_json_report,
    write_parquet_overwrite,
)
from .metrics import MetricsCollector
from .transforms import TRANSFORMS


def run_pipeline(
    spark: SparkSession,
    input_paths: dict[str, str],
    output_dir: str,
    fmt: str = "parquet",
    report_path: str | None = None,
    limit: int | None = None,
    partition_spec: dict[str, tuple[str, ...]] | None = None,
) -> dict[str, Any]:
    """Extract → transform → load → verify → report, one lazy plan per
    table. Returns the run report dict (S12 shape: per-table extracted /
    transformed / loaded counts + timings, src/main.py:175-222).

    Counts are real actions (each forces the plan); the load itself
    re-uses the same plan, so a table is scanned at most twice (once for
    the pre-count, once for the write+verify) — the reference scans each
    table once per *step*.
    """
    unknown_parts = sorted(set(partition_spec or {}) - set(input_paths))
    if unknown_parts:
        # Same fail-loudly contract as the CLI's entradas validation: a
        # typo here would silently skip the 100 TB partitioning posture.
        raise ValueError(
            f"partition_spec names unknown tables {unknown_parts}; "
            f"inputs are {sorted(input_paths)}"
        )
    started = time.perf_counter()
    mc = MetricsCollector()
    report: dict[str, Any] = {
        "fecha_inicio": datetime.now(timezone.utc).isoformat(),
        "tablas": {},
    }

    tables = read_table_set(spark, input_paths, fmt=fmt)
    for name, raw in tables.items():
        if limit is not None:
            # S1/O3 — the reference's --limite extraction cap
            # (find().limit(n)); Catalyst pushes the LocalLimit to the
            # scan, so capped runs never read the full source.
            raw = raw.limit(limit)
        t0 = time.perf_counter()
        extracted = mc.timed_count(f"extraccion_{name}", raw)
        if extracted == 0:
            # Missing/empty collection: recorded, not fatal (the
            # reference's calendar case, log:31 / report:36).
            report["tablas"][name] = {
                "extraidos": 0, "transformados": 0, "cargados": 0,
                "segundos": round(time.perf_counter() - t0, 3),
            }
            continue
        transformed_df = _transform(name, raw)
        out_path = os.path.join(output_dir, f"raw_{name}_transformado")
        sink_df = normalize_for_sink(drop_id_columns(transformed_df))
        # 100 TB sink posture: partitioned writes (e.g. reviews by año)
        # give readers partition pruning and writers full parallelism.
        partitions = (partition_spec or {}).get(name, ())
        with mc.timed(f"carga_{name}"):
            write_parquet_overwrite(sink_df, out_path, partition_by=partitions)
        # S11 verification: count what was actually persisted.
        loaded = mc.timed_count(
            f"verificacion_{name}", spark.read.parquet(out_path)
        )
        report["tablas"][name] = {
            "extraidos": extracted,
            "transformados": loaded,
            "cargados": loaded,
            "columnas": len(sink_df.columns),
            "ruta": out_path,
            "segundos": round(time.perf_counter() - t0, 3),
        }

    report["total_registros"] = sum(
        t["cargados"] for t in report["tablas"].values()
    )
    report["acciones"] = mc.as_rows()
    report["segundos_totales"] = round(time.perf_counter() - started, 3)
    report["fecha_fin"] = datetime.now(timezone.utc).isoformat()
    if report_path:
        write_json_report(report, report_path)
    return report


def _transform(name: str, df: DataFrame) -> DataFrame:
    fn = TRANSFORMS.get(name)
    return fn(df) if fn else df
