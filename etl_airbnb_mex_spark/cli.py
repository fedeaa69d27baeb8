"""Pipeline CLI — the engine face of the reference's ``python
src/main.py`` entry point (src/main.py:308-352): optional JSON config,
per-collection extraction cap, run report, exit code 0/1.

Usage::

    python -m etl_airbnb_mex_spark.cli \
        --listings data/listings.parquet --reviews data/reviews.parquet \
        --salida out/ --limite 50000 --reporte out/reporte_etl.json

or with a JSON config (``--config etl.json``) carrying the same keys
(``entradas`` mapping, ``salida``, ``limite``, ``reporte``); explicit
flags override config values, like the reference's CLI.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="etl-airbnb-mex-spark",
        description="E-T-L pipeline (extract → transform → load → verify)",
    )
    p.add_argument("--config", help="JSON config file (reference: --config)")
    for table in ("listings", "reviews", "calendar"):
        p.add_argument(f"--{table}", help=f"input path for {table}")
    p.add_argument("--formato", default=None, choices=["parquet", "json"],
                   help="input format (default parquet)")
    p.add_argument("--salida", default=None, help="output directory")
    p.add_argument("--limite", type=int, default=None,
                   help="per-collection extraction cap (reference: --limite)")
    p.add_argument("--reporte", default=None, help="JSON run-report path")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    conf: dict = {}
    if args.config:
        with open(args.config) as fh:
            conf = json.load(fh)

    entradas = dict(conf.get("entradas", {}))
    known = ("listings", "reviews", "calendar")
    unknown = sorted(set(entradas) - set(known))
    if unknown:
        # A typo'd table name must fail loudly, not run a 0-row "success".
        print(
            f"error: unknown table(s) in config entradas: {unknown}; "
            f"expected one of {list(known)}",
            file=sys.stderr,
        )
        return 1
    for table in known:
        path = getattr(args, table)
        if path:
            entradas[table] = path
    salida = args.salida or conf.get("salida")
    if not entradas or not salida:
        print("error: at least one input table and --salida are required",
              file=sys.stderr)
        return 1

    from .plans.pipeline import run_pipeline
    from .session import get_spark

    spark = get_spark(app_name="etl-airbnb-mex-spark-cli")
    try:
        report = run_pipeline(
            spark,
            entradas,
            salida,
            fmt=args.formato or conf.get("formato", "parquet"),
            report_path=args.reporte or conf.get("reporte"),
            limit=args.limite if args.limite is not None else conf.get("limite"),
        )
    except Exception as exc:  # noqa: BLE001 — CLI boundary: report + exit 1
        print(f"ETL FALLIDO: {exc}", file=sys.stderr)
        return 1
    print(json.dumps(
        {
            "total_registros": report["total_registros"],
            "segundos_totales": report["segundos_totales"],
            "tablas": {
                k: v["cargados"] for k, v in report["tablas"].items()
            },
        }
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
