#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to files.

Usage: python scripts/explain_dump.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from keras_ocr_spark.driver_queries import QUERIES  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    outdir.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="explain_dump", master="local[8]", shuffle_partitions=32)
    for name in sys.argv[3:]:
        fn, _ = QUERIES[name]
        df = fn(spark, SF_DIR)
        txt = spark._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
