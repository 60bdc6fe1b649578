#!/usr/bin/env python
"""spark-submit entry point for the DATA-QUALITY audit — the ops-side
counterpart to extract_job.py (pipeline) and curate_job.py (corpus):

    bash scripts/package.sh
    spark-submit --master local[32] \\
        --py-files dist/keras_ocr_spark.zip \\
        scripts/quality_job.py \\
        --input /path/table.parquet --report /tmp/quality.json \\
        [--key-col user_id] [--rules "name:predicate" ...] \\
        [--approx-distinct]

One invocation emits the audit a 100 TB ingest runs before letting a
batch flow downstream: per-column profile (exact or HLL
cardinalities), declared expectation-rule violations, and — when a
key column is named — the pre-join skew report with the salt factor
`salted_join` would need. Exit code 1 when any expectation rule
fails, so the job gates a pipeline directly.

Scans: one for the profile, one for the rules, one for the skew count
(rule evaluation could ride the profile scan via Observation — kept
separate so each section is independently optional).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from keras_ocr_spark.operators.expectations import check_expectations  # noqa: E402
from keras_ocr_spark.operators.profile import profile_table  # noqa: E402
from keras_ocr_spark.operators.skewjoin import skew_report  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--report", required=True)
    ap.add_argument("--key-col", default=None)
    ap.add_argument("--rules", nargs="*", default=[],
                    help="expectation rules as name:sql_predicate")
    ap.add_argument("--approx-distinct", action="store_true")
    ap.add_argument("--target-rows-per-task", type=int, default=1_000_000)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    spark = build_session(app_name="quality_job", master=args.master, shuffle_partitions=8)
    df = spark.read.parquet(args.input)

    report: dict = {"input": args.input, "columns": {}}
    for r in profile_table(df, approx_distinct=args.approx_distinct).collect():
        report["columns"][r.col_name] = {
            "n_rows": r.n_rows,
            "n_null": r.n_null,
            "n_distinct": r.n_distinct,
            "min": r.min_repr,
            "max": r.max_repr,
        }

    failed = 0
    if args.rules:
        rules = []
        for spec in args.rules:
            name, _, pred = spec.partition(":")
            if not pred:
                raise SystemExit(f"bad rule (want name:predicate): {spec!r}")
            rules.append((name, pred))
        report["expectations"] = {}
        for r in check_expectations(df, rules).collect():
            report["expectations"][r.rule_name] = {
                "n_violations": r.n_violations,
                "violation_ppm": r.violation_ppm,
                "passed": bool(r.passed),
            }
            failed += 0 if r.passed else 1

    if args.key_col:
        report["skew"] = [
            {
                "rank": r.rank,
                "key": r.key_repr,
                "rows": r.key_rows,
                "share_ppm": r.share_ppm,
                "salt_factor": r.salt_factor,
            }
            for r in skew_report(
                df, args.key_col, target_rows_per_task=args.target_rows_per_task
            ).collect()
        ]

    report["failed_rules"] = failed
    Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps({"failed_rules": failed, "report": args.report}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
