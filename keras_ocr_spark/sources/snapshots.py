"""Versioned table snapshots with time travel — Iceberg semantics,
emulated on parquet + atomic JSON manifests.

What Iceberg/Delta give a 100 TB estate that plain parquet dirs do
not: every write is a new immutable VERSION, readers pick a version
(latest by default, any historical one on demand), and the commit
point is a tiny metadata swap — never the data files themselves. This
module provides that contract on the same parquet+manifest substrate
as ``plans/checkpoint.py`` (see its atomicity notes), sized for the
sandbox where the Iceberg jars are absent (``sources/tableio.py:48``
holds the config-swap seam for when they exist).

Layout:

    table/
      data/v1/  data/v2/ ...       immutable parquet per version
      _snapshots/v1.json v2.json   commit manifests (version, path,
                                   n_rows, content_hash, parent)

Commit protocol: the data directory is fully written FIRST, then the
manifest lands via write-temp + ``os.replace`` (atomic on POSIX). A
crash mid-write leaves an orphan data dir but never a visible version
— readers only trust manifests, exactly the checkpoint module's
"manifest attests data" rule. Row count and an order-independent
content hash ride the write job itself via ``plans/observe.py`` (zero
extra scans), so every manifest carries verifiable lineage for free.

Time travel is then just "read the path the chosen manifest names";
``history`` is a directory listing. No compaction/expiry is
implemented (out of scope — the emulation is the READ contract).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..plans.observe import write_with_audit


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next version of ``table_dir``; returns the
    new version number. The manifest is the commit point."""
    root = Path(table_dir)
    snaps = root / "_snapshots"
    snaps.mkdir(parents=True, exist_ok=True)
    versions = sorted(int(p.stem[1:]) for p in snaps.glob("v*.json"))
    v = (versions[-1] + 1) if versions else 1
    rel = f"data/v{v}"
    audit = write_with_audit(
        df,
        str(root / rel),
        {
            "n_rows": "count(*)",
            "content_hash": f"coalesce(bit_xor(xxhash64({', '.join(sorted(df.columns))})), 0)",
        },
        mode="error",  # versions are immutable — never overwrite one
    )
    manifest = {
        "version": v,
        "path": rel,
        "n_rows": int(audit["n_rows"]),
        "content_hash": int(audit["content_hash"]),
        "parent": versions[-1] if versions else None,
        "schema": df.schema.json(),
    }
    tmp = snaps / f".v{v}.json.tmp"
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, snaps / f"v{v}.json")
    return v


def history(table_dir: str) -> list[dict]:
    """Committed versions, oldest first (manifests only — orphan data
    dirs from crashed writers are invisible here by design)."""
    snaps = Path(table_dir) / "_snapshots"
    out = []
    for p in sorted(snaps.glob("v*.json"), key=lambda p: int(p.stem[1:])):
        try:
            out.append(json.loads(p.read_text()))
        except (json.JSONDecodeError, OSError):
            continue  # half-written manifests are not versions
    return out


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read ``table_dir`` at ``version`` (latest when omitted). Raises
    on an unknown version rather than silently reading another one."""
    hist = history(table_dir)
    if not hist:
        raise ValueError(f"no committed snapshots under {table_dir}")
    if version is None:
        chosen = hist[-1]
    else:
        byv = {m["version"]: m for m in hist}
        if version not in byv:
            raise ValueError(
                f"version {version} not found; have {sorted(byv)}"
            )
        chosen = byv[version]
    return spark.read.parquet(str(Path(table_dir) / chosen["path"]))


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change feed between two committed versions — the CDC read that
    makes time travel ACTIONABLE: an incremental consumer processes
    ``snapshot_changes(v_consumed, v_latest)`` instead of re-reading
    100 TB. One full-outer digest join (``operators/merge.py:
    table_diff`` — the shuffle carries an md5 digest per row, not the
    row), statuses renamed to the CDC verbs: ``insert`` (key only in
    ``v_to``), ``delete`` (only in ``v_from``), ``update`` (present in
    both, any value column differs)."""
    from ..operators.merge import table_diff
    from pyspark.sql import functions as F

    old = read_snapshot(spark, table_dir, v_from)
    new = read_snapshot(spark, table_dir, v_to)
    diff = table_diff(old, new, key_cols)
    verb = (
        F.when(F.col("status") == "only_left", F.lit("delete"))
        .when(F.col("status") == "only_right", F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return diff.select(*key_cols, verb.alias("change"))


def merge_into_snapshot(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key_cols: list[str],
) -> int:
    """The lakehouse write path: MERGE ``source`` into the LATEST
    version (SCD1 source-wins semantics — ``operators/merge.py:
    merge_upsert``, incl. its unique-source-key precondition) and
    commit the result as a NEW immutable version. Readers on any older
    version are untouched (snapshot isolation by construction — they
    hold their own data files); the CDC feed between the old and new
    head is exactly the merge's effect. Returns the new version."""
    hist = history(table_dir)
    if not hist:
        raise ValueError(f"no committed snapshots under {table_dir}")
    from ..operators.merge import merge_upsert

    target = read_snapshot(spark, table_dir)
    merged = merge_upsert(target, source, key_cols)
    return write_snapshot(merged, table_dir)


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` versions —
    manifests FIRST (the version disappears atomically for readers),
    data dirs after (reclaiming the bytes). Returns the expired
    version numbers. A reader holding an expired version's DataFrame
    may still fail mid-scan — the same contract as Iceberg's
    expire_snapshots: retention length IS the long-query horizon."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    hist = history(table_dir)
    drop = hist[:-keep_last] if len(hist) > keep_last else []
    root = Path(table_dir)
    for m in drop:
        (root / "_snapshots" / f"v{m['version']}.json").unlink(missing_ok=True)
    for m in drop:
        shutil.rmtree(root / m["path"], ignore_errors=True)
    return [m["version"] for m in drop]
