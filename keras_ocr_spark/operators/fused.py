"""Fused stage-2+3: per-row decode + reassembly via higher-order functions.

The exploded plan (decode.py + reassemble.py) mirrors the reference's
flatten-then-re-slice strategy (``recognition.py:504-537``) — but its
per-(conv_id, turn_idx) collect_list has ~one GROUP PER ROW, which drives
Spark's ObjectHashAggregate into sort-based fallback and a GC storm at
scale (measured: >80% of map-stage core-time in GC at 1.4M turns).

The insight: a turn's spans already sit TOGETHER in one array cell in
document order — re-associating them needs no shuffle at all. This
module decodes and reassembles inside the row:

    decoded = transform(spans, s -> struct(s.start, s.end,
                  decode_chain(substring(text, s.start+1, s.end-s.start))))
    kept    = filter(decoded, d -> length(d.clean) > 0)   -- blank drop
    clean_text = array_join(transform(kept, d -> d.clean), '\n')

making the WHOLE pipeline map-only: scan -> stage-1 pandas UDF -> this
projection. Zero exchanges, zero aggregation state; scales exactly like
the scan. Both plans produce identical frames
(tests/test_parity.py::TestFusedEqualsExploded).

The exploded plan remains available (`plans.pipeline.extract_exploded`)
for span-level analytics (per-span rows ARE the right shape for the
evaluation joins in evaluation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import crop_expr, decode_expr


def decode_reassemble_fused(detected: DataFrame) -> DataFrame:
    """detect() output -> (conv_id, turn_idx, clean_text, spans), per-row."""
    text = F.col("text")
    decoded = F.transform(
        "spans",
        lambda s: F.struct(
            s["start"].alias("start"),
            s["end"].alias("end"),
            decode_expr(crop_expr(text, s["start"], s["end"])).alias("clean"),
        ),
    )
    kept = F.filter(decoded, lambda d: F.length(d["clean"]) > 0)
    # Materialize `kept` in its own projection so the decode chain runs
    # once per row — Catalyst keeps the two projects separate because the
    # producing expression is non-cheap and referenced twice.
    staged = detected.select("conv_id", "turn_idx", kept.alias("_kept"))
    return staged.select(
        "conv_id",
        "turn_idx",
        F.array_join(F.transform("_kept", lambda d: d["clean"]), "\n").alias("clean_text"),
        F.transform("_kept", lambda d: F.struct(d["start"].alias("start"), d["end"].alias("end"))).alias("spans"),
    )
