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



def decode_reassemble_fused(detected: DataFrame) -> DataFrame:
    """detect() output -> (conv_id, turn_idx, clean_text, spans), per-row.

    r6: the span struct now carries ``clean`` from the stage-1 kernel
    (one C-regex decode in the worker that already holds the string), so
    this stage is pure filter + join — the previous per-span interpreted
    crop+decode chain (~10 Catalyst expressions per span inside the
    transform lambda) is gone. Equality with the JVM-decoding exploded
    plan is still pinned by tests/test_parity.py, which in turn pins the
    decoder twins against each other."""
    kept = F.filter("spans", lambda d: F.length(d["clean"]) > 0)
    staged = detected.select("conv_id", "turn_idx", kept.alias("_kept"))
    return staged.select(
        "conv_id",
        "turn_idx",
        F.array_join(F.transform("_kept", lambda d: d["clean"]), "\n").alias("clean_text"),
        F.transform("_kept", lambda d: F.struct(d["start"].alias("start"), d["end"].alias("end"))).alias("spans"),
    )
