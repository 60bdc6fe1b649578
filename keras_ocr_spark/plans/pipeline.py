"""End-to-end extraction plan — the graft's ``Pipeline.recognize``.

Orchestrates the three stages exactly as the reference does
(``/root/reference/keras_ocr/pipeline.py:28-75``: normalize -> batch ->
detect -> crop -> recognize -> rescale -> re-associate), declared as one
lazy DataFrame plan so Catalyst fuses/prunes across stages:

    read -> [salted repartition on conv_id] -> stage-1 pandas UDF (spans)
         -> posexplode_outer -> JVM substring+decode chain
         -> groupBy(conv_id, turn_idx) ordered reassembly

Physical shape (verified in tests/test_plan_shape.py):
- exactly ONE ArrowEvalPython node (stage 1); stage 2 + reassembly prep
  stay inside WholeStageCodegen;
- exactly ONE required shuffle (the final per-turn aggregation), plus the
  optional explicit salt repartition;
- the scan reads only the columns the plan needs (conv_id, turn_idx,
  text) — column pruning reaches the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import DEFAULT_CONFIG, ExtractionConfig
from ..operators.decode import decode
from ..operators.detect import detect
from ..operators.reassemble import reassemble


def extract(
    df: DataFrame,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    n_salt: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Transcripts -> (conv_id, turn_idx, clean_text, spans).

    Per-turn output equals ``core.oracle.extract_turn`` exactly (parity
    suite: tests/test_parity.py). ``n_salt``>0 adds the explicit salted
    repartition on (conv_id, salt) before stage 1 (north-rule skew
    handling; AQE covers the rest at runtime).
    """
    slim = df.select("conv_id", "turn_idx", "text")
    return reassemble(decode(detect(slim, cfg=cfg, n_salt=n_salt, num_partitions=num_partitions)))
