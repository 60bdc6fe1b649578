"""Single-process reference oracle: the whole detect-then-extract flow on
one turn, row-by-row, no Spark.

Graft analog of ``Pipeline.recognize`` (``/root/reference/keras_ocr/
pipeline.py:28-75``) run sequentially; the Spark pipeline
(``keras_ocr_spark.plans.pipeline``) must be frame-equal to this, per
turn, exactly — the cross-implementation parity contract modeled on
``tests/test_pytorch_keras.py:21-49`` (there 1e-4 float tolerance; here
exact string equality because every transform is integer/string).
"""

from __future__ import annotations

from typing import List, NamedTuple

from ..config import DEFAULT_CONFIG, ExtractionConfig
from .decoder import decode_span, reassemble
from .proposal import Span, propose_spans
from .tokenizer import tokenize


class TurnExtraction(NamedTuple):
    clean_text: str
    spans: List[Span]


def extract_turn(raw: str, cfg: ExtractionConfig = DEFAULT_CONFIG) -> TurnExtraction:
    """Full per-turn extraction: truncate-cap -> tokenize -> score ->
    propose -> decode -> reassemble.

    The ``max_len`` cap mirrors ``max_size`` bounding in
    ``pipeline.py:45-47`` — worst-case per-record cost is bounded before
    any expensive work.
    """
    if raw is None:
        raw = ""
    capped = raw[: cfg.max_len]
    nodes = tokenize(capped)
    spans = propose_spans(nodes, len(capped), cfg)
    # Drop spans that decode to empty (blank-label drop,
    # recognition.py:483-488) so `spans` matches emitted text pieces 1:1.
    kept = [s for s in spans if decode_span(capped, s)]
    return TurnExtraction(clean_text=reassemble(capped, kept), spans=kept)
