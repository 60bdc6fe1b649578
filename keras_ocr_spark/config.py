"""Extraction configuration.

The four thresholds mirror the reference detector's knobs
(``/root/reference/keras_ocr/detection.py:745-752``:
``detection_threshold=0.7, text_threshold=0.4, link_threshold=0.4,
size_threshold=10``), recast from pixel score maps to DOM-node scores:

- ``text_threshold``  — minimum node content-score for a node to *seed* a
  content region (analog of the text map threshold).
- ``link_threshold``  — maximum link-density for a node to seed a region;
  nodes above it can still *connect* two qualifying runs (analog of the
  link map gluing characters into words).
- ``detection_threshold`` — a proposed region is kept only if its best
  node score reaches this (analog of
  ``np.max(textmap[labels==k]) < detection_threshold`` culling,
  ``detection.py:238-241``).
- ``size_threshold``  — minimum total visible characters in a region
  (analog of the connected-component area filter,
  ``detection.py:233-236``).
- ``dilate``          — characters of margin added to each side of a kept
  span, clipped to the document bounds (analog of the component dilation
  ``detection.py:257-270``). Default 0 so span offsets are exact node
  bounds.
- ``max_connector_run`` — a link-heavy node may glue two qualifying runs
  (the link-map analog), but a chain of more than this many consecutive
  link nodes is a link farm and BREAKS the component.
- ``max_len``         — input-size cap: turns longer than this are
  truncated before scoring (analog of ``max_size=2048`` in
  ``pipeline.py:18,45-47`` — bounds worst-case per-record cost and is the
  first line of defense against skew).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractionConfig:
    detection_threshold: float = 0.7
    text_threshold: float = 0.4
    link_threshold: float = 0.4
    size_threshold: int = 10
    max_connector_run: int = 1
    dilate: int = 0
    max_len: int = 65536


DEFAULT_CONFIG = ExtractionConfig()
