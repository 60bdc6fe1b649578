"""Stage-1 node scoring: text-density / link-density / tag-path heuristics.

Graft analog of the CRAFT forward pass (``/root/reference/keras_ocr/
detection.py:779`` producing per-pixel text/link score maps): here each
DOM text node gets a content score in [0, 1] from three deterministic
signals, so the downstream thresholding/grouping
(``core.proposal.propose_spans``) can mirror ``getBoxes``
(``detection.py:207-287``) exactly.

Scores are floats, but every comparison downstream is a plain ``>=``
against a constant threshold and the same pure function runs inside the
Spark pandas UDF and the local oracle, so cross-engine equality is by
construction (same code, same arithmetic).
"""

from __future__ import annotations

from typing import List, Sequence

from .tokenizer import Node

#: Density soft-knee: a node reaches score 0.5 (before penalties) at this
#: many visible characters. Analog of the gaussian heatmap spread
#: (``detection.py:55-62``) — longer text, stronger evidence, saturating.
DENSITY_KNEE = 15

#: How strongly link-dominated text is discounted (link farms score low).
LINK_PENALTY = 0.8


def score_node(node: Node) -> float:
    """Content score in [0, 1] for one node."""
    if node.boiler:
        return 0.0
    density = node.tlen / (node.tlen + DENSITY_KNEE)
    link_ratio = node.link_len / node.tlen if node.tlen else 0.0
    return density * (1.0 - LINK_PENALTY * link_ratio)


def link_ratio(node: Node) -> float:
    return node.link_len / node.tlen if node.tlen else 0.0


def score_and_ratio(node: Node) -> tuple:
    """(score, link_ratio) in one pass — the hot loop computes both per
    node; sharing the division keeps this the single source of the
    scoring arithmetic (identical to score_node/link_ratio)."""
    tlen = node.tlen
    ratio = node.link_len / tlen if tlen else 0.0
    if node.boiler:
        return 0.0, ratio
    return (tlen / (tlen + DENSITY_KNEE)) * (1.0 - LINK_PENALTY * ratio), ratio


def score_nodes(nodes: Sequence[Node]) -> List[float]:
    return [score_node(n) for n in nodes]
