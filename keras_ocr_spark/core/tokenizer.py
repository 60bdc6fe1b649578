"""HTML tokenizer: raw markup -> ordered DOM-ish text nodes.

Graft analog of the reference's image ingestion + CRAFT feature grid: the
raw payload (``text`` column) is cut into an ordered sequence of *text
nodes*, each carrying the evidence stage 1 scores on — visible length,
link length, tag path (cf. ``/root/reference/keras_ocr/detection.py``
score maps, which carry per-pixel text/link evidence).

Deliberately dependency-free (stdlib ``re`` only — no lxml/bs4 in the
runtime image) and allocation-light: a single regex pass over the raw
string, a tag stack for paths. Offsets are Python code-point offsets into
the ORIGINAL raw string; generated fixtures stay in the BMP so Spark's
``substring`` (UTF-16 code units) and Python slicing agree exactly.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

TAG_RE = re.compile(r"<[^>]*>")
TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
WS_RE = re.compile(r"[ \t\r\n]+")

#: Tags whose subtree is never content (cf. readability/boilerpipe
#: blacklists; analog of zero regions in the CRAFT text map).
BOILERPLATE_TAGS = frozenset(
    {
        "script",
        "style",
        "nav",
        "footer",
        "header",
        "aside",
        "form",
        "button",
        "noscript",
        "svg",
        "iframe",
        "select",
        "option",
    }
)

#: Void elements: never pushed on the stack.
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "source", "wbr", "area", "base", "col", "embed", "track", "param"}
)


class Node(NamedTuple):
    """One text node.

    ``start``/``end`` are offsets of the raw segment in the original
    string (the 1-D recast of a detection box, cf.
    ``detection.py:273-285``). ``tlen`` is the whitespace-collapsed
    visible length; ``link_len`` the part of it inside an ``<a>``.
    """

    idx: int
    tag_path: str
    start: int
    end: int
    tlen: int
    link_len: int
    boiler: bool


def _visible_len(segment: str) -> int:
    return len(WS_RE.sub(" ", segment).strip())


def tokenize(raw: str) -> List[Node]:
    """Split raw markup into ordered text nodes.

    Plain text (no tags) yields a single node with empty ``tag_path``.
    Whitespace-only segments are dropped (they carry no evidence, like
    zero-score pixels).
    """
    nodes: List[Node] = []
    stack: List[str] = []
    pos = 0
    idx = 0

    def emit(seg_start: int, seg_end: int) -> None:
        nonlocal idx
        segment = raw[seg_start:seg_end]
        tlen = _visible_len(segment)
        if tlen == 0:
            return
        in_link = "a" in stack
        boiler = any(t in BOILERPLATE_TAGS for t in stack)
        nodes.append(
            Node(
                idx=idx,
                tag_path=">".join(stack),
                start=seg_start,
                end=seg_end,
                tlen=tlen,
                link_len=tlen if in_link else 0,
                boiler=boiler,
            )
        )
        idx += 1

    for m in TAG_RE.finditer(raw):
        if m.start() > pos:
            emit(pos, m.start())
        tag = m.group(0)
        name_m = TAG_NAME_RE.match(tag)
        if name_m:
            name = name_m.group(1).lower()
            if tag.startswith("</"):
                # Pop to the matching open tag (tolerate mis-nesting).
                if name in stack:
                    while stack and stack[-1] != name:
                        stack.pop()
                    if stack:
                        stack.pop()
            elif tag.endswith("/>") or name in VOID_TAGS:
                pass
            elif not tag.startswith("<!"):
                stack.append(name)
        pos = m.end()
    if pos < len(raw):
        emit(pos, len(raw))
    return nodes
