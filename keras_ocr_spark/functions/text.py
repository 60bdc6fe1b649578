"""JVM-side text decode expressions — the stage-2 fast path.

Re-expresses ``keras_ocr_spark.core.decoder.decode_text`` as built-in
Catalyst expressions (whole-stage-codegen'd, no Python worker):

    strip tags        regexp_replace(s, '<[^>]*>', '')
    decode entities   replace(...) chain in ENTITIES order (&amp; LAST)
    collapse ws       regexp_replace(s, '[ \\t\\r\\n]+', ' ')
    trim              trim(s)   (only spaces remain after the collapse)

The parity suite (``tests/test_parity.py``) asserts this chain equals the
pure-Python decoder on fixtures + randomized inputs — the graft analog of
the Keras-vs-PyTorch agreement test
(``/root/reference/tests/test_pytorch_keras.py:21-49``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.decoder import ENTITIES

TAG_PATTERN = r"<[^>]*>"
WS_PATTERN = r"[ \t\r\n]+"


def decode_expr(col: Column) -> Column:
    """Markup fragment column -> clean text column (all JVM built-ins).

    Each rewrite is GUARDED by a cheap containment test: most spans have
    no tags/entities/collapsible whitespace, and skipping the rewrite
    avoids one string allocation per step per row (a large share of GC
    pressure at scale). The guards are semantic identities — a rewrite
    with zero matches returns an equal string — so parity with the
    Python decoder is unchanged (asserted on randomized fragments in
    tests/test_parity.py).
    """
    s = F.when(col.contains("<"), F.regexp_replace(col, TAG_PATTERN, "")).otherwise(col)
    decoded = s
    for entity, char in ENTITIES:
        decoded = F.replace(decoded, F.lit(entity), F.lit(char))
    s = F.when(s.contains("&"), decoded).otherwise(s)
    # Single spaces collapse to themselves: rewrite only if a tab/CR/LF
    # or a double space is present.
    s = F.when(s.rlike("[\t\r\n]|  "), F.regexp_replace(s, WS_PATTERN, " ")).otherwise(s)
    return F.trim(s)


def crop_expr(text: Column, start: Column, end: Column) -> Column:
    """Span crop = substring (the 1-D ``warpBox``, ``tools.py:61-117``).

    ``substring`` is 1-based; offsets are 0-based [start, end).
    Fixtures stay in the BMP so UTF-16 units == code points and this
    matches Python slicing exactly.
    """
    return F.substring(text, start + F.lit(1), end - start)
