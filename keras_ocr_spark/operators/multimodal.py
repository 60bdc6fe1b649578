"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference consumes images as ndarrays decoded by OpenCV
(``/root/reference/keras_ocr/tools.py:19-38`` read; ``:455-481``
read_and_fit). In a 100 TB lakehouse the payload is an opaque ``binary``
column plus typed metadata, and decode/feature-extraction runs inside
``mapInPandas`` so bytes never round-trip through the driver.

The image/audio codecs are NOT in this container, so the decode kernel is
STUBBED: ``decode_stub=True`` (default) derives deterministic fake
features from the bytes (sha-seeded), while the real kernel raises
``NotImplementedError`` with the dependency named. Everything Spark-side
— schema, Arrow batch shape, partitioning, UDF signatures — is real and
tested; swapping the stub for cv2/PIL/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feat array<double>"

FRAME_SCHEMA = "media_id string, frame_idx int, frame_sha string"


import functools


@functools.lru_cache(maxsize=1)
def _media_capabilities() -> dict:
    """Probe which decode backends exist in THIS runtime (r3 verdict
    Next #10): the kernels below light up the day the image gains
    codecs, with zero code change. Cached — the probe is called per
    decoded row inside mapInPandas, and a MISSING backend cannot be
    cached in sys.modules, so an uncached miss would re-scan sys.path
    per row."""
    import importlib.util

    return {
        "image": importlib.util.find_spec("PIL") is not None
        or importlib.util.find_spec("cv2") is not None,
        "audio": importlib.util.find_spec("librosa") is not None,
    }


def _real_decode(payload: bytes, kind: str, dim: int = 8) -> list:
    """Real decode kernel, capability-gated. Image path: decode via
    PIL (preferred) or cv2, downscale to a dim-length gray intensity
    profile (row-mean buckets, [0,1]) — the same shape the stub emits,
    so the Spark plumbing (schema, Arrow batches, callers) is identical.
    Raises ``NotImplementedError`` naming the dependency when no backend
    is installed (the honest sandbox gate — reference decode is
    ``tools.read``, /root/reference/keras_ocr/tools.py:19-38)."""
    caps = _media_capabilities()
    if kind == "image" and caps["image"]:
        import io

        import numpy as np

        try:
            from PIL import Image

            arr = np.asarray(Image.open(io.BytesIO(payload)).convert("L"), dtype="float64")
        except ImportError:
            import cv2

            decoded = cv2.imdecode(np.frombuffer(payload, dtype="uint8"), cv2.IMREAD_GRAYSCALE)
            if decoded is None:
                # cv2 signals an undecodable payload with None rather than
                # raising; dereferencing it would fail the whole Spark task
                # on one dirty row.
                raise ValueError(
                    f"undecodable image payload ({len(payload)} bytes): cv2.imdecode returned None"
                )
            arr = decoded.astype("float64")
        rows = np.array_split(arr.mean(axis=1), dim)
        return [float(r.mean()) / 255.0 if r.size else 0.0 for r in rows]
    if kind == "audio" and caps["audio"]:
        import io

        import librosa
        import numpy as np

        y, _sr = librosa.load(io.BytesIO(payload), sr=None, mono=True)
        rows = np.array_split(np.abs(y), dim)
        return [float(r.mean()) if r.size else 0.0 for r in rows]
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires cv2/PIL (image) or librosa (audio) — "
        "not in this runtime image; the stub path exercises the identical Spark plumbing"
    )


def _stub_features(payload: bytes, dim: int = 8) -> list:
    """Deterministic fake embedding from the bytes (sha256-seeded) —
    exercises the full Arrow path with stable values."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65535.0 for i in range(dim)]


def extract_features(df: DataFrame, decode_stub: bool = True, dim: int = 8) -> DataFrame:
    """media table -> per-item feature vectors via mapInPandas.

    Batch shape: the UDF receives Arrow batches of (media_id, kind,
    payload); binary stays in Arrow buffers end to end (no driver
    collect). Real decoders slot into the same iterator.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _stub_features(p, dim) if decode_stub else _real_decode(p, k, dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feat": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The stub derives a deterministic per-frame hash from (payload sha,
    frame_idx); a real kernel would decode with pyav/cv2. Row expansion
    (1 video -> N frames) happens inside the UDF so the explode cost is
    Arrow-batched, mirroring the crop flattening of
    ``recognition.py:504-526``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_sha = [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if not decode_stub:
                    _real_decode(payload, "video")
                n_frames = max(int((dur or 0) / (1000 / 30)), 1)  # assume 30fps
                base = hashlib.sha256(payload or b"").hexdigest()
                for i in range(0, n_frames, every_n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_sha.append(hashlib.sha256(f"{base}:{i}".encode()).hexdigest()[:16])
            yield pd.DataFrame({"media_id": out_ids, "frame_idx": out_idx, "frame_sha": out_sha})

    return df.filter(F.col("kind") == "video").mapInPandas(op, schema=FRAME_SCHEMA)


PDF_TEXT_SCHEMA = "id long, pdf_text string, n_bytes long"

#: PDF content-stream text-show grammar (multi-block): a payload holds
#: ANY number of ``BT ... ET`` text objects; inside each, any number of
#: show operators — ``(string) Tj`` and ``[(s1) -120 (s2) ...] TJ``
#: (TJ array numbers are kerning, ignored; strings concatenate).
#: Strings use PDF escaping: ``\(`` ``\)`` ``\\``.
#: Block content treats parenthesized strings ATOMICALLY (the
#: alternation consumes a whole ``(...)`` with escapes before the
#: non-greedy terminator test), so an ``ET`` inside shown text — "the
#: ETF fund" — can never terminate the block early.
_PDF_BT = re.compile(rb"BT ((?:\((?:[^()\\]|\\.)*\)|[^()])*?) ?ET", re.DOTALL)
_PDF_STR = re.compile(rb"\(((?:[^()\\]|\\.)*)\)", re.DOTALL)
_PDF_SHOW = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\) *Tj|\[((?:\((?:[^()\\]|\\.)*\)|[^\]\\()]|\\.)*)\] *TJ",
    re.DOTALL,
)

_CHUNK_WORDS = 4  # synth: one show block per 4 original words


def _pdf_escape_expr(col):
    """PDF string escaping as a JVM expression chain: backslash first,
    then parens (same order as the DuckDB oracle's replace chain)."""
    e = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    e = F.replace(e, F.lit("("), F.lit("\\("))
    return F.replace(e, F.lit(")"), F.lit("\\)"))


def _pdf_unescape(b: bytes) -> str:
    return (
        b.replace(b"\\(", b"(").replace(b"\\)", b")").replace(b"\\\\", b"\\").decode("utf-8")
    )


def synth_pdf_payloads(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic MULTI-BLOCK PDF-like binary payloads from a text
    column: the text splits into 4-word chunks, each emitted as its own
    ``BT .. ET`` object — even chunks as ``(s) Tj``, odd chunks as
    ``[(s) -120] TJ`` (so both show forms appear in every multi-chunk
    payload), PDF-escaped. Stands in for real PDFs (no pdf libs in this
    runtime) while keeping the binary column + Arrow plumbing fully
    real; the parser must reassemble the original text exactly.
    Pure-expression synthesis (no Python), mirrored verbatim by the
    DuckDB oracle."""
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(_CHUNK_WORDS)).cast("int")
    chunk = lambda i: _pdf_escape_expr(  # noqa: E731
        F.array_join(F.slice(words, i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " ")
    )
    block = lambda i: F.when(  # noqa: E731
        i % 2 == 0, F.concat(F.lit("BT ("), chunk(i), F.lit(") Tj ET"))
    ).otherwise(F.concat(F.lit("BT [("), chunk(i), F.lit(") -120] TJ ET")))
    blocks = F.transform(F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1), block)
    stream = F.concat(F.lit("%PDF-1.4 "), F.array_join(blocks, " "), F.lit(" EOF"))
    return df.select(F.col(id_col).cast("long").alias("id"), F.encode(stream, "utf-8").alias("payload"))


def parse_pdf_text(raw: bytes) -> str | None:
    """All text shown by a content stream, in stream order: TJ-array
    strings concatenate (numbers are kerning), blocks join with a
    single space. None when no text object parses."""
    blocks = []
    for m in _PDF_BT.finditer(raw):
        parts = []
        for sm in _PDF_SHOW.finditer(m.group(1)):
            if sm.group(1) is not None:  # (s) Tj
                parts.append(_pdf_unescape(sm.group(1)))
            else:  # [(s1) n (s2) ...] TJ
                parts.extend(_pdf_unescape(x) for x in _PDF_STR.findall(sm.group(2)))
        blocks.append("".join(parts))
    return " ".join(blocks) if blocks else None


def pdf_extract_text(df: DataFrame) -> DataFrame:
    """Binary PDF-ish payloads -> text via mapInPandas (the byte-stream
    tokenization path: bytes stay in Arrow buffers, the pure-Python
    parser runs batch-at-a-time on executors — the ``tools.read``
    polymorphic-source analog for document payloads,
    /root/reference/keras_ocr/tools.py:19-38). A real PDF parser slots
    into the same iterator; the grammar here is the text-show subset
    with multi-block streams and both Tj/TJ forms."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, sizes = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                texts.append(parse_pdf_text(raw))
                sizes.append(len(raw))
            yield pd.DataFrame({"id": pdf["id"], "pdf_text": texts, "n_bytes": sizes})

    return df.select("id", "payload").mapInPandas(op, schema=PDF_TEXT_SCHEMA)


def extract_from_pdfs(df: DataFrame, cfg=None) -> DataFrame:
    """Full byte-stream flagship composition: binary PDF-ish payloads ->
    text (mapInPandas parse) -> the SAME two-stage propose/decode/
    reassemble pipeline the HTML transcripts use. One extra Python
    boundary (the parser) ahead of the standard map-only plan; documents
    become single-turn conversations keyed by payload id."""
    from ..config import DEFAULT_CONFIG
    from ..plans.pipeline import extract

    texts = pdf_extract_text(df).select(
        F.concat(F.lit("pdf-"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.coalesce(F.col("pdf_text"), F.lit("")).alias("text"),
    )
    return extract(texts, cfg=cfg or DEFAULT_CONFIG)


def synth_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads from md5 bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.md5(f"{seed}:{i}".encode()).digest() * rng.randint(1, 8)
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(payload),
                rng.randint(16, 512) if kind == "image" else None,
                rng.randint(16, 512) if kind == "image" else None,
                rng.randint(500, 5000) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
