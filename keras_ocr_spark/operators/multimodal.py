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


def _real_decode(payload: bytes, kind: str):
    raise NotImplementedError(
        "media decode requires cv2/PIL (image) or librosa (audio) — not in this runtime image; "
        "install and replace _stub_features with the real kernel"
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
                _stub_features(p, dim) if decode_stub else _real_decode(p, k)
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

#: Minimal PDF content-stream text-show grammar we parse: one
#: ``BT (…) Tj ET`` block per payload. Greedy ``(.*)`` ends at the LAST
#: ``) Tj ET`` so unescaped parens inside the text are safe.
_PDF_TJ = re.compile(rb"BT \((.*)\) Tj ET", re.DOTALL)


def synth_pdf_payloads(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic PDF-like binary payloads from a text column: a
    minimal content stream ``%PDF-1.4 BT (text) Tj ET`` utf-8 encoded.
    Stands in for real PDFs (no pdf libs in this runtime) while keeping
    the binary column + Arrow plumbing fully real."""
    stream = F.concat(F.lit("%PDF-1.4 BT ("), F.col(text_col), F.lit(") Tj ET"))
    return df.select(F.col(id_col).cast("long").alias("id"), F.encode(stream, "utf-8").alias("payload"))


def pdf_extract_text(df: DataFrame) -> DataFrame:
    """Binary PDF-ish payloads -> text via mapInPandas (the byte-stream
    tokenization path: bytes stay in Arrow buffers, the pure-Python
    parser runs batch-at-a-time on executors — the ``tools.read``
    polymorphic-source analog for document payloads,
    /root/reference/keras_ocr/tools.py:19-38). A real PDF parser slots
    into the same iterator; the grammar here is the text-show subset."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, sizes = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                m = _PDF_TJ.search(raw)
                texts.append(m.group(1).decode("utf-8") if m else None)
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
