"""Portable, engine-agnostic hashing primitives for dedup/fingerprinting.

Everything here is built on ``md5`` hex strings because md5 is bit-exact
and available in BOTH Spark (``F.md5``) and DuckDB (``md5()``), so every
dedup operator gets an exact cross-engine oracle. Lexicographic ``min``
over lowercase-hex strings is a total order identical in both engines
(ASCII), which makes MinHash signatures exactly reproducible — unlike
``xxhash64``/``hash`` whose implementations differ per engine.

Scale note: all signature computation is per-row array algebra
(``transform``/``aggregate`` higher-order functions) — zero shuffles
until the final candidate-pair join, and that join is an equi-join on the
LSH band key (hash-partitionable, AQE-skew-splittable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def words_expr(text: Column) -> Column:
    """Whitespace word split (documents are single-spaced)."""
    return F.split(text, " ")


def shingles_expr(words: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a words array (per-row, no shuffle).

    Guarded for short docs: Spark's ``sequence(1, 0)`` DESCENDS ([1, 0])
    rather than returning empty, so size < k must short-circuit.
    """
    idx = F.sequence(F.lit(1), F.size(words) - F.lit(k - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    empty = F.array().cast("array<string>")
    return F.when(F.size(words) >= k, F.array_distinct(grams)).otherwise(empty)


def minhash_expr(shingles: Column, seed: int) -> Column:
    """One MinHash component: min over shingles of md5(seed ':' shingle).

    Returns NULL for shingle-less docs (caller filters).
    """
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))))


def simhash_bit_expr(words: Column, bit: int) -> Column:
    """Signed vote for one SimHash bit: sum over word occurrences of
    +1/-1 depending on bit ``bit`` of the word's 16-bit md5-derived value.

    The 16-bit value is built from the first 4 hex nibbles of md5(word)
    via ``instr`` lookups — portable to DuckDB (``strpos``) nibble for
    nibble, so the resulting simhash is cross-engine exact.
    """
    p = 1 << bit

    def nib(h: Column, i: int) -> Column:
        return F.instr(F.lit(HEX), F.substring(h, i, 1)) - F.lit(1)

    def vote(w: Column) -> Column:
        h = F.md5(w)
        v = nib(h, 1) * 4096 + nib(h, 2) * 256 + nib(h, 3) * 16 + nib(h, 4)
        return F.when(v % F.lit(2 * p) >= F.lit(p), F.lit(1)).otherwise(F.lit(-1))

    return F.aggregate(words, F.lit(0), lambda acc, w: acc + vote(w))


def simhash_expr(words: Column, n_bits: int = 16) -> Column:
    """16-bit SimHash of a word array (per-row, no shuffle)."""
    out = F.lit(0)
    for bit in range(n_bits):
        out = out + F.when(simhash_bit_expr(words, bit) > 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return out


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two float arrays via zip_with + aggregate (JVM-side)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def quantized_dot_expr(a: Column, b: Column, scale: int = 1000) -> Column:
    """INTEGER dot product of quantized embeddings — exact across engines
    (float sums are order-dependent; int sums are not)."""

    def q(x: Column) -> Column:
        return F.round(x * F.lit(scale)).cast("long")

    return F.aggregate(F.zip_with(a, b, lambda x, y: q(x) * q(y)), F.lit(0).cast("long"), lambda acc, v: acc + v)
