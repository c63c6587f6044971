"""Text expression builders — tokenize, shingle, portable hashes.

Everything here is a Catalyst expression (split/filter/transform/md5),
so it runs inside whole-stage codegen with no Python boundary; the
same computations are expressible verbatim in DuckDB SQL, which is
what makes the text/dedup operators oracle-checkable.

Portable 32-bit hash: both engines agree on md5 hex; we take the first
8 hex chars as an unsigned 32-bit integer. Spark: conv(hex,16,10);
DuckDB: ('0x'||hex)::BIGINT. Verified identical (tests/test_text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties dropped (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != F.lit(""))


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles(toks: Column, n: int) -> Column:
    """n-token shingles joined by a single space (array<string>).

    Guarded: Spark's sequence(0, size-n) would produce a *descending*
    sequence when size < n, so short docs explicitly yield [].
    """
    size = F.size(toks)
    idx = F.sequence(F.lit(0), size - n)
    make = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(size >= n, make).otherwise(F.array().cast("array<string>"))


def hash32(c: Column, seed: Column | int | None = None) -> Column:
    """Portable unsigned-32-bit hash of a string (via md5 prefix).

    With a seed, hashes `seed:value` — this is how the MinHash family
    of K independent hash functions is derived (same construction on
    the DuckDB side).
    """
    if seed is not None:
        s = F.lit(seed) if isinstance(seed, int) else seed
        c = F.concat_ws(":", s.cast("string"), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash60(c: Column) -> Column:
    """Portable 60-bit hash (15 md5 hex chars) — collision-safe doc
    fingerprints; still exactly representable on both engines."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
