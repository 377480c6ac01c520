"""Reusable column expressions — pure, JVM-side, codegen-friendly.

Everything here returns a Column built from pyspark.sql.functions
primitives: no Python UDFs in the hot path. These run inside
whole-stage codegen and keep the 100 TB plans entirely on the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization contract shared by every text operator AND the DuckDB
# oracle SQL: lowercase, split on single spaces (the documents corpus is
# single-space separated). Changing this breaks oracle parity — change
# both sides together.


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles(tok: Column, n: int = 3) -> Column:
    """Token-level n-gram shingles of a token array, as array<string>.

    Pure SQL via slice + arrays_zip: the token array is referenced only
    n times total (not n × num_shingles), so physical-plan
    subexpression elimination evaluates the upstream tokenization once
    per row. (An earlier element_at-in-lambda formulation re-evaluated
    split() per shingle element — ~15× slower; no CSE inside
    higher-order-function lambdas.) Docs shorter than n tokens yield an
    empty array.
    """
    m = F.size(tok) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(tok, j + 1, m) for j in range(n)])
    made = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tok) < n, empty).otherwise(made)


def shingle_hashes(tok: Column, n: int = 3) -> Column:
    """Distinct xxhash64 of each token n-gram, as array<bigint>.

    Hashes the n token columns directly (xxhash64 is variadic) instead
    of materializing concatenated shingle strings — equality of hashed
    n-grams matches equality of the string shingles (tokens contain no
    separator character; collisions are 2^-64-negligible), and the
    string allocation per shingle disappears. Near-dup operators join
    and intersect on these longs; the strings never exist.
    """
    m = F.size(tok) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(tok, j + 1, m) for j in range(n)])
    hashed = F.transform(zipped, lambda s: F.xxhash64(*[s[str(j)] for j in range(n)]))
    empty = F.array().cast("array<bigint>")
    return F.when(F.size(tok) < n, empty).otherwise(F.array_distinct(hashed))


def positional_shingle_hashes(tok: Column, n: int = 3) -> Column:
    """xxhash64 of each token n-gram IN POSITION ORDER, as array<bigint>.

    Like shingle_hashes but without the distinct: element i is the hash
    of tokens[i..i+n-1], so posexplode recovers (position, hash) pairs —
    the input to substring-level span detection (duplicated_spans).
    """
    m = F.size(tok) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(tok, j + 1, m) for j in range(n)])
    hashed = F.transform(zipped, lambda s: F.xxhash64(*[s[str(j)] for j in range(n)]))
    empty = F.array().cast("array<bigint>")
    return F.when(F.size(tok) < n, empty).otherwise(hashed)


def fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum over an array<double> (deterministic
    order — matches DuckDB list evaluation for oracle parity)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns.

    Pure SQL: zip_with for the elementwise product, aggregate for the
    fold. Stays in the JVM; no Python involved.
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = fold_sum(F.zip_with(ad, bd, lambda x, y: x * y))
    na = F.sqrt(fold_sum(F.transform(ad, lambda x: x * x)))
    nb = F.sqrt(fold_sum(F.transform(bd, lambda x: x * x)))
    return dot / (na * nb)


def count_in_set(arr: Column, values: list[str]) -> Column:
    """Count array elements (with repeats) contained in a literal set."""
    lit_arr = F.array(*[F.lit(v) for v in values])
    return F.size(F.filter(arr, lambda x: F.array_contains(lit_arr, x)))
