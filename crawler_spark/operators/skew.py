"""Explicit skew handling for shuffled equi-joins.

The engine already salts HOT HOSTS inside the politeness partitioner
(operators/politeness.py:45-78); this module is the general-purpose
variant for fact⋈dim equi-joins whose key distribution is skewed but
whose dim side is too big (or too row-expensive per AQE's byte
heuristics) to broadcast: salt the fact side with a deterministic hash
of a high-cardinality column, replicate each dim row across every salt
value, and join on (keys..., salt).  The output is EXACTLY the plain
join's rows — the salt only splits each hot key's shuffle bucket into
``n_salts`` buckets so no single reducer owns a whole hot key.  (AQE's
skew-join splits oversized partitions reactively at runtime; explicit
salting is the declarative form that also works with AQE disabled and
for deliberate, known-skew keys.)

Reference analogue: the crawl fleet's per-host fan-out is the same
skew problem — one hot domain is one hot key — which the reference
spreads via replica caps (``/root/reference/stack.yml:138-139``) and
this engine via the politeness salt; ``salted_join`` is that idea as a
reusable relational operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_src: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: ``fact ⋈ dim ON on`` with each fact row
    salted by ``pmod(xxhash64(salt_src), n_salts)`` and each dim row
    replicated across all ``n_salts`` salt values.

    ``salt_src`` should be high-cardinality fact columns (a row id) so
    the hot key's rows spread ~uniformly.  Row-for-row equal to the
    unsalted join for ``inner`` and ``left`` (a fact row carries
    exactly one salt value, and every dim row exists under every salt,
    so match/no-match is unchanged); right/full would duplicate
    unmatched dim rows across salts and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    f = fact.withColumn(SALT_COL, salt.cast("int"))
    d = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)
