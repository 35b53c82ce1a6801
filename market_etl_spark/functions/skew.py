"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles joins, but a groupBy on a heavily
skewed key still funnels each hot key through one reducer. The classic
fix: scatter each key across ``salt_buckets`` partial groups, aggregate
partially, then merge the partials — two small shuffles instead of one
skewed one. Only decomposable aggregates (sum/count/min/max, and
ratios-of-sums assembled at the merge step) qualify.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (output_name, partial_expr_builder, merge_expr_builder) registry for
#: the decomposable aggregates the helper supports.
_MERGEABLE = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → (function, input column), e.g.
    ``{"volume": ("sum", "value"), "trades": ("count", "value")}``.
    Stage 1 groups by (keys..., salt) — hot keys split across
    ``salt_buckets`` reducers; stage 2 merges partials per key. The
    result is EXACTLY the unsalted groupBy (verified by oracle), only
    the shuffle shape changes.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial_exprs: list[Column] = []
    merge_exprs: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{fn!r} is not decomposable; supported: {sorted(_MERGEABLE)}")
        partial, merge = _MERGEABLE[fn]
        partial_exprs.append(partial(F.col(col)).alias(f"_p_{out}"))
        merge_exprs.append(merge(F.col(f"_p_{out}")).alias(out))
    partials = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partials.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join for when NEITHER side broadcasts.

    AQE's skew-join splitting only fires on sort-merge joins with
    materialized shuffle statistics; a hot key in a shuffled-hash join
    — or a key hot enough that one split is still one task's worth —
    funnels through a single reducer. The classic preventive fix:

    - the BIG side salts each row into one of ``salt_buckets`` lanes
      (row-position hash — independent of the data, no added skew);
    - the SMALL side replicates ``salt_buckets``× via an exploded salt
      range, so every (key, salt) pair it owned exists in every lane;
    - the join key becomes (key, salt): a hot key's rows now spread
      over ``salt_buckets`` reducers, at the price of shuffling the
      small side ``salt_buckets`` times — the trade is right when
      |small| · buckets ≪ hot-key row count.

    The result is EXACTLY the unsalted join (each big row meets each
    matching small row exactly once — in its own lane). Supported
    ``how``: inner / left (the replicated side must stay the preserved
    side's opposite so multiplicity is untouched).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int"),
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated, on=[key, "_salt"], how=how).drop("_salt")
