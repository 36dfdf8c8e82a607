"""Expression combinators shared across the function/operator library.

``let`` is the load-bearing one: Catalyst has no common-subexpression
elimination inside higher-order-function lambdas, so an outer column
referenced in a ``transform``/``aggregate`` lambda body is RE-EVALUATED
once per array element (and once per use inside the body). For a
shingling expression that means the whole normalize+split subtree runs
O(slots x shingles x k) times per row instead of once — measured 60x
slowdowns on the MinHash path. Binding the value as a lambda variable of
a single-element-array ``transform`` forces exactly-once evaluation
(Catalyst materializes the array, then the lambda variable is a plain
bound reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once and bind it into ``body`` (an expression-level
    let-binding). Usable anywhere a Column goes, including inside other
    lambdas; nests freely."""
    return F.element_at(F.transform(F.array(value), body), 1)


def pin_columns(
    df: DataFrame,
    exprs: dict[str, Column],
    keep: list[str] | None = None,
) -> DataFrame:
    """Evaluate ``exprs`` exactly once, exactly HERE, by emitting them as
    GENERATOR output — ``explode(array(struct(...)))`` yields one row
    per row (null expressions behave exactly like a projection), but
    Catalyst cannot push a predicate on a generated column below its
    Generate, cannot inline the expression into an inferred
    ``isnotnull`` join filter, and cannot duplicate it into a pushed
    filter + a re-projection.

    This is the DataFrame-level twin of ``let`` and the general form of
    the r8 generator-pushdown fix (`explode_outer` + post-filter): any
    expensive derived column that downstream code filters or joins on
    should be pinned, or the optimizer pushes the WHOLE inlined
    expression below the spread exchange into the narrow (often
    single-task) scan stage and evaluates it a second time above
    (measured: q_cdc_dedup 7.1 s -> sub-second at sf0.1 after pinning,
    OPTIMIZATION_r12.md). Filters and pruning on pass-through columns
    still push to the scan — only the pinned columns are barriered.

    ``keep``: pass-through columns (default: all of ``df``'s)."""
    keep = list(df.columns) if keep is None else keep
    # Name-collision guards (ADVICE r12): a '__pinned' pass-through or a
    # pinned name shadowing a kept column would produce duplicate /
    # ambiguous output columns with a confusing downstream error.
    assert "__pinned" not in keep, "pin_columns: '__pinned' collides with keep"
    overlap = set(exprs) & set(keep)
    assert not overlap, f"pin_columns: exprs shadow kept columns {sorted(overlap)}"
    packed = F.explode(
        F.array(F.struct(*[e.alias(n) for n, e in exprs.items()]))
    )
    tmp = df.select(*keep, packed.alias("__pinned"))
    return tmp.select(
        *keep, *[F.col("__pinned")[n].alias(n) for n in exprs]
    )
