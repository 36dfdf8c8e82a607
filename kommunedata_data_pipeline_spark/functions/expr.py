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

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once and bind it into ``body`` (an expression-level
    let-binding). Usable anywhere a Column goes, including inside other
    lambdas; nests freely."""
    return F.element_at(F.transform(F.array(value), body), 1)
