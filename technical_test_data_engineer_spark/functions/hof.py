"""Higher-order-function helpers.

The one that matters: ``bind``. Catalyst evaluates a lambda *body*
per array element — so an expensive expression referenced inside the
body of ``F.transform``/``F.filter`` (rather than passed as the HOF's
*argument*) is recomputed for every element. A winnowing pipeline that
references its shingle-hash array from inside the window-minima lambda
is O(n²) per row; measured 33.5s → 2.3s on 500 docs after binding
(14×). The same applies to referencing ``F.split(text)`` from a gram
lambda: the full split reruns per gram.

``bind(expr, f)`` forces single evaluation per row by making ``expr``
the HOF argument: wrap it in a 1-element array, ``transform`` with
``f`` (whose lambda variable is a cheap slot reference), take element
1. Constant overhead, works for any type, stays a pure Column
expression (no intermediate ``withColumn`` needed, immune to
CollapseProject re-inlining).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, f: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once per row and feed the result to ``f`` as a
    lambda variable — let-binding for Catalyst expression trees."""
    return F.element_at(F.transform(F.array(expr), f), 1)
