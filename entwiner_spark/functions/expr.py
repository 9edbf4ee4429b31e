"""Catalyst expression combinators shared across the function library.

``let_bound`` is the load-bearing one: a let-binding idiom for
higher-order-function chains.  Catalyst does NOT common-subexpression-
eliminate a computed array expression that is referenced inside a
per-element lambda — each element evaluation re-runs the entire
producing chain, turning an O(n) window/n-gram pass into O(n^2)
(measured r8: winnowing fingerprints 27.2 s -> 2.0 s and word
3-grams 3.4 s -> 0.6 s on the sf0.1 documents table, identical
results).  Wrapping the value in a single-element array and running
the consumer inside ``transform``'s lambda makes every reference bind
the evaluated lambda VARIABLE instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bound(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and feed it to ``body`` as a
    bound variable: ``let x = value in body(x)`` for Catalyst.

    ``value`` may be any expression (array, struct, scalar); ``body``
    receives the lambda variable and must return a Column.  Use this
    whenever an expensive computed expression would otherwise be
    referenced inside a higher-order-function lambda.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
