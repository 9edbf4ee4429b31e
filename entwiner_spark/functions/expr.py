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


def long_array_lit(values) -> Column:
    """Array<long> literal that crosses py4j as ONE node, not 16k.

    ``F.lit(list)`` expands client-side to ``array(*[lit(x) ...])`` —
    one py4j round trip per element — and every later analysis pass
    walks the 16k-node CreateArray again.  For sketch-sized arrays
    (bloom bitmap 16,384 words, CMS rows 2,048 cells) that makes plan
    construction + analysis the dominant query cost (measured r16:
    7.6 s construct + ~1 s per analysis, vs 0.05 s total here).

    ``from_json('[…]', 'array<bigint>')`` is a TWO-node tree; both its
    children are foldable so ConstantFolding evaluates it exactly once
    into the same ``Literal(ArrayData, ArrayType(LongType))`` the lit
    chain would have folded to — values bit-for-bit identical (JSON
    longs round-trip exactly, LONG_MIN/MAX verified).
    """
    values = [int(v) for v in values]
    if not values:
        return F.lit(values)
    import json as _json

    return F.from_json(F.lit(_json.dumps(values)), "array<bigint>")


def let_bound(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and feed it to ``body`` as a
    bound variable: ``let x = value in body(x)`` for Catalyst.

    ``value`` may be any expression (array, struct, scalar); ``body``
    receives the lambda variable and must return a Column.  Use this
    whenever an expensive computed expression would otherwise be
    referenced inside a higher-order-function lambda.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
