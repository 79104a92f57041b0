"""Expression-level utilities.

``once_per_row`` is the engine's let-binding primitive: Spark has no
user-facing ``WITH`` expression, and two optimizer behaviors can
re-evaluate an expensive expression once PER REFERENCE instead of once
per row:

* ``CollapseProject``/predicate pushdown substitute an aliased
  expression into every downstream reference, and non-codegen
  expressions (``from_xml``, ``from_json``/variant paths, Python-free
  but interpreted HOF trees) get no whole-stage-codegen subexpression
  elimination to undo the duplication — measured 10x on the CAP
  ``from_xml`` parse (sources/xml.py) and ~25% of the feature build on
  the polygon parse (operators/features.py).
* Schema-pruning rewrites (``OptimizeCsvJsonExprs`` family) split one
  parse into several narrower per-field parses, which helps when each
  field is referenced once but multiplies structural work when many
  fields are consumed.

``explode(array(e))`` plants a ``Generate`` node — a projection barrier
the optimizer does not collapse through — so ``e`` is evaluated exactly
once per row and downstream references read the generated attribute.
A NULL value of ``e`` still yields its row (``array(null)`` explodes to
one null element), so null-propagating drop semantics are preserved.
Cost: one extra attribute in the row; no shuffle, no materialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def once_per_row(expr: Column) -> Column:
    """Pin ``expr`` to one evaluation per row across any number of
    downstream references. Use inside ``df.select("*", once_per_row(e)
    .alias("x"))``; every later reference to ``x`` reuses the value."""
    return F.explode(F.array(expr))
