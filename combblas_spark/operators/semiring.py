"""Semirings as (multiply-expression, aggregate-function) pairs.

The reference plugs a user-defined semiring ``SR = {add, multiply, id()}``
into every multiplication and reduction
(include/CombBLAS/Semirings.h:213-232 PlusTimes, 236-255 MinPlus,
144-163 Select2nd, 166-210 SelectMax; Applications/CC.h:62-84
Select2ndMin). The Spark analogue: ``multiply`` is a Column expression
evaluated on the joined row, ``add`` is the aggregate applied in the
post-join groupBy. Both run JVM-side inside whole-stage codegen — no
Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

MultFn = Callable[[Column, Column], Column]
AggFn = Callable[[Column], Column]


@dataclass(frozen=True)
class Semiring:
    """A semiring for spmv/spgemm/reduce.

    mult(a_val, x_val) -> Column   applied per joined (edge, vector/matrix) row
    add(col) -> Column             aggregate merging products per output coord
    zero                           additive identity (null-fill for union ops)
    """

    name: str
    mult: MultFn
    add: AggFn
    zero: float | int | None = 0.0

    def __repr__(self) -> str:  # pragma: no cover
        return f"Semiring({self.name})"


# PlusTimes: classic arithmetic (Semirings.h:213-232) — PageRank, SpGEMM counts.
PLUS_TIMES = Semiring("plus_times", lambda a, b: a * b, F.sum, 0.0)

# MinPlus: tropical / shortest-path (Semirings.h:236-255).
MIN_PLUS = Semiring("min_plus", lambda a, b: a + b, F.min, None)

# MaxTimes (SelectMaxSRing flavor, Semirings.h:166-210).
MAX_TIMES = Semiring("max_times", lambda a, b: a * b, F.max, None)

# Select2nd + Min/Max combine: "take the incoming vector value" — BFS parent
# selection / FastSV min-parent (Semirings.h:144-163; Applications/CC.h:62-84).
SELECT2ND_MIN = Semiring("select2nd_min", lambda a, b: b, F.min, None)
SELECT2ND_MAX = Semiring("select2nd_max", lambda a, b: b, F.max, None)
