"""Plan hygiene for iterative loops — the exponential-stats pitfall.

``DataFrame.localCheckpoint`` truncates the LOGICAL PLAN but inherits
the checkpointed plan's Catalyst statistics (sizeInBytes). Join size
estimates MULTIPLY (size(A join B) = size(A) x size(B)), so a superstep
whose plan references the state vector m times produces a checkpointed
state whose sizeInBytes has ~m x the DIGITS of the previous one —
exponential BigInteger growth. By superstep ~7-10 the planner spends
whole seconds (then minutes) in BigInteger.multiply on 33-row inputs.
Measured here: stats bit-length 32 -> 125 -> 495 -> 1977 -> 7904 over
five supersteps of a double self-join loop, and a 48 s "planning" stall
at iteration 6 (see BENCH.md round-2 notes).

Fix: every few supersteps, rebuild the checkpointed DataFrame as a
fresh leaf over the SAME materialized internal RDD — identical rows,
default leaf statistics, O(1) driver cost. The rebuilt leaf loses the
outputPartitioning metadata (one extra vector-sized exchange on the
following superstep), so this is applied on a cadence, not every step —
amortized cost ~zero, and the stats stay bounded (~16k bits max at
cadence 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reset_plan_stats(df: DataFrame) -> DataFrame:
    """Rebuild ``df`` (which should already be materialized, e.g. via
    localCheckpoint) as a fresh logical leaf over its internal RDD,
    dropping inherited Catalyst statistics. Falls back to the input
    unchanged if the internal API is unavailable."""
    try:
        jdf = df._jdf
        rdd = jdf.queryExecution().toRdd()
        new = df.sparkSession._jsparkSession.internalCreateDataFrame(
            rdd, jdf.schema(), False)
        return DataFrame(new, df.sparkSession)
    except Exception:  # pragma: no cover - private-API guard
        return df


def superstep_checkpoint(df: DataFrame, iteration: int,
                         stats_reset_every: int = 4) -> DataFrame:
    """localCheckpoint (eager) + cadenced stats reset — the standard
    per-superstep materialization for every iterative loop here."""
    out = df.localCheckpoint(eager=True)
    if stats_reset_every and (iteration + 1) % stats_reset_every == 0:
        out = reset_plan_stats(out)
    return out
