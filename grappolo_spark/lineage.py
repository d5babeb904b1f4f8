"""Lineage cutting for iterative supersteps.

``DataFrame.localCheckpoint`` truncates the *plan*, but the resulting
``LogicalRDD`` keeps the origin plan's ``Statistics``. Catalyst's
size-only estimator multiplies ``sizeInBytes`` across joins as unbounded
BigIntegers, so in a superstep loop the checkpointed stats compound:
state_N's estimate is a product of state_{N-1} estimates, the
BigInteger's bit length grows geometrically, and by ~iteration 14 the
optimizer spends minutes multiplying million-bit numbers (observed: 5x
slowdown per iteration, a cliff from 0.3s to 60s+ per superstep on a
64-vertex graph).

``cut_lineage`` therefore rewraps the checkpointed RDD in a fresh
``LogicalRDD`` with no origin statistics, resetting the estimate every
iteration. The rewrap reuses the already-materialized internal RDD — no
recompute, no extra job. Falls back to the plain checkpoint if the
internal ``internalCreateDataFrame`` API is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """localCheckpoint(eager) + drop inherited origin statistics."""
    ck = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    try:
        jdf = ck._jdf
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover - internal-API fallback
        return ck
