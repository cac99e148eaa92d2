"""Window-free ranking for post-limit top-k frames.

The canonical top-k plan is ``orderBy(...).limit(k)`` — Spark plans it
as TakeOrderedAndProject (per-partition heaps, k rows total).
Attaching the 1-based rank afterwards with
``row_number().over(Window.orderBy(...))`` is correct and cheap (the
window input is only k rows), but Spark logs the scary
"No Partition Defined ... moving all data to a single partition"
warning for ANY empty-partition-spec window regardless of input size,
and the optimizer constant-folds away every trick that tries to give
the window a constant partition key.

``ranked`` computes the identical rank declaratively instead:

    rank(a) = 1 + |{b : b sorts strictly before a}|

as a self-join + count over the k post-limit rows — O(k^2)
comparisons on k <= ~100 rows, no WindowExec node, no warning, and
the plan stays an honest broadcast nested-loop join over a tiny
frame.  Requires a TOTAL order (the last order column must be a
unique tie-break key), which every top-k in this engine already has
(url / doc_id / vec_id).
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked(df: DataFrame, order: list[tuple[str, str]],
           rank_col: str = "rank") -> DataFrame:
    """Attach ``rank_col`` (int, 1-based) to an ALREADY-LIMITED frame
    under the total order ``order`` = [(col, "asc"|"desc"), ...].

    The input must be small (post ``limit(k)``) and the order total —
    duplicate full sort keys would receive equal ranks AND the
    groupBy would merge equal rows, so the last order column must be
    unique (it is the deterministic tie-break in every caller).

    The frame is localCheckpoint'ed (lazily) before the self-join:
    the two join sides must see ONE materialization of the input.
    Without it each side re-executes the upstream plan independently,
    and float scores summed in shuffle-fetch order can differ in the
    last ulp between executions on a cluster — an exact-equality
    self-comparison would then inflate or skip ranks.  (Also halves
    the cost: the scoring plan runs once, not once per join side.)

    Cluster-path tradeoff (deliberate): localCheckpoint pins blocks on
    executors with NO lineage fallback — losing an executor mid-query
    fails the query instead of recomputing.  For a post-limit(k) frame
    that is the right trade: the pinned state is <= k (~50) rows per
    live query, the exposure window is one rank join, and the
    alternative (reliable checkpoint to the cluster FS) costs a
    write+read round trip per query on the latency path.  A persist()
    would keep lineage but reintroduces the ulp hazard above on
    recompute — the exact bug this checkpoint exists to prevent.  The
    blocks are freed by Spark's ContextCleaner when the returned frame
    is garbage collected; a campaign holding thousands of ranked
    frames alive simultaneously should collect results and release the
    DataFrames, not accumulate them."""
    cols = df.columns
    df = df.localCheckpoint(eager=False)
    a, b = df.alias("_ra"), df.alias("_rb")

    def before() -> Column:
        terms: list[Column] = []
        eqs: list[Column] = []
        for c, direction in order:
            ac, bc = F.col(f"_ra.{c}"), F.col(f"_rb.{c}")
            cmp = (bc > ac) if direction == "desc" else (bc < ac)
            terms.append(reduce(and_, eqs + [cmp]))
            eqs.append(bc.eqNullSafe(ac))
        return reduce(or_, terms)

    tie = order[-1][0]
    return (
        a.join(b, before(), "left")
        .groupBy(*[F.col(f"_ra.{c}").alias(c) for c in cols])
        .agg((F.count(F.col(f"_rb.{tie}")) + 1).cast("int").alias(rank_col))
        .orderBy(rank_col)  # keep the presentation order the window form had
    )
