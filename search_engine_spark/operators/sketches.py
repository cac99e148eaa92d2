"""Frequency sketches for web-scale term statistics.

A count-min sketch (Cormode & Muthukrishnan 2005) over corpus term
frequencies: at 10^12 documents the exact dictionary is enormous, and
many consumers (rate monitors, heavy-hitter detection, join-size
estimation) only need approximate frequency point queries.  A (d × w)
CMS answers them in O(d) lookups with one-sided additive error
(estimate ≥ truth, error ≤ total_mass / w per row, min over d rows),
independent of vocabulary size.

Engine-independence discipline (the repo's integer-grid rule): the
row hashes are md5-derived (first 8 hex chars mod w — the same
portable hash the MLT/docstore bucket layouts use) and every count is
BIGINT, so the sketch CELLS themselves are bit-identical across
engines and partitionings and the driver oracle checks them exactly —
an "approximate" structure with an exact contract.

Plan shape: building is d map-side projections unioned then ONE
(row, col) hash aggregation — cells ≤ d·w rows regardless of corpus
size; map-side combine collapses each partition to ≤ d·w rows before
the exchange.  A point query touches d cells via a broadcast of the
sketch (d·w BIGINTs — a few KB), never the corpus.

Reference counterpart: none (Indexer.java keeps the full TreeMap
dictionary in memory) — this is the 100 TB tooling the rebuild brief
calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def _col_expr(tok_col: str, row: int, width: int):
    """Portable CMS column hash: first 8 md5 hex chars of
    '<row>:<token>' mod width — identical arithmetic in Spark and
    DuckDB (the bucket-layout hash family, salted by the row index so
    the d rows are independent)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), F.col(tok_col))),
                           1, 8), 16, 10)
        .cast("long") % width
    )


def cms_cells(tf: DataFrame, width: int = DEFAULT_WIDTH,
              depth: int = DEFAULT_DEPTH,
              tok_col: str = "tok", weight_col: str = "tf") -> DataFrame:
    """(row, col, count) — the sketch cells over a (…, tok, weight)
    frame.  Exact BIGINT: the cells are a deterministic function of
    the corpus, not of the partitioning."""
    parts = [
        tf.select(
            F.lit(i).cast("long").alias("row"),
            _col_expr(tok_col, i, width).alias("col"),
            F.col(weight_col).cast("long").alias("c"),
        )
        for i in range(depth)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("row", "col").agg(F.sum("c").alias("count"))


DEFAULT_BLOOM_BITS = 1 << 14
DEFAULT_BLOOM_HASHES = 5


def bloom_bits(keys: DataFrame, key_col: str = "key",
               m_bits: int = DEFAULT_BLOOM_BITS,
               k_hashes: int = DEFAULT_BLOOM_HASHES) -> DataFrame:
    """(bit,) — the distinct bit positions a Bloom filter over the
    key set would have set (the set-bit list IS the filter, in its
    sparse relational form).  Same md5 hash family as the CMS, so the
    bits are a deterministic function of the key SET — exactly
    oracle-checkable, order- and partitioning-independent.  Build is
    k map-side projections + one distinct; the filter answers
    membership with no false negatives and a false-positive rate of
    ~(1 - e^{-kn/m})^k."""
    parts = [
        keys.select(_col_expr(key_col, i, m_bits).alias("bit"))
        for i in range(k_hashes)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.distinct()


def bloom_contains(bits: DataFrame, probes: list[str],
                   m_bits: int = DEFAULT_BLOOM_BITS,
                   k_hashes: int = DEFAULT_BLOOM_HASHES) -> DataFrame:
    """(key, maybe_present) — the Bloom membership test: true iff all
    k probed bits are set.  Deterministic: a false positive is the
    same false positive in every engine, so even the filter's errors
    oracle-check exactly.  The probe side is |probes|·k rows against
    a broadcast of the sparse bit list."""
    spark = bits.sparkSession
    pr = spark.createDataFrame(
        [(t,) for t in sorted(set(probes))], "key string")
    keyed = None
    for i in range(k_hashes):
        part = pr.select("key", _col_expr("key", i, m_bits).alias("bit"))
        keyed = part if keyed is None else keyed.unionByName(part)
    hit = keyed.join(F.broadcast(bits.withColumn("_set", F.lit(1))),
                     "bit", "left")
    return (
        hit.groupBy("key")
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_set"), F.lit(0))))
             .alias("maybe_present"))
    )


# HyperLogLog: register index = hash mod m, register value = position
# of the highest set bit of the remaining hash bits (computed via the
# length of the minimal binary string — pure integer/string ops, no
# float log2 whose last-ulp could flip a register).  The REGISTERS are
# a deterministic max-merge of per-key values, so the sketch state is
# exactly oracle-checkable; the cardinality estimate is derived from
# an EXACT BIGINT register sum (sum of 2^(W-reg), one float division
# at the end), so even the float estimate is reproducible bit-for-bit
# across engines and partitionings.

HLL_M = 64                 # registers (2^6)
_HLL_HASH_HEX = 15         # 60-bit hash: 6 index bits + 54 value bits
_HLL_W = 4 * _HLL_HASH_HEX - 6


def hll_registers_by(df: DataFrame, group_col: str, key_col: str,
                     m: int = HLL_M) -> DataFrame:
    """(group, j, reg) — a grouped HLL: per-group register arrays in
    one ordinary hash aggregation.  THE web-scale per-key distinct
    pattern: `count_distinct` per group needs a (group, key) distinct
    shuffle of every pair; grouped HLL max-merges fixed-size register
    state inside the agg, so the exchange is bounded by groups × m
    rows no matter how many keys each group has."""
    h = f"cast(conv(substring(md5({key_col}), 1, {_HLL_HASH_HEX}), 16, 10) as bigint)"
    w = f"({h} div {m})"
    reg = (f"cast(case when {w} = 0 then {_HLL_W} "
           f"else {_HLL_W} - length(bin({w})) + 1 end as bigint)")
    return (
        df.selectExpr(group_col, f"({h} % {m}) as j", f"{reg} as r")
        .groupBy(group_col, "j").agg(F.max("r").alias("reg"))
    )


def hll_estimate_by(registers: DataFrame, group_col: str,
                    m: int = HLL_M) -> DataFrame:
    """(group, est) — per-group HLL estimates from grouped registers
    (same exact-BIGINT indicator sum as :func:`hll_estimate`)."""
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(group_col).agg(
        F.sum(F.expr(f"cast(pow(2, {_HLL_W} - reg) as bigint)")).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    two_w = float(1 << _HLL_W)
    denom = (F.col("s").cast("double")
             + (F.lit(m) - F.col("nz")).cast("double") * F.lit(two_w))
    est_raw = F.lit(alpha * m * m * two_w) / denom
    zeros = (F.lit(m) - F.col("nz")).cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((est_raw <= 2.5 * m) & (zeros > 0), lc).otherwise(est_raw)
    return agg.select(group_col, F.round(est, 4).alias("est"))


def hll_registers(keys: DataFrame, key_col: str = "key",
                  m: int = HLL_M) -> DataFrame:
    """(j, reg) — the HLL register array over the key set (sparse:
    untouched registers are absent = 0).  One map-side projection +
    one max agg; max-merge makes the state order-independent and
    mergeable across partitions/segments, the property that makes HLL
    the standard distributed distinct-counter.  rank = leading zeros
    of the value bits within a W-bit window, +1, computed as
    W - length(bin(w)) + 1 — pure integer/string ops, no float log2
    whose last ulp could flip a register (the all-zero value, seen
    with probability 2^-W per key, clamps to rank W so every
    indicator 2^(W-reg) stays an exact BIGINT both engines truncate
    identically)."""
    h = f"cast(conv(substring(md5({key_col}), 1, {_HLL_HASH_HEX}), 16, 10) as bigint)"
    w = f"({h} div {m})"
    reg = (f"cast(case when {w} = 0 then {_HLL_W} "
           f"else {_HLL_W} - length(bin({w})) + 1 end as bigint)")
    return (
        keys.selectExpr(f"({h} % {m}) as j", f"{reg} as r")
        .groupBy("j").agg(F.max("r").alias("reg"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """(est,) — the HLL cardinality estimate with the standard
    small-range (linear-counting) correction.  The indicator sum
    sum(2^-reg) is computed as the EXACT BIGINT  sum(2^(W - reg))
    (absent sparse registers contribute 2^W each), so the only float
    operations are one division and, in the small range, one log —
    no float summation order anywhere; the rounded estimate is
    bit-reproducible across engines and partitionings."""
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.expr(f"cast(pow(2, {_HLL_W} - reg) as bigint)")).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    two_w = float(1 << _HLL_W)
    denom = (F.col("s").cast("double")
             + (F.lit(m) - F.col("nz")).cast("double") * F.lit(two_w))
    est_raw = F.lit(alpha * m * m * two_w) / denom
    # present registers always hold reg >= 1, so zero-registers are
    # exactly the absent sparse rows
    zeros = (F.lit(m) - F.col("nz")).cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((est_raw <= 2.5 * m) & (zeros > 0), lc).otherwise(est_raw)
    return agg.select(F.round(est, 4).alias("est"))


def cms_estimate(cells: DataFrame, terms: list[str],
                 width: int = DEFAULT_WIDTH,
                 depth: int = DEFAULT_DEPTH) -> DataFrame:
    """(term, est) — CMS point queries: min over the d rows of the
    probed cell (0 when a cell is empty), the classic one-sided
    estimate (est ≥ true count always; equality when no collision).
    The probe frame is |terms|·d rows; the sketch side is ≤ d·w rows
    — broadcast by construction, never a corpus touch."""
    spark = cells.sparkSession
    probes = spark.createDataFrame(
        [(t, i) for t in sorted(set(terms)) for i in range(depth)],
        "term string, row long",
    )
    keyed = None
    # the column hash depends on the row index, so build per-row
    # slices of the probe frame (d is tiny and static)
    for i in range(depth):
        part = (
            probes.filter(F.col("row") == i)
            .select("term", "row", _col_expr("term", i, width).alias("col"))
        )
        keyed = part if keyed is None else keyed.unionByName(part)
    joined = keyed.join(F.broadcast(cells), ["row", "col"], "left")
    return (
        joined.groupBy("term")
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0)))
             .cast("long").alias("est"))
    )
