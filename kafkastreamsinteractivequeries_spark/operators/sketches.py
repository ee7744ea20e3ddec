"""Mergeable sketch operators for approximate statistics at 100 TB
(north-star extension, beyond the reference's surface — SURVEY.md §2.4
notes the reference has no aggregate surface at all beyond T5).

The engine-native choice would be Spark's HyperLogLog
(``approx_count_distinct``), but its binary sketch is engine-specific —
the DuckDB oracle could never hash-match it.  KMV (k-minimum-values) is
the portable alternative: with a deterministic arithmetic hash, the
sketch CONTENT (the k smallest hash values) is bit-identical across
engines, so the estimate is exactly reproducible and oracle-checkable
while keeping every property that matters at scale:

- one pass, map-side partial aggregation (duplicates collapse early);
- sketches are mergeable (union of two KMV sets, re-truncated to k) —
  the same merge the shuffle's partial aggregation performs;
- memory is O(k) per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kafkastreamsinteractivequeries_spark.operators.analytics import top_k_per_key_two_phase

# Multiplicative hash over a 32-bit ring: deterministic, uniform enough
# for sketching, and pure integer arithmetic — bit-identical in any
# engine (no engine-specific hash function in the contract).  Two
# smaller-multiplier rounds instead of one Knuth multiply keep every
# intermediate product < 2^63 for ANY input key (2^32 · 48271 ≈ 2e14),
# so the arithmetic never overflows int64 in either engine.  Each round
# is an odd multiplier mod 2^32 — a bijection on the ring, so distinct
# keys below 2^32 never collide.
_RING = 2**32
_MUL1 = 48271
_MUL2 = 16807


def kmv_hash(col: F.Column) -> F.Column:
    """Map an integer key onto the 32-bit hash ring."""
    h1 = (F.pmod(col, F.lit(_RING)) * _MUL1) % _RING
    return (h1 * _MUL2) % _RING


def _xorshift(h: F.Column, bits: int) -> F.Column:
    """h XOR (h >> bits) for nonnegative h — the shift as division by
    2^bits (exact in both engines; avoids engine-specific shift ops)."""
    return h.bitwiseXOR(F.floor(h / F.lit(2**bits)).cast("long"))


def mix_hash32(col: F.Column) -> F.Column:
    """Multiply–xorshift mixer onto the 32-bit ring (murmur-finalizer
    shape, built from ops both engines share: *, %, xor, integer div).

    ``kmv_hash``'s pure multiplicative ring walk is a bijection — ideal
    for KMV's k-th-smallest statistic (equidistributed values give
    LOWER estimator variance) — but its outputs form a lattice whose
    too-even bucket occupancy and bounded minimum gaps break HLL's
    max-rank statistic (measured ~2× overestimate on sequential ids).
    Interleaving xor-shifts between the odd multiplies destroys the
    lattice while every intermediate product stays < 2^48 (no int64
    overflow in any engine); the map stays injective on [0, 2^32)
    (multiplies are bijections, x ^ (x >> s) is invertible), verified
    distinct over 1M sequential keys in tests.
    """
    h = (F.pmod(col, F.lit(_RING)) * _MUL1) % _RING
    h = _xorshift(h, 16)
    h = (h * _MUL2) % _RING
    h = _xorshift(h, 13)
    h = (h * 69621) % _RING
    return _xorshift(h, 17)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group via a KMV sketch.

    Estimator: with hashes uniform on [0, 1), the k-th smallest value
    h_(k) estimates distinct count as (k-1) / h_(k); if a group holds
    fewer than k distinct keys the sketch is exact by construction.

    The k smallest hashes are selected with the salted two-phase top-k
    (``top_k_per_key_two_phase``) — per-(group, salt) partial ranking
    bounds every sort, so one group with billions of distinct keys
    cannot pin a single task (the plain window-rank skew cliff).
    """
    # NULL keys are excluded, matching COUNT(DISTINCT) semantics — a
    # null hash would otherwise sort FIRST (asc puts nulls first) and
    # pollute the k-minima statistic
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(*[F.col(c) for c in group_cols], kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .withColumn("neg_h", -F.col("h"))
    )
    kept = top_k_per_key_two_phase(
        hashes, group_cols, order_col="neg_h", tiebreak_col="h", k=k
    )
    per_group = kept.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    saturated = F.col("n_kept") >= k
    estimate = F.when(
        saturated,
        F.round((F.lit(k) - 1.0) / (F.col("kth_hash") / F.lit(float(_RING))), 4),
    ).otherwise(F.col("n_kept").cast("double"))
    return per_group.select(
        *group_cols,
        F.col("n_kept"),
        F.col("kth_hash"),
        estimate.alias("distinct_estimate"),
    )


def kmv_distinct_users(events: DataFrame, k: int = 32) -> DataFrame:
    """x10/kmv: approximate distinct users per event type over the
    events stream — the per-key cardinality profile a pipeline consults
    before choosing join strategies (broadcast vs shuffle) or partition
    layouts."""
    return kmv_distinct(events, key_col="user_id", group_cols=["event_type"], k=k)


def kmv_overlap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 32,
) -> DataFrame:
    """Set-operation cardinality estimates for every unordered pair of
    groups, from merged KMV sketches (the theta-sketch trick): for the
    pair (a, b), take the k smallest hashes of A ∪ B, count how many
    belong to both sides, and estimate

        union_estimate        — (k−1)/h_(k) as in ``kmv_distinct``
        jaccard_estimate      — |k-set ∩ A ∩ B| / |k-set|
        intersection_estimate — jaccard · union

    — "distinct users in segment A AND B" without an exact distinct over
    either, the query exact COUNT(DISTINCT) cannot answer from
    per-segment aggregates.

    Scale shape: set ops run on the SKETCHES, not the data — each
    group's k-min set is selected once with the skew-safe two-phase
    top-k (the only corpus-sized work, identical to ``kmv_distinct``),
    after which the pair expansion handles groups × k rows: broadcast
    scale for any low-cardinality segment column.  The k smallest of
    A ∪ B are a subset of kmin(A) ∪ kmin(B), so merging truncated
    sketches is exact — the mergeability property that makes this
    legal on pre-aggregated per-segment sketches.
    """
    hashes = (
        df.select(F.col(group_col).alias("_g"), kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .withColumn("neg_h", -F.col("h"))
    )
    kept = top_k_per_key_two_phase(
        hashes, ["_g"], order_col="neg_h", tiebreak_col="h", k=k
    ).select("_g", "h")
    a = kept.select(F.col("_g").alias("group_a"), "h")
    b = kept.select(F.col("_g").alias("group_b"), "h")
    # per-pair membership of each hash in either side's sketch (full
    # outer on h within the pair frame, built as a union + flag agg)
    pair_rows = (
        a.crossJoin(b.select("group_b").distinct())
        .filter(F.col("group_a") < F.col("group_b"))
        .select("group_a", "group_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            b.crossJoin(a.select("group_a").distinct())
            .filter(F.col("group_a") < F.col("group_b"))
            .select("group_a", "group_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("group_a", "group_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("h")
    kset = pair_rows.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    folded = kset.groupBy("group_a", "group_b").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_kept") >= k,
        F.round((F.lit(k) - 1.0) / (F.col("kth_hash") / F.lit(float(_RING))), 4),
    ).otherwise(F.col("n_kept").cast("double"))
    jacc = F.round(F.col("n_both") / F.col("n_kept"), 6)
    return folded.select(
        "group_a",
        "group_b",
        F.col("n_both"),
        union_est.alias("union_estimate"),
        jacc.alias("jaccard_estimate"),
        F.round(union_est * jacc, 4).alias("intersection_estimate"),
    )


# --------------------------------------------------------------------------
# HyperLogLog — fixed-size registers, the industry-standard cardinality
# sketch (Flajolet et al. 2007).  Same portability contract as KMV: the
# registers derive from the deterministic ring hash, so register CONTENT
# (and the estimate) is bit-identical across engines.
# --------------------------------------------------------------------------


def hll_alpha(m: int) -> float:
    """Bias-correction constant α_m from the HLL paper (driver-side;
    inlined as a literal into both the Spark plan and the oracle SQL)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 6,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group via HyperLogLog with
    ``m = 2^p`` registers.

    Register derivation (low-bits bucketing, engine-portable integer
    arithmetic): ``h`` is the 32-bit ring hash; ``bucket = h mod m``;
    the remaining ``w = h div m`` is a ``32-p``-bit word whose leading-
    zero rank is ``(32-p) - bitlen(w) + 1`` (``bitlen`` via
    ``length(bin(w))`` — identical in Spark and DuckDB), or ``32-p+1``
    when ``w = 0``.  Estimator: ``α·m²/Σ 2^-M_j`` with the standard
    linear-counting small-range correction (``E ≤ 2.5m`` and empty
    registers present → ``m·ln(m/V)``).

    Scale shape: two partial-aggregating shuffles — (group, bucket) max
    then per-group fold — with state O(m) per group at every stage; the
    max-merge of registers IS the sketch's merge operator, so map-side
    combine performs exactly the distributed merge the paper describes.
    Unlike KMV's top-k selection this never ranks anything: pure
    fixed-size aggregation, the cheapest cardinality path at 100 TB.
    """
    regs = hll_registers(df, key_col, group_cols, p)
    return hll_estimate(regs, group_cols, p)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 6,
) -> DataFrame:
    """(group…, bucket, reg): the HLL register table — the sketch's
    mergeable REPRESENTATION.  Two register tables over different data
    slices combine by ``groupBy(group, bucket).max(reg)``; that is the
    whole distributed/streaming merge story (used by the streaming
    register sink in ``streaming/pipeline.py``)."""
    m = 2**p
    hi_bits = 32 - p
    h = mix_hash32(F.col(key_col))
    bucket = F.pmod(h, F.lit(m))
    w = F.floor(h / F.lit(m))
    rank = F.when(w > 0, F.lit(hi_bits) - F.length(F.bin(w)) + 1).otherwise(
        F.lit(hi_bits + 1)
    )
    # NULL keys are excluded (COUNT(DISTINCT) semantics): a null hash
    # would register a spurious null bucket
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*[F.col(c) for c in group_cols], bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 6) -> DataFrame:
    """Fold a register table (``hll_registers`` output, possibly merged
    across slices/batches) into per-group estimates — the second half of
    ``hll_distinct``."""
    m = 2**p
    folded = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_z_present"),
        F.count("*").alias("nonzero_buckets"),
    )
    # absent buckets hold register 0 → contribute 2^0 = 1 each
    z = F.col("_z_present") + (F.lit(m) - F.col("nonzero_buckets"))
    raw = F.lit(hll_alpha(m) * m * m) / z
    empty = F.lit(m) - F.col("nonzero_buckets")
    corrected = F.when(
        (raw <= 2.5 * m) & (empty > 0), F.lit(float(m)) * F.log(F.lit(m) / empty)
    ).otherwise(raw)
    return folded.select(
        *group_cols,
        F.col("nonzero_buckets"),
        F.round(corrected, 4).alias("distinct_estimate"),
    )


# --------------------------------------------------------------------------
# Count-min sketch — fixed-size frequency estimation (Cormode &
# Muthukrishnan 2005): d hash rows × w counters; point query = min over
# rows.  Always an over-estimate; error ≤ 2n/w with prob 1-(1/2)^d.
# --------------------------------------------------------------------------

_CMS_P = 2**31 - 1  # Mersenne prime for the row-hash family
_CMS_A = (48271, 16807, 69621, 40692)
_CMS_B = (1, 7, 13, 31)


def _cms_col(key: F.Column, row: int, width: int) -> F.Column:
    """Row ``row``'s counter column for ``key``: ((k·A + B) mod P) mod w.
    Every intermediate < 2^48 — no int64 overflow in either engine."""
    return F.pmod(
        (F.pmod(key, F.lit(_CMS_P)) * _CMS_A[row] + _CMS_B[row]) % _CMS_P,
        F.lit(width),
    )


def cms_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(row, col, cnt): the count-min counter table for ``key_col``.

    One explode to d skinny (row, col) rows per record, then a
    partial-aggregating count — after map-side combine at most d×w rows
    per partition cross the shuffle, so the sketch build is bounded by
    the SKETCH size, not the corpus: the canonical fixed-memory
    frequency pass at 100 TB.  The counter table itself (≤ d×w rows) is
    broadcastable for probe joins at any corpus size.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, width).alias("col"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(probe, cms_estimate): point-query the sketch for each probe key
    — min over the d rows' counters (0 when a cell was never hit).

    The counter table is broadcast (≤ d×w rows by construction); the
    probe side explodes to d rows per key and a partial-agg min folds
    them back, so probing n keys is one map-side join + one skinny
    shuffle of n×d rows."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(probe_col), i, width).alias("col"),
            )
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(
        F.col(probe_col), F.explode(cells).alias("cell")
    ).select(probe_col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return (
        probe_cells.join(F.broadcast(counters), ["row", "col"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def mg_heavy_hitters(
    df: DataFrame, col: str, k: int = 32, group_col: str | None = None
) -> DataFrame:
    """Misra–Gries frequent items: one-pass bounded-memory heavy
    hitters (the frequent-items member of the sketch family beside
    KMV/HLL/CMS).  Each partition keeps at most ``k`` counters — on
    overflow every counter decrements (the classic MG step), so a
    partition's counter underestimates that partition's true count by
    at most ``n_p/(k+1)``; summing partial counters across partitions
    keeps the bound additive, giving the global guarantee:

        true_count − n/(k+1)  ≤  estimate  ≤  true_count

    and EVERY item with true count > n/(k+1) survives to the output
    (no false negatives above the threshold).  The estimates are
    partitioning-DEPENDENT (inherent to MG — the decrement order
    depends on arrival order), which is why this operator is
    pytest/property-verified rather than hash-verified; the guarantee,
    not the exact counter, is the contract.

    Scale shape: one ``mapInPandas`` pass holding k counters per
    partition (Arrow-batched, constant memory), then one aggregation
    over the ≤ k·partitions summary rows and a TakeOrdered top-k.
    Output: (item, estimate, n_total, error_bound) — estimate summed
    partial counters, ``error_bound = n div (k+1)``.

    ``group_col`` scopes the sketch per group (counters keyed by
    (group, item); memory k per group per partition)."""
    import pandas as pd

    keep = [c for c in ([group_col] if group_col else []) + [col]]
    src = df.select(*keep).filter(F.col(col).isNotNull())
    out_schema = (
        (f"{group_col} string, " if group_col else "")
        + "item string, partial long"
    )

    def summarize(batches):
        # dict-of-dicts keyed by group: the MG overflow decrement
        # touches only that group's <= k counters — O(items x k), not
        # O(items x k x n_groups) (a full-counter scan per miss).
        counters: dict[str, dict[str, int]] = {}
        for pdf in batches:
            groups = (
                pdf[group_col].astype(str)
                if group_col
                else pd.Series(["_"] * len(pdf))
            )
            for g, item in zip(groups, pdf[col].astype(str)):
                grp = counters.setdefault(g, {})
                if item in grp:
                    grp[item] += 1
                elif len(grp) < k:
                    grp[item] = 1
                else:
                    dead = []
                    for it in grp:
                        grp[it] -= 1
                        if grp[it] == 0:
                            dead.append(it)
                    for it in dead:
                        del grp[it]
        rows = [
            {
                **({group_col: g} if group_col else {}),
                "item": item,
                "partial": c,
            }
            for g, grp in counters.items()
            for item, c in grp.items()
        ]
        cols = ([group_col] if group_col else []) + ["item", "partial"]
        yield pd.DataFrame(rows, columns=cols)

    summaries = src.mapInPandas(summarize, out_schema)
    gcols = [group_col] if group_col else []
    totals = df.filter(F.col(col).isNotNull()).groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    agg = summaries.groupBy(*gcols, "item").agg(
        F.sum("partial").cast("long").alias("estimate")
    )
    joined = (
        agg.join(F.broadcast(totals), gcols) if gcols else agg.crossJoin(
            F.broadcast(totals)
        )
    )
    ranked = joined.select(
        *gcols,
        "item",
        "estimate",
        "n_total",
        F.expr(f"n_total div {k + 1}").cast("long").alias("error_bound"),
    )
    if gcols:
        # grouped: every surviving counter (≤ k per group per source
        # partition before the merge); callers top-k per group with
        # top_k_per_key_two_phase if they want exactly k
        return ranked
    return ranked.orderBy(F.col("estimate").desc(), "item").limit(k)


# --------------------------------------------------------------------------
# Mergeable quantile sketches: the bounded-error path for 100 TB where
# `length_percentiles` (exact, needs the full multiset) and
# `length_histogram_quantiles` (mergeable, but on a CHOSEN bin grid)
# both fall short.  Two operators, two contracts:
#
# - `hashed_quantile_sketch` — a DETERMINISTIC weight-stratified hash
#   sampler (the bottom-k/VarOpt family): the sketch is a pure
#   function of the value MULTISET, so it is partitioning-invariant,
#   engine-portable, and hash-verifiable in the driver's DuckDB
#   oracle (a KLL compaction trajectory depends on arrival order and
#   can never be).  Skew-safe by construction: the high binary-weight
#   digits of a value's count are ALWAYS kept, so a value carrying
#   half the corpus can never be sampled away.
# - `kll_sketch` — the real Karnin–Lang–Liberty compactor (FOCS 2016,
#   arXiv:1603.05346): tighter space for a given rank error on
#   unbounded-cardinality streams, but arrival-order-dependent, so it
#   is pytest/property-verified (the Misra–Gries precedent — the
#   GUARANTEE, not the exact content, is the contract).
# --------------------------------------------------------------------------


def _hqs_thin(weighted: DataFrame, k: int, max_level: int = 41) -> DataFrame:
    """Core of the hashed quantile sketch: (value, c) weighted rows →
    kept (value, weight) rows.  Each count decomposes into its binary
    digits — entry (value, j) of weight 2^j per set bit j — and a
    digit survives iff j ≥ S (always: the skew guarantee) or the ring
    hash of (value, j) lands in the 2^-(S-j) acceptance slice, in
    which case it carries inverse-probability weight 2^S (unbiased).
    S = max(0, floor(log2 n) − floor(log2 k)) comes from the total
    mass in CLOSED FORM — no compaction loop, so the whole
    construction replays as plain SQL.  Keep-sets are NESTED in S
    (a 2^-(S+1) slice is half of the 2^-S slice), which is what makes
    re-thinning after a merge deterministic and consistent.

    Expected kept rows ≤ ~max_level·k; expected absolute rank error
    is O(n·√max_level / k) (each sampled level contributes variance
    ≤ n·2^S ≤ n²/k per level).  Exact (S = 0, zero sampling) whenever
    n ≤ k.  int64 envelope: counts below 2^41 per value (max_level);
    raise max_level toward 62 for hotter keys."""
    n_agg = weighted.agg(F.sum("c").cast("long").alias("n"))
    logk = max(int(k).bit_length() - 1, 0)
    s_col = F.greatest(
        F.lit(0), (F.length(F.bin(F.col("n"))) - 1) - F.lit(logk)
    ).alias("s")
    pow2 = lambda e: F.floor(F.pow(F.lit(2.0), e)).cast("long")  # noqa: E731
    entries = (
        weighted.crossJoin(F.broadcast(n_agg.select("n", s_col)))
        .select(
            "value",
            "c",
            "s",
            F.explode(F.sequence(F.lit(0), F.lit(max_level - 1))).alias("j"),
        )
        # bit j of c — division by a power of two is exact in double
        # below 2^53 on both engines (the determinism rule)
        .filter(F.floor(F.col("c") / F.pow(F.lit(2.0), F.col("j"))).cast("long") % 2 == 1)
        # mix_hash32, NOT kmv_hash: mod a power of two the pure
        # multiplicative walk is AFFINE in the key, so keep-decisions
        # at different levels of the same value pin each other (a
        # residue class kept at level j is kept or dropped WHOLESALE
        # at level j+2 after a merge doubles its weights — measured
        # +50% mass bias in the streaming sink test).  The xorshift
        # mixer's low bits are fed from its high bits, breaking the
        # lattice — the HLL lesson replayed at the low-bit end.
        # greatest(s-j, 1): rows with j >= s pass via the first
        # disjunct, but engines may still EVALUATE the modulus for
        # them — a 2^negative exponent would truncate to 0 and make
        # it a division by zero (an error in DuckDB's replay)
        .filter(
            (F.col("j") >= F.col("s"))
            | (
                mix_hash32(F.col("value") * 97 + F.col("j"))
                % pow2(F.greatest(F.col("s") - F.col("j"), F.lit(1)))
                == 0
            )
        )
        .select(
            "value",
            F.when(F.col("j") >= F.col("s"), pow2(F.col("j")))
            .otherwise(pow2(F.col("s")))
            .alias("w"),
        )
    )
    return entries.groupBy("value").agg(
        F.sum("w").cast("long").alias("weight")
    )


def hashed_quantile_sketch(
    df: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Build the deterministic mergeable quantile sketch over an
    integer column: (value, weight) rows, Σweight an unbiased
    estimate of the row count.  One aggregation to distinct-value
    counts (map-side combinable — a hot value collapses per task),
    then the closed-form thin; no sort, no window, no Python."""
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("long").alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return _hqs_thin(counts, k)


def merge_hashed_quantile_sketches(
    a: DataFrame, b: DataFrame, k: int = 256
) -> DataFrame:
    """Merge two sketches: weights add per value, then one re-thin
    under the merged total's S.  Deterministic given the two inputs
    (merging the same pair twice is bit-identical), and the estimates
    stay unbiased — each re-thinned digit is re-sampled by the same
    inverse-probability hash rule, so variance grows gracefully with
    merge depth rather than biasing.  NOT bit-equal to the one-shot
    sketch of the union: the halves were thinned under a smaller S,
    so their kept weights re-decompose differently — the one-shot
    build is the hash-verified form; merging is the incremental
    form."""
    summed = (
        a.select("value", F.col("weight").alias("c"))
        .unionByName(b.select("value", F.col("weight").alias("c")))
        .groupBy("value")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return _hqs_thin(summed, k)


def hashed_quantile_estimates(
    sketch: DataFrame, percents: tuple[int, ...] = (25, 50, 75, 90)
) -> DataFrame:
    """One row per requested percentile from a sketch: the smallest
    value whose cumulative weight reaches ceil(p·W/100), in exact
    integer arithmetic (cum·100 ≥ p·W — no float thresholds).  The
    window runs over the BOUNDED sketch (≤ ~41·k rows), the
    histogram-quantile precedent, never over raw data.  Output:
    (percentile, value, n_est, sketch_rows)."""
    cum = sketch.select(
        "value",
        "weight",
        F.sum("weight")
        .over(Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("weight").over(Window.partitionBy()).alias("wtot"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nrows"),
    )
    out = None
    for p in percents:
        row = cum.filter(F.col("cum") * 100 >= F.lit(int(p)) * F.col("wtot")).agg(
            F.lit(int(p)).alias("percentile"),
            F.min("value").alias("value"),
            F.min(F.col("wtot")).alias("n_est"),
            F.min(F.col("nrows")).alias("sketch_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _kll_compact(levels: list[list[float]], k: int, state: dict) -> None:
    """In-place KLL compaction: find the lowest over-full level, sort
    it, keep the odd- or even-indexed half (selector bit = md5 of the
    per-level compaction counter — reproducible run-to-run), promote
    the kept half one level up (weight doubles).  Level capacities
    decay going DOWN from the top (cap = k·(2/3)^(top−lvl), the KLL
    schedule): the newest/highest level keeps the full k, old levels
    shrink — low-weight items are the cheap ones to forget."""
    import hashlib

    while True:
        top = len(levels) - 1
        target = None
        for lvl, buf in enumerate(levels):
            if len(buf) > max(2, int(k * (2 / 3) ** (top - lvl))):
                target = lvl
                break
        if target is None:
            return
        buf = sorted(levels[target])
        ctr = state["ctr"] = state.get("ctr", 0) + 1
        bit = hashlib.md5(f"{target}:{ctr}".encode()).digest()[0] & 1
        kept = buf[bit::2]
        levels[target] = []
        if target + 1 == len(levels):
            levels.append([])
        levels[target + 1].extend(kept)


def kll_sketch(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """Karnin–Lang–Liberty quantile sketch (arXiv:1603.05346): one
    Arrow ``mapInPandas`` pass holding a capacity-decayed compactor
    chain per partition (constant memory), then a driver-side merge
    of the bounded per-partition summaries (concatenate per level,
    re-compact) — the Misra–Gries scale shape.  Output: (level,
    value) rows; an item at level ℓ represents 2^ℓ originals.

    Rank error is O(n/k) with high probability; min/max/n are exact
    side outputs of any scan.  The compaction selector bit is
    md5(level:counter) — deterministic for a fixed partitioning and
    arrival order (re-running the same layout reproduces the sketch
    bit-for-bit), but arrival-order dependence is INHERENT to KLL,
    so the operator is pytest/property-verified, never
    hash-verified; `hashed_quantile_sketch` is the deterministic
    sibling for oracle-checked pipelines."""
    import pandas as pd  # noqa: F401

    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("v")
    )

    def summarize(batches):
        import pandas as pd

        levels: list[list[float]] = [[]]
        state: dict = {}
        for pdf in batches:
            for v in pdf["v"]:
                levels[0].append(float(v))
                _kll_compact(levels, k, state)
        rows = [
            {"level": lvl, "value": v}
            for lvl, buf in enumerate(levels)
            for v in buf
        ]
        yield pd.DataFrame(rows, columns=["level", "value"])

    partials = src.mapInPandas(summarize, "level int, value double")
    # driver-side final merge: per-partition sketches are O(k·log n)
    # rows each — bounded, the MG summary-collect precedent
    rows = partials.collect()
    levels: list[list[float]] = []
    for r in rows:
        while len(levels) <= r["level"]:
            levels.append([])
        levels[r["level"]].append(r["value"])
    state: dict = {"ctr": 1 << 20}  # disjoint counter space from map side
    _kll_compact(levels, k, state)
    out = [
        (lvl, v) for lvl, buf in enumerate(levels) for v in sorted(buf)
    ]
    spark = df.sparkSession
    return spark.createDataFrame(out or [(0, None)], "level int, value double")


def kll_quantiles(
    sketch: DataFrame, quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)
) -> dict[float, float]:
    """Quantile estimates from a KLL sketch: weighted rank over the
    bounded sketch rows (collected — the sketch IS small)."""
    rows = [
        (r["value"], 1 << r["level"])
        for r in sketch.collect()
        if r["value"] is not None
    ]
    rows.sort()
    total = sum(w for _v, w in rows)
    out: dict[float, float] = {}
    for q in quantiles:
        target = q * total
        cum = 0
        val = rows[-1][0] if rows else None
        for v, w in rows:
            cum += w
            if cum >= target:
                val = v
                break
        out[q] = val
    return out
