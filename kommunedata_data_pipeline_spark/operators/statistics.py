"""Distribution diagnostics for corpus curation at scale.

The reference pipeline trusts its sources blindly (scraper.py has no
notion of distributional drift); a 100 TB training-data pipeline can't —
mixture weighting (operators/sampling.py), contamination checks
(operators/corpus.py) and split assignment all assume you can MEASURE
how skewed a key is, whether two splits share a distribution, and
whether two categoricals are independent. These operators are those
measurements, each a single aggregation pipeline over the key
distribution (never over raw rows twice), all engine-exact arithmetic
(integer counts + explicitly rounded doubles) so they oracle against
ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gini_skew_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column key-skew report: frequency Gini coefficient + top-key
    share for each requested column — the "will this key shuffle die at
    scale" diagnostic (Gini 0 = perfectly uniform keys, →1 = one key
    owns the table; anything above ~0.6 wants the skew-join/salting
    valves in operators/joins.py, operators/aggregates.py).

    Gini over frequencies f_1..f_n (ascending): G = 2·Σ(i·f_i)/(n·Σf) −
    (n+1)/n, computed per column from its frequency table. Scale shape:
    one groupBy per column over that column only (map-side combinable,
    pruned scan), then the Gini sum is a window cumsum over the
    n_keys-row frequency table — negligible beside the count. The
    per-column frequency tables are unioned, so the whole report is one
    job. Integer rank·count products keep the sum exact; the only float
    is the final division, rounded to 6 dp.
    """
    # ONE pass over the table for every requested column (guide §1.2:
    # fewer passes beats per-stage tuning): unpivot each row into
    # (col_name, key-as-string) pairs and run a single combinable
    # groupBy, instead of one scan + one shuffle per column. Grouping on
    # the string form is count-identical (the cast is injective per
    # column); the original grouped native and cast only for the
    # tiebreak.
    allfreq = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(c).cast("string").alias("ks"),
                        )
                        for c in cols
                    ]
                )
            ).alias("x")
        )
        .select("x.col_name", "x.ks")
        .where(F.col("ks").isNotNull())
        .groupBy("col_name", "ks")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.partitionBy("col_name").orderBy("f", "ks")
    ranked = allfreq.select(
        "col_name", "f", F.row_number().over(w).alias("i")
    )
    return (
        ranked.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("f").alias("n_rows"),
            F.sum(F.col("i") * F.col("f")).alias("iw"),
            F.max("f").alias("top_f"),
        )
        .select(
            "col_name",
            "n_keys",
            F.round(
                2.0 * F.col("iw") / (F.col("n_keys") * F.col("n_rows"))
                - (F.col("n_keys") + 1.0) / F.col("n_keys"),
                6,
            ).alias("gini"),
            F.round(F.col("top_f") / F.col("n_rows"), 6).alias("top_share"),
        )
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns — one row (n_cells, dof, chi2). The workhorse behind "does
    document quality depend on source?" / "is event mix stable across
    shards?" checks.

    Scale shape: ONE contingency groupBy(a, b) over the pruned two-column
    scan; marginals derive from the contingency table (tiny — |A|·|B|
    rows) by two re-aggregations and broadcast-join back. Expected counts
    and the statistic are computed on the cell table, never the raw rows.
    Chi2 uses exact integer observed counts; rounded to 4 dp.
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    row_tot = cells.groupBy("a").agg(F.sum("obs").alias("ra"))
    col_tot = cells.groupBy("b").agg(F.sum("obs").alias("cb"))
    grand = cells.agg(F.sum("obs").alias("n"))
    scored = (
        cells.join(F.broadcast(row_tot), "a")
        .join(F.broadcast(col_tot), "b")
        .crossJoin(F.broadcast(grand))
        .withColumn("exp", F.col("ra") * F.col("cb") / F.col("n"))
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_cells"),
        ((F.count_distinct("a") - 1) * (F.count_distinct("b") - 1)).alias("dof"),
        F.round(
            F.sum((F.col("obs") - F.col("exp")) ** 2 / F.col("exp")), 4
        ).alias("chi2"),
    )


def kl_divergence_splits(
    df: DataFrame, key_col: str, split_col: Column, alpha: float = 0.5
) -> DataFrame:
    """Smoothed KL divergence D(P‖Q) + D(Q‖P) between the ``key_col``
    distributions of two data splits (``split_col`` must evaluate to
    0/1) — the drift detector run between corpus snapshots, train/eval
    splits, or shard halves before trusting a mixture weight.

    Additive (Laplace α) smoothing over the UNION vocabulary keeps both
    logs finite and makes the result well-defined when a key appears in
    only one split. Scale shape: one groupBy(key) with two conditional
    sums (map-side combinable), then the divergence sums reduce the
    |vocab|-row table. Exact integer counts; rounded to 6 dp.
    """
    counts = (
        df.select(F.col(key_col).alias("k"), split_col.cast("int").alias("s"))
        .where(F.col("k").isNotNull())
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("f0"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("f1"),
        )
    )
    tot = counts.agg(
        F.sum("f0").alias("n0"),
        F.sum("f1").alias("n1"),
        F.count(F.lit(1)).alias("v"),
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        ((F.col("f0") + F.lit(alpha)) / (F.col("n0") + F.lit(alpha) * F.col("v"))).alias("p"),
        ((F.col("f1") + F.lit(alpha)) / (F.col("n1") + F.lit(alpha) * F.col("v"))).alias("q"),
    )
    return probs.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl_pq"),
        F.round(F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 6).alias("kl_qp"),
    )


def weighted_median_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exact weighted median per group: the smallest value whose running
    weight reaches half the group's total (lower weighted median —
    deterministic, no interpolation). The robust center for "median
    price weighted by quantity" style reporting where plain medians
    over-count small rows.

    Pass ``tiebreak_col`` (a unique key) whenever weights are floats:
    it pins a TOTAL cumsum order, making the running float sums
    bit-identical across engines/partitionings — without it, equal
    values permute and the crossing row's sum can differ in the last
    ulp right at a run boundary. The threshold test is ``2·cw ≥ tw``
    (no halving) so integer weights stay exact end-to-end.

    Scale shape: one window cumsum over (group, value-ordered) rows +
    one aggregation — a per-group parallel sort, same class as any
    percentile."""
    order = [value_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        value_col,
        F.sum(weight_col).over(w).alias("cw"),
        F.sum(weight_col).over(tot).alias("tw"),
    )
    return (
        ranked.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias("weighted_median"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
    )


def referential_orphans(
    facts: DataFrame, dims: DataFrame, fact_key: str, dim_key: str, by: str
) -> DataFrame:
    """Referential-integrity audit: per ``by`` group, how many fact rows
    reference a key absent from the dimension (orphans), with the orphan
    rate — the first broken-ingest smoke signal (a partial dim load shows
    up here before any join silently drops rows downstream).

    Scale shape: ONE left-anti join (orphans) + one groupBy, against the
    key-projected dim (column-pruned build side; broadcast when small).
    The totals come from a second groupBy over the pruned fact columns —
    both map-side combinable."""
    totals = facts.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    orphans = (
        facts.join(
            dims.select(F.col(dim_key).alias(fact_key)).distinct(),
            fact_key,
            "left_anti",
        )
        .groupBy(F.col(by).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    return (
        totals.join(orphans, "grp", "left")
        .select(
            "grp",
            "n_rows",
            F.coalesce("n_orphans", F.lit(0)).alias("n_orphans"),
            F.round(
                F.coalesce("n_orphans", F.lit(0)) / F.col("n_rows"), 6
            ).alias("orphan_rate"),
        )
    )


def entropy_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (nats) + normalized entropy per categorical
    column — the mixture-balance metric behind corpus reweighting
    (normalized 1.0 = perfectly balanced keys, →0 = one key dominates;
    the multiplicative complement of gini_skew_report's view).

    Scale shape: same as the Gini report — one map-side-combinable
    groupBy per column over just that column, unioned; the entropy sum
    reduces the tiny frequency tables. H = ln(N) − Σf·ln(f)/N computed
    from integer counts (one log per DISTINCT key, not per row);
    rounded 6 dp.
    """
    parts = []
    for c in cols:
        freq = (
            df.select(F.col(c).alias("k"))
            .where(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("f"))
            .select(F.lit(c).alias("col_name"), "f")
        )
        parts.append(freq)
    allfreq = parts[0]
    for p in parts[1:]:
        allfreq = allfreq.unionByName(p)
    return (
        allfreq.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("f").alias("n_rows"),
            F.sum(F.col("f") * F.log("f")).alias("flogf"),
        )
        .select(
            "col_name",
            "n_keys",
            F.round(
                F.log("n_rows") - F.col("flogf") / F.col("n_rows"), 6
            ).alias("entropy"),
            F.round(
                F.when(F.col("n_keys") > 1,
                       (F.log("n_rows") - F.col("flogf") / F.col("n_rows"))
                       / F.log("n_keys")).otherwise(0.0),
                6,
            ).alias("norm_entropy"),
        )
    )


def robust_outliers(
    df: DataFrame, key_col: str, val_col: str, cutoff: float = 4.4478
) -> DataFrame:
    """Robust per-group outlier report via median absolute deviation:
    for each key — n, exact median, exact MAD (median of |v − med|),
    and the count of points with |v − med| > cutoff * MAD. The default
    cutoff 4.4478 = 3 * 1.4826 is the classic "3 sigma" under the
    normal-consistency constant; median/MAD resist the very outliers
    that wreck mean/stddev-based z-scores (50% breakdown point vs 0%).

    Three bounded passes, each one shuffle on the key: (1) exact
    interpolated median per key, (2) MAD per key over |v − med| with
    the medians broadcast back onto the scan (the per-key table is
    GROUP-cardinality-sized, never data-sized), (3) outlier count with
    (med, MAD) broadcast. All arithmetic on both engines is the same
    double ops on the same operands — |v−med| and the cutoff product
    are bit-reproducible, so the counts are engine-exact. Exact
    medians shuffle each group's values once; at extreme scale swap
    pass 1/2's percentile for the GK sketch (see
    q_approx_quantile_bound) — the report shape is unchanged.
    """
    med = df.groupBy(key_col).agg(
        F.expr(f"percentile({val_col}, 0.5D)").alias("med")
    )
    dev = df.join(F.broadcast(med), key_col).select(
        key_col, val_col, "med", F.abs(F.col(val_col) - F.col("med")).alias("ad")
    )
    mad = dev.groupBy(key_col).agg(
        F.expr("percentile(ad, 0.5D)").alias("mad"),
        F.first("med").alias("med"),
    )
    return (
        dev.select(key_col, "ad")
        .join(F.broadcast(mad.select(key_col, "mad")), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("ad") > F.lit(cutoff) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .join(F.broadcast(mad), key_col)
        .select(
            key_col,
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
    )


def table_fingerprint(df: DataFrame, row_repr: Column) -> DataFrame:
    """Order-independent whole-table content fingerprint — the
    migration-validation primitive: run the same fingerprint on the
    source system and the landed table and compare ONE row instead of
    the data. ``row_repr`` must be an engine-canonical string per row
    (cast decimals/dates explicitly; float repr differs across
    engines). Caveat for nullable columns: ``concat_ws`` SKIPS nulls,
    so ('a', NULL, 'b') and ('a', 'b', NULL) would collide — coalesce
    each nullable column to a sentinel before concatenation.

    Three commutative-associative aggregates over a 56-bit md5-derived
    row hash (14 hex chars — fits BIGINT exactly on both engines):
    row count, XOR of hashes (order-independent, overflow-free), and a
    modular sum (catches multiset differences XOR can miss: a row
    repeated twice XORs to zero). One map-side-combinable pass, no
    shuffle beyond the final single-row combine; partitioning and row
    order cannot change the answer, which is what makes it comparable
    across engines AND across cluster layouts. DuckDB twin of the
    hash: ``('0x' || substr(md5(r), 1, 14))::BIGINT``."""
    h = F.conv(F.substring(F.md5(row_repr), 1, 14), 16, 10).cast("bigint")
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("h").alias("xor_fp"),
        F.sum(F.col("h") % 1000000007).cast("bigint").alias("sum_fp"),
    )


def benford_report(df: DataFrame, val_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic data-forensics screen for fabricated or truncated numeric
    columns. Per digit d in 1..9: observed count and share, Benford's
    expected share log10(1 + 1/d), and the signed deviation.

    The digit extraction floor(x / 10^floor(log10 x)) and every share
    are identical double operations on identical operands on both
    engines (bit-reproducible); one map-side-combinable digit groupBy
    + a one-row broadcast total. Rows with value <= 0 are excluded
    (no leading significant digit)."""
    d = F.floor(
        F.col(val_col) / F.pow(F.lit(10.0), F.floor(F.log10(val_col)))
    ).cast("int")
    counts = (
        df.where(F.col(val_col) > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("n_total"), 6).alias("pct"),
            F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("benford_pct"),
            F.round(
                F.col("n") / F.col("n_total") - F.log10(1 + 1 / F.col("digit")),
                6,
            ).alias("dev"),
        )
    )


def winsorize_report(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization summary: clip values to the exact
    [p_lo, p_hi] interpolated percentiles and report, per key, the
    clip counts and the winsorized sum — the standard heavy-tail
    tamer for feature columns (unlike dropping outliers, clipping
    keeps the row count, so downstream joins/weights stay intact).

    Two passes, each one shuffle on the key: exact percentiles per key
    (group-cardinality table, broadcast back onto the scan), then one
    map-side-combinable aggregate of the clipped values. The clipped
    value is either a stored double or the interpolated bound — both
    engines compute the identical double — and the winsorized sum
    accumulates in DECIMAL, so partitioning cannot move it. STRICT
    outside-the-bound counts; rounded on emission only."""
    pct = df.groupBy(key_col).agg(
        F.expr(f"percentile({val_col}, {lo}D)").alias("p_lo"),
        F.expr(f"percentile({val_col}, {hi}D)").alias("p_hi"),
    )
    clipped = df.join(F.broadcast(pct), key_col).select(
        key_col,
        F.col(val_col).alias("v"),
        "p_lo",
        "p_hi",
        F.least(F.greatest(F.col(val_col), F.col("p_lo")), F.col("p_hi")).alias(
            "w"
        ),
    )
    return clipped.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("v") < F.col("p_lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("v") > F.col("p_hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(F.first("p_lo"), 6).alias("p_lo"),
        F.round(F.first("p_hi"), 6).alias("p_hi"),
        F.round(
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double"), 4
        ).alias("winsorized_sum"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    el: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns —
    the release-gate check for any table leaving the pipeline: a row is
    re-identifiable when its quasi-identifier combination is shared by
    fewer than k rows, and attribute-disclosable when its equivalence
    class holds fewer than l distinct sensitive values. One row out:
    class counts, violating-class counts, the row-suppression rate a
    k-anonymous release would need, and the minima actually attained.

    One groupBy over the quasi columns (map-side combinable; the
    equivalence-class table is bounded by the quasi-id cardinality,
    not the data), with count_distinct(sensitive) riding the same
    aggregate; the report reduces that table. Integer counts
    end-to-end; the suppression rate is one rounded double division."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("sz"),
        F.count_distinct(sensitive_col).alias("lv"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.min("sz").cast("bigint").alias("min_class_size"),
        F.min("lv").cast("bigint").alias("min_l_diversity"),
        F.sum(F.when(F.col("sz") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_k"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_k"),
        F.sum(F.when(F.col("lv") < el, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_l"),
        F.round(
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            / F.sum("sz"),
            6,
        ).alias("suppression_rate"),
    )


def logreg_newton_step(
    df: DataFrame, x: Column, y: Column
) -> DataFrame:
    """One exact Newton–Raphson step of 2-parameter logistic regression
    (intercept + one integer feature) from beta = (0, 0) — the
    distributed quality-classifier training primitive next to the
    multinomial Naive Bayes trainer and the k-means Lloyd step. At
    beta = 0 every predicted probability is exactly 1/2, so the
    gradient is X^T(y - 1/2) and the Hessian is X^T X / 4, and the
    step has the closed form beta = 4 (X^T X)^{-1} X^T (y - 1/2) —
    a 2x2 solve over FIVE map-side-combinable integer sums
    (n, Σy, Σx, Σx², Σxy). The halves are cleared symbolically
    (Sr2 = 2Σy - n, Sxr2 = 2Σxy - Σx), so every operand up to the
    final division is a BIGINT both engines compute bit-identically;
    the two doubles (b0, b1) come from one division each over those
    exact integers, rounded on emission.

    ``x`` must be integer-valued; exactness holds while the cross
    products stay under 2^63 (n·Σx² and Σx·Σxy — comfortable through
    ~1e9 rows of 3-digit features; at 100 TB the same sums run in
    DECIMAL(38,0), or the feature is centered first). A k-feature
    model is the identical shape: k(k+1)/2 + k + 2 combinable sums
    and a tiny driver-side solve — the data pass does not change.
    Degenerate designs (constant x, det = 0) yield NULL betas rather
    than a division error.
    """
    yi = y.cast("bigint")
    xi = x.cast("bigint")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(yi).alias("sy"),
        F.sum(xi).alias("sx"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(xi * yi).alias("sxy"),
    )
    n, sy, sx = F.col("n"), F.col("sy"), F.col("sx")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    sr2 = 2 * sy - n
    sxr2 = 2 * sxy - sx
    det = n * sxx - sx * sx
    b0 = F.when(det != 0, 2.0 * (sxx * sr2 - sx * sxr2) / det)
    b1 = F.when(det != 0, 2.0 * (n * sxr2 - sx * sr2) / det)
    return agg.select(
        n.cast("bigint").alias("n"),
        sy.cast("bigint").alias("n_pos"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
    )


def logreg_apply(
    df: DataFrame,
    x: Column,
    y: Column,
    id_col: str = "doc_id",
    gate: str = "positive",
) -> DataFrame:
    """Train the one-step classifier AND apply it — the detect→act twin
    of `logreg_newton_step` (the span-cut / decontaminate discipline:
    a trainer that never scores anything curates nothing). The learned
    betas score every row with the linear logit b0 + b1·x and the
    accepted rows come back as the kept manifest ``(id, x, label,
    logit)`` — what a quality-gate stage writes before tokenization.

    ``gate``: 'positive' keeps logit > 0 (p > 1/2 — the absolute
    gate); 'prior' keeps rows whose ROUNDED logit exceeds the trained
    class prior's logit ln(p̄/(1−p̄)) (also round6) — the
    SELF-CALIBRATING "better than the corpus prior" gate, which binds
    at any class balance (an absolute 0-threshold never fires when the
    positive class is a minority everywhere — the r9 non-vacuousness
    gate caught exactly that on the registered query).

    Determinism: b0/b1 and the prior are round6 before the compare, so
    both engines decide on bit-identical doubles; the apply pass is a
    broadcast 1-row join + map-side filter/project."""
    betas = logreg_newton_step(df, x, y).select("b0", "b1")
    xi = x.cast("bigint")
    logit = F.col("b0") + F.col("b1") * xi
    if gate == "prior":
        pr = df.agg(
            F.round(
                F.log(
                    F.sum(y.cast("bigint")).cast("double")
                    / (F.count(F.lit(1)) - F.sum(y.cast("bigint")))
                ),
                6,
            ).alias("__pl")
        )
        keep = F.round(logit, 6) > F.col("__pl")
        scored = df.crossJoin(F.broadcast(betas)).crossJoin(
            F.broadcast(pr)
        )
    else:
        keep = logit > 0
        scored = df.crossJoin(F.broadcast(betas))
    return (
        scored.where(keep)
        .select(
            F.col(id_col),
            xi.alias("x"),
            y.cast("int").alias("label"),
            F.round(logit, 6).alias("logit"),
        )
        .orderBy(id_col)
    )


def ab_proportions_ztest(assignments: DataFrame) -> DataFrame:
    """Two-sample proportions z-test over
    ``assignments(unit, arm, converted)`` (arm/converted 0-or-1, one
    row per experimental unit) — the A/B experiment readout: per-arm
    counts and conversion rates, the pooled-variance z statistic, and
    the absolute lift. The decision-support twin of
    chi_square_independence (same contingency information, but the
    directional statistic experimenters act on).

    One map-side-combinable aggregate over the unit table (four
    conditional integer sums); every rate/z is a double expression
    over those exact integers — identical operands, identical IEEE
    results on both engines, rounded on emission. sqrt/division happen
    once on the one-row result, never per row."""
    agg = assignments.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("converted") == 1), 1)
              .otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("converted") == 1), 1)
              .otherwise(0)).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pool = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    # degenerate designs (an empty arm, or 0%/100% pooled conversion)
    # have no defined z — emit NULL instead of dividing by zero (ANSI
    # mode rightly refuses the 0/0)
    z = F.when(
        (F.col("n0") > 0) & (F.col("n1") > 0) & (pool > 0) & (pool < 1),
        (p1 - p0)
        / F.sqrt(pool * (1 - pool) * (1 / F.col("n0") + 1 / F.col("n1"))),
    )
    return agg.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("c0").cast("bigint").alias("c0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("c1").cast("bigint").alias("c1"),
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round(p1 - p0, 6).alias("lift"),
        F.round(z, 4).alias("z"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score_u",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a scored corpus — the calibration readout
    every classifier-driven curation gate needs next to its trainer
    (`logreg_newton_step`) and its apply step (`logreg_apply`): cut the
    corpus into ``n_bins`` equal-frequency score bins and report per
    bin the count, positive count, positive rate, and mean score. A
    well-calibrated scorer shows pos_rate tracking the score; a flat
    table says the gate threshold is arbitrary.

    ``score_col`` must be an INTEGER score (micro-units — the
    integer-log/micro discipline used across the stats family), so bin
    mean scores are exact integer sums and the ntile order
    (score, id) is a total order both engines replay identically.

    Scale note: equal-frequency binning via an unpartitioned ntile is
    a global sort — correct here and at audit-sized inputs, and kept
    as the exact-ntile ORACLE TWIN of `calibration_bins_hist`, which
    is the 100 TB path (histogram-grain bins, one combinable groupBy,
    no global sort of per-doc data).
    Output: (bin 1..n_bins, n, n_pos, pos_rate, avg_score)."""
    w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return (
        scored.withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col(label_col).cast("bigint")).alias("n_pos"),
            F.sum(F.col(score_col)).alias("s_u"),
        )
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n",
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
            F.round((F.col("s_u") / F.col("n")) / 1000000.0, 6).alias(
                "avg_score"
            ),
        )
        .orderBy("bin")
    )


def calibration_bins_hist(
    scored: DataFrame,
    score_col: str = "score_u",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table at 100 TB — the scalable sibling of
    `calibration_bins`: instead of an unpartitioned ntile (a global
    sort of every per-doc score onto one task), the corpus collapses
    to the DISTINCT-SCORE histogram in one map-side-combinable groupBy
    (the auc_exact / pr_curve shape), equal-frequency bin boundaries
    come from cumulative counts over that bounded histogram, and the
    per-bin aggregate is a second combinable groupBy over histogram
    rows.

    Bin contract (deliberately histogram-grain, exact in both
    engines): a distinct score whose strictly-smaller-scores
    cumulative count is c lands in bin (c·n_bins) DIV n + 1 — i.e.
    the bin of its FIRST row under the exact ntile order. Ties never
    split across bins (ntile splits them), so bin sizes deviate from
    n/n_bins by at most the largest tie group — the price of removing
    the global sort, stated here and matched exactly by the oracle.
    All arithmetic is integer (DIV, not float division), so both
    engines compute identical bins at any scale.

    Output: (bin, n, n_pos, pos_rate, avg_score) — same schema as
    `calibration_bins`; bins with no score group assigned are absent
    (occupied bins only, like the exact twin)."""
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("bigint")).alias("pos"),
    )
    wb = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    binned = (
        g.withColumn(
            "cb", F.coalesce(F.sum("cnt").over(wb), F.lit(0).cast("bigint"))
        )
        .withColumn("ntot", F.sum("cnt").over(wall))
        .selectExpr(
            "s",
            "cnt",
            "pos",
            f"cast((cb * {n_bins}) div ntot + 1 as int) as bin",
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum(F.col("s").cast("decimal(19,0)") * F.col("cnt"))
            .alias("s_u"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
            F.round(
                (F.col("s_u").cast("double") / F.col("n")) / 1000000.0, 6
            ).alias("avg_score"),
        )
        .orderBy("bin")
    )


def stump_split_finder(
    df: DataFrame,
    features: dict[str, Column],
    y: Column,
    k: int = 5,
) -> DataFrame:
    """Histogram-based decision-stump split finder — the per-node
    primitive of distributed gradient-boosted-tree training (the
    XGBoost "approx"/LightGBM discipline: bin features into integer
    histograms, then every candidate threshold's split statistics come
    from ONE prefix sum over the histogram, never from re-scanning
    rows). ``features`` maps feature name → integer bin expression
    (the caller picks bin widths); ``y`` is a 0/1 label.

    For every (feature, bin) threshold (predicate: bin <= t, the last
    bin excluded — an empty right side is not a split), the split's
    misclassification error err = min(pos_l, neg_l) + min(pos_r,
    neg_r); the output is the top-``k`` candidate splits by
    (err asc, feature asc, bin asc) — (feature, threshold_bin, n_left,
    n_pos_left, err), all BIGINT/exact, so both engines rank
    identically.

    Plan shape: ONE row scan — each row emits its (feature, bin, y)
    triples through a single explode over an inline struct array (a
    per-feature union would re-scan the table once per feature) — then
    ONE map-side-combinable histogram aggregate keyed (feature, bin),
    prefix/total windows PARTITIONED by feature over histogram-sized
    data (thousands of bins, not rows), and a top-k TakeOrdered. Scan
    count invariant in the number of features and thresholds — that
    invariance is why histogram split finding is the 100 TB shape.
    """
    triples = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("feature"),
                    b.cast("bigint").alias("bin"),
                    y.cast("bigint").alias("y"),
                )
                for name, b in features.items()
            ]
        )
    ).alias("t")
    allf = df.select(triples).select("t.feature", "t.bin", "t.y")
    hist = allf.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    wp = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("feature")
    h = (
        hist.withColumn("cum_cnt", F.sum("cnt").over(wp))
        .withColumn("cum_pos", F.sum("pos").over(wp))
        .withColumn("tot_cnt", F.sum("cnt").over(wt))
        .withColumn("tot_pos", F.sum("pos").over(wt))
        .where(F.col("cum_cnt") < F.col("tot_cnt"))
    )
    neg_l = F.col("cum_cnt") - F.col("cum_pos")
    pos_r = F.col("tot_pos") - F.col("cum_pos")
    neg_r = (F.col("tot_cnt") - F.col("cum_cnt")) - pos_r
    err = F.least(F.col("cum_pos"), neg_l) + F.least(pos_r, neg_r)
    return (
        h.select(
            "feature",
            F.col("bin").cast("bigint").alias("threshold_bin"),
            F.col("cum_cnt").cast("bigint").alias("n_left"),
            F.col("cum_pos").cast("bigint").alias("n_pos_left"),
            err.cast("bigint").alias("err"),
        )
        .orderBy("err", "feature", "threshold_bin")
        .limit(k)
    )


def auc_exact(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact tie-aware ROC AUC over ``scored(score, label)`` — the
    classifier-audit statistic next to `calibration_bins` (is the
    ranking any good?) and `pr_curve` (where to cut it). Computed via
    the Mann-Whitney identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with
    AVERAGE ranks on ties, so tied scores contribute exactly 0.5 per
    crossing pair — the textbook-exact value, not a trapezoid
    approximation.

    Exactness discipline: ranks live in DOUBLED integer units
    (rank2 = 2·cum_before + cnt + 1 — twice the average rank of a tie
    group, always an integer), so the whole computation is integer
    sums until the single final division; both engines emit the
    identical rounded double. ``score_col`` must be integer-valued.

    Scale shape: one groupBy collapses the corpus to the DISTINCT
    score table; the cumulative window runs over that bucket table
    (value-histogram-sized, not corpus-sized — same bucket-offset
    discipline as token_budget_select); the final reduce is one row.
    Output: one row (n_pos, n_neg, auc)."""
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("bigint")).alias("pos"),
    )
    wb = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "rank2",
        2 * F.coalesce(F.sum("cnt").over(wb), F.lit(0).cast("bigint"))
        + F.col("cnt")
        + 1,
    )
    # pos*rank2 in DECIMAL(38,0) and a double np*nn denominator: the
    # bigint products silently wrap in non-ANSI Spark once the corpus
    # passes ~2e9 rows (100 TB contract); decimal sums are exact
    agg = ranked.agg(
        F.sum("pos").cast("bigint").alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("nn"),
        F.sum(F.col("pos").cast("decimal(19,0)") * F.col("rank2"))
        .alias("r2"),
    )
    auc = F.when(
        (F.col("np") > 0) & (F.col("nn") > 0),
        (
            F.col("r2").cast("double") / F.lit(2.0)
            - F.col("np").cast("double") * (F.col("np") + 1) / F.lit(2.0)
        )
        / (F.col("np").cast("double") * F.col("nn")),
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
    )


def pr_curve(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Precision/recall/F1 at EVERY distinct score threshold (predict
    positive when score >= t) — the exact PR curve a gate-threshold
    choice reads, not a sampled approximation. Emits one row per
    distinct score, descending, with cumulative-from-the-top tp/fp.

    Scale shape: the corpus collapses to the distinct-score histogram
    in one combinable groupBy; the cumulative window runs over that
    bucket table only. All counts are exact integers; the three ratios
    are single divisions rounded on emission.
    Output: (threshold, tp, fp, fn, precision, recall, f1)."""
    g = scored.groupBy(F.col(score_col).alias("threshold")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("bigint")).alias("pos"),
    )
    wt = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        g.withColumn("tp", F.sum("pos").over(wt))
        .withColumn("fp", F.sum(F.col("cnt") - F.col("pos")).over(wt))
        .withColumn("tot_pos", F.sum("pos").over(wall))
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.when(
        F.col("tot_pos") > 0, F.col("tp") / F.col("tot_pos")
    )
    f1 = F.when(
        (F.col("tp") > 0),
        2 * F.col("tp") / (F.col("tp") + F.col("fp") + F.col("tot_pos")),
    ).otherwise(F.lit(0.0))
    return c.select(
        "threshold",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        (F.col("tot_pos") - F.col("tp")).cast("bigint").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy(F.col("threshold").desc())


def ridge_closed_form(
    df: DataFrame,
    x_col: str,
    y_col: str,
    lam: float = 1.0,
) -> DataFrame:
    """Closed-form ridge regression y ~ b0 + b1·x with the penalty on
    the SLOPE only (the intercept is never shrunk — standard
    practice): solve [[n, sx], [sx, sxx+λ]]·[b0, b1] = [sy, sxy] by
    2×2 Cramer. The linear-trainer sibling of `logreg_newton_step`
    (same five-combinable-sums shape, no iteration at all).

    ``x_col``/``y_col`` must be integer-valued so the five sufficient
    statistics are exact BIGINTs in both engines; the determinant and
    betas are a handful of double ops on the one-row aggregate,
    rounded on emission. A singular design (constant x and λ=0) emits
    NULL betas rather than dividing by zero — the logreg NULL
    contract. Output: one row (n, beta0, beta1, lambda)."""
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(x_col).cast("bigint")).alias("sx"),
        F.sum(F.col(x_col).cast("bigint") * F.col(x_col).cast("bigint")).alias("sxx"),
        F.sum(F.col(y_col).cast("bigint")).alias("sy"),
        F.sum(F.col(x_col).cast("bigint") * F.col(y_col).cast("bigint")).alias("sxy"),
    )
    det = F.col("n") * (F.col("sxx") + F.lit(lam)) - F.col("sx") * F.col("sx")
    b0 = F.when(
        det != 0,
        (F.col("sy") * (F.col("sxx") + F.lit(lam)) - F.col("sx") * F.col("sxy"))
        / det,
    )
    b1 = F.when(
        det != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / det,
    )
    return agg.select(
        "n",
        F.round(b0, 6).alias("beta0"),
        F.round(b1, 6).alias("beta1"),
        F.lit(float(lam)).alias("lambda"),
    )


def cohens_kappa(
    rated: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa between two categorical raters over
    ``rated(a, b)`` — chance-corrected agreement, the standard
    annotation-quality audit (e.g. heuristic language-ID vs the
    labeled lang column: how much better than chance is the
    heuristic?). κ = (p_o − p_e) / (1 − p_e) with p_o = diagonal mass
    and p_e = Σ_c row_c·col_c / n².

    Scale shape: the corpus collapses to the |classes|² confusion
    table in one combinable groupBy; marginals and the expected-
    agreement sum are aggregates over that tiny table. All counts
    exact integers; κ is one division on the one-row result, NULL for
    the degenerate p_e = 1 case (both raters constant).
    Output: one row (n, n_agree, po, pe, kappa)."""
    cm = rated.groupBy(
        F.col(a_col).alias("ra"), F.col(b_col).alias("rb")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ma = cm.groupBy("ra").agg(F.sum("cnt").alias("row_n"))
    mb = cm.groupBy("rb").agg(F.sum("cnt").alias("col_n"))
    # marginal products in DECIMAL(38,0): bigint*bigint silently wraps
    # in non-ANSI Spark once n exceeds ~3e9 rows — relevant at the
    # 100 TB contract; decimal keeps the sum exact (and NULLs, never
    # wraps, past 1e38)
    ex = (
        ma.join(mb, ma.ra == mb.rb)
        .agg(
            F.sum(
                F.col("row_n").cast("decimal(19,0)") * F.col("col_n")
            ).alias("s_e")
        )
    )
    base = cm.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    j = base.crossJoin(F.broadcast(ex))
    po = F.col("n_agree") / F.col("n")
    # double denominator: n*n as bigint wraps at n > ~3e9; the double
    # product is exact for n < 2^26 and within 1 ulp beyond — pe is a
    # 6-dp statistic either way
    pe = F.col("s_e").cast("double") / (
        F.col("n").cast("double") * F.col("n")
    )
    kappa = F.when(pe < 1, (po - pe) / (1 - pe))
    return j.select(
        "n",
        "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def rank_sum_test(
    scored: DataFrame,
    score_col: str,
    group_col: str,
) -> DataFrame:
    """Mann-Whitney U rank-sum test (Wilcoxon two-sample) over
    ``scored(score, group)`` with group ∈ {0, 1} — the NONPARAMETRIC
    A/B readout next to `ab_proportions_ztest` (proportions) and
    `auc_exact` (the same U statistic read as ranking quality): does
    group 1's score distribution stochastically dominate group 0's?
    Uses AVERAGE ranks on ties and the tie-corrected normal
    approximation  σ² = n0·n1/12 · [(n+1) − Σ(t³−t)/(n(n−1))]
    (no continuity correction — documented, matched by the oracle).

    Exactness: ranks in DOUBLED integer units (the auc_exact
    discipline), the tie-correction sum Σ(t³−t) is an exact BIGINT
    over the distinct-score table, and the four inputs to z are all
    integers — one sqrt/division on the one-row result. ``score_col``
    must be integer-valued. Degenerate cases (an empty group, or all
    scores tied so σ = 0) emit NULL z.

    Scale shape: the corpus collapses to the distinct-score histogram
    in one combinable groupBy; everything after runs on that bucket
    table. Output: one row (n0, n1, u1, z)."""
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(group_col).cast("bigint")).alias("c1"),
    )
    wb = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "rank2",
        2 * F.coalesce(F.sum("cnt").over(wb), F.lit(0).cast("bigint"))
        + F.col("cnt")
        + 1,
    )
    # products in DECIMAL(38,0): c1*rank2 wraps bigint at n > ~2e9 and
    # cnt^3 at a tie group > ~2e6 rows in non-ANSI Spark — decimal is
    # exact (and NULLs, never wraps, past 1e38). Divisions below run in
    # double, exact for corpora < 2^53 rows.
    dec = "decimal(19,0)"
    agg = ranked.agg(
        F.sum(F.col("cnt") - F.col("c1")).cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("c1").cast(dec) * F.col("rank2")).alias("r1_2"),
        F.sum(
            F.col("cnt").cast(dec) * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("tie3"),
    )
    n = F.col("n0").cast("double") + F.col("n1")
    u1 = (
        F.col("r1_2").cast("double") / 2.0
        - F.col("n1").cast("double") * (F.col("n1") + 1) / 2.0
    )
    mu = F.col("n0").cast("double") * F.col("n1") / 2.0
    var = (
        F.col("n0").cast("double") * F.col("n1") / 12.0
        * ((n + 1) - F.col("tie3").cast("double") / (n * (n - 1)))
    )
    z = F.when(
        (F.col("n0") > 0) & (F.col("n1") > 0) & (var > 0),
        (u1 - mu) / F.sqrt(var),
    )
    return agg.select(
        "n0",
        "n1",
        F.round(u1, 1).alias("u1"),
        F.round(z, 4).alias("z"),
    )


def gmm_em_step(
    df: DataFrame,
    x_col: str,
    mu0: float,
    mu1: float,
    sigma: float,
    pi1_micro: int = 500000,
) -> DataFrame:
    """One EM step of a two-component equal-variance 1-D Gaussian
    mixture over integer ``x_col`` — the soft-assignment sibling of
    `logreg_newton_step` (supervised) and the k-means step
    (hard assignment): E-step responsibilities via the logistic
    identity r = sigmoid((x−μ0)² − (x−μ1)²)/(2σ²) + ln(π1/π0)),
    M-step updated means/weight from responsibility-weighted sums.

    Exactness discipline: responsibilities are computed ONCE PER
    DISTINCT x (the corpus collapses to the value histogram first) and
    integerized to floor(1e6·r) BEFORE any weighted sum, so the M-step
    runs on exact BIGINTs — partition-order-independent and engine-
    identical up to the accepted bounded-transcendental exposure
    (one exp/ln per distinct value, the q_naive_bayes class).
    Output: one row (n, mu0_new, mu1_new, pi1_new)."""
    import math

    g = df.groupBy(F.col(x_col).alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    xd = F.col("x").cast("double")
    z = (
        ((xd - F.lit(float(mu0))) * (xd - F.lit(float(mu0)))
         - (xd - F.lit(float(mu1))) * (xd - F.lit(float(mu1))))
        / F.lit(2.0 * float(sigma) * float(sigma))
        + F.lit(math.log(pi1_micro / (1_000_000 - pi1_micro)))
    )
    r6 = F.floor(F.lit(1e6) / (F.lit(1.0) + F.exp(-z))).cast("bigint")
    w = g.withColumn("r6", r6)
    agg = w.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("cnt") * F.col("r6")).cast("bigint").alias("sr"),
        F.sum(F.col("cnt") * F.col("r6") * F.col("x"))
        .cast("bigint")
        .alias("srx"),
        F.sum(F.col("cnt") * (1_000_000 - F.col("r6")))
        .cast("bigint")
        .alias("sq"),
        F.sum(F.col("cnt") * (1_000_000 - F.col("r6")) * F.col("x"))
        .cast("bigint")
        .alias("sqx"),
    )
    return agg.select(
        "n",
        F.round(F.col("sqx") / F.col("sq"), 6).alias("mu0_new"),
        F.round(F.col("srx") / F.col("sr"), 6).alias("mu1_new"),
        F.round(F.col("sr") / (F.lit(1e6) * F.col("n")), 6).alias(
            "pi1_new"
        ),
    )


def ks_test(
    scored: DataFrame,
    score_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test over ``scored(score,
    group)`` with group ∈ {0, 1} — the DISTRIBUTION-shape sibling of
    `rank_sum_test` (location) and `ks`-style drift screens: D = max
    over thresholds of |F1(x) − F0(x)|, sensitive to any difference
    (spread, tails, multimodality), the standard train/serve drift and
    split-balance audit.

    Exactness: the corpus collapses to the distinct-score histogram in
    one combinable groupBy (the auc_exact shape); per distinct score
    the CDF gap is the INTEGER cross product |k1·n0 − k0·n1| (computed
    in DECIMAL(38,0) — bigint would wrap past ~3e9 rows), so the max
    is an integer comparison and D = max/(n0·n1) is one division. The
    α = 0.05 decision uses the Smirnov critical value c = 1.358·
    √((n0+n1)/(n0·n1)) compared in SQUARED space — pure +,·,/ on
    exact integers (IEEE correctly-rounded, bit-identical in both
    engines; no sqrt, no transcendentals). Degenerate (an empty group)
    → NULL d and reject.

    Scale shape: histogram groupBy + bounded histogram windows + a
    1-row reduce. Output: one row (n0, n1, d, reject_05) — an EMPTY
    input yields an empty frame (no group to aggregate), stated."""
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(group_col).cast("bigint")).alias("c1"),
    )
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(19,0)"
    cum = (
        g.withColumn("k1", F.sum("c1").over(wc))
        .withColumn("k0", F.sum(F.col("cnt") - F.col("c1")).over(wc))
        .withColumn("n1", F.sum("c1").over(wall))
        .withColumn("n0", F.sum(F.col("cnt") - F.col("c1")).over(wall))
    )
    diff = F.abs(
        F.col("k1").cast(dec) * F.col("n0")
        - F.col("k0").cast(dec) * F.col("n1")
    )
    agg = cum.groupBy("n0", "n1").agg(F.max(diff).alias("md"))
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    mdd = F.col("md").cast("double")
    d = F.when((F.col("n0") > 0) & (F.col("n1") > 0), mdd / (n0d * n1d))
    # reject iff D > 1.358·sqrt((n0+n1)/(n0·n1)), squared:
    # md²·10⁶ > 1358²·(n0+n1)·n0·n1 — same arithmetic tree both engines
    reject = F.when(
        (F.col("n0") > 0) & (F.col("n1") > 0),
        (
            mdd * mdd * F.lit(1000000.0)
            > F.lit(1358.0 * 1358.0) * (n0d + n1d) * n0d * n1d
        ).cast("int"),
    )
    return agg.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(d, 6).alias("d"),
        reject.alias("reject_05"),
    )
