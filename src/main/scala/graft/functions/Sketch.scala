package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic streaming-mergeable sketches — the fixed-size summaries a
  * 100 TB pipeline substitutes for exact state when the answer only needs
  * to be approximately right but the state must stay bounded:
  *
  *  - HyperLogLog (Flajolet et al. 2007): distinct counts from m registers.
  *    The register table IS the shuffle payload — `groupBy(group, bucket)
  *    .agg(max(rho))` partial-aggregates map-side, so the exchange carries
  *    ≤ m rows per group per partition no matter how many raw items flow
  *    through. Registers merge by `max`, so the same plan serves batch,
  *    streaming (max is order- and dedup-insensitive) and cross-cluster
  *    union of pre-sketched partitions.
  *  - Count-Min (Cormode & Muthukrishnan 2005): frequency over-estimates
  *    from a depth × width counter grid. The grid is `depth·width` cells
  *    total — map-side combine collapses any row volume into ≤ that many
  *    partials per partition — and `est(x) = min_j cell[j][h_j(x)]` never
  *    under-counts (each cell only ever adds counts on top of x's own).
  *
  * Everything is integer or single-IEEE-op arithmetic on md5-derived
  * hashes, so the DuckDB oracle reproduces results digit-for-digit:
  * the HLL harmonic sum is computed as Σ 2^(maxRho_scale − M) in BIGINT
  * (each term a power of two — no float accumulation order to disagree on),
  * and only the final `alpha·m²·2^scale / S` touches doubles (one exact
  * scaling multiply + one correctly-rounded divide).
  */
object Sketch {

  /** Bits of the md5-prefix hash ([[Text.md5Prefix60]]). */
  private val HashBits = 60

  /** HyperLogLog distinct-count per group: returns
    * (groups..., n_items, exact_distinct, est_distinct, rel_err).
    *
    * `p` is the register-count exponent (m = 2^p registers per group —
    * 16 at the default p=4, standard error 1.04/√m ≈ 26%; production
    * sizes p=12..16 are the same plan with a wider tiny table). The
    * exact count is computed alongside for the error report — at real
    * scale one would keep ONLY the register path, which is the point:
    * per-group state is m small integers, not a distinct-user set.
    *
    * Raw-range HLL only (no small-range linear-counting branch): the
    * correction needs ln(), whose last-ulp behavior is libm-specific,
    * and the estimator is only used where E > 2.5m holds (enforced by
    * sizing p below the expected cardinality; the bench groups sit at
    * ~150 distinct vs the 2.5·16 = 40 threshold).
    */
  def hllDistinct(df: DataFrame, groups: Seq[String], key: String,
                  p: Int = 4): DataFrame = {
    val regs = hllRegisters(df, groups, key, p)
    val exact = df.groupBy(groups.map(col): _*)
      .agg(countDistinct(col(key)).as("exact_distinct"))
    hllFinalize(regs, groups, exact, p)
  }

  /** The (group, bucket) → (max rho, item count) register table — the
    * sketch itself, and the only state a streaming twin carries. The
    * stage below the groupBy is a stateless projection, so the SAME
    * aggregation runs batch or incremental; registers merge by max/sum
    * regardless of arrival order or duplication of partials. */
  private[graft] def hllRegisters(df: DataFrame, groups: Seq[String],
                                  key: String, p: Int): DataFrame = {
    require(p >= 2 && p <= 16, s"p=$p out of range")
    val m = 1 << p
    val maxRho = HashBits - p + 1     // rho when the hash suffix is all zeros
    val g = groups.map(col)
    val h = Text.md5Prefix60(col(key).cast("string"))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(maxRho))
      .otherwise(lit(maxRho) - length(bin(w)))
    df.select(g :+ pmod(h, lit(m.toLong)).as("__bucket") :+ rho.as("__rho"): _*)
      .groupBy(g :+ col("__bucket"): _*)
      .agg(max(col("__rho")).as("__m"), count(lit(1)).as("__n"))
  }

  /** Estimate from a register table (+ an exact-count side table for
    * the error report): harmonic sum in exact BIGINT powers of two,
    * then ONE exact double multiply + one correctly-rounded divide. */
  private[graft] def hllFinalize(regs: DataFrame, groups: Seq[String],
                                 exact: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val maxRho = HashBits - p + 1
    // 2^maxRho scaling keeps the harmonic sum in exact BIGINT arithmetic
    val scalePow = math.pow(2.0, maxRho)           // ≤ 2^57, exact double
    val alphaNum = 0.673 * m * m * scalePow        // exact: 0.673·2^(2p+maxRho)
    val g = groups.map(col)
    val sums = regs.groupBy(g: _*).agg(
      sum(col("__n")).as("n_items"),
      // Σ 2^(maxRho − M) over present buckets + 2^maxRho per empty bucket,
      // all in BIGINT (each term a power of two ≤ 2^maxRho; m·2^maxRho < 2^63)
      (sum(pow(lit(2.0), lit(maxRho) - col("__m")).cast("long")) +
        (lit(m.toLong) - count(lit(1))) * lit(scalePow.toLong)).as("__s"))
    val estRaw = lit(alphaNum) / col("__s").cast("double")
    sums.join(exact, groups)
      .select(g ++ Seq(
        col("n_items"),
        col("exact_distinct"),
        round(estRaw, 6).as("est_distinct"),
        round(estRaw / col("exact_distinct").cast("double") - 1.0, 6)
          .as("rel_err")): _*)
  }

  /** Count-Min heavy hitters: top `k` keys by CMS-estimated frequency
    * (ties → smaller key), with the exact count alongside. Returns
    * (key, est, exact); `est >= exact` always (CMS never under-counts).
    *
    * The grid build is the scale path: explode ×depth, then a two-key
    * groupBy that map-side-combines into ≤ depth·width partials per
    * partition — the raw row count never reaches the exchange. The
    * estimate probe joins the (tiny, broadcast) grid per candidate key.
    */
  def cmsTopK(df: DataFrame, key: String, depth: Int = 4, width: Int = 64,
              k: Int = 10): DataFrame = {
    val grid = cmsGrid(df, key, depth, width)
    val cand = df.groupBy(col(key)).agg(count(lit(1)).as("exact"))
    cmsFinalize(grid, cand, key, depth, width, k)
  }

  private def cellOf(width: Int)(j: Column, x: Column): Column =
    pmod(Text.md5Prefix60(concat(lit("cms"), j.cast("string"), lit(":"),
      x.cast("string"))), lit(width.toLong))

  /** The depth × width counter grid — the sketch itself. Counters
    * merge by SUM (order-insensitive, partial-friendly), so the same
    * aggregation runs batch or as incremental streaming state. */
  private[graft] def cmsGrid(df: DataFrame, key: String,
                             depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    df.select(col(key), explode(sequence(lit(0), lit(depth - 1))).as("__j"))
      .groupBy(col("__j"), cellOf(width)(col("__j"), col(key)).as("__cell"))
      .agg(count(lit(1)).as("__c"))
  }

  /** Top-k estimate report from a (possibly drained-from-a-stream)
    * grid + a candidate table carrying (key, exact). */
  private[graft] def cmsFinalize(grid: DataFrame, cand: DataFrame, key: String,
                                 depth: Int, width: Int, k: Int): DataFrame = {
    val ks = col(key)
    // probe: each candidate key reads its depth cells, takes the min
    val probe = cand
      .select(ks, col("exact"), explode(sequence(lit(0), lit(depth - 1))).as("__pj"))
      .withColumn("__pcell", cellOf(width)(col("__pj"), ks))
    probe
      .join(broadcast(grid),
        probe("__pj") === grid("__j") && probe("__pcell") === grid("__cell"))
      .groupBy(ks, col("exact"))
      .agg(min(col("__c")).as("est"))
      .orderBy(col("est").desc, ks)
      .limit(k)
      .select(ks, col("est"), col("exact"))
  }
}
