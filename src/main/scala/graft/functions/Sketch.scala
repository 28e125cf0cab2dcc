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
        // NULL, not 0/0 NaN, when a cohort is empty (only s8's
        // zz_union row on empty input can get here with exact = 0)
        when(col("exact_distinct") > 0,
          round(estRaw / col("exact_distinct").cast("double") - 1.0, 6))
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

  // Kirsch–Mitzenmacher double hashing (2006): all `depth` row hashes
  // derive from ONE md5 — h_j = (h mod 2^30) + j·(h div 2^30) mod w —
  // preserving CMS guarantees while the map-side stage pays one hash
  // per input row instead of `depth` (measured 8x-events probe: the
  // 4-md5 grid build was the whole supra-linear term)
  private def rowHash(x: Column): Column =
    Text.md5Prefix60(concat(lit("cms:"), x.cast("string")))
  private def cellOf(width: Int)(j: Column, h: Column): Column =
    pmod(pmod(h, lit(1L << 30)) + j.cast("long") * shiftright(h, 30),
      lit(width.toLong))

  /** The depth × width counter grid — the sketch itself. Counters
    * merge by SUM (order-insensitive, partial-friendly), so the same
    * aggregation runs batch or as incremental streaming state. */
  private[graft] def cmsGrid(df: DataFrame, key: String,
                             depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    df.select(col(key), rowHash(col(key)).as("__h"))
      .select(col("__h"), explode(sequence(lit(0), lit(depth - 1))).as("__j"))
      .groupBy(col("__j"), cellOf(width)(col("__j"), col("__h")).as("__cell"))
      .agg(count(lit(1)).as("__c"))
  }

  /** 2^60 as an exact double (the hash-space size for θ normalization). */
  private val HashSpace = math.pow(2.0, 60)
  private val HashSpaceL = 1L << 60

  /** KMV / theta bottom-k distinct sketch with SET OPERATIONS
    * (Beyer et al. 2007; Dasgupta et al. 2016 theta sketches): per
    * cohort keep the k smallest distinct 60-bit hashes; θ = the k-th
    * smallest, est = |{h < θ}| · 2^60 / θ. Union and intersection
    * estimates come from the SAMPLES ALONE — θ_AB = min(θ_A, θ_B),
    * retained = qualifying sample hashes below it — which is the whole
    * point at 100 TB: cohort sketches are built once (k longs each) and
    * any set algebra over cohorts happens on the tiny sketch table, no
    * second corpus pass. The exact counts computed alongside are the
    * error report, as in [[hllDistinct]].
    *
    * Plan shape: one map-side-deduping groupBy(cohort, hash) exchange
    * (the countDistinct shape), then a bounded CollectMinK per cohort —
    * every buffer holds ≤ k longs regardless of cohort size. All
    * arithmetic is integer until the final est division (one exact
    * double multiply + one correctly-rounded divide, oracle-stable).
    * Returns (cohort, est_distinct, exact_distinct, rel_err). */
  def kmvSetOps(df: DataFrame, group: String, key: Column,
                aVal: String, bVal: String, k: Int = 128): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val gh = df.filter(col(group).isin(aVal, bVal))
      .select(col(group).as("g"), Text.md5Prefix60(key).as("h"))
      .groupBy(col("g"), col("h")).agg(count(lit(1)).as("__dup"))
    val sk = gh.groupBy(col("g")).agg(
      graft.dedup.Dedup.collectMinK(col("h"), k).as("hs"),
      count(lit(1)).as("exact"))
    val a = sk.filter(col("g") === aVal)
      .select(col("hs").as("ha"), col("exact").as("ea"))
    val b = sk.filter(col("g") === bVal)
      .select(col("hs").as("hb"), col("exact").as("eb"))
    // exact union/intersection cardinalities (error report only)
    val ex = gh.groupBy(col("h")).agg(count(lit(1)).as("ng"))
      .agg(count(lit(1)).as("exact_u"),
        sum(when(col("ng") === 2, 1L).otherwise(0L)).as("exact_i"))
    val one = a.crossJoin(broadcast(b)).crossJoin(broadcast(ex))

    def theta(arr: Column): Column =
      when(size(arr) >= k, element_at(arr, k)).otherwise(lit(HashSpaceL))
    // est = |{h ∈ sample : h < θ}| · 2^60 / θ — one formula for full
    // (retained = k−1) and unsaturated (θ = 2^60, est = exact) sketches
    def est(retained: Column, th: Column): Column =
      retained.cast("double") * lit(HashSpace) / th.cast("double")
    def below(arr: Column, th: Column): Column =
      size(filter(arr, h => h < th))

    val thA = theta(col("ha"))
    val thB = theta(col("hb"))
    val merged = array_sort(array_union(col("ha"), col("hb")))
    val thU = least(thA, thB,
      when(size(merged) >= k, element_at(merged, k)).otherwise(lit(HashSpaceL)))
    val thI = least(thA, thB)
    val common = array_intersect(col("ha"), col("hb"))
    val rows = one.select(explode(array(
      struct(lit(s"1_$aVal").as("cohort"),
        est(below(col("ha"), thA), thA).as("est"), col("ea").as("exact")),
      struct(lit(s"2_$bVal").as("cohort"),
        est(below(col("hb"), thB), thB).as("est"), col("eb").as("exact")),
      struct(lit("3_union").as("cohort"),
        est(below(merged, thU), thU).as("est"),
        col("exact_u").as("exact")),
      struct(lit("4_intersect").as("cohort"),
        est(below(common, thI), thI).as("est"),
        col("exact_i").cast("long").as("exact"))
    )).as("r"))
    rows.select(col("r.cohort").as("cohort"),
        round(col("r.est"), 6).as("est_distinct"),
        col("r.exact").as("exact_distinct"),
        round(col("r.est") / col("r.exact").cast("double") - 1.0, 6)
          .as("rel_err"))
      .orderBy("cohort")
  }

  /** The KMV sketch TABLE — (groups..., ascending ≤k distinct hashes);
    * built by the native bounded [[expressions.CollectMinKDistinct]]
    * aggregate in ONE aggregation (every buffer ≤ k longs; merge =
    * set-union-then-truncate, order/dup-insensitive), so the same plan
    * runs batch or as streaming state of k longs per group. */
  private[graft] def kmvSketch(df: DataFrame, groups: Seq[String],
                               key: Column, k: Int): DataFrame =
    df.select(groups.map(col) :+
        Text.md5Prefix60(key.cast("string")).as("__h"): _*)
      .groupBy(groups.map(col): _*)
      .agg(collectMinKDistinct(col("__h"), k).as("hs"))

  private[graft] def collectMinKDistinct(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      expressions.CollectMinKDistinct(ColumnBridge.expression(c), k)
        .toAggregateExpression())
  }

  /** Estimate report from a (possibly drained-from-a-stream) KMV
    * sketch table + an exact-count side table for the error columns:
    * θ = k-th smallest (or 2^60 unsaturated), est = |{h<θ}|·2^60/θ. */
  private[graft] def kmvFinalize(sk: DataFrame, groups: Seq[String],
                                 exact: DataFrame, k: Int): DataFrame = {
    val th = when(size(col("hs")) >= k, element_at(col("hs"), k))
      .otherwise(lit(HashSpaceL))
    val estRaw = size(filter(col("hs"), h => h < th)).cast("double") *
      lit(HashSpace) / th.cast("double")
    sk.join(exact, groups)
      .select(groups.map(col) ++ Seq(
        round(estRaw, 6).as("est_distinct"),
        col("exact_distinct"),
        round(estRaw / col("exact_distinct").cast("double") - 1.0, 6)
          .as("rel_err")): _*)
  }

  /** Cross-shard HLL UNION merge (s8 — [[hllDistinct]]'s registers as
    * a mergeable first-class op, completing the merge trio with s6's
    * histograms and s7's KMV samples): every shard publishes its m
    * registers, and the GLOBAL distinct estimate reads the max-merged
    * register table alone — max is associative/commutative/
    * dup-insensitive, so the merged registers are IDENTICAL to the
    * flat single-stream build under any merge tree (the property the
    * spec pins). Per-shard state is m small integers; shards×m
    * registers cross the merge, never values. Exact counts alongside
    * as the error report. Returns one row per shard plus a trailing
    * 'zz_union' row: (cohort, n_items, exact_distinct, est_distinct,
    * rel_err) — s1's report shape. */
  def hllMergedDistinct(df: DataFrame, shard: String, key: Column,
                        p: Int = 4): DataFrame = {
    val withK = df.select(col(shard).as("g"), key.as("__kk"))
    // materialized once: the register build feeds both the per-shard
    // reports and the merge (shards×m rows — tiny)
    val regs = hllRegisters(withK, Seq("g"), "__kk", p).localCheckpoint()
    val exact = withK.groupBy(col("g"))
      .agg(countDistinct(col("__kk")).as("exact_distinct"))
    val per = hllFinalize(regs, Seq("g"), exact, p)
    val mregs = regs.groupBy(col("__bucket"))
      .agg(max(col("__m")).as("__m"), sum(col("__n")).as("__n"))
      .withColumn("g", lit("zz_union"))
    val exactU = withK.agg(countDistinct(col("__kk")).as("exact_distinct"))
      .withColumn("g", lit("zz_union"))
    val uni = hllFinalize(mregs, Seq("g"), exactU, p)
    per.unionByName(uni)
      .withColumnRenamed("g", "cohort")
      .orderBy("cohort")
  }

  /** Cross-shard KMV UNION merge (s7 — [[kmvSetOps]]'s sketch as a
    * mergeable first-class op, the s6 pattern applied to distinct
    * counting): every shard publishes its bottom-k sketch, and the
    * GLOBAL distinct estimate is computed from the shard sketches
    * alone — merged sample = the distinct union of shard samples,
    * θ_U = min(every shard θ, k-th smallest of the merged sample),
    * est = |{h ∈ merged : h < θ_U}|·2^60/θ_U. That is the whole point
    * at 100 TB: per-shard state is k longs, the merge exchange is
    * shards×k longs (set-union-then-truncate — associative,
    * commutative, dup-insensitive, so any merge tree is identical;
    * the same property ts29's streaming state relies on), and no
    * value-level second pass ever crosses a shard boundary. The exact
    * counts computed alongside are the error report, as everywhere in
    * this family. Returns one row per shard plus a trailing
    * 'zz_union' row: (cohort, est_distinct, exact_distinct, rel_err). */
  def kmvMergedDistinct(df: DataFrame, shard: String, key: Column,
                        k: Int = 128): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val withK = df.select(col(shard).as("g"),
      Text.md5Prefix60(key.cast("string")).as("h"))
    // one map-side-deduping exchange feeds both the sketch and the
    // exact report (distinct 60-bit hashes == distinct keys up to
    // hash collisions, the convention the s3 oracle shares)
    val gh = withK.groupBy(col("g"), col("h")).agg(count(lit(1)).as("__dup"))
    val sk = gh.groupBy(col("g")).agg(
      graft.dedup.Dedup.collectMinK(col("h"), k).as("hs"),
      count(lit(1)).as("exact_distinct"))
    def theta(arr: Column): Column =
      when(size(arr) >= k, element_at(arr, k)).otherwise(lit(HashSpaceL))
    def est(retained: Column, th: Column): Column =
      retained.cast("double") * lit(HashSpace) / th.cast("double")
    val thG = theta(col("hs"))
    val per = sk.select(col("g").as("cohort"),
      est(size(filter(col("hs"), h => h < thG)), thG).as("__est"),
      col("exact_distinct"))
    // the merge: shards×k longs into one row — never the raw values
    val merged0 = array_sort(array_distinct(flatten(col("__all"))))
    val u = sk.agg(min(thG).as("__thmin"),
        collect_list(col("hs")).as("__all"))
      .select(col("__thmin"), merged0.as("__m"))
    val thU = least(col("__thmin"), theta(col("__m")))
    val exactU = gh.groupBy(col("h")).agg(count(lit(1)).as("__ng"))
      .agg(count(lit(1)).as("exact_distinct"))
    val uRow = u.crossJoin(exactU)
      .select(lit("zz_union").as("cohort"),
        est(size(filter(col("__m"), h => h < thU)), thU).as("__est"),
        col("exact_distinct"))
    per.unionByName(uRow)
      .select(col("cohort"),
        round(col("__est"), 6).as("est_distinct"),
        col("exact_distinct"),
        // NULL, not 0/0 NaN, for the zz_union row on empty input
        when(col("exact_distinct") > 0,
          round(col("__est") / col("exact_distinct").cast("double") - 1.0, 6))
          .as("rel_err"))
      .orderBy("cohort")
  }

  /** Bloom-filter decontamination (Bloom 1970) — the sketch-accelerated
    * form of x8's eval-set check: benchmark-doc shingles set `hashes`
    * bits in an m-bit filter; a corpus doc is flagged when ≥ `minShared`
    * of its distinct shingles are bloom-POSITIVE (all their bits set).
    * Per shingle there are no false negatives, so every exactly-flagged
    * doc is bloom-flagged (spec-pinned); phantom shingles inflate only
    * the false-positive column the report makes visible per source.
    * The 100 TB story: x8 broadcasts the full bench shingle SET, which
    * scales with the benchmark; the Bloom filter is CONSTANT-size — m
    * bits however large the corpus side grows, and real eval suites are
    * fixed-size, so m is sized ONCE (keep hashes·|bench shingles| below
    * ~0.3·m for a per-shingle FPR under ~1e-3; the default 2^20 bits =
    * 128 KiB of broadcast carries a ~80k-shingle benchmark).
    * Returns (source, n_docs, bloom_flagged, exact_flagged, false_pos). */
  def bloomDecontaminate(df: DataFrame, id: String, textCol: String,
                         source: String, benchPred: Column, n: Int = 3,
                         minShared: Int = 3, m: Int = 1 << 20,
                         hashes: Int = 4,
                         postings: Option[DataFrame] = None): DataFrame = {
    require(hashes >= 1 && m >= 2, s"bad bloom shape $m/$hashes")
    // (id, shingle) — the SHARED per-corpus postings table when the
    // caller has one (ClusterCache.postings serves d4/x16/x8/s4 from
    // one shingle+md5 build); the bench flag is a pure function of the
    // id column, so no doc-metadata join happens at token level —
    // `source` attaches doc-level, after the per-doc flags are known
    val sh = postings.map(_.select(col(id), col("shingle")))
      .getOrElse(df
        .select(col(id), explode(Text.shingles(col(textCol), n)).as("__s"))
        .select(col(id), Text.md5Prefix60(col("__s")).as("shingle")))
      .withColumn("__bench", benchPred)
    val bench = sh.filter(col("__bench")).select("shingle").distinct()
    val corpus = sh.filter(!col("__bench"))
    def posArr(sg: Column): Column = array((0 until hashes).map(j =>
      pmod(Text.md5Prefix60(concat(lit("bloom"), lit(j.toString), lit(":"),
        sg.cast("string"))), lit(m.toLong))): _*)
    val bits = bench.select(explode(posArr(col("shingle"))).as("pos")).distinct()
    val bloomDocs = corpus
      .select(col(id), col("shingle"), explode(posArr(col("shingle"))).as("pos"))
      .join(broadcast(bits), Seq("pos"))
      .groupBy(col(id), col("shingle")).agg(count(lit(1)).as("__nb"))
      .filter(col("__nb") === hashes)
      .groupBy(col(id)).agg(count(lit(1)).as("__ns"))
      .filter(col("__ns") >= minShared)
      .select(col(id))
    val exactDocs = corpus
      .join(bench, Seq("shingle"), "left_semi")
      .groupBy(col(id)).agg(count(lit(1)).as("__ns"))
      .filter(col("__ns") >= minShared)
      .select(col(id))
    val meta = df.filter(!benchPred).select(col(id), col(source))
    def flagCount(docs: DataFrame, name: String): DataFrame =
      meta.join(docs, Seq(id), "left_semi")
        .groupBy(col(source)).agg(count(lit(1)).as(name))
    meta.groupBy(col(source)).agg(count(lit(1)).as("n_docs"))
      .join(flagCount(bloomDocs, "bloom_flagged"), Seq(source), "left")
      .join(flagCount(exactDocs, "exact_flagged"), Seq(source), "left")
      .na.fill(0L, Seq("bloom_flagged", "exact_flagged"))
      .select(col(source), col("n_docs"), col("bloom_flagged"),
        col("exact_flagged"),
        (col("bloom_flagged") - col("exact_flagged")).as("false_pos"))
      .orderBy(source)
  }

  /** Fixed-width histogram quantiles — the bounded-state stand-in for
    * exact per-group percentiles (ts9's sort is a full shuffle of the
    * value column; the histogram is `groups × buckets` counters that
    * map-side-combine at any row volume, the shape of every production
    * quantile sketch). Two passes: a scalar global min/max, then the
    * bucket-count aggregation; the estimate is the upper edge of the
    * first bucket whose cumulative count reaches ceil(q·n). All bucket
    * arithmetic is the same 3 IEEE ops in both engines; exact
    * percentiles are computed alongside as the error report.
    * Returns (group, n, p{50,90,99}_est, p{50,90,99}_exact). */
  def histQuantiles(df: DataFrame, group: String, value: String,
                    buckets: Int = 256,
                    exactLegs: Option[DataFrame] = None): DataFrame = {
    val v = col(value)
    val mm = df.agg(min(v).as("gmin"), max(v).as("gmax"))
    val bucket = when(col("gmax") === col("gmin"), lit(0)).otherwise(
      least(floor((v - col("gmin")) / (col("gmax") - col("gmin")) * buckets),
        lit(buckets - 1))).cast("int")
    val counts = df.crossJoin(broadcast(mm))
      .groupBy(col(group), bucket.as("__b"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("__b"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(group))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
    def qBucket(q: Double): Column =
      min(when(col("__cum") >= ceil(lit(q) * col("__n")), col("__b")))
    val sel = cum.groupBy(col(group)).agg(
      max(col("__n")).as("n"),
      qBucket(0.5).as("__b50"), qBucket(0.9).as("__b90"),
      qBucket(0.99).as("__b99"))
    def estOf(b: Column): Column = round(col("gmin") +
      (b + 1).cast("double") * (col("gmax") - col("gmin")) / lit(buckets.toDouble), 6)
    // exact error-report legs via the bounded cutoff-selection
    // construction (TimeSeries.exactQuantiles) — never the built-in
    // `percentile` aggregate's all-values-per-group buffer. A caller
    // holding the selection already (QuantileCache's suite-shared
    // memo) passes it in as (group, p50_exact, p90_exact, p99_exact)
    // and skips the three selection actions.
    val exact = exactLegs.getOrElse(graft.operators.TimeSeries
      .exactQuantiles(df, group, value, Seq(0.5, 0.9, 0.99))
      .select(col(group),
        round(col("__q0"), 6).as("p50_exact"),
        round(col("__q1"), 6).as("p90_exact"),
        round(col("__q2"), 6).as("p99_exact")))
    sel.crossJoin(broadcast(mm)).join(exact, Seq(group))
      .select(col(group), col("n"),
        estOf(col("__b50")).as("p50_est"), col("p50_exact"),
        estOf(col("__b90")).as("p90_est"), col("p90_exact"),
        estOf(col("__b99")).as("p99_est"), col("p99_exact"))
      .orderBy(group)
  }

  /** Per-SHARD fixed-range histogram sketches — the distributable half
    * of [[histMergedQuantiles]]: one (shard, bucket, count) row set per
    * shard over a SHARED global [gmin, gmax] range (`mm` must carry
    * gmin/gmax; min/max are themselves associative, so at lake scale
    * the range comes from per-shard min/max merged the same way). The
    * sketch is the constant-size state each shard ships: buckets
    * counters, mergeable by plain addition. */
  def histShardSketches(df: DataFrame, shard: String, value: String,
                        mm: DataFrame, buckets: Int): DataFrame = {
    val v = col(value)
    val bucket = when(col("gmax") === col("gmin"), lit(0)).otherwise(
      least(floor((v - col("gmin")) / (col("gmax") - col("gmin")) * buckets),
        lit(buckets - 1))).cast("int")
    df.crossJoin(broadcast(mm))
      .groupBy(col(shard), bucket.as("__b"))
      .agg(count(lit(1)).as("__c"))
  }

  /** Cross-shard histogram-sketch MERGE + global quantile estimates —
    * [[histQuantiles]] reframed as the two-phase op a sharded lake
    * actually runs: each shard publishes its [[histShardSketches]] row
    * set, the merge is ONE bucket-keyed sum (associative and
    * commutative — any merge tree gives the same histogram, the
    * property the spec pins against the flat single-pass build), and
    * the global p50/p90/p99 estimates read the ≤ `buckets`-row merged
    * table. Nothing value-sized ever crosses a shard boundary: the
    * exchange is shards × buckets counter rows. Returns ONE row
    * (n, n_shards, p50_est, p90_est, p99_est). */
  def histMergedQuantiles(df: DataFrame, shard: String, value: String,
                          buckets: Int = 256): DataFrame = {
    val mm = df.agg(min(col(value)).as("gmin"), max(col(value)).as("gmax"))
    val sketches = histShardSketches(df, shard, value, mm, buckets)
    val merged = sketches.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__c"))
    val w = graft.util.BoundedWindows.globalOrdered(
        s"<= $buckets merged histogram rows", col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // ≤ buckets rows: the single-partition windows are bounded by
    // construction (the rankSuite adversary cannot arise); __n as a
    // global window rather than a scalar-agg crossJoin, which
    // re-planned merged → sketches → the input scan a second time
    val wAll = graft.util.BoundedWindows.globalAgg(
      s"<= $buckets merged histogram rows")
    val cum = merged.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
    def qBucket(q: Double): Column =
      min(when(col("__cum") >= ceil(lit(q) * col("__n")), col("__b")))
    def estOf(b: Column): Column = round(col("gmin") +
      (b + 1).cast("double") * (col("gmax") - col("gmin")) / lit(buckets.toDouble), 6)
    val nShards = sketches.select(col(shard)).distinct()
      .agg(count(lit(1)).as("n_shards"))
    cum.agg(max(col("__n")).as("n"),
        qBucket(0.5).as("__b50"), qBucket(0.9).as("__b90"),
        qBucket(0.99).as("__b99"))
      .crossJoin(broadcast(mm)).crossJoin(broadcast(nShards))
      .select(col("n"), col("n_shards"),
        estOf(col("__b50")).as("p50_est"),
        estOf(col("__b90")).as("p90_est"),
        estOf(col("__b99")).as("p99_est"))
  }

  /** Top-k estimate report from a (possibly drained-from-a-stream)
    * grid + a candidate table carrying (key, exact). */
  private[graft] def cmsFinalize(grid: DataFrame, cand: DataFrame, key: String,
                                 depth: Int, width: Int, k: Int): DataFrame = {
    val ks = col(key)
    // probe: each candidate key reads its depth cells, takes the min
    val probe = cand
      .select(ks, col("exact"), rowHash(ks).as("__ph"))
      .select(ks, col("exact"), col("__ph"),
        explode(sequence(lit(0), lit(depth - 1))).as("__pj"))
      .withColumn("__pcell", cellOf(width)(col("__pj"), col("__ph")))
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
