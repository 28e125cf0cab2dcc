package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.dedup.Dedup
import graft.operators.TimeSeries
import graft.sources.Tables
import graft.temporal.Temporal

class Round2Spec extends SparkSpec {
  import spark.implicits._

  test("snapshot+delta reconstruction equals direct AS-OF") {
    val ev = Tables.events(spark, sfDir)
    val at = lit("2024-01-20 00:00:00").cast("timestamp")
    val snapAt = lit("2024-01-15 00:00:00").cast("timestamp")
    val direct = Temporal.asOf(ev, "user_id", "ts", "event_id", at)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val recon = Temporal.snapshotReconstruct(ev, "user_id", "ts", "event_id", snapAt, at)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(recon == direct && recon.nonEmpty)
  }

  test("gap fill produces a dense day grid with zero-filled gaps") {
    val got = TimeSeries.gapFillDaily(Tables.events(spark, sfDir),
      "event_type", "ts", "value")
    val types = got.select("event_type").distinct().count()
    val days = got.select("day").distinct().count()
    assert(got.count() == types * days) // dense grid
    assert(got.filter($"n" === 0 && $"sum_value" =!= 0.0).count() == 0)
  }

  test("approx distinct (HLL) is within 5% of exact") {
    val ev = Tables.events(spark, sfDir)
    val (exact, approx) = ev.agg(
      countDistinct($"user_id"), approx_count_distinct($"user_id", 0.01))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }

  test("LSH ANN recall@10 vs brute force is useful (> 0.3)") {
    val emb = Tables.embeddings(spark, sfDir)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Ann.knnBrute(emb, "vec_id", "embedding", qs, 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Ann.knnLsh(emb, "vec_id", "embedding", qs, 10, 8, 3, 42L)
      .select("query_id", "nn_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = qs.map { q =>
      val b = brute(q)
      (b intersect lsh.getOrElse(q, Set.empty)).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.3, s"mean recall@10 = $mean")
  }

  test("simhash: clones collide at hamming 0, fingerprints are 32-bit") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    val fp = Dedup.simhashFingerprints(docs, "doc_id", "text", 8)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp.values.forall(v => v >= 0 && v < (1L << 32)))
    val pairs = Dedup.simhashHammingPairs(docs, "doc_id", "text", 8, 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("frame sampling is deterministic and stride-bounded") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val a = graft.multimodal.Binary.frameSample(docs, "doc_id", "text", 7)
      .select("doc_id", "frame_sum").as[(Long, Long)].collect().toMap
    val b = graft.multimodal.Binary.frameSample(docs, "doc_id", "text", 7)
      .select("doc_id", "frame_sum").as[(Long, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("streaming tumbling agg equals the batch operator") {
    val stream = graft.streaming.Streams.tumblingDailyStream(spark, sfDir)
      .select("event_type", "day", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = TimeSeries.tumblingDaily(Tables.events(spark, sfDir),
        "event_type", "ts", "value")
      .select("event_type", "day", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(stream == batch && stream.nonEmpty)
  }
}
