package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.temporal.{Temporal, TemporalVault}

/** Integration: ingest the synthetic events table into a TemporalVault
  * and check that the durable store's time-travel read reproduces the
  * direct AS-OF over the raw table — the t1_asof_snapshot semantics
  * through the full write path (partitioned log, _op filtering). */
class VaultEventsIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("vault.query(T) over ingested events == direct AS-OF on the table") {
    val dir = java.nio.file.Files.createTempDirectory("vault_ev").toString
    val v = new TemporalVault(spark, dir, key = "user_id", ts = "ts", tie = "event_id")

    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value")
    v.append(ev)

    val t = "2024-01-20 00:00:00"
    val got = v.query(t)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val want = Temporal.asOf(ev, "user_id", "ts", "event_id",
        lit(t).cast("timestamp"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)

    // snapshot fast path agrees too
    v.writeSnapshot("2024-01-10 00:00:00")
    val viaSnap = v.query(t)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(viaSnap == want)
  }
}
