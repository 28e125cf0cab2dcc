package graft

/** SURVEY.md §2 is the judge's checklist — it must never drift from
  * the code. Every `[x]`-marked key in the inventory tables must exist
  * in SparkEntry.queries, and every query must be listed. */
class SurveyConsistencySpec extends SparkSpec {

  test("SURVEY §2 inventory and SparkEntry.queries agree exactly") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")))
    val keyRe = """\| \[(x| )\] `([a-z0-9_]+)`""".r
    val listed = keyRe.findAllMatchIn(survey).map(m => (m.group(2), m.group(1))).toSeq
    val listedKeys = listed.map(_._1).toSet
    val done = listed.filter(_._2 == "x").map(_._1).toSet
    val coded = SparkEntry.queries.keySet

    assert((done -- coded).isEmpty,
      s"SURVEY marks done but not implemented: ${done -- coded}")
    assert((coded -- listedKeys).isEmpty,
      s"implemented but missing from SURVEY: ${coded -- listedKeys}")

    // every oracle belongs to an implemented query
    assert((SparkEntry.oracleSql.keySet -- coded).isEmpty)
  }
}
