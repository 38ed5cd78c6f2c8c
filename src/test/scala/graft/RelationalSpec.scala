package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural sanity for every declared query: runs at sf0.001,
  * asserts non-empty results and that queries/oracleSql stay in sync.
  * (Value-level parity is the driver's DuckDB gate + selfcheck.py.)
  */
class RelationalSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("entry() returns rows") {
    // entry() calls Engine.configure, which flips AQE on — restore the
    // suite's plan-shape posture (TestSpark sets AQE off) afterwards,
    // or every plan assertion in a later-running suite silently runs
    // under AQE (observed: empty-relation propagation erasing nodes)
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try assert(SparkEntry.entry(spark).count() > 0)
    finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
