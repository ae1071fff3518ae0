package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantics checks for every SparkEntry query on sf0.001. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.util.GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  test("every declared query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has matching oracle columns sorted consistently") {
    // each oracleSql key must exist in queries
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("changelog op/image semantics") {
    val cl = cdc.ChangeEvents.changelog(spark, dir).cache()
    import org.apache.spark.sql.functions._
    assert(cl.filter(col("op") === "I" && col("before_value").isNotNull).count() == 0)
    assert(cl.filter(col("op") === "D" && col("after_value").isNotNull).count() == 0)
    assert(cl.filter(col("op") === "U")
      .filter(col("before_value").isNull || col("after_value").isNull).count() == 0)
    // commit_ts unique
    assert(cl.select("commit_ts").distinct().count() == cl.count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
