package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.cdc.ChangeEvents
import graft.queries.Analytics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-series: CDC core
    "cdc_changelog_build" -> ((s, d) => ChangeEvents.changelog(s, d)),
    // B-series: analytics
    "q1_agg" -> ((s, d) => Analytics.q1Agg(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "cdc_changelog_build" -> ChangeEvents.changelogSql,
    "q1_agg" -> Analytics.q1AggSql,
  )
}
