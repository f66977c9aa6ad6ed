package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst predicate pushdown /
  * column pruning reach the file source — callers filter/select on the
  * returned DataFrame and the scan narrows automatically.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read it as raw nanos and floor-truncate to micros
    * — exactly what DuckDB does when it reads the same file, so oracle
    * comparisons stay value-identical. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build time
    * ([[GraftSession]] / Verify / Bench), NOT mutated here: flipping shared
    * session conf inside a getter is racy against already-planned scans.
    */
  def events: DataFrame =
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
