package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst predicate pushdown /
  * column pruning reach the file source — callers filter/select on the
  * returned DataFrame and the scan narrows automatically.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Schema inference (footer read) costs a tiny Spark job per
  // spark.read.parquet call — ~20-60 ms of fixed latency EVERY query
  // invocation pays before any data moves. The driver's testdata is
  // immutable for a process lifetime, so infer each table's schema once
  // per path and pass it explicitly thereafter (the production analogue
  // is a catalog-supplied schema). Metadata only — scans, pushdown and
  // pruning are unchanged.
  private def t(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = Tables.schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet's `ts` encoding has varied across driver testdata
    * generations — TIMESTAMP(NANOS) (arrives as raw nanos `bigint` under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build time)
    * or plain TIMESTAMP(MICROS) (arrives as `timestamp_ntz`). Normalize both
    * to micro-precision session-TZ `timestamp` — exactly the value DuckDB
    * sees for the same file, so oracle comparisons stay value-identical.
    */
  def events: DataFrame = Tables.normalizeTs(t("events"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** Once-per-path inferred schemas of the immutable driver testdata. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Schema-adaptive `ts` normalization (see [[Tables.events]]): raw parquet
    * nanos (`bigint`) floor-truncate to micros; `timestamp_ntz` reinterprets
    * as session-TZ (UTC) `timestamp` — same instant, since the driver writes
    * naive UTC; already-`timestamp` passes through.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
    case _                => df
  }
}
