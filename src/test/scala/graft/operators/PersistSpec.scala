package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Persist._

/** Unit tests for the persist-side projections (SURVEY §2.3 T1/T2/T14,
  * §2.2 K5, §2.5 A8), incl. the reference's mask grammar and the
  * missing-attribute → "unknown" rule
  * (persistor/internal/persistor/storage.go:103-189).
  */
class PersistSpec extends SparkSpec {
  import spark.implicits._

  test("parseMask accepts time parts and {attr} members in order") {
    assert(parseMask("year/month/day/hour") ===
      Seq(TimeMember("year"), TimeMember("month"), TimeMember("day"), TimeMember("hour")))
    assert(parseMask("year/{color}/day") ===
      Seq(TimeMember("year"), AttrMember("color"), TimeMember("day")))
  }

  test("parseMask rejects unknown members and malformed attr refs") {
    intercept[IllegalArgumentException](parseMask("year/minute"))
    intercept[IllegalArgumentException](parseMask("year/{}"))
    intercept[IllegalArgumentException](parseMask("year/{color"))
  }

  test("withPartitionColumns derives zero-padded time parts from the clock") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-07 04:05:06")).toDF("ts")
    val out = withPartitionColumns(df, parseMask("year/month/day/hour"), col("ts"))
      .select("year", "month", "day", "hour").head()
    assert(out.toSeq === Seq("2024", "03", "07", "04"))
  }

  test("withPartitionColumns fills missing attributes with literal unknown") {
    val df = Seq(("a", "red"), ("b", null)).toDF("id", "color")
    val out = withPartitionColumns(df, parseMask("{color}/{shape}"), col("id"),
      Map("color" -> col("color")))
      .select("id", "color", "shape").collect().map(_.toSeq)
    assert(out.toSet === Set(Seq("a", "red", "unknown"), Seq("b", "unknown", "unknown")))
  }

  test("partitionPath concatenates prefix and mask members like GenerateBlobName") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-07 04:05:06")).toDF("ts")
    val mask = parseMask("year/month/{color}")
    val out = withPartitionColumns(df, mask, col("ts"), Map.empty)
      .withColumn("path", partitionPath("gs://b/pre", mask))
      .select("path").head().getString(0)
    assert(out === "gs://b/pre/2024/03/unknown")
  }

  test("withVersionColumns groups partition the batch without loss or overlap") {
    val df = (1L to 20L).toDF("id")
    val versioned = withVersionColumns(df, Map(
      "v" -> when(col("id") % 3 === 0, lit("x")).when(col("id") % 3 === 1, lit("y"))))
    val counts = versioned.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20L)           // no loss
    assert(counts.keySet === Set("x", "y", "unknown")) // missing → unknown
    assert(versioned.count() === 20L)           // no duplication
  }

  test("messageSize counts payload bytes plus attribute key/value lengths") {
    val df = Seq(("abcd", Map("k1" -> "vv", "key2" -> "x")))
      .toDF("data", "attrs")
      .withColumn("data", col("data").cast("binary"))
    val size = df.select(messageSize(col("data"), col("attrs"))).head().getLong(0)
    // 4 payload + (2+2) + (4+1) per calculate_message_size.go:21-39
    assert(size === 13L)
  }

  test("goodBadSplit implements the MessagesGoodBad intent (anti/semi)") {
    val batch = (1L to 10L).toDF("unique_id")
    val failed = Seq(3L, 7L).toDF("unique_id")
    val (good, bad) = goodBadSplit(batch, failed, "unique_id")
    assert(good.collect().map(_.getLong(0)).sorted === Array(1L, 2L, 4L, 5L, 6L, 8L, 9L, 10L))
    assert(bad.collect().map(_.getLong(0)).sorted === Array(3L, 7L))
  }

  test("deadLetter projects the three DL attributes alongside identity") {
    val failed = Seq(("m1", "boom")).toDF("id", "why")
    val out = deadLetter(failed, col("id"), "validation_error", col("why"), "indexer").head()
    assert(out.toSeq === Seq("m1", "validation_error", "boom", "indexer"))
  }

  test("zeroToN assigns 0..n-1 positions per blob (T3)") {
    val df = Seq(("b0", 30L), ("b0", 10L), ("b0", 20L), ("b1", 5L))
      .toDF("blob", "id")
    val out = zeroToN(df, col("blob"), col("id"))
      .select("blob", "id", "position").as[(String, Long, Long)].collect().toSet
    assert(out === Set(("b0", 10L, 0L), ("b0", 20L, 1L), ("b0", 30L, 2L), ("b1", 5L, 0L)))
  }

  test("onlyStrings drops null-valued attribute entries (T10)") {
    val df = Seq(1).toDF("x").select(
      onlyStrings(map(
        lit("a"), lit("1"),
        lit("b"), lit(null).cast("string"))).as("m"))
    assert(df.as[Map[String, String]].head() === Map("a" -> "1"))
  }
}
