package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Bench harness: one warmup pass (JIT, file listing, and the one-time
  * persist/stream/publish materializations), then one timed pass per
  * query. Failures are NOT swallowed into fake timings: a failed query
  * reports `-1` AND an `errors` entry AND a nonzero exit code. The JSON
  * line goes to stdout (driver contract) and to `bench_out.json` (immune
  * to sbt log noise).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        errors.getOrElseUpdate(name, s"warmup: ${e.getMessage}")
      }
    }

    val timings = names.map { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(name, e.getMessage)
          name -> -1.0
      }
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = timings.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = timings.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""errors":$errJson,"n_failed":${errors.size},"sf":${q(sfDir)}}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
