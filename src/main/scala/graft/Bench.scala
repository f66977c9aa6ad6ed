package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Bench harness: one warmup pass (JIT, file listing, and the one-time
  * persist/stream/publish materializations), then N timed passes per
  * query (default 3, `SPARK_GRAFT_BENCH_RUNS`). The headline per-query
  * number and the total are the per-query MINIMUM across passes — the
  * run least polluted by hypervisor contention (build-notes convention: whole-run
  * totals can inflate 2-3× under load; the best of a few runs is the
  * trustworthy one). The raw per-pass totals and per-query medians ride
  * along so the noise is visible, not hidden. Failures are NOT swallowed
  * into fake timings: a failed query reports `-1` AND an `errors` entry
  * AND a nonzero exit code. The JSON line goes to stdout (driver
  * contract) and to `bench_out.json` (immune to sbt log noise).
  */
object Bench {

  /** 1-minute load average at a point in time — stamped into the output
    * (before and after the run) so a reader can tell a quiet run from a
    * contention-inflated one (build-notes convention: totals inflate 2-3x
    * under hypervisor load; trust round-over-round comparisons only when
    * the stamps are ≈ 0... aside from Spark's own 32 worker threads).
    */
  private def loadavg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Exception => -1.0 }

  def main(args: Array[String]): Unit = {
    val loadBefore = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
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

    // q_dedup_pair_pr re-runs the full-corpus exact-Jaccard ground truth
    // (already timed as q_ngram_jaccard) purely as a correctness anchor;
    // its documented operational form is the sampled readout, which is
    // what the bench times (q_dedup_pair_pr_sampled). Verify still gates
    // both.
    val benchExcluded = Set("q_dedup_pair_pr")
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b — time a subset while iterating on
    // one query's plan; the round artifact always runs the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = (SparkEntry.queries.keySet -- benchExcluded).toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        errors.getOrElseUpdate(name, s"warmup: ${e.getMessage}")
      }
    }

    // pass-major order (all queries, then repeat) so one contention burst
    // degrades one PASS, not every sample of one query
    val samples: Seq[Seq[(String, Double)]] = (1 to runs).map { _ =>
      names.map { name =>
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
    }
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val byName = names.map(n => n -> samples.map(_.toMap.apply(n)))
    val timings = byName.map { case (n, vs) =>
      n -> (if (vs.exists(_ < 0)) -1.0 else vs.min)
    }
    val medians = byName.map { case (n, vs) =>
      n -> (if (vs.exists(_ < 0)) -1.0 else median(vs))
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = timings.collect { case (_, v) if v >= 0 => v }.sum
    val passTotals = samples
      .map(_.collect { case (_, v) if v >= 0 => v }.sum)
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(timings)},""" +
        s""""runs":$runs,"pass_totals":$passTotals,"queries_median":${obj(medians)},""" +
        s""""errors":$errJson,"n_failed":${errors.size},"sf":${q(sfDir)},""" +
        s""""loadavg_before":$loadBefore,"loadavg_after":${loadavg()}}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json)
    // The driver's round artifact keeps only the last ~2000 stdout chars,
    // so the full line above never parses there (BENCH_r*.json carried
    // `parsed: null` through round 10). Print a compact summary LAST —
    // total, pass totals, failure count, loadavg stamps, and the slowest
    // queries — sized to fit that tail window, so round-over-round totals
    // live in the round artifact itself; the full per-query map stays in
    // the committed bench_out.json.
    val slowest = timings.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => k -> math.rint(v * 1000) / 1000 }
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},""" +
        s""""runs":$runs,"pass_totals":$passTotals,"n_failed":${errors.size},""" +
        s""""sf":${q(sfDir)},"loadavg_before":$loadBefore,""" +
        s""""loadavg_after":${loadavg()},"slowest":${obj(slowest)},""" +
        s""""queries_full":"bench_out.json"}"""
    println(summary)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
