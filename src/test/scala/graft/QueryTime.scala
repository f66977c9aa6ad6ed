package graft

/** Micro-bench for one query: `sbt "Test/runMain graft.QueryTime q_x [sfDir] [n]"`
  * — times n in-JVM repetitions (first is warmup) so a single query can be
  * tuned without a full Bench pass.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("query name required"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
