package graft

// temporary profiling probe — deleted after use
object Probe2 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val spark = GraftSession.local(32)
    val base = Tables(spark, "/root/testdata/sf0.1").documents
    val docs = (0 until 4).map { r =>
      val renamed = concat_ws(" ",
        transform(tokens(col("text")), t => concat(t, lit(s"_$r"))))
      base.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", if (r == 0) col("text") else renamed)
    }.reduce(_.unionByName(_)).cache()
    println("PROBE docs " + docs.count())
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROBE $tag ${(System.nanoTime() - t0) / 1e9}"); r
    }
    val sets = docs.select(col("doc_id"), array_sort(shingleSet(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    t("sets")(sets.count()); t("sets2")(sets.count())
    val banded = sets
      .withColumn("mh", minHashSignature(baseHashes(col("sh")), 24))
      .select(col("doc_id"), explode(bandSignatures(col("mh"), 6, 4)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .cache()
    t("banded")(banded.count()); t("banded2")(banded.count())
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().cache()
    t("cand")(cand.count())
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    t("verify")(cand.join(a, "doc_a").join(b, "doc_b").select(col("doc_a")).count())
    t("full")(operators.Dedup.minHashLsh(docs).count())
    spark.stop()
  }
}
