package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val df = Seq(("a", Array[Byte](1,2), Map("x"->"1"))).toDF("id","data","metadata")
    val schema = """{"type":"record","name":"persistorrecord","fields":[
      {"name":"id","type":"string"},{"name":"data","type":"bytes"},
      {"name":"metadata","type":{"type":"map","values":"string"}}]}"""
    df.write.mode("overwrite").format("org.apache.spark.sql.avro.AvroFileFormat").option("avroSchema", schema).save("/tmp/scratch/avro")
    spark.read.format("org.apache.spark.sql.avro.AvroFileFormat").load("/tmp/scratch/avro").show(truncate=false)
    spark.stop()
  }
}
