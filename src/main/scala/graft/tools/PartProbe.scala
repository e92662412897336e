package graft.tools
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "s", "p")
    try {
      df.write.format("fixedwidth")
        .option("fields", "id:long:0:6,s:string:6:4,p:string:10:4")
        .partitionBy("p")
        .mode("overwrite").save("/tmp/graft-partprobe")
      println("PARTPROBE: no error")
      spark.read.format("fixedwidth").option("fields", "id:long:0:6,s:string:6:4,p:string:10:4").load("/tmp/graft-partprobe").show(5, false)
      println("PARTPROBE files: " + java.nio.file.Files.walk(java.nio.file.Path.of("/tmp/graft-partprobe")).iterator().asScala.map(_.toString).toList.sorted.mkString(" | "))
    } catch { case e: Throwable => println(s"PARTPROBE: ${e.getClass.getName}: ${e.getMessage}") }
    spark.stop()
  }
}
