package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl._

object Drive {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cfg = Etl.Config(labelCol = "lang", textCol = "text", keyCol = "doc_id",
      sampleSize = 60, countThreshold = 30)
    val (train, test) = Etl.run(docs, cfg)
    println(s"train=${train.count()} test=${test.count()}")
    train.select("doc_id", "lang", "fasttext", "class_percentile").show(3, 50)

    val tmp = java.nio.file.Files.createTempDirectory("drive").toString
    Etl.cleanAndLabel(docs, cfg).write.mode("overwrite").parquet(s"$tmp/labeled")
    val tf = new TrainingFile(s"$tmp/labeled", s"$tmp/out", "lang", "fasttext")
    val p1 = tf.generateTrainingFile(0.5, 10)
    println("training file: " + p1)
    scala.io.Source.fromFile(p1).getLines().take(3).foreach(println)
    println("total lines: " + scala.io.Source.fromFile(p1).getLines().size)
    val p2 = tf.generateFixedTrainingFile(5)
    println("fixed file lines: " + scala.io.Source.fromFile(p2).getLines().size)
    println("listed: " + TrainingFile.listTrainingFiles(s"$tmp/out").size)
    // probe: listing a dir with no final/ subdir
    println("empty list: " + TrainingFile.listTrainingFiles("/tmp/no_such_dir_graft"))
    // probe: rerun generate over same output location (overwrite/uuid behavior)
    val p3 = tf.generateTrainingFile(0.5, 10)
    println("second file distinct: " + (p3 != p1))
    spark.stop()
  }
}
