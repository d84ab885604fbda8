package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RcropCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.xscale.PerceptualDedup._
    val media = ((0L until 120L).map(i => (i, fixtureRcropBmp(i, 0))) ++
      (0L until 120L).filter(_ % 15 == 0).map(i => (i + 5000000L, fixtureRcropBmp(i, 2))) ++
      (0L until 120L).filter(_ % 45 == 0).map(i => (i + 6000000L, fixtureRcropBmp(i, 4))))
    val mdf = media.toDF("doc_id", "payload")
    val sh = imageMultiScaleTileShingles(mdf)
    sh.groupBy("scale").agg(count(lit(1)), countDistinct("doc_id")).orderBy("scale").show()
    sh.filter(col("doc_id") >= 5000000L).groupBy("doc_id", "scale").count().orderBy("doc_id", "scale").show(40)
    println("=== exact pairs ===")
    resizedCropContainmentPairs(mdf).orderBy("doc_id", "src_id", "scale").show(50)
    println("=== lsh pairs ===")
    resizedCropContainmentPairsLsh(mdf).orderBy("doc_id", "src_id", "scale").show(50)
    spark.stop()
  }
}
