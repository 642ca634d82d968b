package graft
import org.apache.spark.sql.SparkSession
object LcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,8192]")
      .config("spark.jars", "target/scala-2.13/geomspark_2.13-0.1.0.jar")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = spark.range(0, 1000000).selectExpr("sum(id)").head.getLong(0)
    println(s"LCPROBE sum=$n execs=${spark.sparkContext.getExecutorMemoryStatus.size}")
    spark.stop()
  }
}
