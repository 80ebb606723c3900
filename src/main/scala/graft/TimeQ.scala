package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      Bench.force(fn(spark, dir)) // warm
      // rebuild any operator-internal persisted stages in the timed run
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = Bench.force(fn(spark, dir))
      println(f"TIMEQ $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
