package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warmup
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"[timeq] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
