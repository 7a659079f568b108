package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time single queries at sf0.1 / local[32]. */
object LshPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_lsh_pairs", "dedup_jaccard")
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      q(spark, "/root/testdata/sf0.1").count()
      val t0 = System.nanoTime()
      val rows = q(spark, "/root/testdata/sf0.1").count()
      println(f"[perf] $n ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }
    spark.stop()
  }
}
