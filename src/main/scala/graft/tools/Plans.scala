package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries (dev tool for plan
  * review: pushdown, pruning, codegen spans, shuffle count).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("kg_triples", "q1_pricing", "q3_revenue_by_nation",
        "p4_threshold", "dedup_lsh_pairs", "ann_cosine", "j1_cache_dedup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
