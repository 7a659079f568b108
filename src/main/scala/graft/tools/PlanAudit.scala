package graft.tools

import org.apache.spark.sql.SparkSession

/** One-line physical-plan health summary per registered query: shuffle
  * exchange count, broadcast count, whole-stage-codegen span count, and
  * whether the parquet scans carry pushed filters — the numbers a plan
  * review cares about, greppable across rounds (PLANS.md records the
  * audited snapshot with commentary).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // AQE defers codegen insertion to runtime re-planning, which hides the
      // WholeStageCodegen spans this audit exists to count — audit the
      // static plan (AQE only ever REDUCES the shuffle work shown here)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-22s ${"shuffle"}%7s ${"bcast"}%5s ${"codegen"}%7s ${"pushed"}%6s  notes")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def count(p: String): Int = p.r.findAllIn(plan).length
        val rangeEx = count("Exchange rangepartitioning")
        val bcast = count("BroadcastExchange")
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        val pushed = count("PushedFilters: \\[[^\\]]")
        val sorts = count("Exchange SinglePartition")
        val notes = Seq(
          if (rangeEx > 0) s"rangeEx=$rangeEx(final sort)" else "",
          if (sorts > 0) s"singlePart=$sorts" else "",
          if (plan.contains("Bucketed: true")) "bucketed-scan" else "",
          if (plan.contains("MapPartitions") || plan.contains("SerializeFromObject"))
            "typed-stage" else "",
          if (plan.contains("LocalDistinct")) "LocalDistinct" else "",
          if (plan.contains("BatchEvalPython")) "PYTHON-UDF!" else ""
        ).filter(_.nonEmpty).mkString(" ")
        println(f"$name%-22s ${count("Exchange hashpartitioning")}%7d $bcast%5d $codegen%7d $pushed%6d  $notes")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).filter(_.nonEmpty)
            .map(_.linesIterator.next()).getOrElse(e.getClass.getName)
          println(f"$name%-22s ERROR $msg")
      }
    }
    spark.stop()
  }
}
