package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict to the named queries (local iteration;
    // the driver always passes exactly two args and gets the full dump)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Clear the previous run's manifest BEFORE dumping: if this run dies
    // mid-loop (OOM, Ctrl-C) the per-query bookkeeping never executes, and
    // a surviving stale manifest would validate output dirs this run never
    // produced — the exact hole the manifest exists to close.
    Files.deleteIfExists(Paths.get(s"$outDir/dumped.json"))
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val written = selected.keys.toSeq.sorted.filter { name =>
      val fn = selected(name)
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        true
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        false
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      JsonUtil.obj(SparkEntry.oracleSql))
    // manifest of THIS run's SUCCESSFUL dumps: check_oracle.py's
    // --only-existing guard uses it to tell freshly-dumped dirs from stale
    // leftovers of a previous full run (a subset dump of only rows-only
    // queries must pass; a typo'd filter over stale state must still fail).
    // Queries that threw are excluded — a stale dir left behind by a failed
    // dump must not read as freshly checked.
    Files.writeString(Paths.get(s"$outDir/dumped.json"),
      written.map(JsonUtil.str).mkString("[", ",", "]"))
    spark.stop()
  }
}
