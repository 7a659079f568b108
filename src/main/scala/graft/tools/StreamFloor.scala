package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the streaming replay gates' per-micro-batch fixed cost under
  * candidate session knobs (the §36 follow-up: after the cloned-session +
  * tmpfs-checkpoint fix the replays still pay ~120 ms/batch — is that
  * planning, WAL, state commit, or progress tracking?). Each variant runs
  * the REAL `replayDailyDedup` on the sf0.01-shaped feed three times,
  * printing every rep — read rep 1 as warmup and compare the min of reps
  * 2-3 across variants. Knobs are set via the builder so the replay's
  * cloned session inherits them from the SparkContext conf.
  *
  * Usage: runMain graft.tools.StreamFloor <sfDir> <variant>
  * where variant is one of base | nometrics | retain2 | asyncprogress
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val variant = args.drop(1).headOption.getOrElse("base")
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
    val b2 = variant match {
      case "base" => b
      case "nometrics" => b.config("spark.sql.streaming.metricsEnabled", "false")
      case "retain2" => b.config("spark.sql.streaming.minBatchesToRetain", "2")
      case "asyncprogress" =>
        b.config("spark.sql.streaming.asyncProgressTrackingEnabled", "true")
      case other => throw new IllegalArgumentException(other)
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.sources.Tables.events(spark, dir).select(
      col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"))
    val byDay = ev.groupBy(col("user_id"),
        floor(unix_millis(col("ts")) / lit(86400000.0)).cast("long").as("d"))
      .agg(timestamp_millis(unix_millis(min(col("ts")))).as("ts"))
    val fed = byDay.select(col("user_id"),
        col("user_id").cast("string").as("text"), col("ts"))
      .withColumn("dup", explode(array(lit(1), lit(2)))).drop("dup")
      .cache()
    fed.count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.streaming.EventStream.replayDailyDedup(spark, fed).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[floor] variant=$variant rep$rep ${t}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
