package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStream

/** Empirical probe for the flatMapGroupsWithState timeout semantics the
  * `stream_horizon` oracle twin must replicate (probe, don't assume —
  * CLAUDE.md discipline):
  *
  *  1. Does a NO-DATA micro-batch run after a data batch advances the
  *     watermark (so a key whose timeout expired is evicted BEFORE its next
  *     data batch — meaning a key with data in the very batch where its
  *     timeout would first be checked still restarts)?
  *  2. Does the timeout fire on `timeout < watermark` or `timeout <=
  *     watermark` (equality polarity)?
  *  3. Is the watermark computed on FLOOR-millisecond event times (micros
  *     truncated), matching `java.sql.Timestamp.getTime`?
  */
object HorizonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def run(name: String, batches: Seq[Seq[(Long, Double, String)]]): Seq[(Long, Long, Double)] = {
      val ms = MemoryStream[(Long, Double, String)]
      val q = EventStream.runningPerUserWithHorizon(spark,
          ms.toDF().toDF("user_id", "value", "ts"),
          horizon = "1 hour", watermarkDelay = "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[(Long, Long, Double)].collect().toSeq
    }

    // Probe 1: A@05:10 (timeout 06:10), B@06:50 -> wm 06:40 > 06:10.
    // A re-arrives 07:05 WITH data in the first batch after the wm advance.
    // n(A last) == 1 -> an empty batch evicted A before its data batch.
    // n(A last) == 2 -> no empty batch; A's data suppressed the timeout.
    val r1 = run("p1", Seq(
      Seq((1L, 1.0, "2024-01-01 05:10:00")),
      Seq((2L, 1.0, "2024-01-01 06:50:00")),
      Seq((1L, 1.0, "2024-01-01 07:05:00"))))
    println(s"[probe1] rows=$r1 -> A final n=${r1.filter(_._1 == 1L).map(_._2).max}")

    // Probe 2 (polarity): A@05:00:00.000 (timeout 06:00:00.000),
    // B@06:10:00.000 -> wm == 06:00:00.000 EXACTLY. A re-arrives 06:05.
    // n(A)==1 -> fires on <= ; n(A)==2 -> fires on < only.
    val r2 = run("p2", Seq(
      Seq((1L, 1.0, "2024-01-01 05:00:00")),
      Seq((2L, 1.0, "2024-01-01 06:10:00")),
      Seq((1L, 1.0, "2024-01-01 06:05:00"))))
    println(s"[probe2] rows=$r2 -> A restarted=${r2.count(r => r._1 == 1L && r._2 == 1L) == 2}")

    // Probe 3 (floor millis): B@06:10:00.000999 (micros). If wm floors to
    // millis, wm = 06:00:00.000 and equality-polarity result matches probe
    // 2; if wm kept micros, wm = 06:00:00.000999 > timeout -> A restarts
    // regardless of polarity.
    val r3 = run("p3", Seq(
      Seq((1L, 1.0, "2024-01-01 05:00:00")),
      Seq((2L, 1.0, "2024-01-01 06:10:00.000999")),
      Seq((1L, 1.0, "2024-01-01 06:05:00"))))
    println(s"[probe3] rows=$r3 -> A restarted=${r3.count(r => r._1 == 1L && r._2 == 1L) == 2}")

    spark.stop()
  }
}
