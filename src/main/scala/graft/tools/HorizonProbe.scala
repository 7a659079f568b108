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
  *
  * And (dprobe1-5) the dropDuplicatesWithinWatermark state arithmetic the
  * `stream_dedup_horizon` twin must replicate:
  *
  *  - is the state evicted in the no-data batch before a re-arrival?
  *  - does an in-horizon duplicate EXTEND the stored expiry?
  *  - eviction polarity: `watermark >= expiry` or strict `>`? (measured:
  *    EQUALITY evicts — the opposite of the flatMapGroupsWithState
  *    timeout's strict `<`)
  *  - is the expiry (event time + watermark delay), or the bare event
  *    time?
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

    // ---- dropDuplicatesWithinWatermark (dedupDocsWithHorizon) probes ----
    // Same discipline for the `stream_dedup_horizon` twin: the state-expiry
    // arithmetic must be PROBED, not read off the scaladoc.
    def runD(name: String, batches: Seq[Seq[(Long, String, String)]]): Seq[(Long, String)] = {
      val ms = MemoryStream[(Long, String, String)]
      val q = EventStream.dedupDocsWithHorizon(
          ms.toDF().toDF("user_id", "text", "ts"),
          tsCol = "ts", horizon = "1 hour", textCol = "text")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).selectExpr("user_id", "cast(ts as string)")
        .as[(Long, String)].collect().toSeq
    }

    // DP1 (no-data batch eviction): A@05:10, expiry 06:10 (eventTime +
    // delay). B@08:00 -> wm 07:00 > expiry. A re-arrives 07:30 WITH data.
    // A emitted twice -> evicted before (or at) its re-arrival batch.
    val d1 = runD("d1", Seq(
      Seq((1L, "A", "2024-01-01 05:10:00")),
      Seq((2L, "B", "2024-01-01 08:00:00")),
      Seq((1L, "A", "2024-01-01 07:30:00"))))
    println(s"[dprobe1] rows=$d1 -> A emitted ${d1.count(_._1 == 1L)} times (2 = evicted+reemitted)")

    // DP2 (does an in-horizon duplicate EXTEND the expiry?): A@05:00
    // (expiry 06:00), dup A@05:50 (if extending -> expiry 06:50).
    // B@07:30 -> wm 06:30. A@07:00: emitted -> NO extension (06:00 <
    // 06:30, evicted); dropped -> the dup extended the expiry.
    val d2 = runD("d2", Seq(
      Seq((1L, "A", "2024-01-01 05:00:00")),
      Seq((1L, "A", "2024-01-01 05:50:00")),
      Seq((2L, "B", "2024-01-01 07:30:00")),
      Seq((1L, "A", "2024-01-01 07:00:00"))))
    println(s"[dprobe2] rows=$d2 -> A emitted ${d2.count(_._1 == 1L)} times (2 = duplicates do NOT extend expiry)")

    // DP3 (eviction polarity): A@05:00 (expiry 06:00.000), B@07:00:00.000
    // -> wm == expiry EXACTLY. A@06:30: emitted -> evicts on wm >= expiry;
    // dropped -> strict wm > expiry only.
    val d3 = runD("d3", Seq(
      Seq((1L, "A", "2024-01-01 05:00:00")),
      Seq((2L, "B", "2024-01-01 07:00:00")),
      Seq((1L, "A", "2024-01-01 06:30:00"))))
    println(s"[dprobe3] rows=$d3 -> A emitted ${d3.count(_._1 == 1L)} times (2 = evicts on equality)")

    // DP4 (floor millis): B@07:00:00.000999. If the wm floors to millis the
    // result matches dprobe3; if micros survive, wm > expiry -> A re-emits
    // regardless of dprobe3's polarity.
    val d4 = runD("d4", Seq(
      Seq((1L, "A", "2024-01-01 05:00:00")),
      Seq((2L, "B", "2024-01-01 07:00:00.000999")),
      Seq((1L, "A", "2024-01-01 06:30:00"))))
    println(s"[dprobe4] rows=$d4 -> A emitted ${d4.count(_._1 == 1L)} times")

    // DP5 (is the expiry ts + delay, or bare ts?): A@05:00, B@06:30 ->
    // wm 05:30. expiry = ts + delay (06:00) -> A still in state, its
    // 06:00 re-arrival dropped (count 1); expiry = bare ts (05:00 <=
    // wm) -> evicted, re-emitted (count 2).
    val d5 = runD("d5", Seq(
      Seq((1L, "A", "2024-01-01 05:00:00")),
      Seq((2L, "B", "2024-01-01 06:30:00")),
      Seq((1L, "A", "2024-01-01 06:00:00"))))
    println(s"[dprobe5] rows=$d5 -> A emitted ${d5.count(_._1 == 1L)} times (1 = expiry is ts + delay)")

    // DP6 (STORED event-time precision): dprobe4 cannot separate a
    // floored watermark from surviving micros once dprobe3 established
    // equality-evicts (both hypotheses evict), and the watermark floor
    // itself is pinned by probe3's shared EventTimeStats machinery — the
    // genuinely open question is the precision of the ts the STATE
    // stores. A carries 600 MICROseconds: stored-floored expiry =
    // 06:00:00.000 == wm -> evicted, re-emitted (2); stored-micros
    // expiry = 06:00:00.000600 > wm 06:00:00.000 -> dropped (1).
    // MEASURED: 1 — the dedup state keeps MICROSECOND precision, the
    // OPPOSITE of the flatMapGroupsWithState state's Timestamp.getTime
    // floor. The DuckDB twin's epoch_ms floor is exact only because the
    // gate's feed is ms-exact by construction (spec-pinned).
    val d6 = runD("d6", Seq(
      Seq((1L, "A", "2024-01-01 05:00:00.000600")),
      Seq((2L, "B", "2024-01-01 07:00:00")),
      Seq((1L, "A", "2024-01-01 06:30:00"))))
    println(s"[dprobe6] rows=$d6 -> A emitted ${d6.count(_._1 == 1L)} times (1 = state keeps MICROSECOND precision)")

    spark.stop()
  }
}
