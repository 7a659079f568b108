package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpoint commits with lineage + row-count metrics — the
  * north rule's "resumes from the last committed Iceberg snapshot" clause,
  * emulated over partitioned Parquet (no Iceberg runtime jar ships in
  * `/opt/spark/jars`; the layout is kept Iceberg-shaped — data partitioned
  * by the spec columns + a JSON manifest — so a real catalog can be swapped
  * in without touching callers).
  *
  * A stage commit is atomic-enough for resume purposes: data lands first,
  * the manifest (with per-partition row counts and the input fingerprint)
  * lands last; [[runStage]] recomputes only when no manifest exists or the
  * input fingerprint changed.
  */
object Manifest {

  final case class PartitionMetric(partition: String, rows: Long)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def manifestPath(warehouse: String, stage: String): String =
    s"$warehouse/$stage/_manifest.json"

  def exists(spark: SparkSession, warehouse: String, stage: String): Boolean =
    fs(spark, warehouse)
      .exists(new org.apache.hadoop.fs.Path(manifestPath(warehouse, stage)))

  def readManifest(spark: SparkSession, warehouse: String, stage: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(manifestPath(warehouse, stage))
    val f = fs(spark, warehouse)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Write a stage's output partitioned by `partitionCols`, then commit the
    * manifest: stage name, total rows, per-partition row counts (lineage
    * metrics), and the caller-supplied input fingerprint.
    */
  def writeStage(spark: SparkSession, df: DataFrame, warehouse: String,
      stage: String, partitionCols: Seq[String],
      inputFingerprint: String = ""): Unit = {
    val out = s"$warehouse/$stage"
    // Co-locate each output partition's rows before the partitioned write
    // (the north rule's explicit repartition by repo/lang): without it,
    // every task writes one file per (repo, lang) value it happens to hold
    // — tasks × partitions small files at corpus scale. Trade-off: write
    // parallelism is bounded by the distinct partition-value count, and a
    // skewed value serializes in one task; when that bites, swap for the
    // AQE rebalance hint (splits oversized output partitions).
    val toWrite =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df
    val writer = toWrite.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(out)
    // Lineage metrics from the COMMITTED snapshot, not from a cache of the
    // stage lineage: caching a corpus-scale stage just to count it spills
    // the whole stage to executor disk; counting the committed parquet is
    // a metadata-cheap scan (row counts from footers, partition values
    // from directory names) and records what was actually written.
    // The partitioned read re-INFERS partition column types from directory
    // names: a numeric-looking partition value (repo="1e5", lang="01")
    // would come back re-typed and render a different manifest key
    // (100000.0 / 1) than what was written — and once inference has
    // collapsed "1e5" to 100000.0 no cast recovers the original. Supplying
    // the source schema to the read skips the inference entirely: partition
    // directory values are parsed directly as the declared types.
    val committed = spark.read.schema(df.schema).parquet(out)
    val perPart: Seq[(String, Long)] =
      if (partitionCols.nonEmpty)
        committed.groupBy(partitionCols.map(col): _*).count()
          .collect()
          .map(r => partitionCols.indices.map(r.get(_)).mkString("/") ->
            r.getLong(partitionCols.length))
          .toSeq.sortBy(_._1)
      else Seq("(all)" -> committed.count())
    val total = perPart.map(_._2).sum
    val parts = perPart.map { case (p, n) =>
      s"""{"partition":${jsonStr(p)},"rows":$n}"""
    }.mkString("[", ",", "]")
    val manifest =
      s"""{"stage":${jsonStr(stage)},"rows":$total,""" +
        s""""input_fingerprint":${jsonStr(inputFingerprint)},""" +
        s""""partition_cols":${partitionCols.map(jsonStr).mkString("[", ",", "]")},""" +
        s""""partitions":$parts}"""
    val p = new org.apache.hadoop.fs.Path(manifestPath(warehouse, stage))
    val o = fs(spark, warehouse).create(p, true)
    try o.write(manifest.getBytes("UTF-8")) finally o.close()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonUnescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'u' if i + 6 <= s.length &&
              s.substring(i + 2, i + 6).forall(c =>
                Character.digit(c, 16) >= 0) =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => b += other; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** Extract the top-level `input_fingerprint` FIELD from a manifest — a
    * key-anchored parse, not a substring scan: the fingerprint value
    * appearing inside another field (a partition name, a future metadata
    * string) must not read as fresh. Inside an escaped JSON string the
    * quote characters are `\"`, so the `"input_fingerprint":"` anchor can
    * only match the real top-level key this writer emitted.
    */
  private[graft] def readFingerprint(manifest: String): Option[String] =
    """"input_fingerprint":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(manifest)
      .map(m => jsonUnescape(m.group(1)))

  /** Run-or-resume: if the stage has a committed manifest whose input
    * fingerprint matches, read the committed data; otherwise compute,
    * commit, and return the committed relation (so downstream stages read
    * the snapshot, not the lineage).
    */
  def runStage(spark: SparkSession, warehouse: String, stage: String,
      partitionCols: Seq[String], inputFingerprint: String)
      (compute: => DataFrame): DataFrame = {
    val fresh = readManifest(spark, warehouse, stage)
      .flatMap(readFingerprint)
      .contains(inputFingerprint)
    if (!fresh) {
      writeStage(spark, compute, warehouse, stage, partitionCols, inputFingerprint)
    }
    spark.read.parquet(s"$warehouse/$stage")
  }
}
