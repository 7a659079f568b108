package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2 — candidate entity linking (north-star KG extension; not present in
  * the reference, mandated by BASELINE.json).
  *
  * Mentions are normalized ([[Lemmatizer.normalizeMention]]), broadcast-
  * joined against the alias dictionary on `mention_norm == alias_norm`,
  * scored with a context-similarity bonus (document language vs the alias's
  * preferred language), and the best candidate per (doc, mention) is picked
  * with a `row_number` window — deterministic tie-break by `entity_id`.
  *
  * Scale notes: the dictionary side is broadcast (no shuffle); the window
  * partitions by the mention key which is already the join output's
  * partitioning, and at 100 TB the doc-side relation stays shuffle-free up
  * to this point when the tagger ran per-partition.
  */
object Linker {

  /** Input: (keyCols..., lang, label, mention, confidence) mention rows.
    * Output: one winning link per (keyCols, mention):
    * (keyCols..., lang, mention, mention_norm, label, entity_id, score).
    */
  def link(spark: SparkSession, mentions: DataFrame, keyCols: Seq[String],
      langBonus: Double = Tagger.langBonus): DataFrame = {
    val dict = Tagger.aliasDf(spark)
      .withColumnRenamed("label", "dict_label")
    val cand = Lemmatizer.normalized(mentions)
      .join(broadcast(dict), col("mention_norm") === col("alias_norm"))
      .withColumn("score",
        col("prior") + when(col("lang") === col("pref_lang"), lit(langBonus))
          .otherwise(lit(0.0)))
    val w = Window
      .partitionBy((keyCols :+ "mention").map(col): _*)
      .orderBy(col("score").desc, col("entity_id"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "alias_norm", "prior", "pref_lang")
  }
}
