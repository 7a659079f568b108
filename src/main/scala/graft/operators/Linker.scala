package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J2 — candidate entity linking (north-star KG extension; not present in
  * the reference, mandated by BASELINE.json).
  *
  * Mentions are normalized ([[Lemmatizer.normalizeMention]]) and broadcast-
  * joined against the alias dictionary GROUPED BY alias (one row per
  * `alias_norm`, candidates as an array). The winner — logically
  * `row_number over (partition by mention order by score desc, entity_id)
  * = 1` with score = prior + language-context bonus — is resolved per row
  * by `array_min` over the scored candidate array.
  *
  * Scale rationale: this is a ZERO-SHUFFLE stage. A window formulation
  * sort-shuffles every candidate row; a min(struct) aggregation falls out
  * of HashAggregate into SortAggregate (struct buffers are not mutable
  * UnsafeRow types). The scored-array projection runs inside whole-stage
  * codegen, keeps the context scoring per-document (any doc-side feature
  * can join the lambda), and shuffles nothing at any corpus size.
  */
object Linker {

  /** Alias dictionary grouped per alias: (alias_norm, cands:array<struct<
    * entity_id,label,prior,pref_lang>>). Tiny; broadcast side.
    */
  def aliasGroupedDf(spark: SparkSession): DataFrame =
    Tagger.aliasDf(spark)
      .groupBy("alias_norm")
      .agg(collect_list(struct(col("entity_id"), col("label"), col("prior"),
        col("pref_lang"))).as("cands"))

  /** Input: (keyCols..., lang, label, mention, confidence) mention rows.
    * Output: one winning link per input row (dedup of repeated mentions is
    * the caller's concern — the pipeline's final `distinct` or the query's
    * input dedup): (keyCols..., lang, label, mention, mention_norm,
    * entity_id, score). Mentions whose normal form is not in the dictionary
    * are dropped (inner-join semantics).
    */
  def link(spark: SparkSession, mentions: DataFrame, keyCols: Seq[String],
      langBonus: Double = Tagger.langBonus): DataFrame = {
    val scored = (c: Column) => struct(
      negate(c.getField("prior") +
        when(col("lang") === c.getField("pref_lang"), lit(langBonus))
          .otherwise(lit(0.0))).as("neg_score"),
      c.getField("entity_id").as("entity_id"))
    Lemmatizer.normalized(mentions)
      .join(broadcast(aliasGroupedDf(spark)),
        col("mention_norm") === col("alias_norm"))
      .withColumn("w", array_min(transform(col("cands"), scored)))
      .withColumn("entity_id", col("w.entity_id"))
      .withColumn("score", negate(col("w.neg_score")))
      .drop("alias_norm", "cands", "w")
  }
}
