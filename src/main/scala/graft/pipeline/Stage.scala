package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The composable stage abstraction of SURVEY.md §7: every pipeline step is
  * a named `DataFrame => DataFrame`, so stages compose with `andThen`, run
  * identically in batch and inside `foreachBatch` micro-batches, and are
  * individually resumable through [[Manifest.runStage]].
  */
trait Stage extends (DataFrame => DataFrame) {
  def name: String
}

object Stage {

  def apply(stageName: String)(f: DataFrame => DataFrame): Stage = new Stage {
    override def name: String = stageName
    override def apply(df: DataFrame): DataFrame = f(df)
  }

  /** The engine's stage registry — the union of the reference's pluggable
    * registries (U1 middleware `middleware.py:125-130`, U2 splitters
    * `sentsplitter.py:91-94`) plus the KG-extension stages. Keyed stages
    * let a pipeline be assembled from config, like the reference's CLI
    * flags selected middleware/splitter implementations.
    */
  def registry(spark: SparkSession): Map[String, Stage] = Map(
    "cleanup" -> Stage("cleanup")(df =>
      df.withColumn("content", graft.functions.Text.cleanup(col("content")))),
    "split" -> Stage("split")(df => Splitter.explodeSentences(df)),
    "chunk" -> Stage("chunk")(df => Chunker.explodeChunks(df)),
    "tag" -> Stage("tag")(df => Tagger.tagMentions(df, "sentence")),
    "tag_doc" -> Stage("tag_doc")(df => Tagger.tagMentions(df, "content")),
    "threshold" -> Stage("threshold")(df =>
      df.filter(col("confidence") >= Tagger.threshold)),
    "passthrough" -> Stage("passthrough")(Middleware.passthrough),
    "nertagger" -> Stage("nertagger")(df =>
      Middleware.entityGroups(df, Seq("repo", "path", "commit"))),
    "lemma" -> Stage("lemma")(df => Lemmatizer.normalized(df)),
    "sentiment" -> Stage("sentiment")(df =>
      Middleware.sentiment(df, Seq("repo", "path", "commit"))),
    "link" -> Stage("link")(df =>
      Linker.link(spark, df, Seq("repo", "path", "commit"))))

  /** Compose registry stages by name into one pipeline function. */
  def pipeline(spark: SparkSession, names: Seq[String]): DataFrame => DataFrame = {
    val reg = registry(spark)
    names.map(reg(_): DataFrame => DataFrame).reduce(_ andThen _)
  }
}
