package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so a plain `spark-submit --conf
  * spark.sql.extensions=graft.GraftExtensions` session can call
  * `split_sentences(...)` / `chunk_sentences(...)` from SQL with full
  * whole-stage codegen — no imports, no UDF registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("split_sentences"),
      new ExpressionInfo(classOf[graft.expressions.SplitSentences].getName,
        "split_sentences"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.SplitSentences(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cleanup_text"),
      new ExpressionInfo(classOf[graft.expressions.CleanupText].getName,
        "cleanup_text"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.CleanupText(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("chunk_sentences"),
      new ExpressionInfo(classOf[graft.expressions.ChunkSentences].getName,
        "chunk_sentences"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.ChunkSentences(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("normalize_mention"),
      new ExpressionInfo(classOf[graft.expressions.NormalizeMention].getName,
        "normalize_mention"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.NormalizeMention(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.expressions.DotProduct].getName,
        "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.DotProduct(exprs.head, exprs(1))))
    // tag_mentions(text) over the shipped pattern set (the literal subset
    // always parses for it, so .get cannot throw here)
    ext.injectFunction((
      FunctionIdentifier("tag_mentions"),
      new ExpressionInfo(classOf[graft.expressions.TagMentions].getName,
        "tag_mentions"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.TagMentions(exprs.head,
          graft.expressions.LiteralScanner
            .forPatterns(graft.operators.Tagger.patterns).get)))
  }
}
