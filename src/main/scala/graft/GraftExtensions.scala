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
  }
}
