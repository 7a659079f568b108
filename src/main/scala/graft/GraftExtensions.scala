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
    // custom physical operators (LocalDistinct — shuffle-free dedup for
    // co-partitioned-duplicate relations, plans/LocalDistinct.scala)
    ext.injectPlannerStrategy(_ => graft.plans.LocalDistinct.Planner)
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
    // tag_mentions(text) over the shipped pattern set. The literal scanner
    // only covers the alternation-of-literals pattern subset; if the
    // shipped set ever gains a pattern outside it, fail ANALYSIS with a
    // clear message (the DataFrame path falls back to the regex
    // formulation silently — a bare NoSuchElementException here would make
    // the two surfaces diverge confusingly on the same pattern edit).
    ext.injectFunction((
      FunctionIdentifier("tag_mentions"),
      new ExpressionInfo(classOf[graft.expressions.TagMentions].getName,
        "tag_mentions"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.LiteralScanner
          .forPatterns(graft.operators.Tagger.patterns) match {
          case Some(scanner) =>
            graft.expressions.TagMentions(exprs.head, scanner)
          case None =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "INTERNAL_ERROR",
              messageParameters = Map("message" ->
                ("tag_mentions: the shipped Tagger.patterns set contains a " +
                  "pattern outside the literal-scanner subset; use " +
                  "Tagger.tagMentions (regex fallback) or restrict the " +
                  "pattern set")))
        }))
  }
}
