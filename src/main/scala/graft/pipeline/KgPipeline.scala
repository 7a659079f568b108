package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators._

/** The end-to-end KG-construction pipeline (north rule): ingest the Doc
  * table → cleanup → sentence split → dedup/cache → deterministic tagging →
  * confidence threshold → entity linking → canonicalization → (subj, pred,
  * obj) triple materialization partitioned by (repo, lang).
  *
  * Spark restatement of the reference's `/api/v1/ner` lifecycle
  * (SURVEY.md §3.1): the four zmq process boundaries become at most three
  * shuffles — sentence-key dedup, link window, final group-by — and two of
  * them collapse when the gazetteer side is broadcast.
  */
object KgPipeline {

  /** Stage 1-2: sentence explode (order preserved via sent_idx). Cleanup
    * happens INSIDE the splitter, exactly once over the raw text plus once
    * per emitted sentence — the reference shape (`ner.py:171` hands raw
    * text to `sentsplitter.py:22-29`, which cleans internally; there is no
    * pre-clean). A pre-clean here would both diverge (cleanup is
    * non-idempotent on soft-hyphen runs) and cost an extra full pass over
    * the corpus.
    */
  def sentences(docs: DataFrame): DataFrame =
    Splitter.explodeSentences(docs)

  /** Mention tagging over sentences, Catalyst-only (no spans). */
  def sentenceMentions(docs: DataFrame): DataFrame =
    Tagger.tagMentions(sentences(docs), "sentence")

  /** Doc-level mention tagging — skips the sentence split for pipelines
    * that do not need sentence provenance (the chunk granularity vanishes
    * in the final group-by anyway, reference `ner.py:196-203` / A4).
    */
  def docMentions(docs: DataFrame): DataFrame =
    Tagger.tagMentions(
      docs.withColumn("cleaned", Text.cleanup(col("content"))).drop("content"),
      "cleaned")

  /** Threshold (P4) + linking (J2) over a mention relation carrying
    * (repo, path, commit, lang, label, mention, confidence).
    */
  def links(spark: SparkSession, mentions: DataFrame): DataFrame =
    Linker.link(spark,
      mentions.filter(col("confidence") >= Tagger.threshold),
      Seq("repo", "path", "commit"))

  /** Canonicalization (J3): connected components over the co-occurrence
    * graph of linked entities, returning a (entity_id, canon_id) map.
    */
  def canonMap(spark: SparkSession, links: DataFrame,
      keyCols: Seq[String] = Seq("repo", "path"),
      assumeNarrowLinks: Boolean = false): DataFrame = {
    // Pre-shrink the (doc, entity) relation before the starEdges window.
    // UNLIKE the triple build, correctness here does NOT depend on the
    // co-partitioned-duplicates contract: a duplicate (doc, entity) row
    // that survives into starEdges changes neither the window min nor the
    // deduplicated edge set, and the CC vertex set is re-distincted inside
    // ConnectedComponents.run. But the shuffle-free LocalDistinct's
    // no-spill MEMORY bound only holds for never-shuffled inputs (scan
    // splits — see its scaladoc), and `links` is caller-supplied: a
    // post-shuffle/snapshot relation can carry a hot partition that the
    // per-partition hash set cannot spill. So, mirroring `triples`, the
    // LocalDistinct pre-shrink is an OPT-IN (`assumeNarrowLinks`) for
    // callers who can assert narrow lineage from a scan; the default is
    // the spill-safe global distinct (which also subsumes the pre-shrink's
    // purpose: removing duplicate rows before the window exchange).
    val narrow = links.select((keyCols :+ "entity_id").map(col): _*)
    val perDoc =
      if (assumeNarrowLinks) graft.plans.LocalDistinct.of(narrow)
      else narrow.distinct()
    val edges = starEdges(perDoc, keyCols)
    // vertices from the LINK set, not the edge set: an entity linked in
    // exactly one document with no co-occurring entity has no edge but must
    // still appear in the canon map (as its own canonical id).
    val verts = perDoc.select(col("entity_id")).distinct()
    ConnectedComponents.run(spark, edges, vertices = Some(verts))
      .select(col("id").as("entity_id"), col("component").as("canon_id"))
  }

  /** STAR edges, not clique edges: each entity connects to its document's
    * minimum entity (the hub). Connectivity — hence every connected
    * component — is identical to the all-pairs formulation: two entities
    * co-occurring in a doc reach each other through the doc's hub, and
    * cross-doc paths compose hop-by-hop exactly as with cliques. But a doc
    * linking K entities emits K-1 edge rows instead of K(K-1)/2: the
    * all-pairs self-join this replaces was the last join-explosion shape in
    * the flagship pipeline — one hot document linking 10^4 entities (a
    * README naming every product) would have pushed 5·10^7 rows through a
    * single join key. The hub comes from a window min over the SAME
    * relation (one exchange, no self-join); the final distinct collapses
    * identical star edges produced by different documents.
    */
  private[graft] def starEdges(perDoc: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    perDoc
      .withColumn("src", min(col("entity_id")).over(w))
      .filter(col("entity_id") =!= col("src"))
      .select(col("src"), col("entity_id").as("dst")).distinct()
  }

  /** Final triple relation:
    * subj = repo/path@commit, pred = mentions:<label>, obj = entity id
    * (canonical when `canonicalize`), with (repo, lang) provenance.
    */
  def triples(spark: SparkSession, docs: DataFrame,
      canonicalize: Boolean = false, sentenceLevel: Boolean = false,
      assumeUniqueDocs: Boolean = false): DataFrame = {
    val mentions = if (sentenceLevel) sentenceMentions(docs) else docMentions(docs)
    val linked = links(spark, mentions)
    val resolved =
      if (canonicalize) {
        // the doc-PK assertion that makes the triple dedup's LocalDistinct
        // safe is exactly the narrow-lineage assertion canonMap needs
        val cm = canonMap(spark, linked, assumeNarrowLinks = assumeUniqueDocs)
        linked.join(broadcast(cm), Seq("entity_id"), "left")
          .withColumn("obj", coalesce(col("canon_id"), col("entity_id")))
      } else linked.withColumn("obj", col("entity_id"))
    // Dedup on the NARROW key columns first, then project the subj/pred
    // strings: a triple is unique per (doc key, label, obj) — deduping
    // before the concat shuffles fewer bytes and computes the string build
    // once per surviving row instead of once per mention occurrence. (It is
    // also the domain-correct key: dedup on the concatenated subj would
    // merge distinct docs whose repo/path happen to concat-collide.)
    //
    // With `assumeUniqueDocs = true` — an explicit OPT-IN for callers
    // who can assert that (repo, path, commit) is a primary key of their
    // input — the dedup is the custom SHUFFLE-FREE LocalDistinct
    // operator: every duplicate triple then derives from ONE document
    // row through a narrow lineage (explode → filter → broadcast join →
    // project never move rows across partitions), so equal rows are
    // always co-partitioned and the global distinct's full-relation hash
    // exchange — the single largest data movement in the flagship job —
    // carries zero information. The DEFAULT stays the exchange-based
    // global distinct: it is correct for arbitrary inputs (replayed
    // docs, committed-snapshot re-reads) and spill-safe; measured trade
    // in BENCH.md §21/§23 (the opt-in raises throughput at every
    // parallelism level, most where shuffle cost bites hardest).
    val narrow = resolved.select("repo", "path", "commit", "lang", "label", "obj")
    val deduped =
      if (assumeUniqueDocs) graft.plans.LocalDistinct.of(narrow)
      else narrow.distinct()
    deduped
      .select(
        concat_ws("@", concat_ws("/", col("repo"), col("path")), col("commit"))
          .as("subj"),
        concat(lit("mentions:"), col("label")).as("pred"),
        col("obj"),
        col("repo"), col("lang"))
  }

  /** S4 sink: write triples partitioned by (repo, lang) with a manifest. */
  def materialize(spark: SparkSession, docs: DataFrame, warehouse: String,
      canonicalize: Boolean = true): Unit = {
    val t = triples(spark, docs, canonicalize)
    Manifest.writeStage(spark, t, warehouse, "triples", Seq("repo", "lang"))
  }
}
