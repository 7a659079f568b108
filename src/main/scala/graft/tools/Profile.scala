package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.pipeline.KgPipeline

/** Phase-by-phase scaling profile of the headline job (dev tool):
  * min of 3 reps per phase, GC time attribution.
  */
object Profile {
  private def gcMs: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPL", "256").toInt
    val cpusList = sys.env.getOrElse("SPARK_GRAFT_PROFILE_CPUS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    cpusList.foreach { cpus =>
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      def t(name: String)(f: => Long): Unit = {
        f // warmup
        val (time, gc) = (1 to 3).map { _ =>
          val g0 = gcMs; val t0 = System.nanoTime(); f
          ((System.nanoTime() - t0) / 1e9, gcMs - g0)
        }.minBy(_._1)
        println(f"[profile] cpus=$cpus $name%-10s ${time}%8.2fs gc=${gc}ms")
      }
      val docs = graft.Bench.replicatedDocs(s, sfDir, repl)
      t("replicate") { docs.count() }
      t("split") { KgPipeline.sentences(docs).count() }
      t("tag") { KgPipeline.sentenceMentions(docs).count() }
      t("link") { KgPipeline.links(s, KgPipeline.sentenceMentions(docs)).count() }
      t("triples") { KgPipeline.triples(s, docs, sentenceLevel = true).count() }
      t("canonMap") { KgPipeline.canonMap(s,
        KgPipeline.links(s, KgPipeline.sentenceMentions(docs))).count() }
      t("triples+c") { KgPipeline.triples(s, docs, sentenceLevel = true,
        canonicalize = true).count() }
      s.stop()
    }
  }
}
