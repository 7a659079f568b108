package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{Tables, XmlCorpus}

/** Scratch profiler for the S5 XML path: times the fixture synthesis
  * alone, each xpath stage incrementally, and the full `articles`
  * extraction, to locate where `s5_xml`'s per-row cost sits (usage:
  * `runMain graft.tools.XmlProbe <sfDir>`).
  */
object XmlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def synth = Tables.documents(spark, dir).select(col("doc_id"),
      XmlCorpus.syntheticArticleXml(col("doc_id"), col("lang"), col("text")).as("xml"))

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[xmlprobe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }

    time("synth-only") {
      synth.select(sum(length(col("xml")))).as[Long].collect().head
    }
    time("synth+isArticle") {
      synth.filter(XmlCorpus.isArticle(col("xml"))).count()
    }
    time("synth+body-xpath") {
      synth.select(sum(size(call_function("xpath", col("xml"),
        lit("/item/corpus//text()"))))).as[Long].collect().head
    }
    // interleaved A/B: single-parse kernel vs built-in-xpath twin — the
    // per-pass alternation is what makes the comparison contention-robust
    (1 to 4).foreach { pass =>
      var t0 = System.nanoTime()
      val nk = XmlCorpus.articles(synth)
        .select(sum(length(col("content")))).as[Long].collect().head
      val tk = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nt = XmlCorpus.articlesXpathTwin(synth)
        .select(sum(length(col("content")))).as[Long].collect().head
      val tt = (System.nanoTime() - t0) / 1e9
      println(f"[xmlprobe] pass$pass kernel $tk%.2f s vs twin $tt%.2f s (n=$nk/$nt)")
    }
    spark.stop()
  }
}
