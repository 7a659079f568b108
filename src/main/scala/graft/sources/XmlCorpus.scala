package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** S5 — XML training-corpus ingest (reference
  * `CustomModelTrainingExample.ipynb` cells 2-7), with NO external XML jar:
  * Spark's built-in Catalyst XPath expressions (`xpath`, `xpath_string`)
  * operate on the raw XML string column, so the whole extraction stays
  * inside a codegen'd projection.
  *
  * Reference semantics reproduced:
  *  - articles are rows whose `./item/category@scope == "cms-article"`;
  *  - text = every text node under `./item/corpus` in document order,
  *    joined with single spaces, EXCEPT the text of `<location>` and
  *    `<em class="source">` nodes inside bodytext paragraphs (the notebook
  *    blanks `node.text` in place; we exclude those text nodes via XPath —
  *    equivalent after whitespace collapse for element-free datelines,
  *    which is all the reference corpus contains);
  *  - label = `./item/related[@rel='department']/directory/meta/
  *    id[@scope='url']` text;
  *  - the pair is serialized as a fasttext line `__label__<id> <text>`
  *    after the P1-P3 cleanup chain.
  */
object XmlCorpus {

  private val bodyTextXpath =
    "/item/corpus//text()[" +
      "not(parent::location[parent::p[@class=\"bodytext\"]]) and " +
      "not(parent::em[@class=\"source\"][parent::p[@class=\"bodytext\"]])]"

  private val departmentXpath =
    "/item/related[@rel=\"department\"]/directory/meta/id[@scope=\"url\"]"

  def isArticle(xml: Column): Column =
    expr_xpath_string(xml, "/item/category/@scope") === "cms-article"

  private def expr_xpath_string(c: Column, path: String): Column =
    call_function("xpath_string", c, lit(path))

  private def expr_xpath(c: Column, path: String): Column =
    call_function("xpath", c, lit(path))

  /** (keys..., department, content) from a raw `xml` string column; rows
    * that are not cms-articles or carry no department are dropped, like
    * the notebook's early returns.
    */
  def articles(df: DataFrame, xmlCol: String = "xml"): DataFrame =
    df.filter(isArticle(col(xmlCol)))
      .withColumn("content",
        Text.datelineStrip(Text.cleanup(
          array_join(expr_xpath(col(xmlCol), bodyTextXpath), " "))))
      .withColumn("department",
        Text.cleanup(expr_xpath_string(col(xmlCol), departmentXpath)))
      .filter(length(trim(col("department"))) > 0)
      .drop(xmlCol)

  /** fasttext serialization `__label__<dept> <text>` (notebook cell 7). */
  def fasttextLine(df: DataFrame): DataFrame =
    df.select(concat(lit("__label__"), trim(col("department")), lit(" "),
      trim(col("content"))).as("line"))
}
