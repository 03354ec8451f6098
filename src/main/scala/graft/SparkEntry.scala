package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` run on the driver's testdata tables (sfDir); each has a
  * DuckDB-oracle twin in `oracleSql` with IDENTICAL output column names
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the KG extraction stage over a deterministic synthetic
    * source-code corpus (BASELINE.json input_hint shape); driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val files = fixtures.FilesGen.dataset(spark, 500L)
    graft.extract.Extraction.triples(
      graft.extract.Extraction.extract(files)).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S5 corpus-profile analog (/root/reference/python.py:552-562):
    // per-group count / sum / min / max / avg.
    "profile_agg" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      t(dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(min(col("l_extendedprice")), 4).as("min_price"),
          round(max(col("l_extendedprice")), 4).as("max_price"),
          round(avg(col("l_discount")), 6).as("avg_disc")
        )
    }),
    // T9 token-count guard column (/root/reference/app.py:48-49):
    // whitespace tokenization, words × 1.3 heuristic.
    "text_tokens" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      t(dir, "documents")
        .select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"),
          floor(size(split(trim(col("text")), "\\s+")) * 1.3).cast("int")
            .as("est_llm_tokens")
        )
    })
  )

  def oracleSql: Map[String, String] = Map(
    "profile_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price,
        |  round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  CAST(floor(len(regexp_split_to_array(trim(text), '\s+')) * 1.3) AS INT) AS est_llm_tokens
        |FROM documents""".stripMargin
  )
}
