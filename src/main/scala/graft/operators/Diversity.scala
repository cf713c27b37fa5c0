package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: corpus diversity profiling — the per-slice
  * information-theoretic report a data curation team watches while
  * mixing sources: Shannon entropy of each source's token distribution
  * (is a source degenerate/repetitive?) and the Gini coefficient of
  * its document-length distribution (is the mass concentrated in a few
  * giants?).
  *
  * Determinism: entropy terms −p·ln p and the Gini rank products are
  * per-row doubles (ln parity across engines is the established q57/q72
  * discipline) accumulated in DECIMAL so partition order cannot move
  * the sum; Gini uses the sorted-rank identity
  * G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n, with the rank window ordered
  * (n_chars, doc_id) — ties swap equal x values, leaving Σ i·x₍ᵢ₎
  * unchanged.
  *
  * Plan shape: one token explode → (source, token) count (map-side
  * combined, the q67 frame) → source-keyed entropy fold; one doc-level
  * rank window per source + decimal fold for Gini. Nothing collects;
  * output is |sources| rows. */
object Diversity {

  /** Q140: per-source token entropy + document-length Gini. */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val tot = tf.groupBy(col("source"))
      .agg(sum(col("c")).cast("double").as("nt"),
        count(lit(1)).as("vocab"))
    val p = col("c").cast("double") / col("nt")
    val entropy = tf.join(broadcast(tot), Seq("source"))
      .groupBy(col("source"))
      .agg(sum((-p * log(p)).cast("decimal(28,15)")).cast("double").as("h"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").asc_nulls_last, col("doc_id").asc_nulls_last)
    val gini = docs.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("i", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("n_chars").cast("decimal(28,2)")).cast("double").as("sx"),
        sum((col("i") * col("n_chars")).cast("decimal(28,2)"))
          .cast("double").as("six"))
      .select(col("source"), col("n").cast("long").as("n_docs"),
        round(lit(2.0) * col("six") / (col("n") * col("sx")) -
          (col("n") + lit(1.0)) / col("n"), 9).as("gini"))
    gini.join(entropy, Seq("source"))
      .join(tot.select(col("source"), col("vocab")), Seq("source"))
      .select(col("source"), col("n_docs"), col("vocab"),
        round(col("h"), 9).as("entropy"), col("gini"))
      .orderBy(col("source").asc_nulls_last)
  }

  private val q140Sql =
    """WITH tf AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |cnt AS (SELECT source, tok, COUNT(*) AS c FROM tf GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(c) AS DOUBLE) AS nt,
      |  COUNT(*) AS vocab FROM cnt GROUP BY source),
      |ent AS (
      |  SELECT cnt.source,
      |    CAST(SUM(CAST(-(CAST(c AS DOUBLE) / nt) * ln(CAST(c AS DOUBLE) / nt)
      |      AS DECIMAL(28,15))) AS DOUBLE) AS h
      |  FROM cnt JOIN tot ON cnt.source = tot.source
      |  GROUP BY cnt.source),
      |ranked AS (
      |  SELECT source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars ASC, doc_id ASC) AS i
      |  FROM documents),
      |gini AS (
      |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(n_chars AS DECIMAL(28,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(i * n_chars AS DECIMAL(28,2))) AS DOUBLE) AS six
      |  FROM ranked GROUP BY source)
      |SELECT g.source, CAST(g.n AS BIGINT) AS n_docs, t.vocab,
      |  ROUND(e.h, 9) AS entropy,
      |  ROUND(2.0 * g.six / (g.n * g.sx) - (g.n + 1.0) / g.n, 9) AS gini
      |FROM gini g JOIN ent e ON g.source = e.source
      |  JOIN tot t ON g.source = t.source
      |ORDER BY g.source ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q140_diversity", q140, Some(q140Sql)))
}
