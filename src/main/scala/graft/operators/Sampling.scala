package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: weighted sampling without replacement — the
  * quality-weighted corpus subsampling pass (sample k documents with
  * inclusion probability ∝ weight, e.g. length or a quality score)
  * via the Efraimidis–Spirakis A-ES one-pass scheme (IPL 2006):
  * key_i = u_i^(1/w_i) with u_i uniform(0,1]; the k largest keys ARE a
  * weighted sample without replacement.
  *
  * Spark-first: u_i derives from md5(doc_id) (the q96 idiom — 48-bit
  * hex prefix → (0,1]), so the "randomness" is a deterministic,
  * reproducible function of the key: the same corpus always yields the
  * same sample (what a production pipeline wants for re-runs and what
  * lets DuckDB replay the draw bit-for-bit). Scoring is map-only; the
  * k winners come from TakeOrderedAndProject — no global sort, no
  * per-partition reservoir state. */
object Sampling {

  private val K = 100
  private val Denom = math.pow(16.0, 12) + 1.0 // 48-bit space + 1 → u in (0,1]

  /** PUBLIC API — weighted sample without replacement of `k` rows.
    * `weightCol` must be positive. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int = K): DataFrame = {
    val v = conv(substring(md5(concat(lit("ws:"), col(idCol).cast("string"))),
      1, 12), 16, 10).cast("long")
    df.withColumn("u", (v.cast("double") + 1.0) / lit(Denom))
      .withColumn("key", pow(col("u"), lit(1.0) / col(weightCol)))
      .orderBy(col("key").desc_nulls_last, col(idCol).asc_nulls_last)
      .limit(k)
  }

  /** Q125: 100 documents sampled ∝ n_chars. */
  private def q125(s: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.t(s, dir, "documents"), "doc_id", "n_chars")
      .select(col("doc_id"), col("n_chars"), round(col("key"), 12).as("key"))

  private val q125Sql =
    s"""SELECT doc_id, n_chars,
       |  ROUND(POW((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 12))::BIGINT
       |      ::DOUBLE + 1.0) / ${Denom.toString},
       |    1.0 / n_chars), 12) AS key
       |FROM documents
       |ORDER BY POW((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 12))::BIGINT
       |      ::DOUBLE + 1.0) / ${Denom.toString},
       |    1.0 / n_chars) DESC NULLS LAST, doc_id ASC NULLS LAST
       |LIMIT $K""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q125_weighted_sample", q125, Some(q125Sql)))
}
