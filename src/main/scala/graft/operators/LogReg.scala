package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: distributed model training — batch gradient descent for a
  * logistic-style classifier (predict lang='en' from document shape
  * features), the quality-classifier TRAINING pass that complements
  * q85 (which SCORES with fixed weights) and q88 (DSIR importance).
  *
  * Each GD round is one map-side-combined aggregation: per-row
  * gradient contributions accumulate in DECIMAL (order-independent),
  * weights round to 12 dp before the next round — the q74 chained-
  * iteration discipline, so the DuckDB oracle replays ALL rounds as
  * chained CTEs bit-for-bit.
  *
  * Determinism choice: the link is the rational "fast sigmoid"
  * σ̃(z) = 0.5 + z/(2(1+|z|)) — only +,−,×,÷,|·| (IEEE-identical on
  * both engines), no exp(): transcendental libm last-ulp divergence
  * would otherwise poison round-to-round parity. σ̃ is a standard
  * cheap sigmoid substitute; its decision boundary (z = 0) is the
  * logistic one, so reported accuracy is exact-arithmetic.
  *
  * Scale: weights are a handful of driver scalars folded back as
  * literals into the next round's scan — the only "state" is O(dims);
  * rounds scale like q74's (one exchange each).
  *
  * Fixture honesty: the synthetic corpus draws text length
  * independently of language (label/feature means differ <2%), so the
  * Bayes-optimal linear model here IS the majority-class boundary —
  * which is exactly what GD converges to (all-negative weights,
  * accuracy = majority share). LogRegSpec asserts that convergence;
  * the operator's claim is the exact distributed-training mechanism,
  * not a separable toy. */
object LogReg {

  private val Lr = 1.0
  private val Rounds = 3

  /** Q132: 3 GD rounds; output = learned weights + exact training
    * accuracy of the final boundary. */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    val feats = Tables.t(s, dir, "documents").select(
      (col("n_chars").cast("double") / 1000.0).as("x1"),
      (size(split(col("text"), " ")).cast("double") / 100.0).as("x2"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      .localCheckpoint() // 3 rounds + accuracy re-read this tiny frame
    val n = feats.count().toDouble

    def sig(z: org.apache.spark.sql.Column) =
      lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

    var (w1, w2, b) = (0.0, 0.0, 0.0)
    for (_ <- 1 to Rounds) {
      val z = lit(w1) * col("x1") + lit(w2) * col("x2") + lit(b)
      val err = sig(z) - col("y")
      val g = feats.agg(
        sum((err * col("x1")).cast("decimal(28,12)")).cast("double").as("g1"),
        sum((err * col("x2")).cast("decimal(28,12)")).cast("double").as("g2"),
        sum(err.cast("decimal(28,12)")).cast("double").as("gb"))
        .collect()(0)
      w1 = BigDecimal(w1 - Lr * g.getDouble(0) / n)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      w2 = BigDecimal(w2 - Lr * g.getDouble(1) / n)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      b = BigDecimal(b - Lr * g.getDouble(2) / n)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val z = lit(w1) * col("x1") + lit(w2) * col("x2") + lit(b)
    feats.agg(
      round(lit(w1), 12).as("w1"), round(lit(w2), 12).as("w2"),
      round(lit(b), 12).as("bias"),
      sum(when((z > 0) === (col("y") === 1.0), 1L).otherwise(0L))
        .cast("long").as("n_correct"),
      count(lit(1)).as("n"))
  }

  /** Oracle: the three rounds as chained CTEs over the same features —
    * decimal gradient sums, 12-dp weight rounding, rational sigmoid. */
  private val q132Sql = {
    def round1(prev: String, out: String): String =
      s"""g_$out AS (
         |  SELECT
         |    CAST(SUM(CAST(((0.5 + (w1*x1 + w2*x2 + b) /
         |      (2.0 * (1.0 + ABS(w1*x1 + w2*x2 + b)))) - y) * x1
         |      AS DECIMAL(28,12))) AS DOUBLE) AS g1,
         |    CAST(SUM(CAST(((0.5 + (w1*x1 + w2*x2 + b) /
         |      (2.0 * (1.0 + ABS(w1*x1 + w2*x2 + b)))) - y) * x2
         |      AS DECIMAL(28,12))) AS DOUBLE) AS g2,
         |    CAST(SUM(CAST(((0.5 + (w1*x1 + w2*x2 + b) /
         |      (2.0 * (1.0 + ABS(w1*x1 + w2*x2 + b)))) - y)
         |      AS DECIMAL(28,12))) AS DOUBLE) AS gb
         |  FROM feats CROSS JOIN $prev),
         |$out AS (
         |  SELECT ROUND(w1 - 1.0 * g1 / nn.n, 12) AS w1,
         |         ROUND(w2 - 1.0 * g2 / nn.n, 12) AS w2,
         |         ROUND(b - 1.0 * gb / nn.n, 12) AS b
         |  FROM g_$out CROSS JOIN $prev CROSS JOIN nn)""".stripMargin
    s"""WITH feats AS (
       |  SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS x2,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feats),
       |r0 AS (SELECT 0.0::DOUBLE AS w1, 0.0::DOUBLE AS w2, 0.0::DOUBLE AS b),
       |${round1("r0", "r1")},
       |${round1("r1", "r2")},
       |${round1("r2", "r3")}
       |SELECT ROUND(w1, 12) AS w1, ROUND(w2, 12) AS w2, ROUND(b, 12) AS bias,
       |  CAST(SUM(CASE WHEN ((w1*x1 + w2*x2 + b) > 0) = (y = 1.0)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  COUNT(*) AS n
       |FROM feats CROSS JOIN r3
       |GROUP BY w1, w2, b""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q132_logreg_train", q132, Some(q132Sql)))
}
