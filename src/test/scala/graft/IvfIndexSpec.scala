package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF with the k-means-trained quantizer on a CLUSTERED fixture — the
  * regime the quantizer exists for (the sf tables' near-orthogonal
  * vectors need deep probing by construction; production embeddings
  * cluster). Asserts the two scale claims: recall@5 ≥ 0.9 while probing
  * only 4 of 16 lists, and a persisted index whose probe plan prunes
  * partitions dynamically instead of scanning every posting list.
  */
class IvfIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Dim = 64
  private val NClusters = 8
  private val PerCluster = 60

  /** Deterministic pseudo-random double in [-1, 1] from a label. */
  private def h(label: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(label.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 2001L - 1000L) / 1000.0
  }

  /** 8 well-separated cluster centers; members = center + 10 % noise. */
  private lazy val clustered: DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until NClusters
      i <- 0 until PerCluster
    } yield {
      val id = (c * PerCluster + i).toLong
      val emb = Array.tabulate(Dim) { d =>
        (h(s"center:$c:$d") + 0.1 * h(s"noise:$id:$d")).toFloat
      }
      (id, emb)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trained quantizer reaches recall@5 >= 0.9 probing 4 of 16 lists") {
    val queries = clustered.where(col("vec_id") % 48 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val brute = operators.Similarity.annBruteTopK(spark, clustered, queries)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ivf = operators.Similarity.annIvfTopK(spark, clustered,
        col("vec_id") % 48 === 0, nCentroids = 16, nProbe = 4, trainIters = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val recall = brute.count(ivf.contains).toDouble / brute.length
    assert(recall >= 0.9, s"recall@5 $recall with nProbe=4 of 16")
  }

  test("persisted index probe prunes partitions dynamically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val cent = operators.Similarity.buildIvfIndex(spark, clustered, dir,
      nCentroids = 16, trainIters = 3)
    // one directory per posting list
    val parts = new java.io.File(dir).listFiles.count(_.getName.startsWith("c_id="))
    assert(parts > 4, s"expected >4 posting-list partitions, got $parts")
    val queries = clustered.where(col("vec_id") % 48 === 0)
    val probed = operators.Similarity.probeIvfIndex(spark, dir, cent,
      queries, nProbe = 4)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"probe scan should carry a dynamicpruning PartitionFilter:\n$plan")
    // and the pruned probe still finds the same neighbours as in-memory IVF
    val inMem = operators.Similarity.annIvfTopK(spark, clustered,
        col("vec_id") % 48 === 0, nCentroids = 16, nProbe = 4, trainIters = 3)
      .collect()
    assert(probed.collect().sameElements(inMem))
  }
}
