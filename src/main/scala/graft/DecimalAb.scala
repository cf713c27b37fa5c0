package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: prototype measurement for the r13h finding that Spark's
  * DECIMAL(38,12) sum path (JavaBigDecimal per row inside hash agg)
  * is an order of magnitude off DuckDB's int128 AT EQUAL CORES. The
  * candidate fix for the hot moment-sum family: scale each term to an
  * integer (here 1e-4 units for decimal(12,2)·decimal(12,2) products),
  * split at radix 2^30 (shiftright/bitwiseAND) into hi/lo halves, sum
  * BOTH as plain longs (codegen integer adds; bounds: Σlo < 2^30·rows
  * ≈ 6.4e16 at sf10's 6e7 rows, Σhi < (maxterm·1e4/2^30)·rows ≈
  * 6e7·rows ≪ 2^63 — both safe), and recombine Σhi·2^30 + Σlo in
  * DECIMAL once per GROUP. Exactness is bit-identical to the decimal accumulate — same
  * integers, one final exact combine — and the DuckDB mirror is the
  * same two integer sums, so oracle parity survives.
  *
  * `runMain graft.DecimalAb` times the q164 moment kernel both ways
  * on SPARK_GRAFT_SF_DIR lineitem (15 sums, grouped by returnflag).
  */
object DecimalAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val base = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g") +: cols.map(col): _*)
    val terms = cols.map(c => col(c) * col(c)) ++
      cols.combinations(2).map { case Seq(a, b) => col(a) * col(b) }.toSeq ++
      cols.map(col)
    def timed(label: String)(aggs: Seq[org.apache.spark.sql.Column]): Unit = {
      def once(): Unit = base.groupBy(col("g"))
        .agg(aggs.head, aggs.tail: _*)
        .write.format("noop").mode("overwrite").save()
      once() // warm
      val t0 = System.nanoTime()
      once()
      println(f"DECIMAL_AB $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("decimal38") {
      terms.zipWithIndex.map { case (t, i) =>
        sum(t.cast("decimal(38,12)")).as(s"s$i") }
    }
    timed("paired_longs") {
      // terms are products of decimal(12,2) pairs = exact multiples of
      // 1e-4: scale by 1e4 to integer units, split at 2^30 (shift/mask
      // — Column./ would be double division); recombine Σhi·2^30 + Σlo
      // in decimal once per group (3 rows here, untimed noise)
      terms.zipWithIndex.flatMap { case (t, i) =>
        val u = (t * lit(10000)).cast("long")
        Seq(sum(shiftright(u, 30)).as(s"hi$i"),
          sum(u.bitwiseAND(lit((1L << 30) - 1))).as(s"lo$i"))
      }
    }
    spark.stop()
  }
}
