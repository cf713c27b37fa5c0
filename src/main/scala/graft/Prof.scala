package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query timing (`runMain graft.Prof q07_tpch_q1 ...`) or,
  * with no args, a plan audit over the whole registry — counts of
  * exchanges / broadcasts / codegen spans and cartesian-product flags,
  * for eyeballing scale red flags after plan changes.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.nonEmpty) {
      args.foreach { n =>
        val warm = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"PROF $n ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"(warm ${(t0 - warm) / 1e9}%.2f)")
      }
    } else {
      def count(plan: String, pat: String): Int =
        pat.r.findAllIn(plan).length
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        try {
          val plan = SparkEntry.queries(n)(spark, sfDir)
            .queryExecution.executedPlan.toString
          val flags = Seq(
            if (plan.contains("CartesianProduct")) "CARTESIAN" else "",
            if (plan.contains("BroadcastNestedLoopJoin")) "BNLJ" else "")
            .filter(_.nonEmpty).mkString(",")
          println(f"AUDIT $n%-24s hashEx=${count(plan, "Exchange hashpartitioning")}%2d " +
            f"rangeEx=${count(plan, "Exchange rangepartitioning")}%2d " +
            f"bcast=${count(plan, "BroadcastHashJoin")}%2d " +
            f"smj=${count(plan, "SortMergeJoin")}%2d " +
            f"wsc=${count(plan, "WholeStageCodegen")}%2d $flags")
        } catch {
          case e: Throwable => println(s"AUDIT $n ERROR ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
