package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print one registry query's EXECUTED (post-AQE) plan at a
  * given SF dir (`runMain graft.PlanPeek q160_containment`) — the raw
  * text the PlanContractSpec counters summarize, for eyeballing WHERE
  * a shuffle/join/scan sits when a contract row changes. SPARK_GRAFT_SF_DIR
  * picks the corpus (default sf0.01).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
  }
}
