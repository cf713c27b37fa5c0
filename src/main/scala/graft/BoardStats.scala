package graft

/** Dev tool: print the committed board's per-query ratio to the latest
  * ledger baseline ([[Baselines.parse]]) — the round-closing stats the
  * self-adjudication gate uses, as one summary line. */
object BoardStats {
  def main(args: Array[String]): Unit = {
    val base = Baselines.parse()
    val s = scala.io.Source.fromFile("BENCH_BOARD.json").mkString
    val q = s.split("\"queries\":\\{")(1).split("\\}")(0)
    val board = q.split(",").map { kv =>
      val a = kv.split("\":")
      (a(0).drop(1), a(1).toDouble)
    }.toMap
    val ratios = board.toSeq
      .flatMap { case (k, v) => base.get(k).map(bl => (k, v / bl)) }
      .sortBy(_._2)
    println(s"rows=${ratios.size} median=${ratios(ratios.size / 2)._2}")
    println(s"above2x=${ratios.count(_._2 > 2)} " +
      ratios.filter(_._2 > 2).map(r => f"${r._1}=${r._2}%.2f").mkString(","))
    println("worst5=" + ratios.takeRight(5).map(r => f"${r._1}=${r._2}%.2f").mkString(","))
  }
}
