package graft

/** Dev tool: print the committed board's per-query ratio to the latest
  * ledger baseline ([[Baselines.parse]]) — the round-closing stats the
  * self-adjudication gate uses, as one summary line — plus the board's
  * own anchor/window stamp (written by [[Bench]] since r15) so a noisy
  * container window is machine-visible without re-deriving it.
  *
  * Parses the board with a real JSON parser (json4s-jackson, already on
  * the Spark classpath) instead of the r14 regex slice, which broke on
  * any nesting inside `queries` and threw on an empty board (r14
  * ADVICE). An empty or baseline-less board prints explicit zeros.
  */
object BoardStats {
  def main(args: Array[String]): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val path = args.headOption.getOrElse("BENCH_BOARD.json")
    val base = Baselines.parse()
    val root = JsonMethods.parse(scala.io.Source.fromFile(path).mkString)
    def numMap(field: String): Map[String, Double] = root \ field match {
      case JObject(fs) => fs.collect {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
        case (k, JLong(v)) => k -> v.toDouble
      }.toMap
      case _ => Map.empty
    }
    val board = numMap("queries").filter(_._2 >= 0)
    val ratios = board.toSeq
      .flatMap { case (k, v) => base.get(k).map(bl => (k, v / bl)) }
      .sortBy(_._2)
    if (ratios.isEmpty) {
      println(s"rows=0 (board ${board.size} entries, " +
        s"baselines ${base.size}) — nothing to compare")
    } else {
      println(s"rows=${ratios.size} median=${ratios(ratios.size / 2)._2}")
      println(s"above2x=${ratios.count(_._2 > 2)} " +
        ratios.filter(_._2 > 2).map(r => f"${r._1}=${r._2}%.2f").mkString(","))
      println("worst5=" + ratios.takeRight(5)
        .map(r => f"${r._1}=${r._2}%.2f").mkString(","))
    }
    // the board's own window stamp (absent on pre-r15 boards): anchors
    // are ratio-to-ledger AT RUN TIME, so they classify the container
    // window the board was recorded in, not the window BoardStats runs in
    val anchors = numMap("anchors")
    root \ "window" match {
      case JString(w) =>
        println(s"window=$w anchors=" + anchors.toSeq.sorted
          .map(a => f"${a._1}=${a._2}%.2f").mkString(","))
        if (w == "noisy")
          println("WARNING: board recorded in a noisy window — " +
            "compare against ledger baselines only, not round-over-round")
      case _ => println("window=unstamped board")
    }
  }
}
