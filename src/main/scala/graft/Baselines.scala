package graft

import scala.jdk.CollectionConverters.ListHasAsScala

/** Latest per-query sf0.1 baselines parsed from `BASELINE.md`.
  *
  * The ledger markdown is the single source of truth for recorded
  * baselines — parsing it at runtime (instead of maintaining a second
  * machine-readable file) means a re-baselining addendum is picked up
  * by the Bench >2× self-adjudication (VERDICT r11 #2) and the
  * OpsServer `/api/v1/baseline` endpoint the moment it is written,
  * with nothing to go stale.
  *
  * Parse contract (matches every baseline-recording table shape the
  * ledger has used through r12):
  *   - a header row `| Query | ... |` selects the baseline column —
  *     the first cell containing `(baseline)`, or exactly `sec/query`,
  *     `sf0.1 s`, or `after` (the before/after re-pin tables); tables
  *     without such a column (A/B history, adjudication notes) are
  *     skipped wholesale;
  *   - if the table carries an `sf` column, only `0.1` rows count;
  *   - a row name may carry a ` sf0.1` / ` sf1` suffix (the re-pin
  *     tables); only bare or ` sf0.1` rows count;
  *   - a `| qname | <sf> | <sec> | local[...] config | date |` row is
  *     recognized by SHAPE, independent of the current header — the r8
  *     full re-baseline board was appended without its own header row,
  *     and the config cell makes the shape unambiguous;
  *   - the LAST occurrence in file order wins — addenda re-baseline by
  *     appending, never by editing history.
  */
object Baselines {

  def parse(path: java.nio.file.Path =
      java.nio.file.Paths.get("BASELINE.md")): Map[String, Double] = {
    if (!java.nio.file.Files.exists(path)) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    var colIdx = -1
    var sfIdx = -1
    java.nio.file.Files.readAllLines(path).asScala
      .filter(_.startsWith("|")).foreach { line =>
        val cells = line.split("\\|", -1).map(_.trim)
        if (cells.length > 1 && cells(1) == "Query") {
          colIdx = cells.indexWhere(c => c.contains("(baseline)") ||
            c == "sec/query" || c == "sf0.1 s" || c == "after")
          sfIdx = cells.indexWhere(_ == "sf")
        } else if (cells.length > 1 && !cells(1).startsWith("q") &&
            !cells(1).matches("[-: ]*")) {
          // any OTHER header-like row (first cell is neither a q-name,
          // nor the recognized 'Query' header, nor a |---| separator)
          // ends the current column mapping: a future table headed
          // e.g. 'Family' must not have its q-rows parsed under the
          // previous table's columns (r12 ADVICE)
          colIdx = -1
          sfIdx = -1
        } else if (cells.length > 4 && cells(1).startsWith("q") &&
            Set("0.001", "0.01", "0.1", "1").contains(cells(2)) &&
            cells(4).contains("local[")) {
          if (cells(2) == "0.1") {
            try out(cells(1)) = cells(3).toDouble
            catch { case _: NumberFormatException => () }
          }
        } else if (colIdx > 0 && cells.length > colIdx &&
            cells(1).startsWith("q")) {
          val nameCell = cells(1)
          val name = nameCell.split("\\s+")(0)
          val sfOk =
            (sfIdx < 0 || (cells.length > sfIdx && cells(sfIdx) == "0.1")) &&
              (nameCell == name || nameCell.endsWith(" sf0.1"))
          if (sfOk) {
            try out(name) = cells(colIdx).split("\\s+")(0).toDouble
            catch { case _: NumberFormatException => () }
          }
        }
      }
    out.toMap
  }
}
