package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — stateless consistent
  * placement for exports and keyed storage. Every (key, shard) pair
  * gets a deterministic 60-bit md5 weight; a key lives on the shard
  * with the highest weight. The HRW property that matters at 100 TB:
  * growing N shards to N+1 moves EXACTLY the keys the new shard wins
  * (≈ 1/(N+1) of them, each to the new shard only — old shards never
  * trade keys with each other), so a re-shard rewrites 1/(N+1) of the
  * data. Mod-N sharding (q76's static manifest layout) moves (N-1)/N
  * of ALL keys on the same change — a full-corpus rewrite.
  *
  * Scale shape: the assignment is a MAP-ONLY codegen'd expression — an
  * unrolled N-wide array of (weight, shard) structs folded with
  * array_max; no shuffle, no side table, no state. The registry query's
  * only exchange is the final shard-keyed count (≤ N+1 rows after
  * map-side combine). The same column works as a `partitionBy` key in
  * any sink.
  *
  * Reference anchor: slot placement across workers
  * (celeborn: master/.../SlotsAllocator.java:63 round-robin, :105
  * load-aware) solves the same placement problem statefully via the
  * master; HRW is the stateless engine-side equivalent a pure library
  * can offer.
  */
object Sharding {

  /** 60-bit positive md5 weight of (key, shard) — same hex-prefix
    * convention as the SimHash bit hashes, so DuckDB replays it. */
  private def weight(id: Column, shard: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit("#"), lit(shard.toString))),
      1, 15), 16, 10).cast("long")

  /** PUBLIC API — the HRW shard of `id` among `n` shards (0-based).
    * Pure, deterministic, map-only; ties are impossible in practice
    * (60-bit weights). */
  def hrwShard(id: Column, n: Int): Column = {
    require(n > 0, "need at least one shard")
    array_max(array((0 until n).map(sIdx =>
      struct(weight(id, sIdx).as("w"), lit(sIdx).as("s"))): _*))
      .getField("s")
  }

  /** q96: per-shard populations under N=8 and N=9 plus the rebalance
    * differential — `moved_in` counts docs whose assignment changed
    * going 8→9, attributed to the shard they moved INTO. The HRW
    * minimal-movement law shows up in the data itself: moved_in is 0
    * for shards 0–7 and equals n9 for shard 8 (asserted as a property
    * in ShardingSpec; the oracle replays the full computation). */
  private def q96(s: SparkSession, dir: String): DataFrame = {
    val assigned = Tables.t(s, dir, "documents").select(
      hrwShard(col("doc_id"), 8).as("s8"),
      hrwShard(col("doc_id"), 9).as("s9"))
    assigned.select(explode(array(
        struct(col("s8").as("shard"), lit(1L).as("c8"), lit(0L).as("c9"),
          lit(0L).as("mv")),
        struct(col("s9").as("shard"), lit(0L).as("c8"), lit(1L).as("c9"),
          when(col("s8") =!= col("s9"), 1L).otherwise(0L).as("mv")))).as("e"))
      .groupBy(col("e.shard").as("shard"))
      .agg(sum(col("e.c8")).as("n8"), sum(col("e.c9")).as("n9"),
        sum(col("e.mv")).as("moved_in"))
      .orderBy(col("shard").asc_nulls_last)
  }

  private val q96Sql =
    """WITH sh AS (SELECT unnest(range(0, 9)) AS s),
      |w AS (
      |  SELECT doc_id, s,
      |    ('0x' || substr(md5(doc_id::VARCHAR || '#' || s::VARCHAR), 1, 15))::BIGINT AS w
      |  FROM documents CROSS JOIN sh),
      |a8 AS (SELECT doc_id, arg_max(s, w) AS s8 FROM w WHERE s < 8 GROUP BY doc_id),
      |a9 AS (SELECT doc_id, arg_max(s, w) AS s9 FROM w GROUP BY doc_id),
      |asn AS (SELECT a8.doc_id, s8, s9 FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id),
      |e AS (
      |  SELECT s8 AS shard, 1 AS c8, 0 AS c9, 0 AS mv FROM asn
      |  UNION ALL
      |  SELECT s9, 0, 1, CASE WHEN s8 <> s9 THEN 1 ELSE 0 END FROM asn)
      |SELECT CAST(shard AS INT) AS shard, CAST(SUM(c8) AS BIGINT) AS n8,
      |  CAST(SUM(c9) AS BIGINT) AS n9, CAST(SUM(mv) AS BIGINT) AS moved_in
      |FROM e GROUP BY shard ORDER BY shard ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q96_hrw_shards", q96, Some(q96Sql)))
}
