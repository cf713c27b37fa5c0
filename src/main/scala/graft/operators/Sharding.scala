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
  // ---------------------------------------------------- load-aware HRW
  /** 60-bit md5 weight of (key, virtual node shard:rep). */
  private def vWeight(id: Column, shard: Int, rep: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s"#$shard:$rep"))),
      1, 15), 16, 10).cast("long")

  /** PUBLIC API — WEIGHTED rendezvous shard: shard `i` holds
    * `weights(i)` virtual nodes and a key lives wherever its highest
    * virtual-node weight falls, so expected share is EXACTLY
    * weights(i)/Σweights — the stateless analogue of the reference's
    * load-aware slot allocator (celeborn
    * master/.../SlotsAllocator.java:105-181 + docs/developers/
    * slotsallocation.md: disks grouped by observed flush/fetch cost,
    * faster groups granted gradient-many more slots). Integer virtual
    * nodes rather than the float −w/ln(u) scaling keep the assignment
    * md5-integer-deterministic (SQL-replayable, no libm parity risk).
    * Movement law (ShardingSpec): raising one shard's weight moves
    * ONLY keys into that shard — the HRW minimal-movement property
    * survives weighting, where weighted mod-N re-maps everything. */
  def hrwShardWeighted(id: Column, weights: Seq[Int]): Column = {
    require(weights.nonEmpty && weights.forall(_ >= 0) && weights.sum > 0,
      "need non-negative weights with a positive sum")
    val nodes = weights.zipWithIndex.flatMap { case (m, sIdx) =>
      (0 until m).map(r => struct(vWeight(id, sIdx, r).as("w"), lit(sIdx).as("s")))
    }
    array_max(array(nodes: _*)).getField("s")
  }

  /** PUBLIC API — observed per-shard costs → inverse-proportional
    * integer weights (a 2×-cost shard gets ~half the share): the
    * engine-side mirror of the reference's cost-gradient disk groups.
    * `resolution` bounds the virtual-node count (expression width). */
  def costWeights(costs: Seq[Double], resolution: Int = 8): Seq[Int] = {
    require(costs.forall(_ > 0), "costs must be positive")
    val mn = costs.min
    costs.map(c => math.max(1, math.round(resolution * mn / c).toInt))
  }

  /** q146: per-shard populations when shard 0 is granted DOUBLE weight
    * (2 virtual nodes, others 1 — the load-aware re-plan for one fast
    * shard) vs the uniform all-ones assignment, plus the rebalance
    * differential: moved_in counts docs whose assignment changed,
    * attributed to the shard they moved INTO. The weighted minimal-
    * movement law is visible in the data: moved_in = 0 everywhere
    * except shard 0 (asserted in ShardingSpec; the oracle replays the
    * full computation). */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val uni = Seq.fill(8)(1)
    val wtd = 2 +: Seq.fill(7)(1)
    val assigned = Tables.t(s, dir, "documents").select(
      hrwShardWeighted(col("doc_id"), uni).as("su"),
      hrwShardWeighted(col("doc_id"), wtd).as("sw"))
    assigned.select(explode(array(
        struct(col("su").as("shard"), lit(1L).as("cu"), lit(0L).as("cw"),
          lit(0L).as("mv")),
        struct(col("sw").as("shard"), lit(0L).as("cu"), lit(1L).as("cw"),
          when(col("su") =!= col("sw"), 1L).otherwise(0L).as("mv")))).as("e"))
      .groupBy(col("e.shard").as("shard"))
      .agg(sum(col("e.cu")).as("n_uniform"), sum(col("e.cw")).as("n_weighted"),
        sum(col("e.mv")).as("moved_in"))
      .orderBy(col("shard").asc_nulls_last)
  }

  private val q146Sql =
    """WITH vn AS (
      |  SELECT unnest(range(0, 8)) AS s, 0 AS r
      |  UNION ALL SELECT 0, 1),
      |w AS (
      |  SELECT doc_id, s, r,
      |    ('0x' || substr(md5(doc_id::VARCHAR || '#' || s::VARCHAR || ':' || r::VARCHAR), 1, 15))::BIGINT AS w
      |  FROM documents CROSS JOIN vn),
      |au AS (SELECT doc_id, arg_max(s, w) AS su FROM w WHERE r = 0 GROUP BY doc_id),
      |aw AS (SELECT doc_id, arg_max(s, w) AS sw FROM w GROUP BY doc_id),
      |asn AS (SELECT au.doc_id, su, sw FROM au JOIN aw ON au.doc_id = aw.doc_id),
      |e AS (
      |  SELECT su AS shard, 1 AS cu, 0 AS cw, 0 AS mv FROM asn
      |  UNION ALL
      |  SELECT sw, 0, 1, CASE WHEN su <> sw THEN 1 ELSE 0 END FROM asn)
      |SELECT CAST(shard AS INT) AS shard, CAST(SUM(cu) AS BIGINT) AS n_uniform,
      |  CAST(SUM(cw) AS BIGINT) AS n_weighted, CAST(SUM(mv) AS BIGINT) AS moved_in
      |FROM e GROUP BY shard ORDER BY shard ASC NULLS LAST""".stripMargin

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
    QueryDef("q96_hrw_shards", q96, Some(q96Sql)),
    QueryDef("q146_weighted_shards", q146, Some(q146Sql)))
}
