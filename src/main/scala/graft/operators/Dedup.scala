package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G7 deduplication operators over the `documents` table.
  *
  * Exact dedup is a hash group-by (exchange + first-agg — the reference's
  * dedup-set machinery writ large,
  * celeborn: client/src/main/java/org/apache/celeborn/client/read/CelebornInputStream.java:864-899).
  * Near-dup is MinHash+LSH (band-bucket join — no O(n²) pair scan),
  * an exact inverted-index n-gram Jaccard join, and SimHash with
  * pigeonhole band blocking. SimHash bit hashes are md5-derived so the
  * DuckDB oracle can replay them; MinHash uses codegen'd xxhash64 (the
  * oracle verifies its candidates by exact Jaccard, not by replaying
  * the family). No RNG anywhere — fixed seeds, deterministic output.
  *
  * Scale notes: every operator is a sequence of hash-partitioned
  * exchanges on bounded keys (shingle, band bucket) — no driver
  * collection, no cross join. Hot-shingle pair blowup at 100 TB is
  * bounded by a document-frequency cap on the posting lists (the same
  * lesson as celeborn's skew split, CelebornPartitionUtil.java:60-100).
  */
object Dedup {

  /** Word 3-gram shingle set per document (empty for docs < 3 tokens).
    * The token array is materialized ONCE per row in its own projection —
    * putting `split(text)` inside the transform lambda re-tokenizes the
    * whole document per element_at (O(tokens²) interpreted work; higher-
    * order functions are not codegen'd), which dominated the dedup
    * queries' runtime.
    *
    * Shingles are hashed to 64-bit BEFORE the distinct: every downstream
    * exchange, posting list, and set operation works on fixed-width
    * longs instead of ~25-char strings (the standard production-dedup
    * move). Set relations are preserved absent xxhash64 collisions
    * (~n²/2⁶⁵); the oracle verifies by exact string Jaccard, which
    * agrees under the same condition. */
  private[graft] def shingledHashed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"))
          .otherwise(array().cast("array<string>"))).as("s"))
      // hash AFTER the explode: inside the transform lambda xxhash64 runs
      // interpreted per element; here it's one codegen'd projection
      .select(col("doc_id"), xxhash64(col("s")).as("sh"))
      .distinct()

  /** Exact dedup: per-language doc counts, distinct texts, duplicates. */
  private def q26(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_uniq"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dups"))
      .orderBy(col("lang").asc_nulls_last)

  private val q26Sql =
    """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_uniq,
      |  COUNT(*) - COUNT(DISTINCT text) AS n_dups
      |FROM documents GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin

  /** PUBLIC API — MinHash+LSH near-duplicate pairs over any DataFrame
    * with (doc_id, text): minhash signatures, banded candidate join,
    * exact-Jaccard verification. Rows per band = nHashes / nBands;
    * candidate recall follows the standard (1/nBands)^(1/rowsPerBand)
    * S-curve. Deterministic (fixed hash seeds, fully ordered output). */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8,
      nHashes: Int = 12, nBands: Int = 6): DataFrame = {
    require(nHashes % nBands == 0, "nBands must divide nHashes")
    val rowsPerBand = nHashes / nBands
    // No .cache(): a builder returns a lazy plan, so an unpersist could
    // only run before materialization; a leaked cache accumulates executor
    // memory across the 30-query Verify/Bench sweep. Recomputing the
    // shingle scan is cheap relative to the joins; callers that iterate
    // can persist+unpersist around their own materialization.
    val sh = shingledHashed(docs)
    // xxhash64(seed, shingle) is a codegen'd bigint hash — an order of
    // magnitude cheaper than the md5-string family (the oracle verifies
    // candidates by exact Jaccard, so the min-hash family is internal
    // and only its min-wise property matters).
    val mins: Seq[Column] = (0 until nHashes).map(k =>
      min(xxhash64(lit(k), col("sh"))).as(s"m$k"))
    // ONE aggregation pass computes both the 12 min-hashes and the full
    // shingle set per doc: the three downstream consumers (bands, d1-sets,
    // d2-sets) then share an identical agg subplan, which ReuseExchange
    // dedups into a single scan+distinct+shuffle instead of re-running
    // the shingle scan per branch.
    val aggAll = sh.groupBy(col("doc_id"))
      .agg(mins.head, (mins.tail :+ collect_set(col("sh")).as("shs")): _*)
    // band key = xxhash64 over that band's signature rows. One explode
    // pass, NOT an nBands-way unionAll — union branches re-execute the
    // whole signature aggregation per band.
    val bandStructs = array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r =>
          col(s"m${rowsPerBand * b + r}")): _*).as("bk"))): _*)
    val bands = aggAll
      .select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val sets = aggAll.select(col("doc_id"), col("shs"))
    cands
      .join(sets.select(col("doc_id").as("d1"), col("shs").as("sh1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("shs").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2")))).as("jac"))
      .where(col("jac") >= threshold)
      .orderBy(col("d1").asc_nulls_last, col("d2").asc_nulls_last, col("jac").asc_nulls_last)
  }

  private def q27(s: SparkSession, dir: String): DataFrame =
    minhashPairs(Tables.t(s, dir, "documents"))

  /** Exhaustive-exact oracle via an inverted index (any pair with
    * jac > 0 shares a shingle, so no candidate is missed — equivalent to
    * the all-pairs scan but without materializing n²/2 list intersections,
    * which kept DuckDB's memory footprint an order of magnitude lower).
    * The planted near-dups sit at j≈0.99 with a wide gap below 0.2, so
    * 6×2 banding has miss probability < 1e-10 and the LSH result equals
    * the exhaustive result on this data. */
  private val q27Sql = Dedup.jaccardOracleSql(0.8)

  /** PUBLIC API — exact n-gram Jaccard pairs over (doc_id, text) via an
    * inverted-index join on word trigrams: no candidate misses, no
    * O(n²). At 100 TB the posting lists get a document-frequency cap
    * (stop-shingle removal) to bound hot-key pair fan-out; unnecessary
    * at test vocab (trigram df ≈ 1). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingledHashed(docs) // no .cache(): see minhashPairs

    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // Posting-list pair generation instead of a shingle self-join: one
    // array per distinct shingle, pairs by double-explode. The self-join
    // would run the shingle scan+distinct once per branch; here the
    // distinct's exchange is shared with `sizes` (ReuseExchange) and the
    // pair stream stays inside one codegen stage. Posting lists are the
    // df-capped structure the 100 TB note above refers to.
    val postings = sh.groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ds"))
    val inter = postings
      .select(explode(col("ds")).as("da"), col("ds"))
      .select(col("da"), explode(col("ds")).as("db"))
      .where(col("da") < col("db"))
      .groupBy(col("da").as("d1"), col("db").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter"))).as("jac"))
      .where(col("jac") >= threshold)
      .orderBy(col("d1").asc_nulls_last, col("d2").asc_nulls_last, col("jac").asc_nulls_last)
  }

  private def q28ngram(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.t(s, dir, "documents"))

  private val q28ngramSql = Dedup.jaccardOracleSql(0.5)

  /** Shared exact-Jaccard oracle (see q27Sql doc). */
  private def jaccardOracleSql(threshold: Double): String =
    s"""WITH d AS (
       |  SELECT doc_id, unnest(list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
       |    FOR i IN range(1, len(s) - 1)])) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY doc_id),
       |i AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
       |  FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, jac FROM (
       |  SELECT d1, d2,
       |    inter::DOUBLE / (s1.sz + s2.sz - inter) AS jac
       |  FROM i JOIN sz s1 ON i.d1 = s1.doc_id JOIN sz s2 ON i.d2 = s2.doc_id) p
       |WHERE jac >= $threshold
       |ORDER BY d1 ASC NULLS LAST, d2 ASC NULLS LAST, jac ASC NULLS LAST""".stripMargin

  /** PUBLIC API — SimHash near-dup pairs over (doc_id, text): 60-bit
    * token-frequency simhash; pairs blocked on 10×6-bit bands — with
    * hamming ≤ 9 at least one band is untouched (pigeonhole), so band
    * blocking is LOSSLESS for maxHamming ≤ 9, not probabilistic.
    * (One-token edits flip up to ~6 bits of a 60-bit simhash on short
    * docs, so a tighter threshold under-recalls.) */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    require(maxHamming <= 9, "10-band blocking is lossless only for hamming <= 9")
    val sims = simhash(docs) // no .cache(): see minhashPairs
    // 10×6-bit pigeonhole bands (hamming ≤ 9 leaves ≥ 1 band untouched,
    // so blocking is lossless for the ≤ 8 threshold); one explode pass,
    // not a 10-way unionAll. The two self-join branches are identical
    // plans, so ReuseExchange computes the simhash aggregation once.
    val bandStructs = array((0 until 10).map(b =>
      struct(lit(b).as("band"),
        expr(s"(simhash div ${1L << (6 * b)}) % 64").as("bk"))): _*)
    val bands = sims
      .select(col("doc_id"), col("simhash"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    // Bucket-local pair generation instead of a band self-join: group
    // each (band, bucket) into one array and double-explode it. A self-
    // join would compute the simhash aggregation once per branch; this
    // shape computes it ONCE, shuffles only ndocs×10 small rows, and the
    // quadratic candidate stream lives entirely inside one codegen stage
    // (generated, hamming-filtered, discarded — never shuffled). Same-
    // language simhashes are correlated, so buckets are crowded at any
    // blocking width (~n²/64 per band; pair-band and distinct-value
    // variants measured no better). At cluster scale a hot bucket is
    // one task's array — past ~10⁵ members it would need salted
    // sub-splitting (the skew-split lesson, CelebornPartitionUtil.java:60-100).
    val buckets = bands.groupBy(col("band"), col("bk"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ds"))
    buckets
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
      .where(col("x.doc_id") < col("y.doc_id") &&
        expr("bit_count(x.simhash ^ y.simhash)") <= maxHamming)
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .orderBy(col("d1").asc_nulls_last, col("d2").asc_nulls_last,
        col("hamming").asc_nulls_last)
  }

  private def q28simhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.t(s, dir, "documents"))

  /** 60-bit simhash per doc from token counts; token hash = first 15 hex
    * chars of md5 (60 bits, positive). Tie (bit-sum 0) → bit 0.
    *
    * One hash-aggregate with 60 per-bit sum columns instead of a 60×
    * row-explode: bit-sum_i = Σ cnt·(2·bit_i(h)−1) = 2·Σ cnt·bit_i(h) − Σ cnt,
    * all exact integer math — identical to the oracle's explode
    * formulation but without multiplying the token rows. */
  private[graft] def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"),
        expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)").as("h"))
    val sums: Seq[Column] = (0 until 60).map(i =>
      sum(expr(s"cnt * ((h div ${1L << i}) % 2)")).as(s"s$i")) :+
      sum(col("cnt")).as("total")
    tok.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        expr((0 until 60).map(i => s"if(2 * s$i - total > 0, ${1L << i}L, 0L)")
          .mkString(" + ")).as("simhash"))
  }

  private val q28simhashSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tok),
      |th AS (SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tc),
      |bits AS (
      |  SELECT doc_id, i.i AS i,
      |    SUM(cnt * (2 * ((h // CAST(pow(2, i.i) AS BIGINT)) % 2) - 1)) AS s
      |  FROM th, range(0, 60) i(i) GROUP BY doc_id, i.i),
      |sh AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN s > 0 THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END) AS simhash
      |  FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS d1, b.doc_id AS d2,
      |  bit_count(xor(a.simhash, b.simhash)) AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
      |ORDER BY d1 ASC NULLS LAST, d2 ASC NULLS LAST, hamming ASC NULLS LAST""".stripMargin

  /** Hyperplane-band parameters of [[embedCosinePairs]] (shared with its
    * oracle generator): an OR-construction of `EmbedTables` hash tables,
    * each keying on `EmbedBits` hyperplane sign bits. */
  private[graft] val EmbedTables = 8
  private[graft] val EmbedBits = 4

  /** PUBLIC API — embedding-cosine near-dup pairs over (vec_id,
    * embedding: array&lt;float&gt;), fully distributed: candidates come
    * from deterministic random-hyperplane banding (md5-derived planes,
    * [[Similarity.planeComponent]]), verification is an exact codegen'd
    * `dot_product` with the inverse norm hoisted per VECTOR — each
    * candidate pair does ONE fold, never three. No driver collect, no
    * all-pairs scan: each (table, bucket) group generates its pairs
    * bucket-locally (collect_list + double-explode, the same one-subplan
    * shape as [[simhashPairs]]), so the candidate stream lives inside a
    * single codegen stage and only surviving pairs are shuffled.
    *
    * Candidate recall is the standard OR-construction S-curve
    * 1−(1−p^bits)^tables with p = 1 − θ/π: ≈ 1 − 6e-4 at cos 0.95 and
    * ≈ 0.98 at cos 0.9 for the 8×4 defaults — the production near-dup
    * regime. (At the fixture's background threshold 0.45 banding is
    * intentionally partial; the registered query's oracle REPLAYS the
    * banding in SQL — the planes are integer constants inlined into the
    * generated query — so DuckDB verifies the whole pipeline, candidates
    * included, not just the verify step. LlmOpsSpec asserts recall on
    * planted high-cos near-dups, where the S-curve bound applies.)
    *
    * cos = (dot * rinv_a) * rinv_b with the same left-assoc order and
    * ascending sequential folds on both engines — bit-identical; output
    * rounded to 9 dp (DuckDB's parallel aggregation can shift the last
    * ulp under load, observed intermittently in round 2). */
  def embedCosinePairs(s: SparkSession, embeddings: DataFrame,
      threshold: Double = 0.45, nTables: Int = EmbedTables,
      bitsPerTable: Int = EmbedBits): DataFrame = {
    graft.Graft.register(s)
    // Sign bit of plane p: sign(dot) == sign(cosine) for nonzero norms,
    // and the plane is a constant-folded float-array literal, so each bit
    // is one codegen'd dot_product fold — no interpreted lambdas.
    def sigBit(p: Int): String = {
      val arr = (0 until VectorSql.Dim)
        .map(d => Similarity.planeComponent(p, d).toInt).mkString(",")
      s"if(dot_product(embedding, cast(array($arr) as array<float>)) >= 0d, 1L, 0L)"
    }
    val bucketStructs = array((0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        expr((0 until bitsPerTable).map(i =>
          s"(${sigBit(t * bitsPerTable + i)}) * ${1L << (bitsPerTable - 1 - i)}L")
          .mkString(" + ")).as("bucket"))
    }: _*)
    // rinv is computed ONCE per vector, before the band explode; the
    // banded rows carry (vec_id, embedding, rinv) into their buckets.
    val banded = embeddings
      .select(col("vec_id"), col("embedding"),
        (lit(1.0) / sqrt(expr("dot_product(embedding, embedding)"))).as("rinv"))
      .select(col("vec_id"), col("embedding"), col("rinv"),
        explode(bucketStructs).as("bb"))
      .select(col("vec_id"), col("embedding"), col("rinv"),
        col("bb.tbl").as("tbl"), col("bb.bucket").as("bucket"))
    // Bucket-local pair generation (see simhashPairs for why this beats a
    // band self-join). A pair colliding in several tables yields the same
    // (v1, v2, cos) bytes each time — distinct() collapses them.
    val buckets = banded.groupBy(col("tbl"), col("bucket"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"), col("rinv"))).as("ds"))
    buckets
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
      .where(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"),
        (expr("dot_product(x.embedding, y.embedding)") *
          col("x.rinv") * col("y.rinv")).as("rawcos"))
      .where(col("rawcos") >= threshold)
      .select(col("v1"), col("v2"), round(col("rawcos"), 9).as("cos"))
      .distinct()
      .orderBy(col("v1").asc_nulls_last, col("v2").asc_nulls_last, col("cos").asc_nulls_last)
  }

  private def q28embed(s: SparkSession, dir: String): DataFrame =
    embedCosinePairs(s, Tables.t(s, dir, "embeddings"))

  /** Oracle replaying the full banded pipeline: per-table bucket ids from
    * the SAME inlined integer plane constants (explicit left-assoc sums —
    * bit-identical to dot_product's ascending fold), candidates = pairs
    * sharing ≥ 1 bucket, then the exact hoisted-rinv cosine. */
  private def q28embedSql: String = {
    def planeDot(p: Int): String =
      (0 until VectorSql.Dim).map(d =>
        s"CAST(embedding[${d + 1}] AS DOUBLE)*${Similarity.planeComponent(p, d).toInt}")
        .mkString(" + ")
    def bucket(t: Int): String =
      (0 until EmbedBits).map(i =>
        s"(CASE WHEN (${planeDot(t * EmbedBits + i)}) >= 0 THEN ${1L << (EmbedBits - 1 - i)} ELSE 0 END)")
        .mkString(" + ")
    val bucketCols = (0 until EmbedTables).map(t => s"(${bucket(t)}) AS bk$t").mkString(",\n    ")
    val collide = (0 until EmbedTables).map(t => s"a.bk$t = b.bk$t").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, embedding,
       |    CAST(1.0 AS DOUBLE) / sqrt(${VectorSql.dot("embedding", "embedding")}) AS rinv,
       |    $bucketCols
       |  FROM embeddings)
       |SELECT v1, v2, round(rawcos, 9) AS cos FROM (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2,
       |    ${VectorSql.dot("a.embedding", "b.embedding")} * a.rinv * b.rinv AS rawcos
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id AND ($collide)) p
       |WHERE rawcos >= 0.45
       |ORDER BY v1 ASC NULLS LAST, v2 ASC NULLS LAST, cos ASC NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q26_dedup_exact", q26, Some(q26Sql)),
    QueryDef("q27_dedup_minhash", q27, Some(q27Sql)),
    QueryDef("q27_dedup_ngram", q28ngram, Some(q28ngramSql)),
    QueryDef("q28_dedup_simhash", q28simhash, Some(q28simhashSql)),
    QueryDef("q28_dedup_embed", q28embed, Some(q28embedSql)))
}

/** Shared DuckDB SQL fragments for vector math (oracle side). */
object VectorSql {
  /** Embedding dimensionality of the fixture tables (FIXTURES.md).
    * DuckDB 1.0 cannot laterally parameterize range() with len(col),
    * so the oracle uses the constant dimension. */
  val Dim = 64

  /** Sequential double dot product via ordinal list access — the same
    * left-to-right fold Spark's `aggregate` performs, so results are
    * bit-identical. */
  def dot(a: String, b: String): String =
    s"(SELECT SUM(CAST($a[i.i] AS DOUBLE) * CAST($b[i.i] AS DOUBLE)) FROM range(1, ${Dim + 1}) i(i))"
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
}
