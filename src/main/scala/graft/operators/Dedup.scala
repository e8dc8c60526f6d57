package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants are shuffle-partitioned joins/aggregations — no driver-side
  * state — so they hold at 100 TB: exact dedup is one hash aggregation;
  * near-dup variants first *bucket* (LSH band / simhash prefix / shingle)
  * so the quadratic verify step only runs within buckets.
  */
object Dedup {

  /** Exact duplicate groups: (keep_id, n) for every text seen > 1×.
    * At scale, group on a 128-bit content hash instead of the full text to
    * keep shuffle rows narrow — semantics identical, collision odds ~0.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select("keep_id", "n")

  /** Distinct word n-gram shingles per doc: (doc_id, shingle). Docs shorter
    * than n words yield none (guarded: Spark's sequence(1, 0) is the
    * DESCENDING [1, 0], not empty).
    */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val words = split(lower(col("text")), " ")
    val grams = when(size(words) >= n,
      transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(words, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** Candidate pairs by n-gram Jaccard ≥ threshold (ids filtered first to
    * bound the quadratic part; the shingle equi-join buckets the work).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      maxId: Long): DataFrame = {
    val d = docs.filter(col("doc_id") < maxId)
    val sh = shingles(d, n).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.toDF("a", "shingle")
      .join(sh.toDF("b", "shingle2"), col("shingle") === col("shingle2"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("a", "sza"), "a")
      .join(sizes.toDF("b", "szb"), "b")
      .withColumn("jac", col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), col("jac"))
  }

  /** MinHash signature: for each of `nHashes` seeds, the min over shingles
    * of murmur3(shingle, seed). Banded into `nBands` LSH bands; docs sharing
    * any band bucket are candidates. Candidates are then verified with true
    * Jaccard. (MinHash/LSH per Broder; the banding join is the distributed
    * scale path — candidates only, never all pairs.)
    */
  def minhashLshPairs(docs: DataFrame, shingleN: Int, nHashes: Int,
      nBands: Int, threshold: Double): DataFrame = {
    require(nHashes % nBands == 0, "nHashes must divide into nBands")
    val rowsPerBand = nHashes / nBands
    val sh = shingles(docs, shingleN).cache()

    // signature: nHashes mins per doc. Seeded hash = md5("<seed>_<shingle>")
    // hex string (min over strings) — reproducible in a DuckDB oracle.
    val hashed = sh.select(col("doc_id"),
      array((0 until nHashes).map(seed =>
        md5(concat(lit(s"${seed}_"), col("shingle")))): _*).as("hs"))
    val sig = hashed.groupBy("doc_id").agg(
      array((0 until nHashes).map(i =>
        min(element_at(col("hs"), i + 1))): _*).as("sig"))

    // bands: (doc_id, band_idx, band_signature)
    val bands = sig.select(col("doc_id"), col("sig"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("bsig"))
        }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.bsig"))

    val cand = bands.toDF("a", "band", "bsig")
      .join(bands.toDF("b", "band2", "bsig2"),
        col("band") === col("band2") && col("bsig") === col("bsig2"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()

    pairJaccard(cand, sh, threshold)
  }

  /** True Jaccard for given candidate pairs against a shingle table. */
  private def pairJaccard(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shA = sh.select(col("doc_id").as("a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("b"), col("shingle"))
    // (b, shingle) is an equi-join key pair: intersection size per candidate
    val inter = cand.join(shA, Seq("a"))
      .join(shB, Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("a", "sza"), "a")
      .join(sizes.toDF("b", "szb"), "b")
      .withColumn("jac", col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select("a", "b", "jac")
  }

  /** 32-bit SimHash over word hashes: bit b of the fingerprint is the sign
    * of Σ_words (bit b of murmur3(word) ? +1 : −1). Near-dups share a
    * fingerprint prefix (bucketed), verified by Hamming distance ≤ maxDist.
    */
  /** Cross-engine-reproducible 32-bit word hash: top 8 hex chars of md5.
    * Slower than murmur3 but lets a DuckDB oracle recompute signatures
    * bit-exactly; swap in `hash(c)` for pure-throughput runs.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def simhash(docs: DataFrame, wordHash: Column => Column = md5Hash32): DataFrame = {
    val words = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .withColumn("h", wordHash(col("w")))
    val bitAggs = (0 until 32).map(b =>
      sum(when((shiftright(col("h"), b) % 2) =!= 0, 1).otherwise(-1)).as(s"b$b"))
    val bitSums = words.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    bitSums.select(col("doc_id"),
      (0 until 32).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
  }

  def simhashPairs(docs: DataFrame, maxDist: Int, maxId: Long): DataFrame = {
    val sig = simhash(docs.filter(col("doc_id") < maxId)).cache()
    // bucket by high 8 bits to avoid all-pairs, then Hamming-verify
    val bucketed = sig.withColumn("bkt", shiftright(col("simhash"), 24))
    bucketed.toDF("a", "sa", "bkt")
      .join(bucketed.toDF("b", "sb", "bkt2"), col("bkt") === col("bkt2"))
      .filter(col("a") < col("b"))
      .withColumn("dist", expr("bit_count(sa ^ sb)"))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }

  /** Embedding near-duplicates: cosine ≥ threshold for vec_id < maxId,
    * DECIMAL-routed so it hash-matches the SQL oracle.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    val dotDec = (x: Column, y: Column) =>
      aggregate(
        zip_with(x, y, (p, q) => (p.cast("double") * q.cast("double")).cast("decimal(38,18)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)"),
        (acc, z) => (acc + z).cast("decimal(38,18)")).cast("double")
    // norms once per vector (O(n)), only the dot product per pair (O(n²))
    val e = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"))
      .withColumn("n2", dotDec(col("embedding"), col("embedding")))
    val a = e.toDF("a", "ea", "na2")
    val b = e.toDF("b", "eb", "nb2")
    a.join(b, col("a") < col("b"))
      .withColumn("cos_sim",
        round(dotDec(col("ea"), col("eb")) /
          (sqrt(col("na2")) * sqrt(col("nb2"))), 12))
      .filter(col("cos_sim") >= threshold)
      .select("a", "b", "cos_sim")
  }
}
