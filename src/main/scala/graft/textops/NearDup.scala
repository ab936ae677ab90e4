package graft.textops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Near-duplicate detection suite for training-data curation at 100 TB
  * (BASELINE.json north star; beyond the reference's own surface — the
  * reference dedups exact page bodies only, SURVEY.md T1).
  *
  * Four detectors, cheapest-to-richest:
  *  - exact: hash-groupBy (see `q11_exact_dedup_docs`);
  *  - n-gram Jaccard: exhaustive shingle self-join — exact, quadratic
  *    in colliding shingles; the ORACLE for the approximate methods;
  *  - MinHash + LSH banding: signature min over k permutations, band
  *    bucket join, candidate verify — the scale path: shuffle cost is
  *    O(docs × bands), never O(docs²);
  *  - SimHash: 64-bit sign-sum fingerprint, hamming ≤ k — cheapest,
  *    catches high-similarity pairs only.
  *
  * All hashing is deterministic (fixed seeds) so runs are reproducible
  * and resumable.
  */
object NearDup {

  // ---- shingling ---------------------------------------------------------

  /** Word n-gram shingles (lowercased, whitespace-tokenized). */
  def wordShingles(text: String, n: Int): Vector[String] = {
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) {
      if (words.isEmpty) Vector.empty else Vector(words.mkString(" "))
    } else words.sliding(n).map(_.mkString(" ")).toVector
  }

  /** Column form: `shingles(text, n)` as array<string>. */
  def shinglesCol(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val words = filter(split(lower(text), "\\s+"), w => length(w) > 0)
    when(size(words) < n, when(size(words) === 0, array()).otherwise(array(array_join(words, " "))))
      .otherwise(
        // transform over sliding windows: index i -> words[i..i+n-1]
        transform(sequence(lit(0), size(words) - n),
          i => array_join(slice(words, i + lit(1), lit(n)), " ")))
  }

  // ---- exact n-gram Jaccard (the oracle method) --------------------------

  /** All pairs (a < b) with |shared shingles| / |union| ≥ threshold.
    * Input: (idCol, textCol). Exhaustive but shuffle-bounded: the
    * self-join is on distinct (doc, shingle) pairs, so cost scales with
    * shingle collisions, not docs² — still the method to sample-check
    * LSH recall, not to run on the full 100 TB.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // The shingle relation is consumed twice (both join sides); persist
    // so the tokenize+explode+distinct pipeline runs once. Set size is
    // attached by window so no extra sizes join is needed. The cache is
    // released by the ContextCleaner when the plan is collected.
    val w = Window.partitionBy($"id")
    val sh = df.select(col(idCol).as("id"),
        explode(shinglesCol(col(textCol), n)).as("shingle"))
      .distinct()
      .withColumn("sz", count(lit(1)).over(w))
      .persist()
    val a = sh.select($"id".as("id_a"), $"shingle", $"sz".as("size_a"))
    val b = sh.select($"id".as("id_b"), $"shingle", $"sz".as("size_b"))
    a.join(b, "shingle")
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("n_common"),
           first($"size_a").as("size_a"), first($"size_b").as("size_b"))
      .withColumn("jaccard",
        $"n_common".cast("double") / ($"size_a" + $"size_b" - $"n_common").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  // ---- MinHash + LSH -----------------------------------------------------

  private val MersennePrime = (1L << 61) - 1

  /** Deterministic affine hash family over 64-bit shingle hashes. */
  private def perm(seed: Int): (Long, Long) = {
    val rnd = new scala.util.Random(seed * 1000003 + 12345)
    (math.abs(rnd.nextLong()) % MersennePrime + 1, math.abs(rnd.nextLong()) % MersennePrime)
  }

  /** k-wide MinHash signature of a shingle-hash set. */
  def signature(shingleHashes: Iterable[Long], k: Int): Array[Long] =
    signatureWith(shingleHashes, Array.tabulate(k)(perm))

  /** Signature with precomputed permutation params (hoist the param
    * table out of per-row UDF calls).
    */
  def signatureWith(shingleHashes: Iterable[Long], params: Array[(Long, Long)]): Array[Long] = {
    val k = params.length
    val sig = Array.fill(k)(Long.MaxValue)
    shingleHashes.foreach { h =>
      val x = (h & Long.MaxValue) % MersennePrime
      var i = 0
      while (i < k) {
        val (a, b) = params(i)
        // (a*x + b) mod p via Math.multiplyHigh-free BigInt-less route:
        // 61-bit prime keeps products in unsigned 125 bits; use
        // Math.floorMod on the 64-bit wrap of a*x+b — still a valid
        // deterministic hash family (wrap is itself a bijection mix).
        val v = java.lang.Math.floorMod(a * x + b, MersennePrime)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Estimated Jaccard from two signatures. */
  def estimate(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    * `bands × rowsPerBand = k`. Probability a pair with true Jaccard s
    * becomes a candidate: 1 − (1 − s^r)^b.
    *
    * Plan shape at scale: shingle explode → per-doc signature
    * (one aggregation) → band explode (docs × b rows) → bucket groupBy
    * → within-bucket pairs (buckets are tiny unless data is degenerate)
    * → verify on exact shingle join restricted to candidates (a
    * broadcast-able set at sane candidate counts, else a semi-join).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val params = Array.tabulate(k)(perm) // hoisted: built once, shipped in the closure
    val sigUdf = udf((shingles: Seq[String]) =>
      signatureWith(Option(shingles).getOrElse(Nil)
        .map(s => scala.util.hashing.MurmurHash3.stringHash(s).toLong), params))
    // null texts carry no shingles — skip them like jaccardPairs does
    val sigs = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), shinglesCol(col(textCol), n).as("shingles"))
      .withColumn("sig", sigUdf($"shingles"))
    // band key = hash of the band's signature slice; persisted — both
    // sides of the bucket self-join read it.
    val banded = sigs.select($"id", posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice($"sig", b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)), b))).as(Seq("band", "band_key")))
      .persist()
    val candidates = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.band_key" === $"y.band_key" && $"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"))
      .distinct()
    // exact verify: compute true Jaccard only for candidate pairs
    val sh = df.select(col(idCol).as("id"),
        explode(shinglesCol(col(textCol), n)).as("shingle")).distinct().persist()
    val sizes = sh.groupBy($"id").agg(count(lit(1)).as("n_shingles"))
    val common = candidates
      .join(sh.toDF("id_a", "shingle"), "id_a")
      .join(sh.toDF("id_b", "shingle2").withColumnRenamed("shingle2", "shingle"),
        Seq("id_b", "shingle"))
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("n_common"))
    candidates.join(common, Seq("id_a", "id_b"), "left")
      .na.fill(0, Seq("n_common"))
      .join(sizes.toDF("id_a", "size_a"), "id_a")
      .join(sizes.toDF("id_b", "size_b"), "id_b")
      .withColumn("jaccard",
        $"n_common".cast("double") / ($"size_a" + $"size_b" - $"n_common").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over word n-gram shingles: per bit, sum +1/−1 by
    * shingle-hash bit, sign → fingerprint bit.
    */
  def simhash(text: String, n: Int): Long = {
    val counts = new Array[Int](64)
    wordShingles(text, n).foreach { s =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(s.reverse).toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash near-dup pairs with hamming distance ≤ maxDistance.
    * Bucketing: split the 64-bit fingerprint into `maxDistance + 1`
    * blocks — any pair within distance d agrees on ≥1 block (pigeonhole)
    * — and bucket-join per block. Never a full cross join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDistance: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blocks = maxDistance + 1
    val fpUdf = udf((t: String) => simhash(t, n))
    // null texts have no fingerprint — skip them like jaccardPairs does
    val fps = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), fpUdf(col(textCol)).as("fp"))
    val width = 64 / blocks
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val blockKeysUdf = udf((fp: Long) =>
      Array.tabulate(blocks)(b => (fp >>> (b * width)) & mask))
    val keyed = fps.select($"id", $"fp",
      posexplode(blockKeysUdf($"fp")).as(Seq("block", "key")))
    val hammingUdf = udf((a: Long, b: Long) => hamming(a, b))
    keyed.as("x").join(keyed.as("y"),
        $"x.block" === $"y.block" && $"x.key" === $"y.key" && $"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"),
        hammingUdf($"x.fp", $"y.fp").as("distance"))
      .distinct()
      .filter($"distance" <= maxDistance)
  }

  // ---- embedding-cosine near-dup -----------------------------------------

  /** Pairs of vectors with cosine ≥ threshold, via LSH bucketing on
    * random-hyperplane signs (see [[graft.vectors.Vectors.hyperplaneBucket]])
    * then exact verify. Exposed here for the dedup suite; the generic
    * building blocks live in `graft.vectors`.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Int, threshold: Double, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", graft.vectors.Vectors.hyperplaneBucket(col("v"), planes, dim))
      .withColumn("norm", graft.vectors.Vectors.normCol(col("v")))
      .persist() // both sides of the self-join read it
    bucketed.as("x").join(bucketed.as("y"),
        $"x.bucket" === $"y.bucket" && $"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"),
        graft.vectors.Vectors.cosineWithNorms($"x.v", $"x.norm", $"y.v", $"y.norm").as("cosine"))
      .filter($"cosine" >= threshold)
  }
}
