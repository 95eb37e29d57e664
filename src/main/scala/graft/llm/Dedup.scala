package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale text corpora: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash. The reference engine has
  * no dedup surface (closest idiom: identity reduce on a hash key);
  * this module is part of the LLM-pipeline extension the engine is
  * specified to carry.
  *
  * Scale posture: every operator is a pure DataFrame pipeline whose
  * only wide dependencies are hash-keyed `groupBy`s and a
  * candidate-bucket join. Nothing here ever compares all-pairs: exact
  * and prefix dedup group on a fingerprint; Jaccard joins only pairs
  * sharing a shingle; MinHash-LSH joins only pairs sharing a band
  * bucket. AQE's skew-join handles hot buckets (stopword-like shingles)
  * at 100 TB.
  */
object Dedup {

  /** Exact duplicate groups on a full-text fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("h"))
      .groupBy("h").agg(count("*").as("c"), collect_list(col(idCol)).as("ids"))
      .where(col("c") > 1)

  /** Duplicate-prefix groups (first `nWords` tokens) — catches
    * truncated/extended near-copies. */
  def prefixGroups(df: DataFrame, textCol: String, nWords: Int): DataFrame =
    df.select(TextFunctions.prefixFingerprint(col(textCol), nWords).as("h"))
      .groupBy("h").agg(count("*").as("c"))
      .where(col("c") > 1)

  /** Exact word-`n`-gram Jaccard over all pairs sharing ≥1 shingle.
    * Output: (id1, id2, jaccard) with id1 < id2, jaccard ≥ threshold.
    * This is the exact oracle the sketch methods approximate. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // the gram postings feed three branches (self-join a/b + sizes):
    // persist so the corpus is tokenized/shingled once
    val g = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sz = g.groupBy("doc_id").agg(count("*").as("n"))
    val pairs = g.alias("a")
      .join(g.alias("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count("*").as("inter"))
    pairs
      .join(sz.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(sz.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---------------------------------------------------------------- MinHash

  /** Number of hash functions in a MinHash signature. */
  val NumHashes = 64
  /** LSH banding: bandsCount * rowsPerBand == NumHashes. 16 bands of 4
    * targets the ~0.5+ Jaccard regime (s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5). */
  val NumBands = 16
  val RowsPerBand = 4

  private val MersennePrime = (1L << 61) - 1
  /** Deterministic affine hash family h_i(x) = (a_i·x + b_i) mod p with
    * a_i, b_i < 2^31 and x < 2^31, so a_i·x + b_i < 2^62 never
    * overflows a long. Seeded — signatures are stable across runs.
    * THE single definition: the SQL registration
    * (core.GraftExtensions) reuses these, so SQL and DataFrame
    * signatures can never drift apart. */
  private val (hashA, hashB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue - 1).toLong + 1),
     Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }
  def hashFamilyA: Seq[Long] = hashA.toSeq
  def hashFamilyB: Seq[Long] = hashB.toSeq

  /** Distinct 31-bit base hashes of the word n-gram shingles, via the
    * native fused expression (tokenize+hash+dedup in one loop). */
  private def shingleHashes(textCol: Column, n: Int): Column =
    graft.functions.SketchExpressions.shingleHashes(textCol, n)

  /** MinHash signature: array of NumHashes minima, computed by the
    * native [[graft.functions.MinHashSignature]] expression — one
    * JIT-compiled loop per row, no shuffle, no per-shingle allocation.
    * (An equivalent `aggregate`-fold of pure column functions ran ~4×
    * slower; 64 separate `array_min(transform(…))` columns ~40× —
    * they re-inline shingle hashing per hash function.) */
  def minHashSignature(textCol: Column, n: Int = 3): Column =
    graft.functions.SketchExpressions.minHashSignature(
      shingleHashes(textCol, n), hashA.toSeq, hashB.toSeq)

  /** LSH candidate pairs + signature-estimated Jaccard.
    * Output: (id1, id2, est_jaccard), id1 < id2, est ≥ minEst.
    *
    * Plan shape: map (signature) → explode NumBands (band, bucket-key)
    * rows carrying ids only → self equi-join on (band, key) →
    * distinct pairs → join signatures back for estimation. The
    * ids-only band table keeps the bucket shuffle narrow (no 64-long
    * signature payload), the self-join lets AQE split hot buckets
    * (boilerplate corpora) like any skewed join, and no bucket member
    * list is ever materialized — measured ~40% faster than a
    * collect_list/explode² formulation and structurally safer at
    * 100 TB. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minEst: Double = 0.5): DataFrame = {
    // The signature frame feeds three join branches (bands, sig1,
    // sig2); persist it so the corpus is scanned and sketched ONCE.
    // The cache is released by Spark's ContextCleaner when the result
    // frame is no longer referenced; callers doing repeated dedup
    // rounds should build signatures(…) themselves and manage the
    // persistence lifecycle explicitly.
    val sigs = signatures(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidatesFromSignatures(sigs, minEst)
  }

  /** One row per doc: (doc_id, sig). The map-only sketch pass.
    * Docs with no shingles (fewer than n tokens by the native
    * expression's own tokenization) carry the all-sentinel signature;
    * they are filtered on that very basis — a separate token-count
    * filter with subtly different split semantics once let empty-sig
    * docs through, where they all LSH-collided with est_jaccard=1.0. */
  def signatures(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"), minHashSignature(col(textCol), n).as("sig"))
      .where(col("sig").getItem(0) =!= MersennePrime)

  /** Candidate pairs from a (doc_id, sig) frame — persist `sigs`
    * before calling: it is referenced by three join branches. */
  def candidatesFromSignatures(sigs: DataFrame, minEst: Double): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val pairs = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    pairs
      .join(sigs.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y), b => b))
          .cast("double") / lit(NumHashes.toDouble))
      .where(col("est_jaccard") >= minEst)
      .select(col("id1"), col("id2"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens: per bit, majority vote of 64-bit
    * FNV-1a token hashes, computed by the native
    * [[graft.functions.SimHash64]] expression (one primitive loop per
    * row — see MinHash note above for why not a column fold). */
  def simHash(textCol: Column): Column =
    graft.functions.SketchExpressions.simHash64(TextFunctions.tokens(textCol))

  /** Hamming distance between two simhash longs. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs via banded chunk join: split the 64-bit
    * simhash into 4 chunks of 16 bits; any pair within Hamming
    * distance 3 shares ≥1 exact chunk (pigeonhole), so candidates are
    * found with a hash join on (chunk index, chunk value) — never an
    * all-pairs scan. `maxHamming` then exact-filters candidates.
    * Output: (id1, id2, hamming), id1 < id2. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // the simhash frame feeds both sides of the chunk self-join:
    // persist so the corpus is hashed once. Blank docs are excluded —
    // they would all share the degenerate all-ones simhash and pair
    // quadratically.
    val sh = df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), simHash(col(textCol)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunked = sh.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("ci"),
          shiftright(col("sh"), i * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("ch"))
    chunked.alias("a")
      .join(chunked.alias("b"),
        col("a.ch.ci") === col("b.ch.ci") && col("a.ch.cv") === col("b.ch.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        hammingDistance(col("a.sh"), col("b.sh")).as("hamming"))
      .dropDuplicates("id1", "id2")
      .where(col("hamming") <= maxHamming)
  }
}
