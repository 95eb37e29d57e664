package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Similarity.cosineNearDupsLsh]] — the scale-safe (no trusted
  * block key) embedding near-dup path — against the exact all-pairs
  * answer on a corpus small enough to brute-force.
  */
class LshNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** 20 clusters of 3 near-identical vectors + 40 singletons, seeded. */
  private lazy val emb = {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]) = v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
    val rows = (0 until 20).flatMap { c =>
      val base = vec()
      Seq((c * 3L, base), (c * 3L + 1, jitter(base)), (c * 3L + 2, jitter(base)))
    } ++ (0 until 40).map(i => (1000L + i, vec()))
    rows.toDF("vec_id", "embedding")
  }

  // exact all-pairs baseline: cosineNearDups with one global block is
  // a true brute-force on this 100-row corpus
  private def exactPairs(threshold: Double): Set[(Long, Long)] =
    Similarity.cosineNearDups(emb.withColumn("blk", lit(1)), "blk", threshold)
      .select("id1", "id2").as[(Long, Long)].collect().toSet

  test("cosineNearDupsLsh finds only true pairs (precision 1 by construction)") {
    val exact = exactPairs(0.9)
    val lsh = Similarity.cosineNearDupsLsh(emb, dim, 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
  }

  test("cosineNearDupsLsh recall ≥ 0.8 vs exact all-pairs at high similarity") {
    val exact = exactPairs(0.9)
    assert(exact.size >= 20, s"fixture must plant near-dup pairs, got ${exact.size}")
    val lsh = Similarity.cosineNearDupsLsh(emb, dim, 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, f"recall $recall%.2f < 0.8 (|exact|=${exact.size}, |lsh|=${lsh.size})")
  }

  test("cosineNearDupsLsh sims match the exact computation on found pairs") {
    val exact = Similarity.cosineNearDups(emb.withColumn("blk", lit(1)), "blk", 0.9)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Similarity.cosineNearDupsLsh(emb, dim, 0.9)
      .select("id1", "id2", "sim").as[(Long, Long, Double)].collect()
    lsh.foreach { case (a, b, s) => assert(exact((a, b)) == s) }
  }

  test("multi-probe dedup exchange carries scalars, not embedding arrays") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val df = Similarity.cosineNearDupsLsh(emb, dim, 0.9)
    // the dropDuplicates("id1","id2") lowers to an Aggregate keyed on
    // (id1, id2); its input must be the projected (id1, id2, s) rows —
    // shuffling the two dim-length arrays per candidate pair through
    // the dedup exchange is the r8 ADVICE finding this pins closed
    val dedups = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate
        if a.groupingExpressions.flatMap(_.references.map(_.name))
          .toSet == Set("id1", "id2") => a
    }
    assert(dedups.nonEmpty, df.queryExecution.optimizedPlan.toString)
    dedups.foreach { a =>
      val arrays = a.child.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty, s"dedup input still carries arrays: $arrays")
    }
  }

  test("lshBucket raises on embedding dimension mismatch") {
    val bad = Seq((1L, Array.fill(dim + 1)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(Similarity.lshBucket(col("embedding"), dim)).collect()
    }
    assert(e.getMessage != null)
  }

  test("scopeCols: pairs never cross scopes; constant scope equals unscoped") {
    // two copies of the corpus under different scopes: every pair must
    // stay inside its copy even though the vectors are IDENTICAL
    // across scopes (the strongest possible cross-scope bait)
    val scoped = emb.withColumn("lang", lit("en"))
      .unionByName(emb.withColumn("vec_id", col("vec_id") + 10000)
        .withColumn("lang", lit("de")))
    val pairs = Similarity.cosineNearDupsLsh(scoped, dim, 0.9,
        scopeCols = Seq("lang"))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert((a < 10000) == (b < 10000), s"cross-scope pair ($a, $b)")
    }
    // a constant scope changes nothing vs the unscoped path
    val unscoped = Similarity.cosineNearDupsLsh(emb, dim, 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val constScope = Similarity.cosineNearDupsLsh(
        emb.withColumn("lang", lit("xx")), dim, 0.9, scopeCols = Seq("lang"))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(constScope == unscoped)
  }
}
