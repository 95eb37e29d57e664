package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashSignature, ShingleHashes, SimHash64}

/** SQL surface for the engine's native expressions: registers
  * `cosine_similarity`, `simhash64`, `shingle_hashes` (and a
  * default-family `minhash_signature`) so `spark.sql` users get the
  * same codegen'd kernels as the DataFrame API.
  *
  * Two registration paths:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (the `SparkSessionExtensions` route — survives `newSession()`);
  *  - [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private val minHashFamily = {
    val rnd = new scala.util.Random(42)
    (Seq.fill(64)(rnd.nextInt(Int.MaxValue - 1).toLong + 1),
     Seq.fill(64)(rnd.nextInt(Int.MaxValue).toLong))
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(text, n) - distinct 31-bit word n-gram hashes"),
      (es: Seq[Expression]) => ShingleHashes(es.head,
        es(1).eval().asInstanceOf[Number].intValue)),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(hashes) - 64-wide minhash signature (engine hash family)"),
      (es: Seq[Expression]) => MinHashSignature(es.head, minHashFamily._1, minHashFamily._2)))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
