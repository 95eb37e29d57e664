package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[JaroWinkler.similarity]] to the standard definition on
  * hand-computed cases and checks the expression + SQL surfaces. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String) = JaroWinkler.similarity(a, b)

  test("identity, empty and disjoint strings") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("classic textbook values") {
    // MARTHA/MARHTA: jaro = (6/6 + 6/6 + 5/6)/3 = 0.944..., prefix 3
    // → 0.944 + 3·0.1·(1−0.944) = 0.9611...
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    // DWAYNE/DUANE: jaro = (4/6 + 4/5 + 4/4)/3 = 0.8222, prefix 1
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    // DIXON/DICKSONX: jaro = (4/5 + 4/8 + 4/4)/3 = 0.7666, prefix 2
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
  }

  test("boost applies only above jaro 0.7") {
    // a jaro below the threshold must come back unboosted even with a
    // shared prefix: 'abcvwxyz' vs 'abcdefgh' share prefix 3 but only
    // 3 matches → jaro = (3/8 + 3/8 + 3/3)/3 = 0.5833...
    assert(math.abs(jw("abcvwxyz", "abcdefgh") - 0.5833333333333334) < 1e-12)
  }

  test("transpositions are half the out-of-order matches") {
    // CRATE/TRACE: matches r,a,e in order? c,r,a,t,e vs t,r,a,c,e:
    // window = 1; matches = r,a,e plus c↔c (dist 3 > window, no) and
    // t↔t (dist 1, yes) → 4 matches, t count: positions rae+t aligned
    // r-r a-a t-c? — pinned against the standard reference value 0.7333...
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
  }

  test("column and SQL surfaces agree with the direct function") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"))
      .toDF("a", "b")
    val viaCol = df.select(TextFunctions.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    graft.core.GraftExtensions.register(spark)
    val viaSql = df.createOrReplaceTempView("jwt")
    val r = spark.sql("SELECT jaro_winkler(a, b) FROM jwt").as[Double].collect()
    assert(viaCol.toSeq == Seq(jw("MARTHA", "MARHTA"), jw("DWAYNE", "DUANE")))
    assert(r.toSeq == viaCol.toSeq)
  }

  test("null inputs yield null") {
    val df = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
    val r = df.select(TextFunctions.jaroWinkler(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }
}
