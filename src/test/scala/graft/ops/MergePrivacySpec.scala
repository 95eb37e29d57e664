package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergePrivacySpec extends SparkSpec {
  import spark.implicits._

  test("Merge.applyChanges: insert, update, delete, delete-of-absent, compaction") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "cents")
    val changes = Seq(
      (2L, 21L, "U", 1L), (2L, 22L, "U", 2L),  // compaction: latest (22) wins
      (3L, 0L, "D", 1L),                       // delete existing
      (4L, 40L, "I", 1L),                      // insert new key
      (5L, 0L, "D", 1L),                       // delete-of-absent: no-op
      (6L, 60L, "U", 1L), (6L, 0L, "D", 2L))   // upsert then delete: gone
      .toDF("k", "cents", "op", "ord")
    val got = Merge.applyChanges(base, changes, Seq("k"), "op", "ord")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 22L), (4L, 40L)))
  }

  test("Merge.applyChanges: delete resurrected by a later change applies the later change") {
    val base = Seq((1L, 10L)).toDF("k", "cents")
    val changes = Seq((1L, 0L, "D", 1L), (1L, 11L, "U", 2L)).toDF("k", "cents", "op", "ord")
    val got = Merge.applyChanges(base, changes, Seq("k"), "op", "ord")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L)))
  }

  test("Merge.applyChanges fails loudly on a duplicated ordCol within a key") {
    val base = Seq((1L, 10L)).toDF("k", "cents")
    val changes = Seq((1L, 11L, "U", 1L), (1L, 12L, "U", 1L)).toDF("k", "cents", "op", "ord")
    val e = intercept[Exception] {
      Merge.applyChanges(base, changes, Seq("k"), "op", "ord").collect()
    }
    def msg(t: Throwable): String =
      if (t == null) "" else t.getMessage + msg(t.getCause)
    assert(msg(e).contains("duplicate"))
  }

  test("Privacy: violations list the small classes; report carries achieved k") {
    val df = (Seq.fill(12)(("en", "a")) ++ Seq.fill(3)(("en", "b")) ++
      Seq.fill(1)(("fr", "a"))).toDF("lang", "src")
    val v = Privacy.kAnonymityViolations(df, Seq("lang", "src"), 10L)
      .as[(String, String, Long)].collect().toSet
    assert(v == Set(("en", "b", 3L), ("fr", "a", 1L)))
    val r = Privacy.kAnonymityReport(df, Seq("lang", "src"), 10L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((3L, 2L, 4L, 1L)), r.toString) // classes, violating, at-risk, achieved k
  }

  test("Privacy: null quasi values form their own class") {
    val df = Seq(("en", "a"), (null, "a"), (null, "a")).toDF("lang", "src")
    val v = Privacy.kAnonymityViolations(df, Seq("lang", "src"), 2L)
      .as[(String, String, Long)].collect().toSet
    assert(v == Set(("en", "a", 1L)))
  }
}
