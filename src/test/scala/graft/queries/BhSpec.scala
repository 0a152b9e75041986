package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benjamini–Hochberg step-up semantics on crafted families — the
  * branches the null fixture cannot witness (every fixture rank ≤ i*
  * also passes its own threshold there, so a step-up → per-rank-
  * acceptance defect would be invisible to the oracle hash).
  */
class BhSpec extends SparkSpec {
  import spark.implicits._

  private def run(fam: Seq[(String, Long)], th: Seq[Long]): Map[String, (Long, Long)] =
    AnalyticsQueries
      .bhStepUp(fam.toDF("test_id", "z2_micros"), th, fam.size)
      .collect()
      .map(r => r.getAs[String]("test_id") ->
        (r.getAs[Long]("t_rank"), r.getAs[Long]("rejected")))
      .toMap

  test("step-up sweeps in a rank that fails its own threshold") {
    // ranks:      1        2       3
    // z2:         200      40      20
    // T(i):       100      50      10
    // rank 2 fails individually (40 < 50) but rank 3 passes (20 >= 10),
    // so i* = 3 and ALL THREE reject — per-rank acceptance or step-down
    // (stop at the first failure) would leave rank 2 unrejected.
    val out = run(Seq("a" -> 200L, "b" -> 40L, "c" -> 20L), Seq(100L, 50L, 10L))
    assert(out("a") == (1L, 1L))
    assert(out("b") == (2L, 1L), "the sandwich rank must be swept in by step-up")
    assert(out("c") == (3L, 1L))
  }

  test("nothing passes -> i* = 0 -> nothing rejected") {
    val out = run(Seq("a" -> 5L, "b" -> 4L, "c" -> 3L), Seq(100L, 50L, 10L))
    assert(out.values.forall(_._2 == 0L))
  }

  test("partial rejection stops exactly at the last passing rank") {
    // rank 1 passes, rank 2 passes, rank 3 fails -> i* = 2
    val out = run(Seq("a" -> 200L, "b" -> 60L, "c" -> 5L), Seq(100L, 50L, 10L))
    assert(out("a")._2 == 1L && out("b")._2 == 1L && out("c")._2 == 0L)
  }

  test("ties rank deterministically by test_id") {
    val out = run(Seq("b" -> 50L, "a" -> 50L, "c" -> 50L), Seq(100L, 50L, 10L))
    assert(out("a")._1 == 1L && out("b")._1 == 2L && out("c")._1 == 3L)
  }

  test("family-size mismatch raises instead of misaligning the ladder") {
    val e = intercept[Exception] {
      AnalyticsQueries
        .bhStepUp(Seq(("a", 1L)).toDF("test_id", "z2_micros"), Seq(100L, 50L), 2)
        .collect()
    }
    assert(e.getMessage.contains("ladder misaligned") ||
      Option(e.getCause).exists(_.getMessage.contains("ladder misaligned")))
  }
}
