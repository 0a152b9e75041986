package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[IvfIndex.buildTree]]'s ROUTED INSERTION (round 10 — the
  * replacement for the flat 0.27·k² parent-map build) against an
  * independent driver-side replay of the same contract, in the SELECTIVE
  * regime (k = 512, depth ≥ 3) where the beam-routed frontier genuinely
  * prunes — the regime the oracle-gated SFs (k ≤ 78, where routed ≡ flat
  * provably) cannot reach. The reference is plain Scala loops over the
  * collected codebook: same strided levels, same beam-[[IvfIndex
  * .DefaultBeam]] descent, same left-fold cosine, same (cos desc, cid
  * asc) tie-break — so any divergence in the distributed build (a lost
  * partitioning, a wrong window frame, a beam filter off by one) fails
  * here exactly, not statistically.
  */
class RoutedBuildSpec extends SparkSpec {

  /** Left-fold dot — the exact association [[Vectors.dot]] computes. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s = s + a(i) * b(i); i += 1 }
    s
  }

  private case class Node(cid: Long, v: Array[Double], n: Double)

  test("routed build == driver-side reference replay at k=512 (selective beams)") {
    val vec = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.l2Norm(col("v")))
    val n = vec.count()
    val cent = IvfIndex.materialize(
      spark, IvfIndex.trainCentroidsK(vec, "vec_id", 64, n, k = 512L, iters = 1))
    val tree = IvfIndex.buildTree(spark, cent)
    assert(tree.start >= 3, s"need a selective tree, got start=${tree.start}")

    // ---- reference replay ----
    val fine = cent.collect().sortBy(_.getLong(0)).map { r =>
      Node(r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
    }
    val levels = Iterator
      .iterate(fine)(lv => lv.zipWithIndex.collect {
        case (nd, i) if i % IvfIndex.TreeFanout == 0 => nd
      })
      .take(IvfIndex.MaxLevels + 1)
      .takeWhile(_.length >= 1)
      .toIndexedSeq
    val start = math.max(1, levels.lastIndexWhere(_.length > 1))
    assert(start == tree.start, s"level derivation diverged: $start vs ${tree.start}")
    val top = levels(start)
    // built(l): childCid -> parentCid; children(l): parentCid -> its step children
    val built = new Array[Map[Long, Long]](start + 1)
    val kids = new Array[Map[Long, Seq[Node]]](start + 1)
    def rank(c: Node, cands: Seq[Node]): Seq[Node] =
      cands.sortBy(p => (-dot(c.v, p.v) / (c.n * p.n), p.cid))
    for (l <- start to 1 by -1) {
      val pairs = levels(l - 1).flatMap { c =>
        var kept = rank(c, top.toSeq)
        for (u <- start until l by -1) {
          val cands = kept.take(IvfIndex.DefaultBeam)
            .flatMap(f => kids(u).getOrElse(f.cid, Seq.empty))
          kept = rank(c, cands)
        }
        kept.headOption.map(p => c.cid -> p.cid)
      }
      built(l) = pairs.toMap
      kids(l) = pairs.toSeq.groupBy(_._2).map { case (p, cs) =>
        p -> cs.map(x => levels(l - 1).find(_.cid == x._1).get)
      }
    }

    // ---- compare every step, and prove the regime is selective ----
    var divergedFromFlat = false
    for (l <- 1 to start) {
      val got = tree.steps(l).collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap // (ccid -> pcid)
      assert(got == built(l),
        s"step $l: distributed ${got.size} mappings != reference ${built(l).size}\n" +
          s"only-distributed: ${(got.toSet -- built(l).toSet).take(5)}\n" +
          s"only-reference:  ${(built(l).toSet -- got.toSet).take(5)}")
      // flat nearest-among-next-level, the pre-round-10 build
      val flat = levels(l - 1).flatMap { c =>
        rank(c, levels(l).toSeq).headOption.map(p => c.cid -> p.cid)
      }.toMap
      if (flat != built(l)) divergedFromFlat = true
    }
    assert(divergedFromFlat,
      "routed == flat at every level: k=512 did not exercise the selective " +
        "path, so this spec is not pinning routed insertion at all")
  }
}
