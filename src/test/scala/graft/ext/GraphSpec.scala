package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) = {
    val e0 = pairs.toDF("a", "b")
    e0.select(col("a").as("src"), col("b").as("dst"))
      .union(e0.select(col("b").as("src"), col("a").as("dst")))
  }

  test("star graph: hub outranks every leaf") {
    val edges = undirected((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = Graph.pagerankFixed(edges, 3).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 4L).forall(l => r(0L) > r(l)))
    // leaves are symmetric — identical ranks
    assert((1L to 4L).map(r).toSet.size == 1)
  }

  test("path graph: center outranks endpoints") {
    val edges = undirected((0L, 1L), (1L, 2L))
    val r = Graph.pagerankFixed(edges, 3).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(0L) && r(0L) == r(2L))
  }

  test("rank mass is conserved up to integer floor loss") {
    val edges = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val scale = 1000000000000L
    val ranks = Graph.pagerankFixed(edges, 3).collect().map(_.getLong(1))
    val total = ranks.sum
    // every div floors: strictly bounded loss, never a gain
    assert(total <= scale)
    assert(total > scale - 1000L * ranks.length)
  }

  test("HITS: broad-catalog source is the top hub, widely-sourced target the top authority") {
    // s=0 links 3 parts, s=2 links 1; p=1 has 2 suppliers, p=3/p=5 have 1
    val edges = Seq((0L, 1L), (0L, 3L), (0L, 5L), (2L, 1L)).toDF("src", "dst")
    val r = Graph
      .hitsFixed(edges, 2)
      .collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r((0L, "hub")) > r((2L, "hub")))
    assert(r((1L, "authority")) > r((3L, "authority")))
    assert(r((3L, "authority")) == r((5L, "authority"))) // symmetric parts tie
  }

  test("HITS deterministic across shuffle-partition counts") {
    val edges = Seq((0L, 1L), (0L, 3L), (2L, 1L), (4L, 3L), (4L, 5L)).toDF("src", "dst")
    val a = Graph.hitsFixed(edges.repartition(1), 2).orderBy("kind", "node").collect().toSeq
    val b = Graph.hitsFixed(edges.repartition(7), 2).orderBy("kind", "node").collect().toSeq
    assert(a == b)
  }

  test("deterministic across shuffle-partition counts") {
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (2L, 5L))
    val a = Graph.pagerankFixed(edges.repartition(1), 3).orderBy("node").collect().toSeq
    val b = Graph.pagerankFixed(edges.repartition(7), 3).orderBy("node").collect().toSeq
    assert(a == b)
  }
}
