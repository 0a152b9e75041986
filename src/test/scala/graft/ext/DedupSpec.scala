package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog tonight"),     // near dup (first word dropped)
    (4L, "spark shuffles partitions across the cluster with hash joins")
  ).toDF("doc_id", "t")

  test("exactDedup keeps the smallest id per group and is idempotent") {
    val once = Dedup.exactDedup(docs, Seq("t"), "doc_id")
    assert(once.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    val twice = Dedup.exactDedup(once, Seq("t"), "doc_id")
    assert(twice.count() == once.count())
  }

  test("jaccard pairs: exact dup scores 1.0; near dup is high; unrelated absent") {
    val sh = Dedup.wordShingles(docs, "doc_id", "t", 3)
    val byName = Dedup.jaccardPairs(sh, "doc_id", 0.0)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(byName((1L, 2L)) == 1.0)
    assert(byName((1L, 3L)) > 0.7)
    assert(!byName.contains((1L, 4L)))
  }

  test("minhash+LSH candidates include the exact and near dup pairs") {
    val sh = Dedup.wordShingles(docs, "doc_id", "t", 3)
    val cand = Dedup.lshCandidates(Dedup.minhashSignature(sh, "doc_id", 32), "doc_id", 32, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    assert(cand.contains((1L, 3L)))
  }

  test("simhash: identical texts get identical hashes (hamming 0)") {
    val sim = Dedup.simhash64(docs, "doc_id", "t")
    val m = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(4L)) > 10) // unrelated text far away
    val pairs = Dedup.simhashPairs(sim, "doc_id", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("vector ops: cosine of identical vectors is ~1, orthogonal is 0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f, 2.0f)),
      (3L, Array(0.0f, 3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val v = vecs.withColumn("v", Vectors.toDouble(col("embedding")))
    val a = v.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = v.select(col("vec_id").as("ib"), col("v").as("vb"))
    val cos = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (Vectors.dot(col("va"), col("vb")) /
          (Vectors.l2Norm(col("va")) * Vectors.l2Norm(col("vb")))).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(cos((1L, 2L)) - 1.0) < 1e-12)
    assert(cos((1L, 3L)) == 0.0)
  }

  test("stub featurizer is deterministic and batch-boundary independent") {
    val d = graft.Tables.documents(spark, sf).limit(100)
    val f1 = Multimodal.extractFeatures(Multimodal.binarize(d), dim = 8, batchSize = 64)
      .collect().map(f => f.doc_id -> (f.checksum, f.features.toSeq)).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.binarize(d), dim = 8, batchSize = 7)
      .collect().map(f => f.doc_id -> (f.checksum, f.features.toSeq)).toMap
    assert(f1 == f2)
    assert(f1.size == 100)
  }
}
