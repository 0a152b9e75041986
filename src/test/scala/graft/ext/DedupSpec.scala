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

  test("containment: subset doc scores 1e6 where jaccard stays low") {
    // doc 6 is a strict 4-token prefix of doc 5: every one of its two
    // 3-shingles is a shingle of 5, so containment is exactly 1e6 while
    // jaccard is 2/8 = 0.25 — the quotation/truncation class symmetric
    // jaccard misses at any threshold above 0.25.
    val subset = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (6L, "alpha beta gamma delta"),
      (7L, "unrelated words entirely different from anything else here")
    ).toDF("doc_id", "t")
    val sh = Dedup.wordShingles(subset, "doc_id", "t", 3)
    val got = Dedup.containmentPairs(sh, "doc_id", 900000L)
      .select("id_a", "id_b", "common", "na", "nb", "contain_micros").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == Set((5L, 6L)))
    assert(got((5L, 6L)) == ((2L, 8L, 2L, 1000000L)))
    val jac = Dedup.jaccardPairs(sh, "doc_id", 0.0)
      .filter(col("id_a") === 5L && col("id_b") === 6L)
      .select("jaccard").collect().head.getDouble(0)
    assert(jac == 0.25)
    // asymmetry guard: the threshold keeps genuinely-unrelated docs out
    assert(!got.contains((5L, 7L)) && !got.contains((6L, 7L)))
  }

  test("minhash+LSH candidates include the exact and near dup pairs") {
    val sh = Dedup.wordShingles(docs, "doc_id", "t", 3)
    val cand = Dedup.lshCandidates(Dedup.minhashSignature(sh, "doc_id", 32), "doc_id", 32, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    assert(cand.contains((1L, 3L)))
  }

  test("minhash LSH recall vs exact-jaccard truth on the verify corpus") {
    // Round 1 computed this INSIDE the benched dedup_minhash_lsh query
    // (the O(pairs) exact verifier made the scalable variant the slowest
    // query in the bench); the recall contract lives here instead.
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ext.TextStats.normText(col("text")).as("t"))
    val corpus = docs.union(
      docs
        .filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), expr("substring(t, instr(t, ' ') + 1)").as("t")))
    val sh = Dedup.wordShingles(corpus, "doc_id", "t", 5)
    val truth = Dedup.jaccardPairs(sh, "doc_id", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup
      .lshCandidates(Dedup.minhashSignature(sh, "doc_id", 16, portable = true), "doc_id", 16, 2, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & cand).size.toDouble / truth.size
    assert(truth.nonEmpty)
    assert(recall >= 0.85, s"LSH recall $recall over ${truth.size} true pairs")
  }

  test("jaccardPairs df-cap drops boilerplate shingles from candidate generation") {
    // two docs whose ONLY shared shingle is a boilerplate header that is
    // also shared by every other doc: capping df kills the candidate pair
    val header = "standard legal disclaimer applies to this document"
    val boiler = (1L to 12L).map(i => (i, s"$header unique body number $i content"))
      .toDF("doc_id", "t")
    val sh = Dedup.wordShingles(boiler, "doc_id", "t", 5)
    val uncapped = Dedup.jaccardPairs(sh, "doc_id", 0.0).count()
    val capped = Dedup.jaccardPairs(sh, "doc_id", 0.0, dfCap = 8)
    assert(uncapped > 0)
    assert(capped.count() == 0)
    // and the capped join input is provably bounded
    val maxDf = sh.groupBy("shingle").count().agg(max("count")).head.getLong(0)
    assert(maxDf > 8) // the boilerplate shingles really were hot
  }

  test("portable simhash: identical texts collide, near dup is close, votes match native shape") {
    val sim = Dedup.simhashPortable(docs, "doc_id", "t", 60)
    val m = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) < java.lang.Long.bitCount(m(1L) ^ m(4L)))
    val pairs = Dedup.simhashPairs(sim, "doc_id", 3, bandBits = 15)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
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

  test("adaptive sign-bucket LSH: >=12 bits and max bucket occupancy stays bounded") {
    val e = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val bits = Vectors.signBucketBits(n)
    assert(bits >= 12)
    // the scale contract: in-bucket pair work is bounded by the occupancy
    // target, so the bucket join can never quietly go quadratic
    val occ = e
      .withColumn("b", Vectors.signBucket(col("embedding"), bits))
      .groupBy("b").count()
      .agg(max("count")).head.getLong(0)
    assert(occ <= 64, s"max bucket occupancy $occ for $n vectors at $bits bits")
    // and the ladder widens with corpus size: 100 TB-ish n gets more bits
    assert(Vectors.signBucketBits(1_000_000_000L) > bits)
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

  test("duplicateClusters: min-label components over pair lists, chain-deep convergence") {
    // two components: a 3-chain {1,2,3} (1-2, 2-3; 1 and 3 never paired
    // directly) and a pair {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    // a 12-node chain needs ~diameter rounds — exercises the fixpoint loop
    // well past one propagation step, and reversed edge order must not
    // matter
    val chain = (1L until 12L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val labs = Dedup.duplicateClusters(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.size == 12 && labs.values.forall(_ == 1L))
  }

  test("star-contraction CC matches label propagation and handles a 40-chain") {
    // the pathological case star contraction exists for: a long path.
    // Label propagation needs ~diameter rounds; star contraction must
    // resolve it within its O(log n) iteration budget (maxIter 10 here —
    // 40 rounds of propagation would blow it)
    val chain = (1L until 40L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val star = Dedup.duplicateClustersStar(chain, "id_a", "id_b", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 40 && star.values.forall(_ == 1L))
    // same output as the default implementation on a mixed graph
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val lp = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = Dedup.duplicateClustersStar(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st == lp)
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
