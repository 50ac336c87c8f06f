package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding-similarity operator tests: exact kernels on hand-computed
  * vectors, and LSH-ANN recall against the brute-force baseline on the
  * real sf0.001 embeddings table. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),  // colinear with 0
    (3L, Array(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: hand-computed values") {
    val c = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        VectorOps.cosine($"a.embedding", $"b.embedding").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((0L, 2L)) == 1.0)                         // colinear
    assert(c((0L, 1L)) == 0.0)                         // orthogonal
    assert(math.abs(c((0L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("topKNeighbors: correct ranking with id tie-break") {
    val res = VectorOps.topKNeighbors(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", 3)
      .orderBy($"rank")
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(res.map(_._1).toSeq == Seq(2L, 3L, 1L)) // cos: 1.0, 0.707, 0.0
  }

  test("ivfAnnTopK: recall ≥ 0.5 vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val exact = VectorOps.topKNeighbors(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.ivfAnnTopK(emb, queries, "vec_id", "embedding", "label", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF ANN recall $recall below 0.5")
  }

  test("kmeans IVF: recall ≥ 0.5 vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val exact = VectorOps.topKNeighbors(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = VectorOps.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val approx = VectorOps.ivfAnnTopKWith(cents, emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"kmeans IVF recall $recall below 0.5")
  }

  test("lshNearDupPairs: recall ≥ 0.9 vs exact all-pairs at the registered params") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = VectorOps.nearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id_x", "id_y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.lshNearDupPairs(emb, "vec_id", "embedding", 0.45, 16, 4)
      .select("id_x", "id_y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact near-dup baseline found no pairs — test vacuous")
    assert(lsh.subsetOf(exact), "LSH rescore admitted a pair below threshold")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH near-dup recall $recall below 0.9 (${exact.size} exact pairs)")
  }

  test("lshTopSimilarPairs: top-20 recall ≥ 0.95 vs the exact quadratic form (t9's contract)") {
    // the registered t9 parameters; topSimilarPairs stays the correctness
    // baseline, lshTopSimilarPairs is the registered 100 TB shape
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = VectorOps.topSimilarPairs(emb, "vec_id", "embedding", 20)
      .select("id_x", "id_y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.lshTopSimilarPairs(emb, "vec_id", "embedding", 20, 16, 4)
      .select("id_x", "id_y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 20 && lsh.size == 20)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH top-pairs recall $recall below 0.95")
  }

  test("lshAnnTopK: recall ≥ 0.6 vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val exact = VectorOps.topKNeighbors(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.lshAnnTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH ANN recall $recall below 0.6")
  }
}
