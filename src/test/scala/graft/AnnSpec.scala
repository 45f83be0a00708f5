package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Ann
import graft.functions.gf

/** IVF-with-trained-quantizer properties that the e04 oracle gate cannot
  * express: (a) recall@k vs the exact brute-force top-k is high on the
  * real embeddings table, (b) the trained k-means beats the e03-style
  * "first-k vectors" quantizer on within-cluster variance, (c) training
  * is bit-deterministic across repeat runs (the property the 1e-6
  * centroid rounding exists to guarantee). */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("kmeans is bit-deterministic across runs") {
    val a = Ann.kmeans(vecs, "vec_id", "embedding", k = 8, iters = 2)
    val b = Ann.kmeans(vecs, "vec_id", "embedding", k = 8, iters = 2)
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, ca), (_, cb)) =>
      assert(java.util.Arrays.equals(ca, cb))
    }
    assert(a.nonEmpty && a.head._2.length == 64)
  }

  test("trained centroids reduce quantization error vs first-k init") {
    def sse(cents: Seq[(Int, Array[Double])]): Double = {
      val emb = col("embedding").cast("array<double>")
      val entries = cents.map { case (_, c) =>
        val cc = c.foldLeft(0.0)((s, x) => s + x * x)
        lit(cc) - lit(2.0) * gf.vec_dot(emb, typedLit(c.toSeq))
      }
      // min over centroids of (‖c‖² − 2 v·c); the common ‖v‖² offset is
      // irrelevant to the comparison between the two centroid sets
      vecs.select(array_min(array(entries: _*)).as("s"))
        .agg(sum("s")).head().getDouble(0)
    }
    val trained = Ann.kmeans(vecs, "vec_id", "embedding", k = 8, iters = 2)
    val naive = vecs.where(col("vec_id") < 8).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) }.toSeq
    assert(sse(trained) < sse(naive))
  }

  test("kmeans trainCap trains on EXACTLY the stride sample (round-4 verdict #9)") {
    val k = 4; val iters = 2; val cap = 50L
    val capped = Ann.kmeans(vecs, "vec_id", "embedding", k, iters, trainCap = cap)
    val n = vecs.count()
    val tStride = math.max(1L, n / cap)
    assert(tStride > 1L, "fixture too small to exercise the cap")
    // driver-side Lloyd's over ONLY the stride sample, with the engine's
    // exact init (full-corpus stride), fold order (sequential c·c and v·c),
    // tie-break (lowest cid), and 1e-6 centroid rounding: agreement proves
    // the distributed trainer's per-iteration passes never read a row
    // outside the sample
    val all = vecs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val initStride = math.max(1L, n / k)
    var cents: Seq[(Int, Array[Double])] = all.filter(_._1 % initStride == 0)
      .take(k).map(_._2).zipWithIndex.map { case (c, i) => (i, c) }.toIndexedSeq
    val sample = all.filter(_._1 % tStride == 0)
    def dot(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * c(i); i += 1 }; s
    }
    for (_ <- 0 until iters) {
      val byCid = sample.groupBy { case (_, v) =>
        cents.map { case (cid, c) =>
          (c.foldLeft(0.0)((a, x) => a + x * x) - 2.0 * dot(v, c), cid)
        }.min._2
      }
      cents = byCid.toSeq.sortBy(_._1).map { case (cid, rows) =>
        val dim = rows.head._2.length
        (cid, Array.tabulate(dim) { p =>
          val m = rows.map(_._2(p)).sum / rows.length
          math.floor(m * 1000000.0 + 0.5) / 1000000.0
        })
      }
    }
    assert(capped.map(_._1) === cents.map(_._1))
    capped.zip(cents).foreach { case ((_, got), (_, want)) =>
      got.zip(want).zipWithIndex.foreach { case ((g, w), p) =>
        assert(math.abs(g - w) < 1e-9, s"component $p: $g vs $w") }
    }
    // and the cap genuinely changes training (it is not a no-op filter)
    val uncapped = Ann.kmeans(vecs, "vec_id", "embedding", k, iters)
    assert(!capped.zip(uncapped).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b) })
  }

  test("IVF recall@3 vs exact brute-force is >= 0.8") {
    val ivf = Ann.ivfTopK(vecs, "vec_id", "embedding",
        isQuery = id => id >= 20 && id < 60,
        k = 8, iters = 2, nprobe = 4, topK = 3)
      .select("qid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val emb = col("embedding").cast("array<double>")
    val base = vecs.select(col("vec_id"), emb.as("e"), gf.vec_norm(emb).as("nm"))
    val q = base.where(col("vec_id") >= 20 && col("vec_id") < 60)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    val exact = q.crossJoin(base)
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cos", gf.vec_dot(col("qe"), col("e")) / (col("qn") * col("nm")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = ivf.intersect(exact).size.toDouble / exact.size
    info(f"recall@3 = $recall%.3f (${ivf.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.8)
  }

  test("PQ recall@3 vs exact brute-force is >= 0.8 and PQ is deterministic") {
    def run() = Ann.pqTopK(vecs, "vec_id", "embedding",
        isQuery = id => id >= 20 && id < 60,
        m = 16, k = 16, iters = 2, candC = 64, topK = 3)
      .select("qid", "pid", "rank", "cos_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = run(); val b = run()
    assert(a === b, "PQ pipeline must be bit-deterministic")
    val pq = a.map(t => (t._1, t._2))

    val emb = col("embedding").cast("array<double>")
    val base = vecs.select(col("vec_id"), emb.as("e"), gf.vec_norm(emb).as("nm"))
    val q = base.where(col("vec_id") >= 20 && col("vec_id") < 60)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    val exact = q.crossJoin(base)
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cos", gf.vec_dot(col("qe"), col("e")) / (col("qn") * col("nm")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(f"PQ recall@3 = $recall%.3f (${pq.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.8)
  }

  test("residual IVF-PQ recall@3 >= plain IVF-PQ (the point of residual coding)") {
    def exactTop3: Set[(Long, Long)] = {
      val emb = col("embedding").cast("array<double>")
      val base = vecs.select(col("vec_id"), emb.as("e"), gf.vec_norm(emb).as("nm"))
      val q = base.where(col("vec_id") >= 20 && col("vec_id") < 60)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nm").as("qn"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      q.crossJoin(base).where(col("qid") =!= col("vec_id"))
        .withColumn("cos", gf.vec_dot(col("qe"), col("e")) / (col("qn") * col("nm")))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exact = exactTop3
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val isQ = (id: org.apache.spark.sql.Column) => id >= 20 && id < 60
    val plain = recallOf(Ann.ivfPqTopK(vecs, "vec_id", "embedding", isQ,
      kCoarse = 8, itersCoarse = 2, nprobe = 4, m = 16, k = 16, iters = 2,
      candC = 48, topK = 3))
    val resid = recallOf(Ann.ivfPqResidualTopK(vecs, "vec_id", "embedding", isQ,
      kCoarse = 8, itersCoarse = 2, nprobe = 4, m = 16, k = 16, iters = 2,
      candC = 48, topK = 3))
    info(f"IVF-PQ recall@3: plain $plain%.3f, residual $resid%.3f")
    assert(resid >= plain - 0.05, s"residual $resid should not trail plain $plain")
    assert(resid >= 0.7, s"residual recall too low: $resid")
  }

  test("SQ8 top-k recall vs exact brute force is high (8-bit reconstruction)") {
    val got = Ann.sq8TopK(vecs, "vec_id", "embedding",
        isQuery = id => id < 20, candC = 48, topK = 3)
      .select("qid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = col("embedding").cast("array<double>")
    val base = vecs.select(col("vec_id"), emb.as("e"), gf.vec_norm(emb).as("nm"))
    val q = base.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    val exact = q.crossJoin(base)
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cos", gf.vec_dot(col("qe"), col("e")) / (col("qn") * col("nm")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    info(f"SQ8 recall@3: $recall%.3f")
    // 8-bit per-dim reconstruction is near-lossless for ranking purposes
    assert(recall >= 0.9, s"SQ8 recall too low: $recall")
  }

  test("fused VecNearestCid/VecProbeCids match the unfused Catalyst formulation") {
    // the fused kernels replaced array_min(array(struct(vec_dot...))) /
    // slice(array_sort(...)) — assert bit-identical choices on inputs that
    // stress the tie rule ((s, cid) lexicographic) and NaN ordering
    import org.apache.spark.sql.functions._
    import graft.functions.gf
    val spark2 = spark
    import spark2.implicits._
    val cents: Seq[(Int, Array[Double])] = Seq(
      3 -> Array(1.0, 0.0, 0.0),
      1 -> Array(1.0, 0.0, 0.0), // duplicate centroid → score tie, cid 1 must win
      2 -> Array(0.0, 1.0, 0.0),
      5 -> Array(0.0, 0.0, 1.0))
    val rows = (0 until 64).map { i =>
      (i.toLong, Array((i % 5).toDouble / 4, ((i * 3) % 7).toDouble / 6,
        ((i * 11) % 13).toDouble / 12))
    } :+ (999L, Array(Double.NaN, 0.0, 0.0)) // NaN scores everywhere
    val df = rows.toDF("id", "e").withColumn("e", col("e").cast("array<double>"))
    def unfusedNearest(emb: org.apache.spark.sql.Column) = {
      val entries = cents.map { case (cid, c) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        struct((lit(cc) - lit(2.0) * gf.vec_dot(emb, typedLit(c.toSeq))).as("s"),
          lit(cid).as("cid"))
      }
      array_min(array(entries: _*)).getField("cid")
    }
    def unfusedProbe(emb: org.apache.spark.sql.Column, np: Int) = {
      val entries = cents.map { case (cid, c) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        struct((lit(cc) - lit(2.0) * gf.vec_dot(emb, typedLit(c.toSeq))).as("s"),
          lit(cid).as("cid"))
      }
      slice(array_sort(array(entries: _*)), 1, np).getField("cid")
    }
    graft.functions.GraftFunctions.register(spark)
    val cmp = df.select(col("id"),
        Ann.nearestCid(col("e"), cents).as("fused"),
        unfusedNearest(col("e")).as("plain"),
        Ann.probeCids(col("e"), cents, 3).as("fusedP"),
        unfusedProbe(col("e"), 3).as("plainP"))
      .collect()
    cmp.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"nearest mismatch id=${r.getLong(0)}")
      assert(r.getSeq[Int](3) === r.getSeq[Int](4), s"probe mismatch id=${r.getLong(0)}")
    }
    // the duplicate-centroid tie resolves to the LOWER cid on both paths
    val t0 = cmp.find(_.getLong(0) == 0L).get
    assert(Set(1, 2, 5, 3).contains(t0.getInt(1)))
    assert(!cmp.exists(r => r.getInt(1) == 3 &&
      r.getSeq[Int](3).contains(1) && r.getSeq[Int](3).indexOf(3) < r.getSeq[Int](3).indexOf(1)))
  }
}
