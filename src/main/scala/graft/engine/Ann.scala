package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, gf}

/** Approximate-nearest-neighbor over an embedding column: a deterministic
  * Lloyd's-k-means coarse quantizer feeding an IVF (inverted-file) probe +
  * exact-cosine refine. This is the bounded-candidate scale path for
  * similarity search — the candidate set per query is the union of `nprobe`
  * inverted lists, never the full corpus.
  *
  * Reference analog: the gridded/quadtree AOI walk that bounds gdal_grid's
  * neighbor search (/root/reference/alg/gdalgrid.cpp:348-430) — partition
  * space coarsely, probe only nearby partitions, score exactly inside.
  *
  * Scale shape (100 TB): centroids are k×dim doubles — driver-held and
  * bounded by design (like the ≤32k-bin palette histogram). Assignment is a
  * map-only projection against centroid *literals* (zero shuffle, stays in
  * whole-stage codegen via the native vec_dot kernel); the per-iteration
  * centroid update shuffles only k×dim keys after map-side partial
  * aggregation. The probe/refine join shuffles on cid — inverted lists,
  * not all-pairs.
  *
  * Determinism: init is a stride-by-id sample; every updated centroid
  * coordinate is rounded to 1e-6 (absolute), which swamps any
  * aggregation-order float noise so an independent engine replaying the
  * same recipe (the DuckDB oracle) reproduces bit-identical centroids,
  * assignments, and top-k.
  */
object Ann {

  /** score(v, c) = c·c − 2·(v·c): monotone in squared L2 distance to the
    * centroid (the ‖v‖² term is constant per row and cannot change an
    * argmin). Both dots are sequential folds (native VecKernel), matching
    * the oracle's list_sum(list_transform(...)) fold order exactly. */
  private def scoreCol(emb: Column, c: Array[Double]): Column = {
    val cc = c.foldLeft(0.0)((a, x) => a + x * x)
    lit(cc) - lit(2.0) * gf.vec_dot(emb, typedLit(c.toSeq))
  }

  /** cid of the nearest centroid (ties → lowest cid). Map-only. */
  def nearestCid(emb: Column, cents: Seq[(Int, Array[Double])]): Column = {
    val entries = cents.map { case (cid, c) =>
      struct(scoreCol(emb, c).as("s"), lit(cid).as("cid"))
    }
    array_min(array(entries: _*)).getField("cid")
  }

  /** The `nprobe` nearest centroid ids, nearest first. Map-only. */
  def probeCids(emb: Column, cents: Seq[(Int, Array[Double])], nprobe: Int): Column = {
    val entries = cents.map { case (cid, c) =>
      struct(scoreCol(emb, c).as("s"), lit(cid).as("cid"))
    }
    slice(array_sort(array(entries: _*)), 1, nprobe).getField("cid")
  }

  /** Deterministic Lloyd's k-means: init = the first k vectors whose id is
    * a multiple of floor(n/k) (ordered by id), then `iters` fixed
    * iterations of assign (map-only, centroid literals) + elementwise-mean
    * update rounded to 1e-6. Empty clusters drop out (both engines drop
    * them identically via GROUP BY). Returns (cid, centroid) sorted by cid. */
  def kmeans(vecs: DataFrame, idCol: String, embCol: String,
             k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    GraftFunctions.register(vecs.sparkSession)
    val emb = col(embCol).cast("array<double>")
    val n = vecs.count()
    val stride = math.max(1L, n / k)
    var cents: Seq[(Int, Array[Double])] =
      vecs.where(col(idCol) % stride === 0).orderBy(idCol).limit(k)
        .select(emb.as("e")).collect().toIndexedSeq
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    for (_ <- 0 until iters) {
      val upd = vecs
        .select(nearestCid(emb, cents).as("cid"), posexplode(emb).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg((floor(avg("v") * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("ce"))
        .collect()
      cents = upd.map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toIndexedSeq
    }
    cents
  }

  /** IVF top-k: every vector joins its nearest centroid's inverted list;
    * each query probes the `nprobe` nearest lists and ranks candidates by
    * exact cosine (ties → lowest pid). Output: (qid, pid, rank, cos_u)
    * with cos_u = round(cos·1e6). Self-matches are excluded. */
  def ivfTopK(vecs: DataFrame, idCol: String, embCol: String,
              isQuery: Column => Column, k: Int, iters: Int,
              nprobe: Int, topK: Int): DataFrame = {
    val cents = kmeans(vecs, idCol, embCol, k, iters)
    val emb = col(embCol).cast("array<double>")
    val base = vecs.select(col(idCol), emb.as("e"),
      gf.vec_norm(emb).as("nm"))
    val assigned = base.select(col(idCol).as("pid"), col("e").as("pe"),
      col("nm").as("pn"), nearestCid(col("e"), cents).as("cid"))
    val probes = base.where(isQuery(col(idCol)))
      .select(col(idCol).as("qid"), col("e").as("qe"), col("nm").as("qn"),
        explode(probeCids(col("e"), cents, nprobe)).as("cid"))
    val wTop = Window.partitionBy("qid").orderBy(col("cos").desc, col("pid").asc)
    probes.join(assigned, "cid")
      .where(col("qid") =!= col("pid"))
      .withColumn("cos", gf.vec_dot(col("qe"), col("pe")) / (col("qn") * col("pn")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= topK)
      .select(col("qid"), col("pid"), col("rank"),
        expr("CAST(floor(cos * 1000000.0 + 0.5) AS BIGINT)").as("cos_u"))
  }
}
