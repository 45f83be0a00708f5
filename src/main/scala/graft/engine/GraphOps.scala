package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GNM-style network analysis (reference: GNMGraph::DijkstraShortestPath /
  * ConnectedComponents, /root/reference/gnm/gnmgraph.cpp:185-244 and
  * gnmgenericnetwork.cpp:804-860). GDAL runs a priority-queue Dijkstra on
  * one machine; the Spark-native equivalent is synchronous parallel edge
  * relaxation (Bellman–Ford / Pregel shape): per round ONE join of the
  * frontier against the edge table + a min-aggregate, converging in
  * diameter rounds. Same fixpoint as Dijkstra for non-negative weights;
  * at 100 TB the edge table is the big side and each round is a bounded
  * pair of shuffles — no driver-side graph state. */
object GraphOps {

  /** Single-source shortest distances. `edges` needs (src, dst, w). */
  def shortestPaths(edges: DataFrame, source: Long, maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("double")).cache()
    var dist = Seq((source, 0.0)).toDF("node", "dist").cache()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true) // cut lineage; frames stay diameter-bounded
      changed = next.as("n").join(dist.as("o"), Seq("node"), "left")
        .where(col("o.dist").isNull || col("n.dist") < col("o.dist")).count() +
        (next.count() - dist.count())
      dist.unpersist()
      dist = next
      it += 1
    }
    dist
  }

  /** Undirected connected components via hash-min label propagation
    * (the distributed CC also used conceptually by the sieve/nearblack
    * merges): component id = min node id reachable. `edges` needs
    * (src, dst); both directions are derived. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long"), col("src").cast("long")))
      .toDF("a", "b").cache()
    // localCheckpoint severs lineage from `und` so the propagation join
    // below is not an ambiguous self-join
    var comp = und.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node")).localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val prop = comp.as("c").join(und.as("u"), col("c.node") === col("u.a"))
        .select(col("u.b").as("node"), col("c.comp").as("comp"))
      val next = comp.unionByName(prop)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      changed = next.as("n").join(comp.as("o"), Seq("node"))
        .where(col("n.comp") < col("o.comp")).count()
      comp.unpersist()
      comp = next
      it += 1
    }
    comp
  }
}
