package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf

/** In-engine geocoding: the MATCHING algorithm of OGRGeocode /
  * OGRGeocodeReverse (reference ogr/ogr_geocoding.cpp:690-1080) against a
  * gazetteer TABLE. The reference resolves queries through a network
  * service fronted by a local cache (SQLite/CSV) keyed on the normalized
  * query; the service stays out of scope here (zero egress), but the
  * cache-and-match semantics — normalized exact lookup first, then ranked
  * candidate matching, nearest-entry reverse lookup — are the algorithmic
  * core and are what this operator distributes.
  *
  * Scale shape: the gazetteer is the small side (10^5–10^7 named places)
  * → broadcast; the query/point side is the 100 TB side and never
  * shuffles. The exact pass is a broadcast hash equi-join on the
  * normalized name; the fuzzy pass runs only for the misses (broadcast
  * anti-join) and ranks trigram-Jaccard candidates — with a gazetteer too
  * big to broadcast, band the trigram sets with [[Lsh]] exactly as the
  * d05 near-dup path does and feed the bucketed candidates in here.
  */
object Geocode {

  /** OGRGeocode's query normalization analog (the cache key): lowercase,
    * trim, collapse internal whitespace. */
  def norm(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Forward geocode. `queries` = (qid, query); `gaz` = (key, name, lon,
    * lat). Returns one row per query that matched at ≥ `minSimMilli`
    * trigram-Jaccard (exact normalized matches score 1000): (qid, key,
    * name, lon, lat, sim_milli). Ties break deterministically by
    * (sim desc, name asc, key asc). */
  def forward(queries: DataFrame, gaz: DataFrame,
              minSimMilli: Int = 400): DataFrame = {
    val q = queries.withColumn("nq", norm(col("query")))
    val g = gaz.withColumn("ng", norm(col("name")))
    // cache-hit path: broadcast equi-join, no query-side shuffle
    val exact = q.join(broadcast(g), col("nq") === col("ng"))
      .select(col("qid"), col("key"), col("name"), col("lon"), col("lat"),
        lit(1000L).as("sim_milli"))
    // miss path: trigram-Jaccard ranking against the broadcast gazetteer
    val missQ = q
      .join(broadcast(g.select(col("ng"))), col("nq") === col("ng"), "left_anti")
      .withColumn("tq", array_distinct(gf.text_trigram_codes(col("nq"))))
    val gt = g.withColumn("tg", array_distinct(gf.text_trigram_codes(col("ng"))))
    val scored = missQ.crossJoin(broadcast(gt))
      .withColumn("inter", size(array_intersect(col("tq"), col("tg"))))
      .withColumn("uni", size(col("tq")) + size(col("tg")) - col("inter"))
      // exact integer milli-similarity: no FP threshold ambiguity
      .withColumn("sim_milli",
        when(col("uni") > 0, expr("CAST(inter * 1000 DIV uni AS BIGINT)"))
          .otherwise(lit(0L)))
      .where(col("sim_milli") >= minSimMilli)
    val w = Window.partitionBy("qid")
      .orderBy(col("sim_milli").desc, col("name"), col("key"))
    val fuzzy = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("qid"), col("key"), col("name"), col("lon"), col("lat"),
        col("sim_milli"))
    exact.unionByName(fuzzy)
  }

  /** Reverse geocode (OGRGeocodeReverse analog): nearest gazetteer entry
    * by exact great-circle distance. `points` = (qid, plon, plat);
    * returns (qid, key, name, dist_m). The point side never shuffles;
    * with a non-broadcastable gazetteer this becomes the [[Knn]]
    * cell-ring search with k=1. */
  def reverse(points: DataFrame, gaz: DataFrame): DataFrame = {
    val joined = points.crossJoin(broadcast(gaz))
      .withColumn("dist_m",
        gf.st_greatcircle(col("plat"), col("plon"), col("lat"), col("lon")))
    val w = Window.partitionBy("qid").orderBy(col("dist_m"), col("key"))
    joined.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("qid"), col("key"), col("name"), col("dist_m"))
  }
}
