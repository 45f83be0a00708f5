package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{gf, GraftFunctions}
import graft.engine.{SpatialJoin, TileJob, Knn}
import graft.sql.OgrCompat
import QueryFixtures._

/** The correctness-gate query suite: every operator family from SURVEY.md §2
  * exposed as a named DataFrame query over the driver's parquet tables, with
  * a DuckDB oracle (SparkEntry.oracleSql) producing identical values.
  *
  * Conventions (driver hash-compares after sorting columns by name):
  *  - identical column aliases on both sides, lowercase
  *  - outputs are BIGINT / STRING wherever possible; doubles only when
  *    bit-exact in both engines (same IEEE ops on same literals)
  *  - money → integer cents via floor(x*100 + 0.5)
  *  - every query ends with a deterministic ORDER BY on both sides
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def prep(s: SparkSession): Unit = GraftFunctions.register(s)

  /** Deterministic golden-ratio point cloud from the events table — the
    * engine-side twin of the oracle's lonOf/latOf SQL (same literals). */
  def eventPoints(s: SparkSession, dir: String): DataFrame = {
    prep(s)
    t(s, dir, "events").select(
      col("event_id"),
      expr(lonOf("event_id")).as("lon"),
      expr(latOf("event_id")).as("lat"))
  }

  def fixturePolyDf(s: SparkSession): DataFrame = {
    prep(s)
    import s.implicits._
    polygons.map { case (id, ext, holes) => (id, polygonWkt(ext, holes)) }
      .toDF("poly_id", "wkt")
      .withColumn("wkb", gf.st_geomfromtext(col("wkt")))
      .drop("wkt")
  }

  private val cents: String => String =
    c => s"CAST(floor($c * 100.0 + 0.5) AS BIGINT)"

  // =====================================================================
  // Relational / OGR-SQL surface (SURVEY.md §2.B, §2.C)
  // =====================================================================

  val defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // -- single-summary-row aggregate (OGR SQL has no GROUP BY; SUMMARY mode)
    ("q01_summary_agg", (s, dir) => {
      t(s, dir, "lineitem").where(col("l_quantity") > 10)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min("l_returnflag").as("min_flag"),
          max("l_returnflag").as("max_flag"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          sum(expr(cents("l_extendedprice"))).as("sum_price_cents"))
    }, Some(s"""
      SELECT count(*) AS n_rows,
             count(DISTINCT l_orderkey) AS n_orders,
             min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             sum(${cents("l_extendedprice")}) AS sum_price_cents
      FROM lineitem WHERE l_quantity > 10""")),

    // -- projection + arithmetic + filter (OGR WHERE / TranslateFeature)
    ("q02_project_filter", (s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity").between(5, 45) && col("l_returnflag") === "R")
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          expr(cents("l_extendedprice * (1.0 - l_discount)")).as("revenue_cents"),
          expr(cents("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")).as("charge_cents"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .orderBy("l_orderkey", "l_linenumber")
    }, Some(s"""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             ${cents("l_extendedprice * (1.0 - l_discount)")} AS revenue_cents,
             ${cents("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS charge_cents,
             CAST(year(l_shipdate) AS BIGINT) AS ship_year
      FROM lineitem
      WHERE l_quantity BETWEEN 5 AND 45 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""")),

    // -- GROUP BY aggregation (SQLite-dialect surface; Catalyst native)
    ("q03_groupby", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          expr(s"CAST(floor(sum(l_quantity) + 0.5) AS BIGINT)").as("sum_qty"),
          sum(expr(cents("l_extendedprice"))).as("sum_price_cents"),
          countDistinct("l_partkey").as("n_parts"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS sum_qty,
             sum(${cents("l_extendedprice")}) AS sum_price_cents,
             count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // -- multi-way equi-join + agg (broadcast dims; SURVEY §2.B JOIN)
    ("q04_join_agg", (s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr(cents("o_totalprice"))).as("sum_cents"))
        .orderBy("r_name", "n_name")
    }, Some(s"""
      SELECT r_name, n_name, count(*) AS n_orders,
             sum(${cents("o_totalprice")}) AS sum_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // -- ORDER BY multi-key + LIMIT/OFFSET (ogr_gensql.cpp:2218,1876-1888)
    ("q05_orderby_limit", (s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), expr(cents("o_totalprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("o_orderkey").asc)
        .offset(5).limit(20)
    }, Some(s"""
      SELECT o_orderkey, ${cents("o_totalprice")} AS price_cents
      FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 20 OFFSET 5""")),

    // -- DISTINCT (SWQM_DISTINCT_LIST; order-normalized compare)
    ("q06_distinct", (s, dir) => {
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    // -- window functions (SQLite-dialect surface)
    ("q07_window", (s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "customer").select(
          col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
          row_number().over(w).cast("long").as("rn"),
          lag("c_custkey", 1).over(w).as("prev_key"),
          sum(expr(cents("c_acctbal"))).over(wsum).as("run_cents"))
        .orderBy("c_custkey")
    }, Some(s"""
      SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             lag(c_custkey, 1) OVER w AS prev_key,
             sum(${cents("c_acctbal")}) OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_custkey""")),

    // -- LIKE / ILIKE / SUBSTR / CONCAT (swq_op_general.cpp:41-162)
    ("q08_strings", (s, dir) => {
      t(s, dir, "part").select(
          col("p_partkey"),
          col("p_name").like("%a%").cast("long").as("has_a"),
          col("p_name").ilike("%A%").cast("long").as("has_a_ci"),
          substring(col("p_name"), 3, 5).as("sub35"),
          concat(col("p_brand"), lit("#"), upper(col("p_type"))).as("brandtype"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CAST(p_name LIKE '%a%' AS BIGINT) AS has_a,
             CAST(p_name ILIKE '%A%' AS BIGINT) AS has_a_ci,
             substr(p_name, 3, 5) AS sub35,
             p_brand || '#' || upper(p_type) AS brandtype,
             CAST(length(p_name) AS BIGINT) AS name_len
      FROM part ORDER BY p_partkey""")),

    // -- CASE / CAST / date parts (SWQCastEvaluator, OGRParseDate)
    ("q09_case_cast", (s, dir) => {
      t(s, dir, "orders").select(
          col("o_orderkey"),
          expr("CASE WHEN o_totalprice >= 150000.0 THEN 'big' WHEN o_totalprice >= 30000.0 THEN 'mid' ELSE 'small' END").as("bucket"),
          expr("CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS BIGINT)").as("ymd"),
          col("o_orderstatus"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice >= 150000.0 THEN 'big' WHEN o_totalprice >= 30000.0 THEN 'mid' ELSE 'small' END AS bucket,
             CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS BIGINT) AS ymd,
             o_orderstatus
      FROM orders ORDER BY o_orderkey""")),

    // -- OGR first-match JOIN (ogr_gensql.cpp:1516-1546; one row per primary)
    ("q10_firstmatch_join", (s, dir) => {
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"), col("l_partkey"))
      OgrCompat.firstMatchJoin(orders, li, Seq("o_orderkey"), col("l_linenumber"))
        .select(col("o_orderkey"),
          col("l_linenumber").cast("long").as("first_line"),
          col("l_partkey").as("first_part"),
          expr(cents("o_totalprice")).as("price_cents"))
        .orderBy("o_orderkey")
    }, Some(s"""
      SELECT o_orderkey, CAST(l_linenumber AS BIGINT) AS first_line,
             l_partkey AS first_part, ${cents("o_totalprice")} AS price_cents
      FROM orders LEFT JOIN (
        SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) = 1
      ) ON o_orderkey = l_orderkey
      ORDER BY o_orderkey""")),

    // -- OGR dialect quirks: case-insensitive '=', int div/mod by zero → INT_MAX
    ("q11_ogr_quirks", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("a", expr("CAST(floor(l_quantity) AS BIGINT)"))
        .withColumn("b", (col("l_linenumber") - 3).cast("long"))
      li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          OgrCompat.intDiv(col("a"), col("b")).as("div_val"),
          OgrCompat.intMod(col("a"), col("b")).as("mod_val"),
          OgrCompat.eqCi(col("l_returnflag"), lit("r")).cast("long").as("is_r_ci"))
        .orderBy("l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CASE WHEN (l_linenumber - 3) = 0 THEN 2147483647
                  ELSE CAST((a - (a % b)) / b AS BIGINT) END AS div_val,
             CASE WHEN (l_linenumber - 3) = 0 THEN 2147483647
                  ELSE a % b END AS mod_val,
             CAST(lower(l_returnflag) = 'r' AS BIGINT) AS is_r_ci
      FROM (SELECT *, CAST(floor(l_quantity) AS BIGINT) AS a,
                   CAST(l_linenumber - 3 AS BIGINT) AS b FROM lineitem)
      ORDER BY l_orderkey, l_linenumber""")),

    // -- JSON-ish prop extraction (hstore_get_value analog) + agg
    ("q12_props_extract", (s, dir) => {
      t(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          sum(expr(cents("value"))).as("sum_value_cents"))
        .orderBy("event_type")
    }, Some(s"""
      SELECT event_type, count(*) AS n,
             sum(k) AS sum_k, min(k) AS min_k, max(k) AS max_k,
             sum(${cents("value")}) AS sum_value_cents
      FROM (SELECT *, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type""")),

    // -- event-time tumbling window (Structured-Streaming-shaped batch agg)
    ("q13_time_window", (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(expr(cents("value"))).as("sum_cents"))
        .select(unix_timestamp(col("window.start")).as("wstart"),
          col("event_type"), col("n"), col("sum_cents"))
        .orderBy("wstart", "event_type")
    }, Some(s"""
      SELECT CAST(floor(floor(epoch(ts)) / 300) * 300 AS BIGINT) AS wstart,
             event_type, count(*) AS n, sum(${cents("value")}) AS sum_cents
      FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    // -- UNION ALL (OGRUnionLayer / swq UNION ALL)
    ("q14_union_all", (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"), lit("customer").as("src"))
      val su = t(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"), lit("supplier").as("src"))
      c.unionByName(su).orderBy("src", "key")
    }, Some("""
      SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
      UNION ALL
      SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src FROM supplier
      ORDER BY src, key""")),

    // ===================================================================
    // Geospatial core (SURVEY.md §2.D-§2.H) — engine expressions vs
    // formula-level SQL oracles over the same golden-ratio point cloud
    // ===================================================================

    // -- gdal2tiles XYZ tile assignment, zooms 4..8 (north rule)
    ("g01_tile_assign", (s, dir) => {
      TileJob.assign(eventPoints(s, dir), 4, 8)
        .select(col("event_id"), col("z").cast("long").as("z"),
          col("x").cast("long").as("x"), col("y").cast("long").as("y"))
        .orderBy("event_id", "z")
    }, Some {
      val selects = (4 to 8).map { z =>
        s"""SELECT event_id, CAST($z AS BIGINT) AS z,
               ${tileX("lon", z)} AS x, ${tileY("lat", z)} AS y FROM pts"""
      }
      s"""WITH pts AS (SELECT event_id, ${lonOf("event_id")} AS lon,
            ${latOf("event_id")} AS lat FROM events)
          ${selects.mkString(" UNION ALL ")} ORDER BY event_id, z"""
    }),

    // -- tile-pyramid counts z8→z3 (gdal raster tile overview semantics)
    ("g02_tile_pyramid", (s, dir) => {
      TileJob.pyramidCounts(eventPoints(s, dir), 3, 8)
        .select(col("z").cast("long").as("z"), col("x").cast("long").as("x"),
          col("y").cast("long").as("y"), col("n"))
        .orderBy("z", "x", "y")
    }, Some {
      val levels = (3 to 8).map { z =>
        val sh = 8 - z
        s"""SELECT CAST($z AS BIGINT) AS z, x >> $sh AS x, y >> $sh AS y,
               sum(n) AS n FROM base GROUP BY 2, 3"""
      }
      s"""WITH pts AS (SELECT ${lonOf("event_id")} AS lon, ${latOf("event_id")} AS lat FROM events),
          base AS (SELECT ${tileX("lon", 8)} AS x, ${tileY("lat", 8)} AS y,
                   CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2)
          ${levels.mkString(" UNION ALL ")} ORDER BY z, x, y"""
    }),

    // -- cell-indexed point-in-polygon spatial join (THE north-rule join)
    ("g03_pip_join", (s, dir) => {
      SpatialJoin.pipJoin(eventPoints(s, dir), fixturePolyDf(s), z = 3)
        .select("event_id", "poly_id").orderBy("event_id", "poly_id")
    }, Some {
      val arms = polygons.map { case (id, _, _) =>
        s"SELECT event_id, '$id' AS poly_id FROM pts WHERE ${insidePolySql(id, "lon", "lat")}"
      }
      s"""WITH pts AS (SELECT event_id, ${lonOf("event_id")} AS lon,
            ${latOf("event_id")} AS lat FROM events)
          ${arms.mkString(" UNION ALL ")} ORDER BY event_id, poly_id"""
    }),

    // -- great-circle distance between consecutive events (kNN metric)
    ("g04_greatcircle", (s, dir) => {
      val p = eventPoints(s, dir)
      val w = Window.orderBy("event_id")
      p.withColumn("lon2", lead("lon", 1).over(w))
        .withColumn("lat2", lead("lat", 1).over(w))
        .where(col("lon2").isNotNull)
        .select(col("event_id"),
          expr("CAST(floor(st_greatcircle(lat, lon, lat2, lon2) / 100.0 + 0.5) AS BIGINT)").as("dist_hm"))
        .orderBy("event_id")
    }, Some(s"""
      WITH pts AS (SELECT event_id, ${lonOf("event_id")} AS lon, ${latOf("event_id")} AS lat FROM events),
      pairs AS (SELECT event_id, lon, lat,
                lead(lon, 1) OVER (ORDER BY event_id) AS lon2,
                lead(lat, 1) OVER (ORDER BY event_id) AS lat2 FROM pts)
      SELECT event_id,
             CAST(floor(${greatCircle("lat", "lon", "lat2", "lon2")} / 100.0 + 0.5) AS BIGINT) AS dist_hm
      FROM pairs WHERE lon2 IS NOT NULL ORDER BY event_id""")),

    // ===================================================================
    // Text / dedup pipeline (training-data ops over `documents`)
    // ===================================================================

    // -- exact dedup: group identical texts, keep min doc_id as canonical
    ("d01_dedup_exact", (s, dir) => {
      t(s, dir, "documents").groupBy("text")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_dups"))
        .select("rep_id", "n_dups").orderBy("rep_id")
    }, Some("""
      SELECT min(doc_id) AS rep_id, count(*) AS n_dups
      FROM documents GROUP BY text ORDER BY rep_id""")),

    // -- token counting + quality scores (length/punct/stopword ratios)
    ("d02_token_stats", (s, dir) => {
      t(s, dir, "documents").select(
          col("doc_id"),
          expr("CAST(length(text) AS BIGINT)").as("n_chars"),
          expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)").as("n_tokens"),
          expr("CAST(floor((length(replace(text, ' ', '')) * 1000.0) / (length(text) - length(replace(text, ' ', '')) + 1)) AS BIGINT)").as("avg_wlen_x1000"),
          expr("CAST(floor((length(text) - length(replace(text, ' the ', ''))) / 5.0) AS BIGINT)").as("n_the"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
             CAST(floor((length(replace(text, ' ', '')) * 1000.0) / (length(text) - length(replace(text, ' ', '')) + 1)) AS BIGINT) AS avg_wlen_x1000,
             CAST(floor((length(text) - length(replace(text, ' the ', ''))) / 5.0) AS BIGINT) AS n_the
      FROM documents ORDER BY doc_id"""))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  def oracleSql: Map[String, String] =
    defs.collect { case (n, _, Some(sql)) => n -> sql.trim }.toMap
}
