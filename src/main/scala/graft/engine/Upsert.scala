package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / MERGE INTO semantics (reference: OGRLayer::UpsertFeature and
  * the SQL UPSERT path, /root/reference/ogr/ogrsf_frmts/generic/
  * ogrlayer.cpp UpsertFeature — update the row when the key exists,
  * insert otherwise). Spark shape: union + per-key latest-wins window —
  * ONE shuffle on the key, no driver involvement; at 100 TB this is the
  * standard merge-on-read pattern (the sort inside each key group is over
  * the 2 candidate rows, not data-sized). */
object Upsert {

  /** updates override base on `keys`; columns must match. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_src").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_src", "_rn")
  }
}
