package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end playlist ELT (the reference's 4 chained DAGs, D1–D4, as one
  * composable program; stage boundaries = parquet writes, exactly like the
  * reference's zone hand-offs).
  *
  * `run` materializes every stage; `compose` returns the gold frames as
  * lazy plans over the raw input with NO intermediate materialization —
  * the whole raw→gold graph then optimizes as a single Catalyst plan
  * (a genuine improvement over the reference's per-model walls, SURVEY §3.3).
  */
object Pipeline {

  /** Materializing run: raw JSON path → bronze/silver/gold parquet zones
    * under `warehouseDir`. Returns the gold frames. */
  def run(spark: SparkSession, rawPath: String, warehouseDir: String,
      singleFile: Boolean = false): Map[String, DataFrame] = {
    val raw = Bronze.readRaw(spark, rawPath)
    val bronze = Bronze.shred(raw)
    bronze.foreach { case (t, df) =>
      Zones.writeParquet(df, s"$warehouseDir/bronze/$t", singleFile = singleFile)
    }
    val bronzeRead = bronze.keys.map(t =>
      t -> Zones.readParquet(spark, s"$warehouseDir/bronze/$t")).toMap
    val silver = Silver.projectAll(bronzeRead)
    silver.foreach { case (t, df) =>
      Zones.writeParquet(df, s"$warehouseDir/silver/$t", singleFile = singleFile)
    }
    val silverRead = silver.keys.map(t =>
      t -> Zones.readParquet(spark, s"$warehouseDir/silver/$t")).toMap
    val gold = Gold.build(silverRead)
    gold.foreach { case (t, df) =>
      Zones.writeParquet(df, s"$warehouseDir/gold/$t", singleFile = singleFile)
    }
    gold.keys.map(t => t -> Zones.readParquet(spark, s"$warehouseDir/gold/$t")).toMap
  }

  /** Lazy composition: raw → gold as unmaterialized plans. */
  def compose(spark: SparkSession, rawPath: String): Map[String, DataFrame] =
    Gold.build(Silver.projectAll(Bronze.shred(Bronze.readRaw(spark, rawPath))))
}
