package graft.core

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized-result cache with invalidation — the reference's de facto
  * optimizer (SURVEY.md §4): derived results live at param-encoded paths
  * (scarf/datastore/graph_datastore.py:738-745) guarded by a subset-hash
  * manifest (scarf/assay.py:316-377) so a stale cache is never reused
  * when the input mask/params change.
  *
  * Spark mapping: parquet tables under a root dir, path = op name +
  * sorted `k=v` params; manifest = one json file holding the params and
  * the input fingerprint. `fingerprint` is an order-independent xor/sum
  * hash computed distributively — cheap relative to recompute.
  */
class CacheStore(root: String) {

  private def dir(op: String, params: Map[String, String]): String = {
    val enc = params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("__")
    s"$root/${op}__$enc"
  }

  /** Order-independent fingerprint of a DataFrame: [[Fingerprint]]'s
    * bit_xor ∥ decimal-sum over per-row 64-bit hashes of all columns,
    * paired with the row count (either aggregate alone has a
    * structured collision mode — see Fingerprint's Scaladoc). One
    * aggregation, no sort, no collect of data, no overflow under ANSI
    * mode. Changing this form invalidates pre-existing on-disk
    * manifests once (a stale-manifest miss recomputes, never reuses).
    */
  def fingerprint(df: DataFrame): String = {
    val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
    val r = h.agg(
      expr("concat_ws('_', bit_xor(h), sum(cast(h as decimal(38,0))))").as("x"),
      count(lit(1)).as("n")).head()
    s"${r.getString(0)}_${r.getLong(1)}"
  }

  /** latest_* pointers (the reference records the most recent graph's
    * parameter-encoded location as `latest_graph`/`latest_cell_key`/… ,
    * scarf/datastore/graph_datastore.py:738-780): one json file per op
    * naming the param set last materialized.
    */
  def setLatest(op: String, params: Map[String, String]): Unit = {
    Files.createDirectories(Paths.get(root))
    Files.writeString(Paths.get(s"$root/latest_$op.json"),
      params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("__"))
  }

  def latest(op: String): Option[Map[String, String]] = {
    val p = Paths.get(s"$root/latest_$op.json")
    if (!Files.exists(p)) None
    else Some(Files.readString(p).split("__").filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
  }

  /** Read the table the latest pointer for `op` names, if present. */
  def loadLatest(spark: SparkSession, op: String): Option[DataFrame] =
    latest(op).flatMap { params =>
      val d = dir(op, params)
      if (Files.exists(Paths.get(d))) Some(spark.read.parquet(d)) else None
    }

  /** Return the cached result if the manifest matches (params + input
    * fingerprint); otherwise compute, persist, stamp, and return.
    */
  def getOrCompute(spark: SparkSession, op: String, params: Map[String, String],
                   input: DataFrame)(compute: => DataFrame): DataFrame = {
    val d = dir(op, params)
    val manifest = Paths.get(s"$d.manifest.json")
    val fp = fingerprint(input)
    val expected = s"""{"op":"$op","fingerprint":"$fp","params":"${params.toSeq.sorted.mkString(";")}"}"""
    if (Files.exists(manifest) && Files.readString(manifest) == expected) {
      spark.read.parquet(d)
    } else {
      val result = compute
      result.write.mode("overwrite").parquet(d)
      Files.createDirectories(manifest.getParent)
      Files.writeString(manifest, expected)
      spark.read.parquet(d)
    }
  }
}
