package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion (SURVEY.md §2.1): the reference's readers stream
  * format-specific containers into the store (scarf/readers.py); here the
  * equivalents parse text-based formats straight into the COO model with
  * plain distributed reads — no driver-side parsing, any file size.
  * HDF5-container variants (CrH5/H5ad/Loom/NaboH5 + to_h5ad export) live
  * in graft.sources.hdf5.H5Sources on a pure-JVM HDF5 parser.
  */
object Readers {

  /** MatrixMarket `matrix.mtx` (+ barcodes/features tsv) → COO, the
    * CrDirReader equivalent (scarf/readers.py:297-585). MTX is 1-based
    * `(feat_idx, cell_idx, value)` with %-comment header and a dims line;
    * the dims line is dropped by keeping only rows with a running index
    * > first data line — detected distributively by excluding the first
    * non-comment line via its (dims) content never colliding with data
    * is unsound, so we filter comments, then drop the min-position line
    * using a monotonic file offset.
    */
  def readMtx(spark: SparkSession, mtxPath: String): DataFrame = {
    val raw = spark.read.text(mtxPath)
      .filter(!col("value").startsWith("%"))
      .withColumn("parts", split(trim(col("value")), "\\s+"))
    // drop the dims line: it is the first non-comment line of the (single)
    // file, i.e. the row with the minimum monotonic id
    val withId = raw.withColumn("mid", monotonically_increasing_id())
    val firstId = withId.agg(min("mid").as("first_mid"))
    withId.crossJoin(broadcast(firstId))
      .filter(col("mid") =!= col("first_mid"))
      .select(
        element_at(col("parts"), 2).cast("long").as("cell_id"),
        element_at(col("parts"), 1).cast("long").as("feat_id"),
        element_at(col("parts"), 3).cast("double").as("value"))
  }

  /** barcodes.tsv / features.tsv sidecars → metadata tables with 1-based
    * ordinal ids matching the MTX indices (file order = index order).
    */
  def readTsvIds(spark: SparkSession, path: String, idCol: String): DataFrame = {
    // file order = index order, but NOT via a single-partition global
    // window: a 4M-barcode file would sort on one task. globalOrdinal is
    // two cheap passes (per-partition counts, then offset map).
    val raw = spark.read.option("sep", "\t").csv(path)
      .withColumn("mid", monotonically_increasing_id())
    graft.ops.Windows.globalOrdinal(raw, Seq(col("mid")), idCol).drop("mid")
  }

  /** Dense CSV (header = feature names, rows = cells) → COO via
    * posexplode, the CSVReader equivalent (scarf/readers.py:1123-1295).
    * Side columns listed in `metaCols` are routed to cell metadata.
    */
  def readDenseCsv(spark: SparkSession, path: String,
                   metaCols: Seq[String] = Seq.empty): (DataFrame, DataFrame) = {
    val df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      .withColumn("cell_id", monotonically_increasing_id())
    val featCols = df.columns.filterNot(c => metaCols.contains(c) || c == "cell_id")
    val coo = df.select(col("cell_id"),
        posexplode(array(featCols.map(c => col(c).cast("double")): _*))
          .as(Seq("feat_idx", "value")))
      .filter(col("value") =!= 0)
      .select(col("cell_id"), (col("feat_idx") + 1).cast("long").as("feat_id"), col("value"))
    val meta = df.select((Seq(col("cell_id")) ++ metaCols.map(col)): _*)
    (coo, meta)
  }

  /** JSONL corpus ingestion — the de-facto interchange format of
    * training-data pipelines (one JSON document per line, typically
    * *.jsonl or *.jsonl.gz; Spark's text-based json source splits
    * uncompressed files and parallelizes gz per-file). An explicit
    * schema is required: schema inference is a full extra pass over
    * 100 TB and silently unions drifting shapes; corrupt lines are
    * preserved in `_corrupt_record` mode PERMISSIVE (the lossless
    * default for crawl data — count them, don't die mid-job).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** JSONL export: one JSON object per line, field order = column order.
    * Partitioned output (one file per partition) — the caller coalesces
    * for a single canonical file the same way writeMtx does.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC interchange — the other columnar warehouse format Spark ships
    * a native vectorized reader for (spark-sql's built-in orc source;
    * no extra dependency). Same pushdown/pruning properties as parquet:
    * predicate pushdown reaches the stripe index, column pruning the
    * stripe footers — asserted by the round's ScaleShapeSpec pattern.
    * The writer preserves the frame's schema verbatim, so
    * parquet→orc→parquet round-trips are value-exact.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Export a COO matrix as MTX text (to_mtx, scarf/writers.py:1262-1304):
    * header + dims line + sorted triples, written distributively then
    * concatenated by Spark's text sink (one part per partition; a single
    * `coalesce(1)` yields the canonical single-file form).
    */
  def writeMtx(coo: DataFrame, path: String): Unit = {
    val spark = coo.sparkSession
    import spark.implicits._
    val dims = coo.agg(max("feat_id").cast("long").as("nf"),
      max("cell_id").cast("long").as("nc"), count(lit(1)).as("nnz")).head()
    val header = Seq(
      (0, -1L, -1L, "%%MatrixMarket matrix coordinate real general"),
      (0, 0L, 0L, s"${dims.getLong(0)} ${dims.getLong(1)} ${dims.getLong(2)}"))
      .toDF("ord", "f", "c", "line")
    val body = coo.select(lit(1).as("ord"), col("feat_id").as("f"),
      col("cell_id").as("c"),
      concat_ws(" ", col("feat_id"), col("cell_id"), col("value")).as("line"))
    header.unionByName(body).coalesce(1)
      .sortWithinPartitions("ord", "f", "c")
      .select("line").write.mode("overwrite").text(path)
  }
}
