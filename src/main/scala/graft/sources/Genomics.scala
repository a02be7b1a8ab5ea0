package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Genomic text-format ingestion (SURVEY.md §2.1): the real BED and GFF3
  * parsers behind bed_to_sparse_array (scarf/writers.py:1307-1420) and
  * GffReader.to_bed (scarf/meld_assay.py:29-230) — distributed text
  * parses, no driver-side row loops. Only the chromSizes map (dozens of
  * entries) lives on the driver and broadcasts.
  */
object Genomics {

  /** bed_to_sparse_array: fragment BED (chrom, start, end, barcode, count)
    * → binned COO. Each fragment lands in the bin of its midpoint
    * (start + (end−start)/2) / binSize; features are chrom_bin with global
    * indices laid out per chromSizes order (chrom i contributes
    * size/binSize + 1 bins); fragments on unknown chromosomes drop (the
    * reference routes them to a sentinel column and slices it off);
    * cells with total count <= minCountsPerCell drop. Cell ids are dense
    * ordinals in barcode sort order (the reference uses first-seen order —
    * not reproducible under parallel scan; sorted is the deterministic
    * equivalent, documented divergence).
    * Returns (coo(cell_id, feat_id, value), cells(cell_id, barcode),
    * feats(feat_id, name)).
    */
  def bedToSparseArray(spark: SparkSession, bedPath: String, binSize: Long,
                       chromSizes: Seq[(String, Long)],
                       minCountsPerCell: Long = 500,
                       sep: String = "\t"): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    // global bin index layout, driver-side over |chroms| entries
    val offsets = chromSizes.scanLeft(("", 0L)) { case ((_, acc), (c, sz)) =>
      (c, acc + sz / binSize + 1)
    }.sliding(2).map { case Seq((_, off), (c, _)) => c -> off }.toMap
    val offDf = broadcast(offsets.toSeq.toDF("chrom", "chrom_off"))
    val nBins = chromSizes.map { case (c, sz) => c -> (sz / binSize + 1) }.toMap
    val binsDf = broadcast(nBins.toSeq.toDF("chrom", "n_bins"))

    val raw = spark.read.option("sep", sep).option("comment", "#").csv(bedPath)
      .select(col("_c0").as("chrom"), col("_c1").cast("long").as("start"),
        col("_c2").cast("long").as("end"), col("_c3").as("barcode"),
        col("_c4").cast("double").as("cnt"))
    val binned = raw
      .join(offDf, Seq("chrom")) // inner join drops unknown chromosomes
      .join(binsDf, Seq("chrom"))
      .withColumn("bin", expr(s"(start + (end - start) div 2) div $binSize"))
      .filter(col("bin") < col("n_bins")) // fragments past the chrom end drop
      .select(col("barcode"), (col("chrom_off") + col("bin")).as("feat_id"),
        col("cnt"), col("chrom"), col("bin"))
    val perCell = binned.groupBy("barcode").agg(sum("cnt").as("tot"))
      .filter(col("tot") > minCountsPerCell)
      .select("barcode")
    val cellIdx = graft.ops.Windows.globalOrdinal(perCell, Seq(col("barcode")), "ord")
      .select(col("barcode"), (col("ord") - 1).as("cell_id"))
    val coo = binned.join(cellIdx, Seq("barcode"))
      .groupBy("cell_id", "feat_id").agg(sum("cnt").as("value"))
    val feats = chromSizes.flatMap { case (c, sz) =>
      (0L to sz / binSize).map(b => (offsets(c) + b, s"${c}_$b"))
    }.toDF("feat_id", "name")
    (coo, cellIdx.select("cell_id", "barcode"), feats)
  }

  /** GffReader.to_bed: GFF3 'gene' records → 6-column BED rows with
    * strand-aware coordinates. flavour = "promoter": (+) [start−up,
    * start+down], (−) [end−1−down, end+up]; flavour = "body": (+)
    * [max(start−up, 0), end], (−) [start, end+up]. gene_id / gene_name
    * parsed from the attributes column. Distributed line parse; header
    * lines (#…) filtered in-plan.
    */
  def gffToBed(spark: SparkSession, gffPath: String, flavour: String = "body",
               up: Long = 1000, down: Long = 500): DataFrame = {
    require(flavour == "body" || flavour == "promoter",
      s"flavour must be body|promoter, got $flavour")
    val cols = spark.read.option("sep", "\t").option("comment", "#").csv(gffPath)
      .filter(col("_c2") === "gene")
      .select(col("_c0").as("chrom"), col("_c3").cast("long").as("gstart"),
        col("_c4").cast("long").as("gend"), col("_c6").as("strand"),
        col("_c8").as("attrs"))
    val coords = flavour match {
      case "promoter" => cols
        .withColumn("bstart", when(col("strand") === "+",
            greatest(lit(0L), col("gstart") - up))
          .otherwise(col("gend") - 1 - down))
        .withColumn("bend", when(col("strand") === "+", col("gstart") + down)
          .otherwise(col("gend") + up))
      case _ => cols
        .withColumn("bstart", when(col("strand") === "+",
            greatest(col("gstart") - up, lit(0L)))
          .otherwise(col("gstart")))
        .withColumn("bend", when(col("strand") === "+", col("gend"))
          .otherwise(col("gend") + up))
    }
    coords.select(col("chrom"), col("bstart").as("start"), col("bend").as("end"),
      regexp_extract(col("attrs"), "(^|;)gene_id=([^;]*)", 2).as("gene_id"),
      regexp_extract(col("attrs"), "(^|;)gene_name=([^;]*)", 2).as("gene_name"),
      col("strand"))
  }
}
