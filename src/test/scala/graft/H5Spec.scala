package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.hdf5.{H5Reader, H5Sources, H5Writer}

/** HDF5 family: writer → reader round-trips and the Spark-facing reader
  * semantics (CrH5 / H5ad / Loom / NaboH5 + to_h5ad export), mirroring
  * the reference's reader tests (scarf/tests/test_readers.py:73-75).
  */
class H5Spec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("h5spec").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  test("low-level round-trip: numeric, string, compound, 2-d, attributes") {
    val p = tmp("rt.h5")
    val w = new H5Writer
    w.putLongs("g/l", Array(1L, -5L, 1L << 40))
    w.putInts("g/i", Array(7, -8, 9))
    w.putDoubles("g/d", Array(1.5, -2.25, 0.0))
    w.putFloats("g/f", Array(0.5f, 1.5f))
    w.putStrings("g/s", Array("alpha", "b", "charlie"))
    w.putDense2D("m", 2, 3, Array(1, 0, 2, 0, 3, 0).map(_.toDouble))
    w.putCompound("c/cell1", 2, Seq("idx" -> Array(3L, 9L), "val" -> Array(4L, 2L)))
    w.attrStr("g", "encoding-type", "dataframe")
    w.attrLongs("g", "shape", Array(3L, 2L))
    w.attrStrArray("g", "column-order", Array("l", "i"))
    w.save(p)

    val r = new H5Reader(p)
    try {
      assert(r.dataset("g/l").readLongs().toSeq == Seq(1L, -5L, 1L << 40))
      assert(r.dataset("g/i").readLongs().toSeq == Seq(7L, -8L, 9L))
      assert(r.dataset("g/d").readDoubles().toSeq == Seq(1.5, -2.25, 0.0))
      assert(r.dataset("g/f").readDoubles().toSeq == Seq(0.5, 1.5))
      assert(r.dataset("g/s").readStrings().toSeq == Seq("alpha", "b", "charlie"))
      val m = r.dataset("m")
      assert(m.dims.toSeq == Seq(2L, 3L))
      assert(m.readDoubles().toSeq == Seq(1.0, 0.0, 2.0, 0.0, 3.0, 0.0))
      val c = r.dataset("c/cell1")
      assert(c.readCompoundColumn("idx").toSeq == Seq(3L, 9L))
      assert(c.readCompoundColumn("val").toSeq == Seq(4L, 2L))
      val a = r.attributes("g")
      assert(a("encoding-type") == "dataframe")
      assert(a("shape").asInstanceOf[Array[Long]].toSeq == Seq(3L, 2L))
      assert(a("column-order").asInstanceOf[Array[String]].toSeq == Seq("l", "i"))
      assert(r.childNames("g").sorted == Seq("d", "f", "i", "l", "s"))
    } finally r.close()
  }

  test("chunked + gzip datasets round-trip, including partial slice reads") {
    val p = tmp("chunked.h5")
    val w = new H5Writer
    val v = Array.tabulate(1000)(i => math.sin(i.toDouble))
    val l = Array.tabulate(777)(i => i.toLong * 3 - 5)
    w.putDoublesChunked("cd", v, chunkElems = 64)
    w.putLongsChunked("cl", l, chunkElems = 100)
    w.putDoublesChunked("plain", v, chunkElems = 256, gzip = false)
    w.save(p)
    val r = new H5Reader(p)
    try {
      assert(r.dataset("cd").readDoubles().toSeq == v.toSeq)
      assert(r.dataset("cl").readLongs().toSeq == l.toSeq)
      assert(r.dataset("plain").readDoubles().toSeq == v.toSeq)
      // slices crossing chunk boundaries (the distributed CSR read path)
      assert(r.dataset("cd").readDoubles(60, 200).toSeq == v.slice(60, 200).toSeq)
      assert(r.dataset("cl").readLongs(99, 101).toSeq == l.slice(99, 101).toSeq)
      assert(r.dataset("cd").chunks.size == 16)
    } finally r.close()
  }

  test("h5ad: CSR X + obs/var with categorical decode → exact COO") {
    val p = tmp("toy.h5ad")
    val w = new H5Writer
    // 3 cells × 4 features; CSR rows = cells
    w.putDoubles("X/data", Array(1.0, 2.0, 3.0, 4.0, 5.0))
    w.putInts("X/indices", Array(0, 2, 1, 3, 0))
    w.putLongs("X/indptr", Array(0L, 2L, 4L, 5L))
    w.attrStr("X", "encoding-type", "csr_matrix")
    w.attrLongs("X", "shape", Array(3L, 4L))
    w.putStrings("obs/_index", Array("c0", "c1", "c2"))
    w.putLongs("obs/n_counts", Array(3L, 7L, 5L))
    // categorical column: codes + categories subgroup (AnnData >= 0.8)
    w.putLongs("obs/batch/codes", Array(0L, 1L, 0L))
    w.putStrings("obs/batch/categories", Array("A", "B"))
    w.putStrings("var/_index", Array("g0", "g1", "g2", "g3"))
    w.putDoubles("var/score", Array(0.1, 0.2, 0.3, 0.4))
    w.save(p)

    val (coo, obs, varF) = H5Sources.h5ad(spark, p)
    val got = coo.orderBy("cell_id", "feat_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2))).toSeq
    assert(got == Seq((0L, 0L, 1.0), (0L, 2L, 2.0), (1L, 1L, 3.0), (1L, 3L, 4.0), (2L, 0L, 5.0)))
    val o = obs.orderBy("ordinal").collect()
    assert(o.map(_.getAs[String]("id")).toSeq == Seq("c0", "c1", "c2"))
    assert(o.map(_.getAs[String]("batch")).toSeq == Seq("A", "B", "A"))
    assert(o.map(_.getAs[Long]("n_counts")).toSeq == Seq(3L, 7L, 5L))
    assert(varF.orderBy("ordinal").collect().map(_.getAs[String]("id")).toSeq ==
      Seq("g0", "g1", "g2", "g3"))
  }

  test("h5ad: legacy integer categoricals via __categories group") {
    val p = tmp("legacy.h5ad")
    val w = new H5Writer
    w.putDoubles("X/data", Array(1.0))
    w.putInts("X/indices", Array(0))
    w.putLongs("X/indptr", Array(0L, 1L, 1L))
    w.putStrings("obs/_index", Array("c0", "c1"))
    w.putLongs("obs/phase", Array(1L, 0L))
    w.putStrings("obs/__categories/phase", Array("G1", "S"))
    w.putStrings("var/_index", Array("g0"))
    w.save(p)
    val (_, obs, _) = H5Sources.h5ad(spark, p)
    assert(obs.orderBy("ordinal").collect().map(_.getAs[String]("phase")).toSeq == Seq("S", "G1"))
  }

  test("crH5: 10x matrix group, filtered and background-cutoff paths") {
    val p = tmp("cr.h5")
    val w = new H5Writer
    // 3 cells; cell1 is background (sum 2 <= cutoff 5)
    w.putDoubles("matrix/data", Array(10.0, 2.0, 8.0))
    w.putInts("matrix/indices", Array(0, 1, 1))
    w.putLongs("matrix/indptr", Array(0L, 1L, 2L, 3L))
    w.putStrings("matrix/barcodes", Array("AAA", "CCC", "GGG"))
    w.putStrings("matrix/features/id", Array("ENSG1", "ENSG2"))
    w.putStrings("matrix/features/name", Array("TP53", "MYC"))
    w.putStrings("matrix/features/feature_type", Array("Gene Expression", "Gene Expression"))
    w.save(p)

    val (coo, cells, feats) = H5Sources.crH5(spark, p)
    assert(coo.count() == 3 && cells.count() == 3 && feats.count() == 2)
    assert(feats.orderBy("feat_id").collect().map(_.getAs[String]("name")).toSeq ==
      Seq("TP53", "MYC"))

    val (cooF, cellsF, _) = H5Sources.crH5(spark, p, isFiltered = false, filteringCutoff = 5)
    val kept = cellsF.orderBy("cell_id").collect()
    assert(kept.map(_.getAs[String]("barcode")).toSeq == Seq("AAA", "GGG"))
    assert(kept.map(_.getAs[Long]("cell_id")).toSeq == Seq(0L, 1L))
    val g = cooF.orderBy("cell_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2))).toSeq
    assert(g == Seq((0L, 0L, 10.0), (1L, 1L, 8.0)))
  }

  test("splitAssays partitions a CrH5 stream by feature_type with dense remap") {
    val p = tmp("multi.h5")
    val w = new H5Writer
    // feats 0,2 = Gene Expression; feat 1 = Antibody Capture
    w.putDoubles("matrix/data", Array(5.0, 3.0, 2.0))
    w.putInts("matrix/indices", Array(0, 1, 2))
    w.putLongs("matrix/indptr", Array(0L, 2L, 3L))
    w.putStrings("matrix/barcodes", Array("AAA", "CCC"))
    w.putStrings("matrix/features/id", Array("G1", "AB1", "G2"))
    w.putStrings("matrix/features/name", Array("GeneA", "CD3", "GeneB"))
    w.putStrings("matrix/features/feature_type",
      Array("Gene Expression", "Antibody Capture", "Gene Expression"))
    w.save(p)
    val (coo, _, feats) = H5Sources.crH5(spark, p)
    val assays = H5Sources.splitAssays(coo, feats)
    assert(assays.keySet == Set("Gene Expression", "Antibody Capture"))
    val (gCoo, gFeats) = assays("Gene Expression")
    // features remap densely: G1 -> 0, G2 -> 1
    assert(gFeats.orderBy("feat_id").collect().map(_.getAs[String]("id")).toSeq ==
      Seq("G1", "G2"))
    val g = gCoo.orderBy("cell_id", "feat_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(g == Seq((0L, 0L, 5.0), (1L, 1L, 2.0)))
    val (aCoo, _) = assays("Antibody Capture")
    assert(aCoo.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((0L, 0L, 3.0)))
  }

  test("loom: dense features×cells matrix transposes to (cell, feat) COO") {
    val p = tmp("toy.loom")
    val w = new H5Writer
    // 2 features × 3 cells
    w.putDense2D("matrix", 2, 3, Array(1, 0, 2, 0, 0, 5).map(_.toDouble))
    w.putStrings("col_attrs/obs_names", Array("c0", "c1", "c2"))
    w.putStrings("row_attrs/var_names", Array("gA", "gB"))
    w.save(p)
    val (coo, cells, feats) = H5Sources.loom(spark, p)
    val got = coo.orderBy("cell_id", "feat_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2))).toSeq
    assert(got == Seq((0L, 0L, 1.0), (2L, 0L, 2.0), (2L, 1L, 5.0)))
    assert(cells.orderBy("ordinal").collect().map(_.getAs[String]("obs_names")).toSeq ==
      Seq("c0", "c1", "c2"))
    assert(feats.orderBy("ordinal").collect().map(_.getAs[String]("var_names")).toSeq ==
      Seq("gA", "gB"))
  }

  test("naboH5: per-cell compound idx/val with name suffix strip") {
    val p = tmp("toy.nabo.h5")
    val w = new H5Writer
    w.putStrings("names/cells", Array("cellA", "cellB"))
    w.putStrings("names/genes", Array("TP53_1", "MYC"))
    w.putCompound("cell_data/cellA", 2, Seq("idx" -> Array(0L, 1L), "val" -> Array(4L, 6L)))
    w.putCompound("cell_data/cellB", 1, Seq("idx" -> Array(1L), "val" -> Array(9L)))
    w.save(p)
    val (coo, cells, feats) = H5Sources.naboH5(spark, p)
    val got = coo.orderBy("cell_id", "feat_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2))).toSeq
    assert(got == Seq((0L, 0L, 4.0), (0L, 1L, 6.0), (1L, 1L, 9.0)))
    // rsplit semantics: trailing _token stripped; NO-underscore name intact
    assert(feats.orderBy("feat_id").collect().map(_.getAs[String]("name")).toSeq ==
      Seq("TP53", "MYC"))
    assert(cells.count() == 2)
  }

  test("toH5ad synthesizes _index when frames lack an ids column") {
    import spark.implicits._
    val coo = Seq((0L, 0L, 2.0), (1L, 1L, 3.0)).toDF("cell_id", "feat_id", "value")
    val cells = Seq((0L, "b0"), (1L, "b1")).toDF("cell_id", "barcode")
    val feats = Seq((0L, "gA"), (1L, "gB")).toDF("feat_id", "name")
    val p = tmp("noids.h5ad")
    H5Sources.toH5ad(coo, cells, feats, p)
    val r = new H5Reader(p)
    try {
      // the stamped `_index` dataset must EXIST (was: silent AnnData break)
      assert(r.dataset("obs/_index").readStrings().toSeq == Seq("0", "1"))
      assert(r.dataset("var/_index").readStrings().toSeq == Seq("0", "1"))
      assert(r.dataset("obs/barcode").readStrings().toSeq == Seq("b0", "b1"))
      val order = r.attributes("obs")("column-order").asInstanceOf[Array[String]]
      assert(!order.contains("_index") && order.contains("barcode"))
    } finally r.close()
  }

  test("to_h5ad export round-trips through the h5ad reader") {
    import spark.implicits._
    val coo = Seq((0L, 0L, 2.0), (0L, 3L, 1.5), (1L, 1L, 4.0), (2L, 2L, 7.0))
      .toDF("cell_id", "feat_id", "value")
    val cells = Seq((0L, "c0", "A"), (1L, "c1", "B"), (2L, "c2", "A"))
      .toDF("cell_id", "ids", "batch")
    val feats = Seq((0L, "g0"), (1L, "g1"), (2L, "g2"), (3L, "g3"))
      .toDF("feat_id", "ids")
    val p = tmp("export.h5ad")
    H5Sources.toH5ad(coo, cells, feats, p)

    // AnnData-shape invariants the reference writes (scarf/writers.py:1190+)
    val r = new H5Reader(p)
    try {
      assert(r.attributes("X")("encoding-type") == "csr_matrix")
      assert(r.attributes("X")("shape").asInstanceOf[Array[Long]].toSeq == Seq(3L, 4L))
      assert(r.attributes("obs")("encoding-type") == "dataframe")
      assert(r.dataset("X/indptr").readLongs().toSeq == Seq(0L, 2L, 3L, 4L))
    } finally r.close()

    val (coo2, obs2, var2) = H5Sources.h5ad(spark, p)
    val got = coo2.orderBy("cell_id", "feat_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2))).toSeq
    assert(got == Seq((0L, 0L, 2.0), (0L, 3L, 1.5), (1L, 1L, 4.0), (2L, 2L, 7.0)))
    assert(obs2.orderBy("ordinal").collect().map(_.getAs[String]("id")).toSeq ==
      Seq("c0", "c1", "c2"))
    assert(var2.count() == 4)
  }

  test("obsm round-trips: toH5ad(planted obsm) -> h5ad reads X_umap1.. columns") {
    import spark.implicits._
    val coo = Seq((0L, 0L, 2.0), (1L, 1L, 4.0), (2L, 2L, 7.0))
      .toDF("cell_id", "feat_id", "value")
    val cells = Seq((0L, "c0"), (1L, "c1"), (2L, "c2")).toDF("cell_id", "ids")
    val feats = Seq((0L, "g0"), (1L, "g1"), (2L, "g2")).toDF("feat_id", "ids")
    val umap = Seq((0L, 0.5, -1.0), (1L, 1.5, 2.25), (2L, -3.0, 0.0))
      .toDF("cell_id", "u1", "u2")
    val pca = Seq((0L, 9.0), (1L, 8.0), (2L, 7.0)).toDF("cell_id", "p1")
    val p = tmp("obsm.h5ad")
    H5Sources.toH5ad(coo, cells, feats, p,
      obsm = Map("X_umap" -> umap, "X_pca" -> pca))
    val (_, obs, _) = H5Sources.h5ad(spark, p)
    // reference naming: f"{slot}{j+1}" (scarf/readers.py:860-861)
    assert(Seq("X_umap1", "X_umap2", "X_pca1").forall(obs.columns.contains))
    val o = obs.orderBy("ordinal").collect()
    assert(o.map(_.getAs[Double]("X_umap1")).toSeq == Seq(0.5, 1.5, -3.0))
    assert(o.map(_.getAs[Double]("X_umap2")).toSeq == Seq(-1.0, 2.25, 0.0))
    assert(o.map(_.getAs[Double]("X_pca1")).toSeq == Seq(9.0, 8.0, 7.0))
    assert(o.map(_.getAs[String]("id")).toSeq == Seq("c0", "c1", "c2"))
  }

  test("obsm import skips mis-sized slots, as the reference does") {
    val p = tmp("badobsm.h5ad")
    val w = new H5Writer
    w.putDoubles("X/data", Array(1.0))
    w.putInts("X/indices", Array(0))
    w.putLongs("X/indptr", Array(0L, 1L, 1L))
    w.putStrings("obs/_index", Array("c0", "c1"))
    w.putStrings("var/_index", Array("g0"))
    // wrong row count (3 != nCells 2): must be skipped, not fail
    w.putDense2D("obsm/X_bad", 3L, 2L, Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    w.putDense2D("obsm/X_ok", 2L, 1L, Array(0.25, 0.75))
    w.save(p)
    val (_, obs, _) = H5Sources.h5ad(spark, p)
    assert(obs.columns.contains("X_ok1") && !obs.columns.exists(_.startsWith("X_bad")))
    assert(obs.orderBy("ordinal").collect().map(_.getAs[Double]("X_ok1")).toSeq ==
      Seq(0.25, 0.75))
  }

  test("toH5ad re-indexes masked/sparse ids to dense CSR positions") {
    import spark.implicits._
    // non-prefix cell ids and sparse feature ids
    val coo = Seq((5L, 10L, 2.0), (5L, 30L, 1.0), (42L, 10L, 7.0))
      .toDF("cell_id", "feat_id", "value")
    val cells = Seq((5L, "c5"), (42L, "c42")).toDF("cell_id", "ids")
    val feats = Seq((10L, "gA"), (30L, "gB")).toDF("feat_id", "ids")
    val p = tmp("masked.h5ad")
    H5Sources.toH5ad(coo, cells, feats, p)
    val r = new H5Reader(p)
    try {
      assert(r.dataset("X/indptr").readLongs().toSeq == Seq(0L, 2L, 3L))
      assert(r.dataset("X/indices").readLongs().toSeq == Seq(0L, 1L, 0L))
      assert(r.dataset("obs/_index").readStrings().toSeq == Seq("c5", "c42"))
    } finally r.close()
    val (coo2, _, _) = H5Sources.h5ad(spark, p)
    val got = coo2.orderBy("cell_id", "feat_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(got == Seq((0L, 0L, 2.0), (0L, 1L, 1.0), (1L, 0L, 7.0)))
  }

  test("DataStore round-trips through h5ad: fromH5ad(toH5ad(ds)) preserves the matrix") {
    val ds = graft.pipeline.DataStore.fromTestData(spark, "/root/testdata/sf0.001")
      .withQcStats
    val p = tmp("store.h5ad")
    ds.toH5ad(p)
    val back = graft.pipeline.DataStore.fromH5ad(spark, p)
    // matrix mass and nnz survive; cell count matches active cells
    val orig = ds.coo.agg(sum("value"), count(lit(1))).head()
    val rt = back.coo.agg(sum("value"), count(lit(1))).head()
    assert(orig.getDouble(0) == rt.getDouble(0) && orig.getLong(1) == rt.getLong(1))
    assert(back.cells.count() == ds.cells.filter(col("I")).count())
    // and the pipeline still runs on the re-imported store
    val hvg = back.markHvgs(topN = 10)
    assert(hvg.feats.filter(col("hvg")).count() == 10)
  }

  test("csrCoo partitions by nnz ranges without shipping global indptr") {
    val p = tmp("parts.h5ad")
    val w = new H5Writer
    val n = 40
    val data = Array.tabulate(n * 2)(i => (i + 1).toDouble)
    val indices = Array.tabulate(n * 2)(i => i % 5)
    val indptr = Array.tabulate(n + 1)(i => (i * 2).toLong)
    w.putDoubles("X/data", data)
    w.putInts("X/indices", indices)
    w.putLongs("X/indptr", indptr)
    w.putStrings("obs/_index", Array.tabulate(n)(i => s"c$i"))
    w.putStrings("var/_index", Array.tabulate(5)(i => s"g$i"))
    w.save(p)
    val coo = H5Sources.csrCoo(spark, p, "X", nPartitions = 8)
    assert(coo.count() == n * 2)
    assert(coo.rdd.getNumPartitions >= 4)
    val s = coo.agg(sum("value")).head().getDouble(0)
    assert(s == data.sum)
  }
}
