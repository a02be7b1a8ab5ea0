package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Genomics
import graft.graph.Sketch

/** Real BED/GFF parsers (writers.py:1307-1420, meld_assay.py:29-230) and
  * the TopACeDo-style sketcher.
  */
class GenomicsSketchSpec extends SparkSpec {

  private def writeTmp(name: String, lines: Seq[String]): String = {
    val d = Files.createTempDirectory("genomics").toFile
    d.deleteOnExit()
    val f = new java.io.File(d, name)
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  test("bedToSparseArray: midpoint binning, chrom offsets, cell cutoff") {
    val bed = writeTmp("frags.bed", Seq(
      "# comment",
      "chr1\t0\t100\tAAA\t10",     // mid 50 -> chr1 bin 0
      "chr1\t950\t1050\tAAA\t5",   // mid 1000 -> chr1 bin 1
      "chr2\t10\t20\tAAA\t2",      // chr2 bin 0 -> feat offset 3
      "chr1\t10\t20\tBBB\t1",      // BBB total 1 <= cutoff -> dropped
      "chrX\t0\t10\tAAA\t99"))     // unknown chrom -> dropped
    val (coo, cells, feats) = Genomics.bedToSparseArray(spark, bed, binSize = 1000,
      chromSizes = Seq("chr1" -> 2000L, "chr2" -> 500L), minCountsPerCell = 3)
    val cellRows = cells.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(cellRows.keySet == Set("AAA"))
    val got = coo.orderBy("feat_id").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // chr1 has 2000/1000 + 1 = 3 bins -> chr2 offset 3
    assert(got == Seq((0L, 10.0), (1L, 5.0), (3L, 2.0)))
    assert(feats.count() == 3 + 1) // chr1: 3 bins, chr2: 1 bin
    val names = feats.orderBy("feat_id").collect().map(_.getString(1)).toSeq
    assert(names == Seq("chr1_0", "chr1_1", "chr1_2", "chr2_0"))
  }

  test("gffToBed: strand-aware promoter and body projections + attr parse") {
    val gff = writeTmp("anno.gff3", Seq(
      "##gff-version 3",
      "chr1\tsrc\tgene\t5000\t9000\t.\t+\t.\tgene_id=G1;gene_name=Alpha",
      "chr1\tsrc\tgene\t20000\t25000\t.\t-\t.\tgene_id=G2;gene_name=Beta",
      "chr1\tsrc\texon\t5000\t5100\t.\t+\t.\tgene_id=G1"))
    val body = Genomics.gffToBed(spark, gff, flavour = "body", up = 1000, down = 500)
      .orderBy("start").collect()
    assert(body.length == 2) // exon filtered out
    // + strand body: [start-up, end]; - strand: [start, end+up]
    assert((body(0).getLong(1), body(0).getLong(2)) == (4000L, 9000L))
    assert((body(1).getLong(1), body(1).getLong(2)) == (20000L, 26000L))
    assert(body(0).getString(3) == "G1" && body(0).getString(4) == "Alpha")
    val prom = Genomics.gffToBed(spark, gff, flavour = "promoter", up = 1000, down = 500)
      .orderBy("start").collect()
    // + strand promoter: [start-up, start+down]; -: [end-1-down, end+up]
    assert((prom(0).getLong(1), prom(0).getLong(2)) == (4000L, 5500L))
    assert((prom(1).getLong(1), prom(1).getLong(2)) == (24499L, 26000L))
  }

  test("topacedo sketch: every cluster represented, rates bounded, dense penalized") {
    import spark.implicits._
    // cluster 1: dense 20-clique; cluster 2: sparse 20-chain
    val clique = for (i <- 0 until 20; j <- i + 1 until 20)
      yield (i.toLong, j.toLong)
    val chain = (100 until 119).map(i => (i.toLong, (i + 1).toLong))
    val edges = (clique ++ chain).toDF("src", "dst")
    val clusters = ((0 until 20).map(i => (i.toLong, 1L)) ++
      (100 until 120).map(i => (i.toLong, 2L))).toDF("cell_id", "cluster")
    val sk = Sketch.topacedo(edges, clusters, maxRate = 0.5, minRate = 0.05,
      minCellsPerGroup = 2)
    val seeds = sk.filter(col("is_seed")).collect().map(_.getLong(0)).toSet
    val byCluster = Seq(1L -> seeds.count(_ < 100), 2L -> seeds.count(_ >= 100)).toMap
    assert(byCluster(1L) >= 2 && byCluster(2L) >= 2, s"min cells per group: $byCluster")
    assert(byCluster(1L) <= byCluster(2L),
      s"dense clique should not out-sample the sparse chain: $byCluster")
    // deterministic
    val sk2 = Sketch.topacedo(edges, clusters, maxRate = 0.5, minRate = 0.05,
      minCellsPerGroup = 2)
    assert(sk2.filter(col("is_seed")).collect().map(_.getLong(0)).toSet == seeds)
    // sketched superset of seeds (connectors only add)
    val sketched = sk.filter(col("sketched")).collect().map(_.getLong(0)).toSet
    assert(seeds.subsetOf(sketched))
  }

  test("topacedo PCST connectors: zero-prize hub bridging seeds joins the sketch") {
    import spark.implicits._
    // star: hub 0 with 20 leaves, all one cluster — any two leaf seeds
    // are worth connecting through the hub (reward 3+3 > hub path cost 2)
    val edges = (1 to 20).map(i => (0L, i.toLong)).toDF("src", "dst")
    val clusters = (0 to 20).map(i => (i.toLong, 1L)).toDF("cell_id", "cluster")
    val sk = Sketch.topacedo(edges, clusters, maxRate = 0.1, minRate = 0.05,
      minCellsPerGroup = 2)
    val rows = sk.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val seeds = rows.filter(_._2).map(_._1).toSet
    assert(seeds.size >= 2)
    val leafSeeds = seeds.filter(_ != 0L)
    if (leafSeeds.size >= 2 && !seeds.contains(0L)) {
      // GW growth: both leaf moats cover their hub edge at t=1; strong
      // pruning keeps the hub (marginal 3 − 1 > 0 per leaf branch)
      val hub = rows.find(_._1 == 0L).get
      assert(hub._3 && !hub._2, "hub should be sketched as a connector, not a seed")
    }
    // connectors never drop seeds
    assert(seeds.subsetOf(rows.filter(_._3).map(_._1).toSet))
  }
}
