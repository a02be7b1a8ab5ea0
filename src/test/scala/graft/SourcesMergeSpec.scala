package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Merge
import graft.pipeline.{Integrate, Paris}
import graft.sources.Readers

class SourcesMergeSpec extends SparkSpec {
  import spark.implicits._

  /** The toy 3×8 CellRanger fixture (FIXTURES.md §1) as MTX. */
  lazy val mtxDir = {
    val d = Files.createTempDirectory("graft_mtx")
    // RNA sub-matrix g1..g4 (1-based (feat, cell, count)):
    Files.writeString(d.resolve("matrix.mtx"),
      """%%MatrixMarket matrix coordinate integer general
        |4 3 8
        |1 1 5
        |4 1 2
        |1 2 3
        |2 2 3
        |4 2 7
        |1 3 3
        |2 3 3
        |4 3 7
        |""".stripMargin)
    d.toString
  }

  test("readMtx parses the toy fixture to the exact COO values") {
    val coo = Readers.readMtx(spark, s"$mtxDir/matrix.mtx")
    assert(coo.count() === 8)
    val c1 = coo.filter($"cell_id" === 1).orderBy("feat_id")
    assert(rows(c1) === Seq(Seq(1L, 1L, 5.0), Seq(1L, 4L, 2.0)))
    // column sums match the dense fixture
    val sums = coo.groupBy("cell_id").agg(sum("value")).orderBy("cell_id")
    assert(rows(sums) === Seq(Seq(1L, 7.0), Seq(2L, 13.0), Seq(3L, 13.0)))
  }

  test("writeMtx round-trips through readMtx") {
    val coo = Readers.readMtx(spark, s"$mtxDir/matrix.mtx")
    val out = Files.createTempDirectory("graft_mtx_out").toString + "/m"
    Readers.writeMtx(coo, out)
    val back = Readers.readMtx(spark, out)
    assert(rows(back.orderBy("feat_id", "cell_id")) ===
      rows(coo.orderBy("feat_id", "cell_id")))
  }

  test("readDenseCsv explodes to COO and routes meta columns") {
    val d = Files.createTempDirectory("graft_csv")
    Files.writeString(d.resolve("m.csv"),
      "g1,g2,batch\n5,0,b1\n0,3,b2\n")
    val (coo, meta) = Readers.readDenseCsv(spark, s"$d/m.csv", Seq("batch"))
    assert(coo.count() === 2) // zeros dropped
    assert(meta.select("batch").as[String].collect().sorted.toSeq === Seq("b1", "b2"))
  }

  test("mergeFeatures unions ids, suffixes colliding names, refuses disjoint") {
    val a = Seq((1L, "gx"), (2L, "gy")).toDF("feat_id", "name")
    val b = Seq((2L, "gy"), (3L, "gx")).toDF("feat_id", "name") // gx collides on id 3
    val m = Merge.mergeFeatures(Seq(a, b)).orderBy("feat_id")
    assert(rows(m.select("feat_id", "uname", "merged_idx")) ===
      Seq(Seq(1L, "gx", 0), Seq(2L, "gy", 1), Seq(3L, "gx_1", 2)))
    val disjoint = Seq((10L, "z")).toDF("feat_id", "name")
    intercept[IllegalArgumentException] {
      Merge.mergeFeatures(Seq(a, disjoint))
    }
  }

  test("concatCells prefixes ids and interleaves deterministically") {
    val a = Seq(1L, 2L).toDF("cell_id")
    val b = Seq(1L).toDF("cell_id")
    val r1 = rows(Merge.concatCells(Seq(("dsA", a), ("dsB", b))).orderBy("pos"))
    val r2 = rows(Merge.concatCells(Seq(("dsA", a), ("dsB", b))).orderBy("pos"))
    assert(r1 === r2)
    assert(r1.map(_(0)).toSet === Set("dsA__1", "dsA__2", "dsB__1"))
  }

  test("paris cut produces the natural 2-community split") {
    // two triangles connected by one weak edge
    val edges = Seq(
      (1L, 2L, 5.0), (2L, 3L, 5.0), (1L, 3L, 5.0),
      (4L, 5L, 5.0), (5L, 6L, 5.0), (4L, 6L, 5.0),
      (3L, 4L, 0.1)).toDF("src", "dst", "weight")
    val c = Paris.cut(edges, 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(1L) === c(2L) && c(2L) === c(3L))
    assert(c(4L) === c(5L) && c(5L) === c(6L))
    assert(c(1L) !== c(4L))
  }

  test("paris dendrogram has n-1 links with monotone sizes at the top") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "weight")
    val (links, leaves) = Paris.dendrogram(edges)
    assert(links.length === leaves.size - 1)
    assert(links.last.size === leaves.size)
  }

  test("snnIntegrate keeps top-k deduped edges across assay graphs") {
    val g1 = Seq((1L, 2L, 0.9), (1L, 3L, 0.5)).toDF("src", "dst", "weight")
    val g2 = Seq((1L, 2L, 0.7), (1L, 4L, 0.8)).toDF("src", "dst", "weight")
    val r = Integrate.snnIntegrate(Seq(g1, g2), 2)
    val top = r.filter($"src" === 1).orderBy("rn").select("dst").as[Long].collect()
    assert(top.length === 2)
    assert(top.head === 2L) // deduped max weight 0.9 + snn
  }

  test("wnnIntegrate weights modalities and reranks") {
    val g1 = Seq((1L, 2L, 0.9), (1L, 3L, 0.8)).toDF("src", "dst", "weight")
    val g2 = Seq((1L, 4L, 0.1), (1L, 3L, 0.6)).toDF("src", "dst", "weight")
    val r = Integrate.wnnIntegrate(g1, g2, 2).filter($"src" === 1)
    val top = r.orderBy("rn").select("dst").as[Long].collect()
    assert(top.toSeq === Seq(3L, 2L)) // 3 present in both modalities wins
  }
}
