package graft.sources.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal pure-JVM HDF5 writer (public HDF5 File Format Specification):
  * superblock v0, v1 object headers, old-style symbol-table groups
  * (B-tree v1 + local heap + SNOD), contiguous little-endian datasets
  * (int32/int64/float32/float64/fixed-string), scalar + 1-d attributes.
  * Enough to emit the shapes the reference family reads and writes —
  * AnnData-style CSR groups with obs/var frames (scarf/writers.py:
  * 1113-1259), 10x matrix groups, Loom dense matrices, Nabo per-cell
  * compound tables — and to round-trip through [[H5Reader]].
  *
  * Deliberate simplifications (documented, not format violations):
  * fixed-size strings instead of vlen (readers accept both); one SNOD
  * per group (capacity 2·K_leaf = 64 children — enforced); no free-space
  * tracking, no compression on write.
  */
final class H5Writer {

  // ------------------------------------------------------------- data model
  sealed trait Node
  final case class Group(children: mutable.LinkedHashMap[String, Node] = mutable.LinkedHashMap.empty,
                         attrs: mutable.ArrayBuffer[(String, AttrValue)] = mutable.ArrayBuffer.empty) extends Node
  final case class Dset(dims: Array[Long], dtype: Dtype, bytes: Array[Byte],
                        attrs: mutable.ArrayBuffer[(String, AttrValue)] = mutable.ArrayBuffer.empty,
                        chunkElems: Int = 0, gzip: Boolean = false) extends Node

  sealed trait Dtype { def size: Int }
  case object DI32 extends Dtype { val size = 4 }
  case object DI64 extends Dtype { val size = 8 }
  case object DF32 extends Dtype { val size = 4 }
  case object DF64 extends Dtype { val size = 8 }
  final case class DStr(size: Int) extends Dtype
  final case class DCompound(members: Seq[(String, Dtype)]) extends Dtype {
    val size: Int = members.map(_._2.size).sum
  }

  sealed trait AttrValue
  final case class AStr(v: String) extends AttrValue
  final case class ALongs(v: Array[Long], scalar: Boolean = false) extends AttrValue
  final case class AStrArray(v: Array[String]) extends AttrValue

  private val root = Group()

  // ------------------------------------------------------------- public API
  private def ensureGroup(path: String): Group = {
    val parts = path.split("/").filter(_.nonEmpty)
    parts.foldLeft(root) { (g, p) =>
      g.children.getOrElseUpdate(p, Group()) match {
        case sub: Group => sub
        case _ => sys.error(s"$p is a dataset, not a group")
      }
    }
  }

  def group(path: String): this.type = { ensureGroup(path); this }

  private def putDset(path: String, d: Dset): this.type = {
    val parts = path.split("/").filter(_.nonEmpty)
    val g = ensureGroup(parts.dropRight(1).mkString("/"))
    g.children(parts.last) = d
    this
  }

  private def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(b); b.array()
  }

  def putInts(path: String, v: Array[Int]): this.type =
    putDset(path, Dset(Array(v.length.toLong), DI32,
      le(v.length * 4)(b => v.foreach(b.putInt))))

  def putLongs(path: String, v: Array[Long]): this.type =
    putDset(path, Dset(Array(v.length.toLong), DI64,
      le(v.length * 8)(b => v.foreach(b.putLong))))

  def putDoubles(path: String, v: Array[Double]): this.type =
    putDset(path, Dset(Array(v.length.toLong), DF64,
      le(v.length * 8)(b => v.foreach(b.putDouble))))

  /** Chunked (+ optionally deflate-compressed) rank-1 dataset — the layout
    * libhdf5/h5py emit for compressed data; exercises the reader's chunk
    * B-tree + filter pipeline.
    */
  def putDoublesChunked(path: String, v: Array[Double], chunkElems: Int,
                        gzip: Boolean = true): this.type =
    putDset(path, Dset(Array(v.length.toLong), DF64,
      le(v.length * 8)(b => v.foreach(b.putDouble)),
      chunkElems = chunkElems, gzip = gzip))

  def putLongsChunked(path: String, v: Array[Long], chunkElems: Int,
                      gzip: Boolean = true): this.type =
    putDset(path, Dset(Array(v.length.toLong), DI64,
      le(v.length * 8)(b => v.foreach(b.putLong)),
      chunkElems = chunkElems, gzip = gzip))

  def putFloats(path: String, v: Array[Float]): this.type =
    putDset(path, Dset(Array(v.length.toLong), DF32,
      le(v.length * 4)(b => v.foreach(b.putFloat))))

  /** Fixed-size (max-length, null-padded) UTF-8 string dataset. */
  def putStrings(path: String, v: Array[String]): this.type = {
    val enc = v.map(_.getBytes("UTF-8"))
    val sz = math.max(1, if (enc.isEmpty) 1 else enc.map(_.length).max)
    val bytes = new Array[Byte](sz * v.length)
    enc.zipWithIndex.foreach { case (e, i) => System.arraycopy(e, 0, bytes, i * sz, e.length) }
    putDset(path, Dset(Array(v.length.toLong), DStr(sz), bytes))
  }

  /** Row-major dense 2-d matrix (e.g. Loom `matrix`, AnnData obsm). */
  def putDense2D(path: String, rows: Long, cols: Long, v: Array[Double]): this.type = {
    require(v.length.toLong == rows * cols)
    putDset(path, Dset(Array(rows, cols), DF64, le(v.length * 8)(b => v.foreach(b.putDouble))))
  }

  /** Compound (structured) dataset from same-length typed columns
    * (the NaboH5 `cell_data/<cell>` idx/val shape).
    */
  def putCompound(path: String, n: Int, cols: Seq[(String, Array[Long])]): this.type = {
    val dtype = DCompound(cols.map { case (name, _) => (name, DI64: Dtype) })
    val bytes = le(n * dtype.size) { b =>
      (0 until n).foreach(i => cols.foreach { case (_, v) => b.putLong(v(i)) })
    }
    putDset(path, Dset(Array(n.toLong), dtype, bytes))
  }

  private def nodeAt(path: String): Node = {
    val parts = path.split("/").filter(_.nonEmpty)
    if (parts.isEmpty) root
    else {
      val g = ensureGroup(parts.dropRight(1).mkString("/"))
      g.children.getOrElse(parts.last, sys.error(s"no node at $path"))
    }
  }

  private def attrsOf(n: Node): mutable.ArrayBuffer[(String, AttrValue)] = n match {
    case g: Group => g.attrs
    case d: Dset => d.attrs
  }

  def attrStr(path: String, name: String, v: String): this.type = {
    attrsOf(nodeAt(path)) += (name -> AStr(v)); this
  }
  def attrLongs(path: String, name: String, v: Array[Long]): this.type = {
    attrsOf(nodeAt(path)) += (name -> ALongs(v)); this
  }
  def attrStrArray(path: String, name: String, v: Array[String]): this.type = {
    attrsOf(nodeAt(path)) += (name -> AStrArray(v)); this
  }

  // ------------------------------------------------------------- serializer
  private final class Out {
    var bytes = new Array[Byte](1 << 16)
    var len = 0L
    def ensure(cap: Long): Unit =
      if (cap > bytes.length) {
        var n = bytes.length.toLong
        while (n < cap) n *= 2
        bytes = java.util.Arrays.copyOf(bytes, n.toInt)
      }
    def alloc(n: Long): Long = { // 8-aligned allocation
      val a = (len + 7) / 8 * 8
      ensure(a + n); len = a + n; a
    }
    def write(addr: Long, b: Array[Byte]): Unit =
      System.arraycopy(b, 0, bytes, addr.toInt, b.length)
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  private def encDatatype(t: Dtype): Array[Byte] = t match {
    case DI32 | DI64 =>
      le(12) { b => // spec-exact size so compound member parses stay aligned
        b.put(0x10.toByte); b.put(0x08.toByte); b.put(0.toByte); b.put(0.toByte)
        b.putInt(t.size); b.putShort(0); b.putShort((t.size * 8).toShort)
      }
    case DF32 =>
      le(20) { b =>
        b.put(0x11.toByte); b.put(0x20.toByte); b.put(0x1F.toByte); b.put(0.toByte)
        b.putInt(4); b.putShort(0); b.putShort(32)
        b.put(23.toByte); b.put(8.toByte); b.put(0.toByte); b.put(23.toByte)
        b.putInt(127)
      }
    case DF64 =>
      le(20) { b =>
        b.put(0x11.toByte); b.put(0x20.toByte); b.put(0x3F.toByte); b.put(0.toByte)
        b.putInt(8); b.putShort(0); b.putShort(64)
        b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte)
        b.putInt(1023)
      }
    case DStr(sz) =>
      le(8) { b =>
        // class 3 v1; null-terminated, UTF-8
        b.put(0x13.toByte); b.put(0x10.toByte); b.put(0.toByte); b.put(0.toByte)
        b.putInt(sz)
      }
    case c @ DCompound(members) =>
      // compound v1: members with padded names + v1 member layout
      val parts = members.zipWithIndex.map { case ((name, mt), i) =>
        val nameB = name.getBytes("UTF-8")
        val namePadded = new Array[Byte](pad8(nameB.length + 1))
        System.arraycopy(nameB, 0, namePadded, 0, nameB.length)
        val offset = members.take(i).map(_._2.size).sum
        val head = le(namePadded.length + 32)({ b =>
          b.put(namePadded)
          b.putInt(offset)
          b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // dim + res
          b.putInt(0) // perm
          b.putInt(0) // reserved
          (0 until 4).foreach(_ => b.putInt(0)) // dim sizes
        })
        head ++ encDatatype(mt)
      }
      val body = parts.flatten.toArray
      le(8)({ b =>
        b.put(0x16.toByte) // class 6 version 1
        b.put((members.size & 0xFF).toByte); b.put(((members.size >> 8) & 0xFF).toByte)
        b.put(0.toByte)
        b.putInt(c.size)
      }) ++ body
  }

  private def encDataspace(dims: Array[Long]): Array[Byte] =
    le(8 + dims.length * 8) { b =>
      b.put(1.toByte); b.put(dims.length.toByte); b.put(0.toByte)
      b.put(Array.fill(5)(0.toByte))
      dims.foreach(b.putLong)
    }

  private def encAttr(name: String, v: AttrValue): Array[Byte] = {
    val (dt, ds, data) = v match {
      case AStr(s) =>
        val sb = s.getBytes("UTF-8"); val sz = math.max(1, sb.length)
        val d = new Array[Byte](sz); System.arraycopy(sb, 0, d, 0, sb.length)
        (encDatatype(DStr(sz)), encDataspace(Array.empty), d)
      case ALongs(a, _) =>
        (encDatatype(DI64), encDataspace(Array(a.length.toLong)),
          le(a.length * 8)(b => a.foreach(b.putLong)))
      case AStrArray(a) =>
        val enc = a.map(_.getBytes("UTF-8"))
        val sz = math.max(1, if (enc.isEmpty) 1 else enc.map(_.length).max)
        val d = new Array[Byte](sz * a.length)
        enc.zipWithIndex.foreach { case (e, i) => System.arraycopy(e, 0, d, i * sz, e.length) }
        (encDatatype(DStr(sz)), encDataspace(Array(a.length.toLong)), d)
    }
    val nameB = name.getBytes("UTF-8")
    val nameP = pad8(nameB.length + 1)
    val body = le(8 + nameP + pad8(dt.length) + pad8(ds.length) + data.length) { b =>
      b.put(1.toByte); b.put(0.toByte)
      b.putShort((nameB.length + 1).toShort)
      b.putShort(dt.length.toShort)
      b.putShort(ds.length.toShort)
      val np = new Array[Byte](nameP); System.arraycopy(nameB, 0, np, 0, nameB.length); b.put(np)
      val dtp = new Array[Byte](pad8(dt.length)); System.arraycopy(dt, 0, dtp, 0, dt.length); b.put(dtp)
      val dsp = new Array[Byte](pad8(ds.length)); System.arraycopy(ds, 0, dsp, 0, ds.length); b.put(dsp)
      b.put(data)
    }
    body
  }

  /** One v1 message with header, body padded to 8. */
  private def msg(typ: Int, body: Array[Byte]): Array[Byte] = {
    val bp = pad8(body.length)
    // v1 message size is a u16 — fail loudly (same policy as save()'s 2 GB
    // cap) instead of silently truncating e.g. a huge column-order attr
    require(bp <= 0xFFFF, s"header message too large ($bp bytes, type $typ)")
    le(8 + bp) { b =>
      b.putShort(typ.toShort); b.putShort(bp.toShort)
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      val p = new Array[Byte](bp); System.arraycopy(body, 0, p, 0, body.length); b.put(p)
    }
  }

  private def writeObjectHeader(out: Out, msgs: Seq[Array[Byte]]): Long = {
    val total = msgs.map(_.length).sum
    val addr = out.alloc(16 + total)
    val hdr = le(16) { b =>
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(msgs.size.toShort)
      b.putInt(1) // ref count
      b.putInt(total)
      b.putInt(0) // pad
    }
    out.write(addr, hdr)
    var off = addr + 16
    msgs.foreach { m => out.write(off, m); off += m.length }
    addr
  }

  private def writeDataset(out: Out, d: Dset): Long = {
    if (d.chunkElems > 0) writeChunkedDataset(out, d)
    else {
      val dataAddr = out.alloc(math.max(1, d.bytes.length).toLong)
      out.write(dataAddr, d.bytes)
      val layout = le(18) { b =>
        b.put(3.toByte); b.put(1.toByte) // v3 contiguous: addr + size follow directly
        b.putLong(dataAddr); b.putLong(d.bytes.length.toLong)
      }
      val msgs = Seq(
        msg(0x0001, encDataspace(d.dims)),
        msg(0x0003, encDatatype(d.dtype)),
        msg(0x0008, layout)) ++ d.attrs.map { case (n, v) => msg(0x000C, encAttr(n, v)) }
      writeObjectHeader(out, msgs)
    }
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val df = new java.util.zip.Deflater()
    df.setInput(bytes); df.finish()
    val outB = new java.io.ByteArrayOutputStream(bytes.length)
    val tmp = new Array[Byte](65536)
    while (!df.finished()) outB.write(tmp, 0, df.deflate(tmp))
    df.end()
    outB.toByteArray
  }

  private def writeChunkedDataset(out: Out, d: Dset): Long = {
    val esz = d.dtype.size
    val ce = d.chunkElems
    val n = (d.bytes.length / esz).toLong
    val nChunks = ((n + ce - 1) / ce).toInt
    // chunks are always full-size (last one padded) before filtering
    val chunks = (0 until nChunks).map { i =>
      val full = new Array[Byte](ce * esz)
      val from = i * ce * esz
      val len = math.min(d.bytes.length - from, full.length)
      System.arraycopy(d.bytes, from, full, 0, len)
      val payload = if (d.gzip) deflate(full) else full
      val addr = out.alloc(payload.length.toLong)
      out.write(addr, payload)
      (i.toLong * ce, addr, payload.length)
    }
    // chunk B-tree v1, single leaf node: keys (size, mask, offsets×2) + child
    val keySize = 8 + 8 * 2
    val btAddr = out.alloc(24L + nChunks * (keySize + 8) + keySize)
    out.write(btAddr, le(24) { b =>
      b.put('T'.toByte); b.put('R'.toByte); b.put('E'.toByte); b.put('E'.toByte)
      b.put(1.toByte); b.put(0.toByte) // raw-data node, level 0
      b.putShort(nChunks.toShort)
      b.putLong(-1L); b.putLong(-1L)
    })
    var off = btAddr + 24
    chunks.foreach { case (elemOff, addr, sz) =>
      out.write(off, le(keySize + 8) { b =>
        b.putInt(sz); b.putInt(0)
        b.putLong(elemOff); b.putLong(0L)
        b.putLong(addr)
      })
      off += keySize + 8
    }
    out.write(off, le(keySize) { b => // past-the-end key
      b.putInt(0); b.putInt(0); b.putLong(nChunks.toLong * ce); b.putLong(0L)
    })
    val layout = le(22) { b =>
      b.put(3.toByte); b.put(2.toByte) // v3 chunked
      b.put(2.toByte) // dimensionality = rank + 1
      b.putLong(btAddr)
      b.putInt(ce); b.putInt(esz)
    }
    // filter pipeline v1: deflate (id 1), no name, 1 client value (level),
    // odd client count → trailing 4-byte pad
    val filterMsgs =
      if (d.gzip) Seq(msg(0x000B, le(24) { b =>
        b.put(1.toByte); b.put(1.toByte)
        b.put(Array.fill(6)(0.toByte))
        b.putShort(1); b.putShort(0); b.putShort(0); b.putShort(1)
        b.putInt(6); b.putInt(0)
      })) else Seq.empty
    val msgs = Seq(
      msg(0x0001, encDataspace(d.dims)),
      msg(0x0003, encDatatype(d.dtype)),
      msg(0x0008, layout)) ++ filterMsgs ++
      d.attrs.map { case (nm, v) => msg(0x000C, encAttr(nm, v)) }
    writeObjectHeader(out, msgs)
  }

  private def writeGroup(out: Out, g: Group): Long = {
    val kids = g.children.toSeq.sortBy(_._1) // SNOD entries must be name-sorted
    require(kids.size <= 64, s"group has ${kids.size} children; single-SNOD writer caps at 64")
    val childAddrs = kids.map {
      case (n, sub: Group) => (n, writeGroup(out, sub))
      case (n, d: Dset) => (n, writeDataset(out, d))
    }
    // local heap data segment: 8-byte empty string then 8-aligned names
    val heapEntries = mutable.ArrayBuffer[(String, Long)]()
    var heapLen = 8L
    childAddrs.foreach { case (n, _) =>
      heapEntries += (n -> heapLen)
      heapLen += pad8(n.getBytes("UTF-8").length + 1)
    }
    val heapDataAddr = out.alloc(math.max(8, heapLen))
    out.write(heapDataAddr, new Array[Byte](8))
    heapEntries.foreach { case (n, off) =>
      val nb = n.getBytes("UTF-8")
      val p = new Array[Byte](pad8(nb.length + 1)); System.arraycopy(nb, 0, p, 0, nb.length)
      out.write(heapDataAddr + off, p)
    }
    val heapAddr = out.alloc(32)
    out.write(heapAddr, le(32) { b =>
      b.put('H'.toByte); b.put('E'.toByte); b.put('A'.toByte); b.put('P'.toByte)
      b.put(0.toByte); b.put(Array.fill(3)(0.toByte))
      b.putLong(math.max(8, heapLen))
      b.putLong(-1L) // free list: none
      b.putLong(heapDataAddr)
    })
    // SNOD with all children
    val snodAddr = out.alloc(8 + 40L * childAddrs.size)
    out.write(snodAddr, le(8) { b =>
      b.put('S'.toByte); b.put('N'.toByte); b.put('O'.toByte); b.put('D'.toByte)
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(childAddrs.size.toShort)
    })
    childAddrs.zipWithIndex.foreach { case ((n, addr), i) =>
      val off = heapEntries(i)._2
      out.write(snodAddr + 8 + 40L * i, le(40) { b =>
        b.putLong(off); b.putLong(addr); b.putInt(0); b.putInt(0)
        b.putLong(0L); b.putLong(0L)
      })
    }
    // B-tree v1: one leaf entry pointing at the SNOD
    val btreeAddr = out.alloc(24 + 24)
    val lastNameOff = if (heapEntries.isEmpty) 0L else heapEntries.last._2
    out.write(btreeAddr, le(48) { b =>
      b.put('T'.toByte); b.put('R'.toByte); b.put('E'.toByte); b.put('E'.toByte)
      b.put(0.toByte); b.put(0.toByte) // group node, level 0
      b.putShort(1)
      b.putLong(-1L); b.putLong(-1L)
      b.putLong(0L) // key 0: empty string
      b.putLong(snodAddr)
      b.putLong(lastNameOff)
    })
    val msgs = Seq(msg(0x0011, le(16) { b => b.putLong(btreeAddr); b.putLong(heapAddr) })) ++
      g.attrs.map { case (n, v) => msg(0x000C, encAttr(n, v)) }
    writeObjectHeader(out, msgs)
  }

  def save(path: String): Unit = {
    val out = new Out
    out.alloc(96) // superblock v0 incl. root symbol table entry
    // the in-memory builder is capped at 2 GB; fail loudly, never truncate
    def guard(): Unit = require(out.len < Int.MaxValue.toLong,
      "H5Writer in-memory builder exceeds 2 GB — split the export")
    val rootAddr = writeGroup(out, root)
    val sb = le(96) { b =>
      b.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
      b.put(0.toByte) // superblock v0
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // fs ver, stab ver, res
      b.put(0.toByte) // shared msg ver
      b.put(8.toByte); b.put(8.toByte) // offsets, lengths
      b.put(0.toByte)
      b.putShort(32) // group leaf k (2k = 64 symbols per SNOD)
      b.putShort(16) // group internal k
      b.putInt(0)
      b.putLong(0L) // base
      b.putLong(-1L) // free space
      b.putLong(out.len) // EOF
      b.putLong(-1L) // driver info
      // root symbol table entry: name offset, header addr, cache type 0
      b.putLong(0L); b.putLong(rootAddr); b.putInt(0); b.putInt(0)
      b.putLong(0L); b.putLong(0L)
    }
    out.write(0L, sb)
    guard()
    val f = new java.io.FileOutputStream(path)
    try f.write(out.bytes, 0, out.len.toInt) finally f.close()
  }
}
