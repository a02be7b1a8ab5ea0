package graft.sources.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}
import scala.collection.mutable

/** Minimal pure-JVM HDF5 reader, written against the public HDF5 File
  * Format Specification (v3; portal.hdfgroup.org). Covers the subset the
  * reference's reader family touches (scarf/readers.py:192-1120):
  *
  *  - superblock v0 (libhdf5/h5py default) and v2/v3
  *  - object headers v1 and v2 (incl. continuation blocks)
  *  - groups via symbol tables (B-tree v1 + local heap + SNOD) and via
  *    compact Link messages (v2 "new style" without fractal heaps)
  *  - datasets: contiguous, compact, and chunked (B-tree v1 chunk index)
  *    layouts; deflate (gzip) and shuffle filters
  *  - datatypes: fixed-point (1/2/4/8 B), IEEE float (4/8 B), fixed-size
  *    strings, variable-length strings (global heap), compound (for
  *    structured/"recarray" columns, e.g. NaboH5 cell_data)
  *  - attribute messages v1/v2/v3
  *
  * Everything is little-endian (the only layout h5py/numpy emit by
  * default); big-endian data raises. No JNI, no external jars.
  */
final class H5Reader(path: String) extends AutoCloseable {
  private val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
  val fileSize: Long = ch.size()

  def close(): Unit = ch.close()

  private def readBuf(addr: Long, len: Int): ByteBuffer = {
    val b = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    while (pos < len) {
      val n = ch.read(b, addr + pos)
      require(n > 0, s"unexpected EOF at ${addr + pos} in $path")
      pos += n
    }
    b.flip(); b
  }

  private def u8(b: ByteBuffer): Int = b.get() & 0xFF
  private def u16(b: ByteBuffer): Int = b.getShort() & 0xFFFF
  private def u32(b: ByteBuffer): Long = b.getInt() & 0xFFFFFFFFL
  private def u64(b: ByteBuffer): Long = b.getLong()
  private val UNDEF = -1L // 0xFFF...F

  // ---------------------------------------------------------------- superblock
  /** (rootObjectHeaderAddr, rootBtreeAddr, rootHeapAddr) — btree/heap only
    * set for v0 cached symbol-table entries.
    */
  private val rootAddr: Long = {
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    val head = readBuf(0L, 8).array()
    require(head.sameElements(sig), s"$path is not an HDF5 file")
    val b = readBuf(8L, 4)
    val ver = u8(b)
    ver match {
      case 0 | 1 =>
        val sb = readBuf(8L, 88)
        u8(sb) // superblock version
        u8(sb); u8(sb); u8(sb) // freespace ver, root stab ver, reserved
        u8(sb) // shared header version
        val soff = u8(sb); val slen = u8(sb)
        require(soff == 8 && slen == 8, s"unsupported offset/length size $soff/$slen")
        u8(sb) // reserved
        u16(sb); u16(sb) // group leaf/internal k
        u32(sb) // consistency flags
        if (ver == 1) { u16(sb); u16(sb) } // indexed storage k + reserved
        u64(sb) // base address
        u64(sb); u64(sb); u64(sb) // freespace, EOF, driver info
        // root group symbol table entry
        u64(sb) // link name offset
        u64(sb) // object header address
      case 2 | 3 =>
        val sb = readBuf(8L, 40)
        u8(sb) // version
        val soff = u8(sb); val slen = u8(sb)
        require(soff == 8 && slen == 8, s"unsupported offset/length size $soff/$slen")
        u8(sb) // consistency flags
        u64(sb); u64(sb); u64(sb) // base, extension, EOF
        u64(sb) // root object header address
      case v => sys.error(s"unsupported superblock version $v")
    }
  }

  // ---------------------------------------------------------------- messages
  private case class Msg(typ: Int, body: Array[Byte])

  private def parseObjectHeader(addr: Long): Seq[Msg] = {
    val first = readBuf(addr, 4)
    if (first.get(0) == 'O' && first.get(1) == 'H' && first.get(2) == 'D' && first.get(3) == 'R')
      parseV2Header(addr)
    else parseV1Header(addr)
  }

  private def parseV1Header(addr: Long): Seq[Msg] = {
    val pre = readBuf(addr, 16)
    val ver = u8(pre)
    require(ver == 1, s"object header version $ver at $addr")
    u8(pre)
    u16(pre) // total message count (continuations complicate it; parse by size)
    u32(pre) // reference count
    val hdrSize = u32(pre).toInt
    val out = mutable.ArrayBuffer.empty[Msg]
    // queue of (blockAddr, blockLen); first block starts after 16-byte prefix
    val blocks = mutable.Queue[(Long, Int)]((addr + 16, hdrSize))
    while (blocks.nonEmpty) {
      val (ba, bl) = blocks.dequeue()
      val b = readBuf(ba, bl)
      while (b.remaining() >= 8) {
        val typ = u16(b); val sz = u16(b); u8(b); b.position(b.position() + 3)
        if (b.remaining() >= sz) {
          val body = new Array[Byte](sz); b.get(body)
          if (typ == 0x0010) { // continuation
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            blocks.enqueue((u64(cb), u64(cb).toInt))
          } else if (typ != 0) out += Msg(typ, body)
        } else b.position(b.limit())
      }
    }
    out.toSeq
  }

  private def parseV2Header(addr: Long): Seq[Msg] = {
    val pre = readBuf(addr, 16)
    pre.position(4) // OHDR
    val ver = u8(pre); require(ver == 2, s"v2 header version $ver")
    val flags = u8(pre)
    var off = 6
    if ((flags & 0x20) != 0) off += 8 // times
    if ((flags & 0x10) != 0) off += 4 // max compact / min dense
    val szBytes = 1 << (flags & 0x3)
    val szBuf = readBuf(addr + off, 8)
    val chunk0 = szBytes match {
      case 1 => u8(szBuf).toLong
      case 2 => u16(szBuf).toLong
      case 4 => u32(szBuf)
      case 8 => u64(szBuf)
    }
    off += szBytes
    val out = mutable.ArrayBuffer.empty[Msg]
    val creationOrder = (flags & 0x04) != 0
    // (blockStart, msgBytes): first chunk has no signature; continuations
    // start with "OCHK" and end with a 4-byte checksum
    val blocks = mutable.Queue[(Long, Long, Boolean)]((addr + off, chunk0, false))
    while (blocks.nonEmpty) {
      val (ba0, bl0, isCont) = blocks.dequeue()
      val skip = if (isCont) 4 else 0
      val b = readBuf(ba0 + skip, (bl0 - skip - (if (isCont) 4 else 0)).toInt max 0)
      var ok = true
      while (ok && b.remaining() >= 4 + (if (creationOrder) 2 else 0)) {
        val typ = u8(b); val sz = u16(b); u8(b)
        if (creationOrder && b.remaining() >= 2) u16(b)
        if (b.remaining() >= sz) {
          val body = new Array[Byte](sz); b.get(body)
          if (typ == 0x10) {
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            blocks.enqueue((u64(cb), u64(cb), true))
          } else if (typ != 0) out += Msg(typ, body)
        } else ok = false
      }
      // trailing gap + checksum ignored
    }
    // v1 chunk0 includes a trailing checksum in the parse range; harmless
    out.toSeq
  }

  // ---------------------------------------------------------------- datatypes
  sealed trait H5Type { def size: Int }
  case class TInt(size: Int, signed: Boolean) extends H5Type
  case class TFloat(size: Int) extends H5Type
  case class TString(size: Int) extends H5Type
  case class TVlenStr() extends H5Type { val size = 16 }
  case class TCompound(members: Seq[(String, Int, H5Type)], size: Int) extends H5Type

  private def parseDatatype(b: ByteBuffer): H5Type = {
    val start = b.position()
    val cv = u8(b); val cls = cv & 0x0F; val ver = cv >> 4
    val bits0 = u8(b); val bits1 = u8(b); u8(b)
    val size = u32(b).toInt
    cls match {
      case 0 =>
        require((bits0 & 0x01) == 0, "big-endian fixed-point unsupported")
        if (b.remaining() >= 4) { u16(b); u16(b) } // bit offset + precision
        TInt(size, (bits0 & 0x08) != 0)
      case 1 =>
        require((bits0 & 0x01) == 0, "big-endian float unsupported")
        if (b.remaining() >= 12) { // offset/precision/exp/man/bias properties
          u16(b); u16(b); u8(b); u8(b); u8(b); u8(b); u32(b)
        }
        TFloat(size)
      case 3 => TString(size)
      case 6 =>
        val n = ver match {
          case 3 => bits0 | (bits1 << 8)
          case _ => bits0 | (bits1 << 8)
        }
        val members = (0 until n).map { _ =>
          val name = ver match {
            case 1 | 2 =>
              val sb = new StringBuilder
              var c = u8(b)
              var read = 1
              while (c != 0) { sb.append(c.toChar); c = u8(b); read += 1 }
              val pad = (8 - (read % 8)) % 8
              b.position(b.position() + pad)
              sb.toString
            case _ =>
              val sb = new StringBuilder
              var c = u8(b)
              while (c != 0) { sb.append(c.toChar); c = u8(b) }
              sb.toString
          }
          val offset = ver match {
            case 1 | 2 => u32(b).toInt
            case _ => // v3: minimal-size integer for the compound size
              val nb = if (size < 256) 1 else if (size < 65536) 2 else 4
              var v = 0L; (0 until nb).foreach(i => v |= (u8(b).toLong << (8 * i))); v.toInt
          }
          if (ver == 1) { // dimensionality + reserved + perm + reserved + 4 dims
            u8(b); b.position(b.position() + 3); u32(b); u32(b)
            (0 until 4).foreach(_ => u32(b))
          }
          val t = parseDatatype(b)
          (name, offset, t)
        }
        TCompound(members, size)
      case 9 =>
        val isStr = (bits0 & 0x0F) == 1
        parseDatatype(b) // base type
        require(isStr, "non-string vlen unsupported")
        TVlenStr()
      case c => sys.error(s"unsupported datatype class $c (at buffer offset $start)")
    }
  }

  // ---------------------------------------------------------------- dataset
  sealed trait Layout
  case class Contiguous(addr: Long, size: Long) extends Layout
  case class Compact(data: Array[Byte]) extends Layout
  case class Chunked(btreeAddr: Long, chunkDims: Array[Int], elemSize: Int) extends Layout

  case class Chunk(offsets: Array[Long], addr: Long, sizeBytes: Int, filterMask: Int)

  case class Filter(id: Int, clientData: Array[Int])

  final class Dataset(val dims: Array[Long], val dtype: H5Type, val layout: Layout,
                      val filters: Seq[Filter], val attrs: Map[String, Any]) {
    def nElems: Long = if (dims.isEmpty) 1L else dims.product

    /** Raw bytes of the flattened element range [from, until). */
    def readRawSlice(from: Long, until: Long): Array[Byte] =
      H5Reader.this.readRawSlice(this, from, until)

    def readAllRaw(): Array[Byte] = readRawSlice(0L, nElems)

    def readLongs(from: Long = 0L, until: Long = -1L): Array[Long] = {
      val u = if (until < 0) nElems else until
      val bytes = readRawSlice(from, u)
      val n = (u - from).toInt
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val t = dtype.asInstanceOf[TInt]
      Array.tabulate(n)(_ => t.size match {
        case 1 => if (t.signed) b.get().toLong else (b.get() & 0xFF).toLong
        case 2 => if (t.signed) b.getShort().toLong else (b.getShort() & 0xFFFF).toLong
        case 4 => if (t.signed) b.getInt().toLong else b.getInt() & 0xFFFFFFFFL
        case 8 => b.getLong()
      })
    }

    def readDoubles(from: Long = 0L, until: Long = -1L): Array[Double] = {
      val u = if (until < 0) nElems else until
      val bytes = readRawSlice(from, u)
      val n = (u - from).toInt
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      dtype match {
        case TFloat(4) => Array.tabulate(n)(_ => b.getFloat().toDouble)
        case TFloat(8) => Array.tabulate(n)(_ => b.getDouble())
        case TInt(_, _) =>
          val l = readLongs(from, u); l.map(_.toDouble)
        case t => sys.error(s"cannot read $t as doubles")
      }
    }

    def readStrings(): Array[String] = dtype match {
      case TString(sz) =>
        val bytes = readAllRaw()
        Array.tabulate(nElems.toInt) { i =>
          val s = new String(bytes, i * sz, sz, "UTF-8")
          val z = s.indexOf('\u0000')
          if (z >= 0) s.substring(0, z) else s
        }
      case TVlenStr() =>
        val bytes = readAllRaw()
        readVlenStrings(bytes, nElems.toInt)
      case t => sys.error(s"cannot read $t as strings")
    }

    /** Column `name` of a compound dataset as longs/doubles/strings. */
    def readCompoundColumn(name: String): Array[Any] = {
      val c = dtype.asInstanceOf[TCompound]
      val (_, off, t) = c.members.find(_._1 == name)
        .getOrElse(sys.error(s"no compound member $name"))
      val bytes = readAllRaw()
      Array.tabulate(nElems.toInt) { i =>
        val b = ByteBuffer.wrap(bytes, i * c.size + off, t.size).order(ByteOrder.LITTLE_ENDIAN)
        t match {
          case TInt(1, true) => b.get().toLong
          case TInt(2, true) => b.getShort().toLong
          case TInt(4, true) => b.getInt().toLong
          case TInt(8, true) => b.getLong()
          case TInt(4, false) => b.getInt() & 0xFFFFFFFFL
          case TFloat(4) => b.getFloat().toDouble
          case TFloat(8) => b.getDouble()
          case TString(sz) =>
            val s = new String(bytes, i * c.size + off, sz, "UTF-8")
            val z = s.indexOf('\u0000'); if (z >= 0) s.substring(0, z) else s
          case x => sys.error(s"unsupported compound member type $x")
        }
      }
    }

    /** Chunk descriptors (for distributed chunk-parallel reads). */
    def chunks: Seq[Chunk] = layout match {
      case Chunked(bt, _, _) => walkChunkBtree(bt, dims.length)
      case _ => Seq.empty
    }
  }

  // ---------------------------------------------------------------- groups
  /** Children (name → object header address) of the group at `addr`. */
  def children(addr: Long): Map[String, Long] = {
    val msgs = parseObjectHeader(addr)
    val out = mutable.LinkedHashMap.empty[String, Long]
    // Link Info (0x0002) with a defined fractal-heap address marks DENSE
    // link storage (libhdf5 switches to it past the compact-links limit).
    // We don't walk fractal heaps; fail loudly rather than silently
    // reading such a group as empty.
    var denseLinks = false
    msgs.foreach { m =>
      val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
      m.typ match {
        case 0x0002 =>
          val ver = u8(b); val flags = u8(b)
          if (ver == 0) {
            if ((flags & 0x1) != 0) u64(b) // max creation index
            val fheap = u64(b)
            if (fheap != -1L) denseLinks = true // -1 = undefined address
          }
        case _ =>
      }
    }
    msgs.foreach { m =>
      val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
      m.typ match {
        case 0x0011 => // symbol table
          val btree = u64(b); val heap = u64(b)
          out ++= symbolTableLinks(btree, heap)
        case 0x0006 => // link message
          val ver = u8(b); require(ver == 1)
          val flags = u8(b)
          val ltype = if ((flags & 0x08) != 0) u8(b) else 0
          if ((flags & 0x04) != 0) u64(b) // creation order
          if ((flags & 0x10) != 0) u8(b) // charset
          val lenSz = 1 << (flags & 0x3)
          val nameLen = lenSz match {
            case 1 => u8(b).toLong case 2 => u16(b).toLong
            case 4 => u32(b) case 8 => u64(b)
          }
          val nb = new Array[Byte](nameLen.toInt); b.get(nb)
          if (ltype == 0) out += (new String(nb, "UTF-8") -> u64(b))
        case _ =>
      }
    }
    require(!(denseLinks && out.isEmpty),
      s"group at $addr uses dense link storage (fractal heap) — unsupported")
    // preserve link order (plain .toMap would hash-scramble it; legacy
    // multi-group roots need deterministic iteration)
    scala.collection.immutable.ListMap(out.toSeq: _*)
  }

  private def symbolTableLinks(btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
    // local heap: HEAP ver res3 dataSegSize freeHead dataSegAddr
    val hb = readBuf(heapAddr, 32)
    require(hb.get(0) == 'H' && hb.get(1) == 'E' && hb.get(2) == 'A' && hb.get(3) == 'P',
      s"bad local heap at $heapAddr")
    hb.position(8); u64(hb); u64(hb)
    val heapData = u64(hb)

    def name(off: Long): String = {
      val sb = new StringBuilder
      var a = heapData + off
      var ch0 = readBuf(a, 64)
      var done = false
      while (!done) {
        while (ch0.hasRemaining && !done) {
          val c = ch0.get()
          if (c == 0) done = true else sb.append(c.toChar)
        }
        if (!done) { a += 64; ch0 = readBuf(a, 64) }
      }
      sb.toString
    }

    def walk(a: Long): Seq[(String, Long)] = {
      val head = readBuf(a, 24)
      require(head.get(0) == 'T' && head.get(1) == 'R' && head.get(2) == 'E' && head.get(3) == 'E',
        s"bad btree node at $a")
      head.position(4)
      val typ = u8(head); require(typ == 0, s"expected group btree, got type $typ")
      val level = u8(head)
      val used = u16(head)
      u64(head); u64(head) // siblings
      val body = readBuf(a + 24, (2 * used + 1) * 8)
      val kids = (0 until used).map { _ => u64(body); u64(body) }
      if (level > 0) kids.flatMap(walk)
      else kids.flatMap { snodAddr =>
        val sh = readBuf(snodAddr, 8)
        require(sh.get(0) == 'S' && sh.get(1) == 'N' && sh.get(2) == 'O' && sh.get(3) == 'D',
          s"bad SNOD at $snodAddr")
        sh.position(6)
        val nsym = u16(sh)
        val entries = readBuf(snodAddr + 8, nsym * 40)
        (0 until nsym).map { _ =>
          val nameOff = u64(entries)
          val ohdr = u64(entries)
          entries.position(entries.position() + 24)
          (name(nameOff), ohdr)
        }
      }
    }
    walk(btreeAddr)
  }

  /** Resolve a /-separated path from the root group to an object header. */
  def resolve(path0: String): Long = {
    val parts = path0.split("/").filter(_.nonEmpty)
    parts.foldLeft(rootAddr) { (addr, p) =>
      children(addr).getOrElse(p, sys.error(s"path $path0: '$p' not found"))
    }
  }

  def exists(path0: String): Boolean =
    try { resolve(path0); true } catch { case _: RuntimeException => false }

  def childNames(path0: String): Seq[String] = children(resolve(path0)).keys.toSeq

  /** True if the object at `path0` is a group (has links / symbol table). */
  def isGroup(path0: String): Boolean = {
    val msgs = parseObjectHeader(resolve(path0))
    msgs.exists(m => m.typ == 0x0011 || m.typ == 0x0006 || m.typ == 0x0002)
  }

  // ---------------------------------------------------------------- dataset read
  def dataset(path0: String): Dataset = datasetAt(resolve(path0))

  def datasetAt(addr: Long): Dataset = {
    val msgs = parseObjectHeader(addr)
    var dims: Array[Long] = Array.empty
    var dtype: H5Type = null
    var layout: Layout = null
    var filters: Seq[Filter] = Seq.empty
    val attrs = mutable.Map.empty[String, Any]
    msgs.foreach { m =>
      val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
      m.typ match {
        case 0x0001 =>
          val ver = u8(b)
          val rank = u8(b)
          val flags = u8(b)
          if (ver == 1) { b.position(b.position() + 5) } else { u8(b) /* type */ }
          dims = Array.fill(rank)(u64(b))
          if ((flags & 1) != 0) (0 until rank).foreach(_ => u64(b)) // maxdims
        case 0x0003 => dtype = parseDatatype(b)
        case 0x0008 =>
          val ver = u8(b)
          require(ver == 3, s"layout version $ver unsupported")
          u8(b) match {
            case 0 =>
              val sz = u16(b)
              val d = new Array[Byte](sz); b.get(d); layout = Compact(d)
            case 1 => layout = Contiguous(u64(b), u64(b))
            case 2 =>
              val ndim = u8(b)
              val bt = u64(b)
              val cdims = Array.fill(ndim - 1)(u32(b).toInt)
              val esz = u32(b).toInt
              layout = Chunked(bt, cdims, esz)
          }
        case 0x000B => filters = parseFilters(b)
        case 0x000C => parseAttribute(b).foreach { case (k, v) => attrs(k) = v }
        case _ =>
      }
    }
    require(dtype != null && layout != null, s"not a dataset at $addr")
    new Dataset(dims, dtype, layout, filters, attrs.toMap)
  }

  def attributes(path0: String): Map[String, Any] = {
    val msgs = parseObjectHeader(resolve(path0))
    msgs.filter(_.typ == 0x000C).flatMap { m =>
      parseAttribute(ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN))
    }.toMap
  }

  private def parseFilters(b: ByteBuffer): Seq[Filter] = {
    val ver = u8(b)
    val n = u8(b)
    if (ver == 1) b.position(b.position() + 6)
    (0 until n).map { _ =>
      val id = u16(b)
      val nameLen = if (ver == 1 || id >= 256) u16(b) else 0
      u16(b) // flags
      val ncd = u16(b)
      if (nameLen > 0) {
        val padded = if (ver == 1) ((nameLen + 7) / 8) * 8 else nameLen
        b.position(b.position() + padded)
      }
      val cd = Array.fill(ncd)(u32(b).toInt)
      if (ver == 1 && ncd % 2 == 1) u32(b)
      Filter(id, cd)
    }
  }

  private def parseAttribute(b: ByteBuffer): Option[(String, Any)] = {
    val ver = u8(b)
    if (ver < 1 || ver > 3) return None
    val flags = u8(b) // reserved in v1
    val nameSize = u16(b)
    val dtSize = u16(b)
    val dsSize = u16(b)
    if (ver == 3) u8(b) // name charset
    if (ver >= 2 && (flags & 0x01) != 0) return None // shared datatype
    def padded(sz: Int): Int = if (ver == 1) ((sz + 7) / 8) * 8 else sz
    val nameB = new Array[Byte](padded(nameSize)); b.get(nameB)
    val name = {
      val s = new String(nameB, "UTF-8"); val z = s.indexOf('\u0000')
      if (z >= 0) s.substring(0, z) else s
    }
    val dtB = new Array[Byte](padded(dtSize)); b.get(dtB)
    val dsB = new Array[Byte](padded(dsSize)); b.get(dsB)
    val t = parseDatatype(ByteBuffer.wrap(dtB).order(ByteOrder.LITTLE_ENDIAN))
    val ds = ByteBuffer.wrap(dsB).order(ByteOrder.LITTLE_ENDIAN)
    val dver = u8(ds); val rank = u8(ds); val dflags = u8(ds)
    if (dver == 1) ds.position(ds.position() + 5) else u8(ds)
    val dims = Array.fill(rank)(u64(ds))
    if ((dflags & 1) != 0) (0 until rank).foreach(_ => u64(ds))
    val n = if (dims.isEmpty) 1 else dims.product.toInt
    val data = new Array[Byte](b.remaining()); b.get(data)
    val db = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val value: Any = t match {
      case TInt(sz, _) =>
        val vs = Array.tabulate(n)(_ => sz match {
          case 1 => db.get().toLong; case 2 => db.getShort().toLong
          case 4 => db.getInt().toLong; case 8 => db.getLong()
        })
        if (rank == 0) vs(0) else vs
      case TFloat(sz) =>
        val vs = Array.tabulate(n)(_ => if (sz == 4) db.getFloat().toDouble else db.getDouble())
        if (rank == 0) vs(0) else vs
      case TString(sz) =>
        val vs = Array.tabulate(n) { i =>
          val s = new String(data, i * sz, sz, "UTF-8")
          val z = s.indexOf('\u0000'); if (z >= 0) s.substring(0, z) else s
        }
        if (rank == 0) vs(0) else vs
      case TVlenStr() =>
        val vs = readVlenStrings(data, n)
        if (rank == 0) vs(0) else vs
      case _ => return None
    }
    Some(name -> value)
  }

  // ---------------------------------------------------------------- chunks
  private def walkChunkBtree(addr: Long, rank: Int): Seq[Chunk] = {
    if (addr == UNDEF) return Seq.empty
    val head = readBuf(addr, 24)
    require(head.get(0) == 'T' && head.get(1) == 'R' && head.get(2) == 'E' && head.get(3) == 'E',
      s"bad chunk btree node at $addr")
    head.position(4)
    val typ = u8(head); require(typ == 1, s"expected chunk btree, got $typ")
    val level = u8(head)
    val used = u16(head)
    u64(head); u64(head)
    // key: size u32, filter mask u32, offsets u64 × (rank+1)
    val keySize = 8 + 8 * (rank + 1)
    val body = readBuf(addr + 24, used * (keySize + 8) + keySize)
    val out = mutable.ArrayBuffer.empty[Chunk]
    val kids = mutable.ArrayBuffer.empty[Long]
    (0 until used).foreach { _ =>
      val sz = u32(body).toInt
      val mask = u32(body).toInt
      val offs = Array.fill(rank + 1)(u64(body))
      val child = u64(body)
      if (level == 0) out += Chunk(offs.dropRight(1), child, sz, mask)
      else kids += child
    }
    if (level == 0) out.toSeq else kids.toSeq.flatMap(walkChunkBtree(_, rank))
  }

  private def decodeChunk(ds: Dataset, c: Chunk): Array[Byte] = {
    var bytes = readBuf(c.addr, c.sizeBytes).array()
    // filters applied in reverse pipeline order on read; mask bit i set =>
    // filter i skipped for this chunk
    ds.filters.zipWithIndex.reverse.foreach { case (f, i) =>
      if ((c.filterMask & (1 << i)) == 0) f.id match {
        case 1 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(bytes)
          val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
          val tmp = new Array[Byte](65536)
          while (!inf.finished()) {
            val n = inf.inflate(tmp)
            if (n == 0 && inf.needsInput()) sys.error("truncated deflate chunk")
            out.write(tmp, 0, n)
          }
          inf.end()
          bytes = out.toByteArray
        case 2 => // shuffle: client[0] = element size
          val esz = f.clientData.headOption.getOrElse(ds.dtype.size)
          if (esz > 1) {
            val n = bytes.length / esz
            val un = new Array[Byte](bytes.length)
            var j = 0
            while (j < esz) {
              var i = 0
              while (i < n) { un(i * esz + j) = bytes(j * n + i); i += 1 }
              j += 1
            }
            bytes = un
          }
        case 3 => // fletcher32 checksum: strip trailing 4 bytes, skip verify
          bytes = bytes.dropRight(4)
        case id => sys.error(s"unsupported filter $id")
      }
    }
    bytes
  }

  private def readRawSlice(ds: Dataset, from: Long, until: Long): Array[Byte] = {
    val esz = ds.dtype.size
    val n = (until - from).toInt
    ds.layout match {
      case Compact(d) => java.util.Arrays.copyOfRange(d, from.toInt * esz, until.toInt * esz)
      case Contiguous(addr, _) => readBuf(addr + from * esz, n * esz).array()
      case Chunked(_, cdims, _) =>
        val out = new Array[Byte](n * esz)
        // flattened (row-major) element index range; chunks are row-major
        // grid blocks. For rank 1 this is a plain interval intersection;
        // for rank >1 we intersect per chunk row-run.
        val dims = ds.dims
        ds.chunks.foreach { c =>
          if (dims.length == 1) {
            val c0 = c.offsets(0)
            val clen = math.min(cdims(0).toLong, dims(0) - c0)
            val lo = math.max(from, c0)
            val hi = math.min(until, c0 + clen)
            if (lo < hi) {
              val bytes = decodeChunk(ds, c)
              System.arraycopy(bytes, ((lo - c0) * esz).toInt, out,
                ((lo - from) * esz).toInt, ((hi - lo) * esz).toInt)
            }
          } else {
            // general rank-2 row-major copy (covers Loom dense + obsm)
            require(dims.length == 2, s"rank ${dims.length} slices unsupported")
            val (r0, c0) = (c.offsets(0), c.offsets(1))
            val rows = math.min(cdims(0).toLong, dims(0) - r0)
            val cols = math.min(cdims(1).toLong, dims(1) - c0)
            lazy val bytes = decodeChunk(ds, c)
            var decoded: Array[Byte] = null
            var r = 0L
            while (r < rows) {
              val rowStart = (r0 + r) * dims(1) + c0 // flattened elem idx
              val lo = math.max(from, rowStart)
              val hi = math.min(until, rowStart + cols)
              if (lo < hi) {
                if (decoded == null) decoded = bytes
                // within-chunk: row r starts at r * cdims(1) (chunk row pitch)
                val srcElem = r * cdims(1) + (lo - rowStart)
                System.arraycopy(decoded, (srcElem * esz).toInt, out,
                  ((lo - from) * esz).toInt, ((hi - lo) * esz).toInt)
              }
              r += 1
            }
          }
        }
        out
    }
  }

  // ---------------------------------------------------------------- global heap
  private val gcolCache = mutable.Map.empty[Long, Map[Int, Array[Byte]]]

  private def globalHeap(addr: Long): Map[Int, Array[Byte]] =
    gcolCache.getOrElseUpdate(addr, {
      val head = readBuf(addr, 16)
      require(head.get(0) == 'G' && head.get(1) == 'C' && head.get(2) == 'O' && head.get(3) == 'L',
        s"bad global heap at $addr")
      head.position(8)
      val size = u64(head)
      val body = readBuf(addr + 16, (size - 16).toInt)
      val out = mutable.Map.empty[Int, Array[Byte]]
      var done = false
      while (!done && body.remaining() >= 16) {
        val idx = u16(body); u16(body); u32(body)
        val osz = u64(body)
        if (idx == 0) done = true
        else {
          val data = new Array[Byte](osz.toInt); body.get(data)
          val pad = ((osz + 7) / 8 * 8 - osz).toInt
          body.position(math.min(body.position() + pad, body.limit()))
          out(idx) = data
        }
      }
      out.toMap
    })

  private def readVlenStrings(raw: Array[Byte], n: Int): Array[String] = {
    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(n) { _ =>
      val len = u32(b).toInt
      val addr = u64(b)
      val idx = u32(b).toInt
      val bytes = globalHeap(addr)(idx)
      new String(bytes, 0, math.min(len, bytes.length), "UTF-8")
    }
  }
}
