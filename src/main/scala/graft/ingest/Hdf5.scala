package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** NetCDF-4 (HDF5 container) support, written against the PUBLIC "HDF5
  * File Format Specification" (version III, hdfgroup.org) — no external
  * reader library, because the build is offline-only. This closes the gap
  * the reference covers through xarray's netcdf engine
  * (`ingest/netcdf_reader.py:13-77`), whose h5netcdf/netCDF4 backends open
  * HDF5-based archives (ERA5 distributions, CMIP6).
  *
  * Honest scope for real-world files (the layouts CF grid files actually
  * use):
  *   - superblock v0/v1 (symbol-table root group) and v2/v3 (link-message
  *     root group); object headers v1 and v2 with continuations
  *   - datatypes: fixed-point (signed/unsigned, LE/BE), IEEE float,
  *     strings (attrs), object references and vlen-of-reference (for
  *     DIMENSION_LIST)
  *   - data layout v3 (compact, contiguous, chunked with a B-tree v1
  *     chunk index) and v4 — the HDF5 1.10+ "latest" format — with all
  *     five chunk indexes: Single Chunk, Implicit, Fixed Array (paged or
  *     unpaged), Extensible Array (the one-unlimited-dim layout), and
  *     Version 2 B-tree (the multi-unlimited-dim layout); every lookup3
  *     checksum verified; chunk filter pipelines covering what netCDF-4 files
  *     actually carry — deflate (zlib, id 1), shuffle (byte transpose,
  *     id 2), fletcher32 checksums (id 3, verified), szip (id 4, the
  *     from-spec CCSDS-121 coder in Szip.scala), plus the registered
  *     lzf/lz4/zstd plugins — applied in reverse pipeline order per chunk
  *     with the B-tree key's filter mask honored; anything else
  *     (nbit/scaleoffset/user filters) fails with a clear message
  *   - netCDF-4 semantics: dimension-scale datasets (CLASS =
  *     "DIMENSION_SCALE"), DIMENSION_LIST resolution through the global
  *     heap, coordinate variables, CF time/scale/offset/fill decoding
  *   - groups: the full group tree via recursive walk over ALL THREE
  *     link storages — symbol-table (old style), compact link messages,
  *     and DENSE storage (link messages as fractal-heap managed objects
  *     behind a type-5 name-index v2 B-tree, the layout libhdf5 switches
  *     to past ~8 links); grouped products surface datasets under
  *     path-qualified names ("model/t2m")
  *
  * Scale shape mirrors [[NetCdf]]: all metadata (superblock, headers,
  * B-trees — KBs) parses on the driver; variable DATA is read by
  * executors with byte-range seeks per outer slice, contiguous slabs or
  * the intersecting chunks — [[GridCube.read]] runs the shared
  * distributed plan, so pushdown/pruning behave identically to classic.
  */
object Hdf5 {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')

  def isHdf5(path: String, props: Map[String, String]): Boolean = {
    val ch = NetCdf.openRead(path, props)
    try {
      if (ch.length < 8) false
      else {
        val b = new Array[Byte](8)
        ch.readFully(0, b, 0, 8)
        java.util.Arrays.equals(b, Signature)
      }
    } finally ch.close()
  }

  // ---- model ----

  /** cls: 0 fixed-point, 1 float, 3 string, 7 reference, 9 vlen. */
  final case class H5Type(cls: Int, size: Int, littleEndian: Boolean,
                          signed: Boolean, base: Option[H5Type] = None,
                          // fixed-point bit layout (datatype message bytes
                          // 8-11): the N-bit filter's authority for how many
                          // significant bits each element stores
                          bitOffset: Int = 0, bitPrecision: Int = 0) {
    /** Stored significant bits: the message's precision, full width when
      * the field is absent/zero. */
    def precisionBits: Int = if (bitPrecision > 0) bitPrecision else size * 8
  }

  sealed trait H5Layout extends Serializable
  final case class Contiguous(addr: Long, size: Long) extends H5Layout
  /** chunkDims excludes the trailing element-size pseudo-dimension. */
  final case class Chunked(chunkDims: IndexedSeq[Int],
                           chunks: IndexedSeq[H5Chunk]) extends H5Layout
  final case class Compact(data: Array[Byte]) extends H5Layout

  /** One stored chunk: element offsets per dimension, file address, bytes
    * as stored (compressed size when a filter pipeline is present), and
    * the B-tree key's filter mask (bit i set ⇒ pipeline filter i was
    * skipped for this chunk).
    */
  final case class H5Chunk(offsets: IndexedSeq[Long], addr: Long, size: Int,
                           mask: Int = 0)

  /** One pipeline entry: filter id, flags, client data words. */
  final case class H5Filter(id: Int, flags: Int, cdata: IndexedSeq[Int])

  final case class H5Dataset(name: String, addr: Long, dtype: H5Type,
                             dims: IndexedSeq[Int], layout: H5Layout,
                             attrs: Map[String, Any],
                             fillRaw: Option[Double],
                             isDimScale: Boolean,
                             dimRefs: Option[IndexedSeq[Long]],
                             filters: IndexedSeq[H5Filter] = IndexedSeq.empty) {
    def attrStr(n: String): Option[String] =
      attrs.get(n).collect { case s: String => s }
    def attrNum(n: String): Option[Double] =
      attrs.get(n).collect { case d: Double => d
                             case a: Array[Double] if a.nonEmpty => a(0) }
  }

  final case class H5File(datasets: IndexedSeq[H5Dataset])

  private val Undef = -1L // all-1s addresses normalize to -1

  // ---- low-level byte access (little-endian, per spec) ----

  private final class At(ch: NetCdf.PosRead) {
    def bytes(off: Long, len: Int): ByteBuffer = {
      val b = new Array[Byte](len)
      ch.readFully(off, b, 0, len)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  private def getOfs(bb: ByteBuffer, size: Int): Long = {
    val v = if (size == 8) bb.getLong
      else if (size == 4) bb.getInt.toLong & 0xFFFFFFFFL
      else sys.error(s"unsupported offset/length size $size")
    if (size == 4 && v == 0xFFFFFFFFL) Undef
    else if (size == 8 && v == -1L) Undef
    else v
  }

  // ---- structure parse (driver-side) ----

  private final case class Shape(ofs: Int, len: Int) // sizes of offsets/lengths

  /** Parse the file's dataset inventory: superblock → root group links →
    * per-dataset object headers (dataspace/datatype/layout/attrs) →
    * chunk indexes. Everything here is metadata, read once on the driver.
    */
  def readStructure(path: String, props: Map[String, String]): H5File = {
    val ch = NetCdf.openRead(path, props)
    try {
      val at = new At(ch)
      val head = at.bytes(0, 8)
      val sig = new Array[Byte](8); head.get(sig)
      require(java.util.Arrays.equals(sig, Signature), s"$path: not an HDF5 file")
      val verByte = at.bytes(8, 1).get()
      val (sh, rootAddr, rootStEntry) = (verByte & 0xFF) match {
        case 0 | 1 =>
          val fixed = at.bytes(9, 12)
          /* free(1) root-ver(1) res(1) shm-ver(1) */ fixed.position(4)
          val so = fixed.get() & 0xFF
          val sl = fixed.get() & 0xFF
          fixed.get() // reserved
          // leaf K (2), internal K (2), flags (4)
          var off = 9L + 7 + 2 + 2 + 4
          if ((verByte & 0xFF) == 1) off += 4 // indexed-storage K + reserved
          val shape = Shape(so, sl)
          val bb = at.bytes(off, 4 * so)
          getOfs(bb, so) // base address
          getOfs(bb, so); getOfs(bb, so); getOfs(bb, so)
          // root group symbol table entry
          val st = at.bytes(off + 4 * so, 2 * so + 8 + 16)
          getOfs(st, so) // link name offset
          val hdr = getOfs(st, so)
          (shape, hdr, true)
        case 2 | 3 =>
          val bb = at.bytes(9, 3)
          val so = bb.get() & 0xFF
          val sl = bb.get() & 0xFF
          bb.get() // flags
          val shape = Shape(so, sl)
          val b2 = at.bytes(12, 4L.toInt * so)
          getOfs(b2, so); getOfs(b2, so); getOfs(b2, so)
          val root = getOfs(at.bytes(12 + 3L * so, so), so)
          (shape, root, false)
        case v => sys.error(s"$path: HDF5 superblock v$v not supported")
      }
      val _ = rootStEntry
      // recursive group walk: grouped products get path-qualified dataset
      // names ("model/t2m"). Symbol-table, compact link-message, and
      // dense (fractal-heap) groups all recurse through collectLinks.
      // Cycle breaking is ANCESTOR-based, not visited-based: a group
      // hard-linked under two paths legitimately appears under both (like
      // hard-linked datasets do); only a link back to an ancestor — a
      // true cycle — is skipped.
      val out = IndexedSeq.newBuilder[H5Dataset]
      // diamond semantics make the walk path-counted, not object-counted,
      // so a crafted file with a hard-link diamond at every level is a
      // 2^depth path blowup the depth limit alone never catches (each
      // path stays shallow). A total-objects-visited budget loud-rejects
      // such a file before it pins the driver.
      var visitedObjects = 0L
      val maxVisitedObjects = 100000L
      def walkGroup(prefix: String, msgs: Seq[(Int, ByteBuffer)],
                    ancestors: Set[Long]): Unit = {
        require(prefix.count(_ == '/') <= 64, s"$path: group nesting too deep")
        collectLinks(at, msgs, sh, path).foreach { case (name, addr) =>
          val full = prefix + name
          visitedObjects += 1
          require(visitedObjects <= maxVisitedObjects,
            s"$path: group walk visited more than $maxVisitedObjects objects " +
              "(hard-link blowup?)")
          val childMsgs = readObjectHeader(at, addr, sh)
          val isDataset = childMsgs.exists(_._1 == 0x08) ||
            (childMsgs.exists(_._1 == 0x03) && childMsgs.exists(_._1 == 0x01))
          if (isDataset) out += parseDataset(at, full, addr, sh, path, childMsgs)
          else if (childMsgs.exists(m => m._1 == 0x11 || m._1 == 0x02 || m._1 == 0x06)) {
            if (!ancestors(addr)) walkGroup(full + "/", childMsgs, ancestors + addr)
          } else sys.error(s"$path: object '$full' is neither a dataset nor a group")
        }
      }
      walkGroup("", readObjectHeader(at, rootAddr, sh), Set(rootAddr))
      H5File(out.result())
    } finally ch.close()
  }

  /** (type, flags, data) triples across chunk0 + continuations. */
  private def readObjectHeader(at: At, addr: Long, sh: Shape): Seq[(Int, ByteBuffer)] = {
    val first4 = at.bytes(addr, 4)
    val sigBytes = new Array[Byte](4); first4.get(sigBytes)
    if (sigBytes.sameElements("OHDR".getBytes("US-ASCII")))
      readObjectHeaderV2(at, addr, sh)
    else readObjectHeaderV1(at, addr, sh)
  }

  private def readObjectHeaderV1(at: At, addr: Long, sh: Shape): Seq[(Int, ByteBuffer)] = {
    val pre = at.bytes(addr, 16)
    val ver = pre.get() & 0xFF
    require(ver == 1, s"object header v$ver at $addr (expected 1)")
    pre.get() // reserved
    val numMsgs = pre.getShort & 0xFFFF
    pre.getInt // reference count
    val hdrSize = pre.getInt // size of chunk-0 message data
    // chunk 0 data begins after the 12-byte prefix + 4 pad
    val out = Seq.newBuilder[(Int, ByteBuffer)]
    var blocks = List((addr + 16, hdrSize.toLong))
    var read = 0
    while (read < numMsgs && blocks.nonEmpty) {
      val (bOff, bLen) = blocks.head
      blocks = blocks.tail
      val bb = at.bytes(bOff, bLen.toInt)
      while (read < numMsgs && bb.remaining() >= 8) {
        val t = bb.getShort & 0xFFFF
        val size = math.min(bb.getShort & 0xFFFF, {
          bb.get(); bb.position(bb.position() + 3) // flags + reserved
          bb.remaining()
        })
        val data = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
        data.limit(size)
        bb.position(bb.position() + size)
        if (t == 0x10) { // continuation
          val c = data.duplicate().order(ByteOrder.LITTLE_ENDIAN)
          val off = getOfs(c, sh.ofs); val len = getOfs(c, sh.len)
          blocks = blocks :+ (off, len)
        } else if (t != 0) out += ((t, data))
        read += 1
      }
    }
    out.result()
  }

  private def readObjectHeaderV2(at: At, addr: Long, sh: Shape): Seq[(Int, ByteBuffer)] = {
    val pre = at.bytes(addr, 12)
    pre.getInt // "OHDR"
    val ver = pre.get() & 0xFF
    require(ver == 2, s"OHDR v$ver")
    val flags = pre.get() & 0xFF
    var pos = addr + 6
    if ((flags & 0x20) != 0) pos += 16 // times
    if ((flags & 0x10) != 0) pos += 4  // max compact / min dense
    val sizeLen = 1 << (flags & 0x3)
    val szBuf = at.bytes(pos, sizeLen)
    val chunk0 = sizeLen match {
      case 1 => szBuf.get().toLong & 0xFF
      case 2 => szBuf.getShort.toLong & 0xFFFF
      case 4 => szBuf.getInt.toLong & 0xFFFFFFFFL
      case 8 => szBuf.getLong
    }
    pos += sizeLen
    val trackOrder = (flags & 0x04) != 0
    val out = Seq.newBuilder[(Int, ByteBuffer)]
    // (offset, length, hasSignature)
    var blocks = List((pos, chunk0, false))
    while (blocks.nonEmpty) {
      val (bOff, bLen, sigd) = blocks.head
      blocks = blocks.tail
      val start = if (sigd) bOff + 4 else bOff
      // chunk 0's declared size counts ONLY message data (+ any gap; its
      // checksum sits outside, in the prefix's accounting); a continuation
      // block's length covers the whole block — "OCHK" signature + data +
      // checksum
      val dataLen = (if (sigd) bLen - 8 else bLen).toInt
      // verify the block's trailing lookup3 checksum (chunk 0's covers the
      // whole header from the OHDR signature)
      locally {
        val (from, len) =
          if (sigd) (bOff, bLen.toInt)
          else (addr, (bOff - addr + bLen).toInt + 4)
        val whole = new Array[Byte](len)
        at.bytes(from, len).get(whole)
        val stored = ByteBuffer.wrap(whole, len - 4, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        require(stored == lookup3(whole, 0, len - 4, 0),
          "v2 object header checksum mismatch — corrupt file")
      }
      val bb = at.bytes(start, dataLen)
      val msgHdrLen = if (trackOrder) 6 else 4
      while (bb.remaining() >= msgHdrLen) {
        val t = bb.get() & 0xFF
        val size = bb.getShort & 0xFFFF
        bb.get() // flags
        if (trackOrder) bb.getShort
        if (bb.remaining() < size) { bb.position(bb.limit()) }
        else {
          val data = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
          data.limit(size)
          bb.position(bb.position() + size)
          if (t == 0x10) {
            val c = data.duplicate().order(ByteOrder.LITTLE_ENDIAN)
            val off = getOfs(c, sh.ofs); val len = getOfs(c, sh.len)
            blocks = blocks :+ ((off, len, true))
          } else if (t != 0) out += ((t, data))
        }
      }
    }
    out.result()
  }

  /** Root-group links: symbol-table (old style) or link messages (new). */
  private def collectLinks(at: At, msgs: Seq[(Int, ByteBuffer)], sh: Shape,
                           path: String): Seq[(String, Long)] = {
    msgs.find(_._1 == 0x11) match {
      case Some((_, bb)) => // symbol table: B-tree v1 + local heap
        val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
        val btree = getOfs(b, sh.ofs)
        val heap = getOfs(b, sh.ofs)
        val heapData = {
          val hb = at.bytes(heap, 8 + 1 + 3 + 2 * sh.len + sh.ofs)
          val hsig = new Array[Byte](4); hb.get(hsig)
          require(hsig.sameElements("HEAP".getBytes("US-ASCII")), s"$path: bad local heap")
          hb.get(); hb.get(); hb.get(); hb.get() // version + 3 reserved
          getOfs(hb, sh.len) // data segment size
          getOfs(hb, sh.len) // free list head
          getOfs(hb, sh.ofs) // data segment address
        }
        def heapName(off: Long): String = {
          val bytes = at.bytes(heapData + off, 256)
          val sb = new StringBuilder
          var c = bytes.get()
          while (c != 0) { sb.append(c.toChar); c = bytes.get() }
          sb.toString
        }
        def walk(nodeAddr: Long): Seq[(String, Long)] = {
          val nb = at.bytes(nodeAddr, 4 + 1 + 1 + 2 + 2 * sh.ofs)
          val nsig = new Array[Byte](4); nb.get(nsig)
          require(nsig.sameElements("TREE".getBytes("US-ASCII")), s"$path: bad group B-tree")
          val nodeType = nb.get() & 0xFF
          require(nodeType == 0, s"$path: B-tree node type $nodeType in group tree")
          val level = nb.get() & 0xFF
          val used = nb.getShort & 0xFFFF
          getOfs(nb, sh.ofs); getOfs(nb, sh.ofs) // siblings
          val body = at.bytes(nodeAddr + 4 + 4 + 2 * sh.ofs,
            (used + 1) * sh.len + used * sh.ofs)
          val children = (0 until used).map { _ =>
            getOfs(body, sh.len) // key i
            getOfs(body, sh.ofs) // child i
          }
          if (level > 0) children.flatMap(walk)
          else children.flatMap { snodAddr =>
            val sb = at.bytes(snodAddr, 8)
            val ssig = new Array[Byte](4); sb.get(ssig)
            require(ssig.sameElements("SNOD".getBytes("US-ASCII")), s"$path: bad SNOD")
            sb.get(); sb.get() // version + reserved
            val n = sb.getShort & 0xFFFF
            val entries = at.bytes(snodAddr + 8, n * (2 * sh.ofs + 8 + 16))
            (0 until n).map { _ =>
              val nameOff = getOfs(entries, sh.ofs)
              val hdrAddr = getOfs(entries, sh.ofs)
              entries.position(entries.position() + 8 + 16)
              (heapName(nameOff), hdrAddr)
            }
          }
        }
        walk(btree)
      case None =>
        val links = msgs.filter(_._1 == 0x06).map { case (_, bb) =>
          parseLinkMessage(bb.duplicate().order(ByteOrder.LITTLE_ENDIAN), sh, path)
        }
        if (links.nonEmpty) links
        else msgs.find(_._1 == 0x02) // Link Info: compact-empty or DENSE
          .map { case (_, bb) =>
            val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
            b.get(); val f = b.get() & 0xFF
            if ((f & 1) != 0) b.getLong // max creation index
            val fheap = getOfs(b, sh.ofs)
            val nameBt = getOfs(b, sh.ofs)
            if (fheap == Undef) Seq.empty[(String, Long)]
            else denseLinks(at, sh, fheap, nameBt, path)
          }.getOrElse(Nil)
    }
  }

  /** One Link message (type 0x06) body → (name, object header address).
    * Hard links only; soft/external links fail loudly.
    */
  private def parseLinkMessage(b: ByteBuffer, sh: Shape,
                               path: String): (String, Long) = {
    val ver = b.get() & 0xFF
    require(ver == 1, s"link message v$ver")
    val flags = b.get() & 0xFF
    val linkType = if ((flags & 0x08) != 0) b.get() & 0xFF else 0
    if ((flags & 0x04) != 0) b.getLong // creation order
    if ((flags & 0x10) != 0) b.get()   // charset
    val nameLen = (flags & 0x3) match {
      case 0 => b.get().toLong & 0xFF
      case 1 => b.getShort.toLong & 0xFFFF
      case 2 => b.getInt.toLong & 0xFFFFFFFFL
      case 3 => b.getLong
    }
    val nameBytes = new Array[Byte](nameLen.toInt); b.get(nameBytes)
    require(linkType == 0, s"$path: non-hard link '${new String(nameBytes)}'")
    (new String(nameBytes, "UTF-8"), getOfs(b, sh.ofs))
  }

  /** DENSE group link storage (what libhdf5 switches to past the compact
    * threshold, default 8 links): the link messages live as managed
    * objects in a FRACTAL HEAP, located through the name-index v2 B-tree
    * (record type 5: lookup3 hash of the name + managed heap ID). The
    * walk enumerates every record, resolves each heap ID through the
    * heap's doubling-table direct blocks, and parses the stored link
    * message — iteration only, no by-name lookup needed.
    */
  private def denseLinks(at: At, sh: Shape, fheapAddr: Long, nameBtAddr: Long,
                         path: String): Seq[(String, Long)] = {
    require(nameBtAddr != Undef, s"$path: dense link storage without a name index")
    val heap = parseFractalHeap(at, sh, fheapAddr, path)
    val h = readBt2Header(at, nameBtAddr, sh, path)
    require(h.recType == 5,
      s"$path: name-index v2-B-tree record type ${h.recType} (expected 5)")
    require(h.recordSize == 4 + heap.idLen,
      s"$path: name-index record size ${h.recordSize} != 4 + heap-id ${heap.idLen}")
    val out = Seq.newBuilder[(String, Long)]
    walkBTree2(at, h, sh, path) { eb =>
      eb.getInt // lookup3 hash of the name (enumeration does not need it)
      val msg = heap.readObject(eb, path)
      out += parseLinkMessage(msg, sh, path)
    }
    out.result()
  }

  /** A parsed fractal heap (managed objects, direct blocks): the direct
    * blocks' (heap offset, size, file address) inventory plus the ID
    * field widths. Filtered heaps, huge/tiny IDs, and nested indirect
    * blocks are rejected loudly — link messages are small managed
    * objects in every libhdf5 layout.
    */
  private final class FractalHeapView(blocks: IndexedSeq[(Long, Long, Long)],
                                      offSize: Int, lenSize: Int,
                                      val idLen: Int,
                                      readInto: (Array[Byte], Long) => Unit) {
    /** Resolve one managed heap ID read from `eb` → the object's bytes. */
    def readObject(eb: ByteBuffer, where: String): ByteBuffer = {
      val vt = eb.get() & 0xFF
      require((vt & 0xC0) == 0, s"$where: fractal-heap ID version ${(vt >> 6) & 3}")
      require(((vt >> 4) & 0x3) == 0,
        s"$where: non-managed fractal-heap object (huge/tiny IDs not supported)")
      var off = 0L; var k = 0
      while (k < offSize) { off |= (eb.get() & 0xFFL) << (8 * k); k += 1 }
      var len = 0L; k = 0
      while (k < lenSize) { len |= (eb.get() & 0xFFL) << (8 * k); k += 1 }
      require(len > 0 && len <= Int.MaxValue,
        s"$where: implausible fractal-heap object length $len")
      val bi = blocks.indexWhere(b => off >= b._1 && off + len <= b._1 + b._2)
      require(bi >= 0,
        s"$where: fractal-heap object at offset $off is outside every direct block")
      val (bOff, _, bAddr) = blocks(bi)
      // heap offsets INCLUDE the direct-block header bytes (libhdf5's
      // managed space covers whole blocks), so file position is a plain
      // delta from the block's start
      val raw = new Array[Byte](len.toInt)
      readInto(raw, bAddr + (off - bOff))
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  /** Parse a fractal heap header ("FRHP") + its direct-block inventory:
    * root direct block, or one root indirect block ("FHIB") whose rows
    * are all DIRECT rows (the shapes dense link storage produces —
    * nested indirect blocks reject loudly). Direct-block checksums
    * verified when the heap flags them (stored in-header with the field
    * zeroed during computation, libhdf5's convention).
    */
  private def parseFractalHeap(at: At, sh: Shape, hdrAddr: Long,
                               where: String): FractalHeapView = {
    val hdrLen = 4 + 1 + 2 + 2 + 1 + 4 + sh.len + sh.ofs + sh.len + sh.ofs +
      8 * sh.len + // managed-space/object + huge + tiny statistics
      2 + sh.len + sh.len + 2 + 2 + sh.ofs + 2 + 4
    val hraw = new Array[Byte](hdrLen)
    at.bytes(hdrAddr, hdrLen).get(hraw)
    val hb = ByteBuffer.wrap(hraw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](4); hb.get(sig)
    require(sig.sameElements("FRHP".getBytes("US-ASCII")),
      s"$where: bad fractal-heap header signature")
    require((hb.get() & 0xFF) == 0, s"$where: fractal-heap header version")
    val idLen = hb.getShort & 0xFFFF
    val filterLen = hb.getShort & 0xFFFF
    require(filterLen == 0,
      s"$where: filtered fractal heap not supported (link storage is never filtered)")
    val flags = hb.get() & 0xFF
    val maxManObj = hb.getInt.toLong & 0xFFFFFFFFL
    getOfs(hb, sh.len); getOfs(hb, sh.ofs) // next huge id, huge v2-btree
    getOfs(hb, sh.len); getOfs(hb, sh.ofs) // free space amount, fs manager
    getOfs(hb, sh.len); getOfs(hb, sh.len) // managed space, allocated space
    getOfs(hb, sh.len); getOfs(hb, sh.len) // iterator offset, managed objects
    getOfs(hb, sh.len); getOfs(hb, sh.len) // huge size, huge count
    getOfs(hb, sh.len); getOfs(hb, sh.len) // tiny size, tiny count
    val tableWidth = hb.getShort & 0xFFFF
    val startBlockSize = getOfs(hb, sh.len)
    val maxDirectSize = getOfs(hb, sh.len)
    val maxHeapBits = hb.getShort & 0xFFFF
    hb.getShort // starting rows in root indirect block
    val rootAddr = getOfs(hb, sh.ofs)
    val curRows = hb.getShort & 0xFFFF
    require(hb.getInt == lookup3(hraw, 0, hdrLen - 4, 0),
      s"$where: fractal-heap header checksum mismatch — corrupt file")
    require(tableWidth >= 1 && startBlockSize >= 32 &&
      maxDirectSize >= startBlockSize && maxHeapBits >= 1 && maxHeapBits <= 64,
      s"$where: implausible fractal-heap doubling-table geometry")
    val offSize = (maxHeapBits + 7) / 8
    val lenSize = math.min(
      (63 - java.lang.Long.numberOfLeadingZeros(maxDirectSize) + 7) / 8,
      limitEncSize(maxManObj))
    require(idLen == 1 + offSize + lenSize,
      s"$where: fractal-heap ID length $idLen != 1 + $offSize + $lenSize")
    val checksummed = (flags & 0x02) != 0
    val dblockHdr = 4 + 1 + sh.ofs + offSize + (if (checksummed) 4 else 0)

    def rowBlockSize(row: Int): Long =
      if (row <= 1) startBlockSize else startBlockSize << (row - 1)
    val maxDirectRows =
      (63 - java.lang.Long.numberOfLeadingZeros(maxDirectSize)) -
        (63 - java.lang.Long.numberOfLeadingZeros(startBlockSize)) + 2

    def verifyDirect(addr: Long, expOff: Long, size: Long): Unit = {
      val head = new Array[Byte](dblockHdr)
      at.bytes(addr, dblockHdr).get(head)
      val db = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
      val s4 = new Array[Byte](4); db.get(s4)
      require(s4.sameElements("FHDB".getBytes("US-ASCII")),
        s"$where: bad fractal-heap direct block signature")
      require((db.get() & 0xFF) == 0, s"$where: fractal-heap direct block version")
      require(getOfs(db, sh.ofs) == hdrAddr, s"$where: direct block back-pointer")
      var boff = 0L; var k = 0
      while (k < offSize) { boff |= (db.get() & 0xFFL) << (8 * k); k += 1 }
      require(boff == expOff,
        s"$where: direct block offset $boff != expected $expOff")
      if (checksummed) {
        val stored = db.getInt
        val whole = new Array[Byte](size.toInt)
        at.bytes(addr, size.toInt).get(whole)
        // checksum computed with its own field zeroed (libhdf5 convention)
        java.util.Arrays.fill(whole, dblockHdr - 4, dblockHdr, 0.toByte)
        require(stored == lookup3(whole, 0, size.toInt, 0),
          s"$where: fractal-heap direct block checksum mismatch — corrupt file")
      }
    }

    val blocks = IndexedSeq.newBuilder[(Long, Long, Long)]
    if (rootAddr != Undef) {
      if (curRows == 0) {
        // root IS a direct block of the starting size at heap offset 0
        verifyDirect(rootAddr, 0L, startBlockSize)
        blocks += ((0L, startBlockSize, rootAddr))
      } else {
        require(curRows <= maxDirectRows,
          s"$where: fractal heap with indirect-block rows beyond the direct " +
            "region is not supported (far larger than any link storage)")
        val nEntries = curRows * tableWidth
        val ibLen = 4 + 1 + sh.ofs + offSize + nEntries * sh.ofs + 4
        val iraw = new Array[Byte](ibLen)
        at.bytes(rootAddr, ibLen).get(iraw)
        val ib = ByteBuffer.wrap(iraw).order(ByteOrder.LITTLE_ENDIAN)
        val s4 = new Array[Byte](4); ib.get(s4)
        require(s4.sameElements("FHIB".getBytes("US-ASCII")),
          s"$where: bad fractal-heap indirect block signature")
        require((ib.get() & 0xFF) == 0, s"$where: fractal-heap indirect block version")
        require(getOfs(ib, sh.ofs) == hdrAddr, s"$where: indirect block back-pointer")
        ib.position(ib.position() + offSize) // block offset (root: 0)
        ib.position(ibLen - 4)
        require(ib.getInt == lookup3(iraw, 0, ibLen - 4, 0),
          s"$where: fractal-heap indirect block checksum mismatch — corrupt file")
        ib.position(4 + 1 + sh.ofs + offSize)
        var off = 0L
        (0 until curRows).foreach { row =>
          val size = rowBlockSize(row)
          (0 until tableWidth).foreach { _ =>
            val a = getOfs(ib, sh.ofs)
            if (a != Undef) {
              verifyDirect(a, off, size)
              blocks += ((off, size, a))
            }
            off += size
          }
        }
      }
    }
    new FractalHeapView(blocks.result(), offSize, lenSize, idLen,
      (buf, pos) => at.bytes(pos, buf.length).get(buf))
  }

  private def parseDatatype(bb: ByteBuffer): H5Type = {
    val cv = bb.get() & 0xFF
    val cls = cv & 0x0F
    val bits0 = bb.get() & 0xFF
    bb.get(); bb.get() // bitfields 8-23
    val size = bb.getInt
    cls match {
      case 0 => // fixed-point: bit0 order, bit3 signed
        val bitOff = bb.getShort & 0xFFFF
        val bitPrec = bb.getShort & 0xFFFF
        H5Type(0, size, littleEndian = (bits0 & 1) == 0,
          signed = (bits0 & 0x08) != 0, bitOffset = bitOff, bitPrecision = bitPrec)
      case 1 => // float (IEEE assumed from size)
        bb.getShort; bb.getShort; bb.get(); bb.get(); bb.get(); bb.get(); bb.getInt
        H5Type(1, size, littleEndian = (bits0 & 1) == 0, signed = true)
      case 3 => H5Type(3, size, littleEndian = true, signed = false)
      case 7 => H5Type(7, size, littleEndian = true, signed = false)
      case 9 =>
        val base = parseDatatype(bb)
        H5Type(9, size, littleEndian = true, signed = false, base = Some(base))
      case c => sys.error(s"HDF5 datatype class $c not supported " +
        "(fixed/float/string/reference/vlen only)")
    }
  }

  private def parseDataspace(bb: ByteBuffer, sh: Shape): IndexedSeq[Long] = {
    val ver = bb.get() & 0xFF
    val rank = bb.get() & 0xFF
    val flags = bb.get() & 0xFF
    if (ver == 1) { bb.get(); bb.getInt } // reserved
    else bb.get() // v2: type
    val dims = (0 until rank).map(_ => getOfs(bb, sh.len))
    if ((flags & 1) != 0) (0 until rank).foreach(_ => getOfs(bb, sh.len))
    dims
  }

  /** Decode one scalar/array attribute value from its datatype + raw bytes. */
  private def decodeAttrValue(at: At, sh: Shape, tpe: H5Type,
                              n: Int, data: ByteBuffer): Any = tpe.cls match {
    case 3 =>
      val b = new Array[Byte](tpe.size * math.max(n, 1))
      data.get(b)
      new String(b, "UTF-8").takeWhile(_ != 0)
    case 0 | 1 =>
      val arr = decodeValues(data, tpe, math.max(n, 1))
      if (n <= 1) arr(0) else arr
    case 7 =>
      val refs = (0 until math.max(n, 1)).map(_ => getOfs(data, sh.ofs))
      if (n <= 1) refs.head else refs
    case 9 =>
      // vlen: per element (4 len, O gheap addr, 4 index) → resolve through
      // the global heap; used by DIMENSION_LIST (vlen of object refs)
      val base = tpe.base.get
      (0 until math.max(n, 1)).map { _ =>
        val len = data.getInt
        val addr = getOfs(data, sh.ofs)
        val idx = data.getInt
        val obj = globalHeapObject(at, sh, addr, idx)
        if (base.cls == 7) (0 until len).map(_ => getOfs(obj, sh.ofs))
        else decodeValues(obj, base, len)
      }
    case c => s"<unsupported attr class $c>"
  }

  private def globalHeapObject(at: At, sh: Shape, collAddr: Long, index: Int): ByteBuffer = {
    val head = at.bytes(collAddr, 8 + sh.len)
    val gsig = new Array[Byte](4); head.get(gsig)
    require(gsig.sameElements("GCOL".getBytes("US-ASCII")), "bad global heap")
    head.get(); head.get(); head.get(); head.get() // wait: version + 3 reserved is 4 bytes
    val collSize = getOfs(head, sh.len)
    val body = at.bytes(collAddr + 4 + 4 + sh.len, (collSize - 8 - sh.len).toInt)
    while (body.remaining() >= 8 + sh.len) {
      val idx = body.getShort & 0xFFFF
      body.getShort // refcount
      body.getInt   // reserved
      val size = getOfs(body, sh.len)
      if (idx == index) {
        val out = body.slice().order(ByteOrder.LITTLE_ENDIAN)
        out.limit(size.toInt)
        return out
      }
      if (idx == 0) return ByteBuffer.allocate(0) // free space marker: not found
      val padded = (size + 7) / 8 * 8
      body.position(body.position() + padded.toInt)
    }
    sys.error(s"global heap object $index not found in collection at $collAddr")
  }

  /** Raw numeric values → doubles, honoring endianness and signedness. */
  private def decodeValues(data: ByteBuffer, tpe: H5Type, n: Int): Array[Double] = {
    val bb = data.duplicate().order(
      if (tpe.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    (tpe.cls, tpe.size) match {
      case (1, 4) => while (i < n) { out(i) = bb.getFloat.toDouble; i += 1 }
      case (1, 8) => while (i < n) { out(i) = bb.getDouble; i += 1 }
      case (0, 1) =>
        if (tpe.signed) while (i < n) { out(i) = bb.get().toDouble; i += 1 }
        else while (i < n) { out(i) = (bb.get() & 0xFF).toDouble; i += 1 }
      case (0, 2) =>
        if (tpe.signed) while (i < n) { out(i) = bb.getShort.toDouble; i += 1 }
        else while (i < n) { out(i) = (bb.getShort & 0xFFFF).toDouble; i += 1 }
      case (0, 4) =>
        if (tpe.signed) while (i < n) { out(i) = bb.getInt.toDouble; i += 1 }
        else while (i < n) { out(i) = (bb.getInt.toLong & 0xFFFFFFFFL).toDouble; i += 1 }
      case (0, 8) =>
        if (tpe.signed) while (i < n) { out(i) = bb.getLong.toDouble; i += 1 }
        else while (i < n) {
          val x = bb.getLong
          out(i) = if (x >= 0) x.toDouble else x.toDouble + 1.8446744073709552E19
          i += 1 }
      case (c, s) => sys.error(s"unsupported numeric type class=$c size=$s")
    }
    out
  }

  /** `preParsed` lets the group walk hand over the header it already
    * read for dataset-vs-group classification — one metadata read per
    * object, not two.
    */
  private def parseDataset(at: At, name: String, addr: Long, sh: Shape,
                           path: String,
                           preParsed: Seq[(Int, ByteBuffer)] = null): H5Dataset = {
    val msgs = Option(preParsed).getOrElse(readObjectHeader(at, addr, sh))
    require(!msgs.exists(m => m._1 == 0x11 || m._1 == 0x06 || m._1 == 0x02),
      s"$path: '$name' carries group-link messages — route it through the " +
        "group walk, not the dataset parser")
    val dtype = msgs.find(_._1 == 0x03).map { case (_, bb) =>
      parseDatatype(bb.duplicate().order(ByteOrder.LITTLE_ENDIAN))
    }.getOrElse(sys.error(s"$path: '$name' has no datatype message"))
    val dims = msgs.find(_._1 == 0x01).map { case (_, bb) =>
      parseDataspace(bb.duplicate().order(ByteOrder.LITTLE_ENDIAN), sh)
    }.getOrElse(sys.error(s"$path: '$name' has no dataspace message"))
    require(dims.forall(_ <= Int.MaxValue), s"$path: '$name' dimension exceeds Int range")

    // filter pipeline (v1/v2): deflate/shuffle/fletcher32 are decoded at
    // chunk-read time; any other filter fails loudly here, at open
    val filters = msgs.find(_._1 == 0x0B).map { case (_, bb) =>
      val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      parseFilterPipeline(b, s"$path: '$name'")
    }.getOrElse(IndexedSeq.empty)

    val layout = msgs.find(_._1 == 0x08).map { case (_, bb) =>
      val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get() & 0xFF
      require(ver == 3 || ver == 4, s"$path: '$name' data layout v$ver (v3/v4 only)")
      (b.get() & 0xFF) match {
        case 0 => // compact: identical properties in v3 and v4
          val size = b.getShort & 0xFFFF
          val d = new Array[Byte](size); b.get(d)
          Compact(d)
        case 1 => // contiguous: identical properties in v3 and v4
          val a = getOfs(b, sh.ofs); val size = getOfs(b, sh.len)
          Contiguous(a, size)
        case 2 if ver == 3 =>
          val rank = b.get() & 0xFF // ndims + 1
          val btree = getOfs(b, sh.ofs)
          val cdims = (0 until rank).map(_ => b.getInt)
          val chunkDims = cdims.dropRight(1)
          val chunks =
            if (btree == Undef) IndexedSeq.empty[H5Chunk]
            else walkChunkTree(at, btree, rank, sh, path)
          Chunked(chunkDims, chunks)
        case 2 => // v4 chunked: the "latest"-format chunk indexes
          parseLayoutV4Chunked(at, b, sh, dims.map(_.toInt), dtype,
            filters.nonEmpty, s"$path: '$name'")
        case c => sys.error(s"$path: '$name' layout class $c not supported")
      }
    }.getOrElse(sys.error(s"$path: '$name' has no layout message")) match {
      // every index emits outer-major order already (B-tree keys are
      // sorted, FA/EA/implicit are linear); sort once at open as
      // insurance so the per-slab binary search in copyChunksInto holds
      // for any conforming file
      case Chunked(cd, cs) => Chunked(cd, cs.sortBy(_.offsets.head))
      case other => other
    }

    // attributes: compact (v1/v2/v3 message storage) plus DENSE storage
    // (Attribute Info message 0x15 → attribute bodies as fractal-heap
    // managed objects behind a type-8 name-index v2-B-tree — the layout
    // libhdf5 switches to past ~8 attributes under the latest format).
    // Attributes whose datatype we don't model (REFERENCE_LIST is a
    // compound, for instance — real netCDF-4 dim scales carry it) are
    // skipped rather than failing the whole dataset: none of them feed
    // the CF grid semantics.
    val denseAttrs: Seq[(String, Any)] =
      msgs.find(_._1 == 0x15).toSeq.flatMap { case (_, bb) =>
        val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
        require((b.get() & 0xFF) == 0, s"$path: '$name' attribute-info version")
        val f = b.get() & 0xFF
        if ((f & 1) != 0) b.getShort // max creation index
        val fheap = getOfs(b, sh.ofs)
        val nameBt = getOfs(b, sh.ofs)
        if (fheap == Undef) Nil
        else {
          require(nameBt != Undef,
            s"$path: '$name' dense attribute storage without a name index")
          val heap = parseFractalHeap(at, sh, fheap, path)
          val h = readBt2Header(at, nameBt, sh, path)
          require(h.recType == 8,
            s"$path: '$name' attribute name-index record type ${h.recType} (expected 8)")
          // the record walk below repositions to start + 8 after the heap
          // ID: loud-reject the (theoretical) layouts where that constant
          // is wrong — a heap with maxHeapBits > 56 has idLen > 8, and a
          // type-8 record is exactly heap-id(8) + flags(1) + corder(4) +
          // hash(4) — instead of silently mis-parsing into the flag bytes
          require(heap.idLen <= 8,
            s"$path: '$name' attribute fractal-heap ID length ${heap.idLen} > 8")
          require(h.recordSize == 8 + 1 + 4 + 4,
            s"$path: '$name' attribute name-index record size ${h.recordSize} (expected 17)")
          val out = Seq.newBuilder[(String, Any)]
          walkBTree2(at, h, sh, path) { eb =>
            val start = eb.position()
            val obj = heap.readObject(eb, path)
            eb.position(start + 8) // heap-ID field is 8 bytes, ID may be shorter
            val mflags = eb.get() & 0xFF
            require((mflags & 0x02) == 0,
              s"$path: '$name' shared dense attribute message (not supported)")
            // creation order (4) + name hash (4) follow; the walk
            // repositions per record, so no need to consume them
            scala.util.Try(parseAttribute(at, obj, sh)).toOption.foreach(out += _)
          }
          out.result()
        }
      }
    val attrs = (msgs.filter(_._1 == 0x0C).flatMap { case (_, bb) =>
      scala.util.Try(
        parseAttribute(at, bb.duplicate().order(ByteOrder.LITTLE_ENDIAN), sh)
      ).toOption
    } ++ denseAttrs).toMap

    val isDimScale = attrs.get("CLASS").exists {
      case s: String => s == "DIMENSION_SCALE"; case _ => false }
    val dimRefs = attrs.get("DIMENSION_LIST").collect {
      case els: IndexedSeq[_] =>
        els.map {
          case refs: IndexedSeq[_] if refs.nonEmpty => refs.head.asInstanceOf[Long]
          case _ => Undef
        }
    }
    val fillRaw = msgs.find(_._1 == 0x05).flatMap { case (_, bb) =>
      val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get() & 0xFF
      val size = ver match {
        case 1 => b.get(); b.get(); b.getInt // alloc time, write time, size
        case 2 =>
          b.get(); b.get()
          if ((b.get() & 0xFF) == 1) b.getInt else 0 // defined flag gates size
        case 3 => if ((b.get() & 0x20) != 0) b.getInt else 0
        case _ => 0
      }
      if (size == 0 || dtype.cls > 1 || size < dtype.size) None
      else Some(decodeValues(b, dtype, 1)(0))
    }.orElse(attrs.get("_FillValue").collect { case d: Double => d })

    H5Dataset(name, addr, dtype, dims.map(_.toInt), layout, attrs,
      fillRaw, isDimScale, dimRefs, filters)
  }

  // ---- chunk filter pipeline (deflate / shuffle / fletcher32) ----

  private val DeflateId = 1
  private val ShuffleId = 2
  private val Fletcher32Id = 3
  private val SzipId = 4     // CCSDS-121 extended-Rice (see Szip.scala)
  private val NbitId = 5     // datatype-driven bit packing (NbitScaleOffset.scala)
  private val ScaleOffsetId = 6 // min-subtract / D-scale packing (ditto)

  /** Fixture-writer szip parameters (must match what the chunks were
    * encoded with — the reader rebuilds Szip.Params from this client
    * data): EC + NN + LSB + RAW over the shuffled byte stream as 8-bit
    * samples, 32 pixels/block, 1024 pixels/scanline.
    */
  private[ingest] val SzipCdata: IndexedSeq[Int] = IndexedSeq(
    Szip.Ec | Szip.Nn | Szip.Lsb | Szip.Raw, 8, 32, 1024)
  /** Fixture-writer n-bit precision: 16 significant bits of each 32-bit
    * int (the classic nbit demo shape); offset 0. Rides in BOTH the
    * datatype message (the authority) and the filter client data
    * `[version, class, size, precision, offset, signed]` (cross-checked).
    */
  private[ingest] val NbitPrecision = 16
  private[ingest] def nbitCdata(size: Int, signed: Boolean): IndexedSeq[Int] =
    IndexedSeq(1, 0, size, NbitPrecision, 0, if (signed) 1 else 0)

  /** Fixture-writer scale+offset: D-scale factor 6 for float data (exact
    * for values pre-rounded to 6 decimals — the engine's round6 grid),
    * auto-minbits int packing for fixed-point data. Client data:
    * `[scaleType, scaleFactor]`.
    */
  private[ingest] val DScaleFactor = 6
  private[ingest] def scaleOffsetCdata(isFloat: Boolean): IndexedSeq[Int] =
    if (isFloat) IndexedSeq(ScaleOffset.FloatDScale, DScaleFactor)
    else IndexedSeq(ScaleOffset.IntType, 0)

  private val Lz4Id = 32004  // HDF5 registered filter (hdf5plugin's lz4)
  private val ZstdId = 32015 // HDF5 registered filter (hdf5plugin's zstd)
  private val LzfId = 32000  // HDF5 registered filter (h5py's default lzf)

  private def filterName(id: Int): String = id match {
    case 4 => "szip"; case 5 => "nbit"; case 6 => "scaleoffset"
    case 32000 => "lzf"; case 32004 => "lz4"; case 32015 => "zstd"
    case _ => s"filter $id"
  }

  private val SupportedFilters =
    Set(DeflateId, ShuffleId, Fletcher32Id, SzipId, NbitId, ScaleOffsetId,
      Lz4Id, ZstdId, LzfId)

  /** Parse a Filter Pipeline message (type 0x0B), versions 1 and 2.
    * Only deflate(1)/shuffle(2)/fletcher32(3) — the pipelines netCDF-4
    * files actually carry — are accepted; anything else fails at open
    * with a repack hint rather than at first chunk read.
    */
  private def parseFilterPipeline(b: ByteBuffer, where: String): IndexedSeq[H5Filter] = {
    val ver = b.get() & 0xFF
    require(ver == 1 || ver == 2, s"$where: filter pipeline v$ver (v1/v2 only)")
    val nf = b.get() & 0xFF
    if (ver == 1) { b.getShort; b.getInt } // reserved
    val out = (0 until nf).map { _ =>
      val id = b.getShort & 0xFFFF
      val nameLen =
        if (ver == 2 && id < 256) 0 else b.getShort & 0xFFFF
      val flags = b.getShort & 0xFFFF
      val ncd = b.getShort & 0xFFFF
      if (nameLen > 0) {
        val stored = if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen
        b.position(b.position() + stored)
      }
      val cdata = (0 until ncd).map(_ => b.getInt)
      if (ver == 1 && ncd % 2 == 1) b.getInt // pad to even word count
      H5Filter(id, flags, cdata)
    }
    out.find(f => !SupportedFilters(f.id))
      .foreach { f =>
        sys.error(s"$where: unsupported chunk filter ${filterName(f.id)} " +
          s"(id ${f.id}); deflate/shuffle/fletcher32/szip/nbit/scaleoffset/" +
          "lz4/zstd/lzf are supported — repack with `h5repack -f GZIP=4` " +
          "or nccopy upstream")
      }
    out
  }

  /** HDF5's H5_checksum_fletcher32: big-endian 16-bit words, 16-bit
    * one's-complement-style folds every 360 words, odd trailing byte in
    * the high half. Public algorithm (format spec appendix / RFC 1146
    * family); value stored little-endian after the chunk payload.
    */
  private[ingest] def fletcher32(data: Array[Byte], len: Int): Int = {
    var sum1 = 0L; var sum2 = 0L
    var i = 0
    var remaining = len / 2
    while (remaining > 0) {
      var tlen = math.min(remaining, 360)
      remaining -= tlen
      while (tlen > 0) {
        sum1 += (((data(i) & 0xFF) << 8) | (data(i + 1) & 0xFF)).toLong
        i += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    if (len % 2 == 1) {
      sum1 += ((data(len - 1) & 0xFF) << 8).toLong
      sum2 += sum1
    }
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    // fold once more in case the additions above carried
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    ((sum2 << 16) | sum1).toInt
  }

  private[ingest] def inflateBytes(raw: Array[Byte], where: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 3))
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (!inf.finished() && (inf.needsInput() || inf.needsDictionary()))
          sys.error(s"$where: truncated or invalid deflate chunk stream")
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        sys.error(s"$where: corrupt deflate chunk: ${e.getMessage}")
    } finally inf.end()
  }

  /** HDF5 lz4 plugin framing (registered filter 32004, public layout):
    * 8-byte BE total decompressed size, 4-byte BE block size, then per
    * block a 4-byte BE stored length + payload — LZ4 *block* format, or
    * raw bytes when the stored length equals the uncompressed block
    * length (the plugin's incompressible-block escape).
    */
  private[ingest] def lz4DecodeChunk(raw: Array[Byte], where: String): Array[Byte] = {
    require(raw.length >= 12, s"$where: truncated lz4 chunk header")
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
    val total = bb.getLong
    val blockSize = bb.getInt
    require(total >= 0 && total <= Int.MaxValue && blockSize > 0,
      s"$where: implausible lz4 chunk framing (total=$total block=$blockSize)")
    val out = new Array[Byte](total.toInt)
    val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
    var off = 0
    while (off < total) {
      val n = math.min(blockSize.toLong, total - off).toInt
      val stored = bb.getInt
      if (stored == n) { bb.get(out, off, n) } // incompressible escape
      else {
        val src = new Array[Byte](stored); bb.get(src)
        dec.decompress(src, 0, out, off, n)
      }
      off += n
    }
    out
  }

  private[ingest] def lz4EncodeChunk(raw: Array[Byte], blockSize0: Int = 1 << 20): Array[Byte] = {
    val blockSize = math.max(1, math.min(blockSize0, math.max(raw.length, 1)))
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val outBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val hdr = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
    hdr.putLong(raw.length.toLong).putInt(blockSize)
    outBuf.write(hdr.array())
    var off = 0
    while (off < raw.length) {
      val n = math.min(blockSize, raw.length - off)
      val dst = new Array[Byte](comp.maxCompressedLength(n))
      val m = comp.compress(raw, off, n, dst, 0, dst.length)
      val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      if (m >= n) { // incompressible: store raw, per the plugin's escape
        len.putInt(n); outBuf.write(len.array()); outBuf.write(raw, off, n)
      } else {
        len.putInt(m); outBuf.write(len.array()); outBuf.write(dst, 0, m)
      }
      off += n
    }
    outBuf.toByteArray
  }

  /** LZF decode (libLZF stream format, public domain — what h5py's
    * default `compression='lzf'` stores): control byte < 32 → literal run
    * of ctrl+1 bytes; else a back-reference of length (ctrl>>5)+2 (7 ⇒
    * extended length byte) at distance ((ctrl&0x1f)<<8 | next)+1.
    * Overlapping copies are byte-serial per the format.
    */
  private[ingest] def lzfDecompress(in: Array[Byte], outLen: Int,
                                    where: String): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0; var o = 0
    while (i < in.length) {
      val ctrl = in(i) & 0xFF; i += 1
      if (ctrl < 32) {
        val n = ctrl + 1
        require(i + n <= in.length && o + n <= outLen,
          s"$where: corrupt lzf literal run")
        System.arraycopy(in, i, out, o, n); i += n; o += n
      } else {
        var len = ctrl >> 5
        if (len == 7) {
          require(i < in.length, s"$where: truncated lzf length"); len += in(i) & 0xFF; i += 1
        }
        len += 2
        require(i < in.length, s"$where: truncated lzf reference")
        val ref = o - (((ctrl & 0x1F) << 8) | (in(i) & 0xFF)) - 1; i += 1
        require(ref >= 0 && o + len <= outLen,
          s"$where: corrupt lzf back-reference")
        var k = 0
        while (k < len) { out(o + k) = out(ref + k); k += 1 }
        o += len
      }
    }
    require(o == outLen, s"$where: lzf stream decoded $o of $outLen bytes")
    out
  }

  /** Greedy libLZF-style compressor (3-byte hash, max distance 8192, max
    * match 264). Returns None when no gain — the h5py filter's behavior,
    * which then stores the chunk with this filter's mask bit set.
    */
  private[ingest] def lzfCompress(in: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(in.length + in.length / 16 + 16)
    val table = new Array[Int](1 << 14); java.util.Arrays.fill(table, -1)
    def hash(p: Int): Int =
      (((in(p) & 0xFF) << 16 | (in(p + 1) & 0xFF) << 8 | (in(p + 2) & 0xFF)) * 2654435761L >>> 18).toInt & (table.length - 1)
    var litStart = 0
    def flushLiterals(upTo: Int): Unit = {
      var s = litStart
      while (s < upTo) {
        val n = math.min(32, upTo - s)
        out.write(n - 1); out.write(in, s, n); s += n
      }
      litStart = upTo
    }
    var p = 0
    while (p + 2 < in.length) {
      val h = hash(p)
      val cand = table(h); table(h) = p
      val dist = p - cand
      if (cand >= 0 && dist <= 8192 &&
          in(cand) == in(p) && in(cand + 1) == in(p + 1) && in(cand + 2) == in(p + 2)) {
        var len = 3
        val maxLen = math.min(264, in.length - p)
        while (len < maxLen && in(cand + len) == in(p + len)) len += 1
        flushLiterals(p)
        val lenCode = len - 2
        val d = dist - 1
        if (lenCode < 7) out.write((lenCode << 5) | (d >> 8))
        else { out.write((7 << 5) | (d >> 8)); out.write(lenCode - 7) }
        out.write(d & 0xFF)
        p += len; litStart = p
      } else p += 1
    }
    flushLiterals(in.length)
    val res = out.toByteArray
    if (res.length >= in.length && in.length > 0) None else Some(res)
  }

  private[ingest] def zstdDecodeChunk(raw: Array[Byte], where: String): Array[Byte] = {
    // getFrameContentSize returns 0 both for a genuinely-empty frame and
    // for a streaming-written frame with no recorded content size; a
    // nonempty chunk claiming 0 decoded bytes is the latter → stream it
    val sz = com.github.luben.zstd.Zstd.getFrameContentSize(raw)
    if (sz > 0 && sz <= Int.MaxValue)
      com.github.luben.zstd.Zstd.decompress(raw, sz.toInt)
    else { // frame without a recorded content size: stream it
      val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(raw))
      try {
        val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 3))
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }
  }

  /** Inverse of the shuffle filter: stored bytes are all byte-0s of every
    * element, then all byte-1s, …; trailing bytes of a non-multiple
    * length pass through untouched (as libhdf5 leaves them).
    */
  private[ingest] def unshuffleBytes(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1 || raw.length < elemSize) return raw
    val n = raw.length / elemSize
    val out = new Array[Byte](raw.length)
    var i = 0
    while (i < elemSize) {
      var j = 0
      val base = i * n
      while (j < n) {
        out(j * elemSize + i) = raw(base + j)
        j += 1
      }
      i += 1
    }
    val tail = n * elemSize
    System.arraycopy(raw, tail, out, tail, raw.length - tail)
    out
  }

  /** Forward shuffle: gather byte i of every element, in element order. */
  private[ingest] def shuffleBytes(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1 || raw.length < elemSize) return raw
    val n = raw.length / elemSize
    val out = new Array[Byte](raw.length)
    var i = 0
    while (i < elemSize) {
      var j = 0
      val base = i * n
      while (j < n) {
        out(base + j) = raw(j * elemSize + i)
        j += 1
      }
      i += 1
    }
    val tail = n * elemSize
    System.arraycopy(raw, tail, out, tail, raw.length - tail)
    out
  }

  /** Writer-side pipeline application: shuffle → codec(level) →
    * fletcher32 checksum appended little-endian. `codec` is "zlib"
    * (deflate), "lz4" (HDF5 plugin framing), "zstd", or "lzf". Returns
    * the stored bytes plus the chunk's filter MASK: lzf skips itself on
    * incompressible chunks (mask bit 1 set — h5py's filter behavior),
    * every other codec always applies.
    */
  private[ingest] def storedChunkPipeline(raw: Array[Byte], elemSize: Int,
                                          level: Int,
                                          codec: String,
                                          signed: Boolean = true,
                                          isFloat: Boolean = false): (Array[Byte], Int) = {
    // the datatype-aware filters pack whole elements — byte-shuffling
    // first would destroy the bit layout they depend on, so their
    // pipeline is [codec, fletcher32] with no shuffle stage
    val shuffled =
      if (codec == "nbit" || codec == "scaleoffset") raw
      else shuffleBytes(raw, elemSize)
    val (compressed, mask) = codec match {
      case "zlib" =>
        val defl = new java.util.zip.Deflater(level)
        val c = try {
          defl.setInput(shuffled); defl.finish()
          val out = new java.io.ByteArrayOutputStream(math.max(64, shuffled.length / 2))
          val buf = new Array[Byte](1 << 16)
          while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
          out.toByteArray
        } finally defl.end()
        (c, 0)
      case "lz4" => (lz4EncodeChunk(shuffled), 0)
      case "zstd" => (com.github.luben.zstd.Zstd.compress(shuffled, level), 0)
      case "lzf" => lzfCompress(shuffled) match {
        case Some(c) => (c, 0)
        case None => (shuffled, 2) // bit 1: pipeline filter [shuffle,LZF,fletcher]
      }
      case "nbit" =>
        (Nbit.encode(shuffled, elemSize, NbitPrecision, 0, signed,
          "nbit chunk"), 0)
      case "scaleoffset" =>
        val cd = scaleOffsetCdata(isFloat)
        (ScaleOffset.encode(shuffled,
          ScaleOffset.Params(cd(0), cd(1), elemSize, signed, isFloat),
          "scaleoffset chunk"), 0)
      case "szip" =>
        // H5Zszip framing: 4-byte LE original size, then the raw CCSDS
        // bitstream; parameters must equal the pipeline message's cdata
        // (SzipCdata — the reader rebuilds Params from there)
        val body = Szip.encode(shuffled,
          Szip.Params(SzipCdata(0), SzipCdata(1), SzipCdata(2), SzipCdata(3)))
        val out = new Array[Byte](4 + body.length)
        out(0) = shuffled.length.toByte
        out(1) = (shuffled.length >>> 8).toByte
        out(2) = (shuffled.length >>> 16).toByte
        out(3) = (shuffled.length >>> 24).toByte
        System.arraycopy(body, 0, out, 4, body.length)
        (out, 0)
      case c => sys.error(
        s"unknown chunk codec '$c' (zlib/lz4/zstd/lzf/szip/nbit/scaleoffset)")
    }
    (appendFletcher(compressed), mask)
  }

  private def appendFletcher(compressed: Array[Byte]): Array[Byte] = {
    val ck = fletcher32(compressed, compressed.length)
    val out = java.util.Arrays.copyOf(compressed, compressed.length + 4)
    out(compressed.length) = ck.toByte
    out(compressed.length + 1) = (ck >>> 8).toByte
    out(compressed.length + 2) = (ck >>> 16).toByte
    out(compressed.length + 3) = (ck >>> 24).toByte
    out
  }

  private[ingest] def storedChunkBytes(raw: Array[Byte], elemSize: Int,
                                       level: Int,
                                       codec: String = "zlib"): Array[Byte] =
    storedChunkPipeline(raw, elemSize, level, codec)._1

  /** Read one chunk's stored bytes and run the filter pipeline backwards
    * (skipping entries this chunk's mask bit excludes): verify+strip
    * fletcher32, inflate, unshuffle — then decode to doubles. A full
    * chunk's worth of values comes back even at dataset edges (HDF5
    * stores edge chunks full-size).
    */
  /** Elements of one (full-size) chunk — HDF5 stores edge chunks full-size,
    * so every decode that cannot infer its output length (lzf, nbit,
    * scaleoffset) reconstructs exactly this many elements.
    */
  private def fullChunkElems(v: H5Dataset): Int = v.layout match {
    case Chunked(cdims, _) =>
      val n = cdims.map(_.toLong).product
      require(n > 0 && n <= Int.MaxValue / v.dtype.size,
        s"${v.name}: chunk of $n elements out of range")
      n.toInt
    case _ => sys.error(s"${v.name}: sized filter outside a chunked layout")
  }

  private def chunkValues(at: At, v: H5Dataset, c: H5Chunk): Array[Double] = {
    var raw = {
      val bb = at.bytes(c.addr, c.size)
      val a = new Array[Byte](c.size); bb.get(a); a
    }
    var i = v.filters.length - 1
    while (i >= 0) {
      val f = v.filters(i)
      if ((c.mask & (1 << i)) == 0) f.id match {
        case Fletcher32Id =>
          require(raw.length >= 4, s"${v.name}: fletcher32 chunk under 4 bytes")
          val payload = raw.length - 4
          val stored = ((raw(payload) & 0xFF)) | ((raw(payload + 1) & 0xFF) << 8) |
            ((raw(payload + 2) & 0xFF) << 16) | ((raw(payload + 3) & 0xFF) << 24)
          val computed = fletcher32(raw, payload)
          // pre-1.6.3 libhdf5 wrote the checksum byte-swapped; accept both
          require(stored == computed || stored == Integer.reverseBytes(computed),
            f"${v.name}: fletcher32 mismatch on chunk at ${c.addr}%d " +
              f"(stored 0x$stored%08x, computed 0x$computed%08x) — corrupt data")
          raw = java.util.Arrays.copyOf(raw, payload)
        case DeflateId =>
          raw = inflateBytes(raw, v.name)
        case Lz4Id =>
          raw = lz4DecodeChunk(raw, v.name)
        case ZstdId =>
          raw = zstdDecodeChunk(raw, v.name)
        case LzfId =>
          // lzf streams carry no size header; the decompressed size is
          // the full chunk byte count (HDF5 stores edge chunks full-size)
          val full = v.layout match {
            case Chunked(cdims, _) => cdims.map(_.toLong).product * v.dtype.size
            case _ => sys.error(s"${v.name}: lzf filter outside a chunked layout")
          }
          require(full <= Int.MaxValue, s"${v.name}: lzf chunk over 2 GiB")
          raw = lzfDecompress(raw, full.toInt, v.name)
        case SzipId =>
          // H5Zszip.c prepends the original byte count as 4 LE bytes,
          // then the raw (headerless) CCSDS-121 bitstream; parameters
          // ride in the filter's client data
          require(f.cdata.length >= 4,
            s"${v.name}: szip filter with ${f.cdata.length} client-data words (need 4)")
          require(raw.length >= 4, s"${v.name}: szip chunk under 4 bytes")
          val orig = ((raw(0) & 0xFF)) | ((raw(1) & 0xFF) << 8) |
            ((raw(2) & 0xFF) << 16) | ((raw(3) & 0xFF) << 24)
          require(orig >= 0, s"${v.name}: szip chunk claims negative size")
          val p = Szip.Params(f.cdata(0), f.cdata(1), f.cdata(2), f.cdata(3))
          raw = Szip.decode(
            java.util.Arrays.copyOfRange(raw, 4, raw.length), orig, p, v.name)
        case NbitId =>
          // the DATATYPE message is the authority for precision/offset
          // (that is the filter's documented contract); the client data
          // this writer stores is cross-checked when present
          require(v.dtype.cls == 0,
            s"${v.name}: nbit on a non-fixed-point datatype (class ${v.dtype.cls})")
          val prec = v.dtype.precisionBits
          if (f.cdata.length >= 6)
            require(f.cdata(3) == prec && f.cdata(4) == v.dtype.bitOffset,
              s"${v.name}: nbit client data (${f.cdata(3)}/${f.cdata(4)}) " +
                s"contradicts the datatype ($prec/${v.dtype.bitOffset})")
          raw = Nbit.decode(raw, fullChunkElems(v), v.dtype.size, prec,
            v.dtype.bitOffset, v.dtype.signed, v.name)
        case ScaleOffsetId =>
          require(f.cdata.length >= 2,
            s"${v.name}: scaleoffset filter with ${f.cdata.length} client-data words (need 2)")
          val p = ScaleOffset.Params(f.cdata(0), f.cdata(1), v.dtype.size,
            signed = v.dtype.signed, isFloat = v.dtype.cls == 1)
          raw = ScaleOffset.decode(raw, fullChunkElems(v), p, v.name)
        case ShuffleId =>
          raw = unshuffleBytes(raw, f.cdata.headOption.getOrElse(v.dtype.size))
        case other =>
          sys.error(s"${v.name}: unsupported chunk filter id $other") // unreachable: gated at parse
      }
      i -= 1
    }
    require(raw.length % v.dtype.size == 0,
      s"${v.name}: decoded chunk is ${raw.length} bytes, not a multiple of element size ${v.dtype.size}")
    decodeValues(ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN),
      v.dtype, raw.length / v.dtype.size)
  }

  private def parseAttribute(at: At, b: ByteBuffer, sh: Shape): (String, Any) = {
    val ver = b.get() & 0xFF
    val flags = b.get() & 0xFF // v1: reserved (0)
    val nameSize = b.getShort & 0xFFFF
    val dtSize = b.getShort & 0xFFFF
    val dsSize = b.getShort & 0xFFFF
    if (ver == 3) b.get() // name character-set encoding
    require(ver == 1 || (flags & 0x3) == 0,
      "shared attribute datatype/dataspace not supported")
    def pad8(n: Int): Int = if (ver == 1) (n + 7) / 8 * 8 else n
    val nameB = new Array[Byte](pad8(nameSize)); b.get(nameB)
    val name = new String(nameB, 0, nameSize, "UTF-8").takeWhile(_ != 0)
    val dtB = b.slice().order(ByteOrder.LITTLE_ENDIAN); dtB.limit(pad8(dtSize))
    b.position(b.position() + pad8(dtSize))
    val dsB = b.slice().order(ByteOrder.LITTLE_ENDIAN); dsB.limit(pad8(dsSize))
    b.position(b.position() + pad8(dsSize))
    val tpe = parseDatatype(dtB)
    val dims = parseDataspace(dsB, sh)
    val n = if (dims.isEmpty) 1 else dims.product.toInt
    val data = b.slice().order(ByteOrder.LITTLE_ENDIAN)
    name -> decodeAttrValue(at, sh, tpe, n, data)
  }

  private def walkChunkTree(at: At, nodeAddr: Long, rank: Int, sh: Shape,
                            path: String): IndexedSeq[H5Chunk] = {
    val nb = at.bytes(nodeAddr, 4 + 1 + 1 + 2 + 2 * sh.ofs)
    val sig = new Array[Byte](4); nb.get(sig)
    require(sig.sameElements("TREE".getBytes("US-ASCII")), s"$path: bad chunk B-tree")
    val nodeType = nb.get() & 0xFF
    require(nodeType == 1, s"$path: B-tree node type $nodeType in chunk tree")
    val level = nb.get() & 0xFF
    val used = nb.getShort & 0xFFFF
    getOfs(nb, sh.ofs); getOfs(nb, sh.ofs)
    val keySize = 4 + 4 + 8 * rank
    val body = at.bytes(nodeAddr + 4 + 4 + 2 * sh.ofs,
      (used + 1) * keySize + used * sh.ofs)
    val out = IndexedSeq.newBuilder[H5Chunk]
    var i = 0
    while (i < used) {
      val size = body.getInt
      val mask = body.getInt // filter mask: bit i set ⇒ pipeline filter i skipped
      val offs = (0 until rank).map(_ => body.getLong)
      val child = getOfs(body, sh.ofs)
      if (level > 0) out ++= walkChunkTree(at, child, rank, sh, path)
      else out += H5Chunk(offs.dropRight(1), child, size, mask)
      i += 1
    }
    out.result()
  }

  // ---- version-4 data layout ("latest" file format chunk indexes) ----

  /** Jenkins lookup3 `hashlittle` — HDF5's metadata checksum
    * (H5_checksum_metadata), trailing every latest-format structure.
    * Public-domain algorithm; little-endian word reads.
    */
  private[ingest] def lookup3(data: Array[Byte], off0: Int, len0: Int,
                              init: Int): Int = {
    var a = 0xdeadbeef + len0 + init
    var b = a; var c = a
    var off = off0; var len = len0
    def word(i: Int, n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) { v |= (data(i + k) & 0xFF) << (8 * k); k += 1 }
      v
    }
    while (len > 12) {
      a += word(off, 4); b += word(off + 4, 4); c += word(off + 8, 4)
      a -= c; a ^= Integer.rotateLeft(c, 4); c += b
      b -= a; b ^= Integer.rotateLeft(a, 6); a += c
      c -= b; c ^= Integer.rotateLeft(b, 8); b += a
      a -= c; a ^= Integer.rotateLeft(c, 16); c += b
      b -= a; b ^= Integer.rotateLeft(a, 19); a += c
      c -= b; c ^= Integer.rotateLeft(b, 4); b += a
      off += 12; len -= 12
    }
    if (len > 0) {
      a += word(off, math.min(len, 4))
      if (len > 4) b += word(off + 4, math.min(len - 4, 4))
      if (len > 8) c += word(off + 8, math.min(len - 8, 4))
      c ^= b; c -= Integer.rotateLeft(b, 14)
      a ^= c; a -= Integer.rotateLeft(c, 11)
      b ^= a; b -= Integer.rotateLeft(a, 25)
      c ^= b; c -= Integer.rotateLeft(b, 16)
      a ^= c; a -= Integer.rotateLeft(c, 4)
      b ^= a; b -= Integer.rotateLeft(a, 14)
      c ^= b; c -= Integer.rotateLeft(b, 24)
    }
    c
  }

  /** Chunk-grid decomposition: linear chunk index → element offsets, in
    * the canonical row-major chunk order latest-format indexes use.
    */
  private def chunkOffsetsOf(idx: Long, dims: IndexedSeq[Int],
                             cdims: IndexedSeq[Int]): IndexedSeq[Long] = {
    val nPer = dims.indices.map(d => (dims(d).toLong + cdims(d) - 1) / cdims(d))
    var rem = idx
    val out = new Array[Long](dims.length)
    var d = dims.length - 1
    while (d >= 0) {
      out(d) = (rem % nPer(d)) * cdims(d)
      rem /= nPer(d)
      d -= 1
    }
    out.toIndexedSeq
  }

  /** Version-4 chunked layout (the HDF5 1.10+ "latest" format h5py's
    * `libver='latest'` writes): Single Chunk, Implicit, and Fixed Array
    * chunk indexes. Extensible Array / v2 B-tree (unlimited-dimension
    * datasets) fail loudly with a repack hint.
    *
    * Defensive on the dimensionality field: libhdf5 historically carries
    * the element-size pseudo-dimension alongside the dataset rank, so a
    * rank-N or rank-N+1 encoding both resolve (the trailing element-size
    * entry is dropped when present).
    */
  private def parseLayoutV4Chunked(at: At, b: ByteBuffer, sh: Shape,
                                   dims: IndexedSeq[Int], dtype: H5Type,
                                   filtered: Boolean, where: String): H5Layout = {
    val flags = b.get() & 0xFF
    val nd = b.get() & 0xFF
    val encLen = b.get() & 0xFF
    def dimVal(): Long = encLen match {
      case 1 => (b.get() & 0xFF).toLong
      case 2 => (b.getShort & 0xFFFF).toLong
      case 4 => b.getInt.toLong & 0xFFFFFFFFL
      case 8 => b.getLong
      case n => sys.error(s"$where: v4 layout dim-size width $n")
    }
    val rawDims = (0 until nd).map(_ => dimVal())
    val cdims: IndexedSeq[Int] =
      if (nd == dims.length) rawDims.map(_.toInt)
      else if (nd == dims.length + 1) rawDims.dropRight(1).map(_.toInt)
      else sys.error(s"$where: v4 chunk rank $nd vs dataset rank ${dims.length}")
    val elemBytes = cdims.map(_.toLong).product * dtype.size
    require(elemBytes <= Int.MaxValue, s"$where: chunk over 2 GiB")
    val nChunks = dims.indices
      .map(d => (dims(d).toLong + cdims(d) - 1) / cdims(d)).product
    // flag bit 0 = H5D_CHUNK_DONT_FILTER_PARTIAL_BOUND_CHUNKS
    // (H5Pset_chunk_opts): partial edge chunks are stored RAW with no
    // filter-mask record in the index — mark them skip-all-filters here
    // so the defilter path leaves their bytes untouched
    val rawEdgeChunks = (flags & 0x01) != 0
    def isEdge(c: H5Chunk): Boolean =
      dims.indices.exists(d => c.offsets(d) + cdims(d) > dims(d))
    def withEdgeMasks(l: H5Layout): H5Layout = l match {
      case Chunked(cd, cs) if rawEdgeChunks && filtered =>
        Chunked(cd, cs.map(c => if (isEdge(c)) c.copy(mask = -1) else c))
      case other => other
    }
    withEdgeMasks((b.get() & 0xFF) match {
      case 1 => // Single Chunk
        val (size, mask) =
          if ((flags & 0x02) != 0) (getOfs(b, sh.len).toInt, b.getInt)
          else (elemBytes.toInt, 0)
        val addr = getOfs(b, sh.ofs)
        val chunks =
          if (addr == Undef) IndexedSeq.empty[H5Chunk]
          else IndexedSeq(H5Chunk(IndexedSeq.fill(dims.length)(0L), addr, size, mask))
        Chunked(cdims, chunks)
      case 2 => // Implicit: early-allocated contiguous chunk array, no filters
        require(!filtered, s"$where: implicit chunk index cannot carry filters")
        val addr = getOfs(b, sh.ofs)
        val chunks =
          if (addr == Undef) IndexedSeq.empty[H5Chunk]
          else (0L until nChunks).map(i => H5Chunk(chunkOffsetsOf(i, dims, cdims),
            addr + i * elemBytes, elemBytes.toInt))
        Chunked(cdims, chunks)
      case 3 => // Fixed Array
        b.get() // page bits (the header repeats them authoritatively)
        val addr = getOfs(b, sh.ofs)
        val chunks =
          if (addr == Undef) IndexedSeq.empty[H5Chunk]
          else readFixedArrayChunks(at, addr, sh, dims, cdims,
            elemBytes.toInt, where)
        Chunked(cdims, chunks)
      case 4 => // Extensible Array (latest-format unlimited dimension)
        // 5×1-byte creation params (max-bits, index-elmts, min-ptrs,
        // min-elmts, page-bits) repeated here; the header is authoritative
        b.position(b.position() + 5)
        val addr = getOfs(b, sh.ofs)
        val chunks =
          if (addr == Undef) IndexedSeq.empty[H5Chunk]
          else readExtensibleArrayChunks(at, addr, sh, dims, cdims,
            elemBytes.toInt, where)
        Chunked(cdims, chunks)
      case 5 => // Version 2 B-tree (multi-unlimited-dimension datasets)
        b.getInt // node size (the header repeats it authoritatively)
        b.get(); b.get() // split / merge percents
        val addr = getOfs(b, sh.ofs)
        val chunks =
          if (addr == Undef) IndexedSeq.empty[H5Chunk]
          else readBTree2Chunks(at, addr, sh, dims, cdims,
            elemBytes.toInt, filtered, where)
        Chunked(cdims, chunks)
      case t => sys.error(s"$where: unknown v4 chunk index type $t")
    })
  }

  /** Read every allocated chunk out of a Fixed Array index: "FAHD"
    * header → "FADB" data block, unpaged or paged (page bitmap + per-page
    * checksummed element pages). All checksums verified (lookup3).
    * Elements: client 0 = address; client 1 (filtered) = address +
    * chunk-size (entrySize − offsetSize − 4 bytes) + filter mask.
    */
  private def readFixedArrayChunks(at: At, hdrAddr: Long, sh: Shape,
                                   dims: IndexedSeq[Int], cdims: IndexedSeq[Int],
                                   rawChunkBytes: Int,
                                   where: String): IndexedSeq[H5Chunk] = {
    val hdrLen = 4 + 1 + 1 + 1 + 1 + sh.len + sh.ofs + 4
    val hraw = new Array[Byte](hdrLen)
    at.bytes(hdrAddr, hdrLen).get(hraw)
    val hb = ByteBuffer.wrap(hraw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](4); hb.get(sig)
    require(sig.sameElements("FAHD".getBytes("US-ASCII")),
      s"$where: bad fixed-array header signature")
    val ver = hb.get() & 0xFF
    require(ver == 0, s"$where: fixed-array header v$ver")
    val clientId = hb.get() & 0xFF
    require(clientId == 0 || clientId == 1,
      s"$where: fixed-array client $clientId (chunks expected)")
    val entrySize = hb.get() & 0xFF
    val pageBits = hb.get() & 0xFF
    val nelems = getOfs(hb, sh.len)
    val dbAddr = getOfs(hb, sh.ofs)
    val hck = hb.getInt
    require(hck == lookup3(hraw, 0, hdrLen - 4, 0),
      s"$where: fixed-array header checksum mismatch — corrupt file")
    // sanity-bound file-supplied geometry before any size arithmetic: a
    // corrupt pageBits would shift out of Long range, a short filtered
    // entry would make the chunk-size byte count negative
    require(pageBits >= 1 && pageBits <= 31,
      s"$where: implausible fixed-array page bits $pageBits")
    require(entrySize >= sh.ofs + (if (clientId == 1) 5 else 0) &&
      nelems * entrySize <= Int.MaxValue.toLong,
      s"$where: implausible fixed-array entry size $entrySize × $nelems")
    if (dbAddr == Undef || nelems == 0) return IndexedSeq.empty

    val pageElems = 1L << pageBits
    val paged = nelems > pageElems
    val npages = if (paged) ((nelems + pageElems - 1) / pageElems).toInt else 0
    val bitmapBytes = if (paged) (npages + 7) / 8 else 0
    val prefixLen = 4 + 1 + 1 + sh.ofs
    val blockLen = prefixLen + bitmapBytes +
      (if (paged) 0 else (nelems * entrySize).toInt) + 4
    val braw = new Array[Byte](blockLen)
    at.bytes(dbAddr, blockLen).get(braw)
    val db = ByteBuffer.wrap(braw).order(ByteOrder.LITTLE_ENDIAN)
    val bsig = new Array[Byte](4); db.get(bsig)
    require(bsig.sameElements("FADB".getBytes("US-ASCII")),
      s"$where: bad fixed-array data block signature")
    require((db.get() & 0xFF) == 0, s"$where: fixed-array data block version")
    require((db.get() & 0xFF) == clientId, s"$where: fixed-array client mismatch")
    require(getOfs(db, sh.ofs) == hdrAddr, s"$where: fixed-array back-pointer")
    db.position(blockLen - 4)
    require(db.getInt == lookup3(braw, 0, blockLen - 4, 0),
      s"$where: fixed-array data block checksum mismatch — corrupt file")

    val out = IndexedSeq.newBuilder[H5Chunk]
    def readElems(eb: ByteBuffer, first: Long, count: Int): Unit = {
      var i = 0
      while (i < count) {
        val addr = getOfs(eb, sh.ofs)
        val (size, mask) =
          if (clientId == 1) {
            val szBytes = entrySize - sh.ofs - 4
            var sz = 0L; var k = 0
            while (k < szBytes) { sz |= (eb.get() & 0xFFL) << (8 * k); k += 1 }
            (sz.toInt, eb.getInt)
          } else (rawChunkBytes, 0)
        if (addr != Undef)
          out += H5Chunk(chunkOffsetsOf(first + i, dims, cdims), addr, size, mask)
        i += 1
      }
    }
    if (!paged) {
      db.position(prefixLen)
      readElems(db, 0L, nelems.toInt)
    } else {
      val bitmap = java.util.Arrays.copyOfRange(braw, prefixLen, prefixLen + bitmapBytes)
      var pagesOff = dbAddr + blockLen
      var p = 0
      while (p < npages) {
        val count = math.min(pageElems, nelems - p * pageElems).toInt
        val pageLen = count * entrySize + 4
        if ((bitmap(p / 8) & (1 << (p % 8))) != 0) {
          val praw = new Array[Byte](pageLen)
          at.bytes(pagesOff, pageLen).get(praw)
          val pb = ByteBuffer.wrap(praw).order(ByteOrder.LITTLE_ENDIAN)
          pb.position(pageLen - 4)
          require(pb.getInt == lookup3(praw, 0, pageLen - 4, 0),
            s"$where: fixed-array page $p checksum mismatch — corrupt file")
          pb.position(0)
          readElems(pb, p.toLong * pageElems, count)
        }
        pagesOff += pageLen
        p += 1
      }
    }
    out.result()
  }

  /** Extensible-array geometry (shared by reader and fixture writer):
    * super block `u` has `2^(u/2)` data blocks of `2^((u+1)/2) ×
    * dataBlkMinElmts` elements; the index block stores the first
    * `idxBlkElmts` elements inline plus the data-block pointers of the
    * first `2·log2(supBlkMinDataPtrs)` super blocks.
    */
  private[ingest] final case class EaParams(maxNelmtsBits: Int = 32,
                                            idxBlkElmts: Int = 4,
                                            dataBlkMinElmts: Int = 16,
                                            supBlkMinDataPtrs: Int = 4,
                                            maxDblkPageNelmtsBits: Int = 10) {
    require(Integer.bitCount(dataBlkMinElmts) == 1 &&
      Integer.bitCount(supBlkMinDataPtrs) == 1, "EA params are powers of two")
    val nsblksTotal: Int =
      1 + (maxNelmtsBits - Integer.numberOfTrailingZeros(dataBlkMinElmts)) / 2
    /** (ndblks, dblkNelmts, startIdx, startDblk) per super block. */
    val sblkInfo: IndexedSeq[(Int, Long, Long, Long)] = {
      var startIdx = 0L; var startDblk = 0L
      (0 until nsblksTotal).map { u =>
        val nd = 1 << (u / 2)
        val ne = (1L << ((u + 1) / 2)) * dataBlkMinElmts
        val r = (nd, ne, startIdx, startDblk)
        startIdx += nd * ne; startDblk += nd
        r
      }
    }
    val iblockNsblks: Int =
      math.min(nsblksTotal,
        2 * Integer.numberOfTrailingZeros(supBlkMinDataPtrs))
    val ndblkAddrs: Int =
      (0 until iblockNsblks).map(sblkInfo(_)._1).sum
    val nsblkAddrs: Int = nsblksTotal - iblockNsblks
    val pageNelmts: Long = 1L << maxDblkPageNelmtsBits
    val arrOffSize: Int = (maxNelmtsBits + 7) / 8
    /** Super block owning data block `j` of the direct (index-block) zone. */
    def directOwner(j: Long): Int = {
      var u = 0
      while (u < iblockNsblks - 1 &&
        j >= sblkInfo(u)._4 + sblkInfo(u)._1) u += 1
      u
    }
  }

  /** Read every allocated chunk out of an Extensible Array index — the
    * latest-format index libhdf5 uses for chunked datasets with ONE
    * unlimited dimension (the netCDF-4 time-unlimited case): "EAHD"
    * header → "EAIB" index block (inline elements + direct data-block
    * pointers) → "EASB" super blocks → "EADB" data blocks, paged or not.
    * All lookup3 checksums verified; unallocated blocks/pages (undef
    * address, zero bitmap bit) are unwritten chunks → fill.
    */
  private def readExtensibleArrayChunks(at: At, hdrAddr: Long, sh: Shape,
                                        dims: IndexedSeq[Int], cdims: IndexedSeq[Int],
                                        rawChunkBytes: Int,
                                        where: String): IndexedSeq[H5Chunk] = {
    val hdrLen = 4 + 1 + 1 + 6 + 6 * sh.len + sh.ofs + 4
    val hraw = new Array[Byte](hdrLen)
    at.bytes(hdrAddr, hdrLen).get(hraw)
    val hb = ByteBuffer.wrap(hraw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](4); hb.get(sig)
    require(sig.sameElements("EAHD".getBytes("US-ASCII")),
      s"$where: bad extensible-array header signature")
    require((hb.get() & 0xFF) == 0, s"$where: extensible-array header version")
    val clientId = hb.get() & 0xFF
    require(clientId == 0 || clientId == 1,
      s"$where: extensible-array client $clientId (chunks expected)")
    val entrySize = hb.get() & 0xFF
    val p = EaParams(hb.get() & 0xFF, hb.get() & 0xFF, hb.get() & 0xFF,
      hb.get() & 0xFF, hb.get() & 0xFF)
    hb.position(hb.position() + 4 * sh.len) // block-count/size statistics
    val maxIdxSet = getOfs(hb, sh.len)
    getOfs(hb, sh.len) // realized-element count
    val ibAddr = getOfs(hb, sh.ofs)
    require(hb.getInt == lookup3(hraw, 0, hdrLen - 4, 0),
      s"$where: extensible-array header checksum mismatch — corrupt file")
    // sanity-bound file-supplied geometry (see the fixed-array analog)
    require(p.maxDblkPageNelmtsBits >= 1 && p.maxDblkPageNelmtsBits <= 31 &&
      p.maxNelmtsBits >= 1 && p.maxNelmtsBits <= 63,
      s"$where: implausible extensible-array bit parameters")
    require(entrySize >= sh.ofs + (if (clientId == 1) 5 else 0),
      s"$where: implausible extensible-array entry size $entrySize")
    if (ibAddr == Undef || maxIdxSet == 0) return IndexedSeq.empty

    val nChunksTotal = dims.indices
      .map(d => (dims(d).toLong + cdims(d) - 1) / cdims(d)).product
    val out = IndexedSeq.newBuilder[H5Chunk]
    def readElem(eb: ByteBuffer, globalIdx: Long): Unit = {
      val addr = getOfs(eb, sh.ofs)
      val (size, mask) =
        if (clientId == 1) {
          val szBytes = entrySize - sh.ofs - 4
          var sz = 0L; var k = 0
          while (k < szBytes) { sz |= (eb.get() & 0xFFL) << (8 * k); k += 1 }
          (sz.toInt, eb.getInt)
        } else (rawChunkBytes, 0)
      if (addr != Undef && globalIdx < nChunksTotal)
        out += H5Chunk(chunkOffsetsOf(globalIdx, dims, cdims), addr, size, mask)
    }

    // one data block: unpaged = prefix + elements + checksum; paged =
    // prefix + checksum, then pages (elements + checksum) back-to-back
    def readDataBlock(addr: Long, nelmts: Long, elemStart: Long,
                      npages: Int, pageInit: Int => Boolean): Unit = {
      if (addr == Undef) return
      require(npages > 0 || nelmts * entrySize <= Int.MaxValue.toLong - 64,
        s"$where: implausible unpaged data block of $nelmts elements")
      val prefixLen = 4 + 1 + 1 + sh.ofs + p.arrOffSize
      val blockLen = prefixLen + (if (npages == 0) (nelmts * entrySize).toInt else 0) + 4
      val braw = new Array[Byte](blockLen)
      at.bytes(addr, blockLen).get(braw)
      val db = ByteBuffer.wrap(braw).order(ByteOrder.LITTLE_ENDIAN)
      val s4 = new Array[Byte](4); db.get(s4)
      require(s4.sameElements("EADB".getBytes("US-ASCII")),
        s"$where: bad extensible-array data block signature")
      require((db.get() & 0xFF) == 0 && (db.get() & 0xFF) == clientId,
        s"$where: extensible-array data block version/client")
      require(getOfs(db, sh.ofs) == hdrAddr, s"$where: data block back-pointer")
      db.position(blockLen - 4)
      require(db.getInt == lookup3(braw, 0, blockLen - 4, 0),
        s"$where: extensible-array data block checksum mismatch — corrupt file")
      if (npages == 0) {
        db.position(prefixLen)
        var i = 0L
        while (i < nelmts) { readElem(db, elemStart + i); i += 1 }
      } else {
        var pagesOff = addr + blockLen
        val pageLen = (p.pageNelmts * entrySize).toInt + 4
        var pg = 0
        while (pg < npages) {
          if (pageInit(pg)) {
            val praw = new Array[Byte](pageLen)
            at.bytes(pagesOff, pageLen).get(praw)
            val pb = ByteBuffer.wrap(praw).order(ByteOrder.LITTLE_ENDIAN)
            pb.position(pageLen - 4)
            require(pb.getInt == lookup3(praw, 0, pageLen - 4, 0),
              s"$where: extensible-array page checksum mismatch — corrupt file")
            pb.position(0)
            var i = 0L
            while (i < p.pageNelmts) { readElem(pb, elemStart + pg * p.pageNelmts + i); i += 1 }
          }
          pagesOff += pageLen
          pg += 1
        }
      }
    }

    // index block: inline elements, direct data-block ptrs, super-block ptrs
    val ibLen = 4 + 1 + 1 + sh.ofs + p.idxBlkElmts * entrySize +
      (p.ndblkAddrs + p.nsblkAddrs) * sh.ofs + 4
    val braw = new Array[Byte](ibLen)
    at.bytes(ibAddr, ibLen).get(braw)
    val ib = ByteBuffer.wrap(braw).order(ByteOrder.LITTLE_ENDIAN)
    val is4 = new Array[Byte](4); ib.get(is4)
    require(is4.sameElements("EAIB".getBytes("US-ASCII")),
      s"$where: bad extensible-array index block signature")
    require((ib.get() & 0xFF) == 0 && (ib.get() & 0xFF) == clientId,
      s"$where: extensible-array index block version/client")
    require(getOfs(ib, sh.ofs) == hdrAddr, s"$where: index block back-pointer")
    ib.position(ibLen - 4)
    require(ib.getInt == lookup3(braw, 0, ibLen - 4, 0),
      s"$where: extensible-array index block checksum mismatch — corrupt file")
    ib.position(4 + 1 + 1 + sh.ofs)
    var i = 0
    while (i < p.idxBlkElmts) { readElem(ib, i.toLong); i += 1 }
    val dblkAddrs = (0 until p.ndblkAddrs).map(_ => getOfs(ib, sh.ofs))
    val sblkAddrs = (0 until p.nsblkAddrs).map(_ => getOfs(ib, sh.ofs))

    // direct data blocks (super blocks folded into the index block) —
    // these are below the paging threshold in every libhdf5 layout
    dblkAddrs.zipWithIndex.foreach { case (a, j) =>
      val u = p.directOwner(j.toLong)
      val (_, dblkNe, startIdx, startDblk) = p.sblkInfo(u)
      require(dblkNe <= p.pageNelmts,
        s"$where: paged data block pointed from the index block (non-libhdf5 geometry)")
      readDataBlock(a, dblkNe,
        p.idxBlkElmts + startIdx + (j - startDblk) * dblkNe, 0, _ => false)
    }

    // super blocks: block offset, page-init bitmap for paged data blocks,
    // then the data-block pointers
    sblkAddrs.zipWithIndex.foreach { case (sa, t) =>
      if (sa != Undef) {
        val u = p.iblockNsblks + t
        val (ndblks, dblkNe, startIdx, _) = p.sblkInfo(u)
        val npagesPer = if (dblkNe > p.pageNelmts) (dblkNe / p.pageNelmts).toInt else 0
        val bitmapBytes = if (npagesPer > 0) (ndblks * npagesPer + 7) / 8 else 0
        val sbLen = 4 + 1 + 1 + sh.ofs + p.arrOffSize + bitmapBytes +
          ndblks * sh.ofs + 4
        val sraw = new Array[Byte](sbLen)
        at.bytes(sa, sbLen).get(sraw)
        val sb = ByteBuffer.wrap(sraw).order(ByteOrder.LITTLE_ENDIAN)
        val ss4 = new Array[Byte](4); sb.get(ss4)
        require(ss4.sameElements("EASB".getBytes("US-ASCII")),
          s"$where: bad extensible-array super block signature")
        require((sb.get() & 0xFF) == 0 && (sb.get() & 0xFF) == clientId,
          s"$where: extensible-array super block version/client")
        require(getOfs(sb, sh.ofs) == hdrAddr, s"$where: super block back-pointer")
        sb.position(sb.position() + p.arrOffSize) // block offset (derived below)
        sb.position(sbLen - 4)
        require(sb.getInt == lookup3(sraw, 0, sbLen - 4, 0),
          s"$where: extensible-array super block checksum mismatch — corrupt file")
        val bitmapOff = 4 + 1 + 1 + sh.ofs + p.arrOffSize
        sb.position(bitmapOff + bitmapBytes)
        var d = 0
        while (d < ndblks) {
          val da = getOfs(sb, sh.ofs)
          val base = d * npagesPer
          readDataBlock(da, dblkNe,
            p.idxBlkElmts + startIdx + d.toLong * dblkNe, npagesPer,
            pg => (sraw(bitmapOff + (base + pg) / 8) & (1 << ((base + pg) % 8))) != 0)
          d += 1
        }
      }
    }
    out.result()
  }

  /** libhdf5's H5VM_limit_enc_size: bytes needed to encode values up to
    * `n` — `floor(log2 n)/8 + 1` (1 for n = 0). Governs the width of the
    * variable-size record-count fields inside v2-B-tree child pointers.
    */
  private[ingest] def limitEncSize(n: Long): Int =
    if (n <= 0) 1 else (63 - java.lang.Long.numberOfLeadingZeros(n)) / 8 + 1

  /** Variable-size chunk-size field width for filtered v2-B-tree chunk
    * records: one spare byte over what the unfiltered chunk needs (a
    * filter may grow the chunk), capped at 8 — libhdf5's
    * H5D__bt2_idx_create computation.
    */
  private[ingest] def bt2ChunkSizeLen(rawChunkBytes: Long): Int =
    math.min(8, 1 + ((63 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, rawChunkBytes))) + 8) / 8)

  /** Per-level v2-B-tree geometry: max records a node holds at each
    * depth and the cumulative-subtree maxima that size the pointer
    * fields. Mirrors libhdf5's header init (node_info) exactly — the
    * on-disk variable-width integers are unreadable without it.
    * Level 0 is the leaf; `ptrSize(d)` is the byte width of one child
    * pointer inside a depth-`d` internal node.
    */
  private[ingest] final case class Bt2Geometry(nodeSize: Int, recordSize: Int,
                                               ofsSize: Int, depth: Int) {
    val maxLeafRec: Int = (nodeSize - 10) / recordSize // 10 = sig+ver+type+checksum
    require(maxLeafRec >= 1, s"v2-B-tree node size $nodeSize below one record")
    val maxNrecSize: Int = limitEncSize(maxLeafRec.toLong)
    /** (maxRec, cumMaxRec, cumMaxRecSize) per level 0..depth. */
    val info: IndexedSeq[(Long, Long, Int)] = {
      val out = IndexedSeq.newBuilder[(Long, Long, Int)]
      var prev = (maxLeafRec.toLong, maxLeafRec.toLong, 0)
      out += prev
      var u = 1
      while (u <= depth) {
        val ptr = ofsSize + maxNrecSize + prev._3
        val maxRec = (nodeSize - (10 + ptr)).toLong / (recordSize + ptr)
        require(maxRec >= 1, s"v2-B-tree node size $nodeSize below one internal record")
        val cum = (maxRec + 1) * prev._2 + maxRec
        prev = (maxRec, cum, limitEncSize(cum))
        out += prev
        u += 1
      }
      out.result()
    }
    def ptrSize(d: Int): Int = ofsSize + maxNrecSize + info(d - 1)._3
  }

  /** Read every chunk out of a Version 2 B-tree index — the latest-format
    * index libhdf5 uses for chunked datasets with MORE THAN ONE unlimited
    * dimension (and the one h5py emits for some libver='latest'
    * unlimited-dim layouts): "BTHD" header → "BTIN" internal nodes →
    * "BTLF" leaves, record type 10 (non-filtered: address + scaled
    * offsets) or 11 (filtered: + variable-width chunk size + filter
    * mask). In-order traversal yields row-major chunk order. All lookup3
    * checksums verified over each node's used prefix.
    */
  /** Parsed v2-B-tree header: record type/size + tree shape. */
  private final case class Bt2Header(recType: Int, nodeSize: Int,
                                     recordSize: Int, depth: Int,
                                     rootAddr: Long, rootNrec: Int,
                                     totalNrec: Long)

  private def readBt2Header(at: At, hdrAddr: Long, sh: Shape,
                            where: String): Bt2Header = {
    val hdrLen = 4 + 1 + 1 + 4 + 2 + 2 + 1 + 1 + sh.ofs + 2 + sh.len + 4
    val hraw = new Array[Byte](hdrLen)
    at.bytes(hdrAddr, hdrLen).get(hraw)
    val hb = ByteBuffer.wrap(hraw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](4); hb.get(sig)
    require(sig.sameElements("BTHD".getBytes("US-ASCII")),
      s"$where: bad v2-B-tree header signature")
    require((hb.get() & 0xFF) == 0, s"$where: v2-B-tree header version")
    val recType = hb.get() & 0xFF
    val nodeSize = hb.getInt
    val recordSize = hb.getShort & 0xFFFF
    val depth = hb.getShort & 0xFFFF
    hb.get(); hb.get() // split / merge percents
    val rootAddr = getOfs(hb, sh.ofs)
    val rootNrec = hb.getShort & 0xFFFF
    val totalNrec = getOfs(hb, sh.len)
    require(hb.getInt == lookup3(hraw, 0, hdrLen - 4, 0),
      s"$where: v2-B-tree header checksum mismatch — corrupt file")
    require(nodeSize >= 64 && nodeSize <= (1 << 26),
      s"$where: implausible v2-B-tree node size $nodeSize")
    require(depth <= 16, s"$where: implausible v2-B-tree depth $depth")
    Bt2Header(recType, nodeSize, recordSize, depth, rootAddr, rootNrec, totalNrec)
  }

  private def readBTree2Chunks(at: At, hdrAddr: Long, sh: Shape,
                               dims: IndexedSeq[Int], cdims: IndexedSeq[Int],
                               rawChunkBytes: Int, filtered: Boolean,
                               where: String): IndexedSeq[H5Chunk] = {
    val rank = cdims.length
    val h = readBt2Header(at, hdrAddr, sh, where)
    require(h.recType == (if (filtered) 11 else 10),
      s"$where: v2-B-tree record type ${h.recType} " +
        s"(expected ${if (filtered) 11 else 10} for ${if (filtered) "" else "non-"}filtered chunks)")
    val csl = h.recordSize - sh.ofs - 4 - 8 * rank // filtered chunk-size width
    require(if (filtered) csl >= 1 && csl <= 8
            else h.recordSize == sh.ofs + 8 * rank,
      s"$where: v2-B-tree record size ${h.recordSize} does not fit " +
        s"rank-$rank ${if (filtered) "filtered" else "non-filtered"} chunk records")
    val out = IndexedSeq.newBuilder[H5Chunk]
    walkBTree2(at, h, sh, where) { eb =>
      val addr = getOfs(eb, sh.ofs)
      val (size, mask) =
        if (filtered) {
          var sz = 0L; var k = 0
          while (k < csl) { sz |= (eb.get() & 0xFFL) << (8 * k); k += 1 }
          require(sz > 0 && sz <= Int.MaxValue,
            s"$where: implausible stored chunk size $sz in v2-B-tree record")
          (sz.toInt, eb.getInt)
        } else (rawChunkBytes, 0)
      val scaled = (0 until rank).map(_ => eb.getLong)
      out += H5Chunk(scaled.indices.map(d => scaled(d) * cdims(d)), addr, size, mask)
    }
    out.result()
  }

  /** Generic in-order v2-B-tree walk: BTIN/BTLF nodes, variable-width
    * child-pointer fields sized by [[Bt2Geometry]], every lookup3
    * checksum verified, subtree/total record counts cross-checked.
    * `onRecord` receives the node buffer positioned at each record (the
    * callback must consume exactly `recordSize` bytes or fewer —
    * positioning is absolute per record). Shared by the chunk index and
    * the dense-link name index.
    */
  private def walkBTree2(at: At, h: Bt2Header, sh: Shape, where: String)(
      onRecord: ByteBuffer => Unit): Unit = {
    if (h.rootAddr == Undef || h.totalNrec == 0) return
    val recType = h.recType
    val recordSize = h.recordSize
    val geo = Bt2Geometry(h.nodeSize, recordSize, sh.ofs, h.depth)
    def readVarInt(eb: ByteBuffer, width: Int): Long = {
      var v = 0L; var k = 0
      while (k < width) { v |= (eb.get() & 0xFFL) << (8 * k); k += 1 }
      v
    }
    def walk(addr: Long, nrec: Int, d: Int): Long = {
      require(addr != Undef, s"$where: undefined v2-B-tree node address at depth $d")
      require(nrec >= 1 && nrec <= geo.info(d)._1,
        s"$where: v2-B-tree node holds $nrec records, depth-$d max ${geo.info(d)._1}")
      if (d == 0) {
        val len = 6 + nrec * recordSize + 4
        val raw = new Array[Byte](len)
        at.bytes(addr, len).get(raw)
        val nb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val s4 = new Array[Byte](4); nb.get(s4)
        require(s4.sameElements("BTLF".getBytes("US-ASCII")),
          s"$where: bad v2-B-tree leaf signature")
        require((nb.get() & 0xFF) == 0 && (nb.get() & 0xFF) == recType,
          s"$where: v2-B-tree leaf version/type")
        nb.position(len - 4)
        require(nb.getInt == lookup3(raw, 0, len - 4, 0),
          s"$where: v2-B-tree leaf checksum mismatch — corrupt file")
        var i = 0
        while (i < nrec) {
          nb.position(6 + i * recordSize)
          onRecord(nb)
          i += 1
        }
        nrec.toLong
      } else {
        val ptr = geo.ptrSize(d)
        val len = 6 + nrec * recordSize + (nrec + 1) * ptr + 4
        val raw = new Array[Byte](len)
        at.bytes(addr, len).get(raw)
        val nb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val s4 = new Array[Byte](4); nb.get(s4)
        require(s4.sameElements("BTIN".getBytes("US-ASCII")),
          s"$where: bad v2-B-tree internal node signature")
        require((nb.get() & 0xFF) == 0 && (nb.get() & 0xFF) == recType,
          s"$where: v2-B-tree internal node version/type")
        nb.position(len - 4)
        require(nb.getInt == lookup3(raw, 0, len - 4, 0),
          s"$where: v2-B-tree internal node checksum mismatch — corrupt file")
        // records first, then the child pointers; replay in order so the
        // collected chunks come out sorted by (row-major) offset
        val recStart = 6
        val ptrStart = 6 + nrec * recordSize
        val children = (0 to nrec).map { i =>
          nb.position(ptrStart + i * ptr)
          val ca = getOfs(nb, sh.ofs)
          val cn = readVarInt(nb, geo.maxNrecSize)
          val ct = if (d > 1) readVarInt(nb, geo.info(d - 1)._3) else cn
          (ca, cn, ct)
        }
        var visited = 0L
        var i = 0
        while (i < nrec) {
          val (ca, cn, ct) = children(i)
          val got = walk(ca, cn.toInt, d - 1)
          require(got == ct, s"$where: v2-B-tree subtree record count $got != declared $ct")
          visited += got
          nb.position(recStart + i * recordSize)
          onRecord(nb)
          visited += 1
          i += 1
        }
        val (ca, cn, ct) = children(nrec)
        val got = walk(ca, cn.toInt, d - 1)
        require(got == ct, s"$where: v2-B-tree subtree record count $got != declared $ct")
        visited + got
      }
    }
    val seen = walk(h.rootAddr, h.rootNrec, h.depth)
    require(seen == h.totalNrec,
      s"$where: v2-B-tree walked $seen records, header declares ${h.totalNrec}")
  }

  // ---- netCDF-4 semantic mapping + read ----

  /** Dimension resolution for a data variable: DIMENSION_LIST references
    * when present (address → dim-scale dataset name), else positional
    * shape matching against the dimension-scale inventory.
    */
  private[ingest] def dimNamesOf(v: H5Dataset, f: H5File): IndexedSeq[String] = {
    val byAddr = f.datasets.map(d => d.addr -> d.name).toMap
    v.dimRefs match {
      case Some(refs) if refs.forall(byAddr.contains) => refs.map(byAddr)
      case _ =>
        // positional fallback: match each axis to an UNUSED scale of the
        // same length — consuming a scale once keeps a square grid (two
        // equal-length dims, e.g. 180×180 lat/lon) from binding BOTH axes
        // to the first scale (duplicate column names + silently wrong
        // coordinates on the second axis)
        val used = scala.collection.mutable.Set.empty[String]
        val scales = f.datasets.filter(d => d.isDimScale && d.dims.length == 1)
        v.dims.zipWithIndex.map { case (len, i) =>
          scales.find(s => s.dims.head == len && !used.contains(s.name)) match {
            case Some(s) => used += s.name; s.name
            case None => s"phony_dim_$i"
          }
        }
    }
  }

  /** Driver-side full read of a (small) dataset — coordinate vars and
    * test support. Row-major doubles.
    */
  def readVarDriver(path: String, props: Map[String, String],
                    name: String): Array[Double] = {
    val f = readStructure(path, props)
    val v = f.datasets.find(_.name == name)
      .getOrElse(sys.error(s"$path: no dataset '$name'"))
    val ch = NetCdf.openRead(path, props)
    try readAll(new At(ch), v) finally ch.close()
  }

  private def readAll(at: At, v: H5Dataset): Array[Double] = {
    // loud 2 GiB bound like the slab path: .toInt on a >2^31 element
    // count would silently wrap and decode a wrong, smaller dataset
    val nL = v.dims.map(_.toLong).product
    require(nL <= Int.MaxValue.toLong && nL * v.dtype.size <= Int.MaxValue.toLong,
      s"${v.name}: full read of $nL × ${v.dtype.size}B elements exceeds " +
        "2 GiB — use the distributed slab reader (GridCube.read)")
    val n = nL.toInt
    v.layout match {
      case Compact(data) =>
        decodeValues(ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN), v.dtype, n)
      case Contiguous(addr, _) =>
        if (addr == Undef) Array.fill(n)(v.fillRaw.getOrElse(Double.NaN))
        else decodeValues(at.bytes(addr, n * v.dtype.size), v.dtype, n)
      case ch: Chunked =>
        val out = Array.fill(n)(v.fillRaw.getOrElse(Double.NaN))
        copyChunksInto(at, v, ch, out, sliceLo = 0, sliceHi = v.dims.headOption.getOrElse(1))
        out
    }
  }

  /** Copy every chunk cell intersecting outer slices [sliceLo, sliceHi)
    * into `out`, which is row-major over (sliceHi-sliceLo) × inner dims.
    * `decoded` lets a caller that issues MANY overlapping windows (the
    * per-slice SlabReader) memoize chunk decodes — a chunk with outer
    * extent 100 is otherwise fetched and inflated 100× (once per slice).
    */
  private def copyChunksInto(at: At, v: H5Dataset, ch: Chunked,
                             out: Array[Double], sliceLo: Int, sliceHi: Int,
                             decoded: (H5Dataset, H5Chunk) => Array[Double] = null): Unit = {
    val dims = v.dims
    val rank = dims.length
    val cdims = ch.chunkDims
    require(cdims.length == rank, s"chunk rank ${cdims.length} != dataset rank $rank")
    val innerCount = dims.drop(1).map(_.toLong).product
    // chunks are sorted by outer offset (asserted at parse): binary-search
    // the first possibly-intersecting chunk, stop at the window's end —
    // O(log C + hits) per slab instead of a full index scan, which at a
    // 10k-chunk unlimited-time archive × 10k slab reads is the difference
    // between 10^8 intersection tests and none
    val chunks = ch.chunks
    var lo = 0; var hi = chunks.length
    val target = sliceLo - cdims.head + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (chunks(mid).offsets.head < target) lo = mid + 1 else hi = mid
    }
    var ci = lo
    while (ci < chunks.length && chunks(ci).offsets.head < sliceHi) {
      val c = chunks(ci)
      ci += 1
      val c0 = c.offsets.head.toInt
      if (c0 < sliceHi && c0 + cdims.head > sliceLo) {
        val vals =
          if (decoded != null) decoded(v, c) else chunkValues(at, v, c)
        // odometer over the chunk's cells; copy those inside the dataset
        // bounds and the requested outer window
        val idx = new Array[Int](rank)
        val total = cdims.map(_.toLong).product
        require(vals.length >= total,
          s"${v.name}: chunk at ${c.addr} decoded ${vals.length} values, expected $total")
        var flat = 0L
        while (flat < total) {
          var inside = true
          var g0 = 0
          var innerFlat = 0L
          var d = 0
          while (d < rank && inside) {
            val g = c.offsets(d).toInt + idx(d)
            if (g >= dims(d)) inside = false
            else if (d == 0) { g0 = g; inside = g >= sliceLo && g < sliceHi }
            else innerFlat = innerFlat * dims(d) + g
            d += 1
          }
          if (inside)
            out(((g0 - sliceLo) * innerCount + innerFlat).toInt) = vals(flat.toInt)
          // odometer
          var k = rank - 1
          var carry = true
          while (k >= 0 && carry) {
            idx(k) += 1
            if (idx(k) == cdims(k)) idx(k) = 0 else carry = false
            k -= 1
          }
          flat += 1
        }
      }
    }
  }

  private def unpackOf(v: H5Dataset): GridCube.Unpack = GridCube.Unpack(
    scale = v.attrNum("scale_factor").getOrElse(1.0),
    offset = v.attrNum("add_offset").getOrElse(0.0),
    fill = v.attrNum("_FillValue").orElse(v.attrNum("missing_value"))
      .orElse(v.fillRaw))

  /** S6 analog for NetCDF-4: variable inventory, driver metadata only. */
  def info(spark: SparkSession, path: String): DataFrame = {
    val props = NetCdf.fsProps(spark)
    val f = readStructure(path, props)
    val rows = f.datasets.map { v =>
      val dtype = (v.dtype.cls, v.dtype.size, v.dtype.signed) match {
        case (1, 8, _) => "double"; case (1, 4, _) => "float"
        case (0, 8, true) => "int64"; case (0, 8, false) => "uint64"
        case (0, 4, true) => "int"; case (0, 4, false) => "uint"
        case (0, 2, true) => "short"; case (0, 2, false) => "ushort"
        case (0, 1, true) => "byte"; case (0, 1, false) => "ubyte"
        case _ => s"class${v.dtype.cls}"
      }
      Row(v.name, dtype, dimNamesOf(v, f).mkString(","),
        v.dims.map(_.toLong).product,
        v.attrStr("units").orNull)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("variable", StringType, nullable = false),
        StructField("dtype", StringType, nullable = false),
        StructField("dims", StringType, nullable = false),
        StructField("n_values", LongType, nullable = false),
        StructField("units", StringType, nullable = true))))
  }

  /** Long-form distributed read of a NetCDF-4 file — the same contract,
    * schema, and pushdown as [[NetCdf.read]] ([[GridCube.read]] carries
    * the shared plan). Executors read contiguous slabs or intersecting
    * unfiltered chunks per outer slice.
    */
  def read(spark: SparkSession, path: String, varNames: Seq[String],
           numPartitions: Int = 0,
           timeRange: Option[(String, String)] = None,
           bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val (axes, unpacks, mkReader) =
      gridInputs(path, NetCdf.fsProps(spark), varNames)
    GridCube.read(spark, path, axes, varNames, unpacks, mkReader,
      numPartitions, timeRange, bbox)
  }

  /** HDF5 metadata → the shared grid-read inputs (see
    * [[NetCdf.gridInputs]] for the classic analog): axes from dimension
    * scales, CF unpacks, and a slab-reader factory over
    * compact/contiguous/chunked (filtered or not) layouts.
    */
  private[ingest] def gridInputs(path: String, props: Map[String, String],
                                 varNames: Seq[String]): (IndexedSeq[GridCube.Axis],
      Seq[GridCube.Unpack], () => GridCube.SlabReader) = {
    val f = readStructure(path, props)
    def ds(n: String) = f.datasets.find(_.name == n)
      .getOrElse(sys.error(s"$path: no dataset '$n' " +
        s"(have ${f.datasets.map(_.name).mkString(", ")})"))
    val vs = varNames.map(ds).toIndexedSeq
    val dimNames = dimNamesOf(vs.head, f)
    require(vs.forall(v => dimNamesOf(v, f) == dimNames),
      s"variables ${varNames.mkString(",")} must share one dimension tuple")
    require(vs.head.dims.nonEmpty, "scalar variables have no grid to unravel")

    val byName = f.datasets.map(d => d.name -> d).toMap
    val chRead = NetCdf.openRead(path, props)
    val axes = try {
      val at = new At(chRead)
      dimNames.zip(vs.head.dims).map { case (dn, len) =>
        byName.get(dn).filter(d => d.dims == IndexedSeq(len)) match {
          case Some(cv) if !cv.attrStr("NAME").exists(_.startsWith(
              "This is a netCDF dimension but not a netCDF variable")) =>
            val unpack = unpackOf(cv)
            val vals = readAll(at, cv)
              .map(r => Option(unpack(r)).map(_.toDouble).getOrElse(Double.NaN))
            GridCube.Axis(dn, len, Some(vals),
              cv.attrStr("units").flatMap(GridCube.cfTimeUnits))
          case _ => GridCube.Axis(dn, len, None, None)
        }
      }
    } finally chRead.close()

    val unpacks = vs.map(unpackOf)
    val varMeta = vs // case classes, serialized into the reader factory
    val mkReader = () => new GridCube.SlabReader {
      private val ch = NetCdf.openRead(path, props)
      private val at = new At(ch)
      // memoized chunk decode: the slab loop reads slices IN ORDER, so a
      // chunk with outer extent E is hit by E consecutive slab calls —
      // without the cache each hit re-fetches and re-inflates the whole
      // chunk (E× redundant I/O + decompression per chunk per task). A
      // small LRU bounds memory: one outer chunk-row of a typical grid
      // fits easily; eviction is by decoded-doubles budget.
      private val chunkCache =
        new java.util.LinkedHashMap[(String, Long), Array[Double]](16, 0.75f, true)
      private var cachedDoubles = 0L
      private val cacheBudget = 16L << 20 // 16M doubles = 128 MB
      private def decodedCached(v: H5Dataset, c: H5Chunk): Array[Double] = {
        val key = (v.name, c.addr)
        val hit = chunkCache.get(key)
        if (hit != null) hit
        else {
          val vals = chunkValues(at, v, c)
          cachedDoubles += vals.length
          chunkCache.put(key, vals)
          val it = chunkCache.entrySet().iterator()
          while (cachedDoubles > cacheBudget && chunkCache.size() > 1) {
            val e = it.next()
            cachedDoubles -= e.getValue.length
            it.remove()
          }
          vals
        }
      }
      def slab(vi: Int, i0: Int): Array[Double] = {
        val v = varMeta(vi)
        val innerCount = v.dims.drop(1).map(_.toLong).product
        v.layout match {
          case Compact(data) =>
            val all = decodeValues(
              ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN),
              v.dtype, v.dims.map(_.toLong).product.toInt)
            java.util.Arrays.copyOfRange(all,
              (i0 * innerCount).toInt, ((i0 + 1) * innerCount).toInt)
          case Contiguous(addr, _) =>
            if (addr == Undef)
              Array.fill(innerCount.toInt)(v.fillRaw.getOrElse(Double.NaN))
            else {
              val lenBytes = innerCount * v.dtype.size
              require(lenBytes <= Int.MaxValue,
                s"${v.name}: one outer slice is $lenBytes bytes (> 2 GiB)")
              decodeValues(at.bytes(addr + i0 * lenBytes, lenBytes.toInt),
                v.dtype, innerCount.toInt)
            }
          case ck: Chunked =>
            val out = Array.fill(innerCount.toInt)(v.fillRaw.getOrElse(Double.NaN))
            copyChunksInto(at, v, ck, out, sliceLo = i0, sliceHi = i0 + 1,
              decoded = decodedCached)
            out
        }
      }
      def close(): Unit = ch.close()
    }
    (axes.toIndexedSeq, unpacks, mkReader)
  }

  // ---- writer (export / test fixtures) ----

  /** Growable LE buffer with labeled 8-byte address slots patched at the
    * end — lets the writer emit blocks in any order despite forward
    * references (superblock → root header → heap/B-tree → datasets →
    * global heap → data).
    */
  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    private var len = 0
    private val patches = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    private val labels = scala.collection.mutable.HashMap[String, Long]()
    def pos: Int = len
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        val grown = new Array[Byte](math.max(arr.length * 2, len + n))
        System.arraycopy(arr, 0, grown, 0, len); arr = grown
      }
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = { ensure(2); arr(len) = v.toByte; arr(len + 1) = (v >> 8).toByte; len += 2 }
    def u32(v: Long): Unit = { ensure(4); var i = 0; while (i < 4) { arr(len + i) = (v >> (8 * i)).toByte; i += 1 }; len += 4 }
    def u64(v: Long): Unit = { ensure(8); var i = 0; while (i < 8) { arr(len + i) = (v >> (8 * i)).toByte; i += 1 }; len += 8 }
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v).toLong & 0xFFFFFFFFL)
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length }
    def zeros(n: Int): Unit = { ensure(n); len += n }
    def padTo8(): Unit = zeros((8 - len % 8) % 8)
    def mark(label: String): Unit = labels(label) = len.toLong
    def define(label: String, v: Long): Unit = labels(label) = v
    def addr(label: String): Unit = { patches += ((len, label)); u64(0) }
    private val ckPatches = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    /** Register a lookup3 checksum at `ckPos` over `[from, to)`, computed
      * AFTER address patches resolve — so checksummed structures may
      * contain forward references.
      */
    def checksumOver(ckPos: Int, from: Int, to: Int): Unit =
      ckPatches += ((ckPos, from, to))
    def result(): Array[Byte] = {
      patches.foreach { case (p, l) =>
        val v = labels.getOrElse(l, sys.error(s"unresolved HDF5 label $l"))
        var i = 0; while (i < 8) { arr(p + i) = (v >> (8 * i)).toByte; i += 1 }
      }
      ckPatches.foreach { case (p, from, to) =>
        val ck = lookup3(arr, from, to - from, 0)
        var i = 0; while (i < 4) { arr(p + i) = (ck >> (8 * i)).toByte; i += 1 }
      }
      java.util.Arrays.copyOf(arr, len)
    }
  }

  private def h5TypeBytes(t: NetCdf.NcType, fixedPrecision: Int = 0): Array[Byte] = {
    import NetCdf._
    val bb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case NcFloat | NcDouble =>
        val size = t.size
        bb.put(0x11.toByte) // version 1, class 1 float
        bb.put(0x20.toByte) // LE, msb-set mantissa normalization
        bb.put((size * 8 - 1).toByte).put(0.toByte) // sign location
        bb.putInt(size)
        bb.putShort(0).putShort((size * 8).toShort) // bit offset + precision
        if (t == NcDouble) { bb.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023) }
        else { bb.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte).putInt(127) }
      case _ =>
        val signed = t match {
          case NcUByte | NcUShort | NcUInt | NcUInt64 => false
          case _ => true
        }
        bb.put(0x10.toByte) // version 1, class 0 fixed
        bb.put((if (signed) 0x08 else 0x00).toByte) // LE + signed bit
        bb.put(0.toByte).put(0.toByte)
        bb.putInt(t.size)
        // reduced precision (the N-bit filter's contract rides in the
        // datatype message); 0 = full width
        val prec = if (fixedPrecision > 0) fixedPrecision else t.size * 8
        bb.putShort(0).putShort(prec.toShort)
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private def h5StringTypeBytes(len: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(len)
    bb.array()
  }

  private val h5RefTypeBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x17.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(8)
    bb.array()
  }

  private val h5VlenRefTypeBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x19.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(16)
    bb.put(h5RefTypeBytes)
    bb.array()
  }

  private def dataspaceBytes(dims: Seq[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * dims.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).put(dims.length.toByte).put(0.toByte)
    bb.put(0.toByte).putInt(0) // reserved ×5
    dims.foreach(bb.putLong)
    bb.array()
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  /** Write one NetCDF-4 (HDF5) file: superblock v0, symbol-table root
    * group, v1 object headers, dimension-scale datasets with
    * CLASS/NAME, data variables with DIMENSION_LIST (vlen object refs
    * through a global heap), contiguous layout — or chunked (one chunk
    * per outer slice) when `chunked` is set. With `deflate` > 0, data
    * variables carry the standard netCDF-4 compression pipeline —
    * shuffle → deflate(level) → fletcher32 — matching what
    * `nccopy -d<level> -s` / `xarray.to_netcdf(encoding={"zlib": True,
    * "shuffle": True})` produce, so the reader's filter path is
    * exercised against real pipelines. The layouts libhdf5 writes for
    * netCDF-4 classic-model grid files, against the public format spec.
    */
  def write(path: String, dims: Seq[NetCdf.Dim],
            vars: Seq[(NetCdf.VarDef, Array[Double])],
            gatts: Seq[(String, Any)] = Nil,
            chunked: Boolean = false,
            deflate: Int = 0,
            layoutVersion: Int = 3,
            faPageBits: Int = 0,
            eaIndex: Boolean = false,
            eaParams: EaParams = EaParams(),
            implicitIndex: Boolean = false,
            bt2Index: Boolean = false,
            bt2NodeSize: Int = 2048,
            chunkOuter: Int = 1,
            dontFilterEdge: Boolean = false,
            denseLinks: Boolean = false,
            denseAttrs: Boolean = false,
            chunkCodec: String = "zlib",
            headerVersion: Int = 1): Unit = {
    require(headerVersion == 1 || headerVersion == 2,
      s"headerVersion $headerVersion (1 = classic prefix, 2 = latest OHDR)")
    require(Set("zlib", "lz4", "zstd", "lzf", "szip", "nbit", "scaleoffset")(chunkCodec),
      s"chunkCodec '$chunkCodec' (zlib/lz4/zstd/lzf/szip/nbit/scaleoffset)")
    // nbit is datatype-driven: every filtered (chunked data) variable
    // must be fixed-point so the reduced-precision datatype message and
    // the packed stream agree
    require(chunkCodec != "nbit" || vars.forall { case (vd, _) =>
      dims.exists(_.name == vd.name) || (vd.tpe match {
        case NetCdf.NcFloat | NetCdf.NcDouble => false
        case _ => true // any fixed-point type, signed or unsigned
      })
    }, "chunkCodec 'nbit': all data variables must be fixed-point ints")
    // lzf is h5py's codec and h5py writes the earliest file format; the
    // v3 B-tree path also carries the per-chunk skip masks lzf needs
    require(chunkCodec != "lzf" || layoutVersion == 3,
      "lzf fixtures use layoutVersion 3 (h5py writes the earliest format)")
    require(!eaIndex || layoutVersion == 4, "eaIndex requires layoutVersion 4")
    require(!implicitIndex || (layoutVersion == 4 && deflate == 0 && !eaIndex),
      "implicitIndex requires layoutVersion 4 and no filters")
    require(!bt2Index || (layoutVersion == 4 && !eaIndex && !implicitIndex),
      "bt2Index requires layoutVersion 4 and excludes the other indexes")
    require(chunkOuter >= 1, s"chunkOuter $chunkOuter")
    require(!dontFilterEdge || (layoutVersion == 4 && deflate > 0),
      "dontFilterEdge (H5Pset_chunk_opts) requires a filtered v4 layout")
    require(deflate >= 0 && deflate <= 9, s"deflate level $deflate out of [0, 9]")
    require(deflate == 0 || chunked, "deflate requires chunked layout")
    require(layoutVersion == 3 || layoutVersion == 4,
      s"layoutVersion $layoutVersion (3 = v1-B-tree index, 4 = latest-format indexes)")
    // fixed-array page size: explicit for tests (small values force the
    // paged data-block form), else the smallest power of two that keeps
    // the element list unpaged (libhdf5's default 10 as the floor)
    def pageBitsFor(nelems: Int): Int =
      if (faPageBits > 0) faPageBits
      else { var p = 10; while ((1L << p) < nelems) p += 1; p }
    val dimLen = dims.map(d => d.name -> d.length).toMap
    val dimNames = dims.map(_.name)
    val varNames = vars.map(_._1.name)
    require(varNames.distinct == varNames, "duplicate variable names")
    val b = new Buf

    // ---- attribute message emission ----
    def attrMessage(name: String, dtBytes: Array[Byte], dsBytes: Array[Byte],
                    dataLen: Int)(emitData: => Unit): (Int, Int, () => Unit) = {
      val nameB = name.getBytes("UTF-8") :+ 0.toByte
      val size = pad8(8 + pad8(nameB.length) + pad8(dtBytes.length) +
        pad8(dsBytes.length) + dataLen)
      (0x0C, size, () => {
        val start = b.pos
        b.u8(1); b.u8(0) // version 1 + reserved
        b.u16(nameB.length); b.u16(dtBytes.length); b.u16(dsBytes.length)
        b.bytes(nameB); b.zeros(pad8(nameB.length) - nameB.length)
        b.bytes(dtBytes); b.zeros(pad8(dtBytes.length) - dtBytes.length)
        b.bytes(dsBytes); b.zeros(pad8(dsBytes.length) - dsBytes.length)
        emitData
        b.zeros(size - (b.pos - start))
      })
    }
    def scalarAttr(name: String, value: Any): (Int, Int, () => Unit) = value match {
      case s: String =>
        val sb = s.getBytes("UTF-8") :+ 0.toByte
        attrMessage(name, h5StringTypeBytes(sb.length), dataspaceBytes(Nil), sb.length) {
          b.bytes(sb)
        }
      case d: Double =>
        attrMessage(name, h5TypeBytes(NetCdf.NcDouble), dataspaceBytes(Nil), 8) { b.f64(d) }
      case f: Float =>
        attrMessage(name, h5TypeBytes(NetCdf.NcFloat), dataspaceBytes(Nil), 4) { b.f32(f) }
      case i: Int =>
        attrMessage(name, h5TypeBytes(NetCdf.NcInt), dataspaceBytes(Nil), 4) { b.u32(i.toLong) }
      case s: Short =>
        attrMessage(name, h5TypeBytes(NetCdf.NcShort), dataspaceBytes(Nil), 2) { b.u16(s.toInt) }
      case l: Long =>
        attrMessage(name, h5TypeBytes(NetCdf.NcInt64), dataspaceBytes(Nil), 8) { b.u64(l) }
      case other => sys.error(s"unsupported attribute type ${other.getClass}")
    }

    // ---- object headers ----
    def objectHeader(label: String, msgs: Seq[(Int, Int, () => Unit)]): Unit =
      if (headerVersion == 2) objectHeaderV2(label, msgs)
      else objectHeaderV1(label, msgs)

    def objectHeaderV1(label: String, msgs: Seq[(Int, Int, () => Unit)]): Unit = {
      // (type, paddedDataSize, emit) — emit must write exactly size bytes
      b.padTo8()
      b.mark(label)
      val hdrSize = msgs.map { case (_, s, _) => 8 + s }.sum
      b.u8(1); b.u8(0)
      b.u16(msgs.length)
      b.u32(1)             // reference count
      b.u32(hdrSize.toLong)
      b.zeros(4)           // prefix padding — messages begin 8-aligned
      msgs.foreach { case (t, size, emit) =>
        b.u16(t); b.u16(size); b.u8(0); b.zeros(3)
        val start = b.pos
        emit()
        require(b.pos - start == size, s"message $t wrote ${b.pos - start}, declared $size")
      }
    }

    /** Version-2 object header (the latest-format prefix): "OHDR", packed
      * 4-byte message framing (u8 type), chunk-0 size counting MESSAGE
      * DATA ONLY per the spec, trailing lookup3 checksum over the whole
      * header (computed post-patch so layout addresses inside messages
      * resolve first). No gap is emitted, so the last message ends flush
      * at the chunk boundary — the tightly-packed shape that regresses a
      * chunk-0 size-accounting error.
      */
    def objectHeaderV2(label: String, msgs: Seq[(Int, Int, () => Unit)]): Unit = {
      b.padTo8()
      b.mark(label)
      val start = b.pos
      val chunk0 = msgs.map { case (_, s, _) => 4 + s }.sum
      require(chunk0 <= 0xFFFF, s"v2 chunk 0 of $chunk0 bytes needs a wider size field")
      b.bytes("OHDR".getBytes("US-ASCII"))
      b.u8(2); b.u8(1) // version, flags: 2-byte chunk-0 size, no times
      b.u16(chunk0)
      msgs.foreach { case (t, size, emit) =>
        b.u8(t); b.u16(size); b.u8(0)
        val s0 = b.pos
        emit()
        require(b.pos - s0 == size, s"message $t wrote ${b.pos - s0}, declared $size")
      }
      val ckPos = b.pos
      b.u32(0)
      b.checksumOver(ckPos, start, ckPos)
    }

    val pendingDenseAttrs =
      scala.collection.mutable.ArrayBuffer[(String, Seq[(String, (Int, Int, () => Unit))])]()

    def datasetHeader(vd: NetCdf.VarDef, isDim: Boolean): Unit = {
      val shape = vd.dimNames.map(dn => dimLen(dn).toLong)
      val elemSize = vd.tpe.size
      // nbit's contract rides in the datatype: filtered data vars carry
      // the reduced precision the packed chunks store
      val nbitVar = chunkCodec == "nbit" && deflate > 0 && chunked &&
        !isDim && shape.nonEmpty
      val dtB = h5TypeBytes(vd.tpe, if (nbitVar) NbitPrecision else 0)
      val dsB = dataspaceBytes(shape)
      val msgs = Seq.newBuilder[(Int, Int, () => Unit)]
      msgs += ((0x01, pad8(dsB.length), () => { b.bytes(dsB); b.zeros(pad8(dsB.length) - dsB.length) }))
      msgs += ((0x03, pad8(dtB.length), () => { b.bytes(dtB); b.zeros(pad8(dtB.length) - dtB.length) }))
      if (chunked && !isDim && shape.nonEmpty) {
        val rank = shape.length
        if (layoutVersion == 4) {
          // v4 chunked: Extensible Array when requested (the unlimited-dim
          // layout), Single Chunk when the dataset is one chunk (libhdf5's
          // choice there), else a Fixed Array index. Chunk dims exclude
          // the element-size pseudo-dimension per the v4 spec text (the
          // reader accepts both encodings).
          val outer = shape.head.toInt
          val nChunksOf = (outer + chunkOuter - 1) / chunkOuter
          val single = !eaIndex && !bt2Index && nChunksOf == 1
          val filtered = deflate > 0
          val idxInfo =
            if (bt2Index) 6
            else if (eaIndex) 5
            else if (implicitIndex) 0
            else if (single) (if (filtered) 12 else 0)
            else 1
          val size = pad8(2 + 3 + 8 * rank + 1 + idxInfo + 8)
          msgs += ((0x08, size, () => {
            val start = b.pos
            b.u8(4); b.u8(2) // v4, chunked
            b.u8((if (single && filtered) 0x02 else 0x00) |
              (if (dontFilterEdge) 0x01 else 0x00)) // single-w/filter, raw-edge flags
            b.u8(rank); b.u8(8) // dimensionality, 8-byte dim encoding
            b.u64(chunkOuter.toLong); shape.drop(1).foreach(d => b.u64(d.toLong))
            if (bt2Index) {
              b.u8(5) // Version 2 B-tree index
              b.u32(bt2NodeSize.toLong)
              b.u8(100); b.u8(40) // libhdf5's default split/merge percents
              b.addr(s"bt2hd:${vd.name}")
            } else if (eaIndex) {
              b.u8(4) // Extensible Array index
              // message cparam order per the spec: max-bits, index-elmts,
              // min-ptrs, min-elmts, page-bits
              b.u8(eaParams.maxNelmtsBits); b.u8(eaParams.idxBlkElmts)
              b.u8(eaParams.supBlkMinDataPtrs); b.u8(eaParams.dataBlkMinElmts)
              b.u8(eaParams.maxDblkPageNelmtsBits)
              b.addr(s"eahd:${vd.name}")
            } else if (implicitIndex) {
              b.u8(2) // Implicit index: early-allocated contiguous chunks
              b.addr(s"chunk:${vd.name}:0")
            } else if (single) {
              b.u8(1) // Single Chunk index
              if (filtered) {
                b.addr(s"chunksz:${vd.name}") // stored size, defined at emit
                b.u32(0) // filter mask: all filters applied
              }
              b.addr(s"chunk:${vd.name}:0")
            } else {
              b.u8(3) // Fixed Array index
              b.u8(pageBitsFor(nChunksOf))
              b.addr(s"fahd:${vd.name}")
            }
            b.zeros(size - (b.pos - start))
          }))
        } else {
          val size = pad8(2 + 1 + 8 + 4 * (rank + 1))
          msgs += ((0x08, size, () => {
            val start = b.pos
            b.u8(3); b.u8(2) // v3, chunked
            b.u8(rank + 1)
            b.addr(s"chunkbt:${vd.name}")
            b.u32(chunkOuter.toLong)
            shape.drop(1).foreach(d => b.u32(d))
            b.u32(elemSize.toLong)
            b.zeros(size - (b.pos - start))
          }))
        }
        if (deflate > 0) {
          // filter pipeline v1: shuffle(elemSize) → codec(level) → fletcher32
          // (lzf carries no client data and gets the OPTIONAL flag —
          // h5py's registration — so skip-on-no-gain is spec-legal).
          // The datatype-aware codecs (nbit/scaleoffset) pack whole
          // elements and run WITHOUT the shuffle stage: [codec, fletcher32].
          val isFloatT = vd.tpe == NetCdf.NcFloat || vd.tpe == NetCdf.NcDouble
          val signedT = vd.tpe match {
            case NetCdf.NcUByte | NetCdf.NcUShort | NetCdf.NcUInt |
                 NetCdf.NcUInt64 => false
            case _ => true
          }
          val (codecId, codecCd) = chunkCodec match {
            case "lz4" => (32004, Seq(1L << 20)) // block size
            case "zstd" => (32015, Seq(deflate.toLong))
            case "lzf" => (32000, Nil)
            case "szip" => (4, SzipCdata.map(_.toLong))
            case "nbit" => (5, nbitCdata(elemSize, signedT).map(_.toLong))
            case "scaleoffset" => (6, scaleOffsetCdata(isFloatT).map(_.toLong))
            case _ => (1, Seq(deflate.toLong))
          }
          val withShuffle = chunkCodec != "nbit" && chunkCodec != "scaleoffset"
          // v1 filter entry: 8-byte header + cdata padded to an even
          // word count (lzf carries no client data and gets the OPTIONAL
          // flag — h5py's registration — so skip-on-no-gain is spec-legal)
          val codecBlock = 8 + (codecCd.length + 1) / 2 * 8
          val fpSize = pad8(8 + (if (withShuffle) 16 else 0) + codecBlock + 8)
          msgs += ((0x0B, fpSize, () => {
            val start = b.pos
            b.u8(1); b.u8(if (withShuffle) 3 else 2) // version 1, filter count
            b.u16(0); b.u32(0)  // reserved
            if (withShuffle) {
              b.u16(2); b.u16(0); b.u16(0); b.u16(1); b.u32(elemSize.toLong); b.u32(0)
            }
            if (codecCd.isEmpty) {
              b.u16(codecId); b.u16(0); b.u16(1); b.u16(0) // OPTIONAL flag
            } else {
              b.u16(codecId); b.u16(0); b.u16(0); b.u16(codecCd.length)
              codecCd.foreach(b.u32)
              if (codecCd.length % 2 == 1) b.u32(0) // pad to even words
            }
            b.u16(3); b.u16(0); b.u16(0); b.u16(0)
            b.zeros(fpSize - (b.pos - start))
          }))
        }
      } else {
        val size = pad8(2 + 8 + 8)
        msgs += ((0x08, size, () => {
          val start = b.pos
          b.u8(3); b.u8(1) // v3, contiguous
          b.addr(s"data:${vd.name}")
          b.u64(shape.product * elemSize)
          b.zeros(size - (b.pos - start))
        }))
      }
      val attrTriples = Seq.newBuilder[(String, (Int, Int, () => Unit))]
      if (isDim) {
        attrTriples += "CLASS" -> scalarAttr("CLASS", "DIMENSION_SCALE")
        attrTriples += "NAME" -> scalarAttr("NAME", vd.name)
      } else if (vd.dimNames.nonEmpty) {
        // DIMENSION_LIST: vlen(objref)[ndims] resolved via the global heap
        val nd = vd.dimNames.length
        attrTriples += "DIMENSION_LIST" -> attrMessage("DIMENSION_LIST",
          h5VlenRefTypeBytes, dataspaceBytes(Seq(nd.toLong)), nd * 16) {
          vd.dimNames.zipWithIndex.foreach { case (dn, i) =>
            b.u32(1) // one reference per dimension
            b.addr("gheap")
            b.u32(gheapIndex((vd.name, dn, i)).toLong)
          }
        }
      }
      vd.attrs.foreach { case (n, v) => attrTriples += n -> scalarAttr(n, v) }
      val triples = attrTriples.result()
      if (denseAttrs && triples.nonEmpty) {
        val sz = pad8(2 + 2 * 8)
        msgs += ((0x15, sz, () => {
          val start = b.pos
          b.u8(0); b.u8(0) // version, flags: no creation-order tracking
          b.addr(s"fheapA:${vd.name}"); b.addr(s"namebtA:${vd.name}")
          b.zeros(sz - (b.pos - start))
        }))
        pendingDenseAttrs += vd.name -> triples
      } else triples.foreach(msgs += _._2)
      objectHeader(s"hdr:${vd.name}", msgs.result())
    }

    /** DENSE attribute storage for one dataset: attribute message bodies
      * as fractal-heap managed objects (emitted via the same closures the
      * compact path uses), indexed by a type-8 name v2-B-tree (8-byte
      * heap-ID field padded past the 7-byte managed ID, message flags,
      * creation order, lookup3 name hash).
      */
    def emitDenseAttrs(name: String,
                       attrs: Seq[(String, (Int, Int, () => Unit))]): Unit = {
      val offSize = 4
      val lenSize = 2
      val idLen = 1 + offSize + lenSize
      val dblockHdrLen = 4 + 1 + 8 + offSize + 4
      val needed = dblockHdrLen + attrs.map(_._2._2).sum
      var blockSize = 512
      while (blockSize < needed) blockSize <<= 1
      require(blockSize <= (1 << 16), s"$name: dense-attr fixture heap over 64K")
      b.padTo8(); b.mark(s"fheapA:$name")
      val hStart = b.pos
      b.bytes("FRHP".getBytes("US-ASCII")); b.u8(0)
      b.u16(idLen); b.u16(0)
      b.u8(0x02)
      b.u32(4096L)
      b.u64(0L); b.u64(-1L)
      b.u64(blockSize.toLong - needed); b.u64(-1L)
      b.u64(blockSize.toLong); b.u64(blockSize.toLong)
      b.u64(blockSize.toLong)
      b.u64(attrs.length.toLong)
      b.u64(0L); b.u64(0L); b.u64(0L); b.u64(0L)
      b.u16(4)
      b.u64(blockSize.toLong)
      b.u64(1L << 16)
      b.u16(32)
      b.u16(1)
      b.addr(s"fhdbA:$name")
      b.u16(0)
      val hCk = b.pos; b.u32(0); b.checksumOver(hCk, hStart, hCk)
      b.padTo8(); b.mark(s"fhdbA:$name")
      val dStart = b.pos
      b.bytes("FHDB".getBytes("US-ASCII")); b.u8(0)
      b.addr(s"fheapA:$name")
      (0 until offSize).foreach(_ => b.u8(0))
      val dCk = b.pos; b.u32(0)
      val heapOffs = attrs.map { case (_, (_, declared, emit)) =>
        val off = b.pos - dStart
        val before = b.pos
        emit()
        require(b.pos - before == declared,
          s"$name: dense attr wrote ${b.pos - before}, declared $declared")
        off
      }
      b.zeros(blockSize - (b.pos - dStart))
      b.checksumOver(dCk, dStart, dStart + blockSize)
      val recordSize = 8 + 1 + 4 + 4 // heap id, msg flags, corder, hash
      val nodeSize = 512
      require(attrs.length <= (nodeSize - 10) / recordSize,
        s"$name: dense-attr fixture over one leaf (${attrs.length} attrs)")
      val hashes = attrs.map { case (an, _) =>
        val nb = an.getBytes("UTF-8"); lookup3(nb, 0, nb.length, 0)
      }
      require(hashes.distinct.length == hashes.length,
        s"$name: attr-name hash collision in fixture")
      val order = attrs.indices.sortBy(i => hashes(i) & 0xFFFFFFFFL)
      b.padTo8(); b.mark(s"btlfA:$name")
      val lStart = b.pos
      b.bytes("BTLF".getBytes("US-ASCII")); b.u8(0); b.u8(8)
      order.foreach { i =>
        b.u8(0) // managed id: version 0, type managed
        b.u32(heapOffs(i).toLong)
        b.u16(attrs(i)._2._2)  // object length = the stored message body
        b.u8(0)                // pad the 8-byte heap-ID field
        b.u8(0)                // message flags
        b.u32(i.toLong)        // creation order
        b.u32(hashes(i).toLong & 0xFFFFFFFFL)
      }
      val lCk = b.pos; b.u32(0); b.checksumOver(lCk, lStart, lCk)
      b.padTo8(); b.mark(s"namebtA:$name")
      val bStart = b.pos
      b.bytes("BTHD".getBytes("US-ASCII")); b.u8(0); b.u8(8)
      b.u32(nodeSize.toLong); b.u16(recordSize); b.u16(0)
      b.u8(100); b.u8(40)
      b.addr(s"btlfA:$name")
      b.u16(attrs.length)
      b.u64(attrs.length.toLong)
      val bCk = b.pos; b.u32(0); b.checksumOver(bCk, bStart, bCk)
    }

    // global heap object index per (var, dim, position)
    lazy val gheapIndex: Map[(String, String, Int), Int] = {
      val entries = for {
        (vd, _) <- vars if !dimNames.contains(vd.name) && vd.dimNames.nonEmpty
        (dn, i) <- vd.dimNames.zipWithIndex
      } yield (vd.name, dn, i)
      entries.zipWithIndex.map { case (k, i) => k -> (i + 1) }.toMap
    }

    // ---- superblock ----
    b.bytes(Signature)
    b.u8(0)            // superblock v0
    b.u8(0); b.u8(0); b.u8(0); b.u8(0) // freespace, root STE, reserved, shm versions
    b.u8(8); b.u8(8)   // sizes of offsets and lengths
    b.u8(0)
    b.u16(4); b.u16(16) // group leaf / internal K
    b.u32(0)           // consistency flags
    b.u64(0)           // base address
    b.u64(-1L)         // freespace (undefined)
    b.addr("eof")
    b.u64(-1L)         // driver info (undefined)
    // root group symbol table entry
    b.u64(0)           // link name offset ("")
    b.addr("hdr:/")
    b.u32(0); b.u32(0); b.zeros(16)

    // one level of groups for fixtures/export: a "g/x" variable name
    // places dataset x inside child group g (its own local heap + B-tree
    // + SNOD, reached through a symbol-table message on the group header)
    require(varNames.forall(_.count(_ == '/') <= 1),
      "at most one group level in the fixture writer")
    val groupsOf: Map[String, Seq[String]] =
      varNames.filter(_.contains("/")).groupBy(_.takeWhile(_ != '/'))
    require(!groupsOf.keySet.exists(varNames.contains),
      "a group name cannot also be a dataset name")

    /** DENSE link storage for one group (the past-compact-threshold
      * layout libhdf5 switches to): the link messages live as managed
      * objects in a fractal heap (one root direct block, offsets
      * covering the block header per libhdf5's managed-space
      * convention, in-header checksum computed with its field zeroed),
      * indexed by a name v2-B-tree (record type 5: lookup3 name hash +
      * 7-byte managed heap ID; single leaf root — ample for fixtures).
      */
    def emitDenseLinks(tag: String, entries: Seq[(String, String)]): Unit = {
      val names = entries.map(_._1.getBytes("UTF-8"))
      val msgLens = names.map(n => 2 + 1 + n.length + 8)
      val offSize = 4            // max heap size 32 bits
      val lenSize = 2            // min(width(maxDirect=64K)=2, enc(maxManObj=4096)=2)
      val idLen = 1 + offSize + lenSize
      val dblockHdrLen = 4 + 1 + 8 + offSize + 4 // checksummed
      val needed = dblockHdrLen + msgLens.sum
      var blockSize = 512
      while (blockSize < needed) blockSize <<= 1
      require(blockSize <= (1 << 16), s"$tag: dense-link fixture heap over 64K")
      // FRHP
      b.padTo8(); b.mark(s"fheap:$tag")
      val hStart = b.pos
      b.bytes("FRHP".getBytes("US-ASCII")); b.u8(0)
      b.u16(idLen); b.u16(0) // id length, no I/O filters
      b.u8(0x02)             // flags: checksum direct blocks
      b.u32(4096L)           // max managed object size
      b.u64(0L); b.u64(-1L)  // next huge id, huge v2-btree
      b.u64(blockSize.toLong - needed); b.u64(-1L) // free space, fs manager
      b.u64(blockSize.toLong); b.u64(blockSize.toLong) // managed, allocated
      b.u64(blockSize.toLong) // direct-block iterator offset
      b.u64(entries.length.toLong) // managed objects
      b.u64(0L); b.u64(0L); b.u64(0L); b.u64(0L) // huge/tiny size+count
      b.u16(4)               // table width
      b.u64(blockSize.toLong)      // starting block size
      b.u64(1L << 16)        // maximum direct block size
      b.u16(32)              // maximum heap size (bits)
      b.u16(1)               // starting rows in root indirect block
      b.addr(s"fhdb:$tag")
      b.u16(0)               // current rows: 0 = root is a direct block
      val hCk = b.pos; b.u32(0); b.checksumOver(hCk, hStart, hCk)
      // FHDB root direct block (heap offset 0, length blockSize)
      b.padTo8(); b.mark(s"fhdb:$tag")
      val dStart = b.pos
      b.bytes("FHDB".getBytes("US-ASCII")); b.u8(0)
      b.addr(s"fheap:$tag")
      (0 until offSize).foreach(_ => b.u8(0)) // block offset = 0
      val dCk = b.pos; b.u32(0)
      val heapOffs = entries.indices.map { i =>
        val off = b.pos - dStart // managed offsets include the block header
        val (_, hdrLabel) = entries(i)
        b.u8(1); b.u8(0)                 // link msg v1, flags 0
        b.u8(names(i).length)            // 1-byte name length
        b.bytes(names(i))
        b.addr(hdrLabel)
        off
      }
      b.zeros(blockSize - (b.pos - dStart))
      // in-header checksum over the WHOLE block with the field zeroed
      b.checksumOver(dCk, dStart, dStart + blockSize)
      // name-index v2-B-tree: single leaf with (hash, heap id) records
      val recordSize = 4 + idLen
      val nodeSize = 512
      require(entries.length <= (nodeSize - 10) / recordSize,
        s"$tag: dense-link fixture over one leaf (${entries.length} links)")
      val hashes = names.map(n => lookup3(n, 0, n.length, 0))
      require(hashes.distinct.length == hashes.length,
        s"$tag: name-hash collision in fixture (pick different names)")
      val order = entries.indices.sortBy(i => hashes(i) & 0xFFFFFFFFL)
      b.padTo8(); b.mark(s"btlf:$tag")
      val lStart = b.pos
      b.bytes("BTLF".getBytes("US-ASCII")); b.u8(0); b.u8(5)
      order.foreach { i =>
        b.u32(hashes(i).toLong & 0xFFFFFFFFL)
        b.u8(0) // managed id: version 0, type managed
        b.u32(heapOffs(i).toLong)
        b.u16(msgLens(i)) // object length = the stored link message
      }
      val lCk = b.pos; b.u32(0); b.checksumOver(lCk, lStart, lCk)
      // BTHD (depth 0: the leaf IS the root)
      b.padTo8(); b.mark(s"namebt:$tag")
      val bStart = b.pos
      b.bytes("BTHD".getBytes("US-ASCII")); b.u8(0); b.u8(5)
      b.u32(nodeSize.toLong); b.u16(recordSize); b.u16(0)
      b.u8(100); b.u8(40)
      b.addr(s"btlf:$tag")
      b.u16(entries.length)
      b.u64(entries.length.toLong)
      val bCk = b.pos; b.u32(0); b.checksumOver(bCk, bStart, bCk)
    }

    /** Local heap + single-node group B-tree + SNOD for one group. */
    def emitSymbolTable(tag: String, entries: Seq[(String, String)]): Unit = {
      val sorted = entries.sortBy(_._1)
      val nameOffsets = scala.collection.mutable.HashMap[String, Long]()
      val heapData = {
        val hb = new Buf
        hb.zeros(8) // "" at offset 0
        sorted.foreach { case (n, _) =>
          nameOffsets(n) = hb.pos.toLong
          hb.bytes(n.getBytes("UTF-8") :+ 0.toByte)
          hb.padTo8()
        }
        hb.result()
      }
      b.padTo8(); b.mark(s"heap:$tag")
      b.bytes("HEAP".getBytes("US-ASCII"))
      b.u8(0); b.zeros(3)
      b.u64(heapData.length.toLong)
      b.u64(-1L) // no free list
      b.addr(s"heapdata:$tag")
      b.padTo8(); b.mark(s"heapdata:$tag")
      b.bytes(heapData)
      b.padTo8(); b.mark(s"btree:$tag")
      b.bytes("TREE".getBytes("US-ASCII"))
      b.u8(0); b.u8(0) // node type 0 (group), level 0
      b.u16(1)
      b.u64(-1L); b.u64(-1L) // siblings
      b.u64(0) // key 0: ""
      b.addr(s"snod:$tag")
      b.u64(nameOffsets(sorted.last._1)) // key 1: largest name
      b.padTo8(); b.mark(s"snod:$tag")
      b.bytes("SNOD".getBytes("US-ASCII"))
      b.u8(1); b.u8(0)
      b.u16(sorted.length)
      sorted.foreach { case (n, hdrLabel) =>
        b.u64(nameOffsets(n))
        b.addr(hdrLabel)
        b.u32(0); b.u32(0); b.zeros(16)
      }
    }

    // ---- root group header: symbol-table message (or Link Info for the
    // dense layout) + global attributes ----
    val linkInfoSize = pad8(2 + 2 * 8)
    def linkInfoMsg(tag: String): (Int, Int, () => Unit) =
      (0x02, linkInfoSize, () => {
        val start = b.pos
        b.u8(0); b.u8(0) // version, flags: no creation-order tracking
        b.addr(s"fheap:$tag"); b.addr(s"namebt:$tag")
        b.zeros(linkInfoSize - (b.pos - start))
      })
    locally {
      val msgs = Seq.newBuilder[(Int, Int, () => Unit)]
      if (denseLinks) msgs += linkInfoMsg("/")
      else msgs += ((0x11, 16, () => { b.addr("btree:/"); b.addr("heap:/") }))
      gatts.foreach { case (n, v) => msgs += scalarAttr(n, v) }
      objectHeader("hdr:/", msgs.result())
    }
    val rootEntries =
      varNames.filterNot(_.contains("/")).map(n => (n, s"hdr:$n")) ++
        groupsOf.keys.map(g => (g, s"hdr:$g"))
    if (denseLinks) emitDenseLinks("/", rootEntries)
    else emitSymbolTable("/", rootEntries)

    // ---- child group headers + their link storage ----
    groupsOf.toSeq.sortBy(_._1).foreach { case (g, members) =>
      val entries = members.map(m => (m.drop(g.length + 1), s"hdr:$m"))
      if (denseLinks) {
        objectHeader(s"hdr:$g", Seq(linkInfoMsg(g)))
        emitDenseLinks(g, entries)
      } else {
        objectHeader(s"hdr:$g", Seq(
          (0x11, 16, () => { b.addr(s"btree:$g"); b.addr(s"heap:$g") })))
        emitSymbolTable(g, entries)
      }
    }

    // ---- dataset object headers (+ their dense attribute heaps) ----
    vars.foreach { case (vd, _) => datasetHeader(vd, dimNames.contains(vd.name)) }
    pendingDenseAttrs.foreach { case (nm, ats) => emitDenseAttrs(nm, ats) }

    // ---- global heap (DIMENSION_LIST payloads) ----
    if (gheapIndex.nonEmpty) {
      b.padTo8(); b.mark("gheap")
      val objBytes = gheapIndex.size * 24
      b.bytes("GCOL".getBytes("US-ASCII"))
      b.u8(1); b.zeros(3)
      b.u64((16 + objBytes + 16).toLong) // header + objects + free-space object
      gheapIndex.toSeq.sortBy(_._2).foreach { case ((_, dn, _), idx) =>
        b.u16(idx); b.u16(1); b.u32(0)
        b.u64(8)
        b.addr(s"hdr:$dn")
      }
      b.u16(0); b.u16(0); b.u32(0); b.u64(0) // free-space terminator
    }

    // ---- data blocks ----
    def emitValuesTo(bb: Buf, tpe: NetCdf.NcType, data: Array[Double]): Unit = {
      import NetCdf._
      tpe match {
        case NcDouble => data.foreach(bb.f64)
        case NcFloat => data.foreach(d => bb.f32(d.toFloat))
        case NcInt | NcUInt => data.foreach(d => bb.u32(d.toLong & 0xFFFFFFFFL))
        case NcShort | NcUShort => data.foreach(d => bb.u16(d.toLong.toInt & 0xFFFF))
        case NcByte | NcUByte | NcChar => data.foreach(d => bb.u8(d.toLong.toInt & 0xFF))
        case NcInt64 | NcUInt64 => data.foreach(d => bb.u64(d.toLong))
      }
    }
    def emitValues(tpe: NetCdf.NcType, data: Array[Double]): Unit =
      emitValuesTo(b, tpe, data)
    def valueBytes(tpe: NetCdf.NcType, data: Array[Double]): Array[Byte] = {
      val tmp = new Buf; emitValuesTo(tmp, tpe, data); tmp.result()
    }
    // Extensible Array chunk index (latest format, unlimited-dim shape):
    // EAHD header, EAIB index block (inline elements + direct data-block
    // pointers), EASB super blocks (with page-init bitmaps when their
    // data blocks page), EADB data blocks. Sizes are all computable up
    // front, so positions are assigned first and every structure is
    // emitted with its final addresses inside — checksums cover the real
    // bytes, no patch sites.
    def emitExtensibleArray(name: String, addrs: Array[Long], sizes: Array[Int],
                            filtered: Boolean): Unit = {
      val pEa = eaParams
      val client = if (filtered) 1 else 0
      val entrySize = if (filtered) 16 else 8
      val n = addrs.length
      require(n <= (1L << pEa.maxNelmtsBits), s"$name: too many chunks for EA params")
      b.padTo8()
      val base = b.pos.toLong
      val hdrLen = 4 + 1 + 1 + 6 + 6 * 8 + 8 + 4
      val ibLen = 4 + 1 + 1 + 8 + pEa.idxBlkElmts * entrySize +
        (pEa.ndblkAddrs + pEa.nsblkAddrs) * 8 + 4
      val arrOff = pEa.arrOffSize
      val sblkSpace = math.max(0L, n.toLong - pEa.idxBlkElmts)
      def dblkLen(ne: Long): Int = {
        val npages = if (ne > pEa.pageNelmts) (ne / pEa.pageNelmts).toInt else 0
        val prefix = 4 + 1 + 1 + 8 + arrOff
        if (npages == 0) prefix + (ne * entrySize).toInt + 4
        else prefix + 4 + npages * ((pEa.pageNelmts * entrySize).toInt + 4)
      }
      // which direct data blocks / super blocks hold any real element?
      val directNeeded = (0 until pEa.ndblkAddrs).map { j =>
        val u = pEa.directOwner(j.toLong)
        val (_, ne, startIdx, startDblk) = pEa.sblkInfo(u)
        require(ne <= pEa.pageNelmts,
          s"$name: EA params page an index-block data block (pick a larger page)")
        startIdx + (j - startDblk) * ne < sblkSpace
      }
      val sblkNeeded = (0 until pEa.nsblkAddrs).map { t =>
        pEa.sblkInfo(pEa.iblockNsblks + t)._3 < sblkSpace
      }
      def sblkLen(u: Int): Int = {
        val (ndblks, ne, _, _) = pEa.sblkInfo(u)
        val npagesPer = if (ne > pEa.pageNelmts) (ne / pEa.pageNelmts).toInt else 0
        val bitmapBytes = if (npagesPer > 0) (ndblks * npagesPer + 7) / 8 else 0
        4 + 1 + 1 + 8 + arrOff + bitmapBytes + ndblks * 8 + 4
      }
      // position assignment: EAHD, EAIB, needed direct dblocks, then per
      // needed super block its EASB followed by its needed dblocks
      var cursor = base + hdrLen + ibLen
      val directAddrs = (0 until pEa.ndblkAddrs).map { j =>
        if (!directNeeded(j)) Undef
        else {
          val u = pEa.directOwner(j.toLong)
          val a = cursor; cursor += dblkLen(pEa.sblkInfo(u)._2); a
        }
      }
      // per super block: its EASB, then its data blocks — the emission order
      val sblkAddrs = new Array[Long](pEa.nsblkAddrs)
      val sblkDblkAddrs = new Array[IndexedSeq[Long]](pEa.nsblkAddrs)
      (0 until pEa.nsblkAddrs).foreach { t =>
        val u = pEa.iblockNsblks + t
        val (ndblks, ne, startIdx, _) = pEa.sblkInfo(u)
        if (!sblkNeeded(t)) {
          sblkAddrs(t) = Undef
          sblkDblkAddrs(t) = IndexedSeq.fill(ndblks)(Undef)
        } else {
          sblkAddrs(t) = cursor; cursor += sblkLen(u)
          sblkDblkAddrs(t) = (0 until ndblks).map { d =>
            if (startIdx + d.toLong * ne >= sblkSpace) Undef
            else { val a = cursor; cursor += dblkLen(ne); a }
          }
        }
      }
      def putElem(bb: ByteBuffer, g: Long): Unit =
        if (g < n) {
          bb.putLong(addrs(g.toInt))
          if (filtered) { bb.putInt(sizes(g.toInt)); bb.putInt(0) }
        } else {
          bb.putLong(-1L)
          if (filtered) { bb.putInt(0); bb.putInt(0) }
        }
      // EAHD
      val h = ByteBuffer.allocate(hdrLen).order(ByteOrder.LITTLE_ENDIAN)
      h.put("EAHD".getBytes("US-ASCII")); h.put(0.toByte); h.put(client.toByte)
      h.put(entrySize.toByte); h.put(pEa.maxNelmtsBits.toByte)
      h.put(pEa.idxBlkElmts.toByte); h.put(pEa.dataBlkMinElmts.toByte)
      h.put(pEa.supBlkMinDataPtrs.toByte); h.put(pEa.maxDblkPageNelmtsBits.toByte)
      h.putLong(sblkNeeded.count(identity).toLong)          // super blocks
      h.putLong(sblkAddrs.indices.filter(sblkNeeded).map(t =>
        sblkLen(pEa.iblockNsblks + t).toLong).sum)          // super block bytes
      val nDblksUsed = directNeeded.count(identity) +
        sblkDblkAddrs.map(_.count(_ != Undef)).sum
      h.putLong(nDblksUsed.toLong)                          // data blocks
      h.putLong((cursor - base - hdrLen - ibLen) -
        sblkAddrs.indices.filter(sblkNeeded).map(t =>
          sblkLen(pEa.iblockNsblks + t).toLong).sum)        // data block bytes
      h.putLong(n.toLong)                                   // max index set
      h.putLong(n.toLong)                                   // realized elements
      h.putLong(base + hdrLen)                              // index block addr
      h.putInt(lookup3(h.array(), 0, hdrLen - 4, 0))
      b.mark(s"eahd:$name"); b.bytes(h.array())
      require(b.pos.toLong == base + hdrLen)
      // EAIB
      val ibb = ByteBuffer.allocate(ibLen).order(ByteOrder.LITTLE_ENDIAN)
      ibb.put("EAIB".getBytes("US-ASCII")); ibb.put(0.toByte); ibb.put(client.toByte)
      ibb.putLong(base)
      (0 until pEa.idxBlkElmts).foreach(i => putElem(ibb, i.toLong))
      directAddrs.foreach(ibb.putLong)
      sblkAddrs.foreach(ibb.putLong)
      ibb.putInt(lookup3(ibb.array(), 0, ibLen - 4, 0))
      b.bytes(ibb.array())
      def emitDblock(addr: Long, ne: Long, elemStart: Long, blockOff: Long): Unit = {
        val npages = if (ne > pEa.pageNelmts) (ne / pEa.pageNelmts).toInt else 0
        val len = dblkLen(ne)
        require(b.pos.toLong == addr, s"$name: EA data block position drift")
        val prefix = 4 + 1 + 1 + 8 + arrOff
        val coreLen = prefix + (if (npages == 0) (ne * entrySize).toInt else 0) + 4
        val dbb = ByteBuffer.allocate(coreLen).order(ByteOrder.LITTLE_ENDIAN)
        dbb.put("EADB".getBytes("US-ASCII")); dbb.put(0.toByte); dbb.put(client.toByte)
        dbb.putLong(base)
        var k = 0 // block offset, arrOffSize bytes little-endian
        while (k < arrOff) { dbb.put(((blockOff >> (8 * k)) & 0xFF).toByte); k += 1 }
        if (npages == 0) (0L until ne).foreach(i => putElem(dbb, elemStart + i))
        dbb.putInt(lookup3(dbb.array(), 0, coreLen - 4, 0))
        b.bytes(dbb.array())
        if (npages > 0) {
          val pageLen = (pEa.pageNelmts * entrySize).toInt + 4
          var pg = 0
          while (pg < npages) {
            val pb = ByteBuffer.allocate(pageLen).order(ByteOrder.LITTLE_ENDIAN)
            (0L until pEa.pageNelmts).foreach(i =>
              putElem(pb, elemStart + pg * pEa.pageNelmts + i))
            pb.putInt(lookup3(pb.array(), 0, pageLen - 4, 0))
            b.bytes(pb.array())
            pg += 1
          }
        }
        val _ = len
      }
      directAddrs.zipWithIndex.foreach { case (a, j) =>
        if (a != Undef) {
          val u = pEa.directOwner(j.toLong)
          val (_, ne, startIdx, startDblk) = pEa.sblkInfo(u)
          val elemStart = pEa.idxBlkElmts + startIdx + (j - startDblk) * ne
          emitDblock(a, ne, elemStart, elemStart)
        }
      }
      sblkAddrs.zipWithIndex.foreach { case (sa, t) =>
        if (sa != Undef) {
          val u = pEa.iblockNsblks + t
          val (ndblks, ne, startIdx, _) = pEa.sblkInfo(u)
          val npagesPer = if (ne > pEa.pageNelmts) (ne / pEa.pageNelmts).toInt else 0
          val bitmapBytes = if (npagesPer > 0) (ndblks * npagesPer + 7) / 8 else 0
          val len = sblkLen(u)
          require(b.pos.toLong == sa, s"$name: EA super block position drift")
          val sbb = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
          sbb.put("EASB".getBytes("US-ASCII")); sbb.put(0.toByte); sbb.put(client.toByte)
          sbb.putLong(base)
          val blockOff = pEa.idxBlkElmts + startIdx
          var k = 0
          while (k < arrOff) { sbb.put(((blockOff >> (8 * k)) & 0xFF).toByte); k += 1 }
          if (npagesPer > 0) {
            // page-init bitmap: a page is initialized iff it holds any
            // real element (chunks are the contiguous prefix 0..n-1)
            var bit = 0
            while (bit < ndblks * npagesPer) {
              val d = bit / npagesPer; val pg = bit % npagesPer
              val pageStart = pEa.idxBlkElmts + startIdx + d.toLong * ne +
                pg * pEa.pageNelmts
              if (pageStart < n && sblkDblkAddrs(t)(d) != Undef)
                sbb.put(14 + arrOff + bit / 8,
                  (sbb.get(14 + arrOff + bit / 8) | (1 << (bit % 8))).toByte)
              bit += 1
            }
            sbb.position(14 + arrOff + bitmapBytes)
          }
          sblkDblkAddrs(t).foreach(sbb.putLong)
          sbb.position(len - 4)
          sbb.putInt(lookup3(sbb.array(), 0, len - 4, 0))
          b.bytes(sbb.array())
          sblkDblkAddrs(t).zipWithIndex.foreach { case (da, d) =>
            if (da != Undef) {
              val elemStart = pEa.idxBlkElmts + startIdx + d.toLong * ne
              emitDblock(da, ne, elemStart, elemStart)
            }
          }
        }
      }
      require(b.pos.toLong == cursor, s"$name: EA layout size accounting drift")
    }
    // Version 2 B-tree chunk index (latest format, the multi-unlimited-dim
    // shape): "BTHD" header → "BTIN" internal nodes → "BTLF" leaves, with
    // libhdf5's exact per-level geometry so the variable-width pointer
    // fields round-trip. Records are split evenly across the minimum-depth
    // tree; node addresses are forward labels (checksums resolve after
    // patching). Chunk i is the writer's outer slice i → scaled offsets
    // (i, 0, …).
    def emitBTree2(name: String, addrs: Array[Long], sizes: Array[Int],
                   filtered: Boolean, rank: Int, rawChunkBytes: Long): Unit = {
      val n = addrs.length
      val csl = bt2ChunkSizeLen(rawChunkBytes)
      val recordSize = 8 + (if (filtered) csl + 4 else 0) + 8 * rank
      val recType = if (filtered) 11 else 10
      var depth = 0
      var geo = Bt2Geometry(bt2NodeSize, recordSize, 8, 0)
      while (geo.info(depth)._2 < n) {
        depth += 1
        geo = Bt2Geometry(bt2NodeSize, recordSize, 8, depth)
      }
      require(geo.maxLeafRec >= 2 && n <= 65535,
        s"$name: b-tree fixture needs ≥2 records per leaf and ≤65535 chunks " +
          s"(node size $bt2NodeSize, record size $recordSize, $n chunks)")
      final case class Node(records: IndexedSeq[Int], children: IndexedSeq[Node]) {
        def total: Long = records.length + children.map(_.total).sum
      }
      def plan(lo: Int, hi: Int, d: Int): Node =
        if (d == 0) Node((lo until hi).toIndexedSeq, IndexedSeq.empty)
        else {
          val count = hi - lo
          val childCap = geo.info(d - 1)._2
          val c = ((count + 1).toLong + childCap) / (childCap + 1) // ceil
          require(c >= 2 && c - 1 <= geo.info(d)._1,
            s"$name: b-tree plan drift (depth $d, $count records, $c children)")
          val inChildren = count - (c - 1).toInt
          val base = inChildren / c.toInt
          val extra = inChildren % c.toInt
          var pos = lo
          val seps = IndexedSeq.newBuilder[Int]
          val kids = IndexedSeq.newBuilder[Node]
          (0 until c.toInt).foreach { i =>
            val len = base + (if (i < extra) 1 else 0)
            kids += plan(pos, pos + len, d - 1)
            pos += len
            if (i < c - 1) { seps += pos; pos += 1 }
          }
          require(pos == hi, s"$name: b-tree plan accounting drift")
          Node(seps.result(), kids.result())
        }
      val root = plan(0, n, depth)
      def emitRecord(i: Int): Unit = {
        b.u64(addrs(i))
        if (filtered) {
          var k = 0
          while (k < csl) { b.u8(((sizes(i).toLong >> (8 * k)) & 0xFF).toInt); k += 1 }
          b.u32(0) // filter mask: all filters applied
        }
        b.u64(i.toLong)
        (1 until rank).foreach(_ => b.u64(0L))
      }
      def emitVarInt(v: Long, w: Int): Unit = {
        var k = 0
        while (k < w) { b.u8(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
      }
      var nodeId = 0
      def emitNode(node: Node, d: Int): String = {
        val label = s"bt2nd:$name:$nodeId"; nodeId += 1
        // children first (pre-assigning ids depth-first keeps labels stable)
        val childLabels = node.children.map(emitNode(_, d - 1))
        b.padTo8(); b.mark(label)
        val start = b.pos
        if (d == 0) {
          b.bytes("BTLF".getBytes("US-ASCII")); b.u8(0); b.u8(recType)
          node.records.foreach(emitRecord)
        } else {
          b.bytes("BTIN".getBytes("US-ASCII")); b.u8(0); b.u8(recType)
          node.records.foreach(emitRecord)
          node.children.zip(childLabels).foreach { case (child, cl) =>
            b.addr(cl)
            emitVarInt(child.records.length.toLong, geo.maxNrecSize)
            if (d > 1) emitVarInt(child.total, geo.info(d - 1)._3)
          }
        }
        val ck = b.pos; b.u32(0); b.checksumOver(ck, start, ck)
        label
      }
      val rootLabel = emitNode(root, depth)
      b.padTo8(); b.mark(s"bt2hd:$name")
      val start = b.pos
      b.bytes("BTHD".getBytes("US-ASCII")); b.u8(0); b.u8(recType)
      b.u32(bt2NodeSize.toLong); b.u16(recordSize); b.u16(depth)
      b.u8(100); b.u8(40)
      b.addr(rootLabel)
      b.u16(root.records.length)
      b.u64(n.toLong)
      val ck = b.pos; b.u32(0); b.checksumOver(ck, start, ck)
    }
    // Fixed Array chunk index (latest format): "FAHD" header + "FADB"
    // data block (+ element pages when paged), lookup3-checksummed.
    // Emitted AFTER the chunks so every address inside is final and the
    // checksums cover the real bytes — no patch sites.
    def emitFixedArray(name: String, addrs: Array[Long], sizes: Array[Int],
                       filtered: Boolean): Unit = {
      val client = if (filtered) 1 else 0
      val entrySize = if (filtered) 16 else 8 // addr (+ u32 size + u32 mask)
      val nelems = addrs.length
      val pageBits = pageBitsFor(nelems)
      val pageElems = 1L << pageBits
      val paged = nelems > pageElems
      val npages = if (paged) ((nelems + pageElems - 1) / pageElems).toInt else 0
      b.padTo8()
      val fahdPos = b.pos.toLong
      val hdrLen = 4 + 1 + 1 + 1 + 1 + 8 + 8 + 4
      val h = ByteBuffer.allocate(hdrLen).order(ByteOrder.LITTLE_ENDIAN)
      h.put("FAHD".getBytes("US-ASCII")); h.put(0.toByte); h.put(client.toByte)
      h.put(entrySize.toByte); h.put(pageBits.toByte)
      h.putLong(nelems.toLong); h.putLong(fahdPos + hdrLen)
      h.putInt(lookup3(h.array(), 0, hdrLen - 4, 0))
      b.mark(s"fahd:$name"); b.bytes(h.array())
      def putElems(eb: ByteBuffer, from: Int, count: Int): Unit = {
        var i = 0
        while (i < count) {
          eb.putLong(addrs(from + i))
          if (filtered) { eb.putInt(sizes(from + i)); eb.putInt(0) }
          i += 1
        }
      }
      val prefixLen = 4 + 1 + 1 + 8
      val bitmapBytes = if (paged) (npages + 7) / 8 else 0
      val blockLen = prefixLen + bitmapBytes +
        (if (paged) 0 else nelems * entrySize) + 4
      val d = ByteBuffer.allocate(blockLen).order(ByteOrder.LITTLE_ENDIAN)
      d.put("FADB".getBytes("US-ASCII")); d.put(0.toByte); d.put(client.toByte)
      d.putLong(fahdPos)
      if (paged) {
        var p = 0
        while (p < npages) { // every page initialized by this writer
          d.put(prefixLen + p / 8, (d.get(prefixLen + p / 8) | (1 << (p % 8))).toByte)
          p += 1
        }
      } else putElems(d, 0, nelems)
      d.position(blockLen - 4)
      d.putInt(lookup3(d.array(), 0, blockLen - 4, 0))
      b.bytes(d.array())
      if (paged) {
        var p = 0
        while (p < npages) {
          val count = math.min(pageElems, nelems.toLong - p * pageElems).toInt
          val plen = count * entrySize + 4
          val pb = ByteBuffer.allocate(plen).order(ByteOrder.LITTLE_ENDIAN)
          putElems(pb, (p * pageElems).toInt, count)
          pb.position(plen - 4)
          pb.putInt(lookup3(pb.array(), 0, plen - 4, 0))
          b.bytes(pb.array())
          p += 1
        }
      }
    }
    vars.foreach { case (vd, data) =>
      val shape = vd.dimNames.map(dimLen)
      val nVals = shape.map(_.toLong).product
      require(data.length == nVals, s"${vd.name}: ${data.length} values for $nVals cells")
      val isDim = dimNames.contains(vd.name)
      if (chunked && !isDim && shape.nonEmpty) {
        val outer = shape.head
        val innerCount = shape.drop(1).map(_.toLong).product.toInt
        val nChunks = (outer + chunkOuter - 1) / chunkOuter
        val chunkVals = chunkOuter * innerCount
        val storedSizes = new Array[Int](nChunks)
        val storedAddrs = new Array[Long](nChunks)
        val storedMasks = new Array[Int](nChunks)
        (0 until nChunks).foreach { i =>
          b.padTo8(); b.mark(s"chunk:${vd.name}:$i")
          storedAddrs(i) = b.pos.toLong
          val lo = i * chunkOuter
          val hi = math.min(outer, lo + chunkOuter)
          // edge chunks are stored full-size (HDF5 semantics): pad with 0
          val slice = new Array[Double](chunkVals)
          System.arraycopy(data, lo * innerCount, slice, 0, (hi - lo) * innerCount)
          val isEdge = hi - lo < chunkOuter
          if (deflate > 0 && !(dontFilterEdge && isEdge)) {
            val isFloatT = vd.tpe == NetCdf.NcFloat || vd.tpe == NetCdf.NcDouble
            val signedT = vd.tpe match {
              case NetCdf.NcUByte | NetCdf.NcUShort | NetCdf.NcUInt |
                   NetCdf.NcUInt64 => false
              case _ => true
            }
            val (stored, mask) = storedChunkPipeline(valueBytes(vd.tpe, slice),
              vd.tpe.size, deflate, chunkCodec, signed = signedT,
              isFloat = isFloatT)
            storedSizes(i) = stored.length
            storedMasks(i) = mask
            b.bytes(stored)
          } else {
            storedSizes(i) = chunkVals * vd.tpe.size
            emitValues(vd.tpe, slice)
          }
        }
        if (layoutVersion == 4) {
          if (bt2Index) {
            emitBTree2(vd.name, storedAddrs, storedSizes, deflate > 0,
              shape.length, chunkVals.toLong * vd.tpe.size)
          } else if (eaIndex) {
            emitExtensibleArray(vd.name, storedAddrs, storedSizes, deflate > 0)
          } else if (implicitIndex) {
            // Implicit index: the chunks ARE the index — address of chunk 0,
            // stride = chunk bytes. padTo8 between chunks must be a no-op.
            require((chunkVals.toLong * vd.tpe.size) % 8 == 0,
              s"${vd.name}: implicit index fixture needs 8-aligned chunks")
            require(storedAddrs.zipWithIndex.forall { case (a, i) =>
              a == storedAddrs(0) + i.toLong * chunkVals * vd.tpe.size },
              s"${vd.name}: implicit chunks not contiguous")
          } else if (nChunks == 1) {
            // Single Chunk index: the layout message points straight at
            // the chunk; only the filtered stored-size needs resolving
            if (deflate > 0) b.define(s"chunksz:${vd.name}", storedSizes(0).toLong)
          } else {
            emitFixedArray(vd.name, storedAddrs, storedSizes, deflate > 0)
          }
        } else {
          val rank = shape.length
          b.padTo8(); b.mark(s"chunkbt:${vd.name}")
          b.bytes("TREE".getBytes("US-ASCII"))
          b.u8(1); b.u8(0) // node type 1 (chunk), level 0
          b.u16(nChunks)
          b.u64(-1L); b.u64(-1L)
          (0 until nChunks).foreach { i =>
            b.u32(storedSizes(i).toLong); b.u32(storedMasks(i).toLong)
            b.u64(i.toLong * chunkOuter); shape.drop(1).foreach(_ => b.u64(0)); b.u64(0)
            b.addr(s"chunk:${vd.name}:$i")
          }
          // final (upper bound) key
          b.u32(0); b.u32(0)
          b.u64(nChunks.toLong * chunkOuter)
          shape.drop(1).foreach(d => b.u64(d.toLong)); b.u64(0)
          val _ = rank
        }
      } else {
        b.padTo8(); b.mark(s"data:${vd.name}")
        emitValues(vd.tpe, data)
      }
    }

    b.mark("eof")
    val bytes = b.result()
    val out = new java.io.FileOutputStream(path)
    try out.write(bytes) finally out.close()
  }
}
