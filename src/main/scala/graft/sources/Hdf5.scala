package graft.sources

import java.nio.file.{Files, Paths}

/** Minimal pure-JVM HDF5 codec for the reference's `atoms.h5` dict
  * format (reference io.py:442–522 save/load_dict_to_h5, atoms.py:
  * 366–476 Atoms.read/to_dict/write) — no HDF5 library exists in this
  * environment, so this implements the subset of the published HDF5
  * File Format Specification that h5py's earliest-compatible writer
  * emits:
  *
  *  - superblock version 0, 8-byte offsets/lengths
  *  - symbol-table groups: v1 B-tree (TREE) → SNOD entries → names in
  *    a local heap (HEAP)
  *  - version-1 object headers with continuation blocks
  *  - messages: dataspace (0x0001, v1), datatype (0x0003), layout
  *    (0x0008, v3 contiguous + compact), symbol table (0x0011),
  *    continuation (0x0010); others skipped
  *  - datatypes: fixed-point (class 0, 1/2/4/8-byte LE), IEEE float
  *    (class 1, f4/f8 LE), fixed strings (class 3), enums over
  *    fixed-point (class 8 — numpy bools), variable-length strings
  *    (class 9 over a GCOL global heap)
  *
  * The READER parses the reference's real fixtures
  * (tests/files/test.h5); the WRITER emits the same subset (fixed
  * strings instead of vlen) for round-trip fixtures.
  */
object Hdf5 {

  // ------------------------------------------------------------ model

  sealed trait Node
  final case class Group(items: Map[String, Node]) extends Node
  final case class LongData(dims: Seq[Long], data: Array[Long]) extends Node
  final case class DoubleData(dims: Seq[Long], data: Array[Double]) extends Node
  final case class StrData(dims: Seq[Long], data: Array[String]) extends Node

  object LongScalar {
    def unapply(n: Node): Option[Long] = n match {
      case LongData(dims, d) if dims.isEmpty && d.length == 1 => Some(d(0))
      case _ => None
    }
  }
  object StrScalar {
    def unapply(n: Node): Option[String] = n match {
      case StrData(dims, d) if dims.isEmpty && d.length == 1 => Some(d(0))
      case _ => None
    }
  }

  // ------------------------------------------------------------ reader

  private final class Buf(val b: Array[Byte]) {
    def u8(o: Long): Int = b(o.toInt) & 0xFF
    def u16(o: Long): Int = u8(o) | (u8(o + 1) << 8)
    def u32(o: Long): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    def u64(o: Long): Long = u32(o) | (u32(o + 4) << 32)
    def bytes(o: Long, n: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(b, o.toInt, o.toInt + n)
    def ascii(o: Long, n: Int): String = new String(bytes(o, n), "US-ASCII")
    def cstr(o: Long): String = {
      var e = o.toInt
      while (e < b.length && b(e) != 0) e += 1
      new String(b, o.toInt, e - o.toInt, "US-ASCII")
    }
  }

  /** 0x89 'H' 'D' 'F' CR LF 0x1a LF */
  private val Signature: Array[Byte] =
    Array(0x89, 'H'.toInt, 'D'.toInt, 'F'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF reads as -1

  def read(path: String): Group = readBytes(Files.readAllBytes(Paths.get(path)))

  def readBytes(bytes: Array[Byte]): Group = {
    val f = new Buf(bytes)
    require(bytes.length >= 8 &&
      Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not an HDF5 file")
    require(f.u8(8) == 0, s"superblock v${f.u8(8)} unsupported (need v0)")
    require(f.u8(13) == 8 && f.u8(14) == 8, "need 8-byte offsets/lengths")
    // root symbol-table entry at byte 56: name offset, header address
    val rootHeader = f.u64(56 + 8)
    readObject(f, rootHeader) match {
      case g: Group => g
      case other => throw new IllegalStateException(s"root not a group: $other")
    }
  }

  /** Collect all (type, bodyOffset, size) header messages, following
    * continuation blocks (v1 object header). */
  private def messages(f: Buf, addr: Long): Seq[(Int, Long, Int)] = {
    require(f.u8(addr) == 1, s"object header v${f.u8(addr)} unsupported")
    val nMsgs = f.u16(addr + 2)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]()
    // blocks of (start, size): header block then continuations
    var blocks = List((addr + 16, f.u32(addr + 8)))
    var read = 0
    while (blocks.nonEmpty && read < nMsgs) {
      val (start, bsize) = blocks.head
      blocks = blocks.tail
      var o = start
      while (o < start + bsize && read < nMsgs) {
        val t = f.u16(o)
        val size = f.u16(o + 2)
        val body = o + 8
        if (t == 0x0010) { // continuation: address, length
          blocks = blocks :+ ((f.u64(body), f.u64(body + 8)))
        } else out += ((t, body, size))
        read += 1
        o = body + size
      }
    }
    out.toSeq
  }

  private def readObject(f: Buf, addr: Long): Node = {
    val msgs = messages(f, addr)
    msgs.find(_._1 == 0x0011) match {
      case Some((_, body, _)) => // symbol table: btree addr, heap addr
        readGroup(f, f.u64(body), f.u64(body + 8))
      case None => readDataset(f, msgs)
    }
  }

  private def readGroup(f: Buf, btree: Long, heap: Long): Group = {
    require(f.ascii(heap, 4) == "HEAP", "bad local heap")
    val heapData = f.u64(heap + 24)
    val items = scala.collection.mutable.LinkedHashMap[String, Node]()
    def walkTree(addr: Long): Unit = {
      require(f.ascii(addr, 4) == "TREE", "bad group b-tree node")
      val level = f.u8(addr + 5)
      val n = f.u16(addr + 6)
      // keys and children alternate after left/right sibling pointers
      val base = addr + 24
      (0 until n).foreach { i =>
        val child = f.u64(base + 8 + i * 16) // skip key_i, take child_i
        if (level > 0) walkTree(child) else readSnod(child)
      }
    }
    def readSnod(addr: Long): Unit = {
      require(f.ascii(addr, 4) == "SNOD", "bad symbol node")
      val n = f.u16(addr + 6)
      (0 until n).foreach { i =>
        val e = addr + 8 + i * 40
        val name = f.cstr(heapData + f.u64(e))
        val hdr = f.u64(e + 8)
        items += name -> readObject(f, hdr)
      }
    }
    walkTree(btree)
    Group(items.toMap)
  }

  private final case class Dt(cls: Int, size: Int, signed: Boolean,
      vlenStr: Boolean, baseSize: Int)

  private def parseDatatype(f: Buf, body: Long): Dt = {
    val clsVer = f.u8(body)
    val cls = clsVer & 0x0F
    val bits0 = f.u8(body + 1)
    val size = f.u32(body + 4).toInt
    cls match {
      case 0 => Dt(0, size, (bits0 & 0x08) != 0, vlenStr = false, 0)
      case 1 => Dt(1, size, signed = true, vlenStr = false, 0)
      case 3 => Dt(3, size, signed = false, vlenStr = false, 0)
      case 8 => // enum: base type follows at +8 (numpy bool → int8)
        val base = parseDatatype(f, body + 8)
        Dt(8, size, base.signed, vlenStr = false, base.size)
      case 9 => // vlen; bits0 low nibble 1 = string
        Dt(9, size, signed = false, vlenStr = (bits0 & 0x0F) == 1, 0)
      case other =>
        throw new IllegalArgumentException(s"datatype class $other unsupported")
    }
  }

  private def readDataset(f: Buf, msgs: Seq[(Int, Long, Int)]): Node = {
    val (_, spBody, _) = msgs.find(_._1 == 0x0001)
      .getOrElse(throw new IllegalArgumentException("dataset missing dataspace"))
    val rank = f.u8(spBody + 1)
    require(f.u8(spBody) == 1 || rank == 0, "dataspace v2 unsupported")
    val dims = (0 until rank).map(i => f.u64(spBody + 8 + i * 8))
    val nElems = dims.foldLeft(1L)(_ * _)
    val (_, dtBody, _) = msgs.find(_._1 == 0x0003)
      .getOrElse(throw new IllegalArgumentException("dataset missing datatype"))
    val dt = parseDatatype(f, dtBody)
    val (_, loBody, _) = msgs.find(_._1 == 0x0008)
      .getOrElse(throw new IllegalArgumentException("dataset missing layout"))
    require(f.u8(loBody) == 3, s"layout v${f.u8(loBody)} unsupported")
    val dataAddr: Long = f.u8(loBody + 1) match {
      case 0 => loBody + 4 // compact: size(2) then inline data
      case 1 => f.u64(loBody + 2) // contiguous: address, size
      case c => throw new IllegalArgumentException(s"layout class $c unsupported")
    }
    if (dataAddr == Undef) { // allocated lazily & never written: zeros
      return dt.cls match {
        case 1 => DoubleData(dims, Array.fill(nElems.toInt)(0.0))
        case _ => LongData(dims, Array.fill(nElems.toInt)(0L))
      }
    }
    def fixedLong(size: Int, o: Long): Long = size match {
      case 1 => if (dt.signed) f.b(o.toInt).toLong else f.u8(o).toLong
      case 2 => if (dt.signed) f.u16(o).toShort.toLong else f.u16(o).toLong
      case 4 => if (dt.signed) f.u32(o).toInt.toLong else f.u32(o)
      case 8 => f.u64(o)
      case s => throw new IllegalArgumentException(s"int size $s")
    }
    dt.cls match {
      case 0 | 8 =>
        val es = if (dt.cls == 8) dt.baseSize.max(1) else dt.size
        LongData(dims, Array.tabulate(nElems.toInt)(i =>
          fixedLong(es, dataAddr + i.toLong * es)))
      case 1 =>
        val arr = Array.tabulate(nElems.toInt) { i =>
          val o = dataAddr + i.toLong * dt.size
          if (dt.size == 8) java.lang.Double.longBitsToDouble(f.u64(o))
          else java.lang.Float.intBitsToFloat(f.u32(o).toInt).toDouble
        }
        DoubleData(dims, arr)
      case 3 =>
        StrData(dims, Array.tabulate(nElems.toInt) { i =>
          val raw = f.bytes(dataAddr + i.toLong * dt.size, dt.size)
          new String(raw.takeWhile(_ != 0), "UTF-8")
        })
      case 9 =>
        require(dt.vlenStr, "vlen non-string unsupported")
        StrData(dims, Array.tabulate(nElems.toInt) { i =>
          val o = dataAddr + i.toLong * 16
          val len = f.u32(o).toInt
          val gheap = f.u64(o + 4)
          val idx = f.u32(o + 12).toInt
          readGlobalHeapString(f, gheap, idx, len)
        })
      case c => throw new IllegalArgumentException(s"datatype class $c")
    }
  }

  private def readGlobalHeapString(f: Buf, addr: Long, idx: Int,
      len: Int): String = {
    require(f.ascii(addr, 4) == "GCOL", "bad global heap collection")
    var o = addr + 16
    val end = addr + f.u64(addr + 8)
    while (o < end) {
      val objIdx = f.u16(o)
      val size = f.u64(o + 8)
      if (objIdx == idx)
        return new String(f.bytes(o + 16, len), "UTF-8")
      if (objIdx == 0) o = end // free space terminator
      else o = o + 16 + ((size + 7) / 8) * 8
    }
    throw new IllegalArgumentException(s"global heap object $idx not found")
  }

  // ------------------------------------------------------------ writer

  /** Writes the same v0 subset (fixed-length strings instead of
    * vlen). Groups hold ≤ 2·leafK entries in one SNOD; leafK is set
    * large enough for the atoms dict (sorted names, as the B-tree
    * order requires). */
  def write(path: String, root: Group): Unit =
    Files.write(Paths.get(path), writeBytes(root))

  def writeBytes(root: Group): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def pad8(): Unit = while (out.size % 8 != 0) out.write(0)
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    val patches = scala.collection.mutable.ArrayBuffer[(Int, Long)]()

    out.write(Signature)
    le(0, 4) // superblock/freespace/root-group/reserved versions
    out.write(0); out.write(8); out.write(8); out.write(0) // shared, soff, slen, res
    le(64, 2); le(16, 2) // leaf k = 64 (one SNOD per group), internal k
    le(0, 4) // consistency flags
    le(0, 8) // base address
    le(Undef, 8) // free-space (undefined)
    val eofPatch = out.size(); le(0, 8) // end of file (patched)
    le(Undef, 8) // driver info
    le(0, 8) // root STE: link name offset
    val rootHdrPatch = out.size(); le(0, 8) // root object header (patched)
    le(0, 4); le(0, 4); le(0, 8); le(0, 8) // cache type 0 (no cache) + scratch
    pad8()

    def writeDatatype(n: Node): Unit = n match {
      case LongData(_, _) =>
        out.write(0x10); out.write(0x08); out.write(0); out.write(0) // class 0 v1, signed LE
        le(8, 4) // size
        le(0, 2); le(64, 2) // bit offset, precision
      case DoubleData(_, _) =>
        out.write(0x11); out.write(0x20); out.write(0x3F); out.write(0) // class 1 v1, IEEE LE
        le(8, 4)
        le(0, 2); le(64, 2) // bit offset, precision
        out.write(52); out.write(11) // exponent location/size
        out.write(0); out.write(52) // mantissa location/size
        le(1023, 4) // exponent bias
      case StrData(_, data) =>
        val w = math.max(1, if (data.isEmpty) 1
          else data.map(_.getBytes("UTF-8").length).max)
        out.write(0x13); out.write(0); out.write(0); out.write(0) // class 3 v1, null-pad
        le(w, 4)
      case _: Group => throw new IllegalStateException("group as datatype")
    }

    def msgHeader(t: Int, size: Int): Unit = {
      le(t, 2); le(size, 2); out.write(0); le(0, 3) // flags + reserved
    }

    /** Returns the object header address of the written node. */
    def writeNode(n: Node): Long = n match {
      case g: Group => writeGroup(g)
      case d => writeDataset(d)
    }

    def writeDataset(n: Node): Long = {
      // data block first
      pad8()
      val dataAddr = out.size().toLong
      val (dims, dataSize) = n match {
        case LongData(dims, data) =>
          data.foreach(le(_, 8)); (dims, data.length.toLong * 8)
        case DoubleData(dims, data) =>
          data.foreach(d => le(java.lang.Double.doubleToLongBits(d), 8))
          (dims, data.length.toLong * 8)
        case StrData(dims, data) =>
          val w = math.max(1, if (data.isEmpty) 1
            else data.map(_.getBytes("UTF-8").length).max)
          data.foreach { s =>
            val b = s.getBytes("UTF-8")
            out.write(b); (b.length until w).foreach(_ => out.write(0))
          }
          (dims, data.length.toLong * w)
        case _: Group => throw new IllegalStateException("unreachable")
      }
      pad8()
      val hdr = out.size().toLong
      // message bodies must be 8-byte multiples: pad int (12) → 16,
      // float (20) → 24
      val dtSize = n match {
        case _: LongData => 16
        case _: DoubleData => 24
        case _: StrData => 8
        case _ => 0
      }
      val spSize = 8 + dims.length * 8
      val loSize = 2 + 6 + 16 // v3 contiguous (+ pad to 8-align msgs)
      val bodySize = (8 + spSize) + (8 + dtSize) + (8 + loSize)
      out.write(1); out.write(0); le(3, 2) // v1, 3 messages
      le(1, 4) // ref count
      le(bodySize, 4) // header size
      le(0, 4) // pad to 8-align
      msgHeader(0x0001, spSize) // dataspace v1
      out.write(1); out.write(dims.length); out.write(0); le(0, 5)
      dims.foreach(le(_, 8))
      msgHeader(0x0003, dtSize)
      val dtStart = out.size()
      writeDatatype(n)
      (out.size() until dtStart + dtSize).foreach(_ => out.write(0)) // pad body
      msgHeader(0x0008, loSize) // layout v3 contiguous
      out.write(3); out.write(1)
      le(dataAddr, 8); le(dataSize, 8)
      le(0, 6) // align
      pad8()
      hdr
    }

    def writeGroup(g: Group): Long = {
      val names = g.items.keys.toSeq.sorted // B-tree (SNOD) order
      require(names.length <= 128, "group too large for single-SNOD writer")
      val children = names.map(n => n -> writeNode(g.items(n)))
      // local heap: data segment with the names (offset 0 reserved)
      pad8()
      val nameOffsets = scala.collection.mutable.LinkedHashMap[String, Long]()
      val heapBytes = new java.io.ByteArrayOutputStream()
      heapBytes.write(0) // offset 0: empty string (root STE convention)
      names.foreach { nm =>
        while (heapBytes.size % 8 != 0) heapBytes.write(0)
        nameOffsets(nm) = heapBytes.size().toLong
        heapBytes.write(nm.getBytes("US-ASCII")); heapBytes.write(0)
      }
      while (heapBytes.size % 8 != 0) heapBytes.write(0)
      val heapData = out.size().toLong + 32 // heap header is 32 bytes
      val heapAddr = out.size().toLong
      out.write("HEAP".getBytes("US-ASCII")); le(0, 4)
      le(heapBytes.size().toLong, 8) // data segment size
      le(Undef, 8) // free-list head: none
      le(heapData, 8)
      out.write(heapBytes.toByteArray)
      // SNOD
      pad8()
      val snodAddr = out.size().toLong
      out.write("SNOD".getBytes("US-ASCII"))
      out.write(1); out.write(0); le(names.length, 2)
      children.foreach { case (nm, hdr) =>
        le(nameOffsets(nm), 8); le(hdr, 8)
        le(0, 4); le(0, 4); le(0, 8); le(0, 8) // cache none + scratch
      }
      // B-tree: one leaf node pointing at the SNOD
      pad8()
      val btreeAddr = out.size().toLong
      out.write("TREE".getBytes("US-ASCII"))
      out.write(0); out.write(0); le(1, 2) // group node, level 0, 1 entry
      le(Undef, 8); le(Undef, 8) // siblings
      le(0, 8) // key 0: offset of first name
      le(snodAddr, 8)
      le(nameOffsets.values.lastOption.getOrElse(0L), 8) // key 1
      // object header with the symbol-table message
      pad8()
      val hdr = out.size().toLong
      out.write(1); out.write(0); le(1, 2)
      le(1, 4)
      le(8 + 16, 4)
      le(0, 4)
      msgHeader(0x0011, 16)
      le(btreeAddr, 8); le(heapAddr, 8)
      pad8()
      hdr
    }

    val rootHdr = writeGroup(root)
    patches += ((rootHdrPatch, rootHdr))
    patches += ((eofPatch, out.size().toLong))
    val bytes = out.toByteArray
    patches.foreach { case (at, v) =>
      (0 until 8).foreach(i => bytes(at + i) = ((v >> (8 * i)) & 0xFF).toByte)
    }
    bytes
  }

  // --------------------------------------------- atoms.h5 dict codec

  /** atoms.h5 → Config (io.py load_dict_from_h5 + atoms.py:366–404
    * Atoms.read semantics, incl. the "first key contains 'atom' →
    * descend" convention used by AtomsList files). */
  def readAtoms(path: String): graft.core.Config = {
    val root = read(path)
    val dict = root.items.headOption match {
      case Some((k, g: Group)) if k.contains("atom") => g
      case _ => root
    }
    atomsFromDict(dict)
  }

  def atomsFromDict(dict: Group): graft.core.Config = {
    def doubles2d(n: Node, cols: Int): Seq[Seq[Double]] = n match {
      case DoubleData(dims, d) if dims.length == 2 =>
        d.grouped(dims(1).toInt).map(_.toSeq).toSeq
      case DoubleData(_, d) => d.grouped(cols).map(_.toSeq).toSeq
      case LongData(dims, d) if dims.length == 2 =>
        d.map(_.toDouble).grouped(dims(1).toInt).map(_.toSeq).toSeq
      case other => throw new IllegalArgumentException(s"not a 2-d array: $other")
    }
    val positions = doubles2d(dict.items("positions"), 3)
    val cell = doubles2d(dict.items("cell"), 3)
    val symbols = dict.items.get("symbols") match {
      case Some(StrScalar(s)) => s
      case Some(StrData(_, d)) if d.nonEmpty => d(0)
      case _ => ""
    }
    // prefer the per-atom species array when present (our writer adds
    // it — the reference's count-compressed symbols string can't
    // represent interleaved species sequences, and the content hash
    // depends on the sequence); fall back to formula expansion for
    // reference-written files
    val species: Seq[String] = dict.items.get("species") match {
      case Some(StrData(_, d)) if d.nonEmpty => d.toSeq
      case _ if symbols.nonEmpty => graft.core.Formula.expand(symbols)
      case _ => Seq.fill(positions.length)("X")
    }
    val pbc = dict.items.get("pbc") match {
      case Some(LongData(_, d)) => d.map(_ != 0L).toSeq
      case _ => Seq(true, true, true)
    }
    val params: Map[String, String] = dict.items.get("params") match {
      case Some(g: Group) => g.items.collect {
        case (k, LongScalar(v)) => k -> v.toString
        case (k, StrScalar(v)) => k -> v
        case (k, DoubleData(dims, d)) if dims.isEmpty => k -> d(0).toString
      }
      case _ => Map.empty
    }
    val props: Map[String, Seq[Double]] = dict.items.get("properties") match {
      case Some(g: Group) => g.items.collect {
        case (k, DoubleData(_, d)) => k -> d.toSeq
        case (k, LongData(_, d)) => k -> d.map(_.toDouble).toSeq
      }
      case _ => Map.empty
    }
    val uuid = dict.items.get("uuid") match {
      case Some(StrScalar(s)) => s
      case _ => ""
    }
    val groupUuid = dict.items.get("group_uuid") match {
      case Some(StrScalar(s)) => s
      case _ => ""
    }
    graft.core.Config(
      uuid = uuid, groupUuid = groupUuid,
      n = positions.length, symbols = graft.core.Formula.compress(species),
      species = species, cell = cell, positions = positions, pbc = pbc,
      energy = dict.items.get("energy").collect {
        case DoubleData(dims, d) if dims.isEmpty => d(0)
      },
      force = None, virial = None, configType = Some("h5"),
      params = params, properties = props)
  }

  /** All atoms dicts in a file: an AtomsList file holds one
    * `atom_<uuid>` group per config (atoms.py:637–656); a single
    * atoms.h5 is the dict itself. */
  def readAtomsList(path: String): Seq[graft.core.Config] =
    atomsListFromBytes(Files.readAllBytes(Paths.get(path)))

  def atomsListFromBytes(bytes: Array[Byte]): Seq[graft.core.Config] = {
    val root = readBytes(bytes)
    val atomGroups = root.items.collect {
      case (k, g: Group) if k.contains("atom") => g
    }.toSeq
    if (atomGroups.nonEmpty) atomGroups.map(atomsFromDict)
    else Seq(atomsFromDict(root))
  }

  /** One-shot distributed ingest (the migration user's first step):
    * every atoms.h5 under the glob parses in parallel via the
    * binaryFile source — file bytes never touch the driver — and the
    * result is the Config relation, ready for `write.parquet`. */
  def ingest(spark: org.apache.spark.sql.SparkSession,
      glob: String): org.apache.spark.sql.Dataset[graft.core.Config] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(org.apache.spark.sql.functions.col("content"))
      .as[Array[Byte]]
      .flatMap(atomsListFromBytes(_))
  }

  /** Config → atoms.h5 (the to_dict schema, atoms.py:406–458). */
  def writeAtoms(path: String, c: graft.core.Config): Unit = {
    def arr2(rows: Seq[Seq[Double]]): DoubleData =
      DoubleData(Seq(rows.length.toLong, 3L), rows.flatten.toArray)
    val items = scala.collection.mutable.LinkedHashMap[String, Node](
      "n" -> LongData(Nil, Array(c.n.toLong)),
      "pbc" -> LongData(Seq(3L), c.pbc.map(b => if (b) 1L else 0L).toArray),
      "positions" -> arr2(c.positions),
      "cell" -> arr2(c.cell),
      "symbols" -> StrData(Nil, Array(c.symbols)),
      "species" -> StrData(Seq(c.species.length.toLong), c.species.toArray),
      "uuid" -> StrData(Nil, Array(c.uuid)),
      "params" -> Group(c.params.map { case (k, v) =>
        k -> StrData(Nil, Array(v)): (String, Node) }),
      "properties" -> Group(c.properties.map { case (k, v) =>
        k -> DoubleData(Seq(v.length.toLong), v.toArray): (String, Node) }))
    if (c.groupUuid.nonEmpty)
      items += "group_uuid" -> StrData(Nil, Array(c.groupUuid))
    c.energy.foreach(e => items += "energy" -> DoubleData(Nil, Array(e)))
    write(path, Group(items.toMap))
  }
}
