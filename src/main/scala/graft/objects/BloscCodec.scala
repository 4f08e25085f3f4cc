package graft.objects

import java.nio.{ByteBuffer, ByteOrder}

/** Blosc1 container codec — the compressor wrapping most real-world
  * OME-Zarr chunks (numcodecs' default is blosc/lz4/byte-shuffle), and
  * the last named-error stub between [[OmeZarrReader]] and wild stores
  * (reference: apis/python/src/tiledb/vector_search/object_readers/
  * bioimage_reader.py reads the same NGFF layouts through tiledb.bioimg).
  *
  * The frame format is c-blosc's published 16-byte header
  * (version, codec-version, flags, typesize, nbytes, blocksize, cbytes —
  * all int32 little-endian) followed by either the raw buffer
  * (memcpy mode) or a block-start table plus per-block compressed
  * streams, each stream prefixed by its int32 compressed size. Blosc's
  * INNER codecs are exactly the ones Spark already ships in
  * `/opt/spark/jars`: lz4 (lz4-java, raw block format), zstd (zstd-jni),
  * snappy (snappy-java, raw block format), and zlib (java.util.zip) —
  * so no native codec is missing; only blosclz (blosc's private LZ77)
  * remains refused with a named error. BOTH shuffle filters are real:
  * byte-shuffle (plane transpose) and BIT-shuffle ([[bitShuffle]] — the
  * published bitshuffle transform: bit j of byte p of element e groups
  * into row p·8+j, a pure bit transposition needing no native library).
  *
  * One c-blosc wrinkle is handled structurally instead of by version
  * sniffing: whether a block was SPLIT into one stream per byte-plane is
  * a compressor-side heuristic that changed across c-blosc releases and
  * is NOT recorded in the frame. The decoder therefore parses each block
  * adaptively — a candidate stream layout is accepted only when its
  * int32 size prefixes tile the block's compressed extent exactly AND
  * every stream inflates to its exact plane size; the (unambiguous)
  * survivor wins. A frame written by any c-blosc split policy decodes.
  *
  * Scale shape: chunks decode inside the executor task that scanned
  * them ([[OmeZarrReader.readObjects]]'s one binaryFile scan) — this
  * class is a pure per-buffer kernel with no Spark state.
  */
object BloscCodec {

  // header flag bits and codec ids, per c-blosc's README_HEADER
  private val FlagShuffle = 0x1
  private val FlagMemcpy = 0x2
  private val FlagBitShuffle = 0x4
  private val CodecBloscLz = 0
  private val CodecLz4 = 1
  private val CodecSnappy = 2
  private val CodecZlib = 3
  private val CodecZstd = 4

  /** Inner-codec names accepted in a `.zarray` blosc `cname` (lz4hc
    * writes plain lz4 block streams, so it decodes on the lz4 path). */
  val supportedCnames: Set[String] = Set("lz4", "lz4hc", "zstd", "snappy", "zlib")

  /** Decompress a blosc1 frame. `expected` — the caller's known
    * plaintext size (zarr: chunk elements × element size) — is checked
    * against the header so a truncated or mismatched frame fails with a
    * named error instead of feeding a short buffer downstream. */
  def decompress(frame: Array[Byte], expected: Int): Array[Byte] = {
    require(frame.length >= 16,
      s"graft: blosc frame holds ${frame.length} bytes — shorter than the 16-byte header")
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val flags = frame(2) & 0xFF
    val typesize = frame(3) & 0xFF
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    val cbytes = bb.getInt(12)
    require(nbytes == expected,
      s"graft: blosc frame declares $nbytes plaintext bytes, caller expects $expected")
    require(cbytes <= frame.length,
      s"graft: blosc frame declares $cbytes compressed bytes but only ${frame.length} present")
    if ((flags & FlagMemcpy) != 0) {
      // pure store: nbytes of the original (unshuffled) buffer follow the header
      require(frame.length >= 16 + nbytes, "graft: truncated memcpy blosc frame")
      return java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    }
    val codec = (flags >> 5) & 0x7
    require(codec != CodecBloscLz,
      "graft: blosc frame uses the blosclz inner codec, which this JVM does not " +
        "ship — re-encode with cname lz4/zstd/snappy/zlib")
    require(Set(CodecLz4, CodecSnappy, CodecZlib, CodecZstd).contains(codec),
      s"graft: blosc frame names unknown inner codec id $codec")
    // bit-shuffle transposes BITS and is non-identity even at typesize 1;
    // byte-shuffle at typesize 1 is the identity (skip it)
    val bitShuffled = (flags & FlagBitShuffle) != 0
    val shuffled = !bitShuffled && (flags & FlagShuffle) != 0 && typesize > 1
    // checked BEFORE the division: a crafted blocksize=0 frame must fail
    // with the named error, not a bare ArithmeticException
    require(blocksize > 0, "graft: blosc frame has a zero block grid")
    val fullBlocks = nbytes / blocksize
    val leftover = nbytes % blocksize
    val nblocks = fullBlocks + (if (leftover > 0) 1 else 0)
    require(nblocks > 0, "graft: blosc frame has a zero block grid")
    require(frame.length >= 16 + 4 * nblocks,
      s"graft: blosc frame truncated inside its $nblocks-entry block table")
    val bstarts = (0 until nblocks).map(j => bb.getInt(16 + 4 * j))
    // each block's compressed extent ends at the next-larger start (blocks
    // are laid out without padding) or at cbytes for the last one
    val sorted = bstarts.sorted
    val out = new Array[Byte](nbytes)
    for (j <- 0 until nblocks) {
      val neblock = if (j == nblocks - 1 && leftover > 0) leftover else blocksize
      val start = bstarts(j)
      require(start >= 16 + 4 * nblocks && start <= cbytes,
        s"graft: blosc block $j claims start $start outside the frame body")
      val end = sorted.indexOf(start) match {
        case i if i < nblocks - 1 => sorted(i + 1)
        case _ => cbytes
      }
      // either shuffle mode may have been split into byte-plane streams
      // by the writer; the adaptive parser settles which layout was used
      val block = decodeBlock(frame, start, end, neblock, typesize, codec,
        shuffled || bitShuffled)
      val res =
        if (bitShuffled) bitUnshuffle(block, typesize)
        else if (shuffled) unshuffle(block, typesize)
        else block
      System.arraycopy(res, 0, out, j * blocksize, neblock)
    }
    out
  }

  /** Parse one block's streams adaptively (see class doc): try the
    * split layout (typesize streams of neblock/typesize) and the
    * unsplit one (a single neblock stream); accept the parse whose
    * size prefixes tile [start, end) exactly and whose streams all
    * inflate to their exact plane size. */
  private def decodeBlock(
      frame: Array[Byte], start: Int, end: Int, neblock: Int,
      typesize: Int, codec: Int, shuffled: Boolean): Array[Byte] = {
    val candidates =
      if (shuffled && typesize > 1 && neblock % typesize == 0) Seq(typesize, 1)
      else Seq(1)
    val errors = Seq.newBuilder[String]
    for (nstreams <- candidates) {
      tryParse(frame, start, end, neblock, nstreams, codec) match {
        case Right(bytes) => return bytes
        case Left(err) => errors += s"nstreams=$nstreams: $err"
      }
    }
    throw new IllegalArgumentException(
      s"graft: blosc block at offset $start does not parse under any stream " +
        s"layout (${errors.result().mkString("; ")}) — corrupt frame or " +
        "unsupported c-blosc variant")
  }

  private def tryParse(
      frame: Array[Byte], start: Int, end: Int, neblock: Int,
      nstreams: Int, codec: Int): Either[String, Array[Byte]] = {
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val streamSize = neblock / nstreams
    val out = new Array[Byte](neblock)
    var pos = start
    var s = 0
    while (s < nstreams) {
      if (pos + 4 > end) return Left(s"stream $s size prefix runs past block end")
      val csize = bb.getInt(pos)
      pos += 4
      if (csize < 0 || pos + csize > end) return Left(s"stream $s claims $csize bytes")
      try {
        if (csize == streamSize) {
          // incompressible stream, stored verbatim (c-blosc's csize==neblock marker)
          System.arraycopy(frame, pos, out, s * streamSize, streamSize)
        } else {
          val n = inflateStream(frame, pos, csize, out, s * streamSize, streamSize, codec)
          if (n != streamSize) return Left(s"stream $s inflated to $n of $streamSize")
        }
      } catch {
        case e: Exception => return Left(s"stream $s: ${e.getMessage}")
      }
      pos += csize
      s += 1
    }
    if (pos != end) Left(s"streams end at $pos, block extent ends at $end")
    else Right(out)
  }

  /** Inflate one inner-codec stream into `dst` at `dstOff`; returns the
    * plaintext byte count. lz4/snappy are RAW block formats (what
    * c-blosc feeds LZ4_compress/snappy_compress); zstd/zlib are framed. */
  private def inflateStream(
      src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int, codec: Int): Int = codec match {
    case CodecLz4 =>
      // the fast decompressor is sized by OUTPUT; its return value is the
      // compressed bytes it consumed — anything but exactly csize means
      // the stream ran past (or short of) its [pos, pos+csize) extent and
      // the "right-sized output" is garbage read from adjacent frame bytes
      val consumed = lz4Decompressor.decompress(src, srcOff, dst, dstOff, dstLen)
      if (consumed != srcLen) throw new IllegalArgumentException(
        s"lz4 stream consumed $consumed of its $srcLen compressed bytes")
      dstLen
    case CodecZstd =>
      val slice = java.util.Arrays.copyOfRange(src, srcOff, srcOff + srcLen)
      val plain = com.github.luben.zstd.Zstd.decompress(slice, dstLen)
      System.arraycopy(plain, 0, dst, dstOff, plain.length)
      plain.length
    case CodecSnappy =>
      org.xerial.snappy.Snappy.uncompress(src, srcOff, srcLen, dst, dstOff)
    case CodecZlib =>
      val inf = new java.util.zip.Inflater()
      inf.setInput(src, srcOff, srcLen)
      var total = 0
      while (!inf.finished() && total < dstLen) {
        val n = inf.inflate(dst, dstOff + total, dstLen - total)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          inf.end(); throw new IllegalArgumentException("truncated zlib stream")
        }
        total += n
      }
      val done = inf.finished()
      inf.end()
      if (!done) throw new IllegalArgumentException("zlib stream larger than plane")
      total
  }

  private lazy val lz4Decompressor = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
  private lazy val lz4Compressor = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()

  /** Byte-shuffle `block` (typesize byte-planes, the whole-elements
    * prefix transposed, the `len % typesize` tail copied verbatim) —
    * c-blosc applies this per block before compressing. */
  private[graft] def shuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val len = block.length
    val elems = len / typesize
    val out = new Array[Byte](len)
    var e = 0
    while (e < elems) {
      var p = 0
      while (p < typesize) {
        out(p * elems + e) = block(e * typesize + p)
        p += 1
      }
      e += 1
    }
    System.arraycopy(block, elems * typesize, out, elems * typesize, len - elems * typesize)
    out
  }

  /** BIT-shuffle `block` — the published bitshuffle transform (Masui's
    * bitshuffle library, what c-blosc's BLOSC_BITSHUFFLE applies per
    * block before compressing). Net layout after the library's
    * trans_byte_elem → trans_bit_byte → trans_bitrow_eight composition:
    * with N8 = the largest multiple of 8 ≤ len/typesize elements and
    * R = N8/8 bytes per bit-row, output row (p·8 + j) holds bit j of
    * byte p of every element — byte k of the row packs elements
    * 8k..8k+7, element 8k+m at bit m. The tail past N8·typesize bytes
    * is copied verbatim (c-blosc's leftover rule). Unlike byte-shuffle,
    * this is non-identity even at typesize 1. */
  private[graft] def bitShuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val len = block.length
    val n8 = ((len / typesize) / 8) * 8
    val rowBytes = n8 / 8
    val out = new Array[Byte](len)
    var p = 0
    while (p < typesize) {
      var j = 0
      while (j < 8) {
        val rowOff = (p * 8 + j) * rowBytes
        var k = 0
        while (k < rowBytes) {
          var b = 0
          var m = 0
          while (m < 8) {
            b |= ((block((8 * k + m) * typesize + p) >> j) & 1) << m
            m += 1
          }
          out(rowOff + k) = b.toByte
          k += 1
        }
        j += 1
      }
      p += 1
    }
    System.arraycopy(block, n8 * typesize, out, n8 * typesize, len - n8 * typesize)
    out
  }

  private[graft] def bitUnshuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val len = block.length
    val n8 = ((len / typesize) / 8) * 8
    val rowBytes = n8 / 8
    val out = new Array[Byte](len)
    var p = 0
    while (p < typesize) {
      var j = 0
      while (j < 8) {
        val rowOff = (p * 8 + j) * rowBytes
        var k = 0
        while (k < rowBytes) {
          val b = block(rowOff + k) & 0xFF
          var m = 0
          while (m < 8) {
            val e = (8 * k + m) * typesize + p
            out(e) = (out(e) | (((b >> m) & 1) << j)).toByte
            m += 1
          }
          k += 1
        }
        j += 1
      }
      p += 1
    }
    System.arraycopy(block, n8 * typesize, out, n8 * typesize, len - n8 * typesize)
    out
  }

  private[graft] def unshuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val len = block.length
    val elems = len / typesize
    val out = new Array[Byte](len)
    var e = 0
    while (e < elems) {
      var p = 0
      while (p < typesize) {
        out(e * typesize + p) = block(p * elems + e)
        p += 1
      }
      e += 1
    }
    System.arraycopy(block, elems * typesize, out, elems * typesize, len - elems * typesize)
    out
  }

  /** Compress `data` into a blosc1 frame (the write path, and the spec
    * fixture mint). Split policy mirrors modern c-blosc — lz4 with
    * 1 < typesize ≤ 16 and ≥ 128 elements per block splits into
    * byte-plane streams; zstd/snappy/zlib never split; bit-shuffled and
    * leftover blocks never split — but any policy round-trips through
    * the adaptive decoder. Falls back to memcpy mode when compression
    * does not pay, exactly like c-blosc. `doBitShuffle` selects the
    * BIT-shuffle filter instead of byte-shuffle (mutually exclusive;
    * bit-shuffle wins when both are set, mirroring c-blosc's
    * doshuffle enum being a single mode). */
  def compress(
      data: Array[Byte],
      typesize: Int,
      cname: String,
      doShuffle: Boolean = true,
      blocksizeHint: Int = 0,
      doBitShuffle: Boolean = false): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"graft: blosc typesize $typesize out of range")
    val codec = cname match {
      case "lz4" | "lz4hc" => CodecLz4
      case "zstd" => CodecZstd
      case "snappy" => CodecSnappy
      case "zlib" => CodecZlib
      case other => throw new IllegalArgumentException(
        s"graft: blosc cname '$other' unsupported (${supportedCnames.mkString("/")})")
    }
    val nbytes = data.length
    if (nbytes == 0) {
      val header = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      header.put(2.toByte).put(1.toByte).put(FlagMemcpy.toByte).put(typesize.toByte)
      header.putInt(nbytes).putInt(0).putInt(16)
      return header.array()
    }
    val shuffled = !doBitShuffle && doShuffle && typesize > 1
    val blocksize = {
      val raw = if (blocksizeHint > 0) blocksizeHint else math.min(nbytes, 64 * 1024)
      // keep whole elements per block so byte-planes stay aligned
      math.max(typesize, raw - raw % typesize)
    }
    val fullBlocks = nbytes / blocksize
    val leftover = nbytes % blocksize
    val nblocks = fullBlocks + (if (leftover > 0) 1 else 0)
    val body = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    var off = 16 + 4 * nblocks
    for (j <- 0 until nblocks) {
      val neblock = if (j == nblocks - 1 && leftover > 0) leftover else blocksize
      val isLeftover = neblock != blocksize
      val plain0 = java.util.Arrays.copyOfRange(data, j * blocksize, j * blocksize + neblock)
      val plain =
        if (doBitShuffle) bitShuffle(plain0, typesize)
        else if (shuffled) shuffle(plain0, typesize)
        else plain0
      val split = codec == CodecLz4 && shuffled && typesize <= 16 &&
        !isLeftover && neblock % typesize == 0 && neblock / typesize >= 128
      val nstreams = if (split) typesize else 1
      val streamSize = neblock / nstreams
      for (s <- 0 until nstreams) {
        val comp = deflateStream(plain, s * streamSize, streamSize, codec)
        val stored = if (comp.length >= streamSize)
          java.util.Arrays.copyOfRange(plain, s * streamSize, (s + 1) * streamSize)
        else comp
        val prefix = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(stored.length).array()
        body.write(prefix); body.write(stored)
      }
      bstarts(j) = off
      off = 16 + 4 * nblocks + body.size()
    }
    val compressedTotal = 16 + 4 * nblocks + body.size()
    if (compressedTotal >= 16 + nbytes) {
      // compression did not pay: store the ORIGINAL buffer, memcpy mode
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte).put(FlagMemcpy.toByte).put(typesize.toByte)
      out.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes)
      out.put(data)
      return out.array()
    }
    val flags = (if (doBitShuffle) FlagBitShuffle else if (shuffled) FlagShuffle else 0) |
      (codec << 5)
    val out = ByteBuffer.allocate(compressedTotal).order(ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    out.putInt(nbytes).putInt(blocksize).putInt(compressedTotal)
    bstarts.foreach(out.putInt)
    out.put(body.toByteArray)
    out.array()
  }

  private def deflateStream(
      src: Array[Byte], off: Int, len: Int, codec: Int): Array[Byte] = codec match {
    case CodecLz4 =>
      val max = lz4Compressor.maxCompressedLength(len)
      val buf = new Array[Byte](max)
      val n = lz4Compressor.compress(src, off, len, buf, 0, max)
      java.util.Arrays.copyOf(buf, n)
    case CodecZstd =>
      com.github.luben.zstd.Zstd.compress(
        java.util.Arrays.copyOfRange(src, off, off + len), 3)
    case CodecSnappy =>
      val buf = new Array[Byte](org.xerial.snappy.Snappy.maxCompressedLength(len))
      val n = org.xerial.snappy.Snappy.compress(src, off, len, buf, 0)
      java.util.Arrays.copyOf(buf, n)
    case CodecZlib =>
      val d = new java.util.zip.Deflater(6)
      d.setInput(src, off, len); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
  }
}
