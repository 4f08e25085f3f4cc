package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.objects.BloscCodec

/** Format-level coverage of the blosc1 container ([[BloscCodec]]).
  * Round trips exercise our encoder+decoder pair; the HAND-BUILT frame
  * tests pin the decoder against bytes laid out independently from the
  * published header spec, so a symmetric encode/decode bug cannot hide. */
class BloscCodecSpec extends AnyFunSuite {

  private def patterned(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + (i >> 3) * 13) % 251).toByte)

  test("round trips across inner codecs, typesizes, shuffle, and block counts") {
    for {
      cname <- Seq("lz4", "zstd", "snappy", "zlib")
      typesize <- Seq(1, 2, 4, 8)
      shuffle <- Seq(true, false)
      // < one block, exact blocks, multi-block with leftover (incl. a
      // leftover that is not element-aligned at typesize 8)
      n <- Seq(100, 4096, 10000)
    } {
      val data = patterned(n)
      val frame = BloscCodec.compress(data, typesize, cname,
        doShuffle = shuffle, blocksizeHint = 4096)
      val back = BloscCodec.decompress(frame, n)
      assert(back.toSeq === data.toSeq,
        s"cname=$cname typesize=$typesize shuffle=$shuffle n=$n")
    }
  }

  test("split (lz4+shuffle) and unsplit (zstd+shuffle) layouts both parse adaptively") {
    val data = patterned(8192)
    val split = BloscCodec.compress(data, 4, "lz4", doShuffle = true, blocksizeHint = 4096)
    val unsplit = BloscCodec.compress(data, 4, "zstd", doShuffle = true, blocksizeHint = 4096)
    // lz4+shuffle at typesize 4 with >=128 elems/block splits into 4 streams;
    // zstd never splits — the adaptive parser must accept both
    assert(BloscCodec.decompress(split, 8192).toSeq === data.toSeq)
    assert(BloscCodec.decompress(unsplit, 8192).toSeq === data.toSeq)
    assert(!split.sameElements(unsplit))
  }

  test("incompressible data falls back to memcpy mode and decodes verbatim") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(1000)(rnd.nextInt().toByte)
    val frame = BloscCodec.compress(data, 4, "lz4")
    assert((frame(2) & 0x2) != 0, "random bytes should store as memcpy")
    assert(frame.length === 16 + 1000)
    assert(BloscCodec.decompress(frame, 1000).toSeq === data.toSeq)
  }

  test("hand-built memcpy frame decodes from the published header layout") {
    val payload = patterned(24)
    val frame = ByteBuffer.allocate(16 + 24).order(ByteOrder.LITTLE_ENDIAN)
    frame.put(2.toByte)         // format version
    frame.put(1.toByte)         // codec version
    frame.put(0x2.toByte)       // flags: memcpy
    frame.put(4.toByte)         // typesize
    frame.putInt(24)            // nbytes
    frame.putInt(24)            // blocksize
    frame.putInt(16 + 24)       // cbytes
    frame.put(payload)
    assert(BloscCodec.decompress(frame.array(), 24).toSeq === payload.toSeq)
  }

  test("hand-built single-block zlib frame with a VERBATIM stream decodes") {
    // a stream whose int32 size prefix equals the plane size is stored
    // raw (c-blosc's incompressible-stream marker) — no inflate call
    val payload = patterned(32)
    val frame = ByteBuffer.allocate(16 + 4 + 4 + 32).order(ByteOrder.LITTLE_ENDIAN)
    frame.put(2.toByte).put(1.toByte)
    frame.put((3 << 5).toByte)  // flags: no shuffle, codec id 3 = zlib
    frame.put(1.toByte)         // typesize 1
    frame.putInt(32)            // nbytes
    frame.putInt(32)            // blocksize -> one block
    frame.putInt(16 + 4 + 4 + 32) // cbytes
    frame.putInt(20)            // bstarts[0]: block starts after the 1-entry table
    frame.putInt(32)            // stream csize == neblock -> verbatim
    frame.put(payload)
    assert(BloscCodec.decompress(frame.array(), 32).toSeq === payload.toSeq)
  }

  test("hand-built two-block lz4 frame with out-of-order-looking starts decodes") {
    // two blocks of 16; second block stored verbatim, first lz4-compressed —
    // extents are derived from the SORTED starts, not array order
    val data = patterned(32)
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val b0 = {
      val buf = new Array[Byte](lz4.maxCompressedLength(16))
      val n = lz4.compress(data, 0, 16, buf, 0, buf.length)
      java.util.Arrays.copyOf(buf, n)
    }
    assume(b0.length != 16, "fixture block must not hit the verbatim marker")
    val total = 16 + 8 + (4 + b0.length) + (4 + 16)
    val frame = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    frame.put(2.toByte).put(1.toByte)
    frame.put((1 << 5).toByte)  // codec id 1 = lz4, no shuffle
    frame.put(1.toByte)
    frame.putInt(32).putInt(16).putInt(total)
    frame.putInt(24)                  // block 0 at 24
    frame.putInt(24 + 4 + b0.length)  // block 1 after it
    frame.putInt(b0.length); frame.put(b0)
    frame.putInt(16); frame.put(data, 16, 16)
    assert(BloscCodec.decompress(frame.array(), 32).toSeq === data.toSeq)
  }

  test("blosclz, truncation, zero block grid, and size mismatch are named errors") {
    // strongly compressible so the frame is NOT memcpy mode (the codec
    // checks below only run on compressed frames)
    val ok = BloscCodec.compress(Array.tabulate(256)(i => (i % 8).toByte), 4, "lz4")
    assert((ok(2) & 0x2) === 0, "fixture frame must be compressed, not memcpy")
    val blosclz = ok.clone(); blosclz(2) = (blosclz(2) & 0x1F).toByte // codec id 0
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decompress(blosclz, 256)
    }.getMessage.contains("blosclz"))
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decompress(ok.take(10), 256)
    }.getMessage.contains("16-byte header"))
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decompress(ok, 999)
    }.getMessage.contains("expects 999"))
    // a crafted non-memcpy frame declaring blocksize=0 must hit the named
    // error, not an ArithmeticException from the block-grid division
    val zeroBlock = ok.clone()
    ByteBuffer.wrap(zeroBlock).order(ByteOrder.LITTLE_ENDIAN).putInt(8, 0)
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decompress(zeroBlock, 256)
    }.getMessage.contains("zero block grid"))
    // corrupt the first stream's size prefix: every candidate layout
    // fails structurally and the parser names the block
    val corrupt = ok.clone()
    val bb = ByteBuffer.wrap(corrupt).order(ByteOrder.LITTLE_ENDIAN)
    val bstart0 = bb.getInt(16)
    bb.putInt(bstart0, 1 << 29)
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decompress(corrupt, 256)
    }.getMessage.contains("does not parse"))
  }

  test("lz4 stream that under-consumes its declared extent is rejected, not misread") {
    // hand-build a frame whose single lz4 stream is padded with 4 junk
    // bytes INSIDE its declared csize: the size prefixes still tile the
    // block extent exactly, and the fast decompressor happily produces
    // 16 output bytes from the first complen compressed bytes — only the
    // consumed-vs-csize check can catch the mismatch
    val data = patterned(16)
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val comp = {
      val buf = new Array[Byte](lz4.maxCompressedLength(16))
      val n = lz4.compress(data, 0, 16, buf, 0, buf.length)
      java.util.Arrays.copyOf(buf, n)
    }
    assume(comp.length + 4 != 16, "padded stream must not hit the verbatim marker")
    val total = 16 + 4 + 4 + comp.length + 4
    val frame = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    frame.put(2.toByte).put(1.toByte)
    frame.put((1 << 5).toByte) // codec id 1 = lz4, no shuffle
    frame.put(1.toByte)
    frame.putInt(16).putInt(16).putInt(total)
    frame.putInt(20)                 // bstarts[0]
    frame.putInt(comp.length + 4)    // csize LIES: 4 junk bytes included
    frame.put(comp).putInt(0xDEAD)   // the junk
    val e = intercept[IllegalArgumentException] {
      BloscCodec.decompress(frame.array(), 16)
    }
    assert(e.getMessage.contains("consumed"), e.getMessage)
  }

  test("bit-shuffle round trips across codecs, typesizes, and block counts") {
    for {
      cname <- Seq("lz4", "zstd", "zlib")
      typesize <- Seq(1, 2, 4)
      n <- Seq(100, 4096, 10000)
    } {
      val data = patterned(n)
      val frame = BloscCodec.compress(data, typesize, cname,
        blocksizeHint = 4096, doBitShuffle = true)
      assert((frame(2) & 0x4) != 0 || (frame(2) & 0x2) != 0,
        s"frame must carry the bit-shuffle flag (or fall back to memcpy)")
      val back = BloscCodec.decompress(frame, n)
      assert(back.toSeq === data.toSeq, s"cname=$cname typesize=$typesize n=$n")
    }
  }

  test("bit-shuffle kernel matches the published layout and inverts exactly") {
    // typesize 1, 8 elements: output row j holds bit j of every element,
    // element m at bit m of the row's single byte
    val one = new Array[Byte](8); one(0) = 1
    assert(BloscCodec.bitShuffle(one, 1).toSeq === Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    val two = new Array[Byte](8); two(0) = 2 // bit 1 of element 0 -> row 1, bit 0
    assert(BloscCodec.bitShuffle(two, 1).toSeq === Seq[Byte](0, 1, 0, 0, 0, 0, 0, 0))
    val e3 = new Array[Byte](8); e3(3) = 0xFF.toByte // all bits of element 3
    assert(BloscCodec.bitShuffle(e3, 1).toSeq === Seq.fill(8)(8.toByte))
    // typesize 2: byte p of the element selects row block p*8..p*8+7
    val t2 = new Array[Byte](16); t2(2 * 5 + 1) = 1 // bit 0, byte 1, element 5
    val sh2 = BloscCodec.bitShuffle(t2, 2)
    assert(sh2(8) === (1 << 5).toByte, "row p*8+j = 8, element 5 at bit 5")
    assert(sh2.zipWithIndex.filter(_._1 != 0).map(_._2).toSeq === Seq(8))
    // inverse property incl. a non-multiple-of-8 element tail (copied verbatim)
    for (typesize <- Seq(1, 2, 4, 8); n <- Seq(8, 24, 103, 1000)) {
      val data = patterned(n)
      val rt = BloscCodec.bitUnshuffle(BloscCodec.bitShuffle(data, typesize), typesize)
      assert(rt.toSeq === data.toSeq, s"typesize=$typesize n=$n")
    }
    // tail rule: 103 bytes at typesize 4 = 25 elems -> 24 shuffled, the
    // last element + 3 trailing bytes (96..102) stay verbatim
    val d = patterned(103)
    assert(BloscCodec.bitShuffle(d, 4).slice(96, 103).toSeq === d.slice(96, 103).toSeq)
  }

  test("shuffle/unshuffle invert each other and leave the tail verbatim") {
    val data = patterned(103) // 103 = 25*4 + 3 tail bytes at typesize 4
    val sh = BloscCodec.shuffle(data, 4)
    assert(BloscCodec.unshuffle(sh, 4).toSeq === data.toSeq)
    assert(sh.slice(100, 103).toSeq === data.slice(100, 103).toSeq)
    // byte-plane layout: plane p holds every 4th byte starting at p
    assert(sh(0) === data(0) && sh(1) === data(4) && sh(25) === data(1))
  }
}
