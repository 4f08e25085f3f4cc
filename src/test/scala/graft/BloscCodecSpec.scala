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

  test("bit-shuffle, blosclz, truncation, and size mismatch are named errors") {
    // strongly compressible so the frame is NOT memcpy mode (the codec
    // checks below only run on compressed frames)
    val ok = BloscCodec.compress(Array.tabulate(256)(i => (i % 8).toByte), 4, "lz4")
    assert((ok(2) & 0x2) === 0, "fixture frame must be compressed, not memcpy")
    val bitshuf = ok.clone(); bitshuf(2) = (bitshuf(2) | 0x4).toByte
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decompress(bitshuf, 256)
    }.getMessage.contains("BIT-shuffle"))
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

  test("shuffle/unshuffle invert each other and leave the tail verbatim") {
    val data = patterned(103) // 103 = 25*4 + 3 tail bytes at typesize 4
    val sh = BloscCodec.shuffle(data, 4)
    assert(BloscCodec.unshuffle(sh, 4).toSeq === data.toSeq)
    assert(sh.slice(100, 103).toSeq === data.slice(100, 103).toSeq)
    // byte-plane layout: plane p holds every 4th byte starting at p
    assert(sh(0) === data(0) && sh(1) === data(4) && sh(25) === data(1))
  }
}
