package graft.etl

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The Delta deletion-vector codec against the PUBLIC format specs:
  * Z85 (ZeroMQ spec 32, including its published test vector), the
  * 64-bit portable RoaringBitmapArray layout, and the versioned
  * `.bin` file framing with CRC-32 integrity.
  */
class DeltaDvSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  test("Z85: the ZeroMQ spec test vector and byte-level round trips") {
    // spec 32's published vector: 86 4F D2 6F B5 59 F7 5B <-> "HelloWorld"
    val hello = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(DeltaDv.z85Encode(hello) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").sameElements(hello))
    // arbitrary round trips incl. high bytes
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val b = Array.fill(4 * (1 + rnd.nextInt(16)))(rnd.nextInt().toByte)
      assert(DeltaDv.z85Decode(DeltaDv.z85Encode(b)).sameElements(b))
    }
    intercept[IllegalArgumentException] { DeltaDv.z85Encode(Array[Byte](1)) }
    intercept[IllegalArgumentException] { DeltaDv.z85Decode("abc") }
    intercept[IllegalArgumentException] { DeltaDv.z85Decode("ab de") }
    // UUIDs: 16 bytes <-> exactly 20 chars
    val u = java.util.UUID.fromString("0a1b2c3d-4e5f-6071-8293-a4b5c6d7e8f9")
    val enc = DeltaDv.encodeUuid(u)
    assert(enc.length == 20 && DeltaDv.decodeUuid(enc) == u)
  }

  test("RoaringBitmapArray portable: round trip, 32-bit-boundary keys, magic + layout checks") {
    val ps = Array(0L, 2L, 5L, 1000L, (1L << 32) + 3L, (5L << 32) + 7L)
    val data = DeltaDv.serialize(ps)
    assert(DeltaDv.deserialize(data).toSeq == ps.toSeq.sorted)
    // layout: LE magic, LE count(=3 distinct high keys), first LE key 0
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt == DeltaDv.Magic)
    assert(buf.getLong == 3L)
    assert(buf.getInt == 0)
    // duplicate + unsorted input normalizes
    assert(DeltaDv.deserialize(DeltaDv.serialize(Array(9L, 1L, 9L))).toSeq ==
      Seq(1L, 9L))
    // bad magic refused
    val bad = data.clone(); bad(0) = 0x00
    assert(intercept[IllegalArgumentException] { DeltaDv.deserialize(bad) }
      .getMessage.contains("magic"))
    // a dense run-heavy bitmap survives (exercises run containers)
    val dense = (0L until 100000L).toArray
    assert(DeltaDv.deserialize(DeltaDv.serialize(dense)).length == 100000)
  }

  test("file framing: version byte, size word, CRC-32; corruption fails loudly") {
    val root = Files.createTempDirectory("graft-dv")
    val ps = Array(1L, 4L, 6L)
    val (pathOrInline, offset, size, card) = DeltaDv.writeUuidFile(root, ps)
    val node = mapper.readTree(
      s"""{"storageType":"u","pathOrInlineDv":"$pathOrInline",""" +
        s""""offset":$offset,"sizeInBytes":$size,"cardinality":$card}""")
    assert(DeltaDv.readDescriptor(root, node).toSeq == ps.toSeq)
    // corrupt one data byte -> CRC catches it
    val uuid = DeltaDv.decodeUuid(pathOrInline.takeRight(20))
    val file = root.resolve(s"deletion_vector_$uuid.bin")
    val bytes = Files.readAllBytes(file)
    bytes(7) = (bytes(7) ^ 0x40).toByte
    Files.write(file, bytes)
    assert(intercept[IllegalArgumentException] {
      DeltaDv.readDescriptor(root, node)
    }.getMessage.contains("CRC"))
    // cardinality lies -> refused (FRESH positions: writeUuidFile is
    // content-addressed, so re-minting `ps` would resolve to the file
    // the corruption step above just damaged)
    val (p2, o2, s2, _) = DeltaDv.writeUuidFile(root, Array(2L, 5L, 8L))
    val lying = mapper.readTree(
      s"""{"storageType":"u","pathOrInlineDv":"$p2",""" +
        s""""offset":$o2,"sizeInBytes":$s2,"cardinality":99}""")
    assert(intercept[IllegalArgumentException] {
      DeltaDv.readDescriptor(root, lying)
    }.getMessage.contains("cardinality"))
    // absolute-path storage refused (self-contained tables only)
    val abs = mapper.readTree(
      """{"storageType":"p","pathOrInlineDv":"/x/dv.bin",""" +
        """"sizeInBytes":1,"cardinality":1}""")
    assert(intercept[IllegalArgumentException] {
      DeltaDv.readDescriptor(root, abs)
    }.getMessage.contains("self-contained"))
  }

  test("inline descriptors: Z85 padding to 4-byte multiples is declared and tolerated") {
    val root = Files.createTempDirectory("graft-dv-i")
    (1 to 8).foreach { n =>
      val ps = (0L until n.toLong).map(_ * 3L).toArray
      val (inline, size, card) = DeltaDv.inlineDescriptor(ps)
      val node = mapper.readTree(
        s"""{"storageType":"i","pathOrInlineDv":"$inline",""" +
          s""""sizeInBytes":$size,"cardinality":$card}""")
      assert(DeltaDv.readDescriptor(root, node).toSeq == ps.toSeq,
        s"inline round trip failed at n=$n")
    }
  }

  test("a DV file holding MULTIPLE vectors reads each by offset") {
    val root = Files.createTempDirectory("graft-dv-m")
    val a = DeltaDv.serialize(Array(1L, 2L))
    val b = DeltaDv.serialize(Array(7L, 8L, 9L))
    val fa = DeltaDv.frame(a); val fb = DeltaDv.frame(b)
    val uuid = java.util.UUID.randomUUID
    val bytes = new Array[Byte](1 + fa.length + fb.length)
    bytes(0) = 1
    System.arraycopy(fa, 0, bytes, 1, fa.length)
    System.arraycopy(fb, 0, bytes, 1 + fa.length, fb.length)
    Files.write(root.resolve(s"deletion_vector_$uuid.bin"), bytes)
    val enc = DeltaDv.encodeUuid(uuid)
    def node(off: Int, size: Int, card: Int) = mapper.readTree(
      s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":$off,""" +
        s""""sizeInBytes":$size,"cardinality":$card}""")
    assert(DeltaDv.readDescriptor(root, node(1, a.length, 2)).toSeq ==
      Seq(1L, 2L))
    assert(DeltaDv.readDescriptor(root,
      node(1 + fa.length, b.length, 3)).toSeq == Seq(7L, 8L, 9L))
  }
}
