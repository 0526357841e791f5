package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumException, FileSystem, Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** The bench/specs session default is RawLocalFileSystem (measured 0.94×
  * on the 32-core stream subset; production checkpoint stores verify
  * server-side). This suite is the one place that still exercises the
  * DEFAULT ChecksumFileSystem path, so sidecar writing/verification —
  * and the corruption DETECTION the raw FS gives up — stays covered
  * (round-19 advice). A fresh Hadoop Configuration keeps it independent
  * of the shared Spark session's conf (suites run in parallel). */
class ChecksumFsSpec extends AnyFunSuite {

  test("default local FS writes .crc sidecars and detects corruption") {
    val conf = new Configuration(false) // defaults only: checksummed file://
    conf.set("fs.file.impl.disable.cache", "true")
    val dir = Files.createTempDirectory("graft-crcfs-")
    val fs = FileSystem.getLocal(conf)
    val target = new HPath(dir.resolve("payload.bin").toString)
    val out = fs.create(target)
    out.write(Array.tabulate[Byte](4096)(i => (i % 251).toByte))
    out.close()
    // the checksummed FS wrote a sidecar the raw FS would not
    assert(Files.exists(dir.resolve(".payload.bin.crc")),
      "ChecksumFileSystem must write the .crc sidecar")
    // clean read passes verification
    val in = fs.open(target)
    val buf = new Array[Byte](4096)
    in.readFully(0, buf)
    in.close()
    assert(buf(17) === (17 % 251).toByte)
    // flip a byte in the payload: the checksummed read must now FAIL —
    // the detection a raw-FS session trades away
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(dir.resolve("payload.bin").toString),
      StandardOpenOption.WRITE)
    try {
      ch.position(1024)
      ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0x7f)))
    } finally ch.close()
    val in2 = fs.open(target)
    intercept[ChecksumException] {
      in2.readFully(0, new Array[Byte](4096))
    }
    in2.close()
  }
}
