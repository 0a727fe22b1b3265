package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.streaming.ReadLimit

import java.nio.file.{Files, Paths}

/**
 * Admission control of [[ChunkLedgerStream.latestOffset]] under an explicit
 * engine-passed [[ReadLimit]]: the source's own chunk cap must INTERSECT
 * with file/row caps (Trigger.AvailableNow and rate configs hand composite
 * limits here) instead of silently ignoring them.
 */
class ChunkLedgerLimitSpec extends SparkSpec {

  /** chunk layout: chunk=0000i with `filesPerChunk(i)` one-byte data files,
    * each `_SUCCESS`-marked (the ledger's committed-chunk contract). */
  private def mkLedger(filesPerChunk: Seq[Int]): String = {
    val root = tmpDir("ledgerlimit")
    filesPerChunk.zipWithIndex.foreach { case (n, i) =>
      val d = Paths.get(root, f"chunk=$i%05d")
      Files.createDirectories(d)
      (0 until n).foreach(j =>
        Files.write(d.resolve(f"part-$j%05d.parquet"), Array[Byte](1)))
      Files.write(d.resolve("_SUCCESS"), Array.emptyByteArray)
    }
    root
  }

  private def latest(root: String, maxChunks: Int, limit: ReadLimit,
      from: String = ""): String = {
    SparkSession.setActiveSession(spark)
    val s = new ChunkLedgerStream(root, maxChunks)
    s.latestOffset(ChunkOffset(from), limit) match {
      case ChunkOffset(c) => c
    }
  }

  test("ReadMaxFiles caps admitted chunks by cumulative data-file count") {
    val root = mkLedger(Seq(2, 3, 4))
    // 2 + 3 = 5 <= 5; adding chunk 2 (4 files) would exceed -> stop at 00001
    assert(latest(root, 10, ReadLimit.maxFiles(5)) == "chunk=00001")
    // cap below the first chunk still admits it (progress guarantee — the
    // same first-entry rule as the built-in file source)
    assert(latest(root, 10, ReadLimit.maxFiles(1)) == "chunk=00000")
    // unbounded limit leaves the source's own chunk cap in charge
    assert(latest(root, 10, ReadLimit.allAvailable()) == "chunk=00002")
    assert(latest(root, 1, ReadLimit.allAvailable()) == "chunk=00000")
  }

  test("ReadMaxRows caps the same quantity (manifest rows ARE files)") {
    val root = mkLedger(Seq(2, 3, 4))
    assert(latest(root, 10, ReadLimit.maxRows(4L)) == "chunk=00000")
    assert(latest(root, 10, ReadLimit.maxRows(9L)) == "chunk=00002")
  }

  test("composite limit takes the tightest cap and intersects the chunk cap") {
    val root = mkLedger(Seq(2, 3, 4))
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.maxFiles(9), ReadLimit.maxRows(5L)))
    assert(latest(root, 10, composite) == "chunk=00001")
    // the source option is still the outer bound even under a loose limit
    assert(latest(root, 1, ReadLimit.maxFiles(100)) == "chunk=00000")
    // resuming from a mid-stream offset applies the cap to FRESH chunks only
    assert(latest(root, 10, ReadLimit.maxFiles(3), from = "chunk=00000")
      == "chunk=00001")
  }
}
