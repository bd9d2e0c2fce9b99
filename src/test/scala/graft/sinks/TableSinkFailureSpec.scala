package graft.sinks

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}

import graft.SparkSpec

/** Local filesystem that can be armed to fail exactly the staging→target
  * swap rename (src ending in `__staging`), leaving every other rename —
  * including the parquet committer's task/job renames — untouched. Lets
  * the spec exercise [[TableSink.insertOverwriteFromSelf]]'s failure
  * path, which cannot be reached through a healthy local fs. */
class FaultyRenameFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")
  override def rename(src: HPath, dst: HPath): Boolean =
    if (FaultyRenameFileSystem.failSwap.get() && src.getName.endsWith("__staging")) false
    else super.rename(src, dst)
}

object FaultyRenameFileSystem {
  val failSwap = new AtomicBoolean(false)
}

class TableSinkFailureSpec extends SparkSpec {

  test("self-overwrite swap failure rolls the original data back into place") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyRenameFileSystem].getName)
    val base = java.nio.file.Files.createTempDirectory("graft_sink_fail").toString
    val dir = s"$base/t"
    val faultyDir = s"faulty://$dir"
    Seq((1, 10), (2, 20)).toDF("id", "v").write.parquet(dir)

    FaultyRenameFileSystem.failSwap.set(true)
    try {
      val e = intercept[IllegalArgumentException] {
        TableSink.insertOverwriteFromSelf(
          Seq((9, 90)).toDF("id", "v"), faultyDir)
      }
      assert(e.getMessage.contains("could not swap staging"))
    } finally FaultyRenameFileSystem.failSwap.set(false)

    // the original rows are back at the table path — never an empty table
    val back = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(back.toSeq === Seq((1, 10), (2, 20)))
    // the staged result (the only copy of the new data) was NOT deleted
    assert(new java.io.File(dir + "__staging").exists())

    // a healthy retry swaps cleanly and leaves no residue
    TableSink.insertOverwriteFromSelf(Seq((9, 90)).toDF("id", "v"), faultyDir)
    val after = spark.read.parquet(dir).collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(after.toSeq === Seq((9, 90)))
    assert(!new java.io.File(dir + "__old").exists())
    assert(!new java.io.File(dir + "__staging").exists())
  }
}
