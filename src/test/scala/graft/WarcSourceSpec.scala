package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.ingest.Warc
import graft.sources.WarcDataSource

/** The DSv2 `format("warc")` file source: record set ≡ the blob
  * parser's on the same bytes under EVERY split size (including splits
  * landing mid-record and mid-payload), the embedded-version-line trap,
  * malformed-record resilience, `host=` directory pruning, record-side
  * filter pushdown, and payload-skipping column pruning.
  */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, payload: String,
      warcType: String = "response"): Warc.WarcRecord =
    Warc.WarcRecord(warcType, uri, "2026-08-16T00:00:00Z",
      payload.getBytes(UTF_8))

  /** Write one segment file per (relative path, records). */
  private def store(files: (String, Seq[Warc.WarcRecord])*): Path = {
    val dir = Files.createTempDirectory("warcsrc")
    files.foreach { case (rel, rs) =>
      val f = dir.resolve(rel)
      Files.createDirectories(f.getParent)
      Files.write(f, Warc.format(rs))
    }
    dir
  }

  private def readAll(dir: Path, split: Long) =
    spark.read.format("warc")
      .option("maxSplitBytes", split)
      .load(dir.toString)
      .select($"host", $"target_uri", $"warc_type",
        length($"payload").as("n"), md5($"payload").as("m"))
      .collect().map(_.toSeq).toSet

  test("record set matches the blob parser under every split size, traps included") {
    // records sized so small split sizes land mid-header and
    // mid-payload; every 3rd payload embeds the bare version-line trap
    val rs = (1 to 40).map { i =>
      val body = ("x" * (i * 7 % 53)) + s" doc $i " + ("y" * (i % 11))
      rec(s"https://h$i.ex.test/p/$i",
        if (i % 3 == 0) "WARC/1.0\r\n" + body else body)
    }
    val dir = store("seg-a.warc" -> rs.take(25), "seg-b.warc" -> rs.drop(25))
    val expected = spark.createDataFrame(Seq(
        ("a", Warc.format(rs.take(25))), ("b", Warc.format(rs.drop(25)))))
      .toDF("seg", "blob")
    val exp = Warc.records(expected, $"blob")
      .select(lower(regexp_extract($"target_uri", "https://([^/]+)/", 1)).as("host"),
        $"target_uri", $"warc_type",
        length($"payload").as("n"), md5($"payload").as("m"))
      .collect().map(_.toSeq).toSet
    // whole-file, comfortable, tiny, and pathological split sizes
    for (split <- Seq(1L << 20, 512L, 64L, 17L)) {
      assert(readAll(dir, split) === exp, s"split=$split diverged")
    }
  }

  test("malformed garbage between records is skipped, like the blob parser") {
    val good = Seq(rec("https://a.test/1", "first"),
      rec("https://a.test/2", "second"))
    val dir = Files.createTempDirectory("warcsrc")
    val bytes = Warc.format(good.take(1)) ++
      "JUNK LINE no colon\r\nWARC/1.0\r\nbroken: yes\r\n\r\n".getBytes(UTF_8) ++
      Warc.format(good.drop(1))
    Files.write(dir.resolve("seg.warc"), bytes)
    for (split <- Seq(1L << 20, 32L)) {
      val uris = spark.read.format("warc").option("maxSplitBytes", split)
        .load(dir.toString).select($"target_uri").as[String].collect().sorted
      assert(uris.toSeq == Seq("https://a.test/1", "https://a.test/2"),
        s"split=$split")
    }
  }

  test("host= directories prune files at planning and set the host column") {
    val dir = store(
      "host=alpha.test/part-0.warc" -> Seq(rec("https://alpha.test/x", "pa")),
      "host=beta.test/part-0.warc" -> Seq(rec("https://beta.test/y", "pb")),
      "flat.warc" -> Seq(rec("https://Gamma.test:443/z", "pg")))
    val all = spark.read.format("warc").load(dir.toString)
    assert(all.select($"host").as[String].collect().sorted.toSeq ==
      Seq("alpha.test", "beta.test", "gamma.test"))
    // equality filter prunes to one partition-dir file + the flat file
    val filtered = all.where($"host" === "alpha.test")
    assert(filtered.select($"target_uri").as[String].collect().toSeq ==
      Seq("https://alpha.test/x"))
    // pruning is visible at the CHUNK level (beta's file never planned);
    // the two tiny surviving files bin-pack into one task
    val chunkPaths = filtered.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions
    }.flatten.collect {
      case wp: graft.sources.WarcInputPartition => wp.chunks.map(_.path)
    }.flatten
    assert(chunkPaths.exists(_.contains("alpha")) &&
      chunkPaths.exists(_.contains("flat")) &&
      !chunkPaths.exists(_.contains("beta")),
      s"beta dir must be pruned at planning: $chunkPaths")
    assert(filtered.rdd.getNumPartitions == 1,
      "two sub-split-size surviving files pack into one task")
    // prefix filter on host
    val pre = all.where($"host".startsWith("bet"))
      .select($"target_uri").as[String].collect().toSeq
    assert(pre == Seq("https://beta.test/y"))
  }

  test("pushed filters appear in the scan description; warc_type filters apply") {
    val dir = store("seg.warc" -> Seq(
      rec("https://a.test/1", "r1"),
      rec("https://a.test/2", "m1", warcType = "metadata")))
    val q = spark.read.format("warc").load(dir.toString)
      .where($"warc_type" === "response" && $"target_uri".startsWith("https://a"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[EqualTo(warc_type,response)"),
      s"plan must show the pushed filter:\n$plan")
    assert(q.select($"target_uri").as[String].collect().toSeq ==
      Seq("https://a.test/1"))
  }

  test("column pruning drops payload from the read schema") {
    val dir = store("seg.warc" -> Seq(rec("https://a.test/1", "payload-bytes")))
    val q = spark.read.format("warc").load(dir.toString)
      .select($"target_uri", $"warc_date")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadColumns=[target_uri, warc_date]"),
      s"payload must be pruned from the scan:\n$plan")
    assert(q.count() == 1L)
  }

  test("splittable=false yields one partition per file") {
    val dir = store(
      "s1.warc" -> Seq(rec("https://a.test/1", "x" * 500)),
      "s2.warc" -> Seq(rec("https://a.test/2", "y" * 500)))
    val df = spark.read.format("warc")
      .option("maxSplitBytes", 64).option("splittable", "false")
      .load(dir.toString)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 2L)
  }

  test("write side: df.write.format(warc) round-trips through both read paths") {
    val dir = Files.createTempDirectory("warcw")
    val in = (1 to 30).map(i =>
      ("response", s"https://h${i % 5}.test/p/$i", "2026-08-16T00:00:00Z",
        (s"payload $i " + "z" * (i % 13)).getBytes(UTF_8)))
      .toDF("warc_type", "target_uri", "warc_date", "payload")
    in.write.format("warc").mode("append").save(dir.toString)
    val back = spark.read.format("warc").option("maxSplitBytes", 128)
      .load(dir.toString)
      .select($"warc_type", $"target_uri", $"warc_date", md5($"payload"))
      .collect().map(_.toSeq).toSet
    val exp = in.select($"warc_type", $"target_uri", $"warc_date", md5($"payload"))
      .collect().map(_.toSeq).toSet
    assert(back == exp)
  }

  test("write side: partitionByHost lays out host= dirs the reader prunes") {
    val dir = Files.createTempDirectory("warcw")
    val in = Seq(
      ("a.test", "response", "https://a.test/1", "d", "pa".getBytes(UTF_8)),
      ("b.test", "response", "https://b.test/1", "d", "pb".getBytes(UTF_8)))
      .toDF("host", "warc_type", "target_uri", "warc_date", "payload")
    in.write.format("warc").option("partitionByHost", "true")
      .mode("append").save(dir.toString)
    assert(new java.io.File(dir.toFile, "host=a.test").isDirectory)
    val pruned = spark.read.format("warc").load(dir.toString)
      .where($"host" === "b.test")
    assert(pruned.rdd.getNumPartitions == 1, "a.test dir must be pruned")
    assert(pruned.select($"target_uri").as[String].collect().toSeq ==
      Seq("https://b.test/1"))
  }

  test("gzip segments: written as .warc.gz, read as whole-file splits") {
    val dir = Files.createTempDirectory("warcgz")
    val in = (1 to 20).map(i =>
      ("response", s"https://gz.test/p/$i", "2026-08-16T00:00:00Z",
        // the embedded-version-line trap survives gzip too
        ((if (i % 3 == 0) "WARC/1.0\r\n" else "") + s"body $i").getBytes(UTF_8)))
      .toDF("warc_type", "target_uri", "warc_date", "payload")
    in.write.format("warc").option("compress", "gzip")
      .mode("append").save(dir.toString)
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.nonEmpty, "gzip files must carry the .warc.gz extension")
    // maxSplitBytes is ignored for .gz: one partition per file
    val df = spark.read.format("warc").option("maxSplitBytes", 16)
      .load(dir.toString)
    assert(df.rdd.getNumPartitions == files.length)
    val back = df.select($"target_uri", md5($"payload"))
      .collect().map(_.toSeq).toSet
    val exp = in.select($"target_uri", md5($"payload"))
      .collect().map(_.toSeq).toSet
    assert(back == exp)
    // record-side filters still apply on the gz path
    assert(spark.read.format("warc").load(dir.toString)
      .where($"target_uri" === "https://gz.test/p/7").count() == 1L)
  }

  test("readStream: files arriving mid-stream ingest exactly once; restart resumes") {
    val dir = Files.createTempDirectory("warcstream")
    val ckpt = Files.createTempDirectory("warcstream-ckpt").toString
    def seg(name: String, ids: Range): Unit = {
      val f = dir.resolve(name)
      Files.write(f, Warc.format(ids.map(i => rec(s"https://s.test/$i", s"p$i"))))
    }
    seg("seg-1.warc", 1 to 5)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = {
      val q = spark.readStream.format("warc")
        .option("maxSplitBytes", 64) // several splits per file
        .load(dir.toString)
        .select($"target_uri")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          got.synchronized {
            got ++= b.collect().map(r => (id, r.getString(0)))
          }
          ()
        }.start()
      q.processAllAvailable()
      // a file landing mid-stream is picked up by a later trigger
      if (Files.list(dir).count() < 2) {
        seg("seg-2.warc", 6 to 8)
        q.processAllAvailable()
      }
      q.stop()
    }
    run()
    assert(got.map(_._2).sorted.toSeq ==
      (1 to 8).map(i => s"https://s.test/$i").sorted,
      s"each record exactly once across triggers: $got")
    assert(got.map(_._1).distinct.size >= 2, "two files → two micro-batches")
    // restart from the checkpoint: old files are NOT re-read, a new one is
    val before = got.size
    seg("seg-3.warc", 9 to 10)
    run()
    assert(got.size == before + 2, s"restart must ingest only seg-3: $got")
    assert(got.map(_._2).toSet.size == 10)
  }

  test("overwrite mode truncates existing data files (SupportsTruncate)") {
    val dir = Files.createTempDirectory("warcow")
    def df(ids: Range) = ids.map(i =>
      ("response", s"https://ow.test/$i", "d", s"p$i".getBytes(UTF_8)))
      .toDF("warc_type", "target_uri", "warc_date", "payload")
    df(1 to 3).write.format("warc").mode("append").save(dir.toString)
    df(4 to 5).write.format("warc").mode("overwrite").save(dir.toString)
    val uris = spark.read.format("warc").load(dir.toString)
      .select($"target_uri").as[String].collect().toSet
    assert(uris == Set("https://ow.test/4", "https://ow.test/5"),
      "overwrite must drop the previously-written records")
    // truncation reaches host= subdirectories too
    val hdir = Files.createTempDirectory("warcowh")
    def hdf(host: String, id: Int) = Seq(
      (host, "response", s"https://$host/$id", "d", "p".getBytes(UTF_8)))
      .toDF("host", "warc_type", "target_uri", "warc_date", "payload")
    hdf("a.test", 1).write.format("warc")
      .option("partitionByHost", "true").mode("append").save(hdir.toString)
    hdf("b.test", 2).write.format("warc")
      .option("partitionByHost", "true").mode("overwrite").save(hdir.toString)
    assert(spark.read.format("warc").load(hdir.toString)
      .select($"target_uri").as[String].collect().toSeq ==
      Seq("https://b.test/2"))
  }

  test("paths with commas survive multi-path load (JSON paths option)") {
    val d1 = store("a.warc" -> Seq(rec("https://x.test/1", "p1")))
    val base = Files.createTempDirectory("warcc")
    val d2 = base.resolve("part,two") // legal in URIs; the old comma
    Files.createDirectories(d2)       // split shredded it into two paths
    Files.write(d2.resolve("b.warc"),
      Warc.format(Seq(rec("https://x.test/2", "p2"))))
    val got = spark.read.format("warc").load(d1.toString, d2.toString)
      .select($"target_uri").as[String].collect().toSet
    assert(got == Set("https://x.test/1", "https://x.test/2"))
  }

  test("host pruning drops non-matching dirs at PLANNING: partition counts") {
    val dir = Files.createTempDirectory("warcprune")
    def write(host: String): java.nio.file.Path = {
      val f = dir.resolve(s"host=$host/seg.warc")
      Files.createDirectories(f.getParent)
      Files.write(f, Warc.format(
        (1 to 20).map(i => rec(s"https://$host/p/$i", "x" * 50))))
      f
    }
    val fa = write("a.test")
    val fb = write("b.test")
    val split = 256L
    def scanParts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }.sum
    def nSplits(f: java.nio.file.Path): Int =
      ((Files.size(f) + split - 1) / split).toInt
    val all = spark.read.format("warc").option("maxSplitBytes", split)
      .load(dir.toString)
    // unfiltered: every file contributes ceil(len/split) partitions
    assert(scanParts(all) == nSplits(fa) + nSplits(fb))
    // filtered: the non-matching host= directory contributes ZERO
    // planned partitions — pruned at planInputPartitions, not merely
    // filtered record-side
    val one = all.where($"host" === "a.test")
    assert(scanParts(one) == nSplits(fa),
      "b.test's directory must be dropped at planning")
    assert(one.count() == 20)
  }

  test("maxFilesPerTrigger drains a backlog in bounded batches, exactly once") {
    val dir = Files.createTempDirectory("warcadm")
    val ckpt = Files.createTempDirectory("warcadm-ckpt").toString
    (1 to 5).foreach { f =>
      Files.write(dir.resolve(s"seg-$f.warc"),
        Warc.format(Seq(rec(s"https://adm.test/$f", s"p$f"))))
    }
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("warc")
      .option("maxFilesPerTrigger", 2)
      .load(dir.toString)
      .select($"target_uri")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got.synchronized { got ++= b.collect().map(r => (id, r.getString(0))) }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(got.map(_._2).sorted.toSeq ==
      (1 to 5).map(i => s"https://adm.test/$i"),
      s"every record exactly once: $got")
    // 5 pre-existing files at 2 per trigger → at least 3 micro-batches
    assert(got.map(_._1).distinct.size >= 3,
      s"the backlog must drain in bounded steps: ${got.map(_._1).distinct}")
    // maxBytesPerTrigger: tiny byte budget → one file per batch (the
    // first file always admits even past the budget), same exactly-once
    val dir2 = Files.createTempDirectory("warcadmb")
    val ckpt2 = Files.createTempDirectory("warcadmb-ckpt").toString
    (1 to 3).foreach { f =>
      Files.write(dir2.resolve(s"seg-$f.warc"),
        Warc.format(Seq(rec(s"https://admb.test/$f", s"p$f"))))
    }
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q2 = spark.readStream.format("warc")
      .option("maxBytesPerTrigger", 1) // smaller than any segment
      .load(dir2.toString)
      .select($"target_uri")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt2)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got2.synchronized { got2 ++= b.collect().map(r => (id, r.getString(0))) }
        ()
      }.start()
    q2.processAllAvailable()
    q2.stop()
    assert(got2.map(_._2).sorted.toSeq ==
      (1 to 3).map(i => s"https://admb.test/$i"), s"exactly once: $got2")
    assert(got2.map(_._1).distinct.size == 3,
      s"1-byte budget admits one file per batch: ${got2.map(_._1).distinct}")
  }

  test("Trigger.AvailableNow drains the snapshot in bounded batches, then stops") {
    val dir = Files.createTempDirectory("warcavn")
    val ckpt = Files.createTempDirectory("warcavn-ckpt").toString
    def seg(i: Int, dirP: java.nio.file.Path = dir): Unit =
      Files.write(dirP.resolve(s"seg-$i.warc"),
        Warc.format(Seq(rec(s"https://avn.test/$i", s"p$i"))))
    (1 to 5).foreach(seg(_))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = {
      val q = spark.readStream.format("warc")
        .option("maxFilesPerTrigger", 2)
        .load(dir.toString)
        .select($"target_uri")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          got.synchronized { got ++= b.collect().map(r => (id, r.getString(0))) }
          ()
        }.start()
      assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    }
    run()
    // WITHOUT SupportsTriggerAvailableNow Spark logged "falling back to
    // single batch execution ... read limit ignored" — one unbounded
    // batch. With it, the 5-file snapshot drains at 2 per trigger.
    assert(got.map(_._2).sorted.toSeq ==
      (1 to 5).map(i => s"https://avn.test/$i"), s"exactly once: $got")
    assert(got.map(_._1).distinct.size >= 3,
      s"admission must bound each batch: ${got.map(_._1).distinct}")
    // restart after more files land: only the delta, again bounded
    val before = got.size
    (6 to 8).foreach(seg(_))
    run()
    assert(got.size == before + 3 && got.map(_._2).toSet.size == 8,
      s"restart ingests exactly the delta: $got")
  }

  test("vacuum sweeps aged orphan temps, spares young ones and data files") {
    val dir = Files.createTempDirectory("warcvac")
    val host = dir.resolve("host=v.test")
    Files.createDirectories(host)
    Files.write(host.resolve("part-aaaa-p00001.warc"),
      Warc.format(Seq(rec("https://v.test/1", "p"))))
    val orphan = host.resolve(".part-dead-12345678.tmp")
    Files.write(orphan, "partial".getBytes(UTF_8))
    orphan.toFile.setLastModified(System.currentTimeMillis() - 3600_000L)
    val young = host.resolve(".part-live-87654321.tmp")
    Files.write(young, "in flight".getBytes(UTF_8))
    val n = graft.sources.WarcStore.vacuum(dir.toString, olderThanMs = 60_000L)
    assert(n == 1, s"exactly the aged orphan: $n")
    assert(!Files.exists(orphan) && Files.exists(young))
    assert(spark.read.format("warc").load(dir.toString).count() == 1L,
      "data files untouched")
    intercept[IllegalArgumentException] {
      graft.sources.WarcStore.vacuum(dir.toString, olderThanMs = 0L)
    }
  }

  test("bin packing: many small segments ride few tasks, records exact") {
    val dir = Files.createTempDirectory("warcpack")
    (1 to 60).foreach { f =>
      val d = dir.resolve(s"host=h$f.test")
      Files.createDirectories(d)
      Files.write(d.resolve("seg.warc"),
        Warc.format(Seq(rec(s"https://h$f.test/$f", s"p$f"))))
    }
    // default open cost (4 MiB) against the default 128 MiB capacity:
    // ~32 small files per bin → 60 files plan as 2 tasks, not 60
    val df = spark.read.format("warc").load(dir.toString)
    val parts = df.rdd.getNumPartitions
    assert(parts <= 3, s"small files must pack: $parts tasks for 60 files")
    assert(df.select($"target_uri").as[String].collect().sorted.toSeq ==
      (1 to 60).map(i => s"https://h$i.test/$i").sorted,
      "packing must not lose or duplicate records")
    // pack() law directly: split chunks of a large file weigh >= the
    // capacity with the default open cost and keep their own bins
    val big = (0L until 512L by 128L).map(s =>
      graft.sources.WarcChunk("f", s, s + 128L, 512L, None))
    val bins = graft.sources.WarcDataSource.pack(big, capacity = 128L,
      openCostBytes = 4L * 1024 * 1024)
    assert(bins.length == big.length, "large-file parallelism untouched")
  }

  test("stream source fails loudly when a seen file changes length") {
    val dir = Files.createTempDirectory("warcmut")
    val ckpt = Files.createTempDirectory("warcmut-ckpt").toString
    val f = dir.resolve("seg-1.warc")
    Files.write(f, Warc.format(Seq(rec("https://m.test/1", "p1"))))
    def start() = spark.readStream.format("warc").load(dir.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.count(); ()
      }.start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // append in place: same path, new length — the immutability
    // contract is violated and the source must say so, not re-emit
    Files.write(f, Warc.format(Seq(rec("https://m.test/2", "p2"))),
      java.nio.file.StandardOpenOption.APPEND)
    val q2 = start()
    val ex = intercept[Exception] { q2.processAllAvailable() }
    def chain(t: Throwable): String = {
      var m = ""
      var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
      m
    }
    assert(chain(ex).contains("changed length"), chain(ex))
    q2.stop()
  }

  test("speculative twin attempts collide on the final name: one file, no dups") {
    val dir = Files.createTempDirectory("warcspec")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("warc_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("target_uri",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("warc_date",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    val conf = new graft.sources.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    def row(i: Int) = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("response"),
      org.apache.spark.unsafe.types.UTF8String.fromString(s"https://s.test/$i"),
      org.apache.spark.unsafe.types.UTF8String.fromString("d"),
      s"p$i".getBytes(UTF_8))
    // two ATTEMPTS of the same task share the fileTag (the job+partition
    // identity); both write identical content, both commit — rename
    // first-wins must leave exactly ONE published file
    def attempt(): Unit = {
      val w = new graft.sources.WarcDataWriter(dir.toString, schema,
        partitionByHost = false, compress = "none", fileTag = "job1-p00001",
        conf = conf)
      (1 to 3).foreach(i => w.write(row(i)))
      w.commit(); w.close()
    }
    attempt(); attempt()
    val files = Files.list(dir).toArray.map(_.toString)
      .filterNot(f => f.contains("/.") || f.contains("/_"))
    assert(files.length == 1, s"one published file expected: ${files.toSeq}")
    val uris = spark.read.format("warc").load(dir.toString)
      .select($"target_uri").as[String].collect().sorted.toSeq
    assert(uris == (1 to 3).map(i => s"https://s.test/$i"),
      "records exactly once despite two committed attempts")
  }

  test("writeStream.format(warc): live archive, restart appends, no dups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{concat, lit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("warcssink").toString
    val ckpt = Files.createTempDirectory("warcssink-ckpt").toString
    val stream = MemoryStream[(String, Int)]
    def archive() = stream.toDF().toDF("host", "i")
      .select($"host",
        lit("response").as("warc_type"),
        concat(lit("https://"), $"host", lit("/"), $"i").as("target_uri"),
        lit("2026-08-16T00:00:00Z").as("warc_date"),
        concat(lit("payload "), $"i").cast("binary").as("payload"))
      .writeStream.format("warc")
      .option("partitionByHost", "true")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(dir)
    val q1 = archive()
    stream.addData(("a.test", 1), ("a.test", 2), ("b.test", 3))
    q1.processAllAvailable()
    stream.addData(("b.test", 4))
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: committed epochs are not replayed,
    // a new batch lands under a new epoch name
    val q2 = archive()
    stream.addData(("a.test", 5))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.format("warc").load(dir)
      .select($"host", $"target_uri").as[(String, String)]
      .collect().toSet
    assert(got == Set(
      ("a.test", "https://a.test/1"), ("a.test", "https://a.test/2"),
      ("b.test", "https://b.test/3"), ("b.test", "https://b.test/4"),
      ("a.test", "https://a.test/5")),
      s"each record exactly once across batches and a restart: $got")
    // epoch-deterministic names: every published file carries the
    // query/epoch/partition identity — the FULL 32-hex query UUID (a
    // truncated tag risked a silent cross-query rename collision) and
    // no attempt-unique component
    val names = java.nio.file.Files.walk(java.nio.file.Path.of(dir))
      .toArray.map(_.toString).filter(_.endsWith(".warc"))
    assert(names.nonEmpty && names.forall(_.matches(".*part-[0-9a-f]{32}-e\\d+-p\\d{5}\\.warc$")),
      s"epoch-deterministic names expected: ${names.toSeq}")
  }

  test("record-gzip segments: splittable compressed reads, any split size") {
    val dir = Files.createTempDirectory("warcrg")
    val in = (1 to 40).map(i =>
      ("response", s"https://rg.test/p/$i", "2026-08-16T00:00:00Z",
        // traps survive compression too; varied sizes move member
        // boundaries around relative to split edges
        ((if (i % 3 == 0) "WARC/1.0\r\n" else "") + s"body $i " + "q" * (i % 17))
          .getBytes(UTF_8)))
      .toDF("warc_type", "target_uri", "warc_date", "payload")
    in.write.format("warc").option("compress", "record-gzip")
      .mode("append").save(dir.toString)
    val exp = in.select($"target_uri", md5($"payload"))
      .collect().map(_.toSeq).toSet
    for (split <- Seq(1L << 20, 256L, 64L, 23L)) {
      val df = spark.read.format("warc")
        .option("recordGzip", "true").option("maxSplitBytes", split)
        .load(dir.toString)
      val back = df.select($"target_uri", md5($"payload"))
        .collect().map(_.toSeq).toSet
      assert(back == exp, s"split=$split diverged")
    }
    // small splits really do fan out into multiple partitions
    val parts = spark.read.format("warc")
      .option("recordGzip", "true").option("maxSplitBytes", 256)
      .load(dir.toString).rdd.getNumPartitions
    assert(parts > 1, s"expected multiple splits, got $parts")
    // without the recordGzip declaration the same files still read
    // correctly as whole-file gzip splits (concatenated members —
    // GZIPInputStream reads them transparently); small .gz files
    // bin-pack under the default open cost, and openCostBytes =
    // capacity recovers the one-task-per-file layout exactly
    val nFiles = dir.toFile.listFiles().count(_.getName.endsWith(".warc.gz"))
    val whole = spark.read.format("warc").load(dir.toString)
    assert(whole.rdd.getNumPartitions <= nFiles)
    assert(whole.select($"target_uri", md5($"payload"))
      .collect().map(_.toSeq).toSet == exp)
    val solo = spark.read.format("warc")
      .option("openCostBytes", 128L * 1024 * 1024).load(dir.toString)
    assert(solo.rdd.getNumPartitions == nFiles)
    assert(solo.select($"target_uri", md5($"payload"))
      .collect().map(_.toSeq).toSet == exp)
  }

  test("gzip member codec: round trip, header options, corruption rejected") {
    val data = "WARC/1.0\r\npayload".getBytes(UTF_8)
    val member = graft.sources.GzipMembers.gzipMember(data)
    val read = (o: Long, l: Int) =>
      java.util.Arrays.copyOfRange(member, o.toInt, o.toInt + l)
    val got = graft.sources.GzipMembers.readMember(read, 0L, member.length.toLong)
    assert(got != null && got._1.toSeq == data.toSeq &&
      got._2 == member.length.toLong)
    // flipped payload byte → CRC mismatch → rejected
    val bad = member.clone(); bad(12) = (bad(12) ^ 0x5a).toByte
    val readBad = (o: Long, l: Int) =>
      java.util.Arrays.copyOfRange(bad, o.toInt, o.toInt + l)
    assert(graft.sources.GzipMembers.readMember(readBad, 0L, bad.length.toLong) == null)
    // truncated member → rejected
    assert(graft.sources.GzipMembers.readMember(read, 0L, member.length - 4L) == null)
    // a FALSE magic candidate whose deflate body is invalid (stored
    // block with LEN/NLEN mismatch — the exact shape a 1f 8b 08
    // triple inside real compressed data produces) must return null,
    // never throw: the split-sync scan probes arbitrary offsets and a
    // DataFormatException there killed the task (r12 regression fix)
    val falseCandidate = Array[Byte](
      0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, // header
      0x01, 0x01, 0x00, 0x00, 0x00, // stored block, NLEN != ~LEN
      0, 0, 0, 0, 0, 0, 0, 0) // "trailer" padding
    val readFalse = (o: Long, l: Int) =>
      java.util.Arrays.copyOfRange(falseCandidate, o.toInt, o.toInt + l)
    assert(graft.sources.GzipMembers.readMember(
      readFalse, 0L, falseCandidate.length.toLong) == null)
  }

  test("multi-path load and SQL DDL (CREATE TABLE USING warc)") {
    val d1 = store("a.warc" -> Seq(rec("https://m.test/1", "p1")))
    val d2 = store("b.warc" -> Seq(rec("https://m.test/2", "p2")))
    val both = spark.read.format("warc").load(d1.toString, d2.toString)
      .select($"target_uri").as[String].collect().sorted.toSeq
    assert(both == Seq("https://m.test/1", "https://m.test/2"))
    // the catalog path: a named table over the store, plain SQL on top
    spark.sql("DROP TABLE IF EXISTS warc_store")
    spark.sql(
      s"CREATE TABLE warc_store USING warc OPTIONS (path '${d1.toString}')")
    val viaSql = spark.sql(
      "SELECT target_uri, octet_length(payload) AS n FROM warc_store")
      .as[(String, Long)].collect().toSeq
    assert(viaSql == Seq(("https://m.test/1", 2L)))
    spark.sql("DROP TABLE warc_store")
  }

  test("estimateStatistics: Catalyst sees the pruned byte size of the store") {
    val dir = Files.createTempDirectory("warcstats")
    def write(host: String, n: Int): java.nio.file.Path = {
      val f = dir.resolve(s"host=$host/seg.warc")
      Files.createDirectories(f.getParent)
      Files.write(f, Warc.format(
        (1 to n).map(i => rec(s"https://$host/p/$i", "x" * 40))))
      f
    }
    val fa = write("a.test", 3)
    val fb = write("b.test", 30)
    def scanStats(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.sizeInBytes
      }.head
    val all = spark.read.format("warc").load(dir.toString)
    assert(scanStats(all) == BigInt(Files.size(fa) + Files.size(fb)),
      "unfiltered estimate = total store bytes")
    // a pushed host filter shrinks the ESTIMATE, not just the scan —
    // this is what lets Catalyst broadcast a filtered warc relation
    assert(scanStats(all.where($"host" === "a.test")) == BigInt(Files.size(fa)),
      "filtered estimate = surviving host= directory bytes only")
  }

  test("a filtered warc relation becomes the BROADCAST side by its own stats") {
    val dir = Files.createTempDirectory("warcbcast")
    def write(host: String, n: Int): Unit = {
      val f = dir.resolve(s"host=$host/seg.warc")
      Files.createDirectories(f.getParent)
      Files.write(f, Warc.format(
        (1 to n).map(i => rec(s"https://$host/p/$i", "x" * 30))))
    }
    write("tiny.test", 2)
    write("other.test", 50)
    val warc = spark.read.format("warc").load(dir.toString)
      .where($"host" === "tiny.test")
      .select($"host", $"target_uri")
    // the other side's estimate is well past the broadcast threshold,
    // so the ONLY way this plans as a broadcast join is the warc scan
    // reporting its (pruned, tiny) size — default v2 estimates are
    // effectively infinite and forced a sort-merge join here
    val big = spark.range(2000000L)
      .select(when($"id" % 100 === 0, lit("tiny.test"))
        .otherwise(concat(lit("h"), $"id" % 100)).as("bhost"))
    val q = big.join(warc, $"bhost" === $"host")
    // STATIC planning (pre-AQE): broadcast must come from the estimate,
    // not from AQE's runtime shuffle-size rescue
    val static = q.queryExecution.sparkPlan
    assert(static.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"expected a stats-driven broadcast join:\n$static")
    assert(!static.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"no sort-merge fallback expected:\n$static")
    assert(q.count() == 2L * 20000L, "2 tiny records x 20000 matching ids")
  }

  test("runtime In(host) filter re-prunes planned partitions numerically") {
    val dir = Files.createTempDirectory("warcrtf")
    def write(host: String): java.nio.file.Path = {
      val f = dir.resolve(s"host=$host/seg.warc")
      Files.createDirectories(f.getParent)
      Files.write(f, Warc.format(
        (1 to 20).map(i => rec(s"https://$host/p/$i", "x" * 50))))
      f
    }
    val fa = write("a.test")
    val fb = write("b.test")
    val split = 256L
    def nSplits(f: java.nio.file.Path): Int =
      ((Files.size(f) + split - 1) / split).toInt
    val df = spark.read.format("warc").option("maxSplitBytes", split)
      .load(dir.toString)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.sources.WarcScan]
    assert(scan.planInputPartitions().length == nSplits(fa) + nSplits(fb))
    // the DPP/runtime-filter handshake: Spark hands an In(host, …)
    // filter to the scan AFTER planning and re-plans the partitions —
    // the non-matching host= directory must then contribute ZERO
    // planned partitions (the q187 numeric-assertion discipline, under
    // a RUNTIME rather than literal filter)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("host", Array("a.test"))))
    assert(scan.planInputPartitions().length == nSplits(fa),
      "b.test's directory must contribute zero partitions under the runtime filter")
  }

  test("dynamic pruning injects a runtime filter through a broadcast join") {
    val dir = Files.createTempDirectory("warcdpp")
    def write(host: String): Unit = {
      val f = dir.resolve(s"host=$host/seg.warc")
      Files.createDirectories(f.getParent)
      Files.write(f, Warc.format(
        (1 to 10).map(i => rec(s"https://$host/p/$i", "y" * 40))))
    }
    write("a.test"); write("b.test"); write("c.test")
    // the dim must come from a SOURCE (not a literal LocalRelation):
    // constant folding would otherwise evaluate the filter at plan time
    // and PartitionPruning sees no selective predicate to key DPP on
    // a bare boolean column is not "likely selective" to the DPP rule;
    // an equality comparison is
    val dimPath = Files.createTempDirectory("warcdppdim").resolve("dim").toString
    Seq(("a.test", 1), ("b.test", 2), ("c.test", 3))
      .toDF("dhost", "grp").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = spark.read.format("warc").load(dir.toString)
      .join(dim.where($"grp" === 1), $"host" === $"dhost")
      .select($"target_uri")
    assert(q.count() == 10L)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          allNodes(r.child)
        case _ => Nil
      })
    val executed = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = allNodes(executed).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.exists(_.runtimeFilters.nonEmpty),
      s"expected a dynamic-pruning runtime filter on the warc scan:\n$executed")
  }

  test("maxBytes admission is a strict prefix: an over-budget file is never starved") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val stream = new graft.sources.WarcMicroBatchStream(
      Seq("/nonexistent"), Array.empty, WarcDataSource.Schema,
      maxSplitBytes = 128, splittable = true)
    // canonical (lexicographic length:path) order puts the big segment
    // between two small ones; skip-and-continue admission took the
    // LATER small file past it every batch, so the big one was only
    // admitted when it happened to head the fresh list — starvation in
    // a continuously growing store. Prefix semantics stop at the first
    // file that does not fit.
    val fresh = Seq("15:a", "800:b", "90:c")
    assert(stream.admit(fresh, ReadLimit.maxBytes(120)) == Seq("15:a"),
      "must stop at the first non-fitting file, not skip it")
    // next batch: the big file heads the fresh list and admits alone
    assert(stream.admit(fresh.drop(1), ReadLimit.maxBytes(120)) == Seq("800:b"),
      "the first file always admits, even past the budget")
    assert(stream.admit(fresh.drop(2), ReadLimit.maxBytes(120)) == Seq("90:c"))
    // bounded-delay guarantee: every file drains within 3 batches here
  }

  test("offset JSON: full escape round trip; Spark-style escapes decode") {
    import graft.sources.WarcFilesOffset
    // paths with quotes, backslashes, control chars, and non-ASCII
    // survive the checkpoint offset log byte-exactly
    val weird = Seq("10:/a\nb", "5:/c\"d\\e", "7:/t\tuü", "3:/f\rg")
    val rt = WarcFilesOffset.fromJson(WarcFilesOffset(weird).json()).files
    assert(rt == weird, s"round trip diverged: $rt")
    // the Spark-produced `paths` option escapes the standard way —
    // \n, \t, \uXXXX must decode to the real characters, not literals
    val sparkStyle =
      "[\"5:/a\\" + "u0041b\",\"4:/x\\ny\",\"2:/p\\tq\",\"1:/s\\/t\"]"
    assert(WarcFilesOffset.fromJson(sparkStyle).files ==
      Seq("5:/aAb", "4:/x\ny", "2:/p\tq", "1:/s/t"))
    // an escape outside the JSON set fails loudly, never mangles
    intercept[IllegalArgumentException] {
      WarcFilesOffset.fromJson("""["bad\qescape"]""")
    }
  }

  test("hostOf: scheme, port, case; dirHost capture") {
    assert(WarcDataSource.hostOf("https://EX.Test:8080/a/b") == "ex.test")
    assert(WarcDataSource.hostOf("ex.test/a") == "ex.test")
    assert(WarcDataSource.dirHost("/x/host=h.test/f.warc").contains("h.test"))
    assert(WarcDataSource.dirHost("/x/flat/f.warc").isEmpty)
  }
}
