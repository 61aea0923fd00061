package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.{GraftCommitWrite, GraftCommitWriterFactory, GraftTempFile,
  SerializableHadoopConf}

/** Commit-protocol tests for the DSv2 sink (q_sink_custom_dsv2's
  * engine): the retry/speculation/abort/crash paths the end-to-end
  * query cannot exercise are driven here directly against the writer
  * factory and the driver-side BatchWrite. */
class SinksSpec extends SparkSpec {

  private val schema = new StructType()
    .add("k", LongType).add("s", StringType)

  private def row(k: Long, s: String) =
    new GenericInternalRow(Array[Any](k, UTF8String.fromString(s)))

  private def serConf = new SerializableHadoopConf(
    spark.sparkContext.hadoopConfiguration)

  private def freshDir(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_rt/sinkspec_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  private def partFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("part-")).sorted.toSeq
  }

  private def manifest(dir: String): Seq[(String, Long)] =
    new String(Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8")
      .split("\n").filter(_.nonEmpty).filterNot(_.startsWith("#")).toSeq
      // entries are (file, rows[, ncols]) since the round-13 schema
      // evolution; the protocol assertions here care about file + rows
      .map { l => val f = l.split("\t"); (f(0), f(1).toLong) }

  test("end-to-end write publishes parts + trailing manifest, sweeps temps") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("e2e")
    val df = spark.range(100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("s"))
    df.write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    val parts = partFiles(dir)
    assert(parts.nonEmpty, "no parts published")
    val man = manifest(dir)
    assert(man.map(_._1).sorted === parts, "manifest must list exactly the parts")
    assert(man.map(_._2).sum === 100L, "manifest row counts must sum to input")
    assert(!new java.io.File(dir, "_temp").exists(), "temps not swept")
    // round-trip through the published files
    val back = spark.read.text(s"$dir/part-*.tsv").count()
    assert(back === 100L)
  }

  test("overwrite swaps generations: new manifest + parts, old parts gone") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("trunc")
    def gen(n: Int) = spark.range(n).select(col("id").as("k"),
      lit("x").as("s"))
    gen(50).write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    val firstGen = partFiles(dir)
    gen(7).repartition(1).write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    assert(manifest(dir).map(_._2).sum === 7L)
    assert(spark.read.text(s"$dir/part-*.tsv").count() === 7L)
    // generation names never collide, and the old generation is swept
    assert(partFiles(dir).intersect(firstGen).isEmpty,
      "overwrite must publish under fresh generation names")
  }

  test("duplicate attempts for one partition: driver publishes exactly one") {
    val dir = freshDir("dup")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    // two attempts of partition 0 (speculation): different row contents
    val w1 = fac.createWriter(0, 11L)
    w1.write(row(1L, "attempt11")); val m1 = w1.commit()
    val w2 = fac.createWriter(0, 22L)
    w2.write(row(2L, "attempt22")); w2.write(row(3L, "attempt22b"))
    val m2 = w2.commit()
    val w3 = fac.createWriter(1, 33L)
    w3.write(row(4L, "p1")); val m3 = w3.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m2, m1, m3))
    val parts = partFiles(dir)
    assert(parts === Seq("part-00000-g0000.tsv", "part-00001-g0000.tsv"))
    // first attempt (lowest taskId) wins for partition 0
    val p0 = new String(
      Files.readAllBytes(Paths.get(dir, "part-00000-g0000.tsv")), "UTF-8")
    assert(p0 === "1\tattempt11\n", s"wrong attempt published: $p0")
    assert(manifest(dir) === Seq(("part-00000-g0000.tsv", 1L),
      ("part-00001-g0000.tsv", 1L)))
    assert(!new java.io.File(dir, "_temp").exists(), "losing attempt not swept")
  }

  test("task abort and driver abort leave nothing visible") {
    val dir = freshDir("abort")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w1 = fac.createWriter(0, 1L)
    w1.write(row(1L, "doomed"))
    w1.abort()
    assert(partFiles(dir).isEmpty)
    // a committed TASK that the JOB then aborts must also vanish
    val w2 = fac.createWriter(0, 2L)
    w2.write(row(2L, "also doomed"))
    val m2 = w2.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .abort(Array[WriterCommitMessage](m2))
    assert(partFiles(dir).isEmpty)
    assert(!new java.io.File(dir, "_temp").exists())
    assert(m2.isInstanceOf[GraftTempFile])
  }

  test("null fields serialize as the explicit \\N token, never a silent zero") {
    val dir = freshDir("nulls")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(7L, "ok"))
    w.write(new GenericInternalRow(Array[Any](null, null)))
    w.write(new GenericInternalRow(Array[Any](9L, null)))
    val m = w.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m))
    val body = new String(
      Files.readAllBytes(Paths.get(dir, "part-00000-g0000.tsv")), "UTF-8")
    assert(body === "7\tok\n\\N\t\\N\n9\t\\N\n", s"null encoding wrong: $body")
    assert(manifest(dir).map(_._2).sum === 3L)
  }

  test("manifest reader: lossless sink round-trip including NULLs; prunes columns") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("roundtrip")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(7L, "ok"))
    w.write(new GenericInternalRow(Array[Any](null, null)))
    w.write(new GenericInternalRow(Array[Any](9L, null)))
    val m = w.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m))
    val back = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", dir).load()
    val rows = back.orderBy(asc_nulls_first("k")).collect()
    assert(rows.length === 3)
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1), "null row round-trip")
    assert(rows(1).getLong(0) === 7L && rows(1).getString(1) === "ok")
    assert(rows(2).getLong(0) === 9L && rows(2).isNullAt(1))
    // column pruning reaches the scan: the BatchScan's output column
    // list shrinks to the projection (DSv2 prints it inline)
    val plan = back.select("s").queryExecution.executedPlan.toString
    assert("""BatchScan[^\n]*\[s#\d+\]""".r.findFirstIn(plan).isDefined,
      s"projection not pushed into the scan:\n$plan")
  }

  test("manifest reader fails closed on a torn part") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("torn")
    spark.range(20).select(col("id").as("k"), lit("x").as("s"))
      .repartition(2)
      .write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    // truncate one committed part behind the manifest's back (and drop
    // the local FS's .crc sidecar, or the checksum layer masks the tear
    // with its own error before the reader's row-count check runs)
    val victim = new java.io.File(dir, manifest(dir).head._1)
    val lines = Files.readAllLines(victim.toPath)
    Files.write(victim.toPath,
      java.util.Arrays.asList(lines.get(0)))
    new java.io.File(dir, s".${victim.getName}.crc").delete()
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir).load().count()
    }
    assert(ex.getMessage.contains("torn part") ||
      Option(ex.getCause).exists(_.getMessage.contains("torn part")),
      s"wrong failure: $ex")
    // and a missing listed file fails at PLANNING, before any task runs
    assert(victim.delete())
    val ex2 = intercept[Exception] {
      spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir).load().count()
    }
    assert(ex2.toString.contains("torn commit") ||
      Option(ex2.getCause).exists(_.toString.contains("torn commit")),
      s"wrong failure: $ex2")
  }

  test("string fields escape delimiters: tab/newline/backslash/literal-\\N round-trip") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("escape")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    // every hostile value the advice named: embedded tab (column shift),
    // embedded newline (row split = torn-part false positive), literal
    // \N (silent NULL), lone backslashes, CR
    val hostile = Seq("a\tb", "line1\nline2", "\\N", "back\\slash", "cr\rhere", "plain")
    hostile.zipWithIndex.foreach { case (s, i) => w.write(row(i.toLong, s)) }
    w.write(new GenericInternalRow(Array[Any](99L, null)))
    val m = w.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m))
    val back = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", dir).load()
      .orderBy(asc("k")).collect()
    assert(back.length === hostile.length + 1,
      "embedded newline split a row — escaping failed")
    hostile.zipWithIndex.foreach { case (s, i) =>
      assert(back(i).getString(1) === s, s"value $i corrupted: ${back(i).getString(1)}")
    }
    assert(back.last.isNullAt(1), "real NULL must still decode as NULL")
    // and on disk, the literal "\N" string is distinguishable from NULL
    val body = new String(Files.readAllBytes(
      Paths.get(dir, manifest(dir).head._1)), "UTF-8")
    assert(body.contains("2\t\\\\N\n"), s"literal \\N not escaped on disk:\n$body")
    assert(body.contains("99\t\\N\n"), s"NULL token changed on disk:\n$body")
  }

  test("append mode carries prior generations forward in the manifest") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("append")
    def gen(n: Int, tag: String) = spark.range(n).select(col("id").as("k"),
      lit(tag).as("s"))
    gen(50, "g0").write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    gen(7, "g1").repartition(1).write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("append").save()
    // manifest lists BOTH generations' parts; nothing leaked invisible
    assert(manifest(dir).map(_._2).sum === 57L,
      "append dropped previously committed rows from the manifest")
    val back = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", dir).load()
    assert(back.count() === 57L)
    assert(back.where(col("s") === "g0").count() === 50L)
    assert(manifest(dir).map(_._1).sorted === partFiles(dir),
      "append left unreferenced part files on disk")
  }

  test("retried overwrite sweeps a crashed commit's orphans before publishing") {
    val dir = freshDir("retry")
    // generation 0 commits normally
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac.createWriter(0, 1L)
    w0.write(row(1L, "gen0")); val m0 = w0.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m0))
    // simulate a generation-1 commit that crashed AFTER renaming a part
    // but BEFORE the manifest swap: an orphan part under the exact name
    // the retry will want, plus a stranded tmp manifest
    Files.write(Paths.get(dir, "part-00000-g0001.tsv"),
      "666\tghost\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g1.tmp"),
      "#gen\t1\npart-00000-g0001.tsv\t1\n".getBytes("UTF-8"))
    // the retry recomputes gen=1 from the old manifest; without the sweep
    // it would rename onto an existing destination (fatal on HDFS/S3A)
    val w1 = fac.createWriter(0, 2L)
    w1.write(row(2L, "gen1-retry")); val m1 = w1.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = true)
      .commit(Array[WriterCommitMessage](m1))
    val body = new String(Files.readAllBytes(
      Paths.get(dir, "part-00000-g0001.tsv")), "UTF-8")
    assert(body === "2\tgen1-retry\n", s"orphan not swept, ghost data survived: $body")
    assert(manifest(dir) === Seq(("part-00000-g0001.tsv", 1L)))
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g1.tmp").exists(),
      "stranded tmp manifest not swept")
    assert(partFiles(dir) === Seq("part-00000-g0001.tsv"),
      "old generation not truncated")
  }

  test("driver abort sweeps stranded tmp manifests") {
    val dir = freshDir("aborttmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g3.tmp"),
      "#gen\t3\n".getBytes("UTF-8"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .abort(Array.empty[WriterCommitMessage])
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g3.tmp").exists())
  }

  test("a failed overwrite publish leaves the previous generation readable") {
    val dir = freshDir("crash")
    // generation 0 publishes normally
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(1L, "gen0")); val m = w.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m))
    val man0 = manifest(dir)
    // generation 1's driver commit dies BEFORE the manifest swap (its
    // temp vanished — rename throws). The old generation must survive:
    // overwrite deletes old parts only AFTER the new manifest is durable.
    val bogus = GraftTempFile(s"$dir/_temp/attempt-00000-99.tsv", 0, 99L, 1L)
    intercept[java.io.IOException] {
      new GraftCommitWrite(dir, schema, truncateFirst = true)
        .commit(Array[WriterCommitMessage](bogus))
    }
    assert(manifest(dir) === man0, "old manifest clobbered by failed commit")
    assert(partFiles(dir) === man0.map(_._1),
      "old generation's parts lost by failed commit")
    val body = new String(
      Files.readAllBytes(Paths.get(dir, man0.head._1)), "UTF-8")
    assert(body === "1\tgen0\n", "old generation's data lost")
  }

  test("seam crash (manifest deleted, tmp stranded): next commit recovers, never sweeps") {
    val dir = freshDir("seam")
    // generation 1 commits fully
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac.createWriter(0, 1L)
    w0.write(row(1L, "committed")); val m0 = w0.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m0))
    // simulate the delete(man)/rename(manTmp) seam crash: the committed
    // manifest is gone, its fully-written content survives only as the
    // stranded tmp — gen-0's parts are on disk but every part now reads
    // as "gen > curGen" to a naive sweep
    val manBytes = Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT"))
    Files.delete(Paths.get(dir, "_GRAFT_COMMIT"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0.tmp"), manBytes)
    // the next APPEND commit must first promote the tmp manifest
    // (finishing gen 0), then append as gen 1 — not delete gen-0's data
    val w1 = fac.createWriter(0, 2L)
    w1.write(row(2L, "appended")); val m1 = w1.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m1))
    assert(manifest(dir) ===
      Seq(("part-00000-g0000.tsv", 1L), ("part-00000-g0001.tsv", 1L)),
      "recovered manifest must carry gen-0 forward plus the new gen-1 part")
    val gen0 = new String(
      Files.readAllBytes(Paths.get(dir, "part-00000-g0000.tsv")), "UTF-8")
    assert(gen0 === "1\tcommitted\n", "seam-crash recovery lost committed data")
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0.tmp").exists(),
      "promoted tmp manifest left behind")
  }

  test("two interleaved committers: the second is refused by the live lease") {
    val dir = freshDir("lease")
    Files.createDirectories(Paths.get(dir))
    // writer A is mid-commit: its lease is on disk and fresh
    Files.write(Paths.get(dir, "_GRAFT_LOCK"),
      s"writer-a\t${System.currentTimeMillis()}\n".getBytes("UTF-8"))
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(1L, "b")); val m = w.commit()
    val ex = intercept[java.io.IOException] {
      new GraftCommitWrite(dir, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](m))
    }
    assert(ex.getMessage.contains("another writer"),
      s"wrong failure mode: ${ex.getMessage}")
    assert(new java.io.File(dir, "_GRAFT_LOCK").exists(),
      "refused committer must not delete the holder's lease")
    assert(partFiles(dir).isEmpty && !new java.io.File(dir, "_GRAFT_COMMIT").exists(),
      "refused committer must publish nothing")
    // writer A finishes (lease released) → the retry commits normally
    // and releases its own lease afterwards
    Files.delete(Paths.get(dir, "_GRAFT_LOCK"))
    val w2 = fac.createWriter(0, 2L)
    w2.write(row(1L, "b")); val m2 = w2.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m2))
    assert(manifest(dir).map(_._2).sum === 1L)
    assert(!new java.io.File(dir, "_GRAFT_LOCK").exists(),
      "successful commit must release its lease")
  }

  test("a stale lease (crashed holder) is broken and the commit proceeds") {
    val dir = freshDir("stalelease")
    Files.createDirectories(Paths.get(dir))
    val lock = Paths.get(dir, "_GRAFT_LOCK")
    Files.write(lock, "crashed-writer\t0\n".getBytes("UTF-8"))
    // age the lease past the staleness bound (10 min)
    assert(lock.toFile.setLastModified(
      System.currentTimeMillis() - 11L * 60 * 1000))
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(1L, "x")); val m = w.commit()
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](m))
    assert(manifest(dir).map(_._2).sum === 1L, "commit blocked by a stale lease")
    assert(!new java.io.File(dir, "_GRAFT_LOCK").exists(),
      "broken-and-retaken lease must be released after the commit")
  }

  test("missing-manifest recovery refuses a non-conforming or too-old tmp manifest") {
    // a junk-named tmp (tmpGen = -1) must never be promoted: installing
    // it as the manifest would at best MatchError on read and at worst
    // install a wrong generation whose sweep deletes committed parts
    val dir = freshDir("junktmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "part-00000-g0001.tsv"),
      "1\tcommitted\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.damaged.tmp"),
      "not a manifest\n".getBytes("UTF-8"))
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(2L, "new")); val m = w.commit()
    val ex = intercept[java.io.IOException] {
      new GraftCommitWrite(dir, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](m))
    }
    assert(ex.getMessage.contains("manual recovery"),
      s"wrong failure mode: ${ex.getMessage}")
    assert(!new java.io.File(dir, "_GRAFT_COMMIT").exists(),
      "junk tmp promoted into place")
    assert(new String(Files.readAllBytes(
      Paths.get(dir, "part-00000-g0001.tsv")), "UTF-8") === "1\tcommitted\n",
      "refusal path must not touch the existing part files")
    // a conforming tmp whose generation is OLDER than an on-disk part
    // (impossible under the write order — manual damage) is refused
    // BEFORE promotion, so the next commit can't trust it and sweep
    val dir2 = freshDir("oldtmp")
    Files.createDirectories(Paths.get(dir2))
    Files.write(Paths.get(dir2, "part-00000-g0002.tsv"),
      "1\tnewer\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir2, "_GRAFT_COMMIT.g1.tmp"),
      "#gen\t1\npart-00000-g0001.tsv\t1\n".getBytes("UTF-8"))
    val w2 = fac.createWriter(0, 2L)
    w2.write(row(3L, "z")); val m2 = w2.commit()
    val ex2 = intercept[java.io.IOException] {
      new GraftCommitWrite(dir2, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](m2))
    }
    assert(ex2.getMessage.contains("older than"),
      s"wrong failure mode: ${ex2.getMessage}")
    assert(!new java.io.File(dir2, "_GRAFT_COMMIT").exists(),
      "too-old tmp promoted into place")
    assert(new java.io.File(dir2, "_GRAFT_COMMIT.g1.tmp").exists(),
      "refusal must leave the evidence in place for manual recovery")
    assert(new String(Files.readAllBytes(
      Paths.get(dir2, "part-00000-g0002.tsv")), "UTF-8") === "1\tnewer\n",
      "newer committed part swept")
  }

  test("parts but no manifest and no tmp: commit fails loudly, sweeps nothing") {
    val dir = freshDir("nomanifest")
    Files.createDirectories(Paths.get(dir))
    // a damaged directory: committed-looking data, no recovery artifact
    Files.write(Paths.get(dir, "part-00000-g0001.tsv"),
      "1\torphaned\n".getBytes("UTF-8"))
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(2L, "new")); val m = w.commit()
    val ex = intercept[java.io.IOException] {
      new GraftCommitWrite(dir, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](m))
    }
    assert(ex.getMessage.contains("manual recovery"),
      s"wrong failure mode: ${ex.getMessage}")
    val body = new String(
      Files.readAllBytes(Paths.get(dir, "part-00000-g0001.tsv")), "UTF-8")
    assert(body === "1\torphaned\n",
      "refusal path must not touch the existing part files")
  }

  test("time travel: as-of reads resolve immutable generation manifests; vacuumed/unknown generations fail loudly") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("ttravel")
    def gen(n: Int, tag: String) = spark.range(n).select(col("id").as("k"),
      lit(tag).as("s"))
    gen(50, "g0").write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    gen(7, "g1").repartition(1).write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("append").save()
    // every commit left its immutable history manifest
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists())
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists())
    def asOf(g: Option[Int]) = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      g.fold(r)(x => r.option("generation", x.toString)).load()
    }
    // as-of-0 sees exactly generation 0; as-of-1 and the current pointer
    // agree (append carried generation 0 forward)
    assert(asOf(Some(0)).count() === 50L)
    assert(asOf(Some(0)).where(col("s") === "g1").count() === 0L)
    assert(asOf(Some(1)).count() === 57L)
    assert(asOf(None).count() === 57L)
    // a generation never committed is a clear error, not an empty frame
    val exU = intercept[java.io.FileNotFoundException] {
      asOf(Some(9)).count()
    }
    assert(exU.getMessage.contains("generation"), exU.getMessage)
    // truncate is the vacuum barrier: generation 2 overwrites, old parts
    // are gone AND (since round 13, ADVICE r12) the barrier prunes the
    // now-unreadable generations' history manifests in the same cleanup
    // — an as-of read behind the barrier fails loudly AT MANIFEST
    // RESOLUTION (the clear vacuumed error), never silently thinner and
    // never a part-open failure deep in the scan
    gen(3, "g2").repartition(1).write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("overwrite").save()
    assert(asOf(Some(2)).count() === 3L)
    assert(asOf(None).count() === 3L)
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists(),
      "truncate must prune history manifests behind the vacuum barrier")
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists(),
      "truncate must prune history manifests behind the vacuum barrier")
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0002").exists(),
      "the truncate generation's own history manifest must survive")
    val exV = intercept[java.io.FileNotFoundException] {
      asOf(Some(0)).count()
    }
    assert(exV.getMessage.contains("vacuumed"), exV.getMessage)
  }

  test("abort sweeps an uncommitted generation's history manifest; a committed one survives") {
    // ADVICE r12 (medium): the immutable history manifest is written
    // BEFORE the commit point. A crashed/aborted commit that is never
    // retried must not leave option("generation", g) resolving
    // fully-formed metadata for data that was never published.
    val dir = freshDir("aborthist")
    // generation 0 commits normally — its history entry is committed truth
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac.createWriter(0, 1L)
    w0.write(row(1L, "gen0"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit()))
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists())
    // simulate a generation-1 commit that died AFTER writing its history
    // manifest but BEFORE the pointer swap: the stranded history file is
    // exactly what abort() must sweep
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0001"),
      "#gen\t1\npart-00000-g0001.tsv\t1\n".getBytes("UTF-8"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .abort(Array.empty)
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists(),
      "abort must sweep the uncommitted generation's history manifest")
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists(),
      "abort must never touch committed generations' history manifests")
    // as-of the aborted generation now fails clearly at resolution
    val ex = intercept[java.io.FileNotFoundException] {
      spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
        .option("generation", "1").load().count()
    }
    assert(ex.getMessage.contains("never committed"), ex.getMessage)
    // at the delete(man)/rename(manTmp) SEAM (parts on disk, no
    // manifest) abort must leave recovery material alone: the tmp
    // manifest is the next commit's promotion path and the gen-ahead
    // history file belongs to that promotable commit
    val man = Paths.get(dir, "_GRAFT_COMMIT")
    val manBytes = Files.readAllBytes(man)
    Files.delete(man)
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0001.tmp"),
      "#gen\t1\npart-00000-g0001.tsv\t1\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0001"),
      "#gen\t1\npart-00000-g0001.tsv\t1\n".getBytes("UTF-8"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .abort(Array.empty)
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0001.tmp").exists(),
      "abort at the seam must not sweep the promotable tmp manifest")
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists(),
      "abort at the seam must not sweep the promotable commit's history")
    Files.write(man, manBytes)
  }

  test("schema evolution: appended column NULL-fills older generations; incompatible appends refused") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val dir = freshDir("sevo")
    val schema3 = new StructType()
      .add("k", LongType).add("s", StringType).add("extra", LongType)
    // generation 0 at the 2-column schema
    val fac2 = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac2.createWriter(0, 1L)
    w0.write(row(1L, "old"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit()))
    // generation 1 APPENDS with a third column
    val fac3 = new GraftCommitWriterFactory(dir, schema3, serConf)
    val w1 = fac3.createWriter(0, 2L)
    w1.write(new GenericInternalRow(Array[Any](
      2L, UTF8String.fromString("new"), 42L)))
    new GraftCommitWrite(dir, schema3, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w1.commit()))
    // manifest records the WIDER signature + per-entry widths
    val man = new String(
      Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8")
    assert(man.contains("#cols\tk:bigint,s:string,extra:bigint"), man)
    assert(man.contains("part-00000-g0000.tsv\t1\t2"), man)
    assert(man.contains("part-00000-g0001.tsv\t1\t3"), man)
    // the evolved read: generation-0 rows surface NULL for the appended
    // column, generation-1 rows carry their value
    val back = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING, extra BIGINT").option("path", dir).load()
      .orderBy("k").collect()
    assert(back.length === 2)
    assert(back(0).getLong(0) === 1L && back(0).isNullAt(2),
      s"pre-evolution row must NULL-fill the appended column: ${back(0)}")
    assert(back(1).getLong(0) === 2L && back(1).getLong(2) === 42L)
    // as-of-0 stays readable under the EVOLVED schema too
    val asof0 = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING, extra BIGINT").option("path", dir)
      .option("generation", "0").load().collect()
    assert(asof0.length === 1 && asof0(0).isNullAt(2))
    // a NARROWER straggler writer may still append (its entries record
    // the narrower width; the table keeps the wider signature)
    val w2 = fac2.createWriter(0, 3L)
    w2.write(row(3L, "straggler"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w2.commit()))
    val man2 = new String(
      Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8")
    assert(man2.contains("#cols\tk:bigint,s:string,extra:bigint"), man2)
    assert(man2.contains("part-00000-g0002.tsv\t1\t2"), man2)
    // incompatible evolution — retyped/reordered columns — refuses
    // LOUDLY at commit, before any rename
    val schemaBad = new StructType()
      .add("k", LongType).add("s", LongType)
    val facB = new GraftCommitWriterFactory(dir, schemaBad, serConf)
    val wB = facB.createWriter(0, 4L)
    wB.write(new GenericInternalRow(Array[Any](9L, 9L)))
    val mB = wB.commit()
    val ex = intercept[java.io.IOException] {
      new GraftCommitWrite(dir, schemaBad, truncateFirst = false)
        .commit(Array[WriterCommitMessage](mB))
    }
    assert(ex.getMessage.contains("incompatible schema evolution"),
      ex.getMessage)
    // the refused commit published nothing: same reader view as before
    val after = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING, extra BIGINT").option("path", dir).load()
    assert(after.count() === 3L)
  }

  test("zone maps: per-part min/max recorded, reader skips provably-excluded files, never skips on absent stats") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("zmap")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    // two parts with disjoint key ranges; strings record no stats
    val w0 = fac.createWriter(0, 1L)
    w0.write(row(10L, "a")); w0.write(row(19L, "b"))
    val w1 = fac.createWriter(1, 2L)
    w1.write(row(100L, "c")); w1.write(row(199L, "d"))
    // a third part whose key column is all NULL — no stats either
    val w2 = fac.createWriter(2, 3L)
    w2.write(new GenericInternalRow(Array[Any](null, UTF8String.fromString("n"))))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit(), w1.commit(), w2.commit()))
    val man = new String(
      Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8")
    assert(man.contains("part-00000-g0000.tsv\t2\t2\t0:10|19"), man)
    assert(man.contains("part-00001-g0000.tsv\t2\t2\t0:100|199"), man)
    // the all-null column records NO bounds — only its null count
    // (round 14: `0:n1` says every k is NULL, which IsNotNull uses)
    assert(man.contains("part-00002-g0000.tsv\t1\t2\t0:n1"), man)
    def read() = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", dir).load()
    // a selective filter plans ONLY the file whose zone map can match.
    // The all-NULL-k part records no k bounds, but since round 14 its
    // null count (= rows) lets the pushed IsNotNull skip it outright —
    // so the bounds-less part no longer costs a task
    val hit = read().where(col("k") >= 100L && col("k") <= 150L)
    assert(hit.rdd.getNumPartitions === 1,
      "expected only the matching part planned (all-null part IsNotNull-skipped)")
    assert(hit.collect().map(_.getLong(0)).toSet === Set(100L))
    // a filter outside every recorded range plans NOTHING: bounds
    // exclude the two real parts, the null count excludes the third
    val miss = read().where(col("k") === 50L)
    assert(miss.rdd.getNumPartitions === 0)
    assert(miss.count() === 0L)
    // correctness never depends on the skip: unfiltered read sees all rows
    assert(read().count() === 5L)
    // full-range BIGINT bounds must not round through double: a value
    // 1024 below Long.MaxValue is outside [MaxValue-1, MaxValue] but
    // indistinguishable from it in double precision
    val big = freshDir("zmapbig")
    val facB = new GraftCommitWriterFactory(big, schema, serConf)
    val wB = facB.createWriter(0, 1L)
    wB.write(row(Long.MaxValue - 1, "x")); wB.write(row(Long.MaxValue, "y"))
    new GraftCommitWrite(big, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](wB.commit()))
    def readBig() = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", big).load()
    assert(readBig().where(col("k") === (Long.MaxValue - 1))
      .rdd.getNumPartitions === 1, "must not skip the true match")
    assert(readBig().where(col("k") === (Long.MaxValue - 1024))
      .rdd.getNumPartitions === 0,
      "a double-rounded compare would fail to skip here")
    // evolution interplay: a filter on a column APPENDED after a file
    // was written skips that file outright (all its values are NULL
    // there, and the pushed shapes are null-rejecting)
    import org.apache.spark.sql.types.LongType
    val schema3 = new StructType()
      .add("k", LongType).add("s", StringType).add("extra", LongType)
    val fac3 = new GraftCommitWriterFactory(dir, schema3, serConf)
    val w3 = fac3.createWriter(0, 9L)
    w3.write(new GenericInternalRow(Array[Any](
      500L, UTF8String.fromString("e"), 7L)))
    new GraftCommitWrite(dir, schema3, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w3.commit()))
    val evolved = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING, extra BIGINT").option("path", dir).load()
      .where(col("extra") === 7L)
    assert(evolved.rdd.getNumPartitions === 1,
      "pre-evolution files must be skipped for a filter on the appended column")
    assert(evolved.collect().map(_.getLong(0)).toSeq === Seq(500L))
  }

  test("vacuum: keep-K retention expires old generations' manifests, sweeps orphans, retained stay readable; idempotent") {
    val dir = freshDir("vacuum")
    def commitGen(tag: String, t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(dir, schema, serConf)
      val w = fac.createWriter(0, t0)
      w.write(row(t0, tag))
      new GraftCommitWrite(dir, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](w.commit()))
    }
    commitGen("g0", 100L); commitGen("g1", 200L); commitGen("g2", 300L)
    // crashed-commit debris: an unreferenced part + its gen-ahead
    // history manifest
    Files.write(Paths.get(dir, "part-99999-g0009.tsv"), "9\tx\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0009"),
      "#gen\t9\npart-99999-g0009.tsv\t1\t2\n".getBytes("UTF-8"))
    val (nMan, nParts) = graft.sources.GraftCommitVacuum.vacuum(spark, dir, 2)
    assert(nMan === 2, s"expected g0 + orphan g9 manifests expired, got $nMan")
    assert(nParts === 1, s"expected the orphan part swept, got $nParts")
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists())
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0009").exists())
    assert(!new java.io.File(dir, "part-99999-g0009.tsv").exists())
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists())
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0002").exists())
    assert(!new java.io.File(dir, "_GRAFT_LOCK").exists(), "lease not released")
    // every committed row still readable (append topology: vacuum never
    // touches referenced parts); retained as-of views intact
    def count(gen: Option[Int]): Long = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      gen.fold(r)(g => r.option("generation", g.toString)).load().count()
    }
    assert(count(None) === 3L)
    assert(count(Some(2)) === 3L)
    assert(count(Some(1)) === 2L)
    val ex = intercept[java.io.FileNotFoundException] { count(Some(0)) }
    assert(ex.getMessage.contains("vacuumed"), ex.getMessage)
    // idempotent: a second sweep finds nothing
    assert(graft.sources.GraftCommitVacuum.vacuum(spark, dir, 2) === ((0, 0)))
    // a directory with no committed manifest (the recovery seam) refuses
    val empty = freshDir("vacempty")
    new java.io.File(empty).mkdirs()
    intercept[java.io.FileNotFoundException] {
      graft.sources.GraftCommitVacuum.vacuum(spark, empty, 2)
    }
    ()
  }

  test("compaction: rewrites current entries as a new generation; history stays readable; vacuum retires replaced parts") {
    val dir = freshDir("compact")
    def commitGen(tags: Seq[String], t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(dir, schema, serConf)
      val ms = tags.zipWithIndex.map { case (tag, p) =>
        val w = fac.createWriter(p, t0 + p)
        w.write(row(t0 + p, tag))
        w.commit(): WriterCommitMessage
      }
      new GraftCommitWrite(dir, schema, truncateFirst = false)
        .commit(ms.toArray)
    }
    commitGen(Seq("a", "b"), 100L)    // gen 0: 2 parts
    commitGen(Seq("c"), 200L)         // gen 1: +1 part → 3 entries
    val (before, after) = graft.sources.GraftCommitCompact.compact(
      spark, dir, "k BIGINT, s STRING", 1)
    assert((before, after) === ((3, 1)))
    // the compacted generation is current; entries replaced, rows intact
    val man = new String(
      Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8")
    assert(man.startsWith("#gen\t2"), man)
    assert(manifest(dir).size === 1)
    assert(manifest(dir).head._2 === 3L, "compacted part must carry all rows")
    assert(man.contains("#cols\tk:bigint,s:string"), man)
    assert(!new java.io.File(dir, "_compact").exists, "staging not cleaned")
    def read(gen: Option[Int]) = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      gen.fold(r)(g => r.option("generation", g.toString)).load()
    }
    assert(read(None).collect().map(_.getString(1)).toSet === Set("a", "b", "c"))
    // pre-compaction generations still read from the REPLACED parts
    assert(read(Some(1)).count() === 3L)
    assert(read(Some(0)).count() === 2L)
    // already-compact tables no-op; a wrong read schema refuses
    assert(graft.sources.GraftCommitCompact.compact(
      spark, dir, "k BIGINT, s STRING", 8) === ((1, 1)))
    val ex = intercept[java.io.IOException] {
      graft.sources.GraftCommitCompact.compact(
        spark, freshDirCommitted(), "k BIGINT", 1)
    }
    assert(ex.getMessage.contains("does not match"), ex.getMessage)
    // retention retires the replaced parts once their generations expire
    val (nMan, nParts) = graft.sources.GraftCommitVacuum.vacuum(spark, dir, 1)
    assert(nMan === 2, s"g0+g1 manifests should expire, got $nMan")
    assert(nParts === 3, s"the 3 replaced parts should sweep, got $nParts")
    assert(read(None).collect().map(_.getString(1)).toSet === Set("a", "b", "c"),
      "the compacted current view must survive the sweep")
    intercept[java.io.FileNotFoundException] { read(Some(1)).count() }
    ()
  }

  /** A throwaway 2-part committed dir for the schema-mismatch refusal. */
  private def freshDirCommitted(): String = {
    val dir = freshDir("compactbad")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac.createWriter(0, 1L); w0.write(row(1L, "x"))
    val w1 = fac.createWriter(1, 2L); w1.write(row(2L, "y"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit(), w1.commit()))
    dir
  }

  test("compaction crash-point fuzz: every kill leaves the reader view whole (old rows ≡ new rows); every state recovers") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.crashfs.impl", classOf[CrashFs].getName)
    val local = freshDir("cfuzz")
    val cdir = s"crashfs://$local"
    def commitGen(tags: Seq[String], t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(cdir, schema, serConf)
      val ms = tags.zipWithIndex.map { case (tag, p) =>
        val w = fac.createWriter(p, t0 + p)
        w.write(row(t0 + p, tag))
        w.commit(): WriterCommitMessage
      }
      new GraftCommitWrite(cdir, schema, truncateFirst = false)
        .commit(ms.toArray)
    }
    val allRows = Set("100\ta", "101\tb", "200\tc")
    // reader-visible rows through the manifest, with structural checks —
    // compaction PRESERVES contents, so at every kill point the visible
    // row set must be exactly allRows (old layout or compacted layout),
    // or the one documented no-manifest seam with a promotable tmp
    def visible(): Option[Set[String]] = {
      val man = new java.io.File(local, "_GRAFT_COMMIT")
      if (!man.exists()) None
      else Some(new String(Files.readAllBytes(man.toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty).filterNot(_.startsWith("#")).toSeq
        .flatMap { l =>
          val f = l.split("\t")
          val pf = Paths.get(local, f(0))
          assert(Files.exists(pf), s"manifest lists missing part ${f(0)}")
          val lines = new String(Files.readAllBytes(pf), "UTF-8")
            .split("\n").filter(_.nonEmpty).toSeq
          assert(lines.size.toLong === f(1).toLong, s"count drift for ${f(0)}")
          lines
        }.toSet)
    }
    var k = 0
    var crashed = true
    while (crashed && k < 48) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(local))
      CrashFs.disarm()
      commitGen(Seq("a", "b"), 100L)
      commitGen(Seq("c"), 200L)
      CrashFs.arm(k)
      crashed =
        try {
          graft.sources.GraftCommitCompact.compact(
            spark, cdir, "k BIGINT, s STRING", 1)
          false
        } catch { case _: java.io.IOException => true }
      CrashFs.disarm()
      visible() match {
        case Some(rows) => assert(rows === allRows,
          s"kill point $k: reader view lost or mixed rows: $rows")
        case None =>
          // the manifest-swap seam: a promotable tmp must be on disk
          val tmps = Option(new java.io.File(local).listFiles())
            .getOrElse(Array.empty)
            .map(_.getName).filter(_.matches("_GRAFT_COMMIT\\.g\\d+\\.tmp"))
          assert(tmps.nonEmpty, s"kill point $k: no manifest AND no tmp")
      }
      if (crashed) {
        val lock = new java.io.File(local, "_GRAFT_LOCK")
        if (lock.exists()) assert(lock.delete())
        if (!new java.io.File(local, "_GRAFT_COMMIT").exists()) {
          // seam recovery is the next COMMIT's job (it promotes the tmp)
          commitGen(Seq("d"), 300L)
          assert(visible().exists(_.contains("300\td")),
            s"kill point $k: recovery commit did not land")
          assert(visible().exists(r => allRows.subsetOf(r)),
            s"kill point $k: promoted compaction lost rows")
        } else {
          // otherwise a re-run completes (or no-ops on a published one)
          graft.sources.GraftCommitCompact.compact(
            spark, cdir, "k BIGINT, s STRING", 1)
          assert(visible().contains(allRows), s"kill point $k: re-run failed")
        }
      }
      k += 1
    }
    assert(!crashed, "compaction fuzz never reached a crash-free run in 48 points")
    assert(k > 3, s"suspiciously few compaction fault points covered: $k")
    assert(visible().contains(allRows))
    assert(manifest(local).size === 1, "crash-free compaction must land 1 entry")
  }

  test("vacuum crash-point fuzz: a kill before EVERY sweep mutation leaves retained generations readable; a re-run completes") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.crashfs.impl", classOf[CrashFs].getName)
    val local = freshDir("vacfuzz")
    val cdir = s"crashfs://$local"
    def commitGen(tag: String, t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(cdir, schema, serConf)
      val w = fac.createWriter(0, t0)
      w.write(row(t0, tag))
      new GraftCommitWrite(cdir, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](w.commit()))
    }
    def readable(gen: Option[Int]): Boolean = {
      val man = gen match {
        case Some(g) => new java.io.File(local, f"_GRAFT_COMMIT.g$g%04d")
        case None => new java.io.File(local, "_GRAFT_COMMIT")
      }
      if (!man.exists()) false
      else {
        // every listed part present with its committed row count
        new String(Files.readAllBytes(man.toPath), "UTF-8")
          .split("\n").filter(_.nonEmpty).filterNot(_.startsWith("#"))
          .forall { l =>
            val f = l.split("\t")
            val pf = Paths.get(local, f(0))
            Files.exists(pf) && new String(Files.readAllBytes(pf), "UTF-8")
              .split("\n").count(_.nonEmpty).toLong === f(1).toLong
          }
      }
    }
    var k = 0
    var crashed = true
    while (crashed && k < 32) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(local))
      CrashFs.disarm()
      commitGen("g0", 100L); commitGen("g1", 200L); commitGen("g2", 300L)
      Files.write(Paths.get(local, "part-99999-g0009.tsv"),
        "9\tx\n".getBytes("UTF-8"))
      Files.write(Paths.get(local, "_GRAFT_COMMIT.g0009"),
        "#gen\t9\npart-99999-g0009.tsv\t1\t2\n".getBytes("UTF-8"))
      CrashFs.arm(k)
      crashed =
        try { graft.sources.GraftCommitVacuum.vacuum(spark, cdir, 2); false }
        catch { case _: java.io.IOException => true }
      CrashFs.disarm()
      // THE retention invariant, at every kill point: the current view
      // and both retained generations remain fully readable — vacuum
      // may die anywhere and no reader of a kept generation notices
      assert(readable(None), s"kill point $k: current view torn")
      assert(readable(Some(2)), s"kill point $k: retained g2 torn")
      assert(readable(Some(1)), s"kill point $k: retained g1 torn")
      if (crashed) {
        // the crashed sweep may hold the lease — break it as a stale
        // holder would, then the re-run must complete the sweep
        val lock = new java.io.File(local, "_GRAFT_LOCK")
        if (lock.exists()) assert(lock.delete())
        graft.sources.GraftCommitVacuum.vacuum(spark, cdir, 2)
        ()
      }
      assert(!new java.io.File(local, "_GRAFT_COMMIT.g0000").exists(),
        s"kill point $k: sweep incomplete after re-run (g0 manifest)")
      assert(!new java.io.File(local, "part-99999-g0009.tsv").exists(),
        s"kill point $k: sweep incomplete after re-run (orphan part)")
      assert(!new java.io.File(local, "_GRAFT_COMMIT.g0009").exists(),
        s"kill point $k: sweep incomplete after re-run (orphan manifest)")
      k += 1
    }
    assert(!crashed, "vacuum fuzz never reached a crash-free sweep in 32 points")
    assert(k > 2, s"suspiciously few vacuum fault points covered: $k")
  }

  test("crash-point fuzz: a kill before EVERY commit mutation leaves old-or-new, never mixed; every state recovers") {
    // Systematic sweep of the whole commit sequence (round-12 verdict
    // ask): a fault-injecting FileSystem kills the driver commit before
    // its (k+1)-th filesystem MUTATION (lease create, part renames,
    // manifest tmp create, manifest delete, manifest rename, old-part
    // deletes, lease release), for k = 0, 1, 2, … until a crash-free
    // commit is reached. After every injected kill the reader-visible
    // contract is asserted — the manifest view is EXACTLY the old
    // generation or EXACTLY the new one (all listed parts present, row
    // counts matching, contents equal to one input set, never a blend),
    // or, at the one documented non-atomic seam (manifest deleted, tmp
    // not yet renamed), NO manifest plus a promotable name-conforming
    // tmp — and then a recovery commit (after breaking the crashed
    // holder's lease, as a stale-break would) must succeed and land
    // exactly its own generation.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.crashfs.impl", classOf[CrashFs].getName)
    val local = freshDir("fuzz")
    val cdir = s"crashfs://$local"
    def writeTemps(tag: String, t0: Long): Array[WriterCommitMessage] = {
      val fac = new GraftCommitWriterFactory(cdir, schema, serConf)
      Array(0, 1).map { p =>
        val w = fac.createWriter(p, t0 + p)
        w.write(row(t0 + p, s"$tag-$p"))
        w.commit(): WriterCommitMessage
      }
    }
    def commitAll(ms: Array[WriterCommitMessage], truncate: Boolean): Unit =
      new GraftCommitWrite(cdir, schema, truncateFirst = truncate).commit(ms)
    def expect(tag: String, t0: Long): Set[String] =
      Set(s"${t0}\t$tag-0", s"${t0 + 1}\t$tag-1")
    // reader-visible rows through the manifest, with structural checks
    def visible(): Option[Set[String]] = {
      val man = new java.io.File(local, "_GRAFT_COMMIT")
      if (!man.exists()) None
      else Some(manifest(local).flatMap { case (f, n) =>
        val pf = Paths.get(local, f)
        assert(Files.exists(pf), s"manifest lists missing part $f")
        val lines = new String(Files.readAllBytes(pf), "UTF-8")
          .split("\n").filter(_.nonEmpty).toSeq
        assert(lines.size.toLong === n, s"manifest count drift for $f")
        lines
      }.toSet)
    }
    var k = 0
    var crashed = true
    var coveredSeam = false
    while (crashed && k < 64) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(local))
      CrashFs.disarm()
      val g0 = writeTemps("gen0", 100L)
      commitAll(g0, truncate = false)
      val oldRows = expect("gen0", 100L)
      assert(visible().contains(oldRows))
      val g1 = writeTemps("gen1", 200L)
      val newRows = expect("gen1", 200L)
      CrashFs.arm(k)
      crashed =
        try { commitAll(g1, truncate = true); false }
        catch { case _: java.io.IOException => true }
      CrashFs.disarm()
      if (crashed) {
        visible() match {
          case Some(rows) =>
            assert(rows === oldRows || rows === newRows,
              s"kill point $k: mixed reader view $rows")
          case None =>
            // the documented delete(man)/rename(manTmp) seam: reader
            // fails loudly (no manifest), never reads blended data, and
            // the promotable tmp must be on disk for the next commit
            coveredSeam = true
            val tmps = Option(new java.io.File(local).listFiles())
              .getOrElse(Array.empty)
              .map(_.getName).filter(_.matches("_GRAFT_COMMIT\\.g\\d+\\.tmp"))
            assert(tmps.nonEmpty,
              s"kill point $k: no manifest AND no promotable tmp")
        }
        // recovery: the crashed holder's lease may survive — a live
        // lease must refuse the next writer; break it like the stale
        // path would, then a fresh commit must land cleanly
        val lock = new java.io.File(local, "_GRAFT_LOCK")
        if (lock.exists()) {
          val g2a = writeTemps("gen2", 300L)
          val ex = intercept[java.io.IOException] {
            commitAll(g2a, truncate = true)
          }
          assert(ex.getMessage.contains("another writer"),
            s"kill point $k: live lease not refused: ${ex.getMessage}")
          assert(lock.delete())
        }
        val g2 = writeTemps("gen2", 300L)
        commitAll(g2, truncate = true)
        assert(visible().contains(expect("gen2", 300L)),
          s"kill point $k: recovery commit did not land its generation")
      }
      k += 1
    }
    assert(!crashed, "fuzz never reached a crash-free commit in 64 points")
    assert(coveredSeam, "sweep never exercised the manifest-swap seam")
    assert(k > 5, s"suspiciously few fault points covered: $k")
    // the crash-free run landed the new generation exactly
    assert(visible().contains(expect("gen1", 200L)))
  }

  test("merge/delete: copy-on-write rewrites only affected parts, untouched parts byte-identical, time travel composes") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("merge")
    // four banded parts via the writer factory: [0,9], [10,19], [20,29], [30,39]
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val ms = (0 until 4).map { p =>
      val w = fac.createWriter(p, p.toLong)
      (0 until 10).foreach(i => w.write(row(p * 10L + i, s"v${p * 10 + i}")))
      w.commit(): WriterCommitMessage
    }
    new GraftCommitWrite(dir, schema, truncateFirst = false).commit(ms.toArray)
    def digest(f: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(Files.readAllBytes(Paths.get(dir, f))).map("%02x".format(_)).mkString
    }
    val before = partFiles(dir).map(f => f -> digest(f)).toMap
    // delete keys 12 and 17 — both inside band 1 only
    val delKeys = spark.range(2).select(
      (col("id") * 5 + 12).as("k")) // 12, 17
    val rep = graft.sources.GraftCommitMerge.delete(
      spark, dir, "k BIGINT, s STRING", "k", delKeys)
    assert(rep.rewritten === 1 && rep.carried === 3, rep.toString)
    assert(rep.removed === 2L && rep.added === 0L, rep.toString)
    def read(gen: Option[Int]) = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      gen.fold(r)(g => r.option("generation", g.toString)).load()
    }
    assert(read(None).count() === 38L)
    assert(read(None).where(col("k").isin(12L, 17L)).count() === 0L)
    // untouched parts carried VERBATIM — same files, byte-identical
    val after = partFiles(dir).map(f => f -> digest(f)).toMap
    (0 until 4).filter(_ != 1).foreach { p =>
      val f = f"part-$p%05d-g0000.tsv"
      assert(after.get(f) === before.get(f), s"untouched part $f changed")
    }
    // the REPLACED band-1 part stays on disk (gen 0 references it): the
    // as-of pre-delete view still reads all 40 rows THROUGH the delete
    assert(after.contains("part-00001-g0000.tsv"),
      "replaced part must survive for history readers")
    assert(read(Some(0)).count() === 40L)
    assert(read(Some(0)).where(col("k") === 12L).count() === 1L)
    // vacuum retires the replaced part once gen 0 expires
    val (_, swept) = graft.sources.GraftCommitVacuum.vacuum(spark, dir, 1)
    assert(swept === 1, s"expected the one replaced part swept, got $swept")
    assert(!new java.io.File(dir, "part-00001-g0000.tsv").exists())
    assert(read(None).count() === 38L)

    // MERGE: replace key 5 (band 0), insert keys 100, 101 (beyond every
    // bound) — exactly one part rewritten, NULL-keyed change is an insert
    val changes = spark.range(4).select(
      when(col("id") === 0, 5L).when(col("id") === 1, 100L)
        .when(col("id") === 2, 101L).otherwise(lit(null)).as("k"),
      concat(lit("new"), col("id")).as("s"))
    val rep2 = graft.sources.GraftCommitMerge.merge(
      spark, dir, "k BIGINT, s STRING", "k", changes)
    assert(rep2.rewritten === 1, rep2.toString)
    assert(rep2.removed === 1L && rep2.added === 4L, rep2.toString)
    val cur = read(None)
    assert(cur.count() === 41L) // 38 - 1 replaced + 4 changes
    assert(cur.where(col("k") === 5L).select("s").collect()
      .map(_.getString(0)).toSeq === Seq("new0"))
    assert(cur.where(col("k").isNull).count() === 1L,
      "NULL-keyed change row must insert")
    // a delete hitting NO part is a true no-op: no new generation
    val genBefore = new String(Files.readAllBytes(
      Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8").linesIterator.next()
    val rep3 = graft.sources.GraftCommitMerge.delete(
      spark, dir, "k BIGINT, s STRING", "k",
      spark.range(1).select(lit(99999L).as("k")))
    assert(rep3.rewritten === 0 && rep3.removed === 0L, rep3.toString)
    val genAfter = new String(Files.readAllBytes(
      Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8").linesIterator.next()
    assert(genAfter === genBefore, "no-op delete must not publish a generation")
    // deleting a NULL key matches nothing (SQL equality)
    val rep4 = graft.sources.GraftCommitMerge.delete(
      spark, dir, "k BIGINT, s STRING", "k",
      spark.range(1).select(lit(null).cast("bigint").as("k")))
    assert(rep4.removed === 0L)
    assert(read(None).where(col("k").isNull).count() === 1L,
      "NULL-keyed rows must never be deleted")
    // wrong schema refused loudly
    val ex = intercept[java.io.IOException] {
      graft.sources.GraftCommitMerge.delete(
        spark, dir, "k BIGINT", "k", spark.range(1).select(lit(5L).as("k")))
    }
    assert(ex.getMessage.contains("signature"), ex.getMessage)
    // CDC APPLY: delete + update + insert in ONE atomic generation
    val genPre = new String(Files.readAllBytes(
      Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8").linesIterator.next()
      .split("\t")(1).toLong
    val preCount = read(None).count()
    val upserts = spark.range(2).select(
      when(col("id") === 0, 20L).otherwise(500L).as("k"),
      concat(lit("cdc"), col("id")).as("s")) // update k=20, insert k=500
    val cdcRep = graft.sources.GraftCommitMerge.applyCdc(
      spark, dir, "k BIGINT, s STRING", "k", upserts,
      spark.range(1).select(lit(21L).as("k"))) // delete k=21
    assert(cdcRep.removed === 2L && cdcRep.added === 2L, cdcRep.toString)
    val genPost = new String(Files.readAllBytes(
      Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8").linesIterator.next()
      .split("\t")(1).toLong
    assert(genPost === genPre + 1L,
      "CDC apply must land as exactly ONE generation")
    assert(read(None).count() === preCount - 2L + 2L)
    assert(read(None).where(col("k") === 21L).count() === 0L)
    assert(read(None).where(col("k") === 20L).select("s").first()
      .getString(0) === "cdc0")
    assert(read(None).where(col("k") === 500L).count() === 1L)
  }

  test("merge-on-read deletes: zero data rewritten, tombstones accumulate and apply, compaction materializes, COW composes") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("mor")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val ms = (0 until 2).map { p =>
      val w = fac.createWriter(p, p.toLong)
      (0 until 10).foreach(i => w.write(row(p * 100L + i, s"v${p * 100 + i}")))
      w.commit(): WriterCommitMessage
    }
    new GraftCommitWrite(dir, schema, truncateFirst = false).commit(ms.toArray)
    def digest(f: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(Files.readAllBytes(Paths.get(dir, f))).map("%02x".format(_)).mkString
    }
    val before = partFiles(dir).map(f => f -> digest(f)).toMap
    val (nf, nk) = graft.sources.GraftCommitMerge.deleteMor(
      spark, dir, "k BIGINT, s STRING", "k",
      spark.range(2).select((col("id") + 3).as("k"))) // keys 3, 4
    assert((nf, nk) === ((1, 2L)))
    // ZERO data bytes moved — every data part byte-identical
    partFiles(dir).foreach(f => assert(digest(f) === before(f), s"$f changed"))
    assert(new java.io.File(dir, "del-00000-g0001.tsv").exists())
    def read(gen: Option[Int]) = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      gen.fold(r)(g => r.option("generation", g.toString)).load()
    }
    assert(read(None).count() === 18L)
    assert(read(None).where(col("k") === 3L).count() === 0L)
    // time travel: the pre-delete generation still reads the rows
    assert(read(Some(0)).count() === 20L)
    // a SECOND MOR delete accumulates (key 100 in the other part)
    val (_, nk2) = graft.sources.GraftCommitMerge.deleteMor(
      spark, dir, "k BIGINT, s STRING", "k",
      spark.range(1).select(lit(100L).as("k")))
    assert(nk2 === 1L)
    assert(read(None).count() === 17L)
    // PRUNED read correctness: the key column is not selected, the
    // tombstone filter still applies (keys parse from the raw cells)
    assert(read(None).select("s").count() === 17L)
    assert(!read(None).select("s").collect().map(_.getString(0))
      .contains("v100"))
    // COW merge on a MOR table: tombstones carry forward and the
    // rewritten part re-reads THROUGH them (no undelete)
    val rep = graft.sources.GraftCommitMerge.merge(
      spark, dir, "k BIGINT, s STRING", "k",
      spark.range(1).select(lit(5L).as("k"), lit("upd").as("s")))
    assert(rep.rewritten === 1, rep.toString)
    assert(read(None).count() === 17L)
    assert(read(None).where(col("k").isin(3L, 4L, 100L)).count() === 0L,
      "COW rewrite must not undelete tombstoned keys")
    assert(read(None).where(col("k") === 5L).select("s").first()
      .getString(0) === "upd")
    val metaKinds = graft.sources.GraftManifestMeta.files(spark, dir)
      .where(col("kind") === "delete").select("file").distinct().count()
    assert(metaKinds === 2L, "both tombstone files must carry forward")
    // MATERIALIZE via full compact: same rows, no delete entries left
    val (_, after) = graft.sources.GraftCommitCompact.compact(
      spark, dir, "k BIGINT, s STRING", 1)
    assert(after === 1)
    assert(read(None).count() === 17L)
    assert(graft.sources.GraftManifestMeta.files(spark, dir)
      .where(col("kind") === "delete").count() === 0L,
      "materialization must retire tombstone entries")
    // vacuum retires the del FILES once their generations expire
    graft.sources.GraftCommitVacuum.vacuum(spark, dir, 1)
    assert(Option(new java.io.File(dir).listFiles()).get
      .count(_.getName.startsWith("del-")) === 0,
      "vacuum must sweep unreferenced tombstone files")
    assert(read(None).count() === 17L)
  }

  test("delete keyed on an APPENDED column: pre-evolution parts are provably clean and never rewritten") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val dir = freshDir("mergeevo")
    // generation 0: the 2-column schema (no `v` yet)
    val fac2 = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac2.createWriter(0, 1L)
    w0.write(row(1L, "old1")); w0.write(row(2L, "old2"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit()))
    // generation 1: evolved schema appends `v`
    val schema3 = new StructType()
      .add("k", LongType).add("s", StringType).add("v", LongType)
    val fac3 = new GraftCommitWriterFactory(dir, schema3, serConf)
    val w1 = fac3.createWriter(0, 2L)
    w1.write(new GenericInternalRow(Array[Any](10L, UTF8String.fromString("n1"), 7L)))
    w1.write(new GenericInternalRow(Array[Any](11L, UTF8String.fromString("n2"), 8L)))
    new GraftCommitWrite(dir, schema3, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w1.commit()))
    def digest(f: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(Files.readAllBytes(Paths.get(dir, f))).map("%02x".format(_)).mkString
    }
    val g0digest = digest("part-00000-g0000.tsv")
    // delete keyed on the APPENDED column: the gen-0 part predates `v`
    // (every value NULL there — equality can never match), so it is
    // PROVABLY clean and must carry verbatim, not conservatively rewrite
    val rep = graft.sources.GraftCommitMerge.delete(
      spark, dir, "k BIGINT, s STRING, v BIGINT", "v",
      spark.range(1).select(lit(7L).as("v")))
    assert(rep.rewritten === 1 && rep.carried === 1 && rep.removed === 1L,
      rep.toString)
    assert(digest("part-00000-g0000.tsv") === g0digest,
      "pre-evolution part must never be rewritten for an appended-column key")
    val cur = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING, v BIGINT").option("path", dir).load()
    assert(cur.count() === 3L)
    assert(cur.where(col("v") === 7L).count() === 0L)
    assert(cur.where(col("v").isNull).count() === 2L,
      "pre-evolution rows (NULL v) must survive")
  }

  test("manifest metadata table: per-part rows/widths/bounds/nulls queryable; stats-less entries surface; as-of works") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("metatab")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w0 = fac.createWriter(0, 1L)
    w0.write(row(10L, "alpha")); w0.write(row(19L, "beta"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit()))
    // a LEGACY stats-less entry (hand-appended 2-field line) must still
    // surface in the metadata table with col_idx = -1
    val man = Paths.get(dir, "_GRAFT_COMMIT")
    Files.write(Paths.get(dir, "part-90000-g0000.tsv"),
      "7\tlegacy\n".getBytes("UTF-8"))
    val manTxt = new String(Files.readAllBytes(man), "UTF-8")
    Files.write(man, (manTxt + "part-90000-g0000.tsv\t1\n").getBytes("UTF-8"))
    // the hand-append bypassed the checksummed local FS — drop the now
    // stale .crc sidecar so the manifest re-reads cleanly
    Files.deleteIfExists(Paths.get(dir, "._GRAFT_COMMIT.crc"))
    val meta = graft.sources.GraftManifestMeta.files(spark, dir)
    assert(meta.select("file").distinct().count() === 2L)
    val k = meta.where(col("col_idx") === 0).collect()
    assert(k.length === 1)
    assert(k(0).getAs[String]("num_lo") === "10" &&
      k(0).getAs[String]("num_hi") === "19")
    assert(k(0).getAs[Long]("nulls") === 0L)
    val s0 = meta.where(col("col_idx") === 1).collect()(0)
    assert(s0.getAs[String]("str_lo") ===
      graft.sources.GraftCommitMeta.strLoBound("alpha".getBytes("UTF-8")))
    assert(s0.getAs[String]("str_hi") ===
      graft.sources.GraftCommitMeta.strHiBound("beta".getBytes("UTF-8")))
    val legacy = meta.where(col("col_idx") === -1).collect()
    assert(legacy.length === 1 &&
      legacy(0).getAs[String]("file") === "part-90000-g0000.tsv")
    // as-of: the generation option resolves the immutable manifest
    // (which predates the hand-append, so it lists only the real part)
    val asof = graft.sources.GraftManifestMeta.files(spark, dir, Some(0L))
    assert(asof.select("file").distinct().count() === 1L)
    intercept[java.io.FileNotFoundException] {
      graft.sources.GraftManifestMeta.files(spark, dir, Some(9L))
    }
    ()
  }

  test("age-based vacuum: mtime horizon, current generation immune, dry-run mutates nothing, idempotent") {
    val dir = freshDir("vacage")
    def commitGen(tag: String, t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(dir, schema, serConf)
      val w = fac.createWriter(0, t0)
      w.write(row(t0, tag))
      new GraftCommitWrite(dir, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](w.commit()))
    }
    commitGen("g0", 100L); commitGen("g1", 200L); commitGen("g2", 300L)
    val old = System.currentTimeMillis() - 10L * 86400 * 1000
    // age g0 AND the current generation's history: the current one must
    // survive regardless of age (the live view stays as-of readable)
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0000").setLastModified(old))
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0002").setLastModified(old))
    // plant crashed-commit debris: swept by the real run, priced by the dry run
    Files.write(Paths.get(dir, "part-99999-g0009.tsv"), "9\tx\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0009"),
      "#gen\t9\npart-99999-g0009.tsv\t1\t2\n".getBytes("UTF-8"))
    val week = 7L * 86400 * 1000
    val dry = graft.sources.GraftCommitVacuum.vacuumAged(spark, dir, week, dryRun = true)
    assert(dry === ((2, 1)), s"dry run priced $dry") // g0 aged + g9 ahead; 1 orphan part
    // dry run mutated NOTHING
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists())
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0009").exists())
    assert(new java.io.File(dir, "part-99999-g0009.tsv").exists())
    assert(!new java.io.File(dir, "_GRAFT_LOCK").exists(), "lease not released")
    val real = graft.sources.GraftCommitVacuum.vacuumAged(spark, dir, week)
    assert(real === ((2, 1)), s"real run did $real — must match the dry price")
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0000").exists())
    assert(!new java.io.File(dir, "part-99999-g0009.tsv").exists())
    // the aged CURRENT generation's history survives; g1 (young) survives
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0002").exists(),
      "current generation's history must be immune to the age horizon")
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists())
    def count(gen: Option[Int]): Long = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      gen.fold(r)(g => r.option("generation", g.toString)).load().count()
    }
    assert(count(None) === 3L)
    assert(count(Some(1)) === 2L)
    intercept[java.io.FileNotFoundException] { count(Some(0)) }
    // idempotent
    assert(graft.sources.GraftCommitVacuum.vacuumAged(spark, dir, week) === ((0, 0)))
    ()
  }

  test("vacuum staging janitor is age-scoped: a live writer's attempts and a mid-stage dir survive, aged debris sweeps") {
    val dir = freshDir("vacstage")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(1L, "x"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w.commit()))
    // a CONCURRENT job's in-flight attempt (fresh mtime) + a mid-stage
    // compaction dir + genuinely abandoned debris (aged mtimes)
    new java.io.File(dir, "_temp").mkdirs()
    new java.io.File(dir, "_compact").mkdirs()
    val live = Paths.get(dir, "_temp/attempt-00007-99.tsv")
    Files.write(live, "9\tlive\n".getBytes("UTF-8"))
    val dead = Paths.get(dir, "_temp/attempt-00001-11.tsv")
    Files.write(dead, "9\tdead\n".getBytes("UTF-8"))
    val old = System.currentTimeMillis() - 11L * 60 * 1000
    assert(dead.toFile.setLastModified(old))
    val (_, _) = graft.sources.GraftCommitVacuum.vacuum(spark, dir, 1)
    assert(Files.exists(live),
      "vacuum must not yank a live writer's attempt file")
    assert(!Files.exists(dead), "aged attempt debris must sweep")
    assert(new java.io.File(dir, "_compact").exists(),
      "a fresh (possibly mid-stage) staging dir must survive")
    assert(new java.io.File(dir, "_compact").setLastModified(old))
    graft.sources.GraftCommitVacuum.vacuum(spark, dir, 1)
    assert(!new java.io.File(dir, "_compact").exists(),
      "an abandoned staging dir must sweep once aged")
  }

  test("binpack: rewrites only under-target fragments, carries large parts byte-identical, history composes") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("binpack")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    // 2 big parts (100 rows each) + 6 small fragments (5 rows each)
    val ms = (0 until 8).map { p =>
      val w = fac.createWriter(p, p.toLong)
      val n = if (p < 2) 100 else 5
      (0 until n).foreach(i => w.write(row(p * 1000L + i, s"v$p-$i")))
      w.commit(): WriterCommitMessage
    }
    new GraftCommitWrite(dir, schema, truncateFirst = false).commit(ms.toArray)
    def digest(f: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(Files.readAllBytes(Paths.get(dir, f))).map("%02x".format(_)).mkString
    }
    val bigBefore = Seq("part-00000-g0000.tsv", "part-00001-g0000.tsv")
      .map(f => f -> digest(f))
    val (frags, bins, carried) = graft.sources.GraftCommitCompact.binpack(
      spark, dir, "k BIGINT, s STRING", targetRows = 20L)
    // 6 fragments × 5 rows = 30 rows → ceil(30/20) = 2 bins; 2 carried
    assert((frags, bins, carried) === ((6, 2, 2)))
    // the big parts were NOT rewritten — same files, byte-identical
    bigBefore.foreach { case (f, d) =>
      assert(new java.io.File(dir, f).exists(), s"carried part $f vanished")
      assert(digest(f) === d, s"carried part $f was rewritten")
    }
    def read(gen: Option[Int]) = {
      val r = spark.read.format("graft.sources.GraftManifestSource")
        .schema("k BIGINT, s STRING").option("path", dir)
      gen.fold(r)(g => r.option("generation", g.toString)).load()
    }
    assert(read(None).count() === 230L)
    // row SET unchanged — binpack only moves bytes
    assert(read(None).select(sum(col("k"))).first().getLong(0) ===
      read(Some(0)).select(sum(col("k"))).first().getLong(0))
    // the replaced fragments stay for the pre-binpack generation
    assert(read(Some(0)).count() === 230L)
    // a second binpack at the same target is a no-op: 2 bins of ≤20?
    // each bin holds 15 rows < 20 ⇒ they are fragments again, but a
    // single-bin repack of 2 → 1 is legitimate work; at target 10 the
    // bins (15 rows each) are NOT fragments ⇒ true no-op
    assert(graft.sources.GraftCommitCompact.binpack(
      spark, dir, "k BIGINT, s STRING", 10L) === ((0, 0, 4)))
    // zone maps survive: the binned parts carry fresh stats and the
    // carried parts their original ones — a key filter inside a big
    // part's range plans 1 file
    val hit = read(None).where(col("k") === 1005L)
    assert(hit.rdd.getNumPartitions === 1, "binpack must preserve skipping")
    assert(hit.count() === 1L)
    // vacuum retires the replaced fragments once their generation expires
    val (_, swept) = graft.sources.GraftCommitVacuum.vacuum(spark, dir, 1)
    assert(swept === 6, s"expected the 6 replaced fragments swept, got $swept")
    assert(read(None).count() === 230L)
  }

  test("merge publish refuses when the table advanced while staging; crash fuzz leaves old-or-new views") {
    import org.apache.spark.sql.functions._
    // race: a commit lands the moment the merge publish takes the lease
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.hookfs.impl", classOf[HookFs].getName)
    val local = freshDir("mrgrace")
    val hdir = s"hookfs://$local"
    def commitGen(t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(local, schema, serConf)
      val w = fac.createWriter(0, t0)
      w.write(row(t0, s"g$t0"))
      new GraftCommitWrite(local, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](w.commit()))
    }
    commitGen(100L)
    HookFs.onLockCreate { () => commitGen(200L) }
    val ex = intercept[java.io.IOException] {
      graft.sources.GraftCommitMerge.delete(
        spark, hdir, "k BIGINT, s STRING", "k",
        spark.range(1).select(lit(100L).as("k")))
    }
    HookFs.clear()
    assert(ex.getMessage.contains("advanced"), ex.getMessage)
    // both committed rows intact — the stale rewrite never published
    assert(spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", local).load()
      .count() === 2L)

    // crash fuzz over the delete's publish mutations: at every kill
    // point the reader sees EXACTLY the pre-delete or post-delete rows
    hconf.set("fs.crashfs.impl", classOf[CrashFs].getName)
    val floc = freshDir("mrgfuzz")
    val cdir = s"crashfs://$floc"
    def setup(): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(floc))
      CrashFs.disarm()
      val fac = new GraftCommitWriterFactory(cdir, schema, serConf)
      val ms = (0 until 2).map { p =>
        val w = fac.createWriter(p, p.toLong)
        (0 until 5).foreach(i => w.write(row(p * 10L + i, "x")))
        w.commit(): WriterCommitMessage
      }
      new GraftCommitWrite(cdir, schema, truncateFirst = false)
        .commit(ms.toArray)
    }
    def visibleKeys(): Option[Set[Long]] = {
      val man = new java.io.File(floc, "_GRAFT_COMMIT")
      if (!man.exists()) None
      else Some(new String(Files.readAllBytes(man.toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty).filterNot(_.startsWith("#"))
        .flatMap { l =>
          val f = l.split("\t")
          val pf = Paths.get(floc, f(0))
          assert(Files.exists(pf), s"manifest lists missing part ${f(0)}")
          val lines = new String(Files.readAllBytes(pf), "UTF-8")
            .split("\n").filter(_.nonEmpty).toSeq
          assert(lines.size.toLong === f(1).toLong, s"row drift in ${f(0)}")
          lines.map(_.split("\t")(0).toLong)
        }.toSet)
    }
    val preKeys = (0 until 5).map(_.toLong).toSet ++
      (0 until 5).map(10L + _).toSet
    val postKeys = preKeys - 3L
    var k = 0
    var crashed = true
    while (crashed && k < 48) {
      setup()
      assert(visibleKeys().contains(preKeys))
      CrashFs.arm(k)
      crashed =
        try {
          graft.sources.GraftCommitMerge.delete(spark, cdir,
            "k BIGINT, s STRING", "k",
            spark.range(1).select(lit(3L).as("k")))
          false
        } catch { case _: Exception => true }
      CrashFs.disarm()
      visibleKeys() match {
        case Some(keys) =>
          assert(keys === preKeys || keys === postKeys,
            s"kill point $k: mixed view $keys")
        case None =>
          // the one documented non-atomic seam (manifest deleted, tmp
          // not yet renamed): readers fail loudly, never blended, and
          // the promotable tmp must be on disk for the next commit's
          // missing-manifest recovery — the same contract the commit
          // fuzz pins
          val tmps = Option(new java.io.File(floc).listFiles())
            .getOrElse(Array.empty)
            .map(_.getName).filter(_.matches("_GRAFT_COMMIT\\.g\\d+\\.tmp"))
          assert(tmps.nonEmpty,
            s"kill point $k: no manifest AND no promotable tmp")
      }
      k += 1
    }
    assert(!crashed, "merge fuzz never reached a crash-free delete in 48 points")
    assert(k > 3, s"suspiciously few merge fault points: $k")
    assert(visibleKeys().contains(postKeys))
  }

  test("zone maps: a non-finite double POISONS the column's stats — no bounds recorded, file never skipped") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val dir = freshDir("zmapinf")
    val dschema = new StructType().add("k", LongType).add("d", DoubleType)
    val fac = new GraftCommitWriterFactory(dir, dschema, serConf)
    // part 0: finite + +Inf — bounds over only the finite values would
    // be [1,1] and `d > 100` would WRONGLY skip the +Inf row (ADVICE
    // r14, high: comparison filters are null-rejecting, not
    // Inf-rejecting). Poisoned stats record nothing for d; k still does.
    val w0 = fac.createWriter(0, 1L)
    w0.write(new GenericInternalRow(Array[Any](10L, 1.0)))
    w0.write(new GenericInternalRow(Array[Any](11L, Double.PositiveInfinity)))
    // part 1: finite + NaN (Spark orders NaN above everything — d > 100
    // must keep this file too)
    val w1 = fac.createWriter(1, 2L)
    w1.write(new GenericInternalRow(Array[Any](20L, 2.0)))
    w1.write(new GenericInternalRow(Array[Any](21L, Double.NaN)))
    // part 2: all finite — bounds recorded and skippable as usual
    val w2 = fac.createWriter(2, 3L)
    w2.write(new GenericInternalRow(Array[Any](30L, 3.0)))
    new GraftCommitWrite(dir, dschema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit(), w1.commit(), w2.commit()))
    val man = new String(
      Files.readAllBytes(Paths.get(dir, "_GRAFT_COMMIT")), "UTF-8")
    // poisoned parts carry the key column's bounds but NO bounds for
    // the non-finite double column (its null count still records)
    assert(man.contains("part-00000-g0000.tsv\t2\t2\t0:10|11"), man)
    assert(man.contains("part-00001-g0000.tsv\t2\t2\t0:20|21"), man)
    assert(man.contains("0:30|30;0:n0;1:3.0|3.0;1:n0"), man)
    assert(!man.contains("1:Infinity") && !man.contains("1:NaN"), man)
    def read() = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, d DOUBLE").option("path", dir).load()
    // d > 100: the two poisoned files MUST be planned (their Inf/NaN
    // rows satisfy the predicate); the finite file skips on [3,3]
    val hot = read().where(col("d") > 100.0)
    assert(hot.rdd.getNumPartitions === 2,
      "poisoned files must never be skipped; finite file must skip")
    assert(hot.collect().map(_.getLong(0)).toSet === Set(11L, 21L),
      "the Inf and NaN rows must survive the pushed filter")
    // and the skip on the finite file is still correct the other way
    assert(read().where(col("d") === 3.0).collect()
      .map(_.getLong(0)).toSeq === Seq(30L))
  }

  test("string zone maps + null counts: truncate/increment bounds, UTF8 binary order, IsNull/IsNotNull skips") {
    import org.apache.spark.sql.functions._
    val dir = freshDir("zstr")
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    // part 0: strings in [banana, cherry]; part 1: [melon, peach];
    // part 2: one NULL string + one long value exercising 16-byte
    // truncation; k NULL on part 2 rows
    val w0 = fac.createWriter(0, 1L)
    w0.write(row(1L, "banana")); w0.write(row(2L, "cherry"))
    val w1 = fac.createWriter(1, 2L)
    w1.write(row(3L, "melon")); w1.write(row(4L, "peach"))
    val w2 = fac.createWriter(2, 3L)
    w2.write(new GenericInternalRow(Array[Any](null, null)))
    w2.write(new GenericInternalRow(Array[Any](null,
      UTF8String.fromString("zzzzzzzzzzzzzzzz-very-long-suffix"))))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w0.commit(), w1.commit(), w2.commit()))
    def read() = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", dir).load()
    def planned(df: org.apache.spark.sql.DataFrame): Int = df.rdd.getNumPartitions
    // string equality prunes to the one in-range part; the truncated
    // long-value part's incremented hi bound keeps correctness
    assert(planned(read().where(col("s") === "melon")) === 1)
    assert(read().where(col("s") === "melon").count() === 1L)
    // .explain surfaces the pushdown (round 14: the manifest scan's
    // description reports what the skipper prunes with)
    val exp = read().where(col("s") === "melon")
      .queryExecution.executedPlan.toString
    assert(exp.contains("PushedFilters: [") && exp.contains("EqualTo(s,melon)"),
      exp.linesIterator.take(6).mkString("\n"))
    // value above part 0's range, below part 1's lo, below part 2's lo
    assert(planned(read().where(col("s") === "grape")) === 0)
    // range shapes both directions
    assert(planned(read().where(col("s") < "cucumber")) === 1) // part 0 only
    assert(planned(read().where(col("s") > "pear")) === 1) // part 2 only (trunc+inc hi)
    // the truncated value is still FOUND (hi is exclusive-incremented,
    // never an under-estimate): equality on the full long string keeps
    // part 2 and matches the row
    val long = read().where(col("s") === "zzzzzzzzzzzzzzzz-very-long-suffix")
    assert(planned(long) === 1)
    assert(long.count() === 1L)
    // IS NULL: parts 0/1 record s-nulls=0 and skip; part 2 keeps
    val isnull = read().where(col("s").isNull)
    assert(planned(isnull) === 1)
    assert(isnull.count() === 1L)
    // IS NOT NULL on k: part 2's k is all NULL (nulls = rows) — skipped
    assert(planned(read().where(col("k").isNotNull)) === 2)
    assert(read().where(col("k").isNotNull).count() === 4L)
    // multi-byte UTF8 binary order: é (0xC3 0xA9) sorts above every
    // ASCII value — a filter above 'z'-ascii keeps only a part holding it
    val w3 = fac.createWriter(3, 9L)
    w3.write(row(9L, "éclair"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w3.commit()))
    val acc = read().where(col("s") > "é")
    assert(planned(acc) === 1, "UTF8-binary compare must keep only the é part")
    assert(acc.count() === 1L)
    // correctness never depends on skips
    assert(read().count() === 7L)
    // bound helpers: all-0xFF prefix cannot increment → unbounded above
    assert(graft.sources.GraftCommitMeta.strHiBound(
      Array.fill(20)(0xff.toByte)) === "")
    assert(graft.sources.GraftCommitMeta.strHiBound(
      Array[Byte]('a', 0xff.toByte)) === "62") // drop 0xff, bump 'a'→'b'
  }

  test("vacuum reads the manifest UNDER the lease: a commit landing at lease-acquisition is never swept") {
    // ADVICE r14 (high): the race — vacuum reads curGen/curEntries, a
    // commit lands, vacuum takes the lease and sweeps the NEW
    // generation's history + parts as 'ahead/unreferenced'. HookFs makes
    // the race deterministic: the moment vacuum creates _GRAFT_LOCK, a
    // full commit lands on the same directory (via the plain local FS,
    // so the hook doesn't recurse). With the manifest read under the
    // lease, vacuum sees the just-landed generation and keeps it.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.hookfs.impl", classOf[HookFs].getName)
    val local = freshDir("vacrace")
    val hdir = s"hookfs://$local"
    def commitGen(tag: String, t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(local, schema, serConf)
      val w = fac.createWriter(0, t0)
      w.write(row(t0, tag))
      new GraftCommitWrite(local, schema, truncateFirst = false)
        .commit(Array[WriterCommitMessage](w.commit()))
    }
    commitGen("g0", 100L); commitGen("g1", 200L); commitGen("g2", 300L)
    HookFs.onLockCreate { () => commitGen("g3-racing", 400L) }
    try {
      val (nMan, nParts) =
        graft.sources.GraftCommitVacuum.vacuum(spark, hdir, keep = 2)
      HookFs.error.foreach(t => fail(s"racing commit failed: $t", t))
      // horizon computed from the POST-RACE generation 3: g0+g1 expire,
      // g2+g3 retained; zero parts swept (all referenced)
      assert(nMan === 2, s"expected g0+g1 expired under the post-race horizon, got $nMan")
      assert(nParts === 0, s"vacuum swept a committed part after the race: $nParts")
    } finally HookFs.clear()
    // the racing commit's generation is fully intact and readable
    assert(new java.io.File(local, "_GRAFT_COMMIT.g0003").exists(),
      "the racing commit's history manifest was swept — committed data loss")
    val cur = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", local).load()
    assert(cur.count() === 4L, "the live pointer references swept parts")
  }

  test("compaction retry after a mid-publish crash succeeds under HDFS rename semantics (gen-ahead debris swept)") {
    // ADVICE r14 (medium): a compaction killed between its staged-part
    // renames and the manifest swap leaves part-*-g{newGen} files; a
    // re-run computes the same newGen and on HDFS rename-onto-existing
    // returns FALSE — every retry would throw forever. StrictRenameFs
    // reproduces the HDFS semantics; the planted debris simulates the
    // crashed first attempt.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.strictfs.impl", classOf[StrictRenameFs].getName)
    val local = freshDir("cretry")
    val sdir = s"strictfs://$local"
    def commitGen(tags: Seq[String], t0: Long): Unit = {
      val fac = new GraftCommitWriterFactory(sdir, schema, serConf)
      val ms = tags.zipWithIndex.map { case (tag, p) =>
        val w = fac.createWriter(p, t0 + p)
        w.write(row(t0 + p, tag)); w.commit(): WriterCommitMessage
      }
      new GraftCommitWrite(sdir, schema, truncateFirst = false)
        .commit(ms.toArray)
    }
    commitGen(Seq("a", "b", "c"), 100L)
    commitGen(Seq("d", "e", "f"), 200L)
    // crashed first compaction attempt: staged parts renamed to gen-2
    // names + its history manifest written, pointer never swapped
    Files.write(Paths.get(local, "part-00000-g0002.tsv"),
      "999\tstale\n".getBytes("UTF-8"))
    Files.write(Paths.get(local, "_GRAFT_COMMIT.g0002"),
      "#gen\t2\npart-00000-g0002.tsv\t1\t2\n".getBytes("UTF-8"))
    val (before, after) = graft.sources.GraftCommitCompact.compact(
      spark, sdir, "k BIGINT, s STRING", 1)
    assert(before === 6 && after === 1, s"($before, $after)")
    val cur = spark.read.format("graft.sources.GraftManifestSource")
      .schema("k BIGINT, s STRING").option("path", sdir).load()
    assert(cur.count() === 6L)
    assert(cur.collect().map(_.getLong(0)).toSet ===
      Set(100L, 101L, 102L, 200L, 201L, 202L),
      "stale debris rows must not leak into the compacted generation")
  }

  test("abort under a LIVE foreign lease skips the sweep; heartbeat keeps a long holder alive") {
    val dir = freshDir("abortlease")
    // a committed generation plus another writer's IN-FLIGHT commit
    // state: gen-ahead history manifest + tmp manifest + live lease
    val fac = new GraftCommitWriterFactory(dir, schema, serConf)
    val w = fac.createWriter(0, 1L)
    w.write(row(1L, "committed"))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w.commit()))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g0001"),
      "#gen\t1\npart-00000-g0001.tsv\t1\t2\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_COMMIT.g1.tmp"),
      "#gen\t1\npart-00000-g0001.tsv\t1\t2\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_GRAFT_LOCK"), "foreign\t0\n".getBytes("UTF-8"))
    // ADVICE r14 (low): abort must NOT delete the live commit's
    // in-flight protocol state — the live foreign lease says skip
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .abort(Array.empty)
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists(),
      "abort deleted a live commit's history manifest mid-protocol")
    assert(new java.io.File(dir, "_GRAFT_COMMIT.g1.tmp").exists(),
      "abort deleted a live commit's tmp manifest mid-protocol")
    assert(new java.io.File(dir, "_GRAFT_LOCK").exists())
    // make the holder STALE (crashed): abort now breaks it and sweeps
    val lock = new java.io.File(dir, "_GRAFT_LOCK")
    assert(lock.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000))
    new GraftCommitWrite(dir, schema, truncateFirst = false)
      .abort(Array.empty)
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g0001").exists(),
      "stale holder's uncommitted history must be swept")
    assert(!new java.io.File(dir, "_GRAFT_COMMIT.g1.tmp").exists())
    assert(!new java.io.File(dir, "_GRAFT_LOCK").exists(), "lease not released")
    // HEARTBEAT (round 14): a stale-looking lock that a LIVE holder
    // refreshes must NOT be broken — heartbeatLease moves the mtime, so
    // the next writer refuses instead of stale-breaking
    Files.write(lock.toPath, "holder\t0\n".getBytes("UTF-8"))
    assert(lock.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.GraftCommitMeta.heartbeatLease(
      fs, new org.apache.hadoop.fs.Path(dir))
    val ex = intercept[java.io.IOException] {
      graft.sources.GraftCommitMeta.acquireLease(
        fs, new org.apache.hadoop.fs.Path(dir))
    }
    assert(ex.getMessage.contains("another writer"), ex.getMessage)
    assert(lock.delete())
  }
}

/** Fault-injecting local FileSystem for the commit-protocol fuzz:
  * `crashfs://` routes to the local FS, but every MUTATING call
  * (create/rename/delete) outside `_temp/` first passes the kill gate —
  * armed with limit k, the (k+1)-th mutation throws instead of running,
  * simulating a driver killed at that exact protocol step. State lives
  * in the companion (Hadoop may cache/instantiate the class freely). */
class CrashFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "crashfs"
  override def getUri: java.net.URI = java.net.URI.create("crashfs:///")
  // createOutputStreamWithMode is the chokepoint BOTH public create
  // variants funnel through (the 6-arg non-permission overload does NOT
  // route via the 7-arg one), so gating here covers every create —
  // including the lease's create-no-overwrite
  override def createOutputStreamWithMode(f: org.apache.hadoop.fs.Path,
      append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission)
    : java.io.OutputStream = {
    CrashFs.gate("create", f)
    super.createOutputStreamWithMode(f, append, permission)
  }
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    CrashFs.gate("rename", dst)
    super.rename(src, dst)
  }
  override def delete(p: org.apache.hadoop.fs.Path,
      recursive: Boolean): Boolean = {
    CrashFs.gate("delete", p)
    super.delete(p, recursive)
  }
}

object CrashFs {
  @volatile private var limit: Int = Int.MaxValue
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)
  def arm(k: Int): Unit = { count.set(0); limit = k }
  def disarm(): Unit = { limit = Int.MaxValue; count.set(0) }
  private[graft] def gate(op: String,
      p: org.apache.hadoop.fs.Path): Unit = {
    if (!p.toString.contains("_temp")) {
      if (count.incrementAndGet() > limit)
        throw new java.io.IOException(
          s"injected crash before $op $p (mutation ${count.get()})")
    }
  }
}

/** Race-injecting local FileSystem: `hookfs://` routes to the local FS,
  * and the registered callback fires ONCE, at the moment `_GRAFT_LOCK`
  * is created — the exact interleaving window the vacuum lease-order
  * ADVICE finding describes (a commit landing between a pre-lease
  * manifest read and the lease acquisition). */
class HookFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "hookfs"
  override def getUri: java.net.URI = java.net.URI.create("hookfs:///")
  override def createOutputStreamWithMode(f: org.apache.hadoop.fs.Path,
      append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission)
    : java.io.OutputStream = {
    if (f.getName == "_GRAFT_LOCK") HookFs.fire()
    super.createOutputStreamWithMode(f, append, permission)
  }
}

object HookFs {
  @volatile private var hook: Option[() => Unit] = None
  @volatile var error: Option[Throwable] = None
  def onLockCreate(f: () => Unit): Unit = { hook = Some(f); error = None }
  def clear(): Unit = { hook = None }
  private[graft] def fire(): Unit = {
    val h = hook
    hook = None // fire once — the racing commit itself takes the lock too
    // surface a failed race injection to the test (an IOException here
    // would otherwise be swallowed by acquireLease's tryCreate catch)
    try h.foreach(_.apply())
    catch { case t: Throwable => error = Some(t); throw t }
  }
}

/** HDFS-rename-semantics local FileSystem: `strictfs://` routes to the
  * local FS but `rename` returns FALSE when the destination exists —
  * the object-store/HDFS behavior the local FS masks (it overwrites),
  * and the reason a crashed compaction's gen-ahead debris must be swept
  * before a retry republishes under the same names. */
class StrictRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "strictfs"
  override def getUri: java.net.URI = java.net.URI.create("strictfs:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}
