package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.{Slow, TestSpark}

/** GENUINELY cross-process ingest recovery: a `graft.Main ingest` run
  * in its own JVM is halt()ed after a batch's sinks land but before
  * the checkpoint commit (the real at-least-once window — not an
  * in-process simulation), then the SAME command re-runs in a second
  * fresh JVM. The file-stream source resumes from the checkpoint,
  * REDELIVERS the interrupted batch over its own outputs, and the
  * final kept/funnel/settled stores must be bit-identical to an
  * uninterrupted run. */
class CrossJvmRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runCli(args: Seq[String], logTag: String): Int =
    runCliOut(args, logTag)._1

  private def runCliOut(args: Seq[String],
                        logTag: String): (Int, String) = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.Main") ++ args
    val log = java.nio.file.Files
      .createTempFile(s"graft_xjvm_$logTag", ".log").toFile
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    val p = pb.start()
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); fail(s"$logTag: child JVM hung") }
    val rc = p.exitValue()
    if (rc != 0 && rc != 137)
      fail(s"$logTag: rc=$rc\n" + scala.io.Source.fromFile(log)
        .getLines().toSeq.takeRight(40).mkString("\n"))
    (rc, scala.io.Source.fromFile(log).getLines().mkString("\n"))
  }

  test("a run killed between sinks and checkpoint commit resumes in a " +
    "SECOND JVM; kept/funnel/settled bit-identical to an " +
    "uninterrupted run", Slow) {
    import graft.operators.{Dedup, Dsir}
    val base = java.nio.file.Files
      .createTempDirectory("graft_xjvm").toString

    // fixtures: a settled signature store (per RUN — both runs settle
    // into their own <sig>_settled sidecar), DSIR weights, and an
    // input dir of TWO parquet files = two micro-batches under
    // maxFilesPerTrigger=1
    val settled = Seq((1L, "the a unrelated settled seed text " +
      (1 to 30).map(i => f"s$i%02dab").mkString(" ")))
      .toDF("doc_id", "text")
    for (tag <- Seq("ref", "crash"))
      Dedup.minhashSignatures(settled, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$base/sig_$tag/sig")
    Dsir.bucketWeights(
        Seq(1L -> "spark scala catalyst spark").toDF("doc_id", "text"),
        Seq(10L -> "cobol fortran basic").toDF("doc_id", "text"),
        "text", buckets = 64)
      .write.mode("overwrite").parquet(s"$base/weights")
    def doc(id: Long, tag: Char) =
      (id, s"the a spark scala catalyst tungsten " +
        (1 to 30).map(i => f"$tag$i%02dab").mkString(" "))
    Seq(doc(100L, 'g')).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$base/in")
    Seq(doc(200L, 'h')).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$base/in")

    def ingestArgs(tag: String, extra: Seq[String]): Seq[String] =
      Seq("ingest", "--in", s"$base/in",
        "--sig", s"$base/sig_$tag/sig",
        "--weights", s"$base/weights",
        "--out", s"$base/out_$tag",
        "--stream-files", "true",
        "--min-words", "5", "--min-cb", "-1000000") ++ extra

    // uninterrupted reference run
    assert(runCli(ingestArgs("ref", Nil), "ref") === 0)

    // crashed run: halt after batch 0's sinks, before its commit
    val rcCrash = runCli(
      ingestArgs("crash", Seq("--crash-after-batch", "0")), "crash")
    assert(rcCrash === 137, s"expected the injected halt, rc=$rcCrash")
    // the window is real: batch 0's kept partition landed…
    assert(new java.io.File(s"$base/out_crash/kept/batch_id=0").exists,
      "batch 0's sinks must have landed before the halt")
    // …but its checkpoint commit did not
    assert(!new java.io.File(s"$base/out_crash/ckpt/commits/0").exists,
      "the halt must precede the checkpoint commit")

    // resume: the SAME command in a fresh JVM — batch 0 redelivers
    // over its own outputs, batch 1 then processes
    assert(runCli(ingestArgs("crash", Nil), "resume") === 0)

    def keptRows(tag: String) =
      spark.read.parquet(s"$base/out_$tag/kept")
        .select($"doc_id", $"text", $"batch_id".cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2))).toSet
    def funnelRows(tag: String) =
      spark.read.parquet(s"$base/out_$tag/funnel")
        .select($"batch_id".cast("long"), $"n_in", $"n_dup_killed",
          $"n_kept")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    def settledRows(tag: String) =
      spark.read.parquet(
          StreamingIngest.settledSigPath(s"$base/sig_$tag/sig"))
        .select($"id", $"batch_id".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(keptRows("crash") === keptRows("ref"),
      "kept corpus must be bit-identical to the uninterrupted run")
    assert(keptRows("crash").map(_._1) === Set(100L, 200L))
    assert(funnelRows("crash") === funnelRows("ref"),
      "funnel attribution must be reproduced exactly")
    assert(settledRows("crash") === settledRows("ref"),
      "settled signatures must be reproduced exactly")
  }

  test("fsck --repair in a THIRD JVM between the halt and the resume " +
    "composes: the swept stores resume cleanly and exactly-once", Slow) {
    import graft.operators.{Dedup, Dsir}
    val base = java.nio.file.Files
      .createTempDirectory("graft_xjvm_fsck").toString
    val settled = Seq((1L, "the a unrelated settled seed text " +
      (1 to 30).map(i => f"s$i%02dab").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.minhashSignatures(settled, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/sig/sig")
    Dsir.bucketWeights(
        Seq(1L -> "spark scala catalyst spark").toDF("doc_id", "text"),
        Seq(10L -> "cobol fortran basic").toDF("doc_id", "text"),
        "text", buckets = 64)
      .write.mode("overwrite").parquet(s"$base/weights")
    def doc(id: Long, tag: Char) =
      (id, s"the a spark scala catalyst tungsten " +
        (1 to 30).map(i => f"$tag$i%02dab").mkString(" "))
    Seq(doc(100L, 'g')).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$base/in")
    Seq(doc(200L, 'h')).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$base/in")
    def ingestArgs(extra: Seq[String]): Seq[String] =
      Seq("ingest", "--in", s"$base/in",
        "--sig", s"$base/sig/sig",
        "--weights", s"$base/weights",
        "--out", s"$base/out",
        "--stream-files", "true",
        "--min-words", "5", "--min-cb", "-1000000") ++ extra

    // real halt(137) between batch 0's sinks and its checkpoint commit
    assert(runCli(ingestArgs(Seq("--crash-after-batch", "0")),
      "fsck_crash") === 137)
    // a writer halted mid-mutation also strands its lease — plant the
    // dead holder's lease file exactly as halt(137) inside withLease
    // would leave it
    val lease = new java.io.File(
      graft.core.Stores.leasePath(s"$base/sig/sig"))
    val w = new java.io.FileWriter(lease)
    w.write("crashed-writer pid=999999999\n"); w.close()

    // the operator recipe, each step its own JVM: fsck --repair the
    // store trees, THEN re-run the same ingest command
    val (rc1, out1) = runCliOut(Seq("store", "--fsck", s"$base/sig",
      "--repair", "true"), "fsck_sig")
    assert(rc1 === 0)
    assert(out1.contains("\"removed_lease\""),
      s"fsck must clear the dead writer's lease: $out1")
    val (rc2, out2) = runCliOut(Seq("store", "--fsck", s"$base/out",
      "--repair", "true"), "fsck_out")
    assert(rc2 === 0 && out2.contains("\"command\":\"store\""), out2)

    // resume in a fresh JVM: batch 0 redelivers over its own outputs,
    // batch 1 processes — fsck must not have broken the checkpoint,
    // the landed partitions, or the settled sidecar
    assert(runCli(ingestArgs(Nil), "fsck_resume") === 0)
    assert(!lease.exists, "the cleared lease must stay cleared")
    val kept = spark.read.parquet(s"$base/out/kept")
      .select($"doc_id", $"batch_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((100L, 0L), (200L, 1L)),
      "exactly-once kept rows after fsck + resume")
    val funnel = spark.read.parquet(s"$base/out/funnel")
      .select($"batch_id".cast("long"), $"n_in", $"n_kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(funnel === Set((0L, 1L, 1L), (1L, 1L, 1L)),
      "one funnel row per batch, no duplicate from the redelivery")
    val settledIds = spark.read.parquet(
        StreamingIngest.settledSigPath(s"$base/sig/sig"))
      .select($"id", $"batch_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(settledIds === Set((100L, 0L), (200L, 1L)),
      "settled signatures exactly-once after fsck + resume")
  }
}
