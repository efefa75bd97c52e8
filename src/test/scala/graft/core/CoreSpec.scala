package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

class NamingSpec extends AnyFunSuite {
  test("sanitizes the messy raw CICIDS-style headers") {
    assert(Naming.sanitizeName(" Destination Port") == "Destination_Port")
    assert(Naming.sanitizeName("Flow Bytes/s") == "Flow_Bytes_s")
    assert(Naming.sanitizeName("  Fwd Packet Length Max ") == "Fwd_Packet_Length_Max")
    assert(Naming.sanitizeName("a__b") == "a_b")
    assert(Naming.sanitizeName("1col") == "c_1col")
    assert(Naming.sanitizeName("***") == "col")
  }

  test("uniquifies duplicate names in first-appearance order") {
    assert(Naming.sanitizeAll(Seq("a", "a ", "b", "A a")) ==
      Seq("a", "a_1", "b", "A_a"))
    assert(Naming.sanitizeAll(Seq("x", "x", "x")) == Seq("x", "x_1", "x_2"))
  }

  test("property: output always matches identifier grammar and is collision-free") {
    val gen = Gen.listOfN(8, Gen.listOfN(6, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '/', '_', '-', '.', '('))).map(_.mkString))
    (0 until 200).foreach { i =>
      val names = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val out = Naming.sanitizeAll(names)
      assert(out.forall(_.matches("[A-Za-z_][0-9A-Za-z_]*")), s"seed $i: $out")
      assert(out.distinct.size == out.size, s"seed $i: $out")
    }
  }

  test("case/underscore-insensitive resolution") {
    assert(Naming.resolve(Seq("Fwd_Header_Length", "Idle_Min"), "fwdheaderlength")
      .contains("Fwd_Header_Length"))
    assert(Naming.resolve(Seq("a"), "zz").isEmpty)
  }
}

class LabelsSpec extends AnyFunSuite {
  // Truth table from the reference label mapper
  // (reference scripts/preprocess_cicids2017.py:38-63).
  val truth: Seq[(String, String)] = Seq(
    "BENIGN" -> "BENIGN",
    " Benign " -> "BENIGN",
    "DDoS" -> "DDoS",
    "DoS Hulk" -> "DoS",
    "DoS GoldenEye" -> "DoS",
    "DoS slowloris" -> "DoS",
    "DoS Slowhttptest" -> "DoS",
    "Distributed attack" -> "DoS",
    "PortScan" -> "PortScan",
    "Port Scan" -> "PortScan",
    "Bot" -> "Bot",
    "FTP-Patator" -> "BruteForce",
    "SSH-Patator" -> "BruteForce",
    "Brute Force" -> "BruteForce",
    "Web Attack XSS" -> "WebAttack",
    "SQL Injection" -> "WebAttack",
    "Infiltration" -> "Infiltration", // passthrough
    "Heartbleed" -> "Heartbleed",     // passthrough
    (null: String) -> "Other")

  test("mapLabel matches the reference truth table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = truth.map(_._1).toDF("raw")
      .select(Labels.mapLabel($"raw")).as[String].collect().toSeq
    assert(got == truth.map(_._2))
  }
}

class SessionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("boundedAggTopKSession: the scoped raise reaches ONLY the " +
    "sibling session; the canonical conf keeps the collect_list " +
    "memory guard; memoized per parent") {
    val spark = TestSpark.spark
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val s2 = Sessions.boundedAggTopKSession(spark)
    assert(s2 ne spark)
    assert(s2.conf.get(key) === "65536")
    // the parent (and thus every collect_list/collect_set path built
    // through it) stays at Spark's default guard
    assert(spark.conf.get(key) === "128")
    // shared context + extensions, isolated conf
    assert(s2.sparkContext eq spark.sparkContext)
    import org.apache.spark.sql.functions.expr
    assert(s2.range(1).select(
      expr("cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))"))
      .head().getDouble(0) === 1.0)
    // memoized: repeated calls reuse one sibling
    assert(Sessions.boundedAggTopKSession(spark) eq s2)
  }

  test("writer leases refuse filesystems without atomic create unless " +
    "spark.graft.lease.mode=advisory opts into best-effort") {
    val spark = TestSpark.spark
    // atomic-create family: proceeds (this is what every local/HDFS
    // lease test implicitly exercises through withLease)
    Stores.requireAtomicCreate(spark, "file", "spec")
    Stores.requireAtomicCreate(spark, "HDFS", "spec")
    Stores.requireAtomicCreate(spark, null, "spec")
    // an object store cannot give the lease mutual exclusion — loud
    // refusal naming the escape hatch, BEFORE any mutation starts
    val e = intercept[IllegalArgumentException] {
      Stores.requireAtomicCreate(spark, "s3a", "spec")
    }
    assert(e.getMessage.contains("atomic create-no-overwrite") &&
      e.getMessage.contains("spark.graft.lease.mode=advisory"),
      e.getMessage)
    // explicit opt-in: advisory mode proceeds (crashed-writer-only
    // protection, the documented trade)
    spark.conf.set("spark.graft.lease.mode", "advisory")
    try Stores.requireAtomicCreate(spark, "s3a", "spec")
    finally spark.conf.unset("spark.graft.lease.mode")
  }

  test("promoteNext/swapPartitions refuse non-atomic-rename " +
    "filesystems with NO escape hatch — a non-atomic swap corrupts " +
    "the store itself") {
    val spark = TestSpark.spark
    Stores.requireAtomicRename(spark, "file", "spec")
    Stores.requireAtomicRename(spark, "HDFS", "spec")
    Stores.requireAtomicRename(spark, null, "spec")
    val e = intercept[IllegalArgumentException] {
      Stores.requireAtomicRename(spark, "s3a", "spec")
    }
    assert(e.getMessage.contains("atomic directory rename") &&
      e.getMessage.contains("pointer-file"), e.getMessage)
    // the lease's advisory mode must NOT leak into the rename gate:
    // it trades away concurrent-writer protection, not swap atomicity
    spark.conf.set("spark.graft.lease.mode", "advisory")
    try {
      intercept[IllegalArgumentException] {
        Stores.requireAtomicRename(spark, "gs", "spec")
      }
    } finally spark.conf.unset("spark.graft.lease.mode")
  }
}
