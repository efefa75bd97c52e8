package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class TopicAdminSpec extends AnyFunSuite {
  import TopicAdmin._

  test("topic name grammar: legal names pass, illegal fail loudly") {
    Seq("events", "flow.features.v2", "a-b_c".replace(".", ""), "x" * 249)
      .foreach(requireValidTopic)
    Seq("", "x" * 250, "sp ace", "slash/", "dot.and_under", ".", "..",
        "ünïcode").foreach { bad =>
      val e = intercept[IllegalArgumentException](requireValidTopic(bad))
      assert(e.getMessage.nonEmpty)
    }
  }

  test("spec validation: partitions and replication must be positive") {
    intercept[IllegalArgumentException](TopicSpec("t", 0, 1))
    intercept[IllegalArgumentException](TopicSpec("t", 8, 0))
    assert(TopicSpec("t", 8, 3).partitions === 8)
  }

  test("create command renders sorted --config overrides, idempotent flag") {
    val cmd = createCommand("b:9092",
      TopicSpec("flow-events", 32, 3,
        Map("retention.ms" -> "86400000", "cleanup.policy" -> "delete")))
    assert(cmd === Seq("kafka-topics.sh", "--bootstrap-server", "b:9092",
      "--create", "--if-not-exists", "--topic", "flow-events",
      "--partitions", "32", "--replication-factor", "3",
      "--config", "cleanup.policy=delete",
      "--config", "retention.ms=86400000"))
  }

  test("partitions only grow; retention must be explicit and positive") {
    val grow = addPartitionsCommand("b:9092", "t", current = 8, target = 32)
    assert(grow.containsSlice(Seq("--partitions", "32")))
    intercept[IllegalArgumentException](
      addPartitionsCommand("b:9092", "t", current = 32, target = 32))
    intercept[IllegalArgumentException](
      setRetentionCommand("b:9092", "t", 0L))
    assert(setRetentionCommand("b:9092", "t", 86400000L)
      .containsSlice(Seq("--add-config", "retention.ms=86400000")))
  }

  test("admin options carry bootstrap + fail-fast timeouts; extras win") {
    val o = adminOptions("b:9092", Map("request.timeout.ms" -> "5000"))
    assert(o("bootstrap.servers") === "b:9092")
    assert(o("request.timeout.ms") === "5000")
    intercept[IllegalArgumentException](adminOptions(""))
  }

  test("bootstrap plan: one create per spec, duplicate names rejected") {
    val plan = bootstrapPlan("b:9092",
      Seq(TopicSpec("in", 8, 1), TopicSpec("out", 8, 1)))
    assert(plan.size === 2 && plan.forall(_.head == "kafka-topics.sh"))
    intercept[IllegalArgumentException](bootstrapPlan("b:9092",
      Seq(TopicSpec("in", 8, 1), TopicSpec("in", 16, 1))))
  }

  test("executePlan feeds the exact rendered argv to the runner and " +
    "aborts loudly on the first failure") {
    val plan = bootstrapPlan("b:9092",
      Seq(TopicSpec("in", 8, 1), TopicSpec("out", 8, 1)))
    var seen = List.empty[Seq[String]]
    val rcs = executePlan(plan, argv => { seen ::= argv; 0 })
    assert(rcs === Seq(0, 0))
    assert(seen.reverse === plan, "the runner must receive the " +
      "rendered plan verbatim, in order")
    // first step fails -> remaining steps never run
    var calls = 0
    val ex = intercept[IllegalArgumentException] {
      executePlan(plan, _ => { calls += 1; 1 })
    }
    assert(ex.getMessage.contains("rc=1") && calls === 1, ex.getMessage)
  }

  test("adminProperties is the adminOptions map, verbatim — the feed " +
    "the AdminClient execute path builds from") {
    val p = adminProperties("b:9092", Map("client.id" -> "ops"))
    val o = adminOptions("b:9092", Map("client.id" -> "ops"))
    import scala.jdk.CollectionConverters._
    assert(p.asScala.toMap === o)
  }

  test("AdminClient execute path fails loudly without kafka-clients " +
    "on the classpath (this sandbox), never silently") {
    val ex = intercept[IllegalStateException] {
      executeCreateWithAdminClient("b:9092", Seq(TopicSpec("in", 8, 1)))
    }
    assert(ex.getMessage.contains("kafka-clients"), ex.getMessage)
    val ex2 = intercept[IllegalStateException] {
      executeDeleteWithAdminClient("b:9092", Seq("in"))
    }
    assert(ex2.getMessage.contains("kafka-clients"), ex2.getMessage)
    // the argument contract still fires BEFORE any classpath probe
    intercept[IllegalArgumentException] {
      executeDeleteWithAdminClient("b:9092", Seq(".."))
    }
  }
}
