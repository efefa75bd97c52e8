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
}
