package graft.streaming

/** Topic administration ops surface (SURVEY §2.8 ST9) — the typed twin
  * of the reference's topic bootstrap (reference
  * stream_anomaly_detector.py:374-388 creates its input/output topics
  * with explicit partition and replication counts before consuming).
  *
  * The sandbox has no broker and no kafka-clients jar, so — like the
  * S4/S5 source/sink rows — this surface is the CONFIGURATION layer:
  * validated topic specs, the AdminClient properties map, and rendered
  * `kafka-topics.sh` / `kafka-configs.sh` command plans an ops script
  * executes verbatim against a real cluster. Everything here is a pure
  * function (spec in → strings out), so the validation and rendering
  * are fully unit-tested; only the final `exec` needs a broker.
  *
  * Scale posture: topic partition count is the ceiling on consumer
  * parallelism — a 1000-executor structured-streaming job reading a
  * 32-partition topic uses 32 cores. Size partitions to the TARGET
  * consumer parallelism at peak (and over-provision: partitions can be
  * added but never removed without a rebuild), and set retention by
  * the replay window the checkpoint recovery story needs, not disk
  * comfort — an offset past retention is an unrecoverable stream. */
object TopicAdmin {

  /** Kafka's topic-name grammar: [a-zA-Z0-9._-]{1,249}, and not the
    * reserved "." / "..". Checked here so a bad name fails at plan
    * time, not half-way through an ops run. */
  private val NamePattern = "[a-zA-Z0-9._-]{1,249}".r

  def requireValidTopic(name: String): Unit = {
    require(NamePattern.matches(name) && name != "." && name != "..",
      s"illegal topic name '$name' (legal: [a-zA-Z0-9._-], 1..249 " +
        "chars, not '.' or '..')")
    // kafka internally collides '.' and '_' in metric names; mixing
    // both is legal but a deployment footgun — refuse loudly
    require(!(name.contains(".") && name.contains("_")),
      s"topic name '$name' mixes '.' and '_' — kafka metric names " +
        "collide on these; pick one separator")
  }

  /** A topic to create/verify: partitions bound consumer parallelism,
    * `configs` are raw topic-level overrides (retention.ms,
    * cleanup.policy, max.message.bytes, ...). */
  final case class TopicSpec(name: String, partitions: Int,
                             replication: Short,
                             configs: Map[String, String] = Map.empty) {
    requireValidTopic(name)
    require(partitions > 0, s"partitions must be positive, got $partitions")
    require(replication > 0, s"replication must be positive, got $replication")
  }

  /** AdminClient connection properties — the map an ops script (or a
    * deployment with kafka-clients on the classpath) feeds
    * `AdminClient.create`. Same bootstrap contract as
    * `StreamPipeline.kafkaSourceOptions`. */
  def adminOptions(bootstrap: String,
                   extra: Map[String, String] = Map.empty): Map[String, String] = {
    require(bootstrap.nonEmpty, "bootstrap.servers must be non-empty")
    Map("bootstrap.servers" -> bootstrap,
      "client.id" -> "graft-topic-admin",
      // admin calls are cheap control-plane ops; fail fast rather than
      // hang a settle pipeline on a dead broker
      "request.timeout.ms" -> "15000",
      "retries" -> "3") ++ extra
  }

  /** `kafka-topics.sh --create` argv for a spec (idempotent form:
    * --if-not-exists makes re-running the ops script safe). */
  def createCommand(bootstrap: String, spec: TopicSpec): Seq[String] =
    Seq("kafka-topics.sh", "--bootstrap-server", bootstrap,
      "--create", "--if-not-exists",
      "--topic", spec.name,
      "--partitions", spec.partitions.toString,
      "--replication-factor", spec.replication.toString) ++
      spec.configs.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq("--config", s"$k=$v")
      }

  def deleteCommand(bootstrap: String, topic: String): Seq[String] = {
    requireValidTopic(topic)
    Seq("kafka-topics.sh", "--bootstrap-server", bootstrap,
      "--delete", "--topic", topic)
  }

  def describeCommand(bootstrap: String, topic: String): Seq[String] = {
    requireValidTopic(topic)
    Seq("kafka-topics.sh", "--bootstrap-server", bootstrap,
      "--describe", "--topic", topic)
  }

  /** Grow a topic's partition count (the only direction kafka
    * supports; shrinking is a rebuild). Refuses a non-growth no-op so
    * an ops script can't silently mask a misread current count. */
  def addPartitionsCommand(bootstrap: String, topic: String,
                           current: Int, target: Int): Seq[String] = {
    requireValidTopic(topic)
    require(target > current,
      s"partitions can only grow: current=$current target=$target " +
        "(shrinking requires a new topic + replay)")
    Seq("kafka-topics.sh", "--bootstrap-server", bootstrap,
      "--alter", "--topic", topic, "--partitions", target.toString)
  }

  /** `kafka-configs.sh` retention override — the replay-window knob;
    * ms <= 0 is rejected (kafka would read -1 as "infinite", which is
    * never what a settle pipeline wants silently). */
  def setRetentionCommand(bootstrap: String, topic: String,
                          retentionMs: Long): Seq[String] = {
    requireValidTopic(topic)
    require(retentionMs > 0, s"retentionMs must be positive, got " +
      s"$retentionMs (use deleteCommand to drop a topic, and say " +
      "infinite retention explicitly in the topic configs if meant)")
    Seq("kafka-configs.sh", "--bootstrap-server", bootstrap,
      "--alter", "--entity-type", "topics", "--entity-name", topic,
      "--add-config", s"retention.ms=$retentionMs")
  }

  /** The full bootstrap plan for a streaming pipeline's topics — one
    * create per spec, rendered in spec order. An ops script prints or
    * executes these lines; re-running is safe (--if-not-exists). */
  def bootstrapPlan(bootstrap: String,
                    specs: Seq[TopicSpec]): Seq[Seq[String]] = {
    val dup = specs.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate topic specs for: ${dup.mkString(", ")}")
    specs.map(createCommand(bootstrap, _))
  }

  // ------------------------------------------------------------------
  // Execution tier — opt-in (`--execute`), broker-bound like S4/S5.
  // Two paths: run the RENDERED shell plan (any host with the kafka
  // CLI tools), or drive AdminClient directly. kafka-clients is not
  // on this repo's classpath (no broker in the build sandbox), so the
  // AdminClient path binds by REFLECTION at runtime: present on a
  // deployment classpath it executes, absent it fails loudly with a
  // classpath message — never silently. The specs pin that both paths
  // are fed by the exact rendered plan / adminOptions properties.
  // ------------------------------------------------------------------

  private def runProcess(argv: Seq[String]): Int =
    new ProcessBuilder(argv: _*).inheritIO().start().waitFor()

  /** Execute a rendered plan step by step, stopping LOUDLY on the
    * first non-zero exit (a half-applied topic plan must never look
    * green). `runner` is injectable so the spec pins that the exact
    * rendered argv lines are what execution receives. */
  def executePlan(plan: Seq[Seq[String]],
                  runner: Seq[String] => Int = runProcess): Seq[Int] =
    plan.map { argv =>
      val rc = runner(argv)
      require(rc == 0,
        s"plan step failed (rc=$rc): ${argv.mkString(" ")} — aborting " +
          "the remaining steps (re-running the create plan is safe: " +
          "--if-not-exists)")
      rc
    }

  /** `adminOptions` as the java Properties object `AdminClient.create`
    * takes — the one place the execute path builds its config, so the
    * spec's pin on this feed covers execution. */
  def adminProperties(bootstrap: String,
                      extra: Map[String, String] = Map.empty)
      : java.util.Properties = {
    val p = new java.util.Properties()
    adminOptions(bootstrap, extra).foreach { case (k, v) => p.put(k, v) }
    p
  }

  private def loadKafkaClass(name: String): Class[_] =
    try Class.forName(name)
    catch {
      case _: ClassNotFoundException => throw new IllegalStateException(
        s"$name is not on the classpath — the AdminClient execute " +
          "path needs the kafka-clients jar (a deployment classpath " +
          "has it; this build sandbox has no broker). Use the " +
          "rendered shell plan via executePlan/kafka-topics.sh " +
          "instead, or add kafka-clients and re-run.")
    }

  /** Create the topics with AdminClient (reflection-bound; see tier
    * note). Blocks until the broker acks every topic; an existing
    * topic surfaces as the client's TopicExistsException — pass
    * idempotent ops through the shell plan's --if-not-exists form. */
  def executeCreateWithAdminClient(bootstrap: String,
                                   specs: Seq[TopicSpec],
                                   extra: Map[String, String] = Map.empty)
      : Unit = {
    val dup = specs.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dup.isEmpty, s"duplicate topic specs for: ${dup.mkString(", ")}")
    val adminCls = loadKafkaClass("org.apache.kafka.clients.admin.AdminClient")
    val newTopicCls = loadKafkaClass("org.apache.kafka.clients.admin.NewTopic")
    val client = adminCls
      .getMethod("create", classOf[java.util.Properties])
      .invoke(null, adminProperties(bootstrap, extra))
    try {
      val topics = new java.util.ArrayList[AnyRef]()
      specs.foreach { s =>
        val nt = newTopicCls
          .getConstructor(classOf[String], classOf[Int], classOf[Short])
          .newInstance(s.name, Int.box(s.partitions), Short.box(s.replication))
          .asInstanceOf[AnyRef]
        if (s.configs.nonEmpty) {
          val jm = new java.util.HashMap[String, String]()
          s.configs.foreach { case (k, v) => jm.put(k, v) }
          newTopicCls.getMethod("configs", classOf[java.util.Map[_, _]])
            .invoke(nt, jm)
          ()
        }
        topics.add(nt)
        ()
      }
      val result = adminCls
        .getMethod("createTopics", classOf[java.util.Collection[_]])
        .invoke(client, topics)
      val all = result.getClass.getMethod("all").invoke(result)
      all.getClass.getMethod("get").invoke(all) // block for the ack
      ()
    } finally {
      adminCls.getMethod("close").invoke(client)
      ()
    }
  }

  /** Delete topics with AdminClient (reflection-bound). */
  def executeDeleteWithAdminClient(bootstrap: String, topics: Seq[String],
                                   extra: Map[String, String] = Map.empty)
      : Unit = {
    topics.foreach(requireValidTopic)
    val adminCls = loadKafkaClass("org.apache.kafka.clients.admin.AdminClient")
    val client = adminCls
      .getMethod("create", classOf[java.util.Properties])
      .invoke(null, adminProperties(bootstrap, extra))
    try {
      val names = new java.util.ArrayList[String]()
      topics.foreach { t => names.add(t); () }
      val result = adminCls
        .getMethod("deleteTopics", classOf[java.util.Collection[_]])
        .invoke(client, names)
      val all = result.getClass.getMethod("all").invoke(result)
      all.getClass.getMethod("get").invoke(all)
      ()
    } finally {
      adminCls.getMethod("close").invoke(client)
      ()
    }
  }
}
