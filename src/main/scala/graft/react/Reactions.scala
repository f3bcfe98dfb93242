package graft.react

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigraph world state for reaction rules (SURVEY.md §2.9): the place
  * forest as a parent-pointer table plus the junction link hypergraph and
  * agent contact links.
  *
  *   places: (id LONG, ctrl STRING, name STRING, parent LONG)  parent -1 = region
  *   junctionEdges: (edge_key STRING, place_id LONG)           hyperedge membership
  *   contacts: (agent_a LONG, agent_b LONG)                    B6 links
  *
  * Each reaction is a declarative transformation: the LHS pattern is a join
  * over these tables, the rewrite is a point update — no SAT search
  * (reference uses MiniSAT subgraph isomorphism, builder.ml:237-238; our
  * rules match by keyed joins, SURVEY.md §2.9). "First occurrence" is the
  * canonical minimum over the match keys, making every rule deterministic
  * (reference's solver order is unspecified; SURVEY.md §7.5).
  */
case class BigraphState(places: DataFrame, junctionEdges: DataFrame, contacts: DataFrame) {
  def spark: SparkSession = places.sparkSession

  def countCtrl(ctrl: String): Long = places.filter(col("ctrl") === ctrl).count()

  /** Location of an agent: (parent id, parent ctrl, parent name). */
  def whereIs(agentName: String): Option[(Long, String, String)] = {
    places.as("a").filter(col("a.ctrl") === "Agent" && col("a.name") === agentName)
      .join(places.as("p"), col("a.parent") === col("p.id"))
      .select(col("p.id"), col("p.ctrl"), col("p.name"))
      .collect().headOption.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
  }
}

object Reactions {

  /** Rewrite helper: set `parent` of one place id. */
  private def reparent(s: BigraphState, placeId: Long, newParent: Long): BigraphState =
    s.copy(places = s.places.withColumn("parent",
      when(col("id") === placeId, lit(newParent)).otherwise(col("parent")))
      .cache())

  private def nextId(s: BigraphState): Long =
    s.places.agg(max(col("id"))).collect()(0).getLong(0) + 1

  /** B1 add_agent_to_building (builder.ml:240-276): insert Agent under the
    * canonically-first Building with `buildingName`; error if absent. */
  def addAgentToBuilding(s: BigraphState, buildingName: String, agentName: String): BigraphState = {
    val b = s.places.filter(col("ctrl") === "Building" && col("name") === buildingName)
      .orderBy(col("id")).limit(1).collect()
    require(b.nonEmpty, s"""Building name "$buildingName" not found""")
    val id = nextId(s)
    val sp = s.spark
    import sp.implicits._
    val fresh = Seq((id, "Agent", agentName, b(0).getAs[Long]("id")))
      .toDF("id", "ctrl", "name", "parent")
    s.copy(places = s.places.unionByName(fresh).cache())
  }

  /** All occurrences of leave_* (builder.ml:309-332) as a Dataset:
    * (agent, target) where target = the grandparent the agent moves beside. */
  def leaveMatches(s: BigraphState, ctrl: String): DataFrame =
    s.places.as("a")
      .filter(col("a.ctrl") === "Agent")
      .join(s.places.as("p"), col("a.parent") === col("p.id") && col("p.ctrl") === lit(ctrl))
      .select(col("a.id").as("agent"), col("p.parent").as("target"))

  /** B2 leave_*: Agent nested in a `ctrl` ⇒ beside it (builder.ml:309-332). */
  def leave(s: BigraphState, ctrl: String): Option[BigraphState] =
    applyFirst(s, leaveMatches(s, ctrl))

  /** All occurrences of enter_* (builder.ml:334-351): (agent, target). */
  def enterMatches(s: BigraphState, ctrl: String,
                   viaParentCtrl: Option[String] = None): DataFrame = {
    var m = s.places.as("a")
      .filter(col("a.ctrl") === "Agent")
      .join(s.places.as("t"),
        col("t.parent") === col("a.parent") && col("t.ctrl") === lit(ctrl) &&
          col("t.id") =!= col("a.id"))
    for (pc <- viaParentCtrl)
      m = m.join(s.places.as("p"),
        col("a.parent") === col("p.id") && col("p.ctrl") === lit(pc))
    m.select(col("a.id").as("agent"), col("t.id").as("target"))
  }

  /** B3/B4 enter_* (+ optional parent-ctrl constraint for
    * enter_building_from_street/_from_boundary, builder.ml:334-351):
    * Agent beside a `ctrl` sibling ⇒ nested in it. */
  def enter(s: BigraphState, ctrl: String, viaParentCtrl: Option[String] = None): Option[BigraphState] =
    applyFirst(s, enterMatches(s, ctrl, viaParentCtrl))

  /** All occurrences of move_across_linked_streets (builder.ml:353-368):
    * (agent, target street). */
  def moveAcrossMatches(s: BigraphState): DataFrame = {
    val j = s.places.filter(col("ctrl") === "Junction")
      .join(s.junctionEdges, col("id") === col("place_id"))
      .select(col("id").as("jid"), col("parent").as("street"), col("edge_key"))
    s.places.as("a").filter(col("a.ctrl") === "Agent")
      .join(s.places.as("st"), col("a.parent") === col("st.id") && col("st.ctrl") === "Street")
      .join(j.as("j1"), col("j1.street") === col("st.id"))
      .join(j.as("j2"), col("j2.edge_key") === col("j1.edge_key") &&
        col("j2.street") =!= col("j1.street"))
      .select(col("a.id").as("agent"), col("j2.street").as("target"))
      .distinct()
  }

  /** B5 move_across_linked_streets (builder.ml:353-368): Agent in Street s₁
    * beside a Junction on hyperedge e; another Junction on e sits in
    * Street s₂ ≠ s₁ ⇒ Agent moves to s₂. */
  def moveAcrossLinkedStreets(s: BigraphState): Option[BigraphState] =
    applyFirst(s, moveAcrossMatches(s))

  /** All occurrences of connect_to_nearby_agent (builder.ml:381-408) after
    * the AppCond anti join: (agent_a, agent_b) pairs not yet linked. */
  def connectMatches(s: BigraphState): DataFrame = {
    val agents = s.places.filter(col("ctrl") === "Agent").select(col("id"), col("parent"))
    agents.as("x").join(agents.as("y"),
        col("x.parent") === col("y.parent") && col("x.id") < col("y.id"))
      .select(col("x.id").as("agent_a"), col("y.id").as("agent_b"))
      .join(s.contacts, Seq("agent_a", "agent_b"), "left_anti")
  }

  /** B6 connect_to_nearby_agent (builder.ml:381-408): two Agents sharing a
    * parent, not already linked (the AppCond as a left_anti join), get a
    * contact link. */
  def connectToNearbyAgent(s: BigraphState): Option[BigraphState] = {
    val fresh = connectMatches(s)
      .orderBy(col("agent_a"), col("agent_b")).limit(1).collect()
    fresh.headOption.map(r => addContact(s, r.getLong(0), r.getLong(1)))
  }

  private def addContact(s: BigraphState, a: Long, b: Long): BigraphState = {
    val sp = s.spark
    import sp.implicits._
    s.copy(contacts = s.contacts.unionByName(Seq((a, b)).toDF("agent_a", "agent_b")).cache())
  }

  /** Canonical first occurrence of a reparenting match set (§7.5: "first" =
    * minimum (agent, target), replacing the solver's unspecified order). */
  private def applyFirst(s: BigraphState, matches: DataFrame): Option[BigraphState] =
    matches.orderBy(col("agent"), col("target")).limit(1).collect()
      .headOption.map(r => reparent(s, r.getLong(0), r.getLong(1)))

  /** BRS `step` (builder.mli:124-133): enumerate occurrences of a
    * reparenting rule and return one successor state per occurrence —
    * library-surface parity with the reference's step (the binary itself
    * only ever calls apply/fix). `matches` is one of the *Matches Datasets.
    *
    * BOUNDED: the reference materializes every SAT occurrence in memory;
    * here the canonical-order LIMIT is pushed into the query, so a large
    * state cannot flood the driver (`maxOccurrences` occurrences collected,
    * ids only). Successors are built lazily (LazyList) — a caller that
    * consumes only the first few never constructs the rest. */
  def step(s: BigraphState, matches: DataFrame,
           maxOccurrences: Int = 1024): Seq[BigraphState] =
    LazyList.from(
        matches.orderBy(col("agent"), col("target")).limit(maxOccurrences).collect())
      .map(r => reparent(s, r.getLong(0), r.getLong(1)))

  /** BRS `random_step` (builder.mli:129-133): apply one occurrence chosen
    * uniformly by a SEEDED pick over the canonical order (determinism rule
    * §7.5 replaces the reference's Random.self_init). floorMod, not .abs:
    * Long.MinValue.abs is negative. */
  def randomStep(s: BigraphState, matches: DataFrame, seed: Long): Option[BigraphState] = {
    val ms = matches.orderBy(col("agent"), col("target")).collect()
    if (ms.isEmpty) None
    else {
      val r = ms(math.floorMod(graft.synth.SynthWorld.mix(seed), ms.length.toLong).toInt)
      Some(reparent(s, r.getLong(0), r.getLong(1)))
    }
  }

  /** Truncate a DataFrame's logical plan without carrying stale constraints
    * (plain localCheckpoint's LogicalRDD keeps constraints that break later
    * unions — observed on Spark 4.1). */
  private def truncateLineage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema).cache()

  /** B7 fix: apply `rule` until no occurrence (bounded;
    * builder.mli:124-136). Every 16 steps the stacked point-update
    * projections are collapsed by materializing the plan — without this the
    * plan nests one `when` per step and analysis cost grows unboundedly.
    * Returns (state, stepsApplied). */
  def fix(s0: BigraphState, rule: BigraphState => Option[BigraphState],
          maxSteps: Int = 1000): (BigraphState, Int) = {
    var s = s0
    var n = 0
    var more = true
    while (more && n < maxSteps) rule(s) match {
      case Some(next) =>
        s = if ((n + 1) % 16 == 0)
          next.copy(places = truncateLineage(next.places),
            contacts = truncateLineage(next.contacts))
        else next
        n += 1
      case None => more = false
    }
    (s, n)
  }
}
