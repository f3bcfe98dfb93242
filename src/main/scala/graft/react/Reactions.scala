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
    * consumes only the first few never constructs the rest. When the limit
    * binds, [[stepTruncated]] reports it (mirroring
    * TransitionGraph.truncated); this overload logs loudly instead of
    * silently shortening the list. */
  def step(s: BigraphState, matches: DataFrame,
           maxOccurrences: Int = 1024): Seq[BigraphState] = {
    val (succs, truncated) = stepTruncated(s, matches, maxOccurrences)
    if (truncated)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"step: occurrence enumeration truncated at maxOccurrences=$maxOccurrences " +
          "(use stepTruncated for the indicator, or raise the bound)")
    succs
  }

  /** [[step]] with an explicit truncation indicator: (successors, true when
    * more than `maxOccurrences` occurrences existed — the reference's MAX
    * posture, builder.mli:139). Probes limit+1 rows so the signal costs no
    * extra job. */
  def stepTruncated(s: BigraphState, matches: DataFrame,
                    maxOccurrences: Int = 1024): (Seq[BigraphState], Boolean) = {
    // clamp: limit(Int.MaxValue + 1) would overflow to a negative limit and
    // fail the query — MaxValue-1 keeps the +1 truncation probe valid
    val cap = math.min(maxOccurrences, Int.MaxValue - 1)
    val rows =
      matches.orderBy(col("agent"), col("target")).limit(cap + 1).collect()
    (LazyList.from(rows.take(cap))
      .map(r => reparent(s, r.getLong(0), r.getLong(1))),
      rows.length > cap)
  }

  /** The i-th (0-based) occurrence in canonical (agent, target) order, as
    * ONE collected row — executor-side row_number over an unpartitioned
    * window (a single-partition sort of THIS state's occurrences only; the
    * chosen rule pays one extra scan instead of the driver paying O(i)
    * rows). Shared by [[randomStep]] and [[simPrioritized]]'s seeded pick. */
  private def occurrenceAt(matches: DataFrame, i: Long): org.apache.spark.sql.Row = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("agent"), col("target"))
    matches.withColumn("rn", row_number().over(w))
      .filter(col("rn") === i + 1).collect()(0)
  }

  /** BRS `random_step` (builder.mli:129-133): apply one occurrence chosen
    * uniformly by a SEEDED pick over the canonical order (determinism rule
    * §7.5 replaces the reference's Random.self_init). Occurrences are
    * COUNTED on executors and only the chosen row is collected — O(1)
    * driver rows regardless of match-set size. floorMod, not .abs:
    * Long.MinValue.abs is negative. */
  def randomStep(s: BigraphState, matches: DataFrame, seed: Long): Option[BigraphState] = {
    val n = matches.count()
    if (n == 0) None
    else {
      val r = occurrenceAt(matches,
        math.floorMod(graft.synth.SynthWorld.mix(seed), n))
      Some(reparent(s, r.getLong(0), r.getLong(1)))
    }
  }

  /** Distributed canonical identity of a state: an ORDER-INDEPENDENT
    * digest — (sum, bit_xor, count) of per-row xxhash64 over the places
    * relation, the same triple over the contacts relation — computed on
    * EXECUTORS, so exactly one scalar row reaches the driver per candidate
    * state. Node ids are stable across reactions (rewrites only change
    * parent pointers / add links), so two states are isomorphic for BRS
    * purposes iff their row multisets are equal (SURVEY.md §2.9); the
    * digest is a hash of that multiset. The round-3 shape collected every
    * `places` row of every candidate (at Berlin scale, GBs per bfs
    * expansion); now full rows are collected only for states seen for the
    * FIRST time ([[canon]] — instrumented by [[fullStateCollects]]).
    *
    * The sum rides a DECIMAL(38,0) (a Long sum of xxhash64 values
    * overflows, which ANSI mode makes a job-killing error). The xor runs
    * over a SECOND, independent hash (a constant extra column changes
    * xxhash64's output completely) — sum and xor of the same hash would
    * give only ~2⁻⁶⁴ resistance for two-row swaps; with independent
    * hashes + the exact row count the bound is ~2⁻¹²⁸ per comparison,
    * vanishing against maxStates ≤ 10⁶. */
  private case class StateDigest(pSum: BigInt, pXor: Long, pCnt: Long,
                                 cSum: BigInt, cXor: Long, cCnt: Long)

  private def stateDigest(s: BigraphState): StateDigest = {
    val r = s.places.agg(
        sum(xxhash64(col("id"), col("ctrl"), col("name"), col("parent"))
          .cast("decimal(38,0)")).as("ps"),
        expr("bit_xor(xxhash64(id, ctrl, name, parent, 7919))").as("px"),
        count(lit(1)).as("pc"))
      .crossJoin(s.contacts.agg(
        sum(xxhash64(col("agent_a"), col("agent_b")).cast("decimal(38,0)")).as("cs"),
        expr("bit_xor(xxhash64(agent_a, agent_b, 7919))").as("cx"),
        count(lit(1)).as("cc")))
      .collect()(0)
    def dec(i: Int): BigInt = // empty relation sums to null → 0
      if (r.isNullAt(i)) BigInt(0) else BigInt(r.getDecimal(i).toBigInteger)
    def lng(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    StateDigest(dec(0), lng(1), r.getLong(2), dec(3), lng(4), r.getLong(5))
  }

  /** Count of full-state row collects ([[canon]] calls) — bfs moves
    * O(distinct states) of these, NOT O(generated successors); asserted by
    * BrsSpec's driver-traffic test. */
  private[graft] val fullStateCollects = new java.util.concurrent.atomic.AtomicLong

  /** Full canonical rows of a state: sorted (id, ctrl, name, parent) +
    * sorted contact pairs, collected to the driver — called only for
    * digest-fresh states (exploration keeps whole kept states in driver
    * memory, as the reference does with its transition graph). */
  private def canon(s: BigraphState, dropCache: Boolean)
      : (Vector[(Long, String, String, Long)], Vector[(Long, Long)]) = {
    fullStateCollects.incrementAndGet()
    val p = s.places.select(col("id"), col("ctrl"), col("name"), col("parent")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toVector
    val c = s.contacts.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toVector
    // reparent marks its output cached; exploration materialized it via the
    // collect above — drop the blocks so bfs never accumulates caches
    // (dropCache=false for caller-owned states like s0, whose cache is not
    // ours to free)
    if (dropCache) s.places.unpersist(false)
    (p, c)
  }

  /** Rebuild a state from its canon as flat local relations — plan depth
    * O(1) regardless of how many reactions produced it, nothing cached. */
  private def ofCanon(spark: SparkSession,
                      k: (Vector[(Long, String, String, Long)], Vector[(Long, Long)])): BigraphState = {
    import spark.implicits._
    BigraphState(k._1.toDF("id", "ctrl", "name", "parent"),
      // junction edges are invariant under every reaction rule; bfs/sim
      // thread the initial state's frame through (see below)
      null, k._2.toDF("agent_a", "agent_b"))
  }

  /** The transition system explored by [[bfs]]: canonical states (index 0 =
    * s0) and labeled edges (fromState, ruleName, toState). `truncated` is
    * true when maxStates stopped the exploration (the reference's MAX
    * exception, builder.mli:139).
    *
    * PROBABILISTIC IDENTITY CONTRACT: state dedup runs on the executor-side
    * [[StateDigest]] (two independent xxhash64 streams + exact counts,
    * ~2⁻¹²⁸ collision odds per comparison — see [[stateDigest]]); a
    * colliding pair would silently merge two distinct states into one
    * node. At the bounded maxStates ≤ 10⁶ this engine explores, the union
    * bound stays below 10⁻²⁶ per exploration — accepted by design rather
    * than paying a full-row collect per GENERATED successor (the round-3
    * shape, O(successors × places) driver rows at Berlin scale). */
  case class TransitionGraph(states: IndexedSeq[BigraphState],
                             edges: Seq[(Int, String, Int)],
                             truncated: Boolean) {

    /** PRISM explicit-transition export (reference `to_prism`,
      * builder.mli:161-164): header `<#states> <#transitions>`, then one
      * `src dst` line per transition in canonical order. */
    def toPrism: String =
      (s"${states.length} ${edges.length}" +:
        // numeric (src, dst) order — a lexicographic string sort would put
        // "10 0" before "2 0" past ten states
        edges.map { case (f, _, t) => (f, t) }.sorted
          .map { case (f, t) => s"$f $t" }).mkString("", "\n", "\n")

    /** PRISM label export (reference `to_lab`, builder.mli:165): for each
      * named predicate, the states satisfying it —
      * `label "name" = x = 0 | x = 3;` lines, empty predicates omitted. */
    def toLab(predicates: Seq[(String, BigraphState => Boolean)]): String =
      predicates.flatMap { case (name, p) =>
        val sat = states.indices.filter(i => p(states(i)))
        if (sat.isEmpty) None
        else Some(s"""label "$name" = ${sat.map(i => s"x = $i").mkString(" | ")};""")
      }.mkString("", "\n", "\n")

    /** Graphviz export of the transition graph (reference `to_dot` over a
      * graph, builder.mli:166): states as circles, transitions labeled by
      * rule name. */
    def toDot(name: String = "brs"): String = {
      val sb = new StringBuilder(s"digraph $name {\n")
      for (i <- states.indices) sb.append(s"""  s$i [shape=circle label="$i"];\n""")
      for ((f, rule, t) <- edges) sb.append(s"""  s$f -> s$t [label="$rule"];\n""")
      sb.append("}\n")
      sb.toString
    }

    /** PRISM explicit state-reward export (reference `to_state_rewards`,
      * builder.mli:163). The reference bakes rewards into predicates at
      * parse time; here the caller passes (name, predicate, reward) and a
      * state's reward is the SUM over the predicates it satisfies. Format:
      * `<#states> <#nonzero-reward states>` then one `state reward` line
      * per nonzero state in state order (the PRISM .srew layout). */
    def toStateRewards(predicates: Seq[(String, BigraphState => Boolean, Long)]): String = {
      val rewards = states.indices.map(i =>
        i -> predicates.collect { case (_, p, r) if p(states(i)) => r }.sum)
        .filter(_._2 != 0L)
      (s"${states.length} ${rewards.length}" +:
        rewards.map { case (i, r) => s"$i $r" }).mkString("", "\n", "\n")
    }

    /** PRISM explicit transition-reward export (reference
      * `to_transition_rewards`, builder.mli:164). The reference takes each
      * reaction's reward label; here the caller maps rule name → reward
      * (absent rules reward 0). Format: `<#states> <#nonzero transitions>`
      * then `src dst reward` lines in the same numeric (src, dst) order as
      * [[toPrism]] — parallel edges (two rules joining the same state
      * pair) keep one line each, exactly as toPrism keeps both
      * transitions. */
    def toTransitionRewards(ruleRewards: Map[String, Long]): String = {
      val rewarded = edges
        .map { case (f, rule, t) => (f, t, ruleRewards.getOrElse(rule, 0L)) }
        .filter(_._3 != 0L)
        .sortBy(e => (e._1, e._2, e._3))
      (s"${states.length} ${rewarded.length}" +:
        rewarded.map { case (f, t, r) => s"$f $t $r" }).mkString("", "\n", "\n")
    }
  }

  /** BRS `bfs` (builder.mli:140-150): breadth-first exploration of the
    * reachable state space under named reparenting rules, with exact
    * canonical dedup (a state reached twice — e.g. enter then leave — is
    * ONE node of the transition graph). Bounded by `maxStates` and by
    * `maxOccurrencesPerRule` per expansion, so a large world cannot flood
    * the driver. Deterministic: rules fire in given order, occurrences in
    * canonical (agent, target) order. */
  def bfs(s0: BigraphState,
          rules: Seq[(String, BigraphState => DataFrame)],
          maxStates: Int = 256,
          maxOccurrencesPerRule: Int = 64): TransitionGraph =
    bfsPrioritized(s0, Seq(rules), maxStates, maxOccurrencesPerRule)

  /** [[bfs]] with the reference's priority classes (`p_class`,
    * builder.mli:105-123): at each state, the FIRST class (highest
    * priority) with any occurrence is the only one expanded — lower classes
    * are preempted. A flat rule list is one class of equal priority. */
  def bfsPrioritized(s0: BigraphState,
                     priorities: Seq[Seq[(String, BigraphState => DataFrame)]],
                     maxStates: Int = 256,
                     maxOccurrencesPerRule: Int = 64): TransitionGraph = {
    val sp = s0.spark
    val d0 = stateDigest(s0)
    val k0 = canon(s0, dropCache = false)
    val states = scala.collection.mutable.ArrayBuffer(ofCanon(sp, k0).copy(junctionEdges = s0.junctionEdges))
    val seen = scala.collection.mutable.HashMap(d0 -> 0)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int)]
    var truncated = false
    var frontier = List(0)
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer.empty[Int]
      for (si <- frontier) {
        // the applicable class: first one where any rule has an occurrence
        val expansions = priorities.iterator.map { cls =>
          cls.flatMap { case (name, matcher) =>
            step(states(si), matcher(states(si)), maxOccurrencesPerRule)
              .map(succ => (name, succ))
          }
        }.find(_.nonEmpty).getOrElse(Nil)
        for ((name, succ) <- expansions) {
          // identity check moves ONE scalar row; full rows are collected
          // only below, on first sight of the digest
          val dg = stateDigest(succ)
          seen.get(dg) match {
            case Some(ti) =>
              succ.places.unpersist(false) // reparent's cache, now dead
              edges += ((si, name, ti))
            case None if states.length >= maxStates =>
              succ.places.unpersist(false)
              truncated = true
            case None =>
              val ti = states.length
              states += ofCanon(sp, canon(succ, dropCache = true))
                .copy(junctionEdges = s0.junctionEdges)
              seen(dg) = ti
              edges += ((si, name, ti))
              next += ti
          }
        }
      }
      frontier = next.toList
    }
    TransitionGraph(states.toIndexedSeq, edges.toSeq, truncated)
  }

  /** BRS `sim` (builder.mli:152-160): seeded random walk — at each step all
    * rule occurrences are enumerated in canonical order and ONE is chosen
    * uniformly by the seeded mix (determinism rule §7.5 replaces the
    * reference's Random.self_init). Stops at `steps` or at deadlock (no
    * occurrence — the reference's DEADLOCK). Returns the final state, the
    * number of steps taken, and the trace of fired rule names. */
  def sim(s0: BigraphState,
          rules: Seq[(String, BigraphState => DataFrame)],
          steps: Int, seed: Long,
          maxOccurrencesPerRule: Int = 1024): (BigraphState, Int, Seq[String]) =
    simPrioritized(s0, Seq(rules), steps, seed, maxOccurrencesPerRule)

  /** [[sim]] with priority classes: each step draws uniformly from the
    * highest-priority class that has an occurrence (builder.mli:105-123,
    * 152-160). */
  def simPrioritized(s0: BigraphState,
                     priorities: Seq[Seq[(String, BigraphState => DataFrame)]],
                     steps: Int, seed: Long,
                     maxOccurrencesPerRule: Int = 1024): (BigraphState, Int, Seq[String]) = {
    var s = s0
    var t = 0
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    var dead = false
    // deferred frees, same discipline as fix(): a state's cache only
    // materializes at the NEXT iteration's matcher collect, so superseded
    // frames free one step late and every materialization stays one-hop
    var pending: List[DataFrame] = Nil
    while (t < steps && !dead) {
      val sNow = s
      // ONE-ROW seeded pick: occurrences are COUNTED per rule on executors
      // (capped at maxOccurrencesPerRule — the same canonical-prefix pool
      // the round-4 per-step collect drew from, so traces are bit-identical
      // on any seed); the active class is the first with any occurrence.
      // Counting is ONE grouped job per probed class (rule-tagged union +
      // groupBy(rule).count) — the round-5 shape ran one count JOB per
      // rule per class per step. Driver traffic per step: one scalar per
      // live rule + the single chosen occurrence row.
      val counted = priorities.iterator.map { cls =>
        val ms = cls.map { case (_, matcher) => matcher(sNow) }
        val countsByRule =
          if (ms.isEmpty) Map.empty[Int, Long]
          else ms.iterator.zipWithIndex
            .map { case (m, ri) => m.select(lit(ri).as("rule")) }
            .reduce(_ unionByName _)
            .groupBy(col("rule")).agg(count(lit(1)).as("c"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        cls.iterator.zipWithIndex.flatMap { case ((name, _), ri) =>
          countsByRule.get(ri).filter(_ > 0)
            .map(c => (name, ms(ri), math.min(c, maxOccurrencesPerRule.toLong)))
        }.toList
      }.find(_.nonEmpty).getOrElse(Nil)
      // the counts above materialized s → anything superseded before it is dead
      pending.foreach(_.unpersist(false))
      pending = Nil
      if (counted.isEmpty) dead = true
      else {
        val total = counted.map(_._3).sum
        var i = math.floorMod(graft.synth.SynthWorld.mix(seed ^ t.toLong), total)
        var ri = 0
        while (i >= counted(ri)._3) { i -= counted(ri)._3; ri += 1 }
        val name = counted(ri)._1
        val chosen = occurrenceAt(counted(ri)._2, i)
        val (agent, target) = (chosen.getLong(0), chosen.getLong(1))
        val nextState = reparent(s, agent, target)
        // same plan-collapse cadence as fix(): without it the stacked
        // point-update projections grow analysis cost unboundedly
        val (newState, superseded) =
          if ((t + 1) % CollapseEvery == 0)
            (nextState.copy(places = truncateLineage(nextState.places)),
              List(s.places, nextState.places))
          else (nextState, List(s.places))
        // frame-identity guards as in fix(): never the caller's s0 frame,
        // never a frame the new state still carries
        pending = superseded.distinct.filter(f =>
          (f ne s0.places) && (f ne newState.places))
        s = newState
        trace += name
        t += 1
      }
    }
    pending.foreach(_.unpersist(false))
    (s, t, trace.toSeq)
  }

  /** Truncate a DataFrame's logical plan without carrying stale constraints
    * (plain localCheckpoint's LogicalRDD keeps constraints that break later
    * unions — observed on Spark 4.1). */
  private def truncateLineage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema).cache()

  /** Plan-collapse cadence for the iterative loops ([[fix]]/[[sim]]/
    * [[rewritePrioritized]]): every 4 applications the stacked point-update
    * projections are truncated. 4, not the round-4 16: rule matchers
    * SELF-JOIN places, and optimizer constraint derivation over a deep
    * when-chain on both join sides grows super-linearly in chain depth —
    * at Dover scale (2.2k places, 5-rule probes) a 16-deep chain exhausted
    * an 8 GB driver, while depth ≤4 runs 50 applications in ~0.7 s/step
    * flat. */
  private val CollapseEvery = 4

  /** B7 fix: apply `rule` until no occurrence (bounded;
    * builder.mli:124-136). Every [[CollapseEvery]] steps the stacked point-update
    * projections are collapsed by materializing the plan — without this the
    * plan nests one `when` per step and analysis cost grows unboundedly.
    * Returns (state, stepsApplied). */
  def fix(s0: BigraphState, rule: BigraphState => Option[BigraphState],
          maxSteps: Int = 1000): (BigraphState, Int) = {
    var s = s0
    var n = 0
    var more = true
    // DEFERRED cache frees: a state's cache only materializes when the NEXT
    // rule application collects over it, so the superseded frames are freed
    // one rule application late — each materialization stays one-hop
    // incremental, and at most one superseded generation is ever pinned
    // (round-2 shape pinned one DataFrame per step for the session).
    var pending: List[DataFrame] = Nil
    while (more && n < maxSteps) rule(s) match {
      case Some(next) =>
        // rule(s) just collected over s → frames superseded BEFORE s are dead
        pending.foreach(_.unpersist(false))
        val (newState, superseded) =
          if ((n + 1) % CollapseEvery == 0) {
            val tr = next.copy(places = truncateLineage(next.places),
              contacts = truncateLineage(next.contacts))
            (tr, List(s.places, s.contacts, next.places, next.contacts))
          } else (next, List(s.places, s.contacts))
        // free only frames that are (a) not the caller's s0 frames and
        // (b) not shared with the new state — a rule that rewrites only one
        // frame (e.g. connectToNearbyAgent copies contacts, shares places)
        // carries the other frame forward BY REFERENCE; freeing it would
        // force every later collect to replay the stacked projections
        pending = superseded.distinct.filter(f =>
          (f ne s0.places) && (f ne s0.contacts) &&
            (f ne newState.places) && (f ne newState.contacts))
        s = newState
        n += 1
      case None =>
        // the final (matchless) rule application still collected over s
        pending.foreach(_.unpersist(false))
        pending = Nil
        more = false
    }
    pending.foreach(_.unpersist(false))
    (s, n)
  }

  /** BRS `rewrite` over a flat rule list (reference builder.mli:136
    * `rewrite : Big.t -> p_class list -> Big.t * int` with one class) —
    * see [[rewritePrioritized]]. */
  def rewrite(s0: BigraphState,
              rules: Seq[(String, BigraphState => DataFrame)],
              maxSteps: Int = 1000): (BigraphState, Int, Seq[String]) =
    rewritePrioritized(s0, Seq(rules), maxSteps)

  /** BRS `rewrite` (builder.mli:136): reduce `s0` to a fixpoint under
    * priority classes — the reference's main reduction entry point. Each
    * step re-scans the classes from the TOP: the first (highest-priority)
    * class with any occurrence fires, and within it the first rule in class
    * order applies its canonically-first occurrence (§7.5 determinism,
    * replacing the solver's unspecified order — the same class-preemption
    * rule as [[bfsPrioritized]], so a low-class rule never fires while any
    * higher-class rule still matches). Stops when no class has an
    * occurrence (the fixpoint) or at `maxSteps` (reparenting rule sets can
    * cycle — move_across is its own inverse — so the bound is load-bearing,
    * as in [[fix]]). Returns (final state, steps applied, fired-rule
    * trace); the reference returns the (state, steps) pair.
    *
    * Cache discipline is [[fix]]'s: deferred frees one application late,
    * plan collapse every [[CollapseEvery]] steps. */
  def rewritePrioritized(s0: BigraphState,
                         priorities: Seq[Seq[(String, BigraphState => DataFrame)]],
                         maxSteps: Int = 1000): (BigraphState, Int, Seq[String]) = {
    var s = s0
    var n = 0
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    var more = true
    var pending: List[DataFrame] = Nil
    val names = priorities.map(_.map(_._1))
    while (more && n < maxSteps) {
      val sNow = s
      // ONE probe job per step: every rule's matcher, tagged with its
      // (class, rule) indices, in one union; the (cls, rule, agent,
      // target) sort picks exactly the row the round-5 per-rule probe
      // loop found — classIdx leads, so class preemption is preserved (a
      // low-class rule never fires while any higher-class rule matches),
      // then rule order in class, then the canonical §7.5 occurrence.
      // The round-5 loop ran one limit(1) JOB per probed rule per step —
      // R × N driver-synchronized jobs over a fixpoint run.
      val taggedParts = priorities.iterator.zipWithIndex.flatMap { case (cls, ci) =>
        cls.iterator.zipWithIndex.map { case ((_, matcher), ri) =>
          matcher(sNow).select(col("agent"), col("target"))
            .withColumn("cls", lit(ci)).withColumn("rule", lit(ri))
        }
      }.toList
      val rows =
        if (taggedParts.isEmpty) Array.empty[org.apache.spark.sql.Row]
        else taggedParts.reduce(_ unionByName _)
          .orderBy(col("cls"), col("rule"), col("agent"), col("target"))
          .limit(1).collect()
      // the probe above materialized s → frames superseded before it are dead
      pending.foreach(_.unpersist(false))
      pending = Nil
      (if (rows.isEmpty) None
       else Some((names(rows(0).getInt(2))(rows(0).getInt(3)), rows))) match {
        case Some((name, rows)) =>
          val nextState = reparent(sNow, rows(0).getLong(0), rows(0).getLong(1))
          // collapse every CollapseEvery (a shared 4, same as fix):
          // rewrite PROBES up to every rule per step, and optimizer
          // constraint derivation on a deep when-chain SELF-JOIN
          // (leave/enter match both sides of places⋈places) grows
          // super-linearly in chain depth — at Dover scale a 16-deep
          // chain exhausted an 8 GB driver
          val (newState, superseded) =
            if ((n + 1) % CollapseEvery == 0)
              (nextState.copy(places = truncateLineage(nextState.places)),
                List(sNow.places, nextState.places))
            else (nextState, List(sNow.places))
          pending = superseded.distinct.filter(f =>
            (f ne s0.places) && (f ne newState.places))
          s = newState
          trace += name
          n += 1
        case None =>
          more = false
      }
    }
    pending.foreach(_.unpersist(false))
    (s, n, trace.toSeq)
  }
}
