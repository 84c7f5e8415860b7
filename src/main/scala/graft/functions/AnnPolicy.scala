package graft.functions

/** The ANN ladder's SERVING-POLICY surface in one place (r18, VERDICT
  * task 2): each rung's serving constants (quantizer shape, probe/walk
  * parameters, rerank depth), its cross-scale certified recall floor,
  * and its closed-form work-unit cost — defined ONCE and read by
  *
  *  - the rung implementations (`SparkEntry.queries` call sites and
  *    `Similarity.annRecall`'s harness trainings),
  *  - the engine side of `q_ann_frontier`, and
  *  - the DuckDB oracle (the cost CASE is GENERATED from the same
  *    expression tree via [[Cost.sql]]).
  *
  * Before this, the frontier hand-duplicated m/ksub/L/probe literals in
  * both the Scala cost map and the SQL mirror; r17 re-pointed
  * `q_ivfpq_auto` and had to re-sync them by hand — a silent mis-rank
  * risk for the policy surface. Now a re-point is one edit here.
  *
  * Cost arithmetic (r17 ADVICE): evaluated in DOUBLE with a clamp at
  * 2^62 on BOTH sides — Scala `Long` wraps silently around n≈3e9 in
  * terms like 64·q·n (q≈n/100) while DuckDB BIGINT arithmetic raises,
  * so at extreme corpus scale the engine and oracle diverged (wrong
  * frontier vs query error). Every term is a product/sum/floor-div of
  * integers, so double arithmetic is EXACT below 2^53 — far above any
  * gated SF — and identical IEEE expression trees on both sides keep
  * the clamp bit-identical beyond it.
  */
object AnnPolicy {

  // ---------------------------------------------------------------
  // serving constants (the re-pointable knobs)
  // ---------------------------------------------------------------

  /** top-k depth served by every rung and the recall harness. */
  val k = 10

  /** exact-rerank candidate pool depth (`*_rerank` rungs). */
  val rerankPool = 50

  /** embeddings dimensionality — SQ8's per-dim code scan cost. */
  val dims = 64

  /** harness LSH: 4 hyperplane bits (16 buckets), 1 bucket + `bits`
    * Hamming-1 probes; multi-probe form runs `tables` tables. */
  val harnessLshBits = 4
  val harnessLshTables = 4

  /** harness flat IVF: 16 cells, 4 probed. The cell count must equal
    * the LSH table count 2^bits: the cost model's shared `b16` symbol
    * is max(1, n / harnessIvfCells) — ONE bucket-size number serving
    * both rungs (enforced below so a re-point cannot desync them). */
  val harnessIvfCells = 16
  val harnessIvfProbe = 4
  require(harnessIvfCells == (1 << harnessLshBits),
    "harness IVF cell count and LSH bucket count must agree: the " +
      "b16 cost symbol is one bucket size shared by both rungs")

  /** PQ demo point (oracle-portability vehicle): m=2 subspaces of 4
    * codes; the high-fidelity gated point (q_pq_hi / q_pq_opq) is
    * m=16, ksub=64. */
  val pqDemoM = 2
  val pqDemoKsub = 4
  val pqHiM = 16
  val pqHiKsub = 64

  /** RQ demo point: L=2 additive stages of 4 codes. */
  val rqDemoL = 2
  val rqDemoK = 4

  /** IVFADC demo point: 4 cells, 2 probed, m=2 residual subspaces. */
  val ivfpqDemoCells = 4
  val ivfpqDemoProbe = 2
  val ivfpqDemoM = 2
  val ivfpqDemoKsub = 4

  /** IVFADC auto point (q_ivfpq_auto, r17 re-point): m=16 residual
    * subspaces of 64 codes on sqrt(n/64) cells with sqrt(c) probing. */
  val ivfpqAutoM = 16
  val ivfpqAutoKsub = 64

  /** IVF-RQ auto point: additive residual stage widths. r18 re-point
    * to 8 stages x 16 codes — the r17 lab table already showed L8x16
    * above the gated L4x64 at the same sqrt(c) probe budget, and the
    * tri-scale sweep confirms it at EVERY SF (0.26/0.40/0.17 vs
    * 0.18/0.30/0.13): finer additive refinement beats wider per-stage
    * codebooks at equal 2^32 code space. Serve cost is L LUT lookups
    * per candidate (8 vs 4 — reflected in the cost tree below). */
  val ivfrqAutoKs: Seq[Int] = Seq.fill(8)(16)

  /** kNN-graph: per-node list depth and NN-descent round count; the
    * serving walk derives beam/hops from COUNT(*)
    * (`Similarity.autoGraphBeam` / `autoGraphHops`). */
  val kGraph = 10
  val graphRounds = 2

  // ---------------------------------------------------------------
  // cost expressions — one tree, two renderings
  // ---------------------------------------------------------------

  /** Closed-form integer work-unit cost over the frontier's derived
    * parameters. `eval` and `sql` recurse over the SAME tree, so the
    * engine and the DuckDB oracle compute identical numbers by
    * construction. Symbols (all BIGINT columns of the oracle's `prm`
    * CTE / entries of the engine's env map):
    *   n   corpus size              q    query count
    *   c   auto IVF cell count      p2   auto probe count (sqrt c)
    *   h   auto graph hops          bm   auto graph beam
    *   b16 harness bucket size max(1, n / harnessIvfCells)
    *       (= 2^harnessLshBits buckets — one number for both rungs)
    */
  sealed trait Cost {
    def +(o: Cost): Cost = Cost.Add(this, o)
    def *(o: Cost): Cost = Cost.Mul(this, o)
    /** integer floor division (both sides: floor over exact doubles). */
    def /(o: Cost): Cost = Cost.Div(this, o)

    def eval(env: Map[String, Long]): Long =
      math.min(Cost.capD, Cost.evalD(this, env)).toLong

    /** double-typed DuckDB expression, clamped and cast like `eval`. */
    def sql: String = s"CAST(LEAST(${Cost.capSql}, ${Cost.sqlD(this)}) AS BIGINT)"
  }

  object Cost {
    final case class Lit(v: Long) extends Cost
    final case class Sym(name: String) extends Cost
    final case class Add(a: Cost, b: Cost) extends Cost
    final case class Mul(a: Cost, b: Cost) extends Cost
    final case class Div(a: Cost, b: Cost) extends Cost

    /** clamp: 2^62 — exactly representable as a double on both sides. */
    private[AnnPolicy] val capD: Double = (1L << 62).toDouble
    private[AnnPolicy] val capSql: String = s"${1L << 62}.0"

    private[AnnPolicy] def evalD(e: Cost, env: Map[String, Long]): Double = e match {
      case Lit(v) => v.toDouble
      case Sym(s) => env(s).toDouble
      case Add(a, b) => evalD(a, env) + evalD(b, env)
      case Mul(a, b) => evalD(a, env) * evalD(b, env)
      case Div(a, b) => math.floor(evalD(a, env) / evalD(b, env))
    }

    private[AnnPolicy] def sqlD(e: Cost): String = e match {
      case Lit(v) => s"$v.0"
      case Sym(s) => s"CAST($s AS DOUBLE)"
      case Add(a, b) => s"(${sqlD(a)} + ${sqlD(b)})"
      case Mul(a, b) => s"(${sqlD(a)} * ${sqlD(b)})"
      case Div(a, b) => s"floor(${sqlD(a)} / ${sqlD(b)})"
    }
  }

  import Cost.{Lit => L, Sym}
  private val n = Sym("n"); private val q = Sym("q")
  private val c = Sym("c"); private val p2 = Sym("p2")
  private val h = Sym("h"); private val bm = Sym("bm")
  private val b16 = Sym("b16")

  /** One ANN rung: its harness/query method name, the cross-scale
    * CERTIFIED recall floor in milli-recall (the minimum of the per-SF
    * half-measured floors — the recall a serving policy can RELY on at
    * any gated scale), and its serve-time cost expression. */
  final case class AnnRung(method: String, floorMilli: Long, cost: Cost)

  /** The frontier's rung table. Floors are re-pinned when a rung
    * re-points (see BUILD_NOTES); cost constants reference the serving
    * vals above, so a re-point cannot leave the policy surface stale. */
  val rungs: Seq[AnnRung] = Seq(
    // bucket + `bits` Hamming-1 probes, each a b16-sized bucket scan
    AnnRung("lsh", 350L, q * L(harnessLshBits + 1) * b16),
    // `tables` tables, 1 bucket each
    AnnRung("lsh_multi", 380L, q * L(harnessLshTables) * b16),
    // cells centroid distances + probed-cell scans
    AnnRung("ivf", 420L,
      q * L(harnessIvfCells) + q * L(harnessIvfProbe) * b16),
    AnnRung("pq", 7L, L(pqDemoM) * q * n),
    AnnRung("pq_rerank", 37L, L(pqDemoM) * q * n + L(rerankPool) * q),
    AnnRung("pq_hi", 220L, L(pqHiM) * q * n),
    AnnRung("pq_opq", 220L, L(pqHiM) * q * n),
    AnnRung("rq", 2L, L(rqDemoL) * q * n),
    AnnRung("rq_rerank", 25L, L(rqDemoL) * q * n + L(rerankPool) * q),
    // demo cells/probe: probe/cells of the corpus, m LUT lookups each
    AnnRung("ivfpq", 7L,
      q * L(ivfpqDemoCells) +
        q * (n / L(ivfpqDemoCells / ivfpqDemoProbe)) * L(ivfpqDemoM)),
    AnnRung("ivfpq_rerank", 30L,
      q * L(ivfpqDemoCells) +
        q * (n / L(ivfpqDemoCells / ivfpqDemoProbe)) * L(ivfpqDemoM) +
        L(rerankPool) * q),
    AnnRung("sq8", 700L, L(dims) * q * n),
    AnnRung("sq8_rerank", 900L, L(dims) * q * n + L(rerankPool) * q),
    AnnRung("ivfpq_auto", 170L,
      q * c + q * p2 * (n / c) * L(ivfpqAutoM)),
    // L LUT lookups per candidate in the probed cells
    AnnRung("ivfrq_auto", 85L,
      q * c + q * p2 * (n / c) * L(ivfrqAutoKs.length)),
    // the node's own list: one lookup
    AnnRung("knn_graph", 57L, q * L(kGraph)),
    // beam walk: hops x beam nodes, kGraph edges each, + entry seeding
    AnnRung("knn_graph_search", 310L, q * (h * bm * L(kGraph) + bm)))

  /** Engine-side cost of one rung (clamped double eval — see header). */
  def costUnits(method: String, env: Map[String, Long]): Long =
    rungs.find(_.method == method)
      .getOrElse(throw new IllegalArgumentException(s"unknown rung $method"))
      .cost.eval(env)

  /** The oracle's `CASE m.method … END` over the same trees. */
  def costSqlCase: String =
    rungs.init.map(r => s"WHEN '${r.method}' THEN ${r.cost.sql}")
      .mkString("CASE m.method\n         ",
        "\n         ", s"\n         ELSE ${rungs.last.cost.sql} END")

  /** `(VALUES …)` floor table for the oracle (method, floor_milli). */
  def floorsSqlValues: String =
    rungs.map(r => s"('${r.method}', ${r.floorMilli})").mkString(", ")
}
