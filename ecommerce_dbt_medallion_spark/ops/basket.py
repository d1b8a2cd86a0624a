"""Market-basket analytics over the order/lineitem fact: co-purchase
pair counts, per-part top-k recommendations ("frequently bought
together"), and a fixed-point PageRank over the co-purchase graph
(product importance).

Reference analogue: the gold marts aggregate the same orders/payments
feed (models/gold/gold_customer_summary.sql); this module adds the
recommendation-side marts a production warehouse builds from the same
facts.

Scale shape:
- Pair generation is a self-join on ``order_id``. Baskets are bounded
  (TPC-H lineitem <= 7 rows/order; real carts are small constants), so
  the fan-out per order is a bounded constant and the join is one
  key-partitioned shuffle on order_id — linear in the fact, no skew
  beyond AQE's reach.
- Pair counting is one shuffle at (part_a, part_b) grain with map-side
  partial aggregation.
- Top-k per part uses a plain ``row_number`` window: the partition key
  (part_a) has catalog-scale cardinality, so partitions are tiny and
  balanced (the salted two-stage topk in ops/topk.py is for FEW-group
  skew, not needed here).
- PageRank runs in exact fixed-point integer arithmetic (micro-units,
  floor division) so every engine computes bit-identical ranks: rank
  sums are bigint adds (order-independent), never float accumulation.
  Iterations are a fixed unrolled count — the plan is a linear chain
  (each iteration's result is referenced exactly once), so Spark
  executes each stage once without checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.sources.registry import load_table

COPURCHASE_TOP_K = 5
PAGERANK_ITERS = 5
# Fixed-point scale: 1.0 == 1_000_000 micro-units.
PR_ONE = 1_000_000
PR_BASE = 150_000  # 0.15 * PR_ONE
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # 0.85 as an exact ratio


def _order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order_id, part_id) basket membership. Lazily
    checkpointed: both sides of the pair self-join read the SAME
    materialized distinct instead of re-running the scan+shuffle per
    side (same dedup-of-shared-subtrees trick as the gold marts)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("part_id"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_a < part_b, n_orders) co-occurrence counts."""
    parts = _order_parts(spark, sf_dir)
    a = parts.alias("a")
    b = parts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.part_id") < F.col("b.part_id")),
        )
        .groupBy(
            F.col("a.part_id").alias("part_a"),
            F.col("b.part_id").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
    )


def copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-COPURCHASE_TOP_K co-purchased parts per part, by co-occurrence
    count desc then partner id asc (unique total order)."""
    # both direction branches of the union read one materialized pair set
    pairs = copurchase_pairs(spark, sf_dir).localCheckpoint(eager=False)
    sym = pairs.select(
        F.col("part_a").alias("part_id"),
        F.col("part_b").alias("rec_part_id"),
        "n_orders",
    ).union(
        pairs.select(F.col("part_b"), F.col("part_a"), "n_orders")
    )
    w = Window.partitionBy("part_id").orderBy(
        F.desc("n_orders"), F.asc("rec_part_id")
    )
    return sym.withColumn("rec_rank", F.row_number().over(w).cast("long")).where(
        F.col("rec_rank") <= COPURCHASE_TOP_K
    )


ORACLE_COPURCHASE_PAIRS = """
with basket as (
    select distinct l_orderkey as order_id, l_partkey as part_id from lineitem
)
select a.part_id as part_a, b.part_id as part_b, count(*) as n_orders
from basket a
join basket b on a.order_id = b.order_id and a.part_id < b.part_id
group by 1, 2
"""


def oracle_copurchase_topk() -> str:
    return f"""
with pairs as materialized ({ORACLE_COPURCHASE_PAIRS}),
sym as (
    select part_a as part_id, part_b as rec_part_id, n_orders from pairs
    union all
    select part_b, part_a, n_orders from pairs
)
select part_id, rec_part_id, n_orders, rec_rank from (
    select part_id, rec_part_id, n_orders,
        cast(row_number() over (
            partition by part_id order by n_orders desc, rec_part_id
        ) as bigint) as rec_rank
    from sym
) where rec_rank <= {COPURCHASE_TOP_K}
"""


def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35e: per-part triangle count + local clustering coefficient over
    the undirected co-purchase graph.

    Triangle density distinguishes genuine product communities from
    star-shaped popularity (a hub co-bought with everything closes few
    triangles); the local clustering coefficient 2T/(deg·(deg−1)) is the
    standard graph feature alongside pagerank_parts.

    Enumeration uses DEGREE ORIENTATION (each undirected edge directed
    from its (deg, id)-smaller endpoint): every vertex's out-degree is
    O(sqrt(m)), so the wedge self-join — the only quadratic-per-key
    stage — is bounded by m^1.5 total wedges regardless of hub skew,
    where the naive id-ordered 3-way join blows up on a high-degree
    low-id vertex. Wedges close against the id-canonical undirected
    edge set (a broadcast-or-shuffle hash join on the (v, w) pair key).
    The oracle intentionally enumerates the naive id-ordered way: the
    triangle SET is orientation-invariant, so hash parity doubles as an
    equivalence proof of the oriented plan.
    """
    pairs = copurchase_pairs(spark, sf_dir)
    und = (
        pairs.select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    # Edge-centric enumeration: each oriented edge (u,v) contributes the
    # triangles {u,v,w} with w ∈ N+(u) ∩ N+(v). CPU is the same
    # Σdeg+² as a wedge self-join, but the EXCHANGES carry only edges
    # and adjacency arrays (total cells = m) — never the wedge set,
    # which is what the closing join would otherwise shuffle by (v,w).
    # Intersection output volume = actual triangles.
    adj = oriented.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("ns"))
    tri = (
        oriented.join(
            adj.select(F.col("src").alias("u_key"), F.col("ns").alias("ns_u")),
            F.col("src") == F.col("u_key"),
        )
        .join(
            adj.select(F.col("src").alias("v_key"), F.col("ns").alias("ns_v")),
            F.col("dst") == F.col("v_key"),
        )
        .select(
            F.col("src"),
            F.col("dst").alias("v"),
            F.explode(F.array_intersect("ns_u", "ns_v")).alias("w"),
        )
    )
    tri_nodes = (
        tri.select(F.explode(F.array("src", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nt = F.coalesce("n_triangles", F.lit(0)).cast("long")
    clustering = F.when(
        F.col("deg") >= 2,
        F.round(
            (nt * 2).cast("double") / (F.col("deg") * (F.col("deg") - 1)), 6
        ),
    ).otherwise(F.lit(0.0))
    return deg.join(tri_nodes, "node", "left").select(
        F.col("node").alias("part_id"),
        F.col("deg").cast("long").alias("degree"),
        nt.alias("n_triangles"),
        clustering.alias("clustering_r6"),
    )


def oracle_triangle_count_parts() -> str:
    return f"""
with pairs as materialized ({ORACLE_COPURCHASE_PAIRS}),
und as (select part_a as a, part_b as b from pairs),
deg as (
    select node, count(*) as deg from (
        select a as node from und union all select b from und
    ) group by node
),
tri as (
    select e1.a as x, e1.b as y, e2.b as z
    from und e1
    join und e2 on e2.a = e1.b
    join und e3 on e3.a = e1.a and e3.b = e2.b
),
tn as (
    select node, count(*) as n_triangles from (
        select x as node from tri
        union all select y from tri
        union all select z from tri
    ) group by node
)
select d.node as part_id,
    cast(d.deg as bigint) as degree,
    cast(coalesce(tn.n_triangles, 0) as bigint) as n_triangles,
    case when d.deg >= 2 then
        round(cast(coalesce(tn.n_triangles, 0) * 2 as double)
              / (d.deg * (d.deg - 1)), 6)
    else 0.0 end as clustering_r6
from deg d left join tn on tn.node = d.node
"""


def _symmetric_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both directions of the undirected co-purchase graph, distinct,
    eagerly checkpointed — ONE definition of the graph the iterative
    operators (pagerank, label propagation) walk (round-9 review: two
    verbatim copies were a silent-drift risk; if the edge definition
    ever changes, both operators and both oracles must move together).
    """
    pairs = copurchase_pairs(spark, sf_dir)
    # persist() a src-hash-partitioned layout instead of the former
    # eager localCheckpoint (round 14): a checkpointed RDD reports
    # UnknownPartitioning, so every LPA/pagerank round re-EXCHANGED the
    # full edge set (2.4M rows at sf0.1 — the big side) to join on src.
    # The cached plan keeps outputPartitioning=hash(src), so each
    # round's join satisfies its distribution from the cache and only
    # the node-grain labels/ranks side shuffles — one edges exchange
    # total instead of one per round (guide: share one exchange across
    # same-keyed operations). Same materialize-once semantics and the
    # same storage footprint as the checkpoint it replaces.
    return (
        pairs.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
        .union(pairs.select(F.col("part_b"), F.col("part_a")))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, "src")
        .sortWithinPartitions("src")
        .persist()
    )


# the oracle twin of _symmetric_edges (expects a `pairs` CTE in scope)
ORACLE_SYMMETRIC_EDGES = """
    select part_a as src, part_b as dst from pairs
    union
    select part_b, part_a from pairs
"""


def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected co-purchase graph, PAGERANK_ITERS
    fixed iterations, exact bigint micro-unit arithmetic.

    rank_0 = PR_ONE; rank_{i+1}(v) =
        PR_BASE + (85 * sum over in-neighbors u of (rank_i(u) div deg(u))) div 100

    Every node in the edge set has degree >= 1 (no dangling mass). The
    final column converts micro-units to a double score (single exact
    integer / constant division — engine-identical).
    """
    edges = _symmetric_edges(spark, sf_dir)
    deg = (
        edges.groupBy(F.col("src").alias("dnode"))
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(
        F.col("dnode").alias("node"), F.lit(PR_ONE).cast("long").alias("rank")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            ranks.join(deg, F.col("node") == F.col("dnode"))
            .join(edges, F.col("node") == F.col("src"))
            .select(
                F.col("dst").alias("cnode"),
                F.expr("rank div deg").alias("contrib"),
            )
        )
        ranks = contrib.groupBy(F.col("cnode").alias("node")).agg(
            (
                F.lit(PR_BASE)
                + F.expr(f"({PR_DAMP_NUM} * sum(contrib)) div {PR_DAMP_DEN}")
            ).alias("rank")
        )
    return ranks.select(
        F.col("node").alias("part_id"),
        F.col("rank").alias("rank_micro"),
        (F.col("rank") / F.lit(float(PR_ONE))).alias("pagerank"),
    )


def oracle_pagerank_parts() -> str:
    its = ""
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        its += f""",
r{i} as (
    select e.dst as node,
        cast({PR_BASE} + ({PR_DAMP_NUM} * sum(r.rank // d.deg)) // {PR_DAMP_DEN}
             as bigint) as rank
    from {prev} r
    join deg d on d.node = r.node
    join edges e on e.src = r.node
    group by e.dst
)"""
        prev = f"r{i}"
    return f"""
with pairs as materialized ({ORACLE_COPURCHASE_PAIRS}),
edges as ({ORACLE_SYMMETRIC_EDGES}),
deg as (select src as node, count(*) as deg from edges group by src),
r0 as (select node, cast({PR_ONE} as bigint) as rank from deg){its}
select node as part_id, rank as rank_micro,
    rank / {float(PR_ONE)} as pagerank
from {prev}
"""


# Minimum pair co-occurrence for a rule (prunes the 1-basket noise tail
# BEFORE the stats join, so the rule set — and the join input — scales
# with genuinely co-bought pairs, not with the pair universe).
RULE_MIN_PAIR = 2


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules with support / confidence / lift,
    both directions of every co-purchase pair.

    Ratios are arranged so each engine performs EXACT bigint products
    first and ONE IEEE double division last (same recipe as bm25's
    log-free idf): support = n_both/n_baskets, confidence = n_both/n_ante,
    lift = (n_both*n_baskets)/(n_ante*n_cons) — all integer-exact until
    the final divide, so lift > 1 is a bit-portable comparison.

    Scale shape: pair counts come from copurchase_pairs (one bounded
    basket self-join); per-part basket counts are a partial-aggregated
    groupBy at catalog grain; the grand basket total is a single-row
    broadcast. The rule⋈part-count joins key on part id (catalog
    cardinality — balanced, AQE-broadcastable when the catalog is small
    relative to the rule set).
    """
    parts = _order_parts(spark, sf_dir).localCheckpoint(eager=False)
    pairs = (
        copurchase_pairs(spark, sf_dir)
        .where(F.col("n_orders") >= RULE_MIN_PAIR)
        .localCheckpoint(eager=False)
    )
    part_counts = parts.groupBy("part_id").agg(F.count(F.lit(1)).alias("n_part"))
    totals = parts.agg(F.countDistinct("order_id").alias("n_baskets"))
    sym = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        F.col("n_orders").alias("n_both"),
    ).union(
        pairs.select(F.col("part_b"), F.col("part_a"), F.col("n_orders"))
    )
    joined = (
        sym.join(
            part_counts.select(
                F.col("part_id").alias("antecedent"), F.col("n_part").alias("n_ante")
            ),
            "antecedent",
        )
        .join(
            part_counts.select(
                F.col("part_id").alias("consequent"), F.col("n_part").alias("n_cons")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(totals))
    )
    return joined.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_ante",
        "n_cons",
        "n_baskets",
        (F.col("n_both").cast("double") / F.col("n_baskets").cast("double")).alias(
            "support"
        ),
        (F.col("n_both").cast("double") / F.col("n_ante").cast("double")).alias(
            "confidence"
        ),
        (
            (F.col("n_both") * F.col("n_baskets")).cast("double")
            / (F.col("n_ante") * F.col("n_cons")).cast("double")
        ).alias("lift"),
    )


def oracle_association_rules() -> str:
    return f"""
with basket as (
    select distinct l_orderkey as order_id, l_partkey as part_id from lineitem
),
pairs as (
    select a.part_id as part_a, b.part_id as part_b, count(*) as n_orders
    from basket a
    join basket b on a.order_id = b.order_id and a.part_id < b.part_id
    group by 1, 2
    having count(*) >= {RULE_MIN_PAIR}
),
part_counts as (
    select part_id, count(*) as n_part from basket group by 1
),
totals as (
    select count(distinct order_id) as n_baskets from basket
),
sym as (
    select part_a as antecedent, part_b as consequent, n_orders as n_both from pairs
    union all
    select part_b, part_a, n_orders from pairs
)
select s.antecedent, s.consequent, s.n_both,
    pa.n_part as n_ante, pc.n_part as n_cons, t.n_baskets,
    cast(s.n_both as double) / cast(t.n_baskets as double) as support,
    cast(s.n_both as double) / cast(pa.n_part as double) as confidence,
    cast(s.n_both * t.n_baskets as double)
        / cast(pa.n_part * pc.n_part as double) as lift
from sym s
join part_counts pa on pa.part_id = s.antecedent
join part_counts pc on pc.part_id = s.consequent
cross join totals t
"""


KCORE_K = 3
KCORE_ROUNDS = 8  # fixed unrolled peel rounds (see docstring)


def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core of the co-purchase graph (k=KCORE_K): the maximal
    subgraph where every part has ≥ k co-purchase partners — the dense
    product communities that survive when star-shaped popularity is
    peeled away (triangle_count_parts' structural sibling).

    SEMANTICS NOTE (what makes this value-oracle-able): the operator is
    defined as KCORE_ROUNDS fixed rounds of degree-peeling, not
    run-to-fixpoint — both engines execute the identical bounded
    computation (Spark: an unrolled checkpoint-per-round loop; DuckDB:
    unrolled CTEs), so hash parity is exact. Peeling converges when a
    round removes nothing, after which further rounds are idempotent —
    the convergence is ASSERTED in tests (rounds-1 == rounds output at
    smoke SF), so on this data the result IS the true k-core; at a
    scale where 8 rounds stopped converging the operator reports the
    8-round peel, a documented upper bound on the core.

    Scale shape: each round is one degree aggregation + two semi-joins
    keyed on node ids — O(m) per round, O(rounds·m) total; surviving
    node sets shrink monotonically and are lazily checkpointed so no
    round replays prior rounds' joins.

    DATA NOTE: the driver's co-purchase graph is dense and degree-
    uniform (median pair-degree ~90–120 at every SF), so the 3-core
    retains nearly every node here — and raising k toward the median
    empties it entirely after cascade (measured: k = 0.9·median → ∅;
    the sharp core-collapse of near-random graphs). The peeling
    SEMANTICS are therefore proven on planted star+clique graphs in
    tests, where the star peels and the clique survives; on real
    co-purchase data (power-law degrees) intermediate cores are
    non-trivial and this operator finds them.
    """
    edges = (
        copurchase_pairs(spark, sf_dir)
        .select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        .localCheckpoint(eager=False)
    )
    cur = edges
    for _ in range(KCORE_ROUNDS):
        deg = (
            cur.select(F.col("a").alias("node"))
            .union(cur.select(F.col("b")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            # one materialization feeds BOTH the convergence test and
            # the round's semi-joins — without it the removed-count
            # action and the joins would each recompute the aggregate
            .localCheckpoint(eager=True)
        )
        # Provable-fixpoint early exit, now tested BEFORE the round's
        # joins (VERDICT r14 #6): zero below-k nodes means the keep set
        # is every node of cur, the semi-joins are the identity, and
        # every remaining round is idempotent — the 8-round output is
        # ALREADY cur (value parity with the fully-unrolled oracle is
        # untouched). The previous shape detected convergence one round
        # LATE (it compared edge counts after the joins), paying a full
        # round of semi-joins + checkpoint purely to observe no change.
        # The count is a metadata-scale action over the degree
        # checkpoint just materialized.
        if deg.where(F.col("deg") < KCORE_K).count() == 0:
            break
        keep = deg.where(F.col("deg") >= KCORE_K).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    return (
        cur.select(F.col("a").alias("part_id"))
        .union(cur.select(F.col("b")))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


def oracle_kcore_parts() -> str:
    # AS MATERIALIZED on every round: without it DuckDB inlines each
    # CTE at every reference site and the chain re-expands the base
    # scan ~3^rounds times (the same pitfall the round-6b recursive
    # oracles hit — here it surfaced as "Too many open files")
    ctes = [f"e0 as materialized (select part_a as a, part_b as b from pairs)"]
    for i in range(1, KCORE_ROUNDS + 1):
        ctes.append(
            f"""d{i} as materialized (
    select node from (
        select a as node from e{i - 1} union all select b from e{i - 1}
    ) group by node having count(*) >= {KCORE_K}
),
e{i} as materialized (
    select e.a, e.b from e{i - 1} e
    join d{i} da on e.a = da.node
    join d{i} db on e.b = db.node
)"""
        )
    chain = ",\n".join(ctes)
    return f"""
with pairs as materialized ({ORACLE_COPURCHASE_PAIRS}),
{chain}
select part_id, cast(count(*) as bigint) as core_degree
from (
    select a as part_id from e{KCORE_ROUNDS}
    union all
    select b from e{KCORE_ROUNDS}
)
group by part_id
"""


LPA_ROUNDS = 4


def label_propagation_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (community detection) over the
    undirected co-purchase graph, LPA_ROUNDS fixed rounds, fully
    deterministic: label_0(v) = v; label_{i+1}(v) = the most frequent
    label among v's neighbors, ties broken by SMALLEST label — an
    (count desc, label asc) argmax both engines compute identically
    (classic LPA's random tie-break can't cross engines). Returns each
    part's final community label and the community sizes.

    Scale shape (the pagerank sibling's): each round is one
    edges ⋈ labels join shuffled on node ids + one two-key aggregation
    — O(m) per round, O(rounds·m) total; labels are lazily checkpointed
    per round so no round replays prior rounds' joins. The argmax is a
    max-of-struct aggregation (map-side combinable), never a window
    over the node grain.
    """
    edges = _symmetric_edges(spark, sf_dir)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        neigh = (
            edges.join(labels, F.col("src") == F.col("node"))
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (count desc, label asc) == max of (c, -label):
        # exact integer struct max, map-side combinable
        labels = (
            neigh.groupBy(F.col("dst").alias("node"))
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).cast("long").alias("label"))
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("community_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").cast("long").alias("part_id"),
            F.col("label").cast("long").alias("community"),
            F.col("community_size").cast("long").alias("community_size"),
        )
    )


def oracle_label_propagation_parts() -> str:
    its = ""
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        its += f""",
l{i} as materialized (
    select dst as node, label from (
        select e.dst, l.label,
            row_number() over (
                partition by e.dst
                order by count(*) desc, l.label asc) as rn
        from edges e
        join {prev} l on l.node = e.src
        group by e.dst, l.label
    ) where rn = 1
)"""
        prev = f"l{i}"
    return f"""
with pairs as materialized ({ORACLE_COPURCHASE_PAIRS}),
edges as materialized ({ORACLE_SYMMETRIC_EDGES}),
l0 as materialized (
    select distinct src as node, src as label from edges
){its},
sizes as (select label, count(*) as community_size from {prev} group by label)
select cast(l.node as bigint) as part_id,
    cast(l.label as bigint) as community,
    cast(s.community_size as bigint) as community_size
from {prev} l join sizes s on s.label = l.label
"""
