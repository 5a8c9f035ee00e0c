"""Event-analytics composites: funnel, cohort retention, TF-IDF.

The composite shapes a real pipeline runs daily over the events/
documents tables — each is pure DataFrame composition (windows +
aggregates + joins), exercising several §2.2 primitives together.

Scale notes: funnel and retention aggregate per user first (shrinking
to |users| rows) before any joins; TF-IDF joins per-token document
frequencies (|vocab| rows — broadcastable) against per-doc term counts.
Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import repartition_compute, table
from solarflare_etl_pipeline_spark.registry import register

#: In-order pair generator over a SORTED array column: all (x, y) with x
#: before y in the array, as src/dst structs. With a sorted-distinct
#: input (collect_set) this is exactly the src < dst pair set; with a
#: sorted multiset (collect_list) callers filter src < dst to drop
#: equal-value pairs, preserving cross-line multiplicity.
_PAIR_GEN_SQL = (
    "flatten(transform({col}, (x, i) -> "
    "transform(slice({col}, i + 2, size({col})), "
    "y -> struct(x AS src, y AS dst))))"
)


def copurchase_edges(li: DataFrame) -> DataFrame:
    """DISTINCT within-order part pairs (src < dst) — the co-purchase
    edge set the whole graph family shares.

    r13 rewrite (guide §2.4): one groupBy(l_orderkey) shuffle + an
    in-order pair generator replaces the lineitem SMJ self-join.
    Measured at sf0.1: 1.86s vs 2.42s noop (the self-join's two sort
    legs disappear; the generator is O(|order|²) per order with orders
    bounded at ~7 lines, so the explode stays scale-safe — no
    broadcast, no skew exposure beyond what the old join had).
    Row-identical to the self-join form (verified collect-equal at
    sf0.1, 1.196M edges).
    """
    per = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        per.select(F.explode(F.expr(_PAIR_GEN_SQL.format(col="ps"))).alias("p"))
        .select("p.src", "p.dst")
        .distinct()
    )


# NOTE (r13): a counted-pair twin of copurchase_edges (collect_list +
# the same generator + groupBy count) was TRIED for the basket ops and
# REVERTED on measurement: 1.58s vs 1.30s noop at sf0.1 — those ops
# feed the join a DISTINCT (order, part) table, which makes the
# self-join cheap, while the array generator still pays interpreted
# HOF cost per pair. The basket self-joins stay as they were.


def _bcast_edges(df: DataFrame) -> DataFrame:
    """Broadcast-hint an EDGE-keyed frame of the co-purchase graph —
    gated, because edges are CORPUS-scale (VERDICT r13 #1).

    Unlike the node/label tables behind ``_bcast_nodes`` (bounded by the
    part dimension), the co-purchase edge set grows with the corpus:
    ~1.2M rows at sf0.1 (~19 MB hashed — past the 10 MB auto threshold,
    hence the explicit hint) but far beyond any broadcast at 100 TB.
    ``SOLARFLARE_GRAPH_BCAST=0`` swaps the hint for ``shuffle_merge``
    so the sort-merge (shuffle) plan positively returns — merely
    dropping the hint is not enough, because the checkpointed edge
    stats sit under the session's 64 MB auto-broadcast threshold and
    the planner re-broadcasts anyway (verified: the unhinted sf0.1
    plan is byte-identical to the hinted one). This is the documented
    fallback for deployments where the edge set outgrows executor
    memory; at that scale keep the broadcast plan per graph-partition
    (vertex-cut) or pre-filter with a bloom as the op docstrings
    note."""
    import os

    if os.environ.get("SOLARFLARE_GRAPH_BCAST", "1") != "0":
        return F.broadcast(df)
    return df.hint("shuffle_merge")


@register(
    "funnel_steps",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               COUNT(t_view) AS step_view,
               COUNT(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
               COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS step_purchase
        FROM per_user
    """,
    doc="Ordered funnel view→click→purchase: first-occurrence timestamps per user "
    "(one aggregation), then ordered-step counts. Per-user reduction happens before "
    "anything else — the scalable funnel shape.",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(
            F.when((F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_view")), 1)
        ).alias("step_purchase"),
    )


@register(
    "cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, CAST(DATE_TRUNC('week', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS active_week
            FROM events
        )
        SELECT f.cohort_week,
               CAST(DATE_DIFF('day', CAST(f.cohort_week AS DATE), CAST(a.active_week AS DATE)) / 7 AS BIGINT) AS week_offset,
               COUNT(*) AS n_active_users
        FROM firsts f JOIN activity a ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    doc="Cohort retention: users bucketed by first-seen week, counted per later active "
    "week. Two per-user aggregations + one equi join on user_id.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
    )


@register(
    "llm_tfidf",
    oracle="""
        WITH tokens AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tokens GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df
            FROM tokens GROUP BY token
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.token,
               tf.tf,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
        WHERE df.df < (SELECT n_docs FROM n)
    """,
    doc="TF-IDF term weighting: per-doc term counts ⋈ corpus document frequencies "
    "(|vocab| rows — broadcastable) × corpus size. ln() rounded to 6 decimals both "
    "sides (libm may differ in the last ulp). Tokens present in every document carry "
    "zero signal and are dropped.",
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = repartition_compute(table(spark, sf_dir, "documents"), "doc_id")
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar corpus size (one job; a literal thereafter)
    return (
        tf.join(F.broadcast(df.where(F.col("df") < n_docs)), "token")
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
        )
    )


PR_SCALE = 1_000_000_000  # fixed-point rank unit (1e-9 resolution)
PR_ITERS = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio


def _pagerank_oracle() -> str:
    it = """
        r{k} AS (
            SELECT n.pid,
                   CAST({base} + {dn} * COALESCE(s.contrib, 0) // {dd} AS BIGINT)
                       AS rank_fp
            FROM nodes n
            LEFT JOIN (
                SELECT e.dst AS pid,
                       SUM(r{p}.rank_fp // deg.out_deg) AS contrib
                FROM edges e
                JOIN r{p} ON r{p}.pid = e.src
                JOIN deg ON deg.pid = e.src
                GROUP BY e.dst
            ) s ON s.pid = n.pid
        )"""
    iters = ",".join(
        it.format(
            k=k,
            p=k - 1,
            base=f"((CAST({PR_SCALE} AS BIGINT) - CAST({PR_SCALE} AS BIGINT) * {PR_DAMP_NUM} // {PR_DAMP_DEN}) // (SELECT n_nodes FROM cnt))",
            dn=PR_DAMP_NUM,
            dd=PR_DAMP_DEN,
        )
        for k in range(1, PR_ITERS + 1)
    )
    return f"""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        nodes AS (SELECT DISTINCT src AS pid FROM edges),
        cnt AS (SELECT COUNT(*) AS n_nodes FROM nodes),
        deg AS (SELECT src AS pid, COUNT(*) AS out_deg FROM edges GROUP BY src),
        r0 AS (
            SELECT pid, CAST(CAST({PR_SCALE} AS BIGINT) // (SELECT n_nodes FROM cnt) AS BIGINT)
                       AS rank_fp
            FROM nodes
        ),
        {iters}
        SELECT pid AS part_id, rank_fp FROM r{PR_ITERS}
    """


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=f"Iterative PageRank over the part CO-PURCHASE graph (parts linked when "
    f"they appear in the same order — the co-occurrence graph item-embedding "
    f"and recommendation pipelines build from transaction logs), {PR_ITERS} "
    f"Jacobi iterations at damping 0.85. Arithmetic is FIXED-POINT integer "
    f"(ranks in 1e-9 units, DIV for every division): float PageRank sums "
    f"contributions in partition order and no two engines associate alike, "
    f"while integer arithmetic is exact — so the driver can hash-verify an "
    f"ITERATIVE graph algorithm, which float formulations never allow. Plan "
    f"per iteration: edges ⋈ ranks (shuffle on src) → partial-agg on dst → "
    f"left join nodes; lineage truncated with localCheckpoint per round (the "
    f"llm_dedup_cluster discipline). The graph is symmetric ⇒ no dangling "
    f"nodes. At 100 TB: ranks and degree co-partition on pid across "
    f"iterations (one persistent shuffle key), edges are the big static side "
    f"— the same shape GraphX/Pregel lowers to.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # the != self-join's row set == both orientations of the distinct
    # src < dst pair set — build the ordered edges once and symmetrize.
    # Checkpoint the ORDERED set FIRST (ADVICE r13): Catalyst does not
    # CSE identical subtrees across union legs, so symmetrizing the raw
    # subtree would put the whole pair build in both legs of the
    # checkpoint job (Exchange reuse usually rescues it, but it is
    # plan-fragile) — the k_core/cc pattern.
    und = copurchase_edges(l).localCheckpoint()
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("pid")).distinct().localCheckpoint()
    n_nodes = nodes.count()  # one scalar (graph size), reused as a literal
    if n_nodes == 0:
        # empty graph (no co-purchases — e.g. an empty partition): the
        # rank equations are vacuous; return the empty typed result
        # rather than divide by zero in the base-rank literal
        return spark.createDataFrame([], "part_id long, rank_fp long")
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    base = (PR_SCALE - PR_SCALE * PR_DAMP_NUM // PR_DAMP_DEN) // n_nodes
    ranks = nodes.select("pid", F.lit(PR_SCALE // n_nodes).alias("rank_fp"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["pid"])
            .join(deg, "src")
            .select("dst", F.expr("rank_fp DIV out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["pid"] == contrib["dst"], "left")
            .select(
                "pid",
                (
                    F.lit(base)
                    + F.expr(f"{PR_DAMP_NUM} * coalesce(contrib, 0L) DIV {PR_DAMP_DEN}")
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("pid").alias("part_id"), "rank_fp")


@register(
    "markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev_type
            FROM events
        ),
        c AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n_trans
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n_trans,
               CAST(n_trans * 1000000 //
                    CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
                    AS BIGINT) AS prob_ppm
        FROM c
    """,
    doc="First-order Markov transition matrix over per-user event streams "
    "(the session-flow model behind next-event prediction and anomalous-"
    "sequence detection): lag(event_type) over (user, ts, event_id) pairs "
    "each event with its predecessor, transitions are counted per "
    "(prev, next), and row-normalized probabilities are emitted in integer "
    "ppm (count*1e6 DIV row_total — exact, hash-stable; rule 13). Plan: one "
    "hash shuffle on user_id for the lag window, one partial+final agg down "
    "to |types|^2 rows, then a window over that tiny matrix. At 100 TB the "
    "only data-sized stage is the lag window, and event streams are "
    "naturally partitioned by user — no skew beyond the heaviest user.",
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n_trans"))
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.expr("CAST(n_trans * 1000000 DIV sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)").alias(
            "prob_ppm"
        ),
    )


@register(
    "graph_triangle_count",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        tri AS (
            SELECT e1.src AS pa, e1.dst AS pb, e2.dst AS pc
            FROM edges e1
            JOIN edges e2 ON e2.src = e1.dst
            JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ),
        member AS (
            SELECT pa AS part_id FROM tri
            UNION ALL SELECT pb FROM tri
            UNION ALL SELECT pc FROM tri
        )
        SELECT part_id, COUNT(*) AS n_triangles
        FROM member GROUP BY part_id
    """,
    doc="Per-node triangle counting over the part co-purchase graph (the "
    "clustering-coefficient numerator community detection and spam/fraud "
    "graph features start from). Edges are ORIENTED (src < dst) so each "
    "triangle {a<b<c} is enumerated exactly once as the wedge a->b->c "
    "closed by a->c — the standard node-iterator algorithm: edges ⋈ edges "
    "on the wedge pivot (shuffle on dst=src), then the closure test as a "
    "MAP-SIDE probe: the closing edge set packed to one BIGINT per edge "
    "and broadcast, so the ~40x wedge fan-out is never shuffled (measured "
    "4.5x end-to-end vs the equi-join form at sf0.1). Per-node counts come "
    "from a unioned projection of the three corners — all integer, hash-"
    "exact. At 100 TB: orientation bounds wedge fan-out by max out-degree "
    "in the DAG; production systems orient by (degree, id) so that bound "
    "is the graph arboricity (Chiba-Nishizeki) — noted here, id-orientation "
    "suffices for the fixture's near-uniform degrees. When the edge set "
    "outgrows a broadcast, partition the graph (vertex-cut) and keep this "
    "plan per partition, or fall back to the equi join behind a bloom "
    "prefilter; wedge generation stays a plain equi shuffle either way.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # localCheckpoint: edges feeds all THREE legs of the wedge join —
    # without lineage truncation the edge build + distinct re-executes
    # once per leg (measured 18s -> ~3s at sf0.1)
    edges = copurchase_edges(l).localCheckpoint()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    # Closing-edge check: the wedge join fans 1.2M edges out to ~50M
    # wedges (sf0.1); shuffling those 50M rows into a third sort-merge
    # join is the cost driver (measured 14s). Instead the closing edge
    # SET is packed to one BIGINT per edge (partkeys < 2^31) and
    # BROADCAST, turning the closure test into a map-side hash probe on
    # the wedge stream — wedges are never shuffled. The wedge join's
    # BUILD side is the same ~1.2M-row edge table, so it is broadcast
    # too (r13, guide §3.1): the whole wedge+closure pipeline becomes
    # one map-side pass over the checkpointed edges with two hash
    # probes — zero data-scale exchanges below the final aggregate.
    # At 100 TB the edge set outgrows a broadcast: both edge-table
    # hints are gated (_bcast_edges, VERDICT r13 #1) —
    # SOLARFLARE_GRAPH_BCAST=0 restores the shuffle-join plan; beyond
    # that, keep the broadcast plan per graph-partition (vertex-cut)
    # or fall back to the equi join with a bloom prefilter.
    ek = edges.select(
        (F.shiftleft(F.col("src"), 32).bitwiseOR(F.col("dst"))).alias("ek")
    )
    tri = (
        e1.join(_bcast_edges(e2), F.col("e2.src") == F.col("e1.dst"))
        .select(
            F.col("e1.src").alias("pa"),
            F.col("e1.dst").alias("pb"),
            F.col("e2.dst").alias("pc"),
        )
        .join(
            _bcast_edges(ek),
            F.shiftleft(F.col("pa"), 32).bitwiseOR(F.col("pc")) == F.col("ek"),
        )
        .drop("ek")
    )
    # One generator instead of a 3-way unionAll of the SAME subtree:
    # Catalyst does not de-duplicate common subtrees across union legs,
    # so the unionAll form executed the wedge join + closure probe
    # THREE times (plans/r13/graph_triangle_count_before.txt: the
    # SortMergeJoin/BroadcastHashJoin pipeline appears once per leg).
    # explode(array(pa, pb, pc)) emits the same three membership rows
    # from a single evaluation (guide §2.4: remove duplicated passes).
    member = tri.select(
        F.explode(F.array(F.col("pa"), F.col("pb"), F.col("pc"))).alias(
            "part_id"
        )
    )
    return member.groupBy("part_id").agg(F.count("*").alias("n_triangles"))


@register(
    "llm_keywords_topk",
    oracle="""
        WITH tokens AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tokens GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df
            FROM tokens GROUP BY token
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
            FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
            WHERE df.df < (SELECT n_docs FROM n)
        )
        SELECT doc_id, rk, token, tfidf
        FROM (
            SELECT doc_id, token, tfidf,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, token
                   ) AS BIGINT) AS rk
            FROM scored
        ) WHERE rk <= 3
    """,
    doc="Per-document keyword extraction: the top-3 TF-IDF terms of every "
    "document (the tagging/labeling primitive search indexes and topic "
    "dashboards consume). Reuses the llm_tfidf composition (per-doc term "
    "counts ⋈ broadcast vocab document-frequencies) and stacks a "
    "row_number window partitioned by doc_id — ordering on the ROUNDED "
    "6-decimal score with a token tiebreak, so rank order is identical "
    "across engines even at score ties (rule 7 + deterministic-order "
    "discipline). Plan: the window re-uses the tf stage's doc_id "
    "partitioning — one shuffle for tf, broadcast for df, zero extra "
    "exchange for the window; per-doc state is vocabulary-of-one-doc "
    "sized. At 100 TB this is the tfidf plan plus a free window.",
)
def llm_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = llm_tfidf(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.select(
            "doc_id", "token", "tfidf", F.row_number().over(w).cast("long").alias("rk")
        )
        .where(F.col("rk") <= 3)
        .select("doc_id", "rk", "token", "tfidf")
    )


@register(
    "graph_clustering_coeff",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        tri AS (
            SELECT e1.src AS pa, e1.dst AS pb, e2.dst AS pc
            FROM edges e1
            JOIN edges e2 ON e2.src = e1.dst
            JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ),
        member AS (
            SELECT pa AS part_id FROM tri
            UNION ALL SELECT pb FROM tri
            UNION ALL SELECT pc FROM tri
        ),
        tric AS (
            SELECT part_id, COUNT(*) AS n_triangles
            FROM member GROUP BY part_id
        ),
        und AS (
            SELECT src AS part_id, dst AS nb FROM edges
            UNION ALL SELECT dst, src FROM edges
        ),
        deg AS (
            SELECT part_id, COUNT(*) AS degree FROM und GROUP BY part_id
        )
        SELECT d.part_id, d.degree,
               CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
               CAST(COALESCE(t.n_triangles, 0) * 2000000
                    // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_ppm
        FROM deg d LEFT JOIN tric t USING (part_id)
        WHERE d.degree >= 2
    """,
    doc="Local clustering coefficient per node — triangles closed over "
    "wedges possible, THE cohesion feature community detection and "
    "fraud-ring scoring consume: cc = 2*tri/(deg*(deg-1)), emitted in "
    "integer ppm (numerator cross-multiplied, rule 22 — no float "
    "division). Composes the oriented triangle pipeline (broadcast-"
    "closure wedge join, see graph_triangle_count) with an undirected "
    "degree count (each oriented edge projected both ways, one agg); "
    "nodes of degree < 2 have no wedges and are excluded rather than "
    "divided by zero. All shuffles are the triangle pipeline's own plus "
    "one |V|-sized join — free relative to wedge generation at any "
    "scale.",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    tric = graph_triangle_count(spark, sf_dir)
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(l)
    und = edges.select(F.col("src").alias("part_id")).unionAll(
        edges.select(F.col("dst").alias("part_id"))
    )
    deg = und.groupBy("part_id").agg(F.count("*").alias("degree"))
    return (
        deg.join(tric, "part_id", "left")
        .where(F.col("degree") >= 2)
        .select(
            "part_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(COALESCE(n_triangles, 0) * 2000000"
                " DIV (degree * (degree - 1)) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )


BASKET_MIN_SUP = 3


@register(
    "basket_rules",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
        ic AS (
            SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY 1
        ),
        pairs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        pc AS (
            SELECT pa, pb, COUNT(*) AS n_ab
            FROM pairs GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUP}
        )
        SELECT pc.pa, pc.pb, pc.n_ab,
               ia.n_item AS n_a, ib.n_item AS n_b,
               CAST(pc.n_ab * 1000000 // (SELECT n_orders FROM n) AS BIGINT)
                   AS support_ppm,
               CAST(pc.n_ab * 1000000 // ia.n_item AS BIGINT) AS conf_a_to_b_ppm,
               CAST(pc.n_ab * 1000000 // ib.n_item AS BIGINT) AS conf_b_to_a_ppm,
               CAST(pc.n_ab * (SELECT n_orders FROM n) * 1000000
                    // (ia.n_item * ib.n_item) AS BIGINT) AS lift_ppm
        FROM pc
        JOIN ic ia ON ia.l_partkey = pc.pa
        JOIN ic ib ON ib.l_partkey = pc.pb
    """,
    doc=f"Association-rule mining over order baskets (the Apriori level-2 "
    f"support/confidence/lift every recommender and store-layout "
    f"analysis starts with): items deduped per basket, pair supports "
    f"from the oriented basket self-join (same blocking as the "
    f"co-purchase graph — pair cost scales with basket sizes, never "
    f"items²), rules below support {BASKET_MIN_SUP} pruned EARLY "
    f"(the Apriori downward-closure cut, applied before any metric "
    f"join), then support / both confidences / lift emitted in integer "
    f"ppm with divisions cleared (rule 22) — lift is the basket-level "
    f"sibling of llm_bigram_pmi's ratio. Item counts are a |items|-row "
    f"broadcast; the basket total is a driver scalar. One shuffle for "
    f"the basket join, one for the pair agg — at 100 TB both key on "
    f"basket/pair ids with no skew beyond the largest basket.",
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = l.select("l_orderkey").distinct().count()  # driver scalar
    ic = l.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    # counted pairs stay on the self-join form: the collect_list pair
    # generator was TRIED and measured SLOWER here (1.58s vs 1.30s noop
    # at sf0.1 — the distinct input makes the join cheap while the
    # array generator pays interpreted HOF cost; contrast
    # copurchase_edges, where dropping the join's sort legs wins)
    a, b = l.alias("a"), l.alias("b")
    pc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= BASKET_MIN_SUP)
    )
    ia = ic.select(F.col("l_partkey").alias("pa"), F.col("n_item").alias("n_a"))
    ib = ic.select(F.col("l_partkey").alias("pb"), F.col("n_item").alias("n_b"))
    return (
        pc.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .select(
            "pa",
            "pb",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(f"CAST(n_ab * 1000000 DIV {n_orders}L AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr("CAST(n_ab * 1000000 DIV n_a AS BIGINT)").alias("conf_a_to_b_ppm"),
            F.expr("CAST(n_ab * 1000000 DIV n_b AS BIGINT)").alias("conf_b_to_a_ppm"),
            F.expr(
                f"CAST(n_ab * {n_orders}L * 1000000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


@register(
    "funnel_sessionized",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tss,
                   CASE WHEN CAST(ts AS TIMESTAMP)
                             - LAG(CAST(ts AS TIMESTAMP)) OVER (
                                   PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
                             > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ),
        sess AS (
            SELECT user_id, event_type, tss,
                   CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY tss
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM marked
        ),
        per_sess AS (
            SELECT user_id, session_id,
                   MIN(CASE WHEN event_type = 'view' THEN tss END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN tss END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN tss END) AS t_purchase
            FROM sess GROUP BY 1, 2
        )
        SELECT COUNT(*) AS n_sessions,
               COUNT(t_view) AS sess_view,
               COUNT(CASE WHEN t_click > t_view THEN 1 END) AS sess_click,
               COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                     THEN 1 END) AS sess_purchase
        FROM per_sess
    """,
    doc="The ordered funnel at SESSION grain — per-user funnels "
    "(funnel_steps) overcount conversion when the view and the purchase "
    "are weeks apart; product analytics wants them inside one visit: "
    "30-minute-gap sessionization (lag + cumulative new-session sum, "
    "the win_sessionize construct) feeds the same first-occurrence "
    "ordered-step counting, now keyed by (user, session). All "
    "timestamps COPY inputs and every count is integer — hash-exact. "
    "Plan: one user_id shuffle shared by the lag window, the running "
    "sum, and the session aggregate; the final rollup is four counters. "
    "The two-operator composition (sessionize → funnel) runs as ONE "
    "lazy plan — the point of an engine over a script pipeline.",
)
def funnel_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        F.when(
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            - F.lag(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(wl)
            > 1_800_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("new_sess").over(wc).alias("session_id"),
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_sess.agg(
        F.count("*").alias("n_sessions"),
        F.count("t_view").alias("sess_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("sess_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("sess_purchase"),
    )


@register(
    "graph_jaccard_candidates",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUP}
        ),
        und AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
        common AS (
            SELECT p.pa, p.pb, COUNT(*) AS n_common
            FROM pairs p
            JOIN und x ON x.u = p.pa
            JOIN und y ON y.u = p.pb AND y.v = x.v
            GROUP BY 1, 2
        )
        SELECT p.pa, p.pb,
               CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
               da.d AS deg_a, db.d AS deg_b,
               CAST(COALESCE(c.n_common, 0) * 1000000
                    // (da.d + db.d - COALESCE(c.n_common, 0)) AS BIGINT)
                   AS jaccard_ppm
        FROM pairs p
        JOIN deg da ON da.u = p.pa
        JOIN deg db ON db.u = p.pb
        LEFT JOIN common c ON c.pa = p.pa AND c.pb = p.pb
    """,
    doc=f"Neighbor-set Jaccard similarity for CANDIDATE part pairs — the "
    f"item-item collaborative-filtering score ('parts bought alongside "
    f"the same other parts'), computed only for pairs that already "
    f"co-occur in >= {BASKET_MIN_SUP} baskets: all-pairs neighbor "
    f"intersection is wedge-quadratic, so candidates come from the "
    f"cheap basket-support prune first (the LSH-style generate-then-"
    f"verify discipline applied to graph similarity). Common-neighbor "
    f"counts are two equi joins of the candidate list against the "
    f"adjacency (each candidate touches only its own neighbor lists); "
    f"|union| = deg_a + deg_b - common by inclusion-exclusion — no "
    f"second set scan; the ratio is integer ppm (rule 22). At 100 TB "
    f"cost scales with candidates x avg degree, never |V|^2.",
)
def graph_jaccard_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    # ONE basket self-join; the undirected adjacency is the ordered pair
    # table symmetrized (a<b plus the swap = the distinct a<>b set) —
    # same rewrite as graph_adamic_adar, halves the self-join work.
    # (The collect_list pair generator was tried and measured slower
    # for counted pairs — see basket_rules.)
    a, b = l.alias("a"), l.alias("b")
    pairs_all = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint()  # feeds candidates AND the adjacency
    )
    pairs = pairs_all.where(F.col("n_ab") >= BASKET_MIN_SUP).select("pa", "pb")
    und = pairs_all.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(
        pairs_all.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    # r14 (VERDICT r13 #6, guide §2.4): adjacency-ARRAY form replaces
    # the wedge join. One groupBy(u) collect_set builds sorted neighbor
    # lists (und rows are distinct — pairs_all is a groupBy output —
    # so the set IS the neighborhood and its size the degree); the
    # candidate pairs then join the (node -> array) table twice and
    # n_common = size(array_intersect(...)) per pair. The old plan
    # shuffled the |cand| x avg-degree wedge stream AND the full 2|E|
    # adjacency through a second (pb, w) join. Measured in one session
    # interleaved: 3.46s -> 1.97s noop at sf0.1, collect-equal. NO
    # broadcast hint on the adjacency joins on purpose: the array
    # table's BYTES are edge-scale (O(|E|)), so the planner/AQE picks
    # broadcast only while runtime stats fit (hinted vs unhinted
    # measured a wash locally) and degrades to shuffle at 100 TB.
    adj = und.groupBy("u").agg(F.sort_array(F.collect_set("v")).alias("nbr"))
    aa = adj.select(F.col("u").alias("pa"), F.col("nbr").alias("na"))
    ab = adj.select(F.col("u").alias("pb"), F.col("nbr").alias("nb"))
    return (
        pairs.join(aa, "pa")
        .join(ab, "pb")
        .select(
            "pa",
            "pb",
            F.size(F.array_intersect("na", "nb")).cast("long").alias("n_common"),
            F.size("na").cast("long").alias("deg_a"),
            F.size("nb").cast("long").alias("deg_b"),
        )
        .select(
            "pa",
            "pb",
            "n_common",
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(n_common * 1000000"
                " DIV (deg_a + deg_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


@register(
    "agg_gini",
    oracle="""
        WITH spend AS (
            SELECT c.c_mktsegment AS segment, c.c_custkey,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT segment, cents,
                   CAST(ROW_NUMBER() OVER (PARTITION BY segment
                        ORDER BY cents, c_custkey) AS BIGINT) AS i
            FROM spend
        ),
        sums AS (
            SELECT segment, COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(cents AS DECIMAL(30,0))) AS VARCHAR)
                        AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(i * cents AS DECIMAL(38,0))) AS VARCHAR)
                        AS DOUBLE) AS six
            FROM ranked GROUP BY segment
        )
        SELECT segment, n,
               ROUND(2.0 * six / (n * sx) - (n + 1.0) / n, 6) AS gini
        FROM sums
    """,
    doc="Gini inequality index of customer spend per market segment — "
    "the concentration statistic behind 'top 1% of customers drive X% "
    "of revenue' dashboards, computed by the exact rank formula G = "
    "2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending-sorted spend "
    "(rank made total by the custkey tiebreak; equal values permute "
    "only within ties, and the formula is tie-invariant because "
    "sum(i*x) over a tie block is constant). Money stays integer "
    "cents, both big sums route through decimal accumulation, and the "
    "final expression is one shared double tree rounded to 6 — hash-"
    "exact. Plan: customer-key join aggregate, per-segment rank "
    "window, 5-group reduce. At 100 TB the per-segment sort is the "
    "cost (the same envelope as any exact order statistic); the "
    "sketch path is a quantile-bucketed Lorenz-curve approximation "
    "over approx_percentile bins (documented, not registered).",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    i = F.row_number().over(
        Window.partitionBy("segment").orderBy("cents", "c_custkey")
    ).cast("long")
    ranked = spend.select("segment", "cents", i.alias("i"))
    sums = ranked.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast("decimal(30,0)")).cast("double").alias("sx"),
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)"))
        .cast("double")
        .alias("six"),
    )
    n, sx, six = F.col("n"), F.col("sx"), F.col("six")
    return sums.select(
        "segment",
        "n",
        F.round(2.0 * six / (n * sx) - (n + 1.0) / n, 6).alias("gini"),
    )


#: First-digit Benford expectations in integer ppm (floor(log10(1+1/d)*1e6)),
#: hardcoded so neither engine's log implementation enters the hash.
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


@register(
    "dq_benford",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS d
            FROM orders WHERE o_totalprice >= 1
        ),
        expected(d, expected_ppm) AS (
            VALUES {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_PPM.items()))}
        ),
        counts AS (
            SELECT d, COUNT(*) AS n_orders FROM digits GROUP BY d
        ),
        tot AS (SELECT SUM(n_orders) AS n FROM counts)
        SELECT e.d AS first_digit,
               COALESCE(c.n_orders, 0) AS n_orders,
               CAST(COALESCE(c.n_orders, 0) * 1000000 // tot.n AS BIGINT)
                   AS observed_ppm,
               CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
               CAST(ABS(COALESCE(c.n_orders, 0) * 1000000 // tot.n
                        - e.expected_ppm) AS BIGINT) AS deviation_ppm
        FROM expected e LEFT JOIN counts c ON c.d = e.d, tot
    """,
    doc="Benford first-digit audit — the classic fabricated-data / "
    "unit-mixup detector for financial columns: observed first-"
    "significant-digit shares in integer ppm against the hardcoded "
    "Benford expectations floor(log10(1+1/d)*1e6) (constants inlined "
    "on BOTH sides so no engine's log() enters the hash; ppm by floor "
    "division, rule 16). The fixture's near-uniform synthetic prices "
    "should FAIL Benford loudly — large deviation_ppm IS the correct "
    "report, exactly what this monitor exists to flag. All nine rows "
    "emitted via a LEFT join from the expectation table so absent "
    "digits surface as 0-count rows rather than vanishing. Plan: "
    "narrow digit map + 9-group aggregate + one-row total broadcast — "
    "scan-bound at any scale.",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where("o_totalprice >= 1")
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("n_orders"))
    expected = spark.createDataFrame(
        sorted(_BENFORD_PPM.items()), "d int, expected_ppm long"
    )
    tot = counts.agg(F.sum("n_orders").alias("n")).withColumn("one", F.lit(1))
    obs_ppm = F.expr("COALESCE(n_orders, 0) * 1000000 DIV n")
    return (
        expected.join(counts, "d", "left")
        .withColumn("one", F.lit(1))
        .join(F.broadcast(tot), "one")
        .select(
            F.col("d").alias("first_digit"),
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            obs_ppm.cast("long").alias("observed_ppm"),
            F.col("expected_ppm").cast("long").alias("expected_ppm"),
            F.abs(obs_ppm - F.col("expected_ppm")).cast("long").alias("deviation_ppm"),
        )
    )


@register(
    "agg_rfm_segments",
    oracle="""
        WITH base AS (
            SELECT o_custkey AS c_custkey,
                   CAST(DATE_DIFF('day', MAX(CAST(o_orderdate AS TIMESTAMP)),
                        (SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) FROM orders))
                        AS BIGINT) AS recency_days,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, recency_days, frequency, monetary_cents,
               CAST(NTILE(5) OVER (ORDER BY recency_days DESC, c_custkey)
                    AS INT) AS r_score,
               CAST(NTILE(5) OVER (ORDER BY frequency, c_custkey) AS INT)
                   AS f_score,
               CAST(NTILE(5) OVER (ORDER BY monetary_cents, c_custkey) AS INT)
                   AS m_score,
               CAST(NTILE(5) OVER (ORDER BY recency_days DESC, c_custkey)
                    AS VARCHAR)
               || CAST(NTILE(5) OVER (ORDER BY frequency, c_custkey) AS VARCHAR)
               || CAST(NTILE(5) OVER (ORDER BY monetary_cents, c_custkey)
                       AS VARCHAR) AS rfm_code
        FROM base
    """,
    doc="RFM segmentation — the recency/frequency/monetary quintile "
    "scoring every CRM runs: per-customer recency in days from the "
    "corpus max date (self-contained; production passes 'today'), "
    "order count, and integer-cents spend, each NTILE(5)-scored with "
    "5=best (recency ranked DESC so the most recent purchase lands in "
    "bucket 5) and concatenated into the '555'-style code. NTILE made "
    "deterministic by the custkey tiebreak. r7 rewrite: each of the "
    "three NTILEs runs as a distributed exact rank (range-repartition "
    "on the score order + per-partition row_number + bounded offset "
    "join, plans/rank.py) + pure NTILE arithmetic — identical buckets "
    "to the oracle's global windows with no single-task sort, at any "
    "customer count and under any score skew (range boundaries are "
    "sampled, so a heavy-tailed monetary distribution still balances). "
    "The customer rollup is checkpointed once and feeds all three "
    "rank passes plus the final three custkey equi-joins.",
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("timestamp")).alias("maxd")
                 ).withColumn("one", F.lit(1))
    base = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("timestamp")).alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .withColumn("one", F.lit(1))
        .join(F.broadcast(maxd), "one")
        .select(
            "c_custkey",
            F.datediff(F.col("maxd"), F.col("last_order"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        # one materialization feeds three rank passes + three joins
        .localCheckpoint()
    )

    from solarflare_etl_pipeline_spark.plans.rank import exact_ntile, with_global_rank

    def quintile(order_cols, score_name: str) -> DataFrame:
        ranked = with_global_rank(base, order_cols, "rn", total_col="n")
        return ranked.select(
            "c_custkey",
            exact_ntile(F.col("rn"), F.col("n"), 5).cast("int").alias(score_name),
        )

    r = quintile([F.col("recency_days").desc(), F.col("c_custkey")], "r_score")
    f = quintile(["frequency", "c_custkey"], "f_score")
    m = quintile(["monetary_cents", "c_custkey"], "m_score")
    return (
        base.join(r, "c_custkey")
        .join(f, "c_custkey")
        .join(m, "c_custkey")
        .select(
            "c_custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r_score",
            "f_score",
            "m_score",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("rfm_code"),
        )
    )


K_CORE = 3          # peel to the 3-core
K_CORE_MAX_ROUNDS = 40  # safety bound; peeling converges in O(diameter)


@register(
    "graph_k_core",
    oracle=None,  # iterative fixpoint; pure-Python re-derivation in tests
    doc=f"k-core decomposition (k = {K_CORE}) of the part co-purchase "
    "graph by iterative peeling: repeatedly delete nodes with degree "
    f"< {K_CORE} until none remain — the standard subgraph-density "
    "primitive behind community seeds, spam rings, and graph "
    "sparsification. Same edge construction as graph_triangle_count "
    "(oriented co-purchase pairs, de-duplicated), then each round is "
    "one degree aggregate + one semi join against surviving nodes; "
    "the driver loop reads ONE convergence scalar per round (the "
    "llm_dedup_cluster discipline — no data ever collects) and each "
    "round localCheckpoints to cut the lineage. Rounds are bounded by "
    "the peeling depth (graph-dependent, typically << diameter); at "
    "100 TB each round is two shuffles on node id and the loop "
    "parallelizes per connected component for free since peeling is "
    "local. Output: surviving nodes with their in-core degree.",
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # both directions below so degree = COUNT(*) per node
    edges = copurchase_edges(l).localCheckpoint()
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    for _ in range(K_CORE_MAX_ROUNDS):
        deg = sym.groupBy("src").agg(F.count("*").alias("degree"))
        weak = deg.where(F.col("degree") < K_CORE)
        # ONE bounded scalar per round — the convergence check
        if weak.limit(1).count() == 0:
            return deg.select(
                F.col("src").alias("part_id"), F.col("degree").alias("core_degree")
            )
        keep = deg.where(F.col("degree") >= K_CORE).select("src")
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .localCheckpoint()
        )
    # ADVICE r6: nodes with degree >= K in an UNCONVERGED graph are not
    # the k-core (removals can still cascade) — failing loudly beats
    # returning a silently-wrong approximation.
    raise RuntimeError(
        f"graph_k_core did not converge within {K_CORE_MAX_ROUNDS} peeling "
        "rounds — raise K_CORE_MAX_ROUNDS (peeling depth exceeds the cap); "
        "the partial result is NOT a k-core and is deliberately not returned"
    )


STATIONARY_ITERS = 200  # power iterations; |states| is tiny so cost ~0


@register(
    "markov_stationary",
    oracle=None,  # fixed-point iteration; invariants pinned in tests
    doc="Stationary distribution of the event-type Markov chain "
    "(markov_transitions' payoff: long-run state occupancy — 'where do "
    "user journeys spend their time'). The transition matrix is "
    "STATE-COUNT-sized metadata (|event types|^2 counts), so one "
    "bounded collect brings it to the driver (the IVF-centroid "
    "discipline) and pi is power-iterated in exact-rational-free "
    "Python floats with a deterministic uniform start and fixed "
    "iteration count — no data-scale work after the one transition "
    "aggregate, which is the entire 100 TB cost. Rows carry pi plus "
    "the residual |pi P - pi| per state so the fixed point is "
    "queryable (pinned < 1e-9 in tests along with sum(pi) = 1).",
)
def markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarflare_etl_pipeline_spark.registry import REGISTRY

    trans = REGISTRY["markov_transitions"].spark(spark, sf_dir).collect()
    states = sorted({r.prev_type for r in trans} | {r.next_type for r in trans})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    row_tot = [0] * k
    for r in trans:
        row_tot[idx[r.prev_type]] += r.n_trans
    P = [[0.0] * k for _ in range(k)]
    for r in trans:
        P[idx[r.prev_type]][idx[r.next_type]] = r.n_trans / row_tot[idx[r.prev_type]]
    pi = [1.0 / k] * k
    for _ in range(STATIONARY_ITERS):
        nxt = [sum(pi[i] * P[i][j] for i in range(k)) for j in range(k)]
        s = sum(nxt)
        pi = [x / s for x in nxt]
    resid = [
        abs(sum(pi[i] * P[i][j] for i in range(k)) - pi[j]) for j in range(k)
    ]
    rows = [(states[j], pi[j], resid[j]) for j in range(k)]
    return spark.createDataFrame(
        rows, "event_type string, stationary_prob double, residual double"
    )


MSP_SCALE = 10**6   # fixed-point mass units for the stationary vector
MSP_ROUNDS = 3      # unrolled integer power-iteration rounds


def _markov_stationary_portable_oracle() -> str:
    """Unrolled integer power iteration over the transition counts —
    every step is floor arithmetic on exact BIGINTs (per-term
    pi_i * n_ij // tot_i, then mass renormalization raw_j * SCALE //
    sum(raw)), so the DuckDB and Spark vectors are bit-identical."""
    rounds = []
    prev = "p0"
    for r in range(1, MSP_ROUNDS + 1):
        rounds.append(f"""
        r{r} AS (
            SELECT c.next_type AS s,
                   CAST(SUM(CAST({prev}.pi AS HUGEINT) * c.n // tot.t)
                        AS BIGINT) AS raw
            FROM c
            JOIN {prev} ON {prev}.s = c.prev_type
            JOIN tot ON tot.prev_type = c.prev_type
            GROUP BY c.next_type
        ),
        p{r} AS (
            SELECT states.s,
                   CAST(COALESCE(r{r}.raw, 0) * {MSP_SCALE}
                        // (SELECT SUM(raw) FROM r{r}) AS BIGINT) AS pi
            FROM states LEFT JOIN r{r} ON r{r}.s = states.s
        )""")
        prev = f"p{r}"
    return f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev_type
            FROM events
        ),
        c AS (
            SELECT prev_type, event_type AS next_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t
            FROM c GROUP BY prev_type
        ),
        states AS (
            SELECT DISTINCT s FROM (
                SELECT prev_type AS s FROM c
                UNION SELECT next_type FROM c
            )
        ),
        k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
        p0 AS (
            SELECT s, CAST({MSP_SCALE} // k.k AS BIGINT) AS pi
            FROM states CROSS JOIN k
        ),{",".join(rounds)}
        SELECT p{MSP_ROUNDS}.s AS event_type,
               p{MSP_ROUNDS}.pi AS pi_fp,
               COALESCE(r{MSP_ROUNDS}.raw, 0) AS raw_mass
        FROM p{MSP_ROUNDS}
        LEFT JOIN r{MSP_ROUNDS} ON r{MSP_ROUNDS}.s = p{MSP_ROUNDS}.s
        ORDER BY event_type
    """


@register(
    "markov_stationary_portable",
    oracle=_markov_stationary_portable_oracle(),
    doc=f"PORTABLE fixed-point twin of markov_stationary (VERDICT r8 "
    f"task #5 — shrink the rows-only surface): the identical "
    f"power-iteration plan, but in EXACT integer arithmetic so the "
    f"driver hash certifies it cross-engine — pi starts uniform at "
    f"{MSP_SCALE} // k mass units, each of the {MSP_ROUNDS} rounds "
    f"applies the raw transition COUNTS with per-term floor division "
    f"(pi_i * n_ij // tot_i — the graph_hits renormalization "
    f"discipline) and renormalizes the total mass back to "
    f"{MSP_SCALE} with one more floor division. Output: the round-"
    f"{MSP_ROUNDS} fixed-point vector plus its pre-normalization "
    f"mass, both exact BIGINTs. Plan: the ONLY data-scale stage is "
    f"the lag-window transition aggregate (one shuffle on user_id); "
    f"the |types|^2 count matrix is bounded metadata, collected once "
    f"(the IVF-centroid discipline) and iterated in exact Python "
    f"ints — Python floor division on non-negative ints is "
    f"bit-identical to DuckDB HUGEINT '//'.",
)
def markov_stationary_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    trans = (
        seq.groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()  # bounded |types|^2 matrix — the markov_stationary discipline
    )
    out_schema = "event_type string, pi_fp bigint, raw_mass bigint"
    if not trans:
        return spark.createDataFrame([], out_schema)
    states = sorted(
        {r.prev_type for r in trans} | {r.next_type for r in trans}
    )
    k = len(states)
    tot: dict[str, int] = {}
    for r in trans:
        tot[r.prev_type] = tot.get(r.prev_type, 0) + int(r.n)
    pi = {s: MSP_SCALE // k for s in states}
    raw = {s: 0 for s in states}
    for _ in range(MSP_ROUNDS):
        raw = {s: 0 for s in states}
        for r in trans:
            raw[r.next_type] += pi[r.prev_type] * int(r.n) // tot[r.prev_type]
        mass = sum(raw.values())
        pi = {s: raw[s] * MSP_SCALE // mass for s in states}
    rows = [(s, pi[s], raw[s]) for s in states]
    return spark.createDataFrame(rows, out_schema)


KCP_ROUNDS = 4  # fixed unrolled peeling rounds for the ledger twin


def _k_core_portable_oracle() -> str:
    """Unrolled k-core peeling ledger: per round, the entry-state node
    and half-edge counts, how many nodes sit below k, and a modular
    checksum of their ids — every column an exact integer."""
    parts = []
    prev = "s0"
    for r in range(1, KCP_ROUNDS + 1):
        parts.append(f"""
        d{r} AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
            FROM {prev} GROUP BY src
        ),
        l{r} AS (
            SELECT {r} AS round,
                   CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(COALESCE(SUM(deg), 0) AS BIGINT) AS n_halfedges,
                   CAST(COUNT(CASE WHEN deg < {K_CORE} THEN 1 END)
                        AS BIGINT) AS n_below_k,
                   CAST(COALESCE(SUM(CASE WHEN deg < {K_CORE}
                                     THEN CAST(src AS HUGEINT) END), 0)
                        % 1000000000 AS BIGINT) AS sum_below_mod9
            FROM d{r}
        ),
        k{r} AS (SELECT src FROM d{r} WHERE deg >= {K_CORE}),
        s{r} AS (
            SELECT s.src, s.dst FROM {prev} s
            JOIN k{r} ka ON ka.src = s.src
            JOIN k{r} kb ON kb.src = s.dst
        )""")
        prev = f"s{r}"
    ledger = " UNION ALL ".join(
        f"SELECT * FROM l{r}" for r in range(1, KCP_ROUNDS + 1)
    )
    return f"""
        WITH e0 AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        ),
        s0 AS (
            SELECT src, dst FROM e0
            UNION ALL
            SELECT dst AS src, src AS dst FROM e0
        ),{",".join(parts)}
        SELECT CAST(round AS BIGINT) AS round, n_nodes, n_halfedges,
               n_below_k, sum_below_mod9
        FROM ({ledger})
        ORDER BY round
    """


@register(
    "graph_k_core_portable",
    oracle=_k_core_portable_oracle(),
    doc=f"PORTABLE round-ledger twin of graph_k_core (VERDICT r8 task "
    f"#5): the identical peeling plan — same oriented co-purchase "
    f"edge construction, same degree-then-filter round — but instead "
    f"of iterating to the graph-dependent fixpoint it runs EXACTLY "
    f"{KCP_ROUNDS} rounds and emits the per-round ledger: entry-state "
    f"node count, half-edge count, number of nodes below k={K_CORE}, "
    f"and a mod-1e9 checksum of their ids — all exact integers, so "
    f"the driver hash certifies every round's degree arithmetic and "
    f"edge filtering cross-engine (the removal counts are what the "
    f"fixpoint loop's convergence test reads). Plan per round: one "
    f"degree aggregate + two semi joins on node id — identical "
    f"shuffles to graph_k_core; the ledger rows are four single-row "
    f"folds over the bounded degree table. FIXPOINT SHORT-CIRCUIT "
    f"(VERDICT r12 task #3, the FFD lesson): when a round's "
    f"n_below_k is 0, keep = every node, so the surviving edge set "
    f"is provably invariant and every remaining round emits the "
    f"SAME ledger row — those rows are replicated driver-side from "
    f"the one-row fold already in hand instead of re-scanning the "
    f"edges (a round is one edge-set shuffle; the sweep measured the "
    f"unrolled form at 6.5x per 10x data, pure rounds-x-scan "
    f"constant). The per-round collect is ONE row (the ledger fold) "
    f"— dimension-table legitimacy, same as the FFD size histogram; "
    f"oracle hashes unchanged (the oracle still unrolls all "
    f"{KCP_ROUNDS} rounds independently), and the genuinely-peeling "
    f"path is equality-proved against pure-Python peeling on a "
    f"synthetic degenerate graph in tests/test_semantics.py.",
)
def graph_k_core_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(l).localCheckpoint()
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    below = F.col("deg") < K_CORE
    rows: list[tuple[int, int, int, int, int]] = []
    for r in range(1, KCP_ROUNDS + 1):
        deg = (
            sym.groupBy("src")
            .agg(F.count("*").cast("long").alias("deg"))
            .localCheckpoint()  # feeds the ledger fold AND the keep filter
        )
        led = deg.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.coalesce(F.sum("deg"), F.lit(0))
            .cast("long")
            .alias("n_halfedges"),
            F.count(F.when(below, 1)).cast("long").alias("n_below_k"),
            (
                F.coalesce(
                    F.sum(F.when(below, F.col("src").cast("decimal(38,0)"))),
                    F.lit(0).cast("decimal(38,0)"),
                )
                % 1000000000
            )
            .cast("long")
            .alias("sum_below_mod9"),
        ).collect()[0]  # bounded: ONE ledger row per executed round
        rows.append(
            (
                r,
                int(led["n_nodes"]),
                int(led["n_halfedges"]),
                int(led["n_below_k"]),
                int(led["sum_below_mod9"]),
            )
        )
        if led["n_below_k"] == 0:
            # Fixpoint: keep = every node, so the surviving edge set is
            # invariant and rounds r+1..KCP_ROUNDS provably emit this
            # exact row — replicate driver-side, skip the edge rescans.
            fixed = rows[-1][1:]
            rows.extend((rr,) + fixed for rr in range(r + 1, KCP_ROUNDS + 1))
            break
        if r < KCP_ROUNDS:
            keep = deg.where(F.col("deg") >= K_CORE).select("src")
            sym = (
                sym.join(keep, "src", "left_semi")
                .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
                .localCheckpoint()
            )
    return spark.createDataFrame(
        rows,
        "round long, n_nodes long, n_halfedges long, "
        "n_below_k long, sum_below_mod9 long",
    ).orderBy("round")


@register(
    "graph_degree_histogram",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (
                SELECT src AS node FROM edges
                UNION ALL
                SELECT dst AS node FROM edges
            ) GROUP BY node
        ),
        hist AS (
            SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree
        )
        SELECT degree, n_nodes,
               CAST(SUM(n_nodes) OVER (ORDER BY degree DESC
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_nodes_at_least,
               CAST(SUM(n_nodes * degree) OVER () AS BIGINT) AS total_degree
        FROM hist
    """,
    doc="Degree distribution of the part co-purchase graph — the "
    "first diagnostic run on any production graph (the tail shape "
    "decides everything downstream: a power-law hub tail mandates "
    "skew handling in every graph op; the complementary cumulative "
    "count n_nodes_at_least IS the CCDF whose log-log slope "
    "estimates the exponent). Same de-duplicated oriented edge "
    "construction as graph_triangle_count/k_core; degrees are one "
    "symmetric-union aggregate; the histogram windows run over the "
    "DISTINCT-DEGREE grid (bounded by max degree, not node count — "
    "the dq_qq_drift discipline). All-BIGINT, hash-exact.",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(l)
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count("*").cast("long").alias("n_nodes"))
    ccdf = W.orderBy(F.col("degree").desc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    return hist.select(
        "degree",
        "n_nodes",
        F.sum("n_nodes").over(ccdf).cast("long").alias("n_nodes_at_least"),
        F.sum(F.col("n_nodes") * F.col("degree")).over(W.partitionBy()).cast("long").alias("total_degree"),
    )


@register(
    "graph_assortativity",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        sym AS (
            SELECT src, dst FROM edges
            UNION ALL
            SELECT dst, src FROM edges
        ),
        deg AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM sym GROUP BY src
        ),
        pairs AS (
            SELECT da.d AS dx, db.d AS dy
            FROM sym e
            JOIN deg da ON da.node = e.src
            JOIN deg db ON db.node = e.dst
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS mm,
                   SUM(CAST(dx AS HUGEINT)) AS sx,
                   SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
                   SUM(CAST(dx AS HUGEINT) * dy) AS sxy
            FROM pairs
        )
        SELECT mm AS n_directed_edges,
               CAST(CAST(mm AS HUGEINT) * sxy - sx * sx AS DOUBLE)
               / CAST(CAST(mm AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                   AS assortativity
        FROM m
    """,
    doc="Degree assortativity of the co-purchase graph (Newman 2002): "
    "Pearson correlation of endpoint degrees over the directed edge "
    "list — positive = hubs attach to hubs (social-network-like), "
    "negative = hub-and-spoke (catalog-like); it decides whether "
    "degree-based partitioning helps or hurts every downstream graph "
    "op. Because the directed list contains both orientations, the x "
    "and y marginals are identical, collapsing Pearson to "
    "(M*Sxy - Sx^2)/(M*Sxx - Sx^2) — exact HUGEINT/DECIMAL moments, "
    "ONE float division. Degrees join back via two broadcasts of the "
    "|nodes| table; same edge construction as graph_triangle_count.",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(l).localCheckpoint()
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    da = deg.select(F.col("src").alias("e_src"), F.col("d").alias("dx"))
    db = deg.select(F.col("src").alias("e_dst"), F.col("d").alias("dy"))
    pairs = (
        sym.join(F.broadcast(da), F.col("src") == F.col("e_src"))
        .join(F.broadcast(db), F.col("dst") == F.col("e_dst"))
        .select("dx", "dy")
    )
    dec = "decimal(38,0)"
    m = pairs.agg(
        F.count("*").cast("long").alias("mm"),
        F.sum(F.col("dx").cast(dec)).alias("sx"),
        F.sum((F.col("dx").cast("decimal(19,0)") * F.col("dx")).cast(dec)).alias("sxx"),
        F.sum((F.col("dx").cast("decimal(19,0)") * F.col("dy")).cast(dec)).alias("sxy"),
    )
    return m.select(
        F.col("mm").alias("n_directed_edges"),
        F.expr(
            "CAST(CAST(mm AS DECIMAL(38,0)) * sxy - sx * sx AS DOUBLE)"
            " / CAST(CAST(mm AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
        ).alias("assortativity"),
    )


#: Bounded BFS depth and the deterministic seed rule (node id divisible
#: by BFS_SEED_MOD) for graph_shortest_hops.
BFS_DEPTH = 3
BFS_SEED_MOD = 199


@register(
    "graph_shortest_hops",
    oracle=f"""
        WITH RECURSIVE edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        sym AS (
            SELECT src, dst FROM edges
            UNION ALL
            SELECT dst AS src, src AS dst FROM edges
        ),
        walk(node, d) AS (
            SELECT DISTINCT src AS node, 0 AS d FROM sym
            WHERE src % {BFS_SEED_MOD} = 0
            UNION
            SELECT sym.dst AS node, walk.d + 1 AS d
            FROM walk JOIN sym ON sym.src = walk.node
            WHERE walk.d < {BFS_DEPTH}
        )
        SELECT node, CAST(MIN(d) AS BIGINT) AS hops
        FROM walk GROUP BY node
        ORDER BY node
    """,
    doc=f"Multi-source breadth-first shortest hop distance, depth-capped "
    f"at {BFS_DEPTH}, over the co-purchase graph (parts sharing an "
    f"order — the edge set of graph_degree_histogram/assortativity): "
    f"seeds are every node divisible by {BFS_SEED_MOD}, output is each "
    f"reachable node's exact hop count — the neighborhood-expansion "
    f"primitive under 'within-k-hops-of-a-flagged-entity' fraud/"
    f"influence queries that pagerank (global scores) and "
    f"triangle_count (local closure) don't answer. The oracle is a "
    f"RECURSIVE CTE with UNION semantics (per-level dedup bounds the "
    f"working table by |V|, not path count — UNION ALL would "
    f"enumerate all O(deg^{BFS_DEPTH}) paths); Spark has no recursive "
    f"DataFrame, so the textbook level-synchronous BFS loop runs "
    f"{BFS_DEPTH} bounded iterations: frontier ⋈ edges → distinct → "
    f"anti-join visited (which IS the min-hop guarantee: a node "
    f"admitted at level k was unreachable at <k), localCheckpoint per "
    f"level to truncate lineage — the graph_pagerank fixed-point "
    f"discipline with a constant trip count. At 100 TB: {BFS_DEPTH} "
    f"hash-join rounds, each shuffling only the frontier (monotone "
    f"shrinking under the anti-join), never the full walk closure.",
)
def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(l)
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    frontier = (
        sym.where(F.col("src") % BFS_SEED_MOD == 0)
        .select(F.col("src").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    visited = frontier
    for depth in range(1, BFS_DEPTH + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth).cast("long"))
            .localCheckpoint()
        )
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited.orderBy("node")


LPA_ROUNDS = 4
#: argmax packing: neighbor-label vote count dominates, smaller label
#: wins ties. Labels are part keys < 10^10; counts < 10^8 at any
#: realistic degree — score = cnt * 10^10 + (10^10 - 1 - label) fits
#: far inside BIGINT and decodes exactly.
LPA_PACK = 10_000_000_000


def _lpa_oracle() -> str:
    rounds = []
    for k in range(1, LPA_ROUNDS + 1):
        p = k - 1
        rounds.append(f"""
        l{k} AS (
            SELECT v.src AS pid,
                   CAST({LPA_PACK} - 1 - MAX(v.score) % {LPA_PACK} AS BIGINT)
                     AS label
            FROM (
                SELECT e2.src, l{p}.label,
                       COUNT(*) * CAST({LPA_PACK} AS BIGINT)
                       + ({LPA_PACK} - 1 - l{p}.label) AS score
                FROM edges e2 JOIN l{p} ON l{p}.pid = e2.dst
                GROUP BY e2.src, l{p}.label
            ) v
            GROUP BY v.src
        )""")
    return f"""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        l0 AS (SELECT DISTINCT src AS pid, CAST(src AS BIGINT) AS label
               FROM edges),
        {",".join(rounds)}
        SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM l{LPA_ROUNDS}
        GROUP BY label
        ORDER BY n_members DESC, community
    """


@register(
    "graph_lpa_communities",
    oracle=_lpa_oracle(),
    doc=f"Label propagation communities over the part co-purchase graph "
    f"(the graph_pagerank edge set) — {LPA_ROUNDS} SYNCHRONOUS rounds "
    f"where every node adopts its neighbors' plurality label, ties to "
    f"the smallest label. Plain LPA is notoriously nondeterministic "
    f"(random visit order, random tie-breaks); this formulation is "
    f"fully deterministic — synchronous updates + an integer argmax "
    f"packed as cnt * {LPA_PACK} + ({LPA_PACK}-1-label), so MAX picks "
    f"highest count then smallest label, all in exact BIGINTs — which "
    f"is what lets a second engine replay it: the oracle is the same "
    f"{LPA_ROUNDS} rounds UNROLLED as CTEs (the graph_pagerank "
    f"fixed-point discipline). Fixed round count (not convergence-"
    f"tested) keeps the plan static; label oscillation, the known "
    f"failure of synchronous LPA on bipartite-ish structure, is "
    f"bounded by the round cap and irrelevant to parity. Plan per "
    f"round: edges ⋈ labels (shuffle on dst) → vote agg on "
    f"(src, label) → argmax agg on src; lineage truncated with "
    f"localCheckpoint per round; the edge set stays the big static "
    f"co-partitioned side, exactly the Pregel lowering.",
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(
        F.col("src").alias("pid"), F.col("src").cast("long").alias("label")
    ).distinct()
    for _ in range(LPA_ROUNDS):
        votes = (
            edges.join(labels, edges["dst"] == labels["pid"])
            .groupBy("src", "label")
            .agg(F.count("*").alias("cnt"))
            .select(
                "src",
                (
                    F.col("cnt") * F.lit(LPA_PACK).cast("long")
                    + (F.lit(LPA_PACK - 1) - F.col("label"))
                ).alias("score"),
            )
        )
        labels = (
            votes.groupBy("src")
            .agg(
                (
                    F.lit(LPA_PACK - 1) - F.max("score") % F.lit(LPA_PACK)
                )
                .cast("long")
                .alias("label")
            )
            .select(F.col("src").alias("pid"), "label")
            .localCheckpoint()
        )
    return (
        labels.groupBy("label")
        .agg(F.count("*").cast("long").alias("n_members"))
        .select(F.col("label").alias("community"), "n_members")
        .orderBy(F.col("n_members").desc(), F.col("community"))
    )


@register(
    "graph_adamic_adar",
    # Common-neighbor wedge terms 1/ln(deg_w) are single IEEE divisions
    # of LN on exact-integer degrees (bit-identical in both engines),
    # rounded once to 9dp and summed in DECIMAL (rule 2); candidate
    # pairs come from the same basket-support prune as
    # graph_jaccard_candidates (generate-then-verify, never |V|^2).
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUP}
        ),
        und AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
        wedges AS (
            SELECT p.pa, p.pb, x.v AS w
            FROM pairs p
            JOIN und x ON x.u = p.pa
            JOIN und y ON y.u = p.pb AND y.v = x.v
        ),
        terms AS (
            SELECT wg.pa, wg.pb,
                   CAST(ROUND(1.0 / LN(CAST(dw.d AS DOUBLE)), 9)
                        AS DECIMAL(28,12)) AS t
            FROM wedges wg
            JOIN deg dw ON dw.u = wg.w
            WHERE dw.d >= 2
        )
        SELECT p.pa, p.pb,
               CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_common_deg2,
               CAST(COALESCE(CAST(cnt.s AS DOUBLE), 0.0) AS DOUBLE)
                   AS adamic_adar
        FROM pairs p
        LEFT JOIN (
            SELECT pa, pb, COUNT(*) AS n, SUM(t) AS s
            FROM terms GROUP BY pa, pb
        ) cnt ON cnt.pa = p.pa AND cnt.pb = p.pb
    """,
    doc=f"Adamic-Adar link-prediction score for candidate part pairs — "
    f"the common-neighbor index that discounts promiscuous hubs by "
    f"1/ln(degree), the standard 'which items will co-occur next' "
    f"ranking signal on co-purchase graphs. Candidates are pruned to "
    f"pairs with >= {BASKET_MIN_SUP} shared baskets FIRST "
    f"(graph_jaccard_candidates' generate-then-verify discipline — "
    f"never the |V|^2 neighbor cross product); the score then sums "
    f"1/ln(deg(w)) over each pair's common neighbors w (deg >= 2 — "
    f"ln(1)=0 wedges are excluded by definition). Each term is one "
    f"IEEE division of LN on an exact-integer degree (bit-identical "
    f"cross-engine), rounded once, DECIMAL-summed. Plan: candidate "
    f"list joins the adjacency twice (each candidate touches only "
    f"its own neighbor lists), degree table broadcasts onto the "
    f"wedge stream; cost scales with candidates x avg degree. The "
    f"decimal sum is short (<= min degree terms), so the final "
    f"decimal->double cast is exact at any scale.",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    # ONE counted pair build makes the ordered co-occurrence counts; the
    # undirected adjacency is its symmetrization (a<b plus the swap is
    # exactly the distinct a<>b pair set) — halves the join work vs
    # computing pairs and adjacency from two separate self-joins.
    # (collect_list pair generator tried and slower — see basket_rules.)
    a, b = l.alias("a"), l.alias("b")
    pairs_all = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint()  # feeds candidates AND the adjacency
    )
    pairs = pairs_all.where(F.col("n_ab") >= BASKET_MIN_SUP).select("pa", "pb")
    und = pairs_all.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(
        pairs_all.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    # r14 (VERDICT r13 #6, guide §2.4): adjacency-array form — the
    # graph_jaccard_candidates rewrite, with the common neighbors
    # EXPLODED (bounded: sum of per-candidate intersection sizes) so
    # each keeps its 1/ln(deg) term. Degrees come from the same array
    # table (und rows distinct ⇒ size(nbr) = degree). Replaces the
    # wedge join that shuffled |cand| x avg-degree wedges against the
    # full 2|E| adjacency on (pb, w). Measured interleaved in one
    # session: 3.51s -> 2.24s noop at sf0.1, collect-equal. The deg
    # lookup keeps its broadcast hint (node-keyed scalars — dimension
    # bytes); the adjacency joins are UNhinted (array bytes are
    # edge-scale): the planner broadcasts while stats fit, shuffles
    # beyond.
    adj = und.groupBy("u").agg(F.sort_array(F.collect_set("v")).alias("nbr"))
    deg = adj.select(
        F.col("u").alias("w"), F.size("nbr").cast("long").alias("d")
    )
    na = adj.select(F.col("u").alias("pa"), F.col("nbr").alias("na"))
    nb = adj.select(F.col("u").alias("pb"), F.col("nbr").alias("nb"))
    terms = (
        pairs.join(na, "pa")
        .join(nb, "pb")
        .select(
            "pa", "pb", F.explode(F.array_intersect("na", "nb")).alias("w")
        )
        .join(F.broadcast(deg), "w")
        .where(F.col("d") >= 2)
        .select(
            "pa",
            "pb",
            F.round(F.lit(1.0) / F.log(F.col("d").cast("double")), 9)
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    agg = terms.groupBy("pa", "pb").agg(
        F.count("*").alias("n"), F.sum("t").alias("s")
    )
    return pairs.join(agg, ["pa", "pb"], "left").select(
        "pa",
        "pb",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_common_deg2"),
        F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("adamic_adar"),
    )


BIPROJ_CAP = 25  # per-customer part-degree cap before the pair self-join
BIPROJ_MIN_W = 2  # emit part pairs co-bought by >= this many customers
BIPROJ_TOPK = 50


@register(
    "graph_bipartite_projection",
    # The customer->part bipartite graph projected onto parts: edge
    # weight = # distinct customers who bought both parts. The pair
    # self-join is capped BEFORE it runs (each customer contributes at
    # most C(CAP,2) pairs — the winnowing / split_leakage cap-before-
    # self-join discipline), so pair volume is linear in customers at
    # any scale instead of quadratic in the heaviest basket.
    oracle=f"""
        WITH edges AS (
            SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS v
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        capped AS (
            SELECT u, v FROM (
                SELECT u, v,
                       ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn
                FROM edges
            ) WHERE rn <= {BIPROJ_CAP}
        ),
        pairs AS (
            SELECT a.v AS part_a, b.v AS part_b,
                   COUNT(*) AS n_common_customers
            FROM capped a JOIN capped b
              ON a.u = b.u AND a.v < b.v
            GROUP BY a.v, b.v
        )
        SELECT part_a, part_b,
               CAST(n_common_customers AS BIGINT) AS n_common_customers
        FROM pairs
        WHERE n_common_customers >= {BIPROJ_MIN_W}
        ORDER BY n_common_customers DESC, part_a, part_b
        LIMIT {BIPROJ_TOPK}
    """,
    doc=f"Bipartite projection (customer-part -> part-part co-purchase "
    f"graph): the item-item similarity graph behind 'bought together' "
    f"recommenders and co-occurrence embeddings, built from the "
    f"distinct customer->part incidence. Per-customer degree is "
    f"capped at {BIPROJ_CAP} (deterministic keep-lowest-partkey rank) "
    f"BEFORE the self-join, so a whale customer who bought every part "
    f"contributes C({BIPROJ_CAP},2) pairs instead of |parts|^2 — the "
    f"same cap-before-self-join bound winnowing and split_leakage "
    f"use; weights for capped hubs are a documented lower bound "
    f"(standard practice for projection at scale). Emits the "
    f"top-{BIPROJ_TOPK} heaviest pairs with weight >= {BIPROJ_MIN_W} "
    f"under a total (weight DESC, part_a, part_b) order. Plan: "
    f"distinct incidence (one shuffle), per-customer window rank "
    f"(data-scale partition key — small per-group state), equi "
    f"self-join on customer, TakeOrderedAndProject top-k (no global "
    f"sort).",
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("v"))
        .distinct()
    )
    # partitionBy(u) is a DATA-SCALE key (one small group per customer)
    # — the safe grouped-rank form; the bounded-key trap doesn't apply.
    rn = F.row_number().over(W.partitionBy("u").orderBy("v"))
    capped = edges.withColumn("rn", rn).where(F.col("rn") <= BIPROJ_CAP)
    a = capped.select("u", F.col("v").alias("part_a"))
    b = capped.select(F.col("u").alias("u2"), F.col("v").alias("part_b"))
    pairs = (
        a.join(
            b,
            (F.col("u") == F.col("u2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_common_customers"))
        .where(F.col("n_common_customers") >= BIPROJ_MIN_W)
    )
    return pairs.orderBy(
        F.col("n_common_customers").desc(), "part_a", "part_b"
    ).limit(BIPROJ_TOPK)


KM_VALUE_CUT = 150  # a 'conversion' = first purchase with value > this
# (~47% of users convert at every fixture SF — real deaths AND real
# right-censoring; a last-activity churn rule degenerates on these
# fixtures because every user stays active to within 2 days of the end)


@register(
    "agg_survival_km",
    # The KM product is carried as a SUM of LN terms quantized to 1e-9
    # (rule 22/16: each term is LN of ONE IEEE division of exact
    # BIGINTs, rounded once, then INTEGER prefix-summed — an exact
    # integer in both engines; EXP is deliberately NOT applied, as it
    # is not bit-portable). The duration grid is DAY-granular —
    # calendar-bounded like the Mann-Whitney value grid, so the
    # cumulative window over it is a bounded-summary window, not a
    # data-scale one. The value>cut comparison is a raw-column
    # predicate (no arithmetic) — engine-exact.
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d0,
                   CAST(MIN(CASE WHEN event_type = 'purchase'
                                  AND value > {KM_VALUE_CUT}
                             THEN CAST(ts AS TIMESTAMP) END) AS DATE)
                       AS dconv
            FROM events GROUP BY user_id
        ),
        mx AS (
            SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS dmax
            FROM events
        ),
        lives AS (
            SELECT CASE WHEN u.dconv IS NOT NULL
                        THEN DATEDIFF('day', u.d0, u.dconv)
                        ELSE DATEDIFF('day', u.d0, mx.dmax) END AS t,
                   CASE WHEN u.dconv IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM per_user u CROSS JOIN mx
        ),
        grid AS (
            SELECT t,
                   CAST(SUM(ev) AS BIGINT) AS d_events,
                   CAST(SUM(1 - ev) AS BIGINT) AS c_censored
            FROM lives GROUP BY t
        ),
        tot AS (SELECT COUNT(*) AS n FROM lives),
        cum AS (
            SELECT g.t, g.d_events, g.c_censored,
                   tot.n
                   - (SUM(g.d_events + g.c_censored)
                          OVER (ORDER BY g.t ROWS UNBOUNDED PRECEDING)
                      - g.d_events - g.c_censored) AS n_at_risk
            FROM grid g CROSS JOIN tot
        ),
        terms AS (
            SELECT t, d_events, c_censored, n_at_risk,
                   CASE WHEN d_events > 0 AND n_at_risk > d_events
                        THEN CAST(ROUND(LN(
                                 CAST(n_at_risk - d_events AS DOUBLE)
                                 / CAST(n_at_risk AS DOUBLE)) * 1000000000,
                                 0) AS BIGINT)
                        ELSE 0 END AS term_q9,
                   CASE WHEN d_events > 0 AND n_at_risk = d_events
                        THEN TRUE ELSE FALSE END AS hits_zero
            FROM cum
        )
        SELECT t AS duration_days, d_events, c_censored,
               CAST(n_at_risk AS BIGINT) AS n_at_risk,
               CAST(SUM(term_q9) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS ln_km_q9,
               CAST(MAX(CASE WHEN hits_zero THEN 1 ELSE 0 END)
                        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS INT)
                   = 1 AS survival_zero
        FROM terms
        ORDER BY t
    """,
    doc=f"Kaplan-Meier survival estimator for time-to-conversion: the "
    f"event is a user's first purchase with value > {KM_VALUE_CUT} "
    f"(clock starts at their first event of any kind); users who "
    f"never convert are right-censored at the end of the "
    f"observation window — their true conversion time is only known "
    f"to exceed the observed span, and the estimator's whole point "
    f"is that they leave the risk set WITHOUT a survival decrement "
    f"(naive conversion-time quantiles over converters only are "
    f"biased low). Emits the classic life table per distinct "
    f"duration: deaths, censored, number at risk, and KM survival "
    f"carried in LOG space as an exact integer (ln terms quantized "
    f"to 1e-9 and prefix-summed; survival(t) = exp(ln_km_q9/1e9), "
    f"EXP left to the consumer — not bit-portable). Plan: one "
    f"per-user span aggregate (map-side combinable — the only wide "
    f"edge at 100 TB), a driver-side max-date scalar, a day-"
    f"granular calendar-BOUNDED grid (cumulative windows run over "
    f"<= |days| summary rows, never data-scale), two integer "
    f"running sums.",
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.col("ts")).cast("date").alias("d0"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > KM_VALUE_CUT),
                F.col("ts"),
            )
        )
        .cast("date")
        .alias("dconv"),
        F.max(F.col("ts")).cast("date").alias("dlast"),
    )
    per_user = per_user.localCheckpoint()  # feeds dmax scalar + lives
    # censor bound from the bounded per-user summary (max of per-user
    # maxima == global max event date) — no second raw-events scan.
    # r14: the cohort size rides in the SAME scalar job (it used to be
    # a separate lives.count() — lives is a projection of per_user, so
    # the counts are equal); one fewer job.
    dmax, n = per_user.agg(F.max("dlast"), F.count("*")).collect()[0]
    if dmax is None:
        return spark.createDataFrame(
            [],
            "duration_days bigint, d_events bigint, c_censored bigint,"
            " n_at_risk bigint, ln_km_q9 bigint, survival_zero boolean",
        )
    lives = per_user.select(
        F.when(
            F.col("dconv").isNotNull(), F.datediff("dconv", "d0")
        )
        .otherwise(F.datediff(F.lit(dmax), F.col("d0")))
        .cast("long")
        .alias("t"),
        F.when(F.col("dconv").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    grid = lives.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_censored"),
    )
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = grid.select(
        "t",
        "d_events",
        "c_censored",
        (
            F.lit(n)
            - (
                F.sum(F.col("d_events") + F.col("c_censored")).over(w)
                - F.col("d_events")
                - F.col("c_censored")
            )
        ).alias("n_at_risk"),
    )
    term = (
        F.when(
            (F.col("d_events") > 0) & (F.col("n_at_risk") > F.col("d_events")),
            F.round(
                F.log(
                    (F.col("n_at_risk") - F.col("d_events")).cast("double")
                    / F.col("n_at_risk").cast("double")
                )
                * 1000000000,
                0,
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    hits_zero = (F.col("d_events") > 0) & (
        F.col("n_at_risk") == F.col("d_events")
    )
    terms = cum.select(
        "t",
        "d_events",
        "c_censored",
        "n_at_risk",
        term.alias("term_q9"),
        hits_zero.alias("hz"),
    )
    return terms.select(
        F.col("t").alias("duration_days"),
        "d_events",
        "c_censored",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.sum("term_q9").over(w).cast("long").alias("ln_km_q9"),
        (
            F.max(F.when(F.col("hz"), 1).otherwise(0)).over(w) == 1
        ).alias("survival_zero"),
    ).orderBy(F.col("duration_days"))


@register(
    "agg_survival_na",
    # Nelson-Aalen cumulative hazard on the SAME cohort/grid as
    # agg_survival_km, carried entirely in exact integers: per-duration
    # hazard d/n quantized as d*1e9 DIV n (all operands nonnegative, so
    # Spark's truncating DIV == DuckDB's flooring // — engine-exact),
    # Greenwood-style variance increment d*1e15 DIV n^2 likewise, both
    # prefix-summed over the DAY-granular calendar-BOUNDED grid (a
    # bounded-summary window, not a data-scale one — the survival-family
    # discipline).
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d0,
                   CAST(MIN(CASE WHEN event_type = 'purchase'
                                  AND value > {KM_VALUE_CUT}
                             THEN CAST(ts AS TIMESTAMP) END) AS DATE)
                       AS dconv
            FROM events GROUP BY user_id
        ),
        mx AS (
            SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS dmax
            FROM events
        ),
        lives AS (
            SELECT CASE WHEN u.dconv IS NOT NULL
                        THEN DATEDIFF('day', u.d0, u.dconv)
                        ELSE DATEDIFF('day', u.d0, mx.dmax) END AS t,
                   CASE WHEN u.dconv IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM per_user u CROSS JOIN mx
        ),
        grid AS (
            SELECT t,
                   CAST(SUM(ev) AS BIGINT) AS d_events,
                   CAST(SUM(1 - ev) AS BIGINT) AS c_censored
            FROM lives GROUP BY t
        ),
        tot AS (SELECT COUNT(*) AS n FROM lives),
        cum AS (
            SELECT g.t, g.d_events, g.c_censored,
                   CAST(tot.n
                   - (SUM(g.d_events + g.c_censored)
                          OVER (ORDER BY g.t ROWS UNBOUNDED PRECEDING)
                      - g.d_events - g.c_censored) AS BIGINT) AS n_at_risk
            FROM grid g CROSS JOIN tot
        ),
        terms AS (
            SELECT t, d_events, c_censored, n_at_risk,
                   CASE WHEN n_at_risk > 0
                        THEN CAST(CAST(d_events AS HUGEINT) * 1000000000
                             // n_at_risk AS BIGINT)
                        ELSE 0 END AS hq9,
                   CASE WHEN n_at_risk > 0
                        THEN CAST(CAST(d_events AS HUGEINT)
                             * 1000000000000000
                             // (CAST(n_at_risk AS HUGEINT) * n_at_risk)
                             AS BIGINT)
                        ELSE 0 END AS vq15
            FROM cum
        )
        SELECT t AS duration_days, d_events, c_censored, n_at_risk,
               CAST(hq9 AS BIGINT) AS hazard_q9,
               CAST(SUM(hq9) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_hazard_q9,
               CAST(SUM(vq15) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_var_q15
        FROM terms
        ORDER BY t
    """,
    doc=f"Nelson-Aalen cumulative-hazard estimator on the same "
    f"time-to-conversion cohort as agg_survival_km (event = first "
    f"purchase with value > {KM_VALUE_CUT}, censoring at the window "
    f"end): H(t) = sum d_i/n_i with the Poisson-type variance "
    f"sum d_i/n_i^2 — the estimator preferred over -ln(KM) for "
    f"small risk sets because it never hits a log-of-zero and is "
    f"the basis of both the Fleming-Harrington test family and "
    f"hazard-ratio eyeballing. Both running quantities are carried "
    f"as EXACT integers (d*1e9 DIV n and d*1e15 DIV n^2, "
    f"prefix-summed) — no float accumulates, so the hash is "
    f"engine-exact by construction rather than by libm agreement. "
    f"Plan: one per-user span aggregate (the only wide edge at "
    f"100 TB), a scalar censor bound off the bounded per-user "
    f"summary (no second raw scan), then integer running sums over "
    f"the day-granular calendar-bounded grid.",
)
def agg_survival_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.col("ts")).cast("date").alias("d0"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > KM_VALUE_CUT),
                F.col("ts"),
            )
        )
        .cast("date")
        .alias("dconv"),
        F.max(F.col("ts")).cast("date").alias("dlast"),
    )
    per_user = per_user.localCheckpoint()  # feeds dmax scalar + lives
    # r14: dmax + cohort size in one scalar job (the agg_survival_km
    # rewrite; lives is a projection of per_user so the counts agree).
    dmax, n = per_user.agg(F.max("dlast"), F.count("*")).collect()[0]
    if dmax is None:
        return spark.createDataFrame(
            [],
            "duration_days bigint, d_events bigint, c_censored bigint,"
            " n_at_risk bigint, hazard_q9 bigint, cum_hazard_q9 bigint,"
            " cum_var_q15 bigint",
        )
    lives = per_user.select(
        F.when(F.col("dconv").isNotNull(), F.datediff("dconv", "d0"))
        .otherwise(F.datediff(F.lit(dmax), F.col("d0")))
        .cast("long")
        .alias("t"),
        F.when(F.col("dconv").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    grid = lives.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_censored"),
    )
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = grid.select(
        "t",
        "d_events",
        "c_censored",
        (
            F.lit(n)
            - (
                F.sum(F.col("d_events") + F.col("c_censored")).over(w)
                - F.col("d_events")
                - F.col("c_censored")
            )
        )
        .cast("long")
        .alias("n_at_risk"),
    )
    terms = cum.select(
        "t",
        "d_events",
        "c_censored",
        "n_at_risk",
        F.when(
            F.col("n_at_risk") > 0,
            F.expr(
                "CAST(CAST(d_events AS DECIMAL(38,0)) * 1000000000"
                " DIV n_at_risk AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("hq9"),
        F.when(
            F.col("n_at_risk") > 0,
            F.expr(
                "CAST(CAST(d_events AS DECIMAL(38,0)) * 1000000000000000"
                " DIV (CAST(n_at_risk AS DECIMAL(38,0)) * n_at_risk)"
                " AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("vq15"),
    )
    return terms.select(
        F.col("t").alias("duration_days"),
        "d_events",
        "c_censored",
        "n_at_risk",
        F.col("hq9").alias("hazard_q9"),
        F.sum("hq9").over(w).cast("long").alias("cum_hazard_q9"),
        F.sum("vq15").over(w).cast("long").alias("cum_var_q15"),
    ).orderBy(F.col("duration_days"))


@register(
    "agg_logrank_test",
    # Per-event-time hypergeometric terms are IDENTICAL left-to-right
    # float chains on exact-BIGINT inputs (bit-identical cross-engine,
    # rule 10's stronger form / rule 21's written-out association),
    # rounded ONCE to 9dp, DECIMAL-summed; the statistic is the same
    # identical chain on the three resulting doubles. Day-granular
    # grid = calendar-bounded windows (the KM precedent).
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d0,
                   CAST(MIN(CASE WHEN event_type = 'purchase'
                                  AND value > {KM_VALUE_CUT}
                             THEN CAST(ts AS TIMESTAMP) END) AS DATE)
                       AS dconv,
                   MAX(CASE WHEN event_type = 'error' AND value > 100
                             THEN 1 ELSE 0 END) AS grp
            FROM events GROUP BY user_id
        ),
        mx AS (
            SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS dmax
            FROM events
        ),
        lives AS (
            SELECT CASE WHEN u.dconv IS NOT NULL
                        THEN DATEDIFF('day', u.d0, u.dconv)
                        ELSE DATEDIFF('day', u.d0, mx.dmax) END AS t,
                   CASE WHEN u.dconv IS NOT NULL THEN 1 ELSE 0 END AS ev,
                   u.grp
            FROM per_user u CROSS JOIN mx
        ),
        grid AS (
            SELECT t,
                   CAST(SUM(ev) AS BIGINT) AS d,
                   CAST(SUM(ev * grp) AS BIGINT) AS d1,
                   CAST(COUNT(*) AS BIGINT) AS leave_all,
                   CAST(SUM(grp) AS BIGINT) AS leave_g1
            FROM lives GROUP BY t
        ),
        tot AS (
            SELECT COUNT(*) AS n_all, CAST(SUM(grp) AS BIGINT) AS n_g1
            FROM lives
        ),
        risk AS (
            SELECT g.t, g.d, g.d1,
                   tot.n_all
                   - (SUM(g.leave_all) OVER (ORDER BY g.t
                          ROWS UNBOUNDED PRECEDING) - g.leave_all) AS n,
                   tot.n_g1
                   - (SUM(g.leave_g1) OVER (ORDER BY g.t
                          ROWS UNBOUNDED PRECEDING) - g.leave_g1) AS n1
            FROM grid g CROSS JOIN tot
        ),
        terms AS (
            SELECT d1,
                   CAST(ROUND(CAST(d AS DOUBLE) * n1 / n, 9)
                        AS DECIMAL(28,12)) AS e1,
                   CASE WHEN n > 1 THEN
                       CAST(ROUND(CAST(d AS DOUBLE) * n1 / n * (n - n1)
                                  / n * (n - d) / (n - 1), 9)
                            AS DECIMAL(28,12))
                   ELSE CAST(0 AS DECIMAL(28,12)) END AS v
            FROM risk WHERE d > 0
        )
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
               CAST(CAST(SUM(e1) AS VARCHAR) AS DOUBLE) AS e1,
               CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS var_lr,
               CASE WHEN CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) = 0.0
                    THEN NULL
                    ELSE (CAST(SUM(d1) AS BIGINT)
                          - CAST(CAST(SUM(e1) AS VARCHAR) AS DOUBLE))
                         * (CAST(SUM(d1) AS BIGINT)
                            - CAST(CAST(SUM(e1) AS VARCHAR) AS DOUBLE))
                         / CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE)
               END AS chi2_logrank
        FROM terms
    """,
    doc=f"Two-group log-rank test over the Kaplan-Meier life table "
    f"(agg_survival_km's companion inference step): do users who hit "
    f"SEVERE errors (value > 100) convert (first purchase > "
    f"{KM_VALUE_CUT}) on the same schedule as users who never do? "
    f"(plain 'any error' is degenerate on these fixtures — every "
    f"user has one; the severity cut splits ~73%/27% at every SF). At each distinct event time "
    f"the observed group-1 conversions are compared with the "
    f"hypergeometric expectation d*n1/n and variance "
    f"d*(n1/n)*(1-n1/n)*(n-d)/(n-1); chi2 = (O1-E1)^2/V with 1 df. "
    f"Same event/censoring rule as the KM op. Per-time terms are "
    f"identical float chains on exact integers rounded once and "
    f"DECIMAL-summed; the statistic is one identical chain on the "
    f"three fold results. Plan: per-user span aggregate (wide "
    f"edge), day-bounded grid, two running sums over the bounded "
    f"grid, single-row fold.",
)
def agg_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.col("ts")).cast("date").alias("d0"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > KM_VALUE_CUT),
                F.col("ts"),
            )
        )
        .cast("date")
        .alias("dconv"),
        F.max(
            F.when(
                (F.col("event_type") == "error") & (F.col("value") > 100),
                1,
            ).otherwise(0)
        ).alias("grp"),
        F.max(F.col("ts")).cast("date").alias("dlast"),
    )
    per_user = per_user.localCheckpoint()
    dmax = per_user.agg(F.max("dlast")).collect()[0][0]
    if dmax is None:
        return spark.createDataFrame(
            [], "o1 bigint, e1 double, var_lr double, chi2_logrank double"
        )
    lives = per_user.select(
        F.when(
            F.col("dconv").isNotNull(), F.datediff("dconv", "d0")
        )
        .otherwise(F.datediff(F.lit(dmax), F.col("d0")))
        .cast("long")
        .alias("t"),
        F.when(F.col("dconv").isNotNull(), 1).otherwise(0).alias("ev"),
        "grp",
    )
    tot = lives.agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("grp").cast("long").alias("n_g1"),
    ).collect()[0]
    n_all, n_g1 = int(tot.n_all), int(tot.n_g1)
    grid = lives.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.col("ev") * F.col("grp")).cast("long").alias("d1"),
        F.count("*").cast("long").alias("leave_all"),
        F.sum("grp").cast("long").alias("leave_g1"),
    )
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = grid.select(
        "t",
        "d",
        "d1",
        (F.lit(n_all) - (F.sum("leave_all").over(w) - F.col("leave_all"))).alias("n"),
        (F.lit(n_g1) - (F.sum("leave_g1").over(w) - F.col("leave_g1"))).alias("n1"),
    ).where(F.col("d") > 0)
    # identical float chains to the oracle text (left-to-right)
    e1_term = F.round(
        F.col("d").cast("double") * F.col("n1") / F.col("n"), 9
    ).cast("decimal(28,12)")
    v_term = F.when(
        F.col("n") > 1,
        F.round(
            F.col("d").cast("double")
            * F.col("n1")
            / F.col("n")
            * (F.col("n") - F.col("n1"))
            / F.col("n")
            * (F.col("n") - F.col("d"))
            / (F.col("n") - 1),
            9,
        ).cast("decimal(28,12)"),
    ).otherwise(F.lit(0).cast("decimal(28,12)"))
    folds = risk.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e1_term).alias("e1_dec"),
        F.sum(v_term).alias("v_dec"),
    ).collect()[0]
    if folds.o1 is None:  # no conversions at all: oracle's empty-fold row
        return spark.createDataFrame(
            [(None, None, None, None)],
            "o1 bigint, e1 double, var_lr double, chi2_logrank double",
        )
    o1 = int(folds.o1)
    e1 = float(folds.e1_dec)
    v = float(folds.v_dec)
    chi2 = None if v == 0.0 else (o1 - e1) * (o1 - e1) / v
    return spark.createDataFrame(
        [(o1, e1, v, chi2)],
        "o1 bigint, e1 double, var_lr double, chi2_logrank double",
    )


@register(
    "agg_shapley_attribution",
    # Exact-rational credit: for the unanimity game 'a user's
    # conversion needs every channel they actually touched', the
    # Shapley value gives each touched channel 1/k of that user's
    # conversion. 1/k for k in 1..4 is exact in TWELFTHS (LCM(1..4) =
    # 12), so credits are integers end to end and the shares are
    # integer ppm (rule 16) — no float attribution anywhere.
    oracle="""
        WITH conv AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) AS t_conv
            FROM events GROUP BY user_id
            HAVING MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) IS NOT NULL
        ),
        touch AS (
            SELECT DISTINCT e.user_id, e.event_type AS channel
            FROM events e JOIN conv c ON c.user_id = e.user_id
            WHERE e.event_type <> 'purchase'
              AND CAST(e.ts AS TIMESTAMP) < c.t_conv
        ),
        k AS (
            SELECT user_id, COUNT(*) AS n_channels
            FROM touch GROUP BY user_id
        ),
        credit AS (
            SELECT t.channel,
                   CAST(SUM(12 / k.n_channels) AS BIGINT) AS credit_12ths,
                   COUNT(*) AS n_users_touched
            FROM touch t JOIN k ON k.user_id = t.user_id
            GROUP BY t.channel
        ),
        tot AS (SELECT SUM(credit_12ths) AS s FROM credit)
        SELECT c.channel, c.credit_12ths, c.n_users_touched,
               CAST(c.credit_12ths * 1000000 // tot.s AS BIGINT)
                   AS share_ppm
        FROM credit c CROSS JOIN tot
        ORDER BY c.channel
    """,
    doc="Shapley-value conversion attribution across marketing "
    "channels: each converting user's credit is split equally over "
    "the DISTINCT channels they touched before first purchase — "
    "which IS the exact Shapley value of the per-user unanimity "
    "game (every touched channel is pivotal exactly once per "
    "ordering position; symmetric players share equally), the "
    "principled alternative to win_attribution's last-touch rule "
    "that over-credits the final click. With at most 4 non-purchase "
    "channels, 1/k credit is exact in twelfths, so the entire "
    "attribution is integer arithmetic: credit_12ths and share_ppm "
    "hash-exact in both engines. Plan: first-purchase timestamps "
    "per user (map-side combinable), one semi-join-shaped distinct "
    "touch table, a |users| channel-count aggregate joined back, a "
    "|channels|-bounded credit rollup, single-row total broadcast. "
    "12 / k is exact integer division for k in 1..4 (all divide "
    "12) — no rational ever truncates.",
)
def agg_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    conv = (
        e.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_conv")
        )
        .where(F.col("t_conv").isNotNull())
    )
    touch = (
        e.where(F.col("event_type") != "purchase")
        .join(conv, "user_id")
        .where(F.col("ts") < F.col("t_conv"))
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
        .localCheckpoint()  # feeds the per-user k agg and the credit agg
    )
    k = touch.groupBy("user_id").agg(F.count("*").alias("n_channels"))
    credit = (
        touch.join(k, "user_id")
        .groupBy("channel")
        .agg(
            F.sum(F.expr("12 DIV n_channels")).cast("long").alias("credit_12ths"),
            F.count("*").alias("n_users_touched"),
        )
    )
    credit = credit.localCheckpoint()  # bounded |channels| rows
    tot = credit.agg(F.sum("credit_12ths")).collect()[0][0]
    if tot is None:
        return spark.createDataFrame(
            [],
            "channel string, credit_12ths bigint, n_users_touched bigint,"
            " share_ppm bigint",
        )
    return credit.select(
        "channel",
        "credit_12ths",
        "n_users_touched",
        F.expr(f"CAST(credit_12ths * 1000000 DIV {int(tot)} AS BIGINT)").alias(
            "share_ppm"
        ),
    ).orderBy("channel")


from solarflare_etl_pipeline_spark.operators.aggregates import (  # noqa: E402
    POWER_Z_ALPHA,
    POWER_Z_BETA,
)


@register(
    "flagship_ab_readout",
    # Assembled from driver-proven spellings: parity hash split
    # (sample_hash_split), SRM chi-square cleared to one division of
    # exact ints (agg_srm_check), conversion ppm by integer DIV (rule
    # 16), Welch t on floor(value*1000) sufficient statistics with
    # identical chains (agg_welch_t), and the pooled-variance power
    # formula (agg_power_two_proportion). Every cross join below is a
    # 1x1 join of single-row arms.
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm, COUNT(*) AS n,
                   CAST(SUM(conv) AS BIGINT) AS x
            FROM u GROUP BY arm
        ),
        pv AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events WHERE event_type = 'purchase'
        ),
        vs AS (
            SELECT arm, COUNT(*) AS n,
                   SUM(CAST(v3 AS HUGEINT)) AS s1,
                   SUM(CAST(v3 AS HUGEINT) * v3) AS s2
            FROM pv GROUP BY arm
        ),
        vm AS (
            SELECT arm, n,
                   CAST(s1 AS DOUBLE) / n AS mean3,
                   CAST(CAST(n AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * (n - 1)) AS var3
            FROM vs
        ),
        flat AS (
            SELECT c.n AS n_control, t.n AS n_treat,
                   c.x AS conv_control, t.x AS conv_treat,
                   vc.n AS np_c, vt.n AS np_t,
                   vc.mean3 AS mc, vt.mean3 AS mt,
                   vc.var3 AS vc3, vt.var3 AS vt3
            FROM (SELECT * FROM arms WHERE arm = 0) c
            CROSS JOIN (SELECT * FROM arms WHERE arm = 1) t
            CROSS JOIN (SELECT * FROM vm WHERE arm = 0) vc
            CROSS JOIN (SELECT * FROM vm WHERE arm = 1) vt
        )
        SELECT n_control, n_treat,
               CAST((n_control - n_treat) * (n_control - n_treat) AS DOUBLE)
                   / CAST(n_control + n_treat AS DOUBLE) AS srm_chi2,
               CAST(conv_control * 1000000 // n_control AS BIGINT)
                   AS conv_c_ppm,
               CAST(conv_treat * 1000000 // n_treat AS BIGINT)
                   AS conv_t_ppm,
               ROUND((mc - mt) / SQRT(vc3 / np_c + vt3 / np_t), 9)
                   AS value_welch_t,
               CASE WHEN CAST(conv_control AS DOUBLE) / n_control
                         = CAST(conv_treat AS DOUBLE) / n_treat THEN NULL
                    ELSE CAST(CEIL(
                        ({POWER_Z_ALPHA} * SQRT(2.0
                             * (CAST(conv_control + conv_treat AS DOUBLE)
                                / (n_control + n_treat))
                             * (1.0 - CAST(conv_control + conv_treat AS DOUBLE)
                                      / (n_control + n_treat)))
                         + {POWER_Z_BETA} * SQRT(
                             (CAST(conv_control AS DOUBLE) / n_control)
                             * (1.0 - CAST(conv_control AS DOUBLE) / n_control)
                             + (CAST(conv_treat AS DOUBLE) / n_treat)
                             * (1.0 - CAST(conv_treat AS DOUBLE) / n_treat)))
                        * ({POWER_Z_ALPHA} * SQRT(2.0
                             * (CAST(conv_control + conv_treat AS DOUBLE)
                                / (n_control + n_treat))
                             * (1.0 - CAST(conv_control + conv_treat AS DOUBLE)
                                      / (n_control + n_treat)))
                         + {POWER_Z_BETA} * SQRT(
                             (CAST(conv_control AS DOUBLE) / n_control)
                             * (1.0 - CAST(conv_control AS DOUBLE) / n_control)
                             + (CAST(conv_treat AS DOUBLE) / n_treat)
                             * (1.0 - CAST(conv_treat AS DOUBLE) / n_treat)))
                        / ((CAST(conv_control AS DOUBLE) / n_control
                            - CAST(conv_treat AS DOUBLE) / n_treat)
                           * (CAST(conv_control AS DOUBLE) / n_control
                              - CAST(conv_treat AS DOUBLE) / n_treat)))
                        AS BIGINT)
               END AS n_per_arm_needed
        FROM flat
    """,
    doc="A/B experiment readout flagship: ONE table a platform ships "
    "per experiment — arm sizes with the sample-ratio-mismatch "
    "chi-square (the guardrail that invalidates everything else "
    "when it fires), conversion rates per arm (exact ppm), Welch's "
    "t on purchase values (the continuous-metric significance "
    "test), and the per-arm N required to power the observed "
    "conversion gap (the 'how much longer must this run' answer). "
    "Composes the proven disciplines of sample_hash_split, "
    "agg_srm_check, agg_welch_t, and agg_power_two_proportion into "
    "one single-row frame; all joins are 1x1 single-row arms. Plan: "
    "two per-user/per-event aggregates (map-side combinable) feed "
    "four single-row folds — nothing wide at any scale.",
)
def flagship_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    arms = {
        int(r.arm): (int(r.n), int(r.x))
        for r in u.groupBy("arm")
        .agg(F.count("*").alias("n"), F.sum("conv").cast("long").alias("x"))
        .collect()
    }
    pv = e.where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("arm"),
        F.floor(F.col("value") * 1000).cast("long").alias("v3"),
    )
    vs = {
        int(r.arm): (int(r.n), int(r.s1), int(r.s2))
        for r in pv.groupBy("arm")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v3").cast("decimal(38,0)")).alias("s1"),
            F.sum(F.col("v3").cast("decimal(38,0)") * F.col("v3")).alias("s2"),
        )
        .collect()
    }
    out_schema = (
        "n_control bigint, n_treat bigint, srm_chi2 double,"
        " conv_c_ppm bigint, conv_t_ppm bigint, value_welch_t double,"
        " n_per_arm_needed bigint"
    )
    if 0 not in arms or 1 not in arms or 0 not in vs or 1 not in vs:
        return spark.createDataFrame([], out_schema)
    import math

    def fdiv(a: float, b: float) -> float:
        # IEEE-754 division like the oracle's DOUBLE '/': a 0/0 variance
        # (single-purchase arm) is NaN, x/0 is ±Inf — NOT a Python
        # ZeroDivisionError (ADVICE r8: the op must emit the oracle's
        # NaN/Inf row, not crash).
        if b == 0.0:
            if a == 0.0:
                return math.nan
            return math.inf if a > 0 else -math.inf
        return a / b

    (nc, xc), (nt, xt) = arms[0], arms[1]
    (npc, s1c, s2c), (npt, s1t, s2t) = vs[0], vs[1]
    srm = float((nc - nt) * (nc - nt)) / float(nc + nt)
    mc, mt = s1c / npc, s1t / npt
    vc3 = fdiv(float(npc * s2c - s1c * s1c), float(npc) * (npc - 1))
    vt3 = fdiv(float(npt * s2t - s1t * s1t), float(npt) * (npt - 1))
    welch = round(fdiv(mc - mt, math.sqrt(vc3 / npc + vt3 / npt)), 9)
    p1, p2 = xc / nc, xt / nt
    if p1 == p2:
        n_req = None
    else:
        pbar = (xc + xt) / (nc + nt)
        num = POWER_Z_ALPHA * math.sqrt(2.0 * pbar * (1.0 - pbar)) + (
            POWER_Z_BETA * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
        )
        n_req = math.ceil(num * num / ((p1 - p2) * (p1 - p2)))
    return spark.createDataFrame(
        [
            (
                nc,
                nt,
                srm,
                xc * 10**6 // nc,
                xt * 10**6 // nt,
                welch,
                n_req,
            )
        ],
        out_schema,
    )


HITS_SCALE = 10**6  # hub/authority fixed-point units per round


def _hits_oracle() -> str:
    # two unrolled Kleinberg rounds; every division is integer floor
    # division by the round's max-derived divisor (non-negative values,
    # so DuckDB // and Spark DIV agree exactly)
    return f"""
        WITH edges AS (
            SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        a1 AS (
            SELECT part, CAST(COUNT(*) AS BIGINT) * {HITS_SCALE} AS a
            FROM edges GROUP BY part
        ),
        a1n AS (
            SELECT part,
                   a // GREATEST(1, (SELECT MAX(a) FROM a1) // {HITS_SCALE})
                       AS a
            FROM a1
        ),
        h1 AS (
            SELECT e.cust, CAST(SUM(a1n.a) AS BIGINT) AS h
            FROM edges e JOIN a1n ON a1n.part = e.part
            GROUP BY e.cust
        ),
        h1n AS (
            SELECT cust,
                   h // GREATEST(1, (SELECT MAX(h) FROM h1) // {HITS_SCALE})
                       AS h
            FROM h1
        ),
        a2 AS (
            SELECT e.part, CAST(SUM(h1n.h) AS BIGINT) AS a
            FROM edges e JOIN h1n ON h1n.cust = e.cust
            GROUP BY e.part
        ),
        a2n AS (
            SELECT part,
                   a // GREATEST(1, (SELECT MAX(a) FROM a2) // {HITS_SCALE})
                       AS a
            FROM a2
        ),
        h2 AS (
            SELECT e.cust, CAST(SUM(a2n.a) AS BIGINT) AS h
            FROM edges e JOIN a2n ON a2n.part = e.part
            GROUP BY e.cust
        ),
        h2n AS (
            SELECT cust,
                   h // GREATEST(1, (SELECT MAX(h) FROM h2) // {HITS_SCALE})
                       AS h
            FROM h2
        )
        SELECT 'authority' AS role, part AS node_id,
               CAST(a AS BIGINT) AS score_fp
        FROM a2n
        UNION ALL
        SELECT 'hub', cust, CAST(h AS BIGINT) FROM h2n
        ORDER BY role, node_id
    """


@register(
    "graph_hits",
    oracle=_hits_oracle(),
    doc=f"Kleinberg HITS over the customer->part purchase bipartite "
    f"graph: authorities are parts bought by strong hubs, hubs are "
    f"customers who buy strong authorities — the mutually recursive "
    f"ranking under product discovery and spam-seller detection "
    f"(PageRank's directed sibling where WHO points matters, not "
    f"just in-degree). Two synchronous rounds in FIXED-POINT integer "
    f"arithmetic (the graph_pagerank discipline): scores in "
    f"{HITS_SCALE}-unit grains, each round renormalized by floor-"
    f"dividing with max(score) DIV {HITS_SCALE} (non-negative, so "
    f"floor and truncate agree cross-engine) instead of the float "
    f"L2 norm — the only way an iterative eigenvector algorithm can "
    f"hash-match another engine, and overflow-safe without int128 "
    f"(score*N fits BIGINT at any fan-in up to 10^9). Per round: "
    f"edges ⋈ scores (shuffle on one side), partial-agg on the "
    f"other, one single-row max. Emits both score tables in long "
    f"form. At 100 TB edges are the static big side and scores "
    f"co-partition round over round — the Pregel lowering.",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint()  # static side, reused every round
    )
    out_schema = "role string, node_id long, score_fp bigint"
    if edges.limit(1).count() == 0:
        return spark.createDataFrame([], out_schema)

    def norm(df: DataFrame, key: str, col: str) -> DataFrame:
        # checkpoint FIRST so the max fold and the divided projection
        # both read the materialized round result — collecting before
        # checkpointing would run the round's joins twice
        df = df.localCheckpoint()
        mx = df.agg(F.max(col)).collect()[0][0]  # single-row scalar
        d = max(1, int(mx) // HITS_SCALE)
        return df.select(
            key, F.expr(f"{col} DIV {d}").cast("long").alias(col)
        )

    # Score tables are NODE-keyed (parts / customers — dimension-sized):
    # broadcast them into the per-round join so the static edge side is
    # probed map-side instead of re-shuffled every round (_bcast_nodes —
    # same part-dimension justification as the CC rounds; at broadcast-
    # exceeding scales SOLARFLARE_GRAPH_BCAST=0 restores the shuffle).
    a = norm(
        edges.groupBy("part").agg(
            (F.count("*").cast("long") * HITS_SCALE).alias("a")
        ),
        "part",
        "a",
    )
    h = norm(
        edges.join(_bcast_nodes(a), "part")
        .groupBy("cust")
        .agg(F.sum("a").cast("long").alias("h")),
        "cust",
        "h",
    )
    a = norm(
        edges.join(_bcast_nodes(h), "cust")
        .groupBy("part")
        .agg(F.sum("h").cast("long").alias("a")),
        "part",
        "a",
    )
    h = norm(
        edges.join(_bcast_nodes(a), "part")
        .groupBy("cust")
        .agg(F.sum("a").cast("long").alias("h")),
        "cust",
        "h",
    )
    return (
        a.select(
            F.lit("authority").alias("role"),
            F.col("part").alias("node_id"),
            F.col("a").alias("score_fp"),
        )
        .unionAll(
            h.select(
                F.lit("hub").alias("role"),
                F.col("cust").alias("node_id"),
                F.col("h").alias("score_fp"),
            )
        )
        .orderBy("role", "node_id")
    )


@register(
    "cohort_ltv_curve",
    # Cumulative spend per cohort-age in exact integer cents, running
    # over the CALENDAR-BOUNDED (cohort_day x age) grid (the survival-
    # family precedent — the grid is days^2/2 at worst regardless of
    # corpus size, so the per-cohort cumulative window is a bounded-
    # summary window); the per-user average is one integer DIV.
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d0
            FROM events GROUP BY user_id
        ),
        spend AS (
            SELECT f.user_id, f.d0,
                   DATEDIFF('day', f.d0, CAST(e.ts AS TIMESTAMP)) AS age,
                   CAST(ROUND(e.value * 100) AS BIGINT) AS cents
            FROM events e
            JOIN firsts f ON f.user_id = e.user_id
            WHERE e.event_type = 'purchase'
        ),
        cohort_sizes AS (
            SELECT d0, COUNT(*) AS n_users FROM firsts GROUP BY d0
        ),
        grid AS (
            SELECT d0, age,
                   CAST(SUM(cents) AS BIGINT) AS day_cents
            FROM spend GROUP BY d0, age
        )
        SELECT CAST(g.d0 AS TIMESTAMP) AS cohort_day,
               g.age,
               cs.n_users AS cohort_users,
               CAST(SUM(g.day_cents) OVER (PARTITION BY g.d0 ORDER BY g.age
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_cents,
               CAST(SUM(g.day_cents) OVER (PARTITION BY g.d0 ORDER BY g.age
                        ROWS UNBOUNDED PRECEDING) // cs.n_users AS BIGINT)
                   AS ltv_cents_per_user
        FROM grid g JOIN cohort_sizes cs ON cs.d0 = g.d0
        ORDER BY cohort_day, age
    """,
    doc="Cohort LTV curve: cumulative purchase value per user by "
    "cohort age (cohort = first-event day) — the lifetime-value "
    "table under every payback-period and CAC-ceiling decision, and "
    "the spend-side companion to cohort_retention's activity "
    "triangle. Money accumulates as exact integer cents; the "
    "per-user LTV is one integer DIV against the cohort size. The "
    "cumulative window runs over the (cohort_day x age) grid — "
    "CALENDAR-BOUNDED at any corpus size (days^2/2 cells max), so "
    "partitioning by cohort_day is a bounded-summary window, not "
    "the low-cardinality trap. Plan: first-event aggregate, one "
    "(cohort, age) rollup absorbing raw purchase volume map-side, "
    "bounded windows, a broadcast cohort-size join.",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts")).cast("date").alias("d0")
    )
    firsts = firsts.localCheckpoint()  # feeds spend join + cohort sizes
    spend = (
        e.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "d0",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("age"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    sizes = firsts.groupBy("d0").agg(F.count("*").alias("n_users"))
    grid = spend.groupBy("d0", "age").agg(
        F.sum("cents").cast("long").alias("day_cents")
    )
    w = (
        W.partitionBy("d0")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(F.broadcast(sizes), "d0")
        .select(
            F.col("d0").cast("timestamp").alias("cohort_day"),
            F.col("age").cast("long").alias("age"),
            F.col("n_users").alias("cohort_users"),
            F.sum("day_cents").over(w).cast("long").alias("cum_cents"),
            F.expr(
                "CAST(SUM(day_cents) OVER (PARTITION BY d0 ORDER BY age"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " DIV n_users AS BIGINT)"
            ).alias("ltv_cents_per_user"),
        )
        .orderBy("cohort_day", "age")
    )


DAU_MAU_WINDOW = 28  # trailing days in the "monthly" active window


@register(
    "cohort_dau_mau",
    # The oracle spells the textbook band range-join (anchor day within
    # 28 days after an activity day); the Spark plan explodes each
    # (user, day) row into its <= 28 anchor days instead — an EQUI join
    # against the observed day grid, linear x 28 at any scale. Exact
    # BIGINT distinct counts; stickiness is exact ppm with HUGEINT /
    # DECIMAL(38,0) widening before * 1e6.
    oracle=f"""
        WITH ud AS (
            SELECT DISTINCT user_id,
                   CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS day
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM ud),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
            FROM ud GROUP BY day
        ),
        mau AS (
            SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
            FROM days d JOIN ud u
              ON u.day <= d.day
             AND u.day > d.day - INTERVAL {DAU_MAU_WINDOW} DAY
            GROUP BY d.day
        )
        SELECT dau.day, dau.dau, mau.mau,
               CAST(CAST(dau.dau AS HUGEINT) * 1000000 // mau.mau
                    AS BIGINT) AS stickiness_ppm
        FROM dau JOIN mau ON mau.day = dau.day
        ORDER BY dau.day
    """,
    doc=f"DAU / trailing-{DAU_MAU_WINDOW}-day MAU / stickiness per day — "
    f"the engagement headline every consumer product tracks "
    f"(stickiness = DAU/MAU, 'what share of the monthly audience "
    f"shows up daily'). Exact distinct-user counts; stickiness in "
    f"exact integer ppm. Scale plan: the naive form is a windowed "
    f"COUNT DISTINCT (a range join of every activity row against "
    f"every anchor day — the oracle spells it); the Spark plan "
    f"dedups to (user, day) once, EXPLODES each row into its "
    f"<= {DAU_MAU_WINDOW} forward anchor days (sequence + explode), "
    f"semi-joins the bounded observed-day grid, and hash-aggregates "
    f"distinct users per anchor — equi joins only, volume = "
    f"activity-days x {DAU_MAU_WINDOW}, map-side combinable, no "
    f"nested loop at any scale.",
)
def cohort_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id",
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        )
        .distinct()
        .localCheckpoint()  # feeds dau, the day grid, and the explode
    )
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    anchors = ud.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, day + INTERVAL {DAU_MAU_WINDOW - 1} DAY,"
                f" INTERVAL 1 DAY)"
            )
        ).alias("day"),
    ).join(days, "day", "left_semi")
    mau = anchors.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("mau")
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.expr(
                "CAST(CAST(dau AS DECIMAL(38,0)) * 1000000 DIV mau"
                " AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


@register(
    "graph_modularity",
    # Newman modularity of the p_type partition over the basket
    # co-occurrence graph, with NO division anywhere: per community the
    # contribution numerator 4m*e_c - d_c^2 (Q = sum_c num_c / (4m^2))
    # is emitted as an exact integer, widened to HUGEINT/DECIMAL(38,0)
    # before the corpus-scale products. Edges are the same
    # min-support-pruned basket pairs graph_adamic_adar walks.
    oracle=f"""
        WITH l AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM l a JOIN l b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
            HAVING COUNT(*) >= {BASKET_MIN_SUP}
        ),
        m AS (SELECT COUNT(*) AS m_edges FROM pairs),
        typed AS (
            SELECT pr.pa, pr.pb, ta.p_type AS ty_a, tb.p_type AS ty_b
            FROM pairs pr
            JOIN part ta ON ta.p_partkey = pr.pa
            JOIN part tb ON tb.p_partkey = pr.pb
        ),
        deg AS (
            SELECT u, ty, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT pa AS u, ty_a AS ty FROM typed
                UNION ALL
                SELECT pb AS u, ty_b AS ty FROM typed
            ) GROUP BY u, ty
        ),
        comm AS (
            SELECT ty AS p_type,
                   COUNT(*) AS n_parts,
                   CAST(SUM(d) AS BIGINT) AS d_sum
            FROM deg GROUP BY ty
        ),
        intra AS (
            SELECT ty_a AS p_type, CAST(COUNT(*) AS BIGINT) AS e_intra
            FROM typed WHERE ty_a = ty_b GROUP BY ty_a
        )
        SELECT c.p_type, c.n_parts,
               COALESCE(i.e_intra, 0) AS e_intra, c.d_sum,
               CAST(m.m_edges AS BIGINT) AS m_edges,
               CAST(4 * CAST(m.m_edges AS HUGEINT)
                        * COALESCE(i.e_intra, 0)
                    - CAST(c.d_sum AS HUGEINT) * c.d_sum
                    AS BIGINT) AS q_num
        FROM comm c
        LEFT JOIN intra i ON i.p_type = c.p_type
        CROSS JOIN m
        ORDER BY c.p_type
    """,
    doc=f"Newman modularity decomposition of the basket co-occurrence "
    f"graph under the p_type attribute partition — 'do parts of the "
    f"same type cluster in co-purchases', the quantity community-"
    f"detection quality is judged by (and the partition-side "
    f"complement of graph_assortativity's degree correlation): "
    f"Q = sum_c [e_c/m - (d_c/2m)^2]. Emitted with NO floating "
    f"division at all — per community the exact integer numerator "
    f"4m*e_c - d_c^2 plus m, so Q = sum(q_num)/(4m^2) is left to "
    f"the consumer and every emitted cell is engine-exact by "
    f"construction. Edges = distinct basket pairs at support >= "
    f"{BASKET_MIN_SUP} (one self-join, support-pruned early); "
    f"p_type lookups are broadcast joins against the bounded part "
    f"dim; output is |types| rows. At 100 TB the only wide edges "
    f"are the basket self-join (support-pruned) and one degree "
    f"aggregate.",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = l.alias("a"), l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= BASKET_MIN_SUP)
        .select("pa", "pb")
        .localCheckpoint()  # feeds m scalar, typed join, degree agg
    )
    m = pairs.count()
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    typed = (
        pairs.join(
            F.broadcast(p.select(F.col("p_partkey").alias("pa"),
                                 F.col("p_type").alias("ty_a"))),
            "pa",
        )
        .join(
            F.broadcast(p.select(F.col("p_partkey").alias("pb"),
                                 F.col("p_type").alias("ty_b"))),
            "pb",
        )
    )
    deg = (
        typed.select(F.col("pa").alias("u"), F.col("ty_a").alias("ty"))
        .unionAll(
            typed.select(F.col("pb").alias("u"), F.col("ty_b").alias("ty"))
        )
        .groupBy("u", "ty")
        .agg(F.count("*").cast("long").alias("d"))
    )
    comm = deg.groupBy(F.col("ty").alias("p_type")).agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("d").cast("long").alias("d_sum"),
    )
    intra = (
        typed.where(F.col("ty_a") == F.col("ty_b"))
        .groupBy(F.col("ty_a").alias("p_type"))
        .agg(F.count("*").cast("long").alias("e_intra"))
    )
    return (
        comm.join(intra, "p_type", "left")
        .select(
            "p_type",
            "n_parts",
            F.coalesce(F.col("e_intra"), F.lit(0)).cast("long").alias("e_intra"),
            "d_sum",
            F.lit(m).cast("long").alias("m_edges"),
            F.expr(
                f"CAST(4 * CAST({m} AS DECIMAL(38,0)) * COALESCE(e_intra, 0)"
                " - CAST(d_sum AS DECIMAL(38,0)) * d_sum AS BIGINT)"
            ).alias("q_num"),
        )
        .orderBy("p_type")
    )


@register(
    "cohort_returning_new",
    # New-vs-returning split per activity day: a user is NEW on their
    # first-seen day and RETURNING on every later active day. The
    # first-seen date is one per-user aggregate; the daily split then
    # compares dates — no window over the raw stream anywhere, and the
    # returning share is an exact ppm (all-integer, rule 16).
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
            FROM events
        ),
        first_seen AS (
            SELECT user_id, MIN(day) AS d0 FROM act GROUP BY user_id
        )
        SELECT CAST(a.day AS TIMESTAMP) AS day,
               CAST(SUM(CASE WHEN a.day = f.d0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN a.day > f.d0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returning,
               COUNT(*) AS n_active,
               CAST(SUM(CASE WHEN a.day > f.d0 THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT)
                   AS returning_share_ppm
        FROM act a JOIN first_seen f ON f.user_id = a.user_id
        GROUP BY a.day
        ORDER BY day
    """,
    doc="Daily new-vs-returning user split — the growth-accounting "
    "readout every product dashboard leads with (is today's activity "
    "acquisition or retention?), the per-day complement of "
    "cohort_retention's triangle and cohort_dau_mau's stickiness "
    "ratio. A user is NEW on their first-ever active day, RETURNING "
    "on later active days; the returning share is an exact integer "
    "ppm. Plan: one distinct (user, day) shuffle, one per-user MIN "
    "aggregate, one equi-join back on user_id (both sides "
    "user-partitioned — co-located at any scale), one day-grain "
    "aggregate over the calendar-bounded grid. No windows over the "
    "raw stream; at 100 TB the cost is two user-keyed shuffles.",
)
def cohort_returning_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    act = act.localCheckpoint()  # feeds first_seen AND the join probe
    first_seen = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    j = act.join(first_seen, "user_id")
    return (
        j.groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
            F.count("*").cast("long").alias("n_active"),
            F.expr(
                "CAST(SUM(CASE WHEN day > d0 THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("returning_share_ppm"),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "n_new",
            "n_returning",
            "n_active",
            "returning_share_ppm",
        )
        .orderBy("day")
    )


#: Shared first/last per-user contingency construction for the two
#: marginal-change tests below: each user contributes one (first
#: event type, last event type) pair — "did the population's entry
#: behavior shift by exit", the paired-categorical analog of the
#: cohort tables.  Ordering is (CAST(ts), event_id), the
#: markov_transitions tie-break.
_FL_SQL = """
        SELECT user_id,
               MAX(CASE WHEN rf = 1 THEN event_type END) AS first_t,
               MAX(CASE WHEN rl = 1 THEN event_type END) AS last_t
        FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rf,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC)
                       AS rl
            FROM events
        ) r
        GROUP BY user_id
"""


def _fl_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    wf = W.partitionBy("user_id").orderBy("ts", "event_id")
    wl = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "user_id",
        "event_type",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return r.groupBy("user_id").agg(
        F.max(F.when(F.col("rf") == 1, F.col("event_type"))).alias("first_t"),
        F.max(F.when(F.col("rl") == 1, F.col("event_type"))).alias("last_t"),
    )


_SM_CAT = (
    "CASE WHEN {c} IN ('click', 'view') THEN 0"
    " WHEN {c} IN ('purchase', 'signup') THEN 1 ELSE 2 END"
)


@register(
    "agg_stuart_maxwell",
    oracle=f"""
        WITH fl AS ({_FL_SQL}),
        cat AS (
            SELECT {_SM_CAT.format(c='first_t')} AS i,
                   {_SM_CAT.format(c='last_t')} AS j
            FROM fl
        ),
        cells AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   {", ".join(
                       f'''CAST(SUM(CASE WHEN i = {a} AND j = {b}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n{a}{b}'''
                       for a in range(3) for b in range(3))}
            FROM cat
        ),
        t AS (
            SELECT n_users,
                   (n00+n01+n02) - (n00+n10+n20) AS d1,
                   (n10+n11+n12) - (n01+n11+n21) AS d2,
                   (n00+n01+n02) + (n00+n10+n20) - 2*n00 AS s11,
                   (n10+n11+n12) + (n01+n11+n21) - 2*n11 AS s22,
                   -(n01 + n10) AS s12
            FROM cells
        )
        SELECT n_users, d1, d2,
               CASE WHEN CAST(s11 AS HUGEINT)*s22 - CAST(s12 AS HUGEINT)*s12
                         = 0 THEN NULL
                    ELSE ROUND(
                        (CAST(s22 AS DOUBLE)*d1*d1
                         - 2.0*s12*d1*d2
                         + CAST(s11 AS DOUBLE)*d2*d2)
                        / CAST(CAST(s11 AS HUGEINT)*s22
                               - CAST(s12 AS HUGEINT)*s12 AS DOUBLE), 6)
               END AS sm_chi2
        FROM t
        WHERE n_users > 0
    """,
    doc="Stuart-Maxwell marginal-homogeneity test (3 categories, df=2): "
    "did the population's ENTRY behavior mix (first event: browse / "
    "convert / error) shift by EXIT? The k-category generalization "
    "of agg_mcnemar over the per-user (first,last) paired table: "
    "d = (r_i - c_i) marginal deltas and the 2x2 covariance S (s_ii "
    "= r_i + c_i - 2n_ii, s_ij = -(n_ij+n_ji)) in exact integers, "
    "chi2 = d'S^-1·d via the 2x2 adjugate — ONE fixed float "
    "expression over an exact 128-bit determinant, singular S emits "
    "NULL oracle-mirrored. Plan at 100 TB: two per-user rank windows "
    "(one shuffle on user_id) down to a 9-slot pivoted single row; "
    "everything after is constant-size.",
)
def agg_stuart_maxwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    fl = _fl_spark(spark, sf_dir)
    cat = fl.select(
        F.expr(_SM_CAT.format(c="first_t")).alias("i"),
        F.expr(_SM_CAT.format(c="last_t")).alias("j"),
    )
    cells = cat.agg(
        F.count("*").cast("long").alias("n_users"),
        *[
            F.sum(
                F.when((F.col("i") == a) & (F.col("j") == b), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"n{a}{b}")
            for a in range(3)
            for b in range(3)
        ],
    )
    t = cells.select(
        "n_users",
        F.expr("(n00+n01+n02) - (n00+n10+n20)").alias("d1"),
        F.expr("(n10+n11+n12) - (n01+n11+n21)").alias("d2"),
        F.expr("(n00+n01+n02) + (n00+n10+n20) - 2*n00").alias("s11"),
        F.expr("(n10+n11+n12) + (n01+n11+n21) - 2*n11").alias("s22"),
        F.expr("-(n01 + n10)").alias("s12"),
    )
    det = "CAST(s11 AS DECIMAL(38,0))*s22 - CAST(s12 AS DECIMAL(38,0))*s12"
    return t.where("n_users > 0").select(
        "n_users",
        "d1",
        "d2",
        F.expr(
            f"CASE WHEN {det} = 0 THEN NULL"
            f" ELSE ROUND((CAST(s22 AS DOUBLE)*d1*d1 - 2.0*s12*d1*d2"
            f" + CAST(s11 AS DOUBLE)*d2*d2) / CAST({det} AS DOUBLE), 6) END"
        ).alias("sm_chi2"),
    )


@register(
    "agg_bowker_test",
    oracle=f"""
        WITH fl AS ({_FL_SQL}),
        cnt AS (
            SELECT first_t, last_t, CAST(COUNT(*) AS BIGINT) AS c
            FROM fl GROUP BY 1, 2
        ),
        types AS (SELECT DISTINCT event_type AS t FROM events),
        pairs AS (
            SELECT a.t AS ti, b.t AS tj,
                   COALESCE(ab.c, 0) AS nij,
                   COALESCE(ba.c, 0) AS nji
            FROM types a
            JOIN types b ON a.t < b.t
            LEFT JOIN cnt ab ON ab.first_t = a.t AND ab.last_t = b.t
            LEFT JOIN cnt ba ON ba.first_t = b.t AND ba.last_t = a.t
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN nij + nji > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS df,
               CAST(SUM(CASE WHEN nij + nji > 0 THEN
                    CAST(nij - nji AS HUGEINT) * (nij - nji) * 1000000
                        // (nij + nji)
                    ELSE 0 END) AS BIGINT) AS bowker_chi2_ppm
        FROM pairs
        HAVING COUNT(*) > 0
    """,
    doc="Bowker symmetry test over the per-user (first event type -> "
    "last event type) 5x5 table: chi2 = Σ_{{i<j}} (n_ij-n_ji)² / "
    "(n_ij+n_ji) — McNemar's k-category symmetry generalization "
    "(Stuart-Maxwell tests the MARGINS; Bowker tests every off-"
    "diagonal pair). Each of the ≤10 terms is computed as an exact "
    "integer ppm (squared-diff·1e6 DIV sum — rule-13 integer "
    "division, no engine-ordered float sum over terms), df counts "
    "the non-empty pairs. The type-pair grid joins DISTINCT types "
    "(bounded dimension), so absent transitions contribute exact "
    "zeros. Plan at 100 TB: the user shuffle from the shared "
    "first/last construction, then a |types|² bounded join — "
    "constant after the rollup.",
)
def agg_bowker_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    fl = _fl_spark(spark, sf_dir)
    cnt = fl.groupBy("first_t", "last_t").agg(
        F.count("*").cast("long").alias("c")
    )
    e = table(spark, sf_dir, "events")
    types = e.select(F.col("event_type").alias("t")).distinct()
    a, b = types.alias("a"), types.alias("b")
    ab, ba = cnt.alias("ab"), cnt.alias("ba")
    pairs = (
        a.join(b, F.col("a.t") < F.col("b.t"))
        .join(
            ab,
            (F.col("ab.first_t") == F.col("a.t"))
            & (F.col("ab.last_t") == F.col("b.t")),
            "left",
        )
        .join(
            ba,
            (F.col("ba.first_t") == F.col("b.t"))
            & (F.col("ba.last_t") == F.col("a.t")),
            "left",
        )
        .select(
            F.coalesce(F.col("ab.c"), F.lit(0)).alias("nij"),
            F.coalesce(F.col("ba.c"), F.lit(0)).alias("nji"),
        )
    )
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN nij + nji > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("df"),
        F.sum(
            F.expr(
                "CASE WHEN nij + nji > 0 THEN"
                " CAST(nij - nji AS DECIMAL(38,0)) * (nij - nji) * 1000000"
                " DIV (nij + nji) ELSE 0 END"
            )
        )
        .cast("long")
        .alias("bowker_chi2_ppm"),
    )
    return agg.where("n_pairs > 0")


@register(
    "agg_survival_cindex",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d0,
                   CAST(MIN(CASE WHEN event_type = 'purchase'
                                  AND value > {KM_VALUE_CUT}
                             THEN CAST(ts AS TIMESTAMP) END) AS DATE)
                       AS dconv,
                   CAST(LEAST(COUNT(*), 20) AS BIGINT) AS score
            FROM events GROUP BY user_id
        ),
        mx AS (
            SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS dmax
            FROM events
        ),
        lives AS (
            SELECT u.score,
                   CASE WHEN u.dconv IS NOT NULL
                        THEN DATE_DIFF('day', u.d0, u.dconv)
                        ELSE DATE_DIFF('day', u.d0, mx.dmax) END AS t,
                   CASE WHEN u.dconv IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM per_user u CROSS JOIN mx
        ),
        cells AS (
            SELECT score, t, ev, CAST(COUNT(*) AS BIGINT) AS c
            FROM lives GROUP BY 1, 2, 3
        ),
        pairs AS (
            SELECT
                COALESCE(CAST(SUM(CASE WHEN a.score > b.score
                    THEN CAST(a.c AS HUGEINT) * b.c END) AS BIGINT), 0)
                    AS conc,
                COALESCE(CAST(SUM(CASE WHEN a.score < b.score
                    THEN CAST(a.c AS HUGEINT) * b.c END) AS BIGINT), 0)
                    AS disc,
                COALESCE(CAST(SUM(CASE WHEN a.score = b.score
                    THEN CAST(a.c AS HUGEINT) * b.c END) AS BIGINT), 0)
                    AS ties
            FROM cells a JOIN cells b
              ON a.ev = 1
             AND (a.t < b.t OR (a.t = b.t AND b.ev = 0))
        )
        SELECT conc, disc, ties,
               CASE WHEN conc + disc + ties = 0 THEN NULL
                    ELSE CAST((2 * CAST(conc AS HUGEINT) + ties) * 1000000
                         // (2 * (CAST(conc AS HUGEINT) + disc + ties))
                         AS BIGINT)
               END AS c_index_ppm
        FROM pairs
    """,
    doc="Harrell's concordance index for the conversion-survival model: "
    "does higher activity (risk score = event count, capped at 20 — "
    "the binned variable IS the scored variable, stated contract) "
    "predict EARLIER conversion? Usable pairs per Harrell: the "
    "earlier subject's event observed (a.ev=1, a.t<b.t), plus "
    "event-vs-censored ties at equal t; concordant when the earlier "
    "converter had the higher score, score-ties credit 1/2. All pair "
    "mass from the BOUNDED (score≤21 × calendar-day × ev) cell "
    "product in exact 128-bit integers; C = (2·conc+ties)/"
    "(2·(conc+disc+ties)) in rule-13 integer ppm, no-pairs → NULL. "
    "Completes the survival family (KM/NA estimate, logrank tests, "
    "C-index DISCRIMINATES). Plan at 100 TB: one per-user agg "
    "(shuffle on user_id), then constant cell algebra — the "
    "agg_gk_gamma theorem shape.",
)
def agg_survival_cindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("timestamp").cast("date")).alias("d0"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > KM_VALUE_CUT),
                F.col("ts").cast("timestamp").cast("date"),
            )
        ).alias("dconv"),
        F.least(F.count("*"), F.lit(20)).cast("long").alias("score"),
    )
    mx = e.agg(
        F.max(F.col("ts").cast("timestamp").cast("date")).alias("dmax")
    )
    lives = per_user.crossJoin(F.broadcast(mx)).select(
        "score",
        F.when(
            F.col("dconv").isNotNull(), F.datediff("dconv", "d0")
        )
        .otherwise(F.datediff("dmax", "d0"))
        .alias("t"),
        F.when(F.col("dconv").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    cells = lives.groupBy("score", "t", "ev").agg(
        F.count("*").cast("long").alias("c")
    )
    cells = cells.localCheckpoint()  # bounded (21 x days x 2) grid
    a, b = cells.alias("a"), cells.alias("b")
    prod = F.col("a.c").cast("decimal(38,0)") * F.col("b.c")
    pairs = (
        a.join(
            b,
            (F.col("a.ev") == 1)
            & (
                (F.col("a.t") < F.col("b.t"))
                | ((F.col("a.t") == F.col("b.t")) & (F.col("b.ev") == 0))
            ),
        )
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("a.score") > F.col("b.score"), prod))
                .cast("long"),
                F.lit(0),
            ).alias("conc"),
            F.coalesce(
                F.sum(F.when(F.col("a.score") < F.col("b.score"), prod))
                .cast("long"),
                F.lit(0),
            ).alias("disc"),
            F.coalesce(
                F.sum(F.when(F.col("a.score") == F.col("b.score"), prod))
                .cast("long"),
                F.lit(0),
            ).alias("ties"),
        )
    )
    return pairs.select(
        "conc",
        "disc",
        "ties",
        F.expr(
            "CASE WHEN conc + disc + ties = 0 THEN NULL"
            " ELSE CAST((2 * CAST(conc AS DECIMAL(38,0)) + ties) * 1000000"
            " DIV (2 * (CAST(conc AS DECIMAL(38,0)) + disc + ties))"
            " AS BIGINT) END"
        ).alias("c_index_ppm"),
    )


@register(
    "graph_reciprocity",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev_type
            FROM events
        ),
        edges AS (
            SELECT prev_type AS src, event_type AS dst,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM seq
            WHERE prev_type IS NOT NULL AND prev_type <> event_type
            GROUP BY 1, 2
        ),
        paired AS (
            SELECT e.src, e.dst, e.w, COALESCE(r.w, 0) AS wr
            FROM edges e
            LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN wr > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_reciprocated,
               CAST(SUM(w) AS BIGINT) AS total_weight,
               CAST(SUM(LEAST(w, wr)) AS BIGINT) AS reciprocated_weight,
               CAST(SUM(CASE WHEN wr > 0 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS edge_reciprocity_ppm,
               CASE WHEN SUM(w) = 0 THEN NULL
                    ELSE CAST(SUM(LEAST(w, wr)) * 1000000 // SUM(w)
                         AS BIGINT)
               END AS weight_reciprocity_ppm
        FROM paired
        HAVING COUNT(*) > 0
    """,
    doc="Directed-graph reciprocity of the user event-transition graph "
    "(markov_transitions' edge set, self-loops excluded): edge "
    "reciprocity = share of directed edges whose reverse exists, "
    "weighted reciprocity = Σ min(w_ij, w_ji)/Σ w_ij — how symmetric "
    "is behavioral flow (click→view vs view→click). Both ratios in "
    "rule-13 integer ppm over exact counts; the reverse lookup is a "
    "self-LEFT-JOIN on the ≤20-edge bounded transition table. Plan "
    "at 100 TB: one user-partitioned LAG (the markov shuffle), one "
    "hash agg to |types|² edges, constant algebra after.",
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).where("src IS NOT NULL AND src <> dst")
    edges = seq.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("w")
    )
    edges = edges.localCheckpoint()  # ≤|types|² rows, read twice
    ef, er = edges.alias("ef"), edges.alias("er")
    paired = ef.join(
        er,
        (F.col("er.src") == F.col("ef.dst"))
        & (F.col("er.dst") == F.col("ef.src")),
        "left",
    ).select(
        F.col("ef.w").alias("w"),
        F.coalesce(F.col("er.w"), F.lit(0)).alias("wr"),
    )
    agg = paired.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.expr("CASE WHEN wr > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_reciprocated"),
        F.sum("w").cast("long").alias("total_weight"),
        F.sum(F.least("w", "wr")).cast("long").alias("reciprocated_weight"),
    )
    return agg.where("n_edges > 0").select(
        "n_edges",
        "n_reciprocated",
        "total_weight",
        "reciprocated_weight",
        F.expr(
            "CAST(n_reciprocated * 1000000 DIV n_edges AS BIGINT)"
        ).alias("edge_reciprocity_ppm"),
        F.expr(
            "CASE WHEN total_weight = 0 THEN NULL"
            " ELSE CAST(reciprocated_weight * 1000000 DIV total_weight"
            " AS BIGINT) END"
        ).alias("weight_reciprocity_ppm"),
    )


_BT_SCALE = 10**15


@register(
    "llm_bt_ratings_portable",
    oracle=f"""
        WITH per_ut AS (
            SELECT user_id, event_type,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                       AS v3
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT user_id, event_type, v3,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY v3 DESC, event_type) AS rk
            FROM per_ut
        ),
        contests AS (
            SELECT a.event_type AS w, b.event_type AS l
            FROM ranked a JOIN ranked b
              ON b.user_id = a.user_id AND a.rk = 1 AND b.rk = 2
        ),
        games AS (
            SELECT w, l, CAST(COUNT(*) AS BIGINT) AS n FROM contests
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT i, j, CAST(SUM(n) AS BIGINT) AS n_tot FROM (
                SELECT w AS i, l AS j, n FROM games
                UNION ALL SELECT l, w, n FROM games
            ) u GROUP BY 1, 2
        ),
        wins AS (
            SELECT it.i, COALESCE(gw.wn, 0) AS wn, it.g
            FROM (SELECT i, CAST(SUM(n_tot) AS BIGINT) AS g
                  FROM pairs GROUP BY i) it
            LEFT JOIN (SELECT w AS i, CAST(SUM(n) AS BIGINT) AS wn
                       FROM games GROUP BY w) gw ON gw.i = it.i
        ),
        d1 AS (
            SELECT p.i,
                   CAST(SUM(CAST(p.n_tot AS HUGEINT) * {_BT_SCALE}
                        // 2000000) AS HUGEINT) AS den
            FROM pairs p GROUP BY p.i
        ),
        p1 AS (
            SELECT w.i, w.wn, w.g,
                   CASE WHEN d1.den = 0 THEN 0
                        ELSE CAST(CAST(w.wn AS HUGEINT) * {_BT_SCALE}
                             // d1.den AS BIGINT) END AS pp1
            FROM wins w JOIN d1 ON d1.i = w.i
        ),
        d2 AS (
            SELECT p.i,
                   CAST(SUM(CASE WHEN a.pp1 + b.pp1 > 0 THEN
                        CAST(p.n_tot AS HUGEINT) * {_BT_SCALE}
                        // (a.pp1 + b.pp1) ELSE 0 END) AS HUGEINT) AS den
            FROM pairs p
            JOIN p1 a ON a.i = p.i
            JOIN p1 b ON b.i = p.j
            GROUP BY p.i
        ),
        p2 AS (
            SELECT p1.i, p1.wn, p1.g, p1.pp1,
                   CASE WHEN d2.den = 0 THEN 0
                        ELSE CAST(CAST(p1.wn AS HUGEINT) * {_BT_SCALE}
                             // d2.den AS BIGINT) END AS pp2
            FROM p1 JOIN d2 ON d2.i = p1.i
        )
        SELECT i AS item, wn AS wins, g AS games,
               CAST(wn * 1000000 // g AS BIGINT) AS win_share_ppm,
               pp1 AS rating_ppm_r1, pp2 AS rating_ppm_r2
        FROM p2
        ORDER BY i
    """,
    doc="Bradley-Terry preference ratings as a CERTIFIED integer "
    "fixed-point ledger — the chatbot-arena / RLHF reward-rating "
    "stage (which response 'wins' more pairwise contests, strength-"
    "adjusted): contests are each user's top-2 event types by exact "
    "summed value (rank-1 beats rank-2), and two unrolled MM "
    "iterations of p'_i = W_i / Σ_j n_ij/(p_i+p_j) run ENTIRELY in "
    "integers — every reciprocal term is (n·10¹⁵) DIV (pp_i+pp_j) "
    "and every new rating (W·10¹⁵) DIV Σterms, so the ledger is "
    "hash-exact cross-engine with zero float aggregation (the "
    "markov_stationary/kmeans twin discipline applied to the MM "
    "algorithm of Hunter 2004). Zero-win items rate 0; dead pairs "
    "guard the DIV. Plan at 100 TB: one per-(user,type) agg + one "
    "per-user top-2 window (the data-scale stages), then a "
    "≤|types|² bounded ledger.",
)
def llm_bt_ratings_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    per_ut = e.groupBy("user_id", "event_type").agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v3")
    )
    ranked = per_ut.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("v3").desc(), "event_type"
            )
        )
        .alias("rk"),
    )
    a = ranked.where("rk = 1").select(
        F.col("user_id").alias("ua"), F.col("event_type").alias("w")
    )
    b = ranked.where("rk = 2").select(
        F.col("user_id").alias("ub"), F.col("event_type").alias("l")
    )
    contests = a.join(b, F.col("ua") == F.col("ub")).select("w", "l")
    games = contests.groupBy("w", "l").agg(
        F.count("*").cast("long").alias("n")
    )
    games = games.localCheckpoint()  # ≤|types|² rows
    pairs = (
        games.select(F.col("w").alias("i"), F.col("l").alias("j"), "n")
        .unionAll(
            games.select(F.col("l").alias("i"), F.col("w").alias("j"), "n")
        )
        .groupBy("i", "j")
        .agg(F.sum("n").cast("long").alias("n_tot"))
    )
    pairs = pairs.localCheckpoint()  # read three times
    it = pairs.groupBy("i").agg(F.sum("n_tot").cast("long").alias("g"))
    gw = games.groupBy(F.col("w").alias("i")).agg(
        F.sum("n").cast("long").alias("wn")
    )
    wins = it.join(gw, "i", "left").select(
        "i", F.coalesce("wn", F.lit(0)).alias("wn"), "g"
    )
    d1 = pairs.groupBy("i").agg(
        F.sum(
            F.expr(
                f"CAST(n_tot AS DECIMAL(38,0)) * {_BT_SCALE} DIV 2000000"
            )
        ).alias("den")
    )
    p1 = wins.join(d1, "i").select(
        "i",
        "wn",
        "g",
        F.expr(
            f"CASE WHEN den = 0 THEN 0"
            f" ELSE CAST(CAST(wn AS DECIMAL(38,0)) * {_BT_SCALE}"
            f" DIV den AS BIGINT) END"
        ).alias("pp1"),
    )
    p1 = p1.localCheckpoint()  # bounded, read three times
    pa = p1.select(F.col("i").alias("ia"), F.col("pp1").alias("ppa"))
    pb = p1.select(F.col("i").alias("ib"), F.col("pp1").alias("ppb"))
    d2 = (
        pairs.join(pa, F.col("i") == F.col("ia"))
        .join(pb, F.col("j") == F.col("ib"))
        .groupBy("i")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN ppa + ppb > 0 THEN"
                    f" CAST(n_tot AS DECIMAL(38,0)) * {_BT_SCALE}"
                    f" DIV (ppa + ppb) ELSE 0 END"
                )
            ).alias("den")
        )
    )
    p2 = p1.join(d2, "i").select(
        "i",
        "wn",
        "g",
        "pp1",
        F.expr(
            f"CASE WHEN den = 0 THEN 0"
            f" ELSE CAST(CAST(wn AS DECIMAL(38,0)) * {_BT_SCALE}"
            f" DIV den AS BIGINT) END"
        ).alias("pp2"),
    )
    return p2.select(
        F.col("i").alias("item"),
        F.col("wn").alias("wins"),
        F.col("g").alias("games"),
        F.expr("CAST(wn * 1000000 DIV g AS BIGINT)").alias("win_share_ppm"),
        F.col("pp1").alias("rating_ppm_r1"),
        F.col("pp2").alias("rating_ppm_r2"),
    ).orderBy("item")


@register(
    "graph_degree_gini",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT src AS node FROM edges
                  UNION ALL SELECT dst FROM edges) u
            GROUP BY node
        ),
        ranked AS (
            SELECT d, ROW_NUMBER() OVER (ORDER BY d, node) AS i,
                   COUNT(*) OVER () AS n,
                   SUM(d) OVER () AS sd
            FROM deg
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_nodes,
               CAST(MAX(sd) AS BIGINT) AS total_degree,
               CASE WHEN MAX(n) < 2 OR MAX(sd) = 0 THEN NULL
                    ELSE ROUND(
                        CAST(2 * SUM(CAST(i AS HUGEINT) * d)
                             - (MAX(n) + 1) * CAST(MAX(sd) AS HUGEINT)
                             AS DOUBLE)
                        / (CAST(MAX(n) AS DOUBLE) * MAX(sd)), 6)
               END AS degree_gini
        FROM ranked
        HAVING MAX(n) > 0
    """,
    doc="Gini coefficient of the co-purchase degree distribution — the "
    "one-number scale-free-ness / hub-concentration readout that "
    "graph_degree_histogram shows as a table and "
    "graph_assortativity correlates: the exact rank formula "
    "G = (2Σi·d_(i) - (n+1)Σd)/(nΣd) over degrees sorted with a "
    "deterministic (degree, node) tie-break — every term an exact "
    "128-bit integer, ONE float divide. High G = a few hub parts "
    "dominate co-purchases (salting candidates for the join ops). "
    "Plan at 100 TB: the edge build is the bounded within-order "
    "self-join every graph op shares; the rank runs as the "
    "distributed exact rank over the degree table (plans/rank.py — "
    "|parts| scales with the corpus, so no single-task sort).",
)
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarflare_etl_pipeline_spark.plans.rank import with_global_rank

    li = table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    # r11 rewrite (VERDICT r10 What's-wrong #1): |nodes| = |parts|
    # scales with the corpus, so the sorted-rank index i comes from the
    # distributed exact rank (range-repartition + per-partition
    # row_number + bounded offset join, plans/rank.py — bit-identical
    # under the (d, node) total order), and n/Σd fold in the SAME final
    # aggregate instead of whole-table windows.
    ranked = with_global_rank(deg, ["d", "node"], rank_col="i")
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("total_degree"),
        F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * d")).alias("sid"),
    )
    return agg.where("n_nodes > 0").select(
        "n_nodes",
        "total_degree",
        F.expr(
            "CASE WHEN n_nodes < 2 OR total_degree = 0 THEN NULL"
            " ELSE ROUND(CAST(2 * sid - (n_nodes + 1)"
            " * CAST(total_degree AS DECIMAL(38,0)) AS DOUBLE)"
            " / (CAST(n_nodes AS DOUBLE) * total_degree), 6) END"
        ).alias("degree_gini"),
    )


#: Unrolled min-label propagation rounds for graph_cc_portable. Four
#: rounds certify the ITERATION (the k_core_portable discipline) —
#: enough to collapse every component of diameter <= 4 in the dense
#: co-purchase graph; the emitted ledger is the round-4 state either way.
CC_ROUNDS = 4


def _bcast_nodes(df: DataFrame) -> DataFrame:
    """Broadcast-hint a NODE-keyed frame of the co-purchase graph.

    The label/degree tables here are O(|part nodes|) — part is a
    dimension table (catalog.DIM_TABLES: sub-linear in corpus scale),
    so hinting the broadcast replaces a per-round shuffle of the
    2.4M-row symmetric edge list with a map-side hash probe (guide
    §3.1; measured at sf0.1: 0.49s vs 0.67s per propagation round,
    1.27s vs 2.08s for the 4-round loop). Deployments where the node
    table outgrows a broadcast set SOLARFLARE_GRAPH_BCAST=0 to keep
    the shuffle-join plan (and at web scale swap the recurrence for
    large-star/small-star, per the op docstrings). r14: the off
    branch positively hints ``shuffle_merge`` — just dropping the
    broadcast hint left the planner free to re-broadcast from stats
    (verified on the sf0.1 round plans), which defeats the point of
    the switch."""
    import os

    if os.environ.get("SOLARFLARE_GRAPH_BCAST", "1") != "0":
        return F.broadcast(df)
    return df.hint("shuffle_merge")


def _cc_round(edges2: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation round, PRE-checkpoint: pull each
    node's neighbor-min label over the symmetric edge list, fold it
    into the current label with LEAST. Shared verbatim by the three
    CC loops (graph_cc_portable, _cc_history_labels,
    cc_incremental_from_store) so the committed per-round plan dump
    (plans/r14/cc_round_*.txt, VERDICT r13 #9) is the literal plan
    every round executes — the loops checkpoint the result, which
    truncates lineage and hides this join from the final explain."""
    nbr = (
        edges2.join(
            _bcast_nodes(
                labels.select(
                    F.col("node").alias("dst"), F.col("lab").alias("nlab")
                )
            ),
            "dst",
        )
        .groupBy("src")
        .agg(F.min("nlab").alias("mn"))
    )
    return labels.join(
        _bcast_nodes(nbr.withColumnRenamed("src", "node")),
        "node",
        "left",
    ).select(
        "node",
        F.least(F.col("lab"), F.coalesce(F.col("mn"), F.col("lab"))).alias(
            "lab"
        ),
    )


def _cc_round_oracle(k: int) -> str:
    prev = f"l{k - 1}"
    return f"""
        l{k} AS MATERIALIZED (
            SELECT n.node,
                   LEAST(n.lab, COALESCE(m.mn, n.lab)) AS lab
            FROM {prev} n LEFT JOIN (
                SELECT e.src AS node, MIN(l.lab) AS mn
                FROM edges2 e JOIN {prev} l ON e.dst = l.node
                GROUP BY e.src
            ) m ON n.node = m.node
        )"""


@register(
    "graph_cc_portable",
    oracle=f"""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        edges2 AS MATERIALIZED (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, src AS lab FROM edges2
        ),
        {",".join(_cc_round_oracle(k) for k in range(1, CC_ROUNDS + 1))}
        SELECT CAST(lab AS BIGINT) AS component_seed,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM l{CC_ROUNDS}
        GROUP BY lab
    """,
    doc="Connected components of the co-purchase graph as a certified "
    "min-label-propagation ledger — the PORTABLE twin of "
    "llm_dedup_cluster's driver-side union-find (dedup clustering IS "
    "connected components over the duplicate-pair graph; this op puts "
    "the propagation arithmetic itself under the oracle hash, the "
    "graph_k_core_portable discipline): labels seed as each node's own "
    "id and four unrolled rounds take lab <- min(lab, min over "
    "neighbors' lab), certifying the ITERATION — the emitted round-4 "
    "label histogram is bit-defined whether or not the fixture "
    "converged (diameter-4 components have). Edge build is the "
    "bounded within-order self-join every graph op shares "
    "(cap-before-self-join, audited r6). Plan at 100 TB: per round "
    "ONE shuffle-join of the symmetric edge list against the label "
    "table + a map-side-combinable min — the textbook large-graph CC "
    "sweep (rounds ~ diameter; at web scale swap in the alternating "
    "large-star/small-star variant, same per-round plan shape); no "
    "driver-side state anywhere, unlike the union-find it certifies. "
    "(A k-core-style fixpoint short-circuit was tried in r13 and "
    "reverted on measurement — see the in-body note; the >4-diameter "
    "chain-graph test added then remains, pinning the exactly-4-"
    "rounds semantics.)",
)
def graph_cc_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)
    edges2 = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()  # read once per round
    labels = (
        edges2.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint()
    )
    # NOTE (r13): a k-core-style fixpoint short-circuit was tried here
    # and REVERTED on measurement: min-label propagation discovers its
    # fixpoint one round late (l_k == l_{k-1} is only known after
    # round k ran), and every fixture — including the 10x sweep's
    # synthetic graph — still changes labels at round CC_ROUNDS-1, so
    # the change-probe (one node-scale action between rounds, ~0.4s
    # each at sf0.1) never skipped a round and cost ~1s net. The
    # 4-round contract keeps the loop simple; the chain-graph test in
    # tests/test_semantics.py pins the exactly-4-rounds semantics.
    for _ in range(CC_ROUNDS):
        labels = _cc_round(edges2, labels).localCheckpoint()
    return labels.groupBy("lab").agg(
        F.count("*").cast("long").alias("n_nodes")
    ).select(
        F.col("lab").cast("long").alias("component_seed"), "n_nodes"
    )


def _cc_round_oracle2(k: int, edges: str, prefix: str) -> str:
    """One generated min-label round over an arbitrary symmetric edge
    CTE — the _cc_round_oracle recurrence parametrized so the
    incremental op can unroll TWO propagation phases (history graph,
    then contracted batch graph) in one oracle."""
    prev = f"{prefix}{k - 1}"
    return f"""
        {prefix}{k} AS MATERIALIZED (
            SELECT n.node,
                   LEAST(n.lab, COALESCE(m.mn, n.lab)) AS lab
            FROM {prev} n LEFT JOIN (
                SELECT e.src AS node, MIN(l.lab) AS mn
                FROM {edges} e JOIN {prev} l ON e.dst = l.node
                GROUP BY e.src
            ) m ON n.node = m.node
        )"""


#: Cross-run label store for graph_cc_incremental, keyed by sf_dir —
#: the persisted state a daily CC job carries forward (the
#: ensure_signature_store discipline from llm_dedup_near_incremental).
_CC_STORE: dict[str, str] = {}


def _cc_history_labels(spark: SparkSession, sf_dir: str):
    """CC_ROUNDS min-label propagation over the HISTORY co-purchase
    graph (orders with l_orderkey % 5 != 0) — the from-scratch pass the
    store replays once; identical recurrence to graph_cc_portable."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 5 != 0)
    edges = copurchase_edges(li)
    edges2 = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges2.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint()
    )
    for _ in range(CC_ROUNDS):
        labels = _cc_round(edges2, labels).localCheckpoint()
    return labels


def ensure_cc_label_store(spark: SparkSession, sf_dir: str) -> str:
    """Persist the history graph's node -> component-label table once
    per (process, sf) — the state a daily incremental CC job carries
    forward."""
    from solarflare_etl_pipeline_spark.state import store_path

    # Content-addressed path (abspath + source fingerprint — ADVICE
    # r12 #1): equal-basename fixture dirs can't collide, and an
    # in-process rewrite of sf_dir yields a fresh path -> rebuild.
    path = store_path("cc", sf_dir)
    if path not in _CC_STORE:
        _cc_history_labels(spark, sf_dir).write.mode("overwrite").parquet(path)
        _CC_STORE[path] = path
    return path


@register(
    "graph_cc_incremental",
    oracle=f"""
        WITH hedges AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_orderkey % 5 <> 0
        ),
        hedges2 AS MATERIALIZED (
            SELECT src, dst FROM hedges UNION ALL SELECT dst, src FROM hedges
        ),
        h0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, src AS lab FROM hedges2
        ),
        {",".join(_cc_round_oracle2(k, "hedges2", "h") for k in range(1, CC_ROUNDS + 1))},
        store AS MATERIALIZED (SELECT node, lab FROM h{CC_ROUNDS}),
        bedges AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_orderkey % 5 = 0
        ),
        bedges2 AS MATERIALIZED (
            SELECT src, dst FROM bedges UNION ALL SELECT dst, src FROM bedges
        ),
        cedges AS MATERIALIZED (
            SELECT DISTINCT COALESCE(sa.lab, e.src) AS src,
                            COALESCE(sb.lab, e.dst) AS dst
            FROM bedges2 e
            LEFT JOIN store sa ON e.src = sa.node
            LEFT JOIN store sb ON e.dst = sb.node
            WHERE COALESCE(sa.lab, e.src) <> COALESCE(sb.lab, e.dst)
        ),
        c0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, src AS lab FROM cedges
        ),
        {",".join(_cc_round_oracle2(k, "cedges", "c") for k in range(1, CC_ROUNDS + 1))},
        remap AS MATERIALIZED (SELECT node, lab FROM c{CC_ROUNDS}),
        allnodes AS MATERIALIZED (
            SELECT node, lab FROM store
            UNION ALL
            SELECT DISTINCT e.src AS node, e.src AS lab
            FROM bedges2 e LEFT JOIN store s ON e.src = s.node
            WHERE s.node IS NULL
        ),
        final AS (
            SELECT a.node, COALESCE(r.lab, a.lab) AS lab
            FROM allnodes a LEFT JOIN remap r ON a.lab = r.node
        )
        SELECT CAST(lab AS BIGINT) AS component_seed,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM final GROUP BY lab
    """,
    doc="INCREMENTAL connected components — the missing cross-run form "
    "VERDICT r11 task #6 names: a daily corpus append must NOT "
    "re-propagate the whole graph. The history graph's node -> label "
    "table (orders with l_orderkey % 5 != 0, ~80%) is persisted state "
    "(ensure_cc_label_store — the llm_dedup_near_incremental "
    "append-only discipline); each run self-joins ONLY the new batch "
    "(l_orderkey % 5 = 0) into edges, CONTRACTS both endpoints through "
    "the stored labels (unseen nodes keep their own id), and runs the "
    "CC_ROUNDS min-label recurrence over the contracted graph — whose "
    "size is O(batch components), not O(corpus): contraction collapses "
    "every settled history component to one node, so per-day cost is "
    "the batch self-join + a propagation over a graph bounded by the "
    "batch. Output is the same component histogram as "
    "graph_cc_portable over ALL nodes (stored nodes remapped through "
    "the contracted labels + new batch-only nodes) — "
    "tests/test_semantics.py proves incremental == from-scratch == "
    "union-find truth on every fixture. Plan at 100 TB: the history "
    "store is a bucketed-by-node parquet table (point-lookup joins, "
    "no history shuffle); only batch-sized frames enter the rounds. "
    "The oracle unrolls BOTH phases (history propagation -> store, "
    "contraction -> batch propagation -> remap) so the incremental "
    "arithmetic itself is under the driver hash, not just the result.",
)
def graph_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cc_incremental_from_store(
        spark, sf_dir, ensure_cc_label_store(spark, sf_dir)
    )


def cc_incremental_from_store(
    spark: SparkSession, sf_dir: str, store_path: str
) -> DataFrame:
    """graph_cc_incremental against an EXPLICIT label-store path — the
    seam the maintenance ops certify through: the equality-proof tests
    run this against a file-compacted copy of the store and assert
    identical components. The registered op always reads the canonical
    ensure_cc_label_store path, so maintenance runs never mutate
    shared in-process state."""
    store = spark.read.parquet(store_path)
    bli = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 5 == 0)
    bedges = copurchase_edges(bli)
    bedges2 = bedges.unionAll(
        bedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()  # read by cedges AND the new-node scan
    sa = store.select(F.col("node").alias("src"), F.col("lab").alias("la"))
    sb = store.select(F.col("node").alias("dst"), F.col("lab").alias("lb"))
    cedges = (
        bedges2.join(sa, "src", "left")
        .join(sb, "dst", "left")
        .select(
            F.coalesce(F.col("la"), F.col("src")).alias("src"),
            F.coalesce(F.col("lb"), F.col("dst")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()  # batch-bounded, read once per round
    )
    remap = (
        cedges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint()
    )
    for _ in range(CC_ROUNDS):
        remap = _cc_round(cedges, remap).localCheckpoint()
    new_nodes = (
        bedges2.select(F.col("src").alias("node"))
        .distinct()
        .join(store.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("lab"))
    )
    allnodes = store.unionByName(new_nodes)
    final = allnodes.join(
        _bcast_nodes(
            remap.select(
                F.col("node").alias("lab"), F.col("lab").alias("rlab")
            )
        ),
        "lab",
        "left",
    ).select("node", F.coalesce(F.col("rlab"), F.col("lab")).alias("lab"))
    return final.groupBy("lab").agg(
        F.count("*").cast("long").alias("n_nodes")
    ).select(
        F.col("lab").cast("long").alias("component_seed"), "n_nodes"
    )


@register(
    "funnel_time_to_convert",
    oracle="""
        WITH fv AS (
            SELECT user_id,
                   MIN(CAST(ts AS TIMESTAMP)) AS v_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        fp AS (
            SELECT e.user_id,
                   MIN(CAST(e.ts AS TIMESTAMP)) AS p_ts
            FROM events e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(e.ts AS TIMESTAMP) >= fv.v_ts
            GROUP BY e.user_id
        ),
        lat AS (
            SELECT CAST(DATEDIFF('second', fv.v_ts, fp.p_ts) // 60
                        AS BIGINT) AS mins
            FROM fv JOIN fp ON fv.user_id = fp.user_id
        ),
        grid AS (
            SELECT mins, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY mins
        ),
        q AS (
            SELECT mins,
                   SUM(c) OVER (ORDER BY mins) AS cum,
                   SUM(c) OVER () AS n
            FROM grid
        ),
        quants AS (
            SELECT MIN(CASE WHEN cum * 2 >= n THEN mins END) AS p50,
                   MIN(CASE WHEN cum * 10 >= n * 9 THEN mins END) AS p90,
                   CAST(MAX(n) AS BIGINT) AS n_converted
            FROM q
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fv) AS n_viewers,
               COALESCE(quants.n_converted, 0) AS n_converted,
               CAST(COALESCE(quants.n_converted, 0) * 1000000
                    // (SELECT COUNT(*) FROM fv) AS BIGINT)
                   AS conversion_ppm,
               quants.p50 AS p50_minutes,
               quants.p90 AS p90_minutes
        FROM quants
        WHERE (SELECT COUNT(*) FROM fv) > 0
    """,
    doc="Funnel latency: how FAST do viewers convert, not just how "
    "many — the readout funnel_steps (counts) and funnel_sessionized "
    "(visit-grain counts) leave open: per user, the first view and "
    "the first purchase AT OR AFTER it define the conversion latency; "
    "exact P50/P90 come from the cumulative distinct-value grid over "
    "minute-quantized latencies (the agg_pinball_loss discipline — "
    "bounded by the time-range discretization, never a data-scale "
    "rank), conversion rate in rule-13 ppm. Latency quantiles are THE "
    "product-analytics SLA number (median time-to-purchase) and the "
    "same shape a training pipeline uses for data-arrival lag. Plan "
    "at 100 TB: two per-user hash aggs (map-side combinable) + one "
    "equi-join on user_id + one bounded grid window — no window ever "
    "sees raw events.",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    fv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("timestamp")).alias("v_ts"))
    )
    fv = fv.localCheckpoint()  # read three times (join + two counts)
    fp = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("timestamp").alias("p_raw"))
        .join(fv, "user_id")
        .where(F.col("p_raw") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("p_raw").alias("p_ts"))
    )
    lat = fv.join(fp, "user_id").select(
        F.expr(
            "CAST(CAST(unix_seconds(p_ts) - unix_seconds(v_ts) AS BIGINT)"
            " DIV 60 AS BIGINT)"
        ).alias("mins")
    )
    grid = lat.groupBy("mins").agg(F.count("*").cast("long").alias("c"))
    q = grid.select(
        "mins",
        F.sum("c").over(W.orderBy("mins")).cast("long").alias("cum"),
        F.sum("c").over(W.partitionBy()).cast("long").alias("n"),
    )
    quants = q.agg(
        F.min(F.when(F.expr("cum * 2 >= n"), F.col("mins"))).alias("p50"),
        F.min(F.when(F.expr("cum * 10 >= n * 9"), F.col("mins"))).alias(
            "p90"
        ),
        F.max("n").cast("long").alias("n_converted"),
    )
    nv = fv.agg(F.count("*").cast("long").alias("n_viewers"))
    return (
        nv.crossJoin(F.broadcast(quants))
        .where("n_viewers > 0")
        .select(
            "n_viewers",
            F.coalesce(F.col("n_converted"), F.lit(0)).alias("n_converted"),
            F.expr(
                "CAST(COALESCE(n_converted, 0) * 1000000"
                " DIV n_viewers AS BIGINT)"
            ).alias("conversion_ppm"),
            F.col("p50").alias("p50_minutes"),
            F.col("p90").alias("p90_minutes"),
        )
    )


# --- Daily incremental pipeline flagship -----------------------------------
# Registered here because analytics loads AFTER text and similarity in
# registry.load_all(), so the three component oracles are available in
# REGISTRY at import time; the explicit imports below make a direct
# `import analytics` equally safe.
from solarflare_etl_pipeline_spark.operators import (  # noqa: E402
    similarity as _similarity,  # noqa: F401  (registers llm_dedup_near_incremental)
    text as _text,  # noqa: F401  (registers llm_pack_ffd_incremental)
)
from solarflare_etl_pipeline_spark.registry import REGISTRY as _REG  # noqa: E402

_FFD_INC_ORACLE = _REG["llm_pack_ffd_incremental"].oracle
_NEAR_INC_ORACLE = _REG["llm_dedup_near_incremental"].oracle
_CC_INC_ORACLE = _REG["graph_cc_incremental"].oracle


@register(
    "flagship_incremental_daily",
    oracle=f"""
        SELECT f.bins_touched, f.batch_chunks, f.batch_tokens,
               g.n_components, g.n_nodes, h.batch_dup_pairs
        FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS bins_touched,
                   CAST(COALESCE(SUM(n_new_chunks), 0) AS BIGINT)
                     AS batch_chunks,
                   CAST(COALESCE(SUM(new_tokens), 0) AS BIGINT)
                     AS batch_tokens
            FROM ({_FFD_INC_ORACLE}) ffd
        ) f, (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
                   CAST(COALESCE(SUM(n_nodes), 0) AS BIGINT) AS n_nodes
            FROM ({_CC_INC_ORACLE}) cc
        ) g, (
            SELECT CAST(COUNT(*) AS BIGINT) AS batch_dup_pairs
            FROM ({_NEAR_INC_ORACLE}) nd
        ) h
    """,
    doc="The DAILY-APPEND pipeline in one query — the operational story "
    "the round-12 incremental family exists for: yesterday's corpus "
    "state is persisted (MinHash banding store, FFD run table, CC "
    "label store) and today's batch flows through near-dedup -> "
    "sequence packing -> co-purchase component merge touching ONLY "
    "O(batch) data, never re-reading history. Emits the one-row daily "
    "ops readout: bins the packer touched, batch chunks/tokens placed, "
    "component count and covered nodes after the label merge, and "
    "near-duplicate pairs involving the batch. Each component is "
    "itself oracle-certified (llm_pack_ffd_incremental, "
    "graph_cc_incremental, llm_dedup_near_incremental) and this "
    "flagship's oracle composes those three oracles verbatim, so the "
    "composite hash certifies the pipeline END TO END. Plan: three "
    "independent batch-sized subplans folded to one row each, "
    "combined by 1x1x1 broadcast cross joins — at 100 TB the nightly "
    "cost is the three batch passes, constant state reads, and "
    "nothing else.",
)
def flagship_incremental_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor, as_completed

    # The three component pipelines are INDEPENDENT until the final
    # 1x1x1 broadcast fold, but each one runs eager driver-blocking
    # work while it is being CONSTRUCTED (localCheckpoints of the
    # batch frames, the FFD bounded-histogram collect). Building them
    # sequentially serialized those actions; a 3-thread pool overlaps
    # them so the tail of one component's jobs back-fills the others'
    # idle executors (guide §2.6). Store paths are resolved serially
    # first — the ensure_* helpers guard module caches check-then-act.
    # INVARIANT (ADVICE r13): ops run concurrently on the SHARED
    # session, so no pooled component may mutate session-global state
    # (spark.conf.set, catalog writes) — all three are pure
    # DataFrame-composition ops over the read-only stores; any future
    # component that touches session conf must leave this pool.
    # Futures are drained with as_completed so the first failure
    # raises immediately instead of blocking on an unrelated sibling.
    from solarflare_etl_pipeline_spark.operators.similarity import (
        ensure_signature_store,
    )
    from solarflare_etl_pipeline_spark.operators.text import (
        ensure_ffd_run_store,
    )

    ensure_ffd_run_store(spark, sf_dir)
    ensure_cc_label_store(spark, sf_dir)
    ensure_signature_store(spark, sf_dir)
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = {
            pool.submit(
                _REG["llm_pack_ffd_incremental"].spark, spark, sf_dir
            ): "ffd",
            pool.submit(
                _REG["graph_cc_incremental"].spark, spark, sf_dir
            ): "cc",
            pool.submit(
                _REG["llm_dedup_near_incremental"].spark, spark, sf_dir
            ): "nd",
        }
        out = {}
        for fut in as_completed(futs):
            out[futs[fut]] = fut.result()  # first failure raises now
    ffd, cc, nd = out["ffd"], out["cc"], out["nd"]
    f = ffd.agg(
        F.count("*").cast("long").alias("bins_touched"),
        F.coalesce(F.sum("n_new_chunks"), F.lit(0))
        .cast("long")
        .alias("batch_chunks"),
        F.coalesce(F.sum("new_tokens"), F.lit(0))
        .cast("long")
        .alias("batch_tokens"),
    )
    g = cc.agg(
        F.count("*").cast("long").alias("n_components"),
        F.coalesce(F.sum("n_nodes"), F.lit(0)).cast("long").alias("n_nodes"),
    )
    h = nd.agg(F.count("*").cast("long").alias("batch_dup_pairs"))
    return f.crossJoin(F.broadcast(g)).crossJoin(F.broadcast(h))
