"""Transcripts → entity membership → co-occurrence edge induction.

The load-bearing construction (SURVEY.md §1.2, §2.3 J1): vertices are
conv/tool/role entities; two entities that co-occur within the same
conversation (optionally within a bounded turn window) get an undirected
edge weighted by the number of DISTINCT conversations in which they
co-occur — the transposition of the reference's common-neighbor count
(/root/reference/tool/Neo4jLouvainProcessor.py:183-210: pairs of What
nodes weighted by COUNT(DISTINCT common entity)).

Scale notes (10^12-turn design):
- the pair join is keyed on conv_id; a single huge conversation is the
  skew risk. The turn-window cap bounds per-turn fan-out to O(window),
  and the banded join (bucket = turn_idx // window) keeps each join
  group at O(window) rows instead of O(conversation length).
- distinct-conv weighting is computed as select(src,dst,conv).distinct()
  → count, so the wide shuffle key includes conv_id (no hot key), and the
  final groupBy(src,dst) count enjoys map-side partial aggregation.
- vertex ids: dense sorted rank — deterministic across runs/cluster
  sizes (monotonically_increasing_id is partition-dependent and would
  break parity). The global sort is over the *entity dictionary* (tiny
  relative to the corpus: |tools|+|roles|+|convs|), not the turn table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def membership(
    transcripts: DataFrame,
    include_conv: bool = True,
    include_role: bool = True,
    include_tool: bool = True,
) -> DataFrame:
    """Explode transcripts into (conv_id, turn_idx, entity, etype) rows.

    The analog of the reference's What→entity edges
    (/root/reference/tool/upload.py:118-163), done with explode over a
    struct array — pure Catalyst, no Python.
    """
    if not (include_conv or include_role or include_tool):
        raise ValueError("at least one entity family must be included")
    parts = []
    if include_tool:
        parts.append(
            F.when(
                F.col("tool").isNotNull(),
                F.struct(
                    F.concat(F.lit("tool:"), F.col("tool")).alias("entity"),
                    F.lit("tool").alias("etype"),
                ),
            )
        )
    if include_role:
        parts.append(
            F.struct(
                F.concat(F.lit("role:"), F.col("role")).alias("entity"),
                F.lit("role").alias("etype"),
            )
        )
    if include_conv:
        parts.append(
            F.struct(
                F.concat(F.lit("conv:"), F.col("conv_id")).alias("entity"),
                F.lit("conv").alias("etype"),
            )
        )
    ent = F.explode(F.array(*parts)).alias("e")
    out = transcripts.select("conv_id", "turn_idx", ent)
    return out.where(F.col("e").isNotNull()).select(
        "conv_id", "turn_idx", F.col("e.entity").alias("entity"), F.col("e.etype").alias("etype")
    )


def entity_vertices(mem: DataFrame, rank_partitions: int = 64) -> DataFrame:
    """Distinct entities with stable dense ids (sorted-name rank, 0-based).

    Uses the shared two-phase distributed rank (plans/rank.py) — exactly
    the global-sort rank, no single-partition window. Deterministic and
    cluster-size-independent (never monotonically_increasing_id).
    """
    from louvain_spark.plans.rank import dense_sorted_rank

    ents = mem.select("entity", "etype").distinct()
    return dense_sorted_rank(ents, "entity", partitions=rank_partitions).select(
        "id", F.col("entity").alias("name"), F.col("etype").alias("vtype")
    )


def _with_ids(
    mem: DataFrame, vertices: DataFrame, broadcast_nodes: int = 4_000_000
) -> DataFrame:
    """Attach vertex ids to membership rows via the entity dictionary.

    The dictionary is O(|entities|), which includes one conv: entity per
    conversation — broadcastable at test scale but ~10^10 rows at the
    10^12-turn design point, far past any broadcast. Same count-gated
    auto-choice as typed_edges/pagerank/lpa/louvain dimension joins:
    broadcast below broadcast_nodes rows, shuffled-hash join on entity
    name above it (hash, not sort-merge: the dictionary side skips the
    sort and the membership side is orders of magnitude larger; entity
    names hash uniformly). vertices from entity_vertices is already
    localCheckpointed (plans/rank.py), so the gate's count() reads
    checkpoint blocks — no lineage re-execution.
    """
    d = vertices.select(F.col("name").alias("entity"), "id", F.col("vtype"))
    if vertices.count() <= broadcast_nodes:
        d = F.broadcast(d)
    else:
        d = d.hint("shuffle_hash")
    return mem.join(d, "entity")


def cooccurrence_edges(
    transcripts: DataFrame,
    vertices: DataFrame | None = None,
    window: int | None = None,
    include_conv: bool = True,
    include_role: bool = True,
    include_tool: bool = True,
    salt_buckets: int = 256,
    salt_threshold: int = 65536,
    salt_target_pairs: int = 1 << 26,
) -> tuple[DataFrame, DataFrame]:
    """Induce the canonical undirected co-occurrence edge table.

    Returns (vertices, edges) where edges = (src:long < dst:long,
    weight:double = COUNT(DISTINCT conv_id), etypes:array<string>).

    window=None → co-occurrence anywhere within the conversation;
    window=w → only entity occurrences within |Δturn_idx| <= w pair up
    (banded join: each side bucketed by turn_idx // w, right side
    replicated to adjacent buckets — bounds join-group size for huge
    conversations).

    Hub salting (window=None only; SURVEY §4.3): a single huge
    conversation puts its whole membership — and its QUADRATIC pair
    output — into ONE conv_id join group, computed by one task (AQE's
    runtime skew-split did not rescue this shape in measurement:
    BENCH/skew_induce_r5.md). Conversations whose membership exceeds
    salt_threshold rows (histogram pre-pass, plans/skew.heavy_keys —
    the reference's 'histogram first' pattern) get 2-D blocked
    self-joins: per conversation, nb = min(salt_buckets,
    ceil(rows/sqrt(salt_target_pairs))) and each occurrence row gets a
    block coordinate h = hash(id, turn_idx) % nb — the ROW, not just
    id, because a dominant entity (role:assistant on half the turns)
    would keep all its occurrences in one id-hash block. The left side
    holds (_ia = h, all _ib), the right (_ib = h, all _ia); joining on
    (conv, _ia, _ib) makes every pair meet exactly once at (h(a), h(b))
    while per-task pair work is bounded at ~salt_target_pairs and
    per-task input at ~2·rows/nb — independent of AQE. Results are
    identical (pure plan change; duplicate (src,dst,conv) pair rows
    from multi-turn entities existed unsalted too and the same distinct
    absorbs them). Replication cost is explicit: each hot side travels
    nb×. salt_buckets<=1 disables. The banded path needs no salting —
    its groups are O(window) by construction.
    """
    mem = membership(transcripts, include_conv, include_role, include_tool)
    if vertices is None:
        vertices = entity_vertices(mem)
    m = _with_ids(mem, vertices).select("conv_id", "turn_idx", "id")

    if window is None:
        if salt_buckets and salt_buckets > 1:
            import math

            from louvain_spark.plans.skew import heavy_keys

            chunk = max(1.0, math.sqrt(float(salt_target_pairs)))
            hot = heavy_keys(m, "conv_id", salt_threshold).select(
                "conv_id",
                F.least(
                    F.lit(int(salt_buckets)),
                    F.greatest(
                        F.lit(2),
                        F.ceil(F.col("count") / F.lit(chunk)).cast("int"),
                    ),
                ).alias("_nb"),
            )
            mt = m.join(F.broadcast(hot), "conv_id", "left").withColumn(
                "_nb", F.coalesce("_nb", F.lit(1))
            )
            rowh = F.pmod(F.xxhash64("id", "turn_idx"), F.col("_nb")).cast("int")
            blocks = F.explode(F.sequence(F.lit(0), F.col("_nb") - 1))
            a = mt.select(
                "conv_id", "id", rowh.alias("_ia"), blocks.alias("_ib")
            ).alias("a")
            b = mt.select(
                "conv_id", "id", rowh.alias("_ib"), blocks.alias("_ia")
            ).alias("b")
            pairs = a.join(b, on=["conv_id", "_ia", "_ib"]).where(
                F.col("a.id") < F.col("b.id")
            )
        else:
            a = m.alias("a")
            b = m.alias("b")
            pairs = a.join(b, on="conv_id").where(F.col("a.id") < F.col("b.id"))
    else:
        band = max(int(window), 1)  # window=0 → same-turn only; band by turn
        # 2-band replication (r7; was 3-band): the b side explodes only to
        # {its band, its band + 1}, so an occurrence pair spanning adjacent
        # bands meets exactly once with a = the LATER-band occurrence (b
        # replicated up into a's band), and a same-band pair — which the
        # join produces in both role orders — keeps exactly one order via
        # the (turn_idx, id) lexicographic tiebreak. Probe volume drops by
        # a third vs replicating b to {-1,0,+1} with the a.id<b.id filter;
        # the (src,dst,conv) set after canonicalization is IDENTICAL
        # (verified exceptAll-equal both ways at the bench shape, and the
        # distinct absorbs occurrence-pair multiplicity differences).
        # shuffle_hash on the unreplicated a side: the planner's default
        # sort-merge pays an O(n log n) sort of BOTH shuffled sides on the
        # (conv_id, _b) string key; hashing the smaller side skips it
        # (measured 3.2s → 1.7s for the full pair phase at 11.4M pairs).
        a = m.withColumn("_b", (F.col("turn_idx") / band).cast("long")).alias("a")
        b = (
            m.withColumn(
                "_b", F.explode(F.array(*[
                    ((F.col("turn_idx") / band).cast("long") + d) for d in (0, 1)
                ]))
            )
        ).alias("b")
        pairs = (
            a.hint("shuffle_hash")
            .join(b, on=[a["conv_id"] == b["conv_id"], a["_b"] == b["_b"]])
            .where(F.abs(F.col("a.turn_idx") - F.col("b.turn_idx")) <= window)
            .where(F.col("a.id") != F.col("b.id"))
            .where(
                (
                    F.struct(F.col("a.turn_idx"), F.col("a.id"))
                    < F.struct(F.col("b.turn_idx"), F.col("b.id"))
                )
                | ((F.col("b.turn_idx") / band).cast("long") != F.col("b._b"))
            )
        )
        proj = pairs.select(
            F.least(F.col("a.id"), F.col("b.id")).alias("src"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("dst"),
            F.col("a.conv_id").alias("conv_id"),
        )

    if window is None:
        proj = pairs.select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.col("a.conv_id").alias("conv_id"),
        )
    # distinct on (src,dst,conv) carries conv_id in the shuffle key → no hot
    # key; the final count has map-side combine. etypes (the reference's
    # COLLECT(DISTINCT type(r)), /root/reference/tool/Neo4jLouvainProcessor.py:202-203)
    # are pure functions of the endpoint vertices in this model, so they
    # attach via two broadcast dictionary joins AFTER the wide aggregation
    # instead of dragging two string columns through the pair shuffle.
    per_conv = proj.distinct()
    counts = per_conv.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
    # vtype is an id-RANGE when ids are dense ranks over entity names and
    # the name prefix is the vtype ('conv:' < 'role:' < 'tool:' sorts by
    # type): three boundary scalars replace two more 400k-row broadcast
    # builds. That only holds for entity_vertices-produced dictionaries —
    # validate (contiguous: per-type count == hi-lo+1, and ranges
    # disjoint) and fall back to broadcast dictionary joins for caller-
    # supplied vertex tables with other id assignments.
    stats = (
        vertices.groupBy("vtype")
        .agg(
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    bounds = {r["vtype"]: (r["lo"], r["hi"]) for r in stats}
    spans = sorted((r["lo"], r["hi"]) for r in stats)
    contiguous = all(r["hi"] - r["lo"] + 1 == r["cnt"] for r in stats) and all(
        spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1)
    )

    if contiguous:
        def _vt(col):
            expr = F.lit(None).cast("string")
            for vt, (lo, hi) in bounds.items():
                expr = F.when(F.col(col).between(lo, hi), F.lit(vt)).otherwise(expr)
            return expr

        edges = counts.select(
            "src",
            "dst",
            "weight",
            F.array_sort(F.array_distinct(F.array(_vt("src"), _vt("dst")))).alias("etypes"),
        )
    else:
        vt_dim = vertices.select("id", "vtype")
        edges = (
            counts.join(
                F.broadcast(vt_dim.select(F.col("id").alias("src"), F.col("vtype").alias("_ts"))),
                "src",
            )
            .join(
                F.broadcast(vt_dim.select(F.col("id").alias("dst"), F.col("vtype").alias("_td"))),
                "dst",
            )
            .select(
                "src",
                "dst",
                "weight",
                F.array_sort(F.array_distinct(F.array("_ts", "_td"))).alias("etypes"),
            )
        )
    return vertices, edges


def turn_adjacency_edges(transcripts: DataFrame, vertices: DataFrame) -> DataFrame:
    """Consecutive-turn tool-transition edges via lag window (SURVEY §2.5).

    For each conversation ordered by turn_idx, link the tools of
    consecutive tool-bearing turns; weight = distinct conversations.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.concat(F.lit("tool:"), F.col("tool")).alias("entity"),
    )
    t = t.withColumn("prev", F.lag("entity").over(w)).where(
        F.col("prev").isNotNull() & (F.col("prev") != F.col("entity"))
    )
    dict_df = F.broadcast(vertices.select(F.col("name").alias("entity"), F.col("id").alias("_dst")))
    dict_p = F.broadcast(vertices.select(F.col("name").alias("prev"), F.col("id").alias("_src")))
    pairs = t.join(dict_df, "entity").join(dict_p, "prev").select(
        F.least("_src", "_dst").alias("src"),
        F.greatest("_src", "_dst").alias("dst"),
        "conv_id",
    )
    return (
        pairs.distinct()
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def typed_edges(
    df: DataFrame,
    src_col,
    dst_col,
    etype: str,
    vertices: DataFrame | None = None,
    broadcast_nodes: int = 4_000_000,
) -> DataFrame:
    """Directed typed relation edges — the co-occurrence-orthogonal edge
    family the reference materializes as Who-[:BELONGS_TO]->organization
    (/root/reference/tool/upload.py:118-163): a direct source-row relation
    (src entity, dst entity) counted, not a shared-context induction.

    Aggregates BEFORE the dictionary join (map-side partial count, the
    wide shuffle carries only name pairs), then maps names→ids against
    `vertices` (id, name) — broadcast while the dictionary is below
    broadcast_nodes rows (the same auto-gate as pagerank/lpa/louvain),
    shuffle join above it. Returns (src, dst, etype, weight) with ids when
    vertices is given, else (src_name, dst_name, etype, weight).
    """
    pairs = df.select(F.col(src_col).alias("_sn"), F.col(dst_col).alias("_dn"))
    agg = pairs.groupBy("_sn", "_dn").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
    if vertices is None:
        return agg.select(
            F.col("_sn").alias("src_name"),
            F.col("_dn").alias("dst_name"),
            F.lit(etype).alias("etype"),
            "weight",
        )
    jb = F.broadcast if vertices.count() <= broadcast_nodes else (lambda d: d)
    ds = jb(vertices.select(F.col("name").alias("_sn"), F.col("id").alias("src")))
    dd = jb(vertices.select(F.col("name").alias("_dn"), F.col("id").alias("dst")))
    return (
        agg.join(ds, "_sn")
        .join(dd, "_dn")
        .select("src", "dst", F.lit(etype).alias("etype"), "weight")
    )
