"""Country-graph spatial lag (SURVEY.md §2.4 #34, reference splag_country.py).

The reference densifies a month×country×country adjacency tensor and runs a
recursive per-(month, country) BFS in Python (`splag_country.py:75-186`),
then a weighted sum over the resulting neighbour ring (`:251-291`).

Spark-first re-expression — everything set-based:
  * n-th-order reachability R_n (self *included*, matching
    `get_nth_order_neighbours_from_tensor`) = n iterated self-joins of the
    edge table, unioned + distinct.
  * ring(inner→outer) = R_outer ANTI JOIN R_inner (the np.setdiff at
    `splag_country.py:127`).
  * weights = centroid_distance(target, neighbour)^kernel_power from a
    broadcast cross-join of the small centroid dim (`utilities.py:368-403`);
    optional per-target normalization.
  * lag = value ⋈ ring, one hash aggregate per (month, target).

The hop count (inner+width) is tiny (≤ ~3 in practice) so the plan is a
handful of joins; the *edge table* can be billions of rows and it still
holds — no driver-side loops over months or countries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..panel import KEYS, TIME, UNIT, feature_cols, materialize


def nth_order_reachability(edges: DataFrame, n: int) -> DataFrame:
    """R_n(month_id, c, n_id): countries within n hops of c (self included,
    order 0 = {self}) under the time-varying adjacency edges(month_id, a_id,
    b_id). Iterated self-join + distinct, n is a small Python int."""
    nodes = edges.select("month_id", F.col("a_id").alias("c")).distinct()
    r = nodes.select("month_id", "c", F.col("c").alias("n_id"))
    for _ in range(n):
        step = (
            r.join(
                edges.select("month_id", F.col("a_id").alias("n_id"), F.col("b_id").alias("next_id")),
                ["month_id", "n_id"],
            )
            .select("month_id", "c", F.col("next_id").alias("n_id"))
        )
        r = r.union(step).distinct()
    return r


def neighbour_ring(edges: DataFrame, kernel_inner: int, kernel_width: int) -> DataFrame:
    """Ring of countries with graph order in (inner-1, inner-1+width]
    (reference `splag_cm`: ninner = kernel_inner-1, nouter = ninner+width;
    ring = R_nouter \\ R_ninner; kernel_inner=0 means the inner set is empty
    so the ring includes self).

    Closed-form hop compositions (r14; generalizes r13's ring-1 algebra,
    which replaced the r5 shared BFS iteration): both reachability sets
    come from the k-fold edge compositions H_k, so there is no running
    union-distinct state — the per-hop blocking materialize + shuffle
    pair is gone, and the dominant nouter = 2 case runs checkpoint-free
    (one composition join + one union-distinct). The kernel_inner=1 case
    needs no anti-join at all: R_ninner is {self}, so the ring is just
    ``n_id != c`` on the outer set."""
    ninner = int(kernel_inner) - 1
    nouter = ninner + int(kernel_width)
    if nouter < 0 or nouter < ninner:
        # kernel_width <= 0: R_nouter ⊆ R_ninner so the ring is empty —
        # without this guard the snapshot is never taken and the final
        # anti-join would dereference None
        return nth_order_reachability(edges, 0).limit(0)
    if ninner == 0 and nouter == 1:
        # ring-1 closed form (r13 opt): ({self} ∪ 1-hop) \ {self} is
        # EXACTLY the distinct non-self edge set — r0's c domain is
        # distinct(a_id) and one hop from self adds (c, b) per edge
        # (c, b), so no iteration state is needed at all. Replaces one
        # blocking materialize + a union-distinct chain (3 shuffles, 2
        # jobs) with a single distinct; identical rows for ANY edge
        # table, symmetric or not.
        return (
            edges.select("month_id", F.col("a_id").alias("c"), F.col("b_id").alias("n_id"))
            .filter(F.col("n_id") != F.col("c"))
            .distinct()
        )
    # general-k closed form (r14, generalizing the r13 ring-1 algebra):
    # R_n \ {self} = distinct(∪_{k=1..n} H_k) \ {self}, where H_k is the
    # k-fold edge composition (nodes reachable by SOME k-edge path; a node
    # at graph distance d ≤ n is in H_d, and every H_k member is within k
    # hops, so the union over k ≤ n is exactly the ≤ n-hop set). This
    # replaces the old running union-distinct BFS — which paid a blocking
    # materialize + a union-distinct shuffle PER HOP because the running
    # set fed two plan branches — with pure hop compositions: H_k feeds
    # the next composition and the final union, so only the middle hops
    # (2..n-1) need a checkpoint, and the dominant n = 2 case needs NONE.
    ep = edges.select(
        "month_id", F.col("a_id").alias("c"), F.col("b_id").alias("n_id")
    )
    step_edges = edges.select(
        "month_id", F.col("a_id").alias("n_id"), F.col("b_id").alias("next_id")
    )
    hops = [ep] if nouter >= 1 else []  # H_1 = the edge set itself
    for k in range(2, nouter + 1):
        prev = hops[-1]
        comp = prev.join(step_edges, ["month_id", "n_id"]).select(
            "month_id", "c", F.col("next_id").alias("n_id")
        )
        if k < nouter:
            # distinct = path-count blowup guard (sets, not paths) for the
            # next composition's input; the LAST hop skips it — the final
            # union.distinct() already dedups, and a dedicated exchange
            # here would be pure extra shuffle. Then pin: the set feeds
            # the next composition AND the final union.
            comp = materialize(comp.distinct())
        hops.append(comp)
    nodes = (
        edges.select("month_id", F.col("a_id").alias("c"))
        .distinct()
        .select("month_id", "c", F.col("c").alias("n_id"))
    )
    if not hops:  # nouter == 0: R_0 = {self}
        # ninner < 0 keeps self (R_0 \ ∅); ninner == 0 is R_0 \ R_0 = ∅
        return nodes if ninner < 0 else nodes.limit(0)
    outer = hops[0]
    for h in hops[1:]:
        outer = outer.union(h)
    outer = outer.distinct()
    if ninner < 0:
        # kernel_inner = 0: the ring INCLUDES self (R_nouter with the
        # order-0 self set from the node domain)
        return outer.union(nodes).distinct()
    if ninner == 0:
        # R_0 = {self}: the anti-join degenerates to a row filter
        return outer.filter(F.col("n_id") != F.col("c"))
    inner = nodes
    for h in hops[:ninner]:
        inner = inner.union(h)
    return outer.join(inner, ["month_id", "c", "n_id"], "left_anti")


def centroid_distances(centroids: DataFrame) -> DataFrame:
    """Pairwise Euclidean centroid distance (reference `utilities.py:368-403`):
    dist(a,b) = sqrt((lat_a-lat_b)^2 + (lon_a-lon_b)^2). Small dim table ->
    broadcast cross join."""
    a = centroids.select(
        F.col("country_id").alias("c"), F.col("lat").alias("__lat_a"), F.col("lon").alias("__lon_a")
    )
    b = centroids.select(
        F.col("country_id").alias("n_id"), F.col("lat").alias("__lat_b"), F.col("lon").alias("__lon_b")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            "c",
            "n_id",
            F.sqrt(
                (F.col("__lat_a") - F.col("__lat_b")) ** 2
                + (F.col("__lon_a") - F.col("__lon_b")) ** 2
            ).alias("dist"),
        )
    )


def splag_country(
    df: DataFrame,
    edges: DataFrame,
    centroids: DataFrame | None = None,
    kernel_inner: int = 1,
    kernel_width: int = 1,
    kernel_power: float = 0,
    norm_kernel: int = 0,
) -> DataFrame:
    """Country-level spatial lag (reference `get_splag_country`,
    `splag_country.py:8-72`).

    df: panel keyed (time_id=month, unit_id=country). edges(month_id, a_id,
    b_id): symmetric, no self loops. centroids(country_id, lat, lon) for
    distance weighting — optional when kernel_power == 0 (weights all 1,
    matching d^0).

    Reference parity notes: weights are distance^+power (`splag_country.py:279`
    — positive exponent, unlike splag4d); months/countries absent from the
    edge table get 0 (`splag` starts as zeros); +/-inf values are zeroed
    (`:289`); neighbours outside the panel's country set are dropped
    (`:272-273`).
    """
    feats = feature_cols(df)
    # three plan branches reference the panel (unit restriction, neighbour
    # values, output keys) and the reachability iteration references the
    # edge table n+1 times for each of the two rings — materialize both
    # once. EXCEPT the ring-1 closed form (r13 opt): it reads the edge
    # table exactly once, so its checkpoint would be a pure blocking job.
    df = materialize(df)
    if not (int(kernel_inner) == 1 and int(kernel_width) == 1):
        edges = materialize(edges)
    ring = neighbour_ring(edges, kernel_inner, kernel_width)
    # restrict neighbours to countries present in the panel (splag_country.py:272)
    panel_units = df.select(F.col(UNIT).alias("n_id")).distinct()
    ring = ring.join(F.broadcast(panel_units), "n_id")
    if kernel_power == 0 or centroids is None:
        ring = ring.withColumn("w", F.lit(1.0))
    else:
        dists = centroid_distances(centroids)
        ring = ring.join(F.broadcast(dists), ["c", "n_id"], "left").withColumn(
            "w", F.coalesce(F.col("dist") ** F.lit(float(kernel_power)), F.lit(0.0))
        )
    if norm_kernel:
        # nullif: an all-zero weight ring (coincident centroids with power>0)
        # yields NULL weights -> 0 contribution, instead of raising
        # DIVIDE_BY_ZERO under ANSI mode
        ring = ring.withColumn(
            "w",
            F.col("w")
            / F.nullif(F.sum("w").over(Window.partitionBy("month_id", "c")), F.lit(0.0)),
        )
    # join neighbour values: value rows keyed (month, n_id); inf guard -> 0
    vals = df.select(
        F.col(TIME).alias("month_id"),
        F.col(UNIT).alias("n_id"),
        *[
            F.when(F.abs(F.col(c)) == float("inf"), 0.0).otherwise(F.col(c)).alias(c)
            for c in feats
        ],
    )
    contrib = (
        ring.join(vals, ["month_id", "n_id"])
        .groupBy("month_id", "c")
        .agg(*[F.sum(F.col(c) * F.col("w")).alias(c) for c in feats])
    )
    out = df.select(*KEYS).join(
        contrib,
        (F.col(TIME) == F.col("month_id")) & (F.col(UNIT) == F.col("c")),
        "left",
    ).select(TIME, UNIT, *feats)
    return out.na.fill(0.0, subset=feats)
