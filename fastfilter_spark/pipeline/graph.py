"""Connected components over near-duplicate pair edges — pairs → CLUSTERS.

Dedup stages emit PAIRS (minhash/simhash/ngram verify); acting on them
(keep one representative per group) needs the transitive closure.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014). Each
operation rewires edges toward the minimum id seen in a node's
neighborhood; alternating the two converges to one star per component
(every vertex pointing at the component minimum) in O(log d) rounds —
the earlier min-label-propagation version needed O(d) rounds (one per
hop of the component diameter), which made chain-shaped graphs (long
thin duplicate chains from repeatedly-mutated docs) blow past any
fixed round budget. A 1000-vertex path now converges in ~5 alternations
instead of 1000 propagation rounds.

Scale shape: each star operation is ONE aggregation keyed on the vertex
id plus the join back and an edge dedup — no all-pairs stage, every
exchange keyed on a vertex column (audited by tools/explain_plans.py).
``localCheckpoint`` truncates the growing lineage each round — without
it the plan doubles per iteration and the driver dies planning round
~15 long before any executor works.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free(df) -> None:
    # free a superseded localCheckpoint's blocks NOW instead of
    # waiting for GC + ContextCleaner — rounds × |E| copies would
    # otherwise pile up in executor storage on big graphs.
    # Best-effort through the internal RDD handle; a failure just
    # defers to the ContextCleaner path.
    try:
        df._jdf.queryExecution().toRdd().unpersist(False)
    except Exception:
        pass


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every edge larger→smaller and drop self-loops/dups. Both
    star operations preserve this orientation, so it is established
    once."""
    return (edges
            .select(F.greatest(F.col(src), F.col(dst)).alias("u"),
                    F.least(F.col(src), F.col(dst)).alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node connects its STRICTLY LARGER neighbors to
    the minimum of its closed neighborhood. One aggregation keyed on the
    vertex id; output stays larger→smaller oriented (v > u ≥ m)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m")))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node connects its smaller neighbors (and
    itself) to the minimum among them. Input and output are
    larger→smaller oriented, so the aggregation over the first column
    sees exactly the smaller neighborhood."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    rest = (e.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")))
    return rest.union(mins.select("u", F.col("m").alias("v"))).distinct()


def _is_star_forest(e: DataFrame) -> bool:
    """Fixpoint test: the edge set is a star forest iff every first
    column appears exactly once (one parent) and never as a second
    column (parents are roots). Two cheap short-circuit jobs."""
    multi = (e.groupBy("u").agg(F.count("*").alias("d"))
             .where(F.col("d") > 1).limit(1).count())
    if multi:
        return False
    cross = (e.join(e.select(F.col("v").alias("u")).distinct(),
                    "u", "left_semi").limit(1).count())
    return cross == 0


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20,
                         stats: Optional[dict] = None) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = the
    minimum vertex id in the connected component (deterministic).

    ``max_iter`` bounds the alternating rounds; with O(log d)
    convergence the default 20 covers any graph this engine could hold
    (d ≤ 2^20 hops). Raises if the star fixpoint is not reached.
    ``stats`` (optional dict) receives {"rounds": n} for observability.
    """
    # materialize the RAW edge projection once: both the canonical star
    # graph and the degenerate-vertex recovery below derive from it, and
    # without this the (often expensive) upstream pair-generation stage
    # — shingle explode + band join for dedup callers — would execute a
    # second time when the returned plan is consumed
    raw = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .localCheckpoint(eager=True))
    cur = _canonical(raw, "s", "d").localCheckpoint(eager=True)
    # vertices that never enter the star graph: self-loops and edges
    # with a NULL endpoint (greatest/least skip NULLs, so (x, NULL)
    # canonicalizes to a dropped self-loop) — they are still vertices
    # of the input and label themselves
    degenerate = (raw.where(F.col("s").eqNullSafe(F.col("d"))
                            | F.col("s").isNull() | F.col("d").isNull())
                  .select(F.coalesce("s", "d").alias("id"))
                  .where(F.col("id").isNotNull())
                  .distinct().localCheckpoint(eager=True))
    _free(raw)
    rounds = 0
    if not cur.isEmpty():
        for rounds in range(1, max_iter + 1):
            nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
            _free(cur)
            cur = nxt
            if _is_star_forest(cur):
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "alternating rounds — raise max_iter (each round is "
                "O(log d), so this indicates an extreme graph)")
    if stats is not None:
        stats["rounds"] = rounds
    # star forest → labels: children point at the root, roots label
    # themselves. The two sides are disjoint (a root never appears as a
    # child at the fixpoint), so the union is duplicate-free.
    labels = (cur.select(F.col("u").alias("id"), F.col("v").alias("comp"))
              .union(cur.select(F.col("v").alias("id"),
                                F.col("v").alias("comp")).distinct()))
    loop_only = degenerate.join(labels, "id", "left_anti")
    return labels.union(
        loop_only.select("id", F.col("id").alias("comp")))
