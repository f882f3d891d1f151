"""Connected components over near-duplicate pair edges — pairs → CLUSTERS.

Dedup stages emit PAIRS (minhash/simhash/ngram verify); acting on them
(keep one representative per group) needs the transitive closure. This
is min-label propagation: every vertex repeatedly adopts the minimum
component label among itself and its neighbors until a fixpoint.

Scale shape: each round is ONE aggregation keyed on the vertex id (the
symmetric edge list joins the current labels, then groups by vertex) —
no all-pairs stage, partition-balanced by vertex hash. Rounds needed =
graph diameter; near-dup clusters are dense and tiny (diameter ≲ 3-4
even for large clusters, since every member pairs with most others), so
the loop converges in a handful of rounds. ``localCheckpoint`` truncates
the growing lineage each round — without it the plan doubles per
iteration and the driver dies planning round ~15 long before any
executor works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _propagation_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label round: neighbor-min via a vertex-keyed aggregation,
    then least(own, neighbor). Factored out so tools/explain_plans.py
    can audit the claim that a round shuffles only on the vertex id."""
    nb = (sym.join(labels.withColumnRenamed("id", "v"), "v")
          .groupBy("u").agg(F.min("comp").alias("nb_comp")))
    return (labels.join(nb.withColumnRenamed("u", "id"), "id", "left")
            .select("id", F.least(
                "comp", F.coalesce("nb_comp", "comp")).alias("comp")))


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = the
    minimum vertex id in the connected component (deterministic).

    Raises if the label propagation has not converged after
    ``max_iter`` rounds (diameter > max_iter — raise the bound; each
    extra round is one shuffle)."""
    def _free(df) -> None:
        # free a superseded localCheckpoint's blocks NOW instead of
        # waiting for GC + ContextCleaner — rounds × |V| copies would
        # otherwise pile up in executor storage on big graphs.
        # Best-effort through the internal RDD handle; a failure just
        # defers to the ContextCleaner path.
        try:
            df._jdf.queryExecution().toRdd().unpersist(False)
        except Exception:
            pass

    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("v")))
           .distinct())
    # materialize the symmetric edge list ONCE: it is joined every
    # round, and without this the union+distinct (two edge scans + a
    # dedup shuffle — the operator's most expensive stage) would
    # re-execute per round
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("comp", F.col("id")))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        new = _propagation_round(sym, labels)
        new = new.localCheckpoint(eager=True)
        changed = (new.alias("n").join(labels.alias("o"), "id")
                   .where(F.col("n.comp") != F.col("o.comp")).count())
        _free(labels)
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter — raise it)")
