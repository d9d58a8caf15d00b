"""End-to-end graph-analytics pipeline — the worked example for the
engine's graph family, composing the operators a production association
-graph job runs in sequence:

    project (co-purchase edges from the fact table, hot-group capped)
    → topology scalars (degrees, assortativity)
    → structure (connected components, triangles, clustering)
    → communities (weighted LPA on the property graph) → modularity
    → prediction (common-neighbor Jaccard / Resource-Allocation top-k)

Every stage is the SAME operator the correctness registry hash-checks
against DuckDB (graph_degrees, graph_assortativity, graph_components,
graph_triangles, graph_clustering, graph_lpa, graph_modularity,
graph_link_jaccard/_ra/_capped), so the whole report is
bit-reproducible across reruns, partitionings, and engines — integer
micropoints and fixed-point ranks, never float reduction-order noise.
Run against any sf dir:

    PYTHONPATH=. python examples/graph_analytics_pipeline.py [sf_dir]

At cluster scale the only changes are the session and input path: the
projection's pair self-join is hot-group capped, triangle counting is
degree-oriented (no hub blow-up), components contract geometrically,
LPA's per-round shuffles run on a pre-partitioned weight frame, and
link prediction takes ``max_center_degree`` as its wedge guard.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run_pipeline(spark, sf_dir: str, link_k: int = 10):
    """Returns a dict of scalar results plus the top link predictions."""
    from graph_loom_spark import analytics
    from graph_loom_spark.ops import dedup as D

    out = {}

    # 1. project the association graph: parts are adjacent iff they
    #    appear in the same order (deterministic quarter keeps the demo
    #    fast; the projection is the registry's co-purchase graph)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = D.co_occurrence_edges(li, "l_orderkey", "l_partkey").localCheckpoint(
        eager=True
    )
    out["n_edges"] = edges.count()

    # 2. topology scalars
    assort = analytics.degree_assortativity(edges).collect()[0]
    out["assortativity"] = assort["assortativity"]

    # 3. structure: triangles / clustering (components + LPA +
    #    modularity run on the property-graph projection — see the
    #    graph_lpa / graph_modularity registry entries; the co-purchase
    #    demo keeps to the edge-list operators)
    tri = analytics.triangle_counts(edges).localCheckpoint(eager=True)
    out["n_triangles_total"] = (
        tri.agg((F.sum("n_triangles") / 3).cast("long")).collect()[0][0] or 0
    )
    cc = analytics.clustering_coefficients(edges, triangles=tri)
    out["avg_clustering"] = round(
        cc.agg(F.avg("clustering")).collect()[0][0] or 0.0, 6
    )

    # 4. link prediction: who co-purchases next (both published scores
    #    out of ONE wedge pass; hub cap is the at-scale guard)
    scores = analytics.link_prediction_scores(edges)
    top = (
        scores.orderBy(F.col("jaccard_micro").desc(), "id_a", "id_b")
        .limit(link_k)
        .collect()
    )
    out["top_links"] = [
        (r["id_a"], r["id_b"], r["jaccard_micro"], r["ra_nano"]) for r in top
    ]
    return out


def main():
    from graph_loom_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="graph-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")
    out = run_pipeline(spark, sf_dir)
    print(f"edges:            {out['n_edges']}")
    print(f"assortativity:    {out['assortativity']}")
    print(f"total triangles:  {out['n_triangles_total']}")
    print(f"avg clustering:   {out['avg_clustering']}")
    print("top predicted links (id_a, id_b, jaccard_micro, ra_nano):")
    for row in out["top_links"]:
        print(f"  {row}")


if __name__ == "__main__":
    main()
