"""PageRank round-count / scale evidence (round 15, verdict #2).

Measures operators/linkgraph.pagerank on synthetic Zipf-weighted host
graphs at growing node counts:

- rounds to converge at the default tol (geometric at the damping
  rate, so it should be FLAT in graph size — the scale claim);
- wall time per round (one join + one agg shuffle; grows ~linearly in
  edges, the unavoidable message-passing cost);
- rank-mass conservation at every size (sum == 1).

Graph model: n hosts, out-degrees Zipf-distributed (a few hub hosts
with thousands of out-links, a long tail with 1-3), destinations
preferentially attached (prob ~ 1/rank) — the shape of real host
graphs, including dangling nodes (hosts that appear only as dst).

Usage: python tools/linkgraph_scale_bench.py [base_nodes] [factors]
e.g. python tools/linkgraph_scale_bench.py 2000 1,4,16
Prints one JSON line per size; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_edges(n_hosts: int, seed: int = 7) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    hosts = [f"h{i}.example" for i in range(n_hosts)]
    edges = set()
    # only the first 60% of hosts emit links: the rest are dangling
    # unless linked-to (and stay dangling as nodes with in-edges only)
    for i in range(int(n_hosts * 0.6)):
        out_deg = max(1, int(20 / (1 + i % 50)))  # Zipf-ish by bucket
        for _ in range(out_deg):
            # preferential attachment: low-index hosts soak up links
            j = min(int(rng.paretovariate(1.2)) - 1, n_hosts - 1)
            if j != i:
                edges.add((hosts[i], hosts[j]))
    return sorted(edges)


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    factors = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 4, 16]
    )

    from pyspark.sql import SparkSession, functions as F

    from haensel_ams_data_engineer_challenge_spark.operators import linkgraph

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("linkgraph_scale_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for f in factors:
        n = base * f
        edges = synth_edges(n)
        df = spark.createDataFrame(
            edges, "src_host string, dst_host string"
        )
        rounds: list[float] = []
        t0 = time.perf_counter()
        ranks = linkgraph.pagerank(df, round_log=rounds).collect()
        wall = time.perf_counter() - t0
        mass = sum(r["rank"] for r in ranks)
        print(json.dumps({
            "case": "pagerank_scale",
            "n_hosts": n,
            "n_edges": len(edges),
            "wall_s": round(wall, 2),
            "rounds": len(rounds),
            "s_per_round": round(wall / max(len(rounds), 1), 3),
            "rank_mass": round(mass, 9),
            "final_delta": rounds[-1] if rounds else None,
        }), flush=True)

        # harmonic centrality: rounds should track the graph's
        # effective diameter (small, flat-ish under preferential
        # attachment), NOT n — the HyperBall scale claim
        hrounds: list[float] = []
        t0 = time.perf_counter()
        linkgraph.harmonic_centrality(
            df, round_log=hrounds
        ).count()
        hwall = time.perf_counter() - t0
        print(json.dumps({
            "case": "harmonic_scale",
            "n_hosts": n,
            "n_edges": len(edges),
            "wall_s": round(hwall, 2),
            "rounds": len(hrounds),
            "s_per_round": round(hwall / max(len(hrounds), 1), 3),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
