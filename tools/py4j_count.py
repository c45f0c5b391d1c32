"""Count py4j socket round-trips per entry BUILD (construction only,
no action), with a by-caller breakdown.

Usage: python tools/py4j_count.py <entry> [entry ...]

Wraps ``ClientServerConnection.send_command`` with a counter that
samples the Python stack to attribute round-trips to the engine
function that caused them.  The count is deterministic for a fixed
code path (unlike wall time on this host), so it is the round's
feedback loop for construction-chatter work (guide §5: the driver
should do almost no work; r15 measured 3,416 round-trips per warm
text_stats build after the dataFrameDebugging conf landed).

Builds each entry twice and reports the SECOND (warm, model caches
hot) build: total round-trips + top attributed frames.
"""

from __future__ import annotations

import sys
import traceback
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haensel_ams_data_engineer_challenge_spark.registry import registry
from haensel_ams_data_engineer_challenge_spark.session import get_spark

REPO = str(Path(__file__).resolve().parent.parent)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("py4j_count")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    from py4j.clientserver import ClientServerConnection

    state = {"n": 0, "gc": 0, "by_site": Counter(), "sample": False}
    orig = ClientServerConnection.send_command

    def counted(self, *a, **kw):
        # py4j memory-management commands ("m\nd\n<id>") are issued by
        # GC finalizers at nondeterministic times — count them apart so
        # the API-call figure is reproducible run to run.
        if a and isinstance(a[0], str) and a[0].startswith("m\n"):
            state["gc"] += 1
            return orig(self, *a, **kw)
        state["n"] += 1
        if state["sample"]:
            # deepest repo frame below the pyspark/py4j layers
            site = "?"
            for fr in reversed(traceback.extract_stack(limit=120)):
                if fr.filename.startswith(REPO) and "/tools/" not in fr.filename:
                    site = f"{fr.filename[len(REPO) + 1:]}:{fr.lineno}:{fr.name}"
                    break
            state["by_site"][site] += 1
        return orig(self, *a, **kw)

    ClientServerConnection.send_command = counted

    # warm the loader/schema caches outside the measured region
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for name in names:
        fn = reg[name][0]
        fn(spark, sf_dir)  # cold build: fills session model caches
        state["n"] = 0
        state["gc"] = 0
        state["by_site"].clear()
        state["sample"] = True
        fn(spark, sf_dir)  # warm build: the measured one
        state["sample"] = False
        print(
            f"\n=== {name}: {state['n']} API round-trips (warm build)"
            f" + {state['gc']} gc-detach"
        )
        for site, cnt in state["by_site"].most_common(25):
            print(f"  {cnt:6d}  {site}")


if __name__ == "__main__":
    main()
