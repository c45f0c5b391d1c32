"""Dump `.explain("formatted")` for every bench HEADLINE entry into
plans/r16/<name>_<tag>.txt (tag = before/after).

Usage: python tools/dump_r16_plans.py <tag> [entry ...]

Plans are captured at sf0.1 (the driver's bench SF) pre-execution —
the optimization round's evidence files: Exchange count, join
strategy, PushedFilters/ReadSchema, codegen spans, Arrow/Python nodes.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haensel_ams_data_engineer_challenge_spark.registry import registry
from haensel_ams_data_engineer_challenge_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = "/root/testdata/sf0.1"
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)

    import bench

    spark = get_spark("dump_r16_plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in reg]
    for name in names:
        df = reg[name][0](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
