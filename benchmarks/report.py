"""Aggregate benchmark/experiment results into one markdown report.

    python -m benchmarks.report > REPORT.md
"""

from __future__ import annotations

import json
import os

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def main():
    print("# Benchmark & experiment report\n")
    print("Generated from benchmarks/results/*.jsonl (latest record per "
          "experiment/model).\n")
    if not os.path.isdir(RESULTS_DIR):
        print("(no results recorded yet)")
        return
    for name in sorted(os.listdir(RESULTS_DIR)):
        if not name.endswith(".jsonl"):
            continue
        with open(os.path.join(RESULTS_DIR, name)) as fp:
            lines = [json.loads(l) for l in fp if l.strip()]
        if not lines:
            continue
        # Latest record per (experiment, model) so e.g. the SAGE headline
        # and the GAT number in bench_tpu.jsonl both survive.
        latest: dict[tuple, dict] = {}
        fallback = name.removesuffix(".jsonl")
        for rec in lines:
            # headline=false marks refutation / comparison-point runs of
            # non-default lowerings: keep them in the jsonl record, never
            # as the group's reported number.
            if rec.get("headline") is False:
                continue
            key = (rec.get("experiment", fallback), rec.get("model"))
            latest[key] = rec
        # Drop a model-less group when model-keyed records of the same
        # experiment exist (old record schema; the model-keyed ones are
        # the continuation — keeping both surfaces a stale headline).
        for exp, model in list(latest):
            if model is None and any(
                k[0] == exp and k[1] for k in latest
            ):
                del latest[(exp, None)]
        for rec in latest.values():
            title = rec.get("experiment", fallback)
            if rec.get("model"):
                title += f" ({rec['model']})"
            print(f"## {title}\n")
            rec.pop("time", None)
            rec.pop("experiment", None)
            rec.pop("model", None)
            if "rows" in rec:
                rows = rec.pop("rows")
                if rows:
                    keys = []
                    for r in rows:  # union, insertion-ordered
                        for k in r:
                            if k not in keys:
                                keys.append(k)
                    print("| " + " | ".join(keys) + " |")
                    print("|" + "---|" * len(keys))
                    for r in rows:
                        print("| " + " | ".join(str(r.get(k, ""))
                                                for k in keys) + " |")
            for k, v in rec.items():
                print(f"- {k}: {v}")
            print()


if __name__ == "__main__":
    main()
