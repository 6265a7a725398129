"""Summarize the round-5 TPU measurement queue outputs as markdown.

Run after (parts of) benchmarks/r5_measurement_queue.sh complete; prints the
PERF.md-ready tables for whatever artifacts exist:
  * full7_r5.csv vs the r2/r3 full7 QPS columns
  * ab_midsize_r5.jsonl scan-vs-chunked per-model summary
  * overlap_on_r5.csv / overlap_off_r5.csv QPS comparison
No TPU needed — pure file parsing.
"""

import csv
import json
from pathlib import Path

HERE = Path(__file__).resolve().parent


def read_qps(name):
    p = HERE / name
    if not p.exists():
        return None
    return {r["Model"]: float(r["QPS"]) for r in csv.DictReader(p.open())}


def main():
    r2 = read_qps("full7_r2_final.csv")
    r3 = read_qps("full7_r3c.csv")
    r5 = read_qps("full7_r5.csv")
    if r5:
        print("## full7 QPS: r2 vs r3 vs r5\n")
        print("| Model | r2 | r3c | r5 | r5/r2 |")
        print("|---|---|---|---|---|")
        for m, q5 in r5.items():
            q2, q3 = r2.get(m), r3.get(m)
            ratio = f"{q5 / q2:+.1%}".replace("%", " %") if q2 else "—"
            print(f"| {m} | {q2:.1f} | {q3:.1f} | {q5:.1f} | {ratio} |")
        print()
    else:
        print("(full7_r5.csv not present yet)")

    ab = HERE / "ab_midsize_r5.jsonl"
    if ab.exists():
        rows = [json.loads(l) for l in ab.open() if l.strip()]
        print("\n## ab_midsize: scan vs chunked (mean over passes)\n")
        print("| Model | mode | qps mean | qps min | txt_s mean | img_s mean |")
        print("|---|---|---|---|---|---|")
        models = sorted({r["model"] for r in rows})
        for m in models:
            for mode in ("scan", "chunked"):
                sel = [r for r in rows if r["model"] == m and r["mode"] == mode]
                if not sel:
                    continue
                qps = [r["qps"] for r in sel]
                txt = sum(r["txt_s"] for r in sel) / len(sel)
                img = sum(r["img_s"] for r in sel) / len(sel)
                print(
                    f"| {m} | {mode} | {sum(qps)/len(qps):.1f} | {min(qps):.1f} "
                    f"| {txt:.2f} | {img:.2f} |"
                )
    else:
        print("(ab_midsize_r5.jsonl not present yet)")

    on, off = read_qps("overlap_on_r5.csv"), read_qps("overlap_off_r5.csv")
    if on and off:
        print("\n## overlap staging A/B (SigLIP-400M)\n")
        for m in on:
            if m in off:
                print(f"{m}: overlap-on QPS {on[m]:.1f} vs off {off[m]:.1f} "
                      f"({on[m]/off[m]-1:+.1%})")
    else:
        print("(overlap A/B CSVs not both present yet)")


if __name__ == "__main__":
    main()
