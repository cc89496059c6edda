"""Regenerate STATUS.md's perf table from a BENCH json line/file
(VERDICT r4 item 8: one source of truth).

Usage: python tools/status_from_bench.py BENCH_r05.json
"""
import json
import re
import sys

SHAPES = {
    "primary": "2 Mbp x 10 docs, 1% SNP (20 Mchars)",
    "toy_lowdiv": "1 Mbp x 10, 0.1% SNP",
    "sars_stream": "30 Kbp x 1000 docs, 25 Mchars",
    "ecoli_rle": "5 Mbp x 20 = 100 Mchars, RLE",
    "primary_dense": "primary shape, FORCED dense+device merge",
    "ecoli_dense": "ecoli shape, FORCED dense+device merge",
    "primary_shmerge": "primary shape, FORCED sharded mesh merge",
}


def main(path):
    data = json.load(open(path))
    rows = ["| config | shape | ours | ref best | vs | engine |",
            "|---|---|---|---|---|---|"]
    for c in data["configs"]:
        name = c["config"]
        if "error" in c:
            rows.append(f"| {name} | {SHAPES.get(name, '')} | — | — | "
                        f"ERROR: {c['error']} | |")
            continue
        extra = ""
        if c.get("cold_s"):
            extra = f" (cold {c['cold_s']:.1f} s)"
        rows.append(
            f"| {name} | {SHAPES.get(name, '')} | "
            f"**{c['ours_s']:.2f} s**{extra} | {c['ref_s_best']:.2f} s | "
            f"**{c['vs_baseline']:.2f}x** | {c.get('backend', '')}"
            f"{'+' + c['merge_backend'] if c.get('merge_backend') else ''}"
            f"{' byte_equal' if c.get('byte_equal') else ' NOT-EQUAL'} |")
    if data.get("value", -1) > 0:
        rows.append("")
        rows.append(f"Headline: {data['value']} {data['unit']} "
                    f"(vs_baseline {data['vs_baseline']}).")
    table = "\n".join(rows)
    st = open("STATUS.md").read()
    new = re.sub(r"<!-- BENCH_TABLE -->(.|\n)*?(?=\n#)",
                 "<!-- BENCH_TABLE -->\n" + table + "\n", st, count=1)
    open("STATUS.md", "w").write(new)
    print(table)


if __name__ == "__main__":
    main(sys.argv[1])
