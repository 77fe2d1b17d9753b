"""Render PERF_ZOO.json as the PERFORMANCE.md table (single source of truth).

Run: python scripts/zoo_table.py  (prints markdown; paste into docs)
"""

import json

NOTES = {
    "cvt": "cvt (fp32)",
    "levit": "levit (fp32)",
    "scalable_vit": "scalable_vit (batch 64)",
}

rows = {}
for line in open("/root/repo/PERF_ZOO.json"):
    line = line.strip()
    if line:
        d = json.loads(line)
        rows[d["family"]] = d

print("| family | ours img/s | reference img/s | speedup |")
print("|---|---|---|---|")
for fam, d in rows.items():
    name = NOTES.get(fam, fam)
    ours = f"{d['ours_img_s']:.0f}" if "ours_img_s" in d else "—"
    ref = f"{d['ref_img_s']:.0f}" if "ref_img_s" in d else "— (crashes at init as published)"
    sp = f"{d['speedup']:.2f}×" if "speedup" in d else "—"
    print(f"| {name} | {ours} | {ref} | {sp} |")
