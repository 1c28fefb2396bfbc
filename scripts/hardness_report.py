#!/usr/bin/env python3
"""Corpus-hardness comparison table (round-2 VERDICT missing #3 second half).

Compares eval_codecs.py JSONs from the hardened (decorrelate=0.75) and
matched easy-control corpora — round-2-trained heads, EVAL-ONLY transfer —
against the round-2 full-corpus eval, and against the reference's own
observable regime (its proposed codec LOSES to its DAC baseline at >=3 kbps:
34.33 vs 37.47 dB @ ~3 kbps,
reference: Evaluation/eval_vs_dac24_with_vcpwq_rawPSNR_latency/
eval_all_vs_dac24_vcpwq_rawPSNR_latency.json).

  python scripts/hardness_report.py \
      --hard /root/demo_r3_hard/eval/eval_all_vs_backbone_rawPSNR_latency.json \
      --easy /root/demo_r3_easy/eval/eval_all_vs_backbone_rawPSNR_latency.json \
      [--r2 /root/demo_r2/sweep/eval_vs_backbone/...json] \
      [--out docs/demo_evidence_r3/hardness_table.md]
"""

import argparse
import json


def load(path):
    with open(path) as f:
        return json.load(f)


def backbone_at_kbps(dac, kbps):
    """Nearest backbone (n_q sweep) row by bitrate."""
    rows = sorted(dac.values(), key=lambda r: abs(r["kbps"] - kbps))
    return rows[0]


def table(tag, d):
    lines = []
    for r in sorted(d["proposed_runs"], key=lambda x: x["kbps"]):
        bb = backbone_at_kbps(d["dac_24khz"], r["kbps"])
        delta = r["psnr_mean"] - bb["psnr_mean"]
        lines.append({
            "corpus": tag, "run": r["run"], "kbps": round(r["kbps"], 2),
            "proposed_psnr": round(r["psnr_mean"], 2),
            "proposed_ci95": round(r.get("psnr_ci95", float("nan")), 2),
            "backbone_nq_kbps": round(bb["kbps"], 2),
            "backbone_psnr": round(bb["psnr_mean"], 2),
            "delta_db": round(delta, 2),
            "proposed_stsim": round(r["stsim_mean"], 4),
            "backbone_stsim": round(bb["stsim_mean"], 4),
        })
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hard", required=True)
    ap.add_argument("--easy", required=True)
    ap.add_argument("--r2")
    ap.add_argument("--out")
    args = ap.parse_args()

    rows = table("hard(d=0.75)", load(args.hard)) + \
        table("easy(d=0)", load(args.easy))
    if args.r2:
        rows += table("r2-full(n=1003)", load(args.r2))

    hdr = ["corpus", "run", "kbps", "proposed_psnr", "backbone_nq_kbps",
           "backbone_psnr", "delta_db", "proposed_stsim", "backbone_stsim"]
    md = ["| " + " | ".join(hdr) + " |",
          "|" + "---|" * len(hdr)]
    for r in rows:
        md.append("| " + " | ".join(str(r[k]) for k in hdr) + " |")
    md.append("")
    md.append("delta_db > 0: the cross-modal proposed codec beats the "
              "backbone codec at matched rate (the reference's own corpus "
              "shows delta_db < 0 at >= 3 kbps: 34.33 vs 37.47).")
    text = "\n".join(md)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
