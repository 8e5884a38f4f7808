#!/usr/bin/env python
"""Render the round-4 experiment artifacts as README-ready markdown.

Reads whatever exists of
  artifacts/sweep/<preset>_s<k>.json   (scripts/acceleration_sweep.py cells)
  artifacts/classical_baselines.json   (scripts/classical_baselines.py)
  artifacts/ood/<preset>_<kind>.json   (scripts/ood_eval.py cells)
  artifacts/noisy_radial_*.json        (round4_queue2.sh stage 5)
and prints the quality-vs-acceleration matrix, the classical anchors, and
the OOD table as markdown. Pure CPU/file tool — safe to run any time; cells
that have not landed yet simply print as "—".

    python scripts/results_tables.py
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
ART = REPO / "artifacts"

SWEEP_PRESETS = (
    "pdunet_parallel", "lpd_parallel", "fbp_unet_parallel",
    "sino_unet_parallel", "pdunet_radial", "sino_unet_radial",
)
# OOD rows additionally cover the fan geometry: its s4 sweep cell exists
# purely as an OOD checkpoint (scripts/round4_tail.sh), not as part of
# the acceleration matrix.
OOD_PRESETS = SWEEP_PRESETS[:4] + ("pdunet_fan",) + SWEEP_PRESETS[4:]
SPARSITIES = (2, 4, 8)
OOD_KINDS = ("shepp_logan", "rectangles", "smooth", "textured", "hu_volume")


def load(path: pathlib.Path) -> dict | None:
    return json.loads(path.read_text()) if path.exists() else None


def cell_str(q: dict | None, with_ssim: bool = True) -> str:
    if q is None:
        return "—"
    s = f"{q['psnr_mean']:.2f}"
    if with_ssim:
        s += f" / {q['ssim_mean']:.4f}"
    if "interim" in q.get("note", ""):
        # half-budget cells must never render indistinguishably from
        # matched-budget ones (round-4 advisor, medium)
        s += " †"
    return s


def sweep_table() -> str:
    lines = ["| preset | 2× | 4× | 8× |", "|---|---|---|---|"]
    budgets = set()
    interim = False
    for preset in SWEEP_PRESETS:
        row = [preset]
        for k in SPARSITIES:
            q = load(ART / "sweep" / f"{preset}_s{k}.json")
            if q:
                budgets.add((preset, q.get("samples")))
                interim |= "interim" in q.get("note", "")
            row.append(cell_str(q))
        lines.append("| " + " | ".join(row) + " |")
    # classical anchors per factor
    cb = load(ART / "classical_baselines.json")
    if cb:
        anchors = {(c["preset"], c["sparsity"]): c for c in cb["cells"]}
        for preset, label in (("pdunet_parallel", "FBP (no learning)"),
                              ("pdunet_radial", "DCF-adjoint (no learning)")):
            row = [f"*{label}*"]
            for k in SPARSITIES:
                row.append(cell_str(anchors.get((preset, k))))
            lines.append("| " + " | ".join(row) + " |")
    if interim:
        lines += ["", "† interim cell trained below the matched sample "
                      "budget; not comparable until retrained."]
    tp = throughput_line()
    if tp:
        lines += ["", tp]
    return "\n".join(lines)


def throughput_line() -> str | None:
    """One-line flagship recon throughput per factor (slices/s/chip).

    2x/8x come from ``bench.py --preset-recon pdunet_parallel --sparsity k``
    rows (artifacts/bench_sparsity_rows.jsonl); 4x is the shipped-geometry
    flagship row of the bench matrix.
    """
    per_k: dict[int, float] = {}
    rows_file = ART / "bench_sparsity_rows.jsonl"
    if rows_file.exists():
        for line in rows_file.read_text().splitlines():
            if not line.strip():
                continue
            try:
                r = json.loads(line)
            except ValueError:
                continue  # truncated row from a killed bench run
            if (r.get("preset") == "pdunet_parallel" and "sparsity" in r
                    and "recon_slices_per_sec" in r):
                per_k[int(r["sparsity"])] = r["recon_slices_per_sec"]
    # newest matrix wins: bench.py --matrix stamps one file per round
    matrices = sorted(ART.glob("bench_matrix_r*.jsonl"), reverse=True)
    if 4 not in per_k and matrices:
        for line in matrices[0].read_text().splitlines():
            if not line.strip():
                continue
            r = json.loads(line)
            if (r.get("preset") == "pdunet_parallel"
                    and "recon_slices_per_sec" in r):
                per_k[4] = r["recon_slices_per_sec"]
                break
    if not per_k:
        return None
    cells = ", ".join(f"{k}× — {per_k[k]:.0f}" for k in sorted(per_k))
    return (f"Flagship (`pdunet_parallel`) recon throughput by factor, "
            f"slices/s/chip: {cells}.")


def ood_table() -> str:
    header = "| preset (4×) | in-dist | " + " | ".join(OOD_KINDS) + " |"
    lines = [header, "|---|" + "---|" * (len(OOD_KINDS) + 1)]
    for preset in OOD_PRESETS:
        indist = load(ART / "sweep" / f"{preset}_s4.json")
        row = [preset, cell_str(indist, with_ssim=False)]
        for kind in OOD_KINDS:
            q = load(ART / "ood" / f"{preset}_{kind}.json")
            row.append(cell_str(q, with_ssim=False))
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def analysis_table() -> str:
    """OOD gap attribution (scripts/ood_analysis.py cells): model vs
    classical anchor on the same sparse measurement, and the CT
    measurement residual that separates null-space hallucination from
    data corruption."""
    cells = []
    adir = ART / "ood_analysis"
    if adir.exists():
        for f in sorted(adir.glob("*.json")):
            try:
                cells.append(json.loads(f.read_text()))
            except ValueError:
                continue
    if not cells:
        return "*(no analysis cells yet — run `scripts/ood_analysis.py`)*"
    lines = ["| preset | family | model dB | classical anchor dB | "
             "resid ‖Ax̂−y‖/‖y‖ (model / anchor) |",
             "|---|---|---|---|---|"]
    for c in cells:
        resid = ("—" if "resid_rel_model" not in c else
                 f"{c['resid_rel_model']:.4f} / {c['resid_rel_anchor']:.4f}")
        lines.append(
            f"| {c['preset']} | {c['kind']} | {c['psnr_mean']:.2f} | "
            f"{c['anchor_psnr_mean']:.2f} | {resid} |")
    return "\n".join(lines)


def noisy_table() -> str:
    rows = [
        ("trained @ SNR 30 dB", "clean eval",
         load(ART / "noisy_radial_snr30_clean.json")),
        ("trained @ SNR 30 dB", "SNR-30 eval",
         load(ART / "noisy_radial_snr30_noisy.json")),
        ("trained clean (s4 sweep)", "SNR-30 eval",
         load(ART / "noisy_radial_cleantrained_noisy.json")),
        ("trained clean (s4 sweep)", "clean eval",
         load(ART / "sweep" / "pdunet_radial_s4.json")),
    ]
    lines = ["| pdunet_radial arm | eval data | PSNR / SSIM |", "|---|---|---|"]
    for arm, ev, q in rows:
        lines.append(f"| {arm} | {ev} | {cell_str(q)} |")
    return "\n".join(lines)


def patch_readme() -> None:
    """Rewrite the generated blocks between the README's table markers."""
    readme = REPO / "README.md"
    text = readme.read_text()
    for name, body in (("sweep", sweep_table()), ("ood", ood_table()),
                       ("oodanalysis", analysis_table()),
                       ("noise", noisy_table())):
        begin = f"<!-- BEGIN {name} table (generated) -->"
        end = f"<!-- END {name} table -->"
        i, j = text.index(begin), text.index(end)
        text = text[: i + len(begin)] + "\n" + body + "\n" + text[j:]
    readme.write_text(text)
    print(f"patched {readme}")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--update-readme", action="store_true",
                   help="rewrite README.md's generated table blocks in "
                        "place (between the BEGIN/END markers)")
    args = p.parse_args(argv)
    print("## Quality vs acceleration (PSNR dB / SSIM, 64 held-out slices)\n")
    print(sweep_table())
    print("\n## Out-of-distribution evaluation (PSNR dB, 32 slices)\n")
    print(ood_table())
    print("\n## k-space noise robustness (radial MRI)\n")
    print(noisy_table())
    if args.update_readme:
        patch_readme()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
