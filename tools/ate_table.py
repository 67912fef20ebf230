"""Collect docs/ate_runs/*.json into the committed north-star ATE table.

Produces docs/ate_table.md (human) and docs/ate_table.json (machine). The
table is the repo's north-star artifact: long-sequence windowed SfM accuracy
(absolute trajectory error as % of trajectory length) on the capture-sim
sequences, against the 2% bound the e2e suite enforces
(tests/test_northstar_e2e.py) and BASELINE.md's "within reference ATE"
requirement (reference readme.md:5 claims dense reconstructions whose pose
chain COLMAP certifies; we bound drift directly).

Run: python tools/ate_table.py   (idempotent; reads every docs/ate_runs/*.json)
"""
from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
RUNS = REPO / "docs" / "ate_runs"
BOUND_PCT = 2.0  # % of trajectory length (tests/test_northstar_e2e.py)


def _label(path: pathlib.Path, row: dict) -> str:
    tags = []
    if row.get("degrade"):
        tags.append("degraded imagery")
    if row.get("nproc", 1) > 1:
        tags.append(f"{row['nproc']}-process")
    plat = "tpu" if "_tpu" in path.stem else "cpu"
    tags.append(plat.upper())
    return ", ".join(tags)


def collect() -> list[dict]:
    rows = []
    for path in sorted(RUNS.glob("*.json")):
        data = json.loads(path.read_text())
        for row in data if isinstance(data, list) else [data]:
            row = dict(row)
            row["source"] = path.name
            if "ate_pct_traj" not in row:
                row["ate_pct_traj"] = 100.0 * row["ate_rms"] / row["traj_len"]
            row.setdefault("wall_s", float("nan"))
            row.setdefault(
                "frames_per_s",
                row["frames"] / row["wall_s"] if row["wall_s"] else float("nan"),
            )
            row["label"] = _label(path, row)
            row["pass"] = (
                row.get("coverage", 0.0) >= 0.95
                and row.get("ate_pct_traj", 1e9) <= BOUND_PCT
            )
            rows.append(row)
    # stable presentation: by sequence, then frames desc, then label
    rows.sort(key=lambda r: (r["seq"], -r["frames"], r["label"]))
    return rows


def render(rows: list[dict]) -> str:
    lines = [
        "# North-star ATE table",
        "",
        "Long-sequence windowed SfM (feature tracking, PnP, windowed BA, "
        "stitching, switchable-constraint pose graph, global BA — "
        "`tpu3drec/pipelines/kitti.py`) on capture-sim sequences "
        "(`tools/ate_benchmark.py`). Bound: ATE ≤ 2% of trajectory "
        "length with coverage ≥ 0.95 (the suite's own "
        "`tests/test_northstar_e2e.py` bar, extended from 8 frames to "
        "production length).",
        "",
        "| seq | frames | config | ATE rms (m) | ATE %traj | RPE trans (m) |"
        " coverage | traj len (m) | wall (s) | fps | pass |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {seq} | {frames} | {label} | {ate_rms:.3f} | {pct:.2f}% | "
            "{rpe:.3f} | {cov:.3f} | {traj:.1f} | {wall:.0f} | {fps:.2f} | "
            "{ok} |".format(
                seq=r["seq"],
                frames=r["frames"],
                label=r["label"],
                ate_rms=r["ate_rms"],
                pct=r["ate_pct_traj"],
                rpe=r["rpe_trans"],
                cov=r["coverage"],
                traj=r["traj_len"],
                wall=r["wall_s"],
                fps=r["frames_per_s"],
                ok="yes" if r["pass"] else "NO",
            )
        )
    lines += [
        "",
        "Sequences: s00/s01/s02 are 500-frame city-block loops "
        "(perimeter wrap, rounded-ring corridor, distinct building "
        "layouts); m00 is the 150-frame mid-scale regression sequence "
        "(`tests/test_midscale.py`). The degraded row applies the full "
        "photometric degradation stack (motion blur, defocus, vignette — "
        "`tpu3drec/data/degrade.py`) — reported for robustness "
        "transparency: the pipeline survives heavy blur (coverage stays "
        "above 0.98, no NaN poisoning, finite ATE) but drift exceeds the "
        "clean-imagery bound, and the pass column says so rather than "
        "moving the bar. The 2-process row shards windows "
        "across two `jax.distributed` processes "
        "(`tpu3drec/parallel/multihost.py`) and must match the "
        "single-process trajectory. TPU rows ran on the one real chip "
        "through the relay with dispatch salting "
        "(`tpu3drec/utils/relayguard.py`).",
        "",
        "Raw per-run artifacts: `docs/ate_runs/*.json`.",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    rows = collect()
    (REPO / "docs" / "ate_table.json").write_text(json.dumps(rows, indent=2))
    (REPO / "docs" / "ate_table.md").write_text(render(rows))
    for r in rows:
        print(
            f"{r['seq']:>4} {r['frames']:>4}f {r['label']:<24} "
            f"ATE {r['ate_pct_traj']:.2f}% cov {r['coverage']:.2f} "
            f"{'PASS' if r['pass'] else 'FAIL'}"
        )


if __name__ == "__main__":
    main()
