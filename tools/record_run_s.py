"""Append the run-S section to BENCH/BASELINE.md from the RESULT line
run_s_resume.py printed. Append-only: runs A-R and the Amdahl analysis
above stay byte-identical."""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(log: str = "/tmp/run_s3.log") -> None:
    ceil = result = None
    with open(log) as fh:
        for line in fh:
            if line.startswith("CEILING "):
                ceil = json.loads(line[len("CEILING "):])
            elif line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
    assert ceil and result, "run S incomplete"
    # json round-trip stringifies the int core-count keys
    t = {int(k): v for k, v in result["throughput"].items()}
    w = {int(k): v for k, v in result["wall"].items()}
    loads = result["loadavg_before_best_leg"]
    eff = result["eff_2_to_8"]
    verdict = (
        "clearing the north rule's ≥ 0.8 absolutely, on round-5 code, in a "
        "ceiling-qualified phase (the protocol's acceptance bar)"
        if eff >= 0.8
        else "short of the ≥ 0.8 bar — read against the same-run ceiling and "
        "the phase notes below before concluding anything about the engine"
    )
    fit = "and the fit was right" if eff >= 0.8 else "testing the fit"
    sec = f"""
* **Run S (round 5): the 128M-event leg the Amdahl analysis called for —
  {fit}.** Same code, same interleaved ceiling-bracketed
  protocol as runs P-R, input scaled 4× (128,000,000 events, driver heap
  24g via SCALING_DRIVER_MEM — the 8g default OOMs a 32-thread
  SortAggregate at this input; same heap at every level, so the ratio
  stays internally consistent). With the parallel fraction dominating
  again, 2→8 efficiency is **{eff:.3f}** against a
  same-run raw-CPU ceiling of {result['cpu_ceiling_2_to_8']:.3f} —
  engine/ceiling **{result['relative_eff_2_to_8']:.3f}** — {verdict}. 8→32 posts
  {result['eff_8_to_32']:.3f} against the {result['cpu_ceiling_8_to_32']:.3f}
  SMT ceiling. Absolute throughput: 2-core {t[2]:,.0f} ev/s
  (wall {w[2]:.1f} s), 8-core {t[8]:,.0f} ev/s ({w[8]:.1f} s),
  32-core {t[32]:,.0f} ev/s ({w[32]:.1f} s), at 4× the input of every
  prior run (best of 2 interleaved repeats per level). Final-table
  row counts identical across all legs: {result['final_rows_equal']}
  ({result['final_rows']:,} rows). Pre-leg 1-min loadavg of the best
  legs: 2-core {loads['2']}, 8-core {loads['8']}, 32-core {loads['32']}.
  Raw-CPU ceiling walls: {json.dumps(ceil)}.
"""
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md) as fh:
        text = fh.read()
    anchor = "## Environment limits"
    assert anchor in text
    text = text.replace(anchor, sec.strip() + "\n\n" + anchor, 1)
    with open(md, "w") as fh:
        fh.write(text)
    print("run S recorded")


if __name__ == "__main__":
    main(*sys.argv[1:])
